"""Multi-host wiring tests (single-process: shard math + mesh shapes; the
DCN path itself needs a real pod)."""

import jax
import numpy as np
import pytest

from mms_answer_selection_tpu.parallel.multihost import (
    global_batch_from_local,
    global_mesh,
    host_shard,
    initialize,
)


def test_initialize_noop_single_process():
    initialize()  # must not raise in a single-process environment
    assert jax.process_count() == 1


def test_host_shard():
    idx, count = host_shard()
    assert idx == 0 and count == 1


def test_global_mesh_spans_devices():
    m = global_mesh(tp=2)
    assert m.shape == {"dp": 4, "tp": 2}
    with pytest.raises(ValueError):
        global_mesh(tp=3)


def test_global_batch_single_process_roundtrip():
    m = global_mesh(tp=1)
    local = {"x": np.arange(16, dtype=np.int32).reshape(8, 2)}
    g = global_batch_from_local(m, local)
    assert g["x"].shape == (8, 2)  # 1 process -> global == local
    np.testing.assert_array_equal(np.asarray(g["x"]), local["x"])
