"""Aux subsystem tests: HDF5 compat, signal handling, history tooling."""

import json
import os
import signal

import numpy as np
import pytest

from mms_answer_selection_tpu.models.mms_qa import V4, MMSQAConfig
from mms_answer_selection_tpu.training.signals import Action, SignalHandler
from mms_answer_selection_tpu.utils.history import (
    history_to_csv,
    summarize_model,
)

rng = np.random.default_rng(17)


class TestHDF5Compat:
    @pytest.fixture()
    def split(self):
        return {
            "question": rng.integers(0, 50, (30, 12)).astype(np.int32),
            "answer": rng.integers(0, 50, (30, 12)).astype(np.int32),
            "label": rng.integers(0, 2, 30).astype(np.int32),
            "group": rng.integers(0, 5, 30).astype(np.int32),
            "overlap_feat": rng.random((30, 2)).astype(np.float32),
        }

    def test_roundtrip_chunked(self, tmp_path, split):
        h5py = pytest.importorskip("h5py")  # noqa: F841
        from mms_answer_selection_tpu.data.hdf5_compat import (
            load_hdf5_list, save_hdf5_chunks)

        list_file = save_hdf5_chunks(str(tmp_path / "h5"), "train", split,
                                     chunk_rows=12)  # forces 3 chunks
        loaded = load_hdf5_list(list_file)
        assert set(loaded) == set(split)
        for key in split:
            np.testing.assert_allclose(loaded[key], split[key], rtol=1e-6)
        assert loaded["question"].dtype == np.int32
        assert loaded["overlap_feat"].dtype == np.float32


class TestSignals:
    def test_stop_latches_and_snapshot_clears(self):
        with SignalHandler() as h:
            assert h.get_requested_action() == Action.NONE
            os.kill(os.getpid(), signal.SIGHUP)
            assert h.get_requested_action() == Action.SNAPSHOT
            assert h.get_requested_action() == Action.NONE  # cleared
            os.kill(os.getpid(), signal.SIGINT)
            assert h.get_requested_action() == Action.STOP
            assert h.get_requested_action() == Action.STOP  # latched

    def test_handlers_restored_on_exit(self):
        before = signal.getsignal(signal.SIGINT)
        with SignalHandler():
            assert signal.getsignal(signal.SIGINT) != before
        assert signal.getsignal(signal.SIGINT) == before


class TestHistoryTooling:
    def test_csv_export(self):
        hist = {"train_loss": [0.7, 0.6, 0.5], "steps": [0, 100],
                "dev_map": [0.5, 0.6], "dev_mrr": [0.55, 0.65],
                "dev_auc": [0.7, 0.8]}
        train_csv, eval_csv = history_to_csv(hist)
        lines = train_csv.strip().split("\n")
        assert lines[0] == "NumIters,TrainingLoss"
        assert lines[1].startswith("0,0.7")
        ev = eval_csv.strip().split("\n")
        assert ev[1].startswith("0,0.5,0.55,0.7")

    def test_summarize_v4_structure(self):
        cfg = MMSQAConfig(**{**V4.__dict__, "vocab_size": 1000})
        table = summarize_model(cfg)
        assert "sim_cross(bilinear,M=4)" in table
        assert "conv0(5x5)" in table
        # v4 head: flatten 1x1x64 + 2 overlap -> fc1 32
        assert "66" in table
        assert "TOTAL" in table
        # embed(1000*50+50) + sim(4*2500 + 4*1600) + convs + fcs
        total = int(table.strip().split()[-1])
        expected_embed = 1000 * 50 + 50
        assert total > expected_embed
