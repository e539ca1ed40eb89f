"""Persistent XLA compilation cache.

The reference pays its graph-construction cost per process (Net::Init,
net.cpp:40-275); the analogous cost here is XLA compilation -- 30-60 s per
executable through a remote-TPU compile service, and several minutes for
the fused K-step training scan.  JAX's persistent cache makes that a
one-time cost across ALL processes: enabling it is how `qa train
--fused-steps` breaks even immediately instead of after ~10k steps
(docs/PERF.md).  Verified to work through the axon remote backend.
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger("mms_tpu.cache")

_DEFAULT = "~/.cache/mms_answer_selection_tpu/xla"


def enable_compilation_cache(path: str | None = None,
                             min_compile_secs: float = 2.0) -> str | None:
    """Point JAX at an on-disk compilation cache (idempotent, safe to call
    before or after backend init -- it only affects future compiles).

    path: cache dir; defaults to $MMS_TPU_CACHE_DIR or ~/.cache/....
    Returns the directory in use, or None if enabling failed (old JAX,
    read-only filesystem, ...) -- callers never need to handle that."""
    import jax

    path = os.path.expanduser(
        path or os.environ.get("MMS_TPU_CACHE_DIR") or _DEFAULT)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          float(min_compile_secs))
        return path
    except Exception as e:  # noqa: BLE001 -- never fail the caller
        log.debug("compilation cache unavailable: %s", e)
        return None
