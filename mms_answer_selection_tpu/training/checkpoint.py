"""Checkpoint / resume: the .caffemodel + .solverstate replacement.

The reference snapshots two artifacts -- model weights (Net::ToProto,
net.cpp:847-856) and solver state (iter + optimizer history,
SGDSolver::SnapshotSolverState*, sgd_solver.cpp:246-347) -- and restores by
file extension (Solver::Restore, solver.cpp:470-481).  Here one checkpoint
directory per step carries the full pytree bundle:

    <dir>/qa_iter_<N>/ckpt.msgpack   params + bn state + opt state + rng
    <dir>/qa_iter_<N>/meta.json      step, dev metrics, config digest

Serialization is flax msgpack over the raw pytrees -- self-describing,
compact, no pickle.  ``load_checkpoint`` restores by template (the
name+shape-checked loading that CopyTrainedLayersFrom does by layer name,
net.cpp:741-777, becomes structural pytree matching).
"""

from __future__ import annotations

import json
import os
import re

import jax
import numpy as np
from flax import serialization


def save_checkpoint(directory: str, step: int, bundle, *, prefix: str = "qa",
                    meta: dict | None = None) -> str:
    """bundle: arbitrary pytree (params/state/opt_state/...).  Returns path."""
    path = os.path.join(directory, f"{prefix}_iter_{step}")
    os.makedirs(path, exist_ok=True)
    host = jax.tree.map(np.asarray, jax.device_get(bundle))
    # temp-then-rename: a crash mid-write must not leave a truncated
    # ckpt.msgpack that latest_checkpoint would pick for resume
    tmp = os.path.join(path, ".ckpt.msgpack.tmp")
    with open(tmp, "wb") as f:
        f.write(serialization.msgpack_serialize(host))
    os.replace(tmp, os.path.join(path, "ckpt.msgpack"))
    tmp_meta = os.path.join(path, ".meta.json.tmp")
    with open(tmp_meta, "w") as f:
        json.dump({"step": step, **(meta or {})}, f)
    os.replace(tmp_meta, os.path.join(path, "meta.json"))
    return path


def load_checkpoint(path: str, template=None):
    """Returns (bundle, meta).  With ``template`` the bundle is restored into
    the template's pytree structure (shape-checked); without, raw nested
    dicts/lists of numpy arrays are returned."""
    with open(os.path.join(path, "ckpt.msgpack"), "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    if template is not None:
        raw = serialization.from_state_dict(template, raw)
    meta_path = os.path.join(path, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return raw, meta


def copy_matching(template, loaded, *, path=""):
    """Name+shape-checked partial restore -- the finetuning semantics of
    Net::CopyTrainedLayersFrom (net.cpp:741-777): parameters are matched by
    *name* (pytree path here); a name present in both with the same shape is
    copied, a shape mismatch or a missing name keeps the template's value
    (the reference logs "Ignoring source layer" and moves on; a shape
    mismatch is fatal there, but for cross-config finetuning we skip it and
    report).  Returns (merged_pytree, report) where report maps each leaf
    path to "loaded" | "shape_mismatch" | "missing"."""
    report = {}

    def merge(tpl, src, p):
        if isinstance(tpl, dict):
            out = {}
            for k, v in tpl.items():
                sub = src.get(k) if isinstance(src, dict) else None
                out[k] = merge(v, sub, f"{p}/{k}" if p else str(k))
            return out
        if isinstance(tpl, (list, tuple)):
            src_seq = src if isinstance(src, (list, tuple, dict)) else ()
            out = []
            for i, v in enumerate(tpl):
                if isinstance(src_seq, dict):  # msgpack stores lists as dicts
                    sub = src_seq.get(str(i), src_seq.get(i))
                else:
                    sub = src_seq[i] if i < len(src_seq) else None
                out.append(merge(v, sub, f"{p}/{i}"))
            return type(tpl)(out) if isinstance(tpl, tuple) else out
        # leaf
        if src is None:
            report[p] = "missing"
            return tpl
        src_arr = np.asarray(src)
        tpl_shape = getattr(tpl, "shape", None)
        if tpl_shape is not None and tuple(src_arr.shape) != tuple(tpl_shape):
            report[p] = "shape_mismatch"
            return tpl
        report[p] = "loaded"
        return src_arr.astype(tpl.dtype) if hasattr(tpl, "dtype") else src_arr

    return merge(template, loaded, path), report


def load_weights_into(params, state, ckpt_path: str):
    """`caffe train -weights` equivalent (tools/caffe.cpp:125-135, 211-213):
    load a checkpoint's params (+ BN state when present) into an
    already-initialized model by name/shape matching.  Returns
    (params, state, report)."""
    bundle, _meta = load_checkpoint(ckpt_path)
    src_params = bundle.get("params", bundle)
    params, report = copy_matching(params, src_params)
    if state is not None and isinstance(bundle, dict) and "state" in bundle:
        state, state_report = copy_matching(state, bundle["state"])
        report.update({f"state/{k}": v for k, v in state_report.items()})
    return params, state, report


def latest_checkpoint(directory: str, *, prefix: str = "qa") -> str | None:
    """Highest-step checkpoint dir under ``directory`` (resume-from-snapshot,
    the `caffe train -snapshot` equivalent, tools/caffe.cpp:208-210)."""
    if not os.path.isdir(directory):
        return None
    best_step, best = -1, None
    pat = re.compile(rf"^{re.escape(prefix)}_iter_(\d+)$")
    for name in os.listdir(directory):
        m = pat.match(name)
        if m and int(m.group(1)) > best_step:
            best_step, best = int(m.group(1)), os.path.join(directory, name)
    return best
