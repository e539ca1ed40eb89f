"""Deployment export: ONE self-contained artifact carrying the
inference program AND the weights, serialized as StableHLO via
``jax.export``.

This is the rebuild's analog of the reference's frozen deployment pair
-- a .caffemodel plus a deploy prototxt that C++ caffe loads without the
training scripts (/root/reference/tools/caffe.cpp:229-296 test path,
src/caffe/net.cpp construction from NetParameter).  Here the program
and weights travel together: the artifact replays on any machine with
jax installed (``load_scorer``), with NO dependency on this package's
model code, and is lowered for BOTH cpu and tpu by default so the same
file serves on either backend.

The exported function is the inference forward of the flagship MMS
model: (question ids, answer ids, overlap features) -> (logits,
P(class) softmax), batch-size symbolic by default so one artifact
serves any request size.

File layout: ``MAGIC | uint64 header_len | header json | stablehlo
bytes``.  The header carries the shape/config facts a server needs
without deserializing the program.
"""

from __future__ import annotations

import json
import struct

import jax
import jax.numpy as jnp
import numpy as np

MAGIC = b"MMSXPRT1"


def export_scorer(params, state, cfg, *, batch: int | None = None,
                  platforms=("cpu", "tpu")) -> bytes:
    """Serialize the inference forward with the weights baked in.

    batch: None exports a symbolic batch dimension (one program, any
    request size -- scoped dynamism jax.export supports without
    sacrificing static shapes inside the program); an int pins it.
    """
    from .models.mms_qa import mms_qa_apply
    from jax import export as jex

    def scorer(question, answer, overlap_feat):
        out, _ = mms_qa_apply(
            params, state,
            {"question": question, "answer": answer,
             "overlap_feat": overlap_feat},
            cfg, train=False)
        return out["logits"], out["prob"]

    b = jex.symbolic_shape("b")[0] if batch is None else int(batch)
    args = (jax.ShapeDtypeStruct((b, cfg.question_len), jnp.int32),
            jax.ShapeDtypeStruct((b, cfg.answer_len), jnp.int32),
            jax.ShapeDtypeStruct((b, cfg.overlap_features), jnp.float32))
    exp = jex.export(jax.jit(scorer), platforms=tuple(platforms))(*args)
    return exp.serialize()


def save_scorer(path: str, params, state, cfg, *,
                batch: int | None = None,
                platforms=("cpu", "tpu")) -> dict:
    """Export + write the artifact; returns the header dict."""
    blob = export_scorer(params, state, cfg, batch=batch,
                         platforms=platforms)
    header = {
        "format": 1,
        "question_len": int(cfg.question_len),
        "answer_len": int(cfg.answer_len),
        "overlap_features": int(cfg.overlap_features),
        "vocab_size": int(cfg.vocab_size),
        "batch": batch,
        "platforms": list(platforms),
        "outputs": ["logits", "prob"],
        "bytes": len(blob),
    }
    hb = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(MAGIC)
        f.write(struct.pack("<Q", len(hb)))
        f.write(hb)
        f.write(blob)
    return header


class LoadedScorer:
    """A deserialized deployment artifact.  ``call`` accepts host or
    device arrays and returns host (logits, prob)."""

    def __init__(self, header: dict, exported):
        self.header = header
        self._exported = exported

    def __call__(self, question, answer, overlap_feat):
        logits, prob = self._exported.call(
            jnp.asarray(question, jnp.int32),
            jnp.asarray(answer, jnp.int32),
            jnp.asarray(overlap_feat, jnp.float32))
        return np.asarray(logits), np.asarray(prob)

    def score(self, question, answer, overlap_feat) -> np.ndarray:
        """P(correct) -- the positive-class probability column."""
        return self(question, answer, overlap_feat)[1][:, 1]


def load_scorer(path: str) -> LoadedScorer:
    from jax import export as jex
    with open(path, "rb") as f:
        magic = f.read(len(MAGIC))
        if magic != MAGIC:
            raise ValueError(f"{path} is not an exported scorer "
                             f"(bad magic {magic!r})")
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen))
        blob = f.read()
    if header.get("format") != 1:
        raise ValueError(f"unsupported artifact format {header.get('format')}")
    if len(blob) != header["bytes"]:
        raise ValueError(f"truncated artifact: header promises "
                         f"{header['bytes']} program bytes, found "
                         f"{len(blob)}")
    return LoadedScorer(header, jex.deserialize(blob))
