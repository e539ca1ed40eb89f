"""Embedding lookup with pretrained-vector loading (the fork's Embed layer).

Reference: src/caffe/layers/embed_layer.cpp.  The fork extends stock Embed
with ``weight_source`` (caffe.proto:801): at init time, rows of the (V, D)
table are overwritten *in file order starting at row 0* with vectors parsed
from a ``.txt`` (word + floats per line, embed_layer.cpp:52-62), ``.all``
(embed_layer.cpp:63-79), or word2vec ``.bin`` (embed_layer.cpp:80-105) file.
The QA data prep writes exactly one line per in-vocab word in vocab order
(do_trec_qa_clean.py:283-289), so rows [0, n_pretrained) become GloVe vectors
while the trailing rows (unknown-word index, pad index) keep their random
uniform(-0.08, 0.08) init (do_trec_qa_clean.py:386-388, 297-299).

There is also an additive bias vector of size D shared across all positions
(bias_term defaults true in EmbedParameter; the recipe keeps it, lr_mult=2).

The backward is a scatter-add over touched rows (embed_layer.cpp:156-179);
``jnp.take`` autodiff produces the same sparse update and XLA keeps it as a
scatter, so no dense (V, D) gradient is materialized per token.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..utils import fillers


def embed_init(key, vocab_size: int, dim: int, *, pretrained=None,
               minval: float = -0.08, maxval: float = 0.08, bias_term: bool = True,
               dtype=jnp.float32):
    """Returns {'w': (V, D)[, 'b': (D,)]}.

    ``pretrained``: optional (n, D) array written into rows [0, n) -- the
    weight_source semantics described above.
    """
    w = fillers.uniform(key, (vocab_size, dim), minval, maxval, dtype=dtype)
    if pretrained is not None:
        pretrained = jnp.asarray(pretrained, dtype)
        if pretrained.shape[1] != dim:
            raise ValueError(
                f"pretrained dim {pretrained.shape[1]} != embed dim {dim}")
        if pretrained.shape[0] > vocab_size:
            raise ValueError("more pretrained rows than vocab entries")
        w = w.at[: pretrained.shape[0]].set(pretrained)
    params = {"w": w}
    if bias_term:
        params["b"] = jnp.zeros((dim,), dtype)
    return params


def embed_lookup(params, ids):
    """ids: int (..., W) -> (..., W, D).  Adds the shared bias if present.

    Out-of-range ids clamp to the last row (the pad index in the QA vocab
    layout) instead of JAX's default NaN fill -- the debug-only DCHECK of the
    reference (embed_layer.cpp:143-145) is replaced by defined behavior.
    """
    out = jnp.take(params["w"], ids, axis=0, mode="clip")
    if "b" in params:
        out = out + params["b"]
    return out


def load_pretrained_vectors(path: str, dim: int) -> tuple[list[str], np.ndarray]:
    """Parse a ``.txt``/``.all``/``.bin`` pretrained-vector file.

    Returns (words, (n, dim) float32 array) in file order -- i.e. the order
    in which the reference writes them into the weight blob
    (embed_layer.cpp:46-110).
    """
    if path.endswith(".txt"):
        words, vecs = [], []
        with open(path, "r", encoding="utf-8", errors="replace") as f:
            for line in f:
                parts = line.rstrip("\n").split(" ")
                if len(parts) < dim + 1:
                    continue
                words.append(parts[0])
                vecs.append(np.asarray(parts[1: dim + 1], dtype=np.float32))
        return words, np.stack(vecs) if vecs else np.zeros((0, dim), np.float32)
    if path.endswith(".all"):
        # header: bias vocab_size-1 dim-1; then "<index> <d floats> <word>"
        words, vecs = [], []
        with open(path, "r", encoding="utf-8", errors="replace") as f:
            tokens = f.read().split()
        i = 3  # skip header triple
        while i + dim + 1 < len(tokens) + 1:
            if i + dim + 2 > len(tokens):
                break
            vecs.append(np.asarray(tokens[i + 1: i + 1 + dim], dtype=np.float32))
            words.append(tokens[i + 1 + dim])
            i += dim + 2
        return words, np.stack(vecs) if vecs else np.zeros((0, dim), np.float32)
    # word2vec binary: "vocab dim\n" then (word + ' ' + dim float32s) records
    words, vecs = [], []
    with open(path, "rb") as f:
        header = f.readline().split()
        vocab_size, file_dim = int(header[0]), int(header[1])
        if file_dim != dim:
            raise ValueError(f"file dim {file_dim} != requested {dim}")
        for _ in range(vocab_size):
            chars = []
            while True:
                ch = f.read(1)
                if not ch or ch == b" ":
                    break
                if ch != b"\n":
                    chars.append(ch)
            words.append(b"".join(chars).decode("utf-8", errors="replace"))
            vecs.append(np.frombuffer(f.read(4 * dim), dtype=np.float32))
    return words, np.stack(vecs) if vecs else np.zeros((0, dim), np.float32)
