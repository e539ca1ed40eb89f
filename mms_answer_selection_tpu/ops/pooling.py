"""Max / average pooling with the reference's ceil-mode output sizing.

Reference: src/caffe/layers/pooling_layer.cpp --
  pooled = ceil((H + 2*pad - k) / stride) + 1
and AVE pooling divides each window by the number of input elements actually
covered (windows clipped at the boundary), not by k*k.  Every QA recipe uses
pad=0 (do_trec_qa_clean.py:371-375); the shapes there divide exactly, but the
ceil semantics are reproduced so arbitrary configs match.

Implemented as ``lax.reduce_window`` (XLA's native fused pooling) over NHWC.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def _monoid_zero(dtype):
    # reduce_window's VJP requires a *concrete* identity (a traced init
    # value defeats XLA's add/max monoid recognition under jit(grad))
    return np.zeros((), dtype=dtype)[()]


def _monoid_neg_inf(dtype):
    if jnp.issubdtype(dtype, jnp.floating):
        return np.array(-np.inf, dtype=dtype)[()]
    return np.iinfo(np.dtype(dtype)).min


def _out_size(size: int, k: int, s: int) -> int:
    return int(math.ceil((size - k) / s)) + 1


def _pad_amount(size: int, k: int, s: int) -> int:
    return max(0, (_out_size(size, k, s) - 1) * s + k - size)


def max_pool2d(x, kh: int, kw: int, *, stride_h: int = 1, stride_w: int = 1):
    """x: (N, H, W, C) -> (N, H', W', C) with ceil-mode sizing."""
    ph = _pad_amount(x.shape[1], kh, stride_h)
    pw = _pad_amount(x.shape[2], kw, stride_w)
    return jax.lax.reduce_window(
        x, _monoid_neg_inf(x.dtype), jax.lax.max,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, stride_h, stride_w, 1),
        padding=((0, 0), (0, ph), (0, pw), (0, 0)),
    )


def avg_pool2d(x, kh: int, kw: int, *, stride_h: int = 1, stride_w: int = 1):
    """Average pooling dividing by the true element count per (clipped)
    window, matching the reference's boundary handling."""
    ph = _pad_amount(x.shape[1], kh, stride_h)
    pw = _pad_amount(x.shape[2], kw, stride_w)
    pad = ((0, 0), (0, ph), (0, pw), (0, 0))
    sums = jax.lax.reduce_window(
        x, _monoid_zero(x.dtype), jax.lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, stride_h, stride_w, 1),
        padding=pad,
    )
    if ph == 0 and pw == 0:
        return sums / (kh * kw)
    ones = jnp.ones((1,) + x.shape[1:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(
        ones, _monoid_zero(x.dtype), jax.lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, stride_h, stride_w, 1),
        padding=pad,
    )
    return sums / counts
