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


def _window_patches(x, kh, kw, sh, sw):
    """(N, H, W, C) -> (N, PH, PW, C, kh*kw) window patches with ceil-mode
    sizing, zero-padded past the boundary, window elements in the
    reference's row-major (h, w) traversal order."""
    ph_out = _out_size(x.shape[1], kh, sh)
    pw_out = _out_size(x.shape[2], kw, sw)
    pad_h = _pad_amount(x.shape[1], kh, sh)
    pad_w = _pad_amount(x.shape[2], kw, sw)
    xp = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    cols = []
    for dh in range(kh):
        for dw in range(kw):
            cols.append(jax.lax.slice(
                xp,
                (0, dh, dw, 0),
                (xp.shape[0], dh + (ph_out - 1) * sh + 1,
                 dw + (pw_out - 1) * sw + 1, xp.shape[3]),
                (1, sh, sw, 1)))
    return jnp.stack(cols, axis=-1)


def stochastic_pool2d(x, kh: int, kw: int, *, stride_h: int = 1,
                      stride_w: int = 1, rng=None, train: bool = True):
    """Stochastic pooling (pooling_layer.cu STOCHASTIC mode; the reference
    implements it GPU-only -- Forward_cpu aborts NOT_IMPLEMENTED).

    Train: per window, sample an element with probability proportional to
    its value (inputs assumed non-negative, i.e. post-ReLU): threshold =
    U[0,1) * sum(window), pick the first element whose running cumsum
    reaches it (StoPoolForwardTrain, pooling_layer.cu:83-121).  The
    gradient routes to the sampled element only (col2im-style overlap
    accumulation comes from autodiff of the patch extraction).  Boundary
    windows are clipped; zero padding reproduces that exactly because
    padded cells never advance the cumsum and padding is only at the
    trailing edge.

    Test: deterministic weighted average sum(x^2)/(FLT_MIN + sum(x))
    (StoPoolForwardTest, pooling_layer.cu:125-154).

    Like the reference kernels, padding is not supported (the .cu kernels
    ignore pad_h/pad_w even when set, e.g. by SPP's param generator).
    """
    patches = _window_patches(x, kh, kw, stride_h, stride_w)
    if not train:
        total = jnp.sum(patches, axis=-1)
        sq = jnp.sum(patches * patches, axis=-1)
        return sq / (jnp.float32(np.finfo(np.float32).tiny) + total)
    if rng is None:
        raise ValueError("stochastic_pool2d(train=True) needs rng")
    cum = jnp.cumsum(patches, axis=-1)
    total = cum[..., -1:]
    thres = jax.random.uniform(rng, total.shape, x.dtype) \
        * jax.lax.stop_gradient(total)
    sel = jnp.argmax(cum >= thres, axis=-1)
    onehot = jax.nn.one_hot(sel, kh * kw, dtype=x.dtype)
    return jnp.sum(patches * jax.lax.stop_gradient(onehot), axis=-1)


def pool2d_padded(x, kh: int, kw: int, *, stride_h: int, stride_w: int,
                  pad_h: int = 0, pad_w: int = 0, mode: str = "max"):
    """Caffe pooling with explicit symmetric padding (pooling_layer.cpp):
    pooled = ceil((H + 2*pad - k)/s) + 1, clipped so the last window starts
    strictly inside the real image.  MAX ignores padded cells entirely
    (windows are clipped to the image); AVE divides by the window's overlap
    with the PADDED extent [0, H+pad) while summing only real cells --
    padded cells count in the denominator but contribute 0.  This is the
    primitive SPP builds on."""
    h, w = x.shape[1], x.shape[2]

    def sizes(size, k, s, p):
        pooled = int(math.ceil((size + 2 * p - k) / s)) + 1
        # pooling_layer.cpp guards the clip on pad_h || pad_w JOINTLY:
        # any padding triggers the last-window check on BOTH dims
        if (pad_h or pad_w) and (pooled - 1) * s >= size + p:
            pooled -= 1
        return pooled

    ph_out = sizes(h, kh, stride_h, pad_h)
    pw_out = sizes(w, kw, stride_w, pad_w)
    # end padding so reduce_window emits exactly pooled outputs
    end_h = max(0, (ph_out - 1) * stride_h + kh - h - pad_h)
    end_w = max(0, (pw_out - 1) * stride_w + kw - w - pad_w)
    pad = ((0, 0), (pad_h, end_h), (pad_w, end_w), (0, 0))
    if mode == "max":
        # reduce_window pads with the -inf identity == caffe's clipping
        return jax.lax.reduce_window(
            x, _monoid_neg_inf(x.dtype), jax.lax.max,
            window_dimensions=(1, kh, kw, 1),
            window_strides=(1, stride_h, stride_w, 1), padding=pad)
    if mode != "ave":
        raise ValueError(mode)
    sums = jax.lax.reduce_window(
        x, _monoid_zero(x.dtype), jax.lax.add,
        window_dimensions=(1, kh, kw, 1),
        window_strides=(1, stride_h, stride_w, 1), padding=pad)
    # denominator: pooling_layer.cpp computes pool_size from the UNCLAMPED
    # window start (hstart = ph*s - pad, may be negative) and the end
    # clipped to the padded extent -- leading padding counts too
    def counts(size, k, s, p, pooled):
        starts = np.arange(pooled) * s - p
        ends = np.minimum(starts + k, size + p)
        return (ends - starts).astype(np.float32)

    count = np.outer(counts(h, kh, stride_h, pad_h, ph_out),
                     counts(w, kw, stride_w, pad_w, pw_out))
    return sums / jnp.asarray(count, x.dtype)[None, :, :, None]


def spatial_pyramid_pool(x, pyramid_height: int, *, mode: str = "max"):
    """SPP (src/caffe/layers/spp_layer.cpp): for level l in [0,
    pyramid_height), pool to a 2^l x 2^l grid with kernel = ceil(dim/bins),
    stride = kernel, pad = (kernel*bins - dim + 1)/2 (GetPoolingParam,
    spp_layer.cpp:17-63), flatten each level channel-major (caffe NCHW
    flatten) and concatenate: (N, H, W, C) -> (N, C * sum(4^l))."""
    n, h, w, c = x.shape
    outs = []
    for level in range(pyramid_height):
        bins = 2 ** level
        kh = int(math.ceil(h / bins))
        kw = int(math.ceil(w / bins))
        pad_h = (kh * bins - h + 1) // 2
        pad_w = (kw * bins - w + 1) // 2
        pooled = pool2d_padded(x, kh, kw, stride_h=kh, stride_w=kw,
                               pad_h=pad_h, pad_w=pad_w, mode=mode)
        # caffe flattens NCHW: channel-major within each level
        outs.append(jnp.transpose(pooled, (0, 3, 1, 2)).reshape(n, -1))
    return jnp.concatenate(outs, axis=1)


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
