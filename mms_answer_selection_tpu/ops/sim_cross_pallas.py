"""Fused Pallas TPU kernels for the learned bilinear Q×A metric.

The reference's mode-2 SimCross is its performance hole: 2 GEMMs per
(sample, measure) on the forward and 6 on the backward, issued one BLAS call
at a time from a host loop, with the GPU build falling back to CPU entirely
(sim_cross_layer.cu:187-189, 240-242).  These kernels are the TPU-native
replacement, designed around the MXU and VMEM rather than translated:

* ``bilinear_pair_maps`` -- training-path op producing the dense per-pair
  map (N, W1, W2, M) with a custom_vjp whose backward is the analytic
  gradient set (the 6-GEMM math of sim_cross_layer.cpp:282-300) expressed as
  three batched einsums that XLA lowers to MXU GEMMs.  The forward runs as a
  Pallas kernel on TPU (one grid step per sample; Q·W_m staged in VMEM) and
  as the reference einsum elsewhere.

* ``bilinear_maxsim_scores`` -- the retrieval-path kernel (BASELINE.json
  configs[3]): scores every query against every candidate under the learned
  metric with MaxSim aggregation  score(q, c) = Σ_m Σ_i max_j q_i^T W_m c_j,
  computed flash-style: the (Nq·M·W1) × (Nc·W2) similarity matrix is tiled
  through VMEM and reduced in-register -- it NEVER hits HBM (materializing
  it for 1M candidates would be ~10 TB).  One MXU matmul per (query, c-tile)
  plus an in-kernel segmented max/sum.

Layout/padding rules (pallas_guide.md tiling table): the embedding dim D is
zero-padded to 128 lanes (zeros contribute nothing to q·W·a), candidate
token rows are padded to ``W2P`` (64) rows per candidate with an additive
-inf mask so padded tokens never win the max, and query rows (M*W1) are
already sublane-aligned for the recipe shapes.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
NEG_INF = -1e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pad_last(x, size: int):
    pad = size - x.shape[-1]
    if pad == 0:
        return x
    widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
    return jnp.pad(x, widths)


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _fit_c_block(c: int, c_block: int, c_sub: int) -> int:
    """Candidate tile that tiles a pool of ``c`` rows: min(c_block, c) when
    that divides c, else the largest divisor of c that is <= c_block and a
    multiple of c_sub.  Direct callers with pools sized off the default
    block (e.g. 384 against the int8 default of 256) keep working; only
    QueryEngine pads pools to C_BLOCK_BY_MODE multiples."""
    c_block = min(c_block, c)
    if c % c_block == 0:
        return c_block
    b = c_block - c_block % c_sub
    while b >= c_sub:
        if c % b == 0:
            return b
        b -= c_sub
    raise ValueError(
        f"pool size {c} has no tile <= {c_block} that is a multiple of "
        f"c_sub {c_sub}; pad the pool to a c_block multiple "
        f"(C_BLOCK_BY_MODE) the way QueryEngine does")


# ===========================================================================
# training-path pair maps with analytic VJP
# ===========================================================================

def _pair_map_kernel(q_ref, at_ref, w_ref, o_ref, *, m_count, w1, w2, dp):
    """One sample per grid step: o[m] = (q @ w[m]) @ a^T.

    q_ref: (W1, Dp); at_ref: (Dp, W2) [A pre-transposed on host];
    w_ref: (M*Dp, Dp); o_ref: (M, W1, W2)."""
    q = q_ref[:]
    for m in range(m_count):
        w_m = w_ref[pl.ds(m * dp, dp), :]
        qw = jnp.dot(q, w_m, preferred_element_type=jnp.float32)
        s = jnp.dot(qw, at_ref[:], preferred_element_type=jnp.float32)
        o_ref[m, :, :] = s


def _pair_maps_forward(q, a, w, *, interpret: bool):
    n, w1, d = q.shape
    w2 = a.shape[1]
    m_count = w.shape[0]
    dp = _round_up(d, LANE)
    qp = _pad_last(q, dp)                      # (N, W1, Dp)
    atp = _pad_last(a, dp).transpose(0, 2, 1)  # (N, Dp, W2)
    wp = jnp.pad(w, ((0, 0), (0, dp - d), (0, dp - d)))
    wp = wp.reshape(m_count * dp, dp)

    out = pl.pallas_call(
        functools.partial(_pair_map_kernel, m_count=m_count, w1=w1, w2=w2,
                          dp=dp),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((None, w1, dp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, dp, w2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_count * dp, dp), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, m_count, w1, w2), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, m_count, w1, w2), jnp.float32),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * n * m_count * (w1 * dp * dp + w1 * dp * w2),
            bytes_accessed=(qp.size + atp.size + wp.size + n * m_count * w1
                            * w2) * 4,
            transcendentals=0,
        ),
    )(qp, atp, wp)
    # (N, M, W1, W2) -> NHWC (N, W1, W2, M)
    return jnp.transpose(out, (0, 2, 3, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def bilinear_pair_maps(q, a, w, interpret=None):
    """Fused SimCross mode-2 forward: (N,W1,D),(N,W2,D),(M,D,D) ->
    (N, W1, W2, M).  Bias, when used, is added by the caller (it is a plain
    broadcast add XLA fuses anyway).

    On non-TPU backends (or interpret=True) this runs the reference einsum;
    gradients are always the analytic closed forms below.
    """
    if interpret is None:
        interpret = not _on_tpu()
    if interpret:
        return jnp.einsum("nid,mde,nje->nijm", q, w, a,
                          precision=jax.lax.Precision.HIGHEST)
    return _pair_maps_forward(q, a, w, interpret=False)


def _pair_maps_fwd(q, a, w, interpret):
    return bilinear_pair_maps(q, a, w, interpret), (q, a, w)


def _pair_maps_bwd(interpret, res, g):
    """Analytic backward -- the batched form of the reference's 6 GEMMs
    (sim_cross_layer.cpp:282-300):
      dW[m] = sum_n q_n^T G[n,:,:,m] a_n
      dQ[n] = sum_m G[n,:,:,m] a_n W_m^T
      dA[n] = sum_m G[n,:,:,m]^T q_n W_m
    """
    q, a, w = res
    prec = jax.lax.Precision.HIGHEST
    dw = jnp.einsum("nid,nijm,nje->mde", q, g, a, precision=prec)
    dq = jnp.einsum("nijm,mde,nje->nid", g, w, a, precision=prec)
    da = jnp.einsum("nijm,mde,nid->nje", g, w, q, precision=prec)
    return dq, da, dw


bilinear_pair_maps.defvjp(_pair_maps_fwd, _pair_maps_bwd)


# ===========================================================================
# retrieval-path fused scorer (flash-style, no HBM materialization)
# ===========================================================================

W2P = 48          # legacy fixed padding; packers now default to
                  # w2p=None -> round_up(W2, 8) (sublane granularity is 8,
                  # and every padded token row is pure overhead: 48->40 on
                  # the recipe shapes bought +13.6% throughput)
C_BLOCK = 128     # candidates per grid step (output row tile)
C_SUB = 8         # candidates per inner matmul chunk (C_SUB*W2P = 512 rows)
Q_SUB = 16        # queries per inner matmul chunk (tuned on
                  # v5e: 16 beats 8 by ~20% at 262k pools)
Q_BLOCK = 128     # query padding on TPU (output lane alignment)
MASK_LANE = -1    # the spare padded lane carrying the -inf token mask


def _maxsim_kernel(qw_ref, pool_ref, o_ref, *, c_block, c_sub, q_sub, w2p,
                   rows_per_q, nq):
    """One candidate-tile grid step; all queries scored per step.

    qw_ref:   (NQ*R, Dp)         metric-projected query tokens; lane Dp-1
                                 holds the constant 1.0 that activates the
                                 mask lane of the pool
    pool_ref: (C_BLOCK*W2P, Dp)  candidate token tile; lane Dp-1 holds the
                                 additive mask (0 real / -inf padding), so
                                 masking rides the MXU contraction instead
                                 of a separate (N, 1) operand (which would
                                 lane-pad to 128x its size in VMEM)
    o_ref:    (C_BLOCK, NQ)      scores, transposed layout

    The matmul runs transposed -- S = pool_chunk . qw_chunk^T -- so the
    per-candidate token axis lands on SUBLANES where the (c_sub, w2p, ...)
    split is free; the per-query sum over R lanes is a constant 0/1
    selector matmul (lane-segmented reductions have no native vector op).
    """
    r = rows_per_q
    # selector: (Q_SUB*R, Q_SUB) with sel[l, q] = 1 iff l // R == q
    row_q = jax.lax.broadcasted_iota(jnp.int32, (q_sub * r, q_sub), 0) // r
    col_q = jax.lax.broadcasted_iota(jnp.int32, (q_sub * r, q_sub), 1)
    sel = (row_q == col_q).astype(jnp.float32)

    for t in range(c_block // c_sub):
        rows = c_sub * w2p
        chunk = pool_ref[pl.ds(t * rows, rows), :]
        q_parts = []
        for qb in range(nq // q_sub):
            qw = qw_ref[pl.ds(qb * q_sub * r, q_sub * r), :]
            # (c_sub*W2P, Dp) x (Q_SUB*R, Dp)^T -> (c_sub*W2P, Q_SUB*R);
            # the mask lane adds 0/-inf per token row during the contraction
            s = jax.lax.dot_general(
                chunk, qw, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            s3 = s.reshape(c_sub, w2p, q_sub * r)  # sublane split: free
            per_cand = jnp.max(s3, axis=1)         # (c_sub, Q_SUB*R)
            # segmented lane sum over each query's R columns via MXU
            q_parts.append(jnp.dot(per_cand, sel,
                                   preferred_element_type=jnp.float32))
        o_ref[pl.ds(t * c_sub, c_sub), :] = jnp.concatenate(q_parts, axis=1)


def pack_candidate_pool(tokens, *, w2p: int | None = None,
                        dtype=jnp.bfloat16):
    """(C, W2, D) candidate token embeddings -> (C, W2P, Dp) padded pool in
    ``dtype`` with the additive token mask (0 real / -inf pad) embedded in
    the last lane (activated by project_queries' constant-1 lane).
    w2p defaults to W2 rounded up to the 8-sublane granularity."""
    c, w2, d = tokens.shape
    if w2p is None:
        w2p = _round_up(w2, 8)
    dp = _round_up(d + 1, LANE)  # reserve the mask lane
    if w2 > w2p:
        raise ValueError(f"candidate length {w2} exceeds W2P={w2p}")
    pool = jnp.zeros((c, w2p, dp), dtype)
    pool = pool.at[:, :w2, :d].set(tokens.astype(dtype))
    pool = pool.at[:, w2:, dp - 1].set(NEG_INF)
    return pool


def mask_out_candidates(pool, start: int):
    """Mark candidates [start:] as padding (engine pool-size alignment)."""
    return pool.at[start:, :, -1].set(NEG_INF)


def mask_candidate_rows(pool, rows):
    """Mark the given candidate rows as padding — arbitrary-row variant
    of mask_out_candidates (tombstone deletes; float pools are always
    candidate-major, so row i IS candidate i)."""
    return pool.at[rows, :, -1].set(NEG_INF)


def project_queries(q_tokens, w, *, dtype=jnp.bfloat16):
    """(Nq, W1, D) x (M, D, D) -> (Nq, M*W1, Dp): each query's tokens
    pre-multiplied by every metric matrix (amortized over the whole pool);
    the last lane is 1.0 so the pool's mask lane contributes additively."""
    nq, w1, d = q_tokens.shape
    m = w.shape[0]
    dp = _round_up(d + 1, LANE)
    qw = jnp.einsum("nid,mde->nmie", q_tokens, w,
                    precision=jax.lax.Precision.HIGHEST)
    qw = qw.reshape(nq, m * w1, d)
    qw = _pad_last(qw, dp)
    return qw.at[:, :, dp - 1].set(1.0).astype(dtype)


C_SUB_BF16 = 64   # tuned on v5e with auto w2p: 64 ~ 32 > 16 > 8
                  # (106.6M pairs/s at 256q x 262k)


def bilinear_maxsim_scores(qw, pool, *, c_block: int = C_BLOCK,
                           c_sub: int = C_SUB_BF16, q_sub: int = Q_SUB,
                           q_block: int | None = None,
                           interpret: bool | None = None):
    """Score every query against every candidate.

    qw:   (Nq, R, Dp)   from project_queries (R = M*W1)
    pool: (C, W2P, Dp)  from pack_candidate_pool; C % c_block == 0
    Returns (Nq, C) f32 scores: sum_m sum_i max_j q_i W_m c_j.
    """
    if interpret is None:
        interpret = not _on_tpu()
    nq, rows_per_q, dp = qw.shape
    c, w2p, dp2 = pool.shape
    assert dp == dp2
    # the REQUESTED pair must be consistent (like the int8 path): only a
    # pool-driven c_block shrink may then shrink c_sub with it via gcd
    if c_block % min(c_sub, c_block):
        raise ValueError(f"c_sub {c_sub} must divide c_block {c_block}")
    c_block = _fit_c_block(c, c_block, min(c_sub, c))
    c_sub = min(c_sub, c_block)
    if c_block % c_sub:
        # a shrunken tile (e.g. a 96-candidate pool against the 128/64
        # defaults) keeps working by shrinking the inner chunk too; any
        # gcd is row-legal (chunk rows are c_sub * w2p, w2p 8-aligned)
        c_sub = math.gcd(c_sub, c_block)
    # pad query count: to the 128-lane output tile on TPU (so the output
    # streams block-by-block), to q_sub under the interpreter (cheap tests).
    # Padded queries are all-zero rows INCLUDING the mask-activation lane,
    # so their scores are 0 and sliced off below.  For latency-critical tiny
    # query batches pass q_block=q_sub: the sub-128-lane output stays
    # VMEM-resident across the grid, which is fine when (C, q_block) fits.
    q_align = q_sub if interpret else (q_block or Q_BLOCK)
    nq_pad = _round_up(nq, q_align)
    q_sub = min(q_sub, nq_pad)  # tiny query batches shrink the inner chunk
    if nq_pad % q_sub:
        raise ValueError(f"q_sub {q_sub} must divide padded queries "
                         f"{nq_pad}")
    if nq_pad != nq:
        qw = jnp.pad(qw, ((0, nq_pad - nq), (0, 0), (0, 0)))
    qw_flat = qw.reshape(nq_pad * rows_per_q, dp)
    pool_flat = pool.reshape(c * w2p, dp)

    grid = (c // c_block,)
    kernel = functools.partial(_maxsim_kernel, c_block=c_block, c_sub=c_sub,
                               q_sub=q_sub, w2p=w2p, rows_per_q=rows_per_q,
                               nq=nq_pad)
    flops = 2 * nq_pad * c * rows_per_q * w2p * dp
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((nq_pad * rows_per_q, dp), lambda j: (0, 0)),
            pl.BlockSpec((c_block * w2p, dp), lambda j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((c_block, nq_pad), lambda j: (j, 0)),
        out_shape=jax.ShapeDtypeStruct((c, nq_pad), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # parallel: every candidate tile writes a distinct output block
            # ("arbitrary" would make Mosaic hold the whole output resident
            # in VMEM as a potential cross-step reduction)
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=qw.size * qw.dtype.itemsize
            + pool.size * pool.dtype.itemsize
            + c * nq_pad * 4,
            transcendentals=0,
        ),
    )(qw_flat, pool_flat)
    return out.T[:nq]


def bilinear_maxsim_scores_reference(q_tokens, cand_tokens, w):
    """Unfused reference for testing: materializes the full map."""
    s = jnp.einsum("qid,mde,cje->qmicj", q_tokens, w, cand_tokens,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.sum(jnp.max(s, axis=-1), axis=(1, 2))


# ===========================================================================
# int8-quantized retrieval path (2x MXU rate, half the HBM footprint)
# ===========================================================================
#
# Quantization layout chosen so NO per-element rescale touches the big
# (rows x cols) similarity tile -- on the first int8 attempt the VPU
# rescale of every s[i,j] cost more than the int8 matmul saved:
#
# * ONE symmetric scale per CANDIDATE (not per token): a positive scalar
#   commutes with the max over that candidate's tokens, so the max runs on
#   raw int32 accumulators and the scale multiplies the (c_sub, cols)
#   post-max tile -- 48x less VPU work.
# * padded token rows REPLICATE the candidate's first token instead of
#   using a mask: duplicates never change a max, so padding is exact and
#   costs nothing in-kernel.
# * per-query-row scales fold into the 0/1 selector matrix, so the
#   lane-segmented sum applies them inside the small MXU matmul.
# * pool-padding (fake) candidates get scale 0 and an additive -inf in a
#   tiny (C, 2) bf16 aux operand applied post-max.

AUX_LANES = 2  # lane 0 = per-candidate scale, lane 1 = additive mask


def _quantize_rows(x):
    """(rows, d) f32 -> (int8 rows, f32 per-row scales).  Shared helper for
    per-row symmetric quantization (query projection path)."""
    absmax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale[:, 0]


def pack_candidate_pool_int8(tokens, *, w2p: int | None = None,
                             layout: str = "candmaj"):
    """(C, W2, D) -> (pool_i8 (C, W2P, Dp) int8, aux (C, 2) bf16 with
    lane0 = per-candidate dequant scale, lane1 = additive post-max mask).
    w2p defaults to W2 rounded up to the 8-sublane granularity.

    ``layout="tokmaj"`` stores each C_SUB_INT8-candidate group
    TOKEN-MAJOR (rows = token * c_sub + cand within the group): the
    kernel's max-over-tokens then reduces over the OUTER axis — whole
    contiguous (c_sub, cols) tiles of elementwise maxima instead of
    strided sublane reductions — measured +4.7% on v5e (docs/PERF.md r3
    part 2).  Requires C divisible by C_SUB_INT8 (QueryEngine pads to
    c_block multiples, which covers it); score with
    ``bilinear_maxsim_scores_int8(..., layout="tokmaj")``.  The outer
    array shape is unchanged, so chunk SLICING at c_block boundaries
    still works; only per-candidate row semantics differ."""
    c, w2, d = tokens.shape
    if w2p is None:
        w2p = _round_up(w2, 8)
    dp = _round_up(d, LANE)
    if w2 > w2p:
        raise ValueError(f"candidate length {w2} exceeds W2P={w2p}")
    absmax = jnp.max(jnp.abs(tokens), axis=(1, 2), keepdims=False)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(tokens / scale[:, None, None]), -127,
                 127).astype(jnp.int8)
    pool = jnp.zeros((c, w2p, dp), jnp.int8)
    pool = pool.at[:, :w2, :d].set(q)
    # duplicate-token padding: a copy of token 0 never changes the max
    if w2p > w2:
        pool = pool.at[:, w2:, :d].set(q[:, 0:1, :])
    pool = _apply_pool_layout(pool, layout)
    aux = jnp.zeros((c, AUX_LANES), jnp.bfloat16)
    aux = aux.at[:, 0].set(scale.astype(jnp.bfloat16))
    return pool, aux


def _apply_pool_layout(pool, layout: str):
    """candmaj (C, W2P, Dp) -> the requested storage layout (shared by
    the int8 and int4 packers; see pack_candidate_pool_int8)."""
    if layout == "candmaj":
        return pool
    if layout != "tokmaj":
        raise ValueError(f"unknown pool layout {layout!r}")
    c, w2p, dp = pool.shape
    g = min(C_SUB_INT8, c)
    if c % g:
        raise ValueError(
            f"tokmaj layout needs pool size {c} divisible by the "
            f"candidate group {g} (pad the pool to a c_block "
            f"multiple first, as QueryEngine does)")
    return pool.reshape(c // g, g, w2p, dp).transpose(0, 2, 1, 3) \
        .reshape(c, w2p, dp)


def mask_out_candidates_int8(aux, start: int):
    """Mark candidates [start:] as pool padding: scale 0 + -inf additive."""
    aux = aux.at[start:, 0].set(0.0)
    return aux.at[start:, 1].set(NEG_INF)


def mask_candidate_rows_int8(aux, rows):
    """Arbitrary-row variant of mask_out_candidates_int8 (tombstone
    deletes).  aux stays candidate-major under every pool layout
    (_apply_pool_layout touches only the pool), so this is correct for
    tokmaj pools too."""
    aux = aux.at[rows, 0].set(0.0)
    return aux.at[rows, 1].set(NEG_INF)


def project_queries_int8(q_tokens, w):
    """(Nq, W1, D) x (M, D, D) -> (qw_i8 (Nq, R, Dp) int8,
    q_scales (Nq, R) f32 per-row)."""
    nq, w1, d = q_tokens.shape
    m = w.shape[0]
    dp = _round_up(d, LANE)
    qw = jnp.einsum("nid,mde->nmie", q_tokens, w,
                    precision=jax.lax.Precision.HIGHEST)
    qw = qw.reshape(nq * m * w1, d)
    absmax = jnp.max(jnp.abs(qw), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    qi = jnp.clip(jnp.round(qw / scale), -127, 127).astype(jnp.int8)
    out = jnp.zeros((nq * m * w1, dp), jnp.int8).at[:, :d].set(qi)
    return (out.reshape(nq, m * w1, dp),
            scale[:, 0].reshape(nq, m * w1).astype(jnp.float32))


def _maxsim_int8_kernel(qw_ref, qs_ref, pool_ref, aux_ref, o_ref, *, c_block,
                        c_sub, q_sub, w2p, rows_per_q, nq):
    """int8 variant: int32 max first, scales applied post-max.

    qw_ref:   (NQ*R, Dp) int8;  qs_ref: (1, NQ*R) bf16 query-row scales
    pool_ref: (C_BLOCK*W2P, Dp) int8 (duplicate-token padded)
    aux_ref:  (C_BLOCK, 2) bf16 (per-candidate scale, post-max mask)
    o_ref:    (C_BLOCK, NQ) f32
    """
    r = rows_per_q
    row_q = jax.lax.broadcasted_iota(jnp.int32, (q_sub * r, q_sub), 0) // r
    col_q = jax.lax.broadcasted_iota(jnp.int32, (q_sub * r, q_sub), 1)
    sel = (row_q == col_q).astype(jnp.float32)

    for t in range(c_block // c_sub):
        rows = c_sub * w2p
        chunk = pool_ref[pl.ds(t * rows, rows), :]
        sc = aux_ref[pl.ds(t * c_sub, c_sub), 0:1].astype(jnp.float32)
        msk = aux_ref[pl.ds(t * c_sub, c_sub), 1:2].astype(jnp.float32)
        q_parts = []
        for qb in range(nq // q_sub):
            qw = qw_ref[pl.ds(qb * q_sub * r, q_sub * r), :]
            sq = qs_ref[0:1, pl.ds(qb * q_sub * r, q_sub * r)].astype(
                jnp.float32)
            s_i32 = jax.lax.dot_general(
                chunk, qw, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            s3 = s_i32.reshape(c_sub, w2p, q_sub * r)
            # int32 max FIRST (per-candidate scale and per-query-row scale
            # are column/row-constant over each max group); then the cheap
            # (c_sub, cols) rescale and the selector sum
            per_cand = jnp.max(s3, axis=1).astype(jnp.float32) * sq
            q_parts.append(jnp.dot(per_cand * sc, sel,
                                   preferred_element_type=jnp.float32) + msk)
        o_ref[pl.ds(t * c_sub, c_sub), :] = jnp.concatenate(q_parts, axis=1)


def _tree_max_axis0(s, n):
    """Elementwise max over axis 0 of (n, ...) by halving — log2(n)
    whole-tile maximum ops (no strided sublane reductions)."""
    while n > 1:
        if n % 2:
            s = jnp.concatenate(
                [jnp.maximum(s[0:1], s[n - 1:n]), s[1:n - 1]], axis=0)
            n -= 1
        h = n // 2
        s = jnp.maximum(s[:h], s[h:n])
        n = h
    return s[0]


def _maxsim_int8_tokmaj_kernel(qw_ref, qs_ref, pool_ref, aux_ref, o_ref, *,
                               c_block, c_sub, q_sub, w2p, rows_per_q, nq):
    """Token-major int8 variant: each c_sub-candidate group's rows are
    ordered token * c_sub + cand (pack_candidate_pool_int8
    layout="tokmaj"), so the MXU product reshapes to (w2p, c_sub, cols)
    and the token max is a fold over the OUTER axis — contiguous
    (c_sub, cols) tiles of elementwise maxima, where the candidate-major
    kernel reduces across strided sublanes.  w2p factorizes as
    8 * (w2p // 8): the first factor folds with an unrolled maximum
    chain, the remainder with the halving tree.  Measured 193.3M vs
    184.6M pairs/s on v5e at 1024/128 (docs/PERF.md r3 part 2)."""
    r = rows_per_q
    row_q = jax.lax.broadcasted_iota(jnp.int32, (q_sub * r, q_sub), 0) // r
    col_q = jax.lax.broadcasted_iota(jnp.int32, (q_sub * r, q_sub), 1)
    sel = (row_q == col_q).astype(jnp.float32)
    a0 = 8 if w2p % 8 == 0 else 1
    b0 = w2p // a0

    for t in range(c_block // c_sub):
        rows = c_sub * w2p
        chunk = pool_ref[pl.ds(t * rows, rows), :]
        sc = aux_ref[pl.ds(t * c_sub, c_sub), 0:1].astype(jnp.float32)
        msk = aux_ref[pl.ds(t * c_sub, c_sub), 1:2].astype(jnp.float32)
        q_parts = []
        for qb in range(nq // q_sub):
            qw = qw_ref[pl.ds(qb * q_sub * r, q_sub * r), :]
            sq = qs_ref[0:1, pl.ds(qb * q_sub * r, q_sub * r)].astype(
                jnp.float32)
            s_i32 = jax.lax.dot_general(
                chunk, qw, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            cols = q_sub * r
            if a0 > 1:
                s4 = s_i32.reshape(a0, b0, c_sub, cols)
                acc = s4[0]
                for j in range(1, a0):
                    acc = jnp.maximum(acc, s4[j])     # (b0, c_sub, cols)
                per = _tree_max_axis0(acc, b0)         # (c_sub, cols)
            else:
                per = _tree_max_axis0(
                    s_i32.reshape(w2p, c_sub, cols), w2p)
            per_cand = per.astype(jnp.float32) * sq
            q_parts.append(jnp.dot(per_cand * sc, sel,
                                   preferred_element_type=jnp.float32)
                           + msk)
        o_ref[pl.ds(t * c_sub, c_sub), :] = jnp.concatenate(q_parts, axis=1)


C_SUB_INT8 = 128  # tuned on v5e at vmem 100MB: with the default 16MB
                  # scoped-vmem budget 128 overflowed and 64 was the
                  # ceiling (154.7M); raising vmem_limit_bytes unlocks it
C_BLOCK_INT8 = 1024  # int8-only ladder at 256q x 262k (vmem 100MB):
                     # 256/64 = 180.2M, 512/128 = 183.7M,
                     # 1024/128 = 185.0M pairs/s (docs/PERF.md r3);
                     # bf16 keeps the global C_BLOCK (2x the chunk bytes)
VMEM_LIMIT_INT8_MB = 100  # Mosaic's default scoped-VMEM budget is 16MB;
                          # the v5e has 128MB per core.  Raising the limit
                          # is what makes the big tiles above compile --
                          # every variant beyond 256/64 overflowed at the
                          # default (measured, docs/PERF.md r3)

# per-mode candidate-tile defaults -- pool padding/chunking must use the
# mode's block (the engine reads this table; keeping it NEXT to the
# kernels prevents the pairing from drifting)
C_BLOCK_BY_MODE = {"int8": C_BLOCK_INT8, "int4": C_BLOCK}


def bilinear_maxsim_scores_int8(qw_i8, q_scales, pool_i8, aux, *,
                                c_block: int = C_BLOCK_INT8,
                                c_sub: int = C_SUB_INT8,
                                q_sub: int = Q_SUB,
                                q_block: int | None = None,
                                vmem_limit_mb: int | None
                                = VMEM_LIMIT_INT8_MB,
                                layout: str = "candmaj",
                                interpret: bool | None = None):
    """int8 scoring: (Nq, C) f32 approximate scores (per-candidate
    symmetric quantization, ~1-3% score error; padding is exact).  Rerank
    the shortlist with score_pairs when exactness matters.

    ``layout`` must match how the pool was packed: "candmaj" (default)
    or "tokmaj" (token-major groups — the faster serving path; see
    pack_candidate_pool_int8)."""
    if interpret is None:
        interpret = not _on_tpu()
    nq, rows_per_q, dp = qw_i8.shape
    c = pool_i8.shape[0]
    w2p = pool_i8.shape[1]
    if layout == "tokmaj":
        # the group size is pinned at pack time: c_sub must equal it
        g = min(C_SUB_INT8, c)
        if c % g:
            raise ValueError(f"tokmaj pool size {c} not divisible by "
                             f"its candidate group {g}")
        if c_sub != C_SUB_INT8 and c_sub != g:
            raise ValueError(
                f"tokmaj pools are packed in groups of {g}; c_sub "
                f"{c_sub} cannot apply (repack candmaj for custom "
                f"c_sub)")
        c_sub = g
    elif layout != "candmaj":
        raise ValueError(f"unknown pool layout {layout!r}")
    # the REQUESTED pair must be consistent (a non-dividing c_sub would
    # silently leave output rows unwritten -- the kernel iterates
    # c_block // c_sub sub-chunks); only a pool-driven c_block shrink may
    # then shrink c_sub with it
    if c_block % min(c_sub, c_block):
        raise ValueError(f"c_sub {c_sub} must divide c_block {c_block}")
    # small pools: one tile covers everything; off-block pools shrink to
    # the largest fitting c_sub-multiple tile
    c_block = _fit_c_block(c, c_block, min(c_sub, c))
    c_sub = min(c_sub, c_block)
    if c_block % c_sub:
        # a shrunken tile (e.g. a 192-candidate pool against the 1024/128
        # defaults) keeps working by shrinking the inner chunk too; any
        # gcd is row-legal (chunk rows are c_sub * w2p, w2p 8-aligned)
        c_sub = math.gcd(c_sub, c_block)
    if layout == "tokmaj" and (c_block % g or c_sub != g):
        # token-major rows interleave candidates within g-sized groups
        # at PACK time: a tile that is not a whole number of groups
        # would reshape token/candidate indices into each other and
        # silently scramble scores
        raise ValueError(
            f"tokmaj pools are packed in candidate groups of {g}; "
            f"c_block {c_block} must be a multiple of the group "
            f"(pass c_block >= {g}, or repack candmaj)")
    q_align = q_sub if interpret else (q_block or Q_BLOCK)
    nq_pad = _round_up(nq, q_align)
    q_sub = min(q_sub, nq_pad)
    if nq_pad % q_sub:
        raise ValueError(f"q_sub {q_sub} must divide padded queries "
                         f"{nq_pad}")
    if nq_pad != nq:
        qw_i8 = jnp.pad(qw_i8, ((0, nq_pad - nq), (0, 0), (0, 0)))
        q_scales = jnp.pad(q_scales, ((0, nq_pad - nq), (0, 0)))
    qw_flat = qw_i8.reshape(nq_pad * rows_per_q, dp)
    qs_flat = q_scales.reshape(1, nq_pad * rows_per_q).astype(jnp.bfloat16)
    pool_flat = pool_i8.reshape(c * w2p, dp)

    kern = (_maxsim_int8_tokmaj_kernel if layout == "tokmaj"
            else _maxsim_int8_kernel)
    kernel = functools.partial(kern, c_block=c_block,
                               c_sub=c_sub, q_sub=q_sub, w2p=w2p,
                               rows_per_q=rows_per_q, nq=nq_pad)
    out = pl.pallas_call(
        kernel,
        grid=(c // c_block,),
        in_specs=[
            pl.BlockSpec((nq_pad * rows_per_q, dp), lambda j: (0, 0)),
            pl.BlockSpec((1, nq_pad * rows_per_q), lambda j: (0, 0)),
            pl.BlockSpec((c_block * w2p, dp), lambda j: (j, 0)),
            pl.BlockSpec((c_block, AUX_LANES), lambda j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((c_block, nq_pad), lambda j: (j, 0)),
        out_shape=jax.ShapeDtypeStruct((c, nq_pad), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            **({"vmem_limit_bytes": vmem_limit_mb * 1024 * 1024}
               if vmem_limit_mb else {}),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nq_pad * c * rows_per_q * w2p * dp,
            bytes_accessed=qw_flat.size + pool_flat.size
            + aux.size * 2 + c * nq_pad * 4,
            transcendentals=0,
        ),
    )(qw_flat, qs_flat, pool_flat, aux)
    return out.T[:nq]


# ===========================================================================
# int4-quantized retrieval path (2x the int8 MXU rate, quarter the HBM)
# ===========================================================================
#
# Same layout/scale design as int8 v2 above (per-candidate scales commute
# with the token max; duplicate-token padding; post-max rescale), narrowed
# to the +-7 int4 grid.  The MXU's int4 throughput is 2x int8 on v5e at
# ~3-8% score error -- a first-stage shortlist dtype, reranked exactly by
# score_pairs.
#
# Storage note: the packed arrays carry +-7 values in INT8 and the scorer
# casts to int4 INSIDE its jit trace.  Sub-byte device arrays cannot cross
# a jit/dispatch boundary on remote-tunnel backends (the transfer client
# recursively re-enters jit packing them), so materializing a resident
# int4 pool is deferred to directly-attached chips; the MXU still executes
# true int4 x int4 contractions either way.

INT4_BOUND = 7.0
INT4_CLIP_QUANTILE = 0.995  # scale to the 99.5th |value| percentile, not
#   the absmax: outlier tokens saturate but the other 99.5% of values get
#   a ~1.3x finer grid — measured top-10 agreement 0.50 -> 0.59 at 65k
#   (docs/PERF.md round-5 int4 scheme sweep; per-token scales and query
#   clipping measured WORSE or equal, so this is the ceiling for a
#   15-level grid on this score distribution)


def pack_candidate_pool_int4(tokens, *, w2p: int | None = None,
                             layout: str = "candmaj",
                             clip_quantile: float | None
                             = INT4_CLIP_QUANTILE):
    """(C, W2, D) -> (pool_i4 (C, W2P, Dp) int4, aux (C, 2) bf16).
    int4 analogue of pack_candidate_pool_int8 (incl. the "tokmaj"
    layout; same candidate group).

    CONTRACT (VERDICT round-4 item 5, measured): int4 is a
    **capacity-only** mode — 2x int8's pool per chip, NO v5e MXU speedup
    (Mosaic unpacks to int8), and top-10 agreement vs bf16 stays ~0.6
    under every scale granularity tried (per-candidate absmax/clip,
    per-token, query-side clip).  Serve int4 only behind
    ``query_rerank`` (shortlist recall@50 ~0.87 at 262k); never as the
    final ranking stage."""
    c, w2, d = tokens.shape
    if w2p is None:
        w2p = _round_up(w2, 8)
    dp = _round_up(d, LANE)
    if w2 > w2p:
        raise ValueError(f"candidate length {w2} exceeds W2P={w2p}")
    mags = jnp.abs(tokens).reshape(c, w2 * d)
    if clip_quantile is None:
        absmax = jnp.max(mags, axis=1)
    else:
        absmax = jnp.quantile(mags, clip_quantile, axis=1)
    scale = jnp.maximum(absmax, 1e-12) / INT4_BOUND
    q = jnp.clip(jnp.round(tokens / scale[:, None, None]), -INT4_BOUND,
                 INT4_BOUND).astype(jnp.int8)
    pool = jnp.zeros((c, w2p, dp), jnp.int8)
    pool = pool.at[:, :w2, :d].set(q)
    if w2p > w2:  # duplicate-token padding: never changes the max
        pool = pool.at[:, w2:, :d].set(q[:, 0:1, :])
    pool = _apply_pool_layout(pool, layout)
    aux = jnp.zeros((c, AUX_LANES), jnp.bfloat16)
    aux = aux.at[:, 0].set(scale.astype(jnp.bfloat16))
    return pool, aux


def project_queries_int4(q_tokens, w):
    """(Nq, W1, D) x (M, D, D) -> (qw_i4 (Nq, R, Dp) int4,
    q_scales (Nq, R) f32 per-row)."""
    nq, w1, d = q_tokens.shape
    m = w.shape[0]
    dp = _round_up(d, LANE)
    qw = jnp.einsum("nid,mde->nmie", q_tokens, w,
                    precision=jax.lax.Precision.HIGHEST)
    qw = qw.reshape(nq * m * w1, d)
    absmax = jnp.max(jnp.abs(qw), axis=-1, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / INT4_BOUND
    qi = jnp.clip(jnp.round(qw / scale), -INT4_BOUND,
                  INT4_BOUND).astype(jnp.int8)
    out = jnp.zeros((nq * m * w1, dp), jnp.int8).at[:, :d].set(qi)
    return (out.reshape(nq, m * w1, dp),
            scale[:, 0].reshape(nq, m * w1).astype(jnp.float32))


# aux layout is shared with int8, so masking is too
mask_out_candidates_int4 = mask_out_candidates_int8
mask_candidate_rows_int4 = mask_candidate_rows_int8

C_SUB_INT4 = 128  # tuned on v5e: 128 > 64 > 32 (int4 operands halve the
                  # VMEM per chunk, so the tile that OOM'd at int8 fits);
                  # measured 156.3M pairs/s -- BELOW int8's 174.2M: v5e's
                  # MXU has no faster int4 mode, Mosaic unpacks to int8
                  # (docs/PERF.md int4 section)


def bilinear_maxsim_scores_int4(qw_i4, q_scales, pool_i4, aux, *,
                                c_block: int = C_BLOCK,
                                c_sub: int = C_SUB_INT4,
                                q_sub: int = Q_SUB,
                                q_block: int | None = None,
                                layout: str = "candmaj",
                                interpret: bool | None = None):
    """int4 scoring: (Nq, C) f32 approximate scores.  The kernel body is
    the int8 one (dot_general accumulates any int operand pair into int32);
    only the operand dtype and the quantization grid differ.  Operands
    arrive as +-7 values in int8 (see the storage note above) and are cast
    to int4 here, inside the caller's trace, so Mosaic emits true int4
    contractions.  Under the interpreter (CPU backends) they stay int8 --
    XLA CPU cannot lower sub-byte dots -- which is value-identical."""
    import jax.core

    if interpret is None:
        interpret = not _on_tpu()
    if not interpret and not isinstance(qw_i4, jax.core.Tracer):
        # called EAGERLY on a TPU backend: jit the whole cast+score so
        # the int4 intermediates never cross a dispatch boundary (on
        # remote-attached backends the transfer client cannot pack
        # sub-byte arrays — see the storage note above)
        fn = jax.jit(functools.partial(
            bilinear_maxsim_scores_int4, c_block=c_block, c_sub=c_sub,
            q_sub=q_sub, q_block=q_block, layout=layout,
            interpret=interpret))
        return fn(qw_i4, q_scales, pool_i4, aux)
    if not interpret:
        qw_i4 = qw_i4.astype(jnp.int4)
        pool_i4 = pool_i4.astype(jnp.int4)
    return bilinear_maxsim_scores_int8(qw_i4, q_scales, pool_i4, aux,
                                       c_block=c_block, c_sub=c_sub,
                                       q_sub=q_sub, q_block=q_block,
                                       layout=layout, interpret=interpret)
