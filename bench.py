"""Headline benchmark: learned-metric candidate pairs scored per second per
chip (BASELINE.md north-star target: >= 10M pairs/s/chip on v5e).

Scores NQ queries against a C-candidate pool under the v4 recipe's learned
bilinear metric (M=4 measures, D=50, 40 query tokens x 40 candidate tokens)
using the fused Pallas MaxSim kernel (ops/sim_cross_pallas.py): one MXU
matmul per (query, candidate-tile) with in-VMEM segmented max/sum -- the
(NQ*M*W1) x (C*W2) similarity tensor never materializes in HBM.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 1e7 (the >=10M pairs/s/chip target).

Usage: python bench.py [--pool C] [--queries NQ] [--iters N] [--secondary]
"""

import argparse
import json
import sys
import time

import numpy as np


def _quant_fns(mode: str):
    """(project, pack, score) triple for a quantized mode -- mirrors the
    engine's _QUANT table."""
    from mms_answer_selection_tpu.ops.sim_cross_pallas import (
        bilinear_maxsim_scores_int4, bilinear_maxsim_scores_int8,
        pack_candidate_pool_int4, pack_candidate_pool_int8,
        project_queries_int4, project_queries_int8)
    return {
        "int8": (project_queries_int8, pack_candidate_pool_int8,
                 bilinear_maxsim_scores_int8),
        "int4": (project_queries_int4, pack_candidate_pool_int4,
                 bilinear_maxsim_scores_int4),
    }[mode]


def run_maxsim_bench(pool_size: int, n_queries: int, iters: int,
                     warmup: int = 2, mode: str = "int8",
                     c_sub: int | None = None):
    import jax
    import jax.numpy as jnp
    from mms_answer_selection_tpu.ops.sim_cross_pallas import (
        bilinear_maxsim_scores, pack_candidate_pool, project_queries)

    from mms_answer_selection_tpu.ops.sim_cross_pallas import (
        C_BLOCK, C_BLOCK_BY_MODE)

    d, w1, w2, m = 50, 40, 40, 4
    blk = C_BLOCK_BY_MODE.get(mode, C_BLOCK)
    if pool_size % blk:  # kernel scores c_block-sized candidate tiles
        pool_size = -(-pool_size // blk) * blk
        print(f"pool rounded up to {pool_size} (c_block {blk})",
              file=sys.stderr)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(n_queries, w1, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(m, d, d)).astype(np.float32) * 0.05)
    cand = jnp.asarray(rng.normal(size=(pool_size, w2, d)).astype(np.float32))

    # the jitted fn reduces the scores to ONE scalar on-device; pulling that
    # scalar to the host each iteration is the completion fence (a bare
    # block_until_ready returns early for queued work on the axon tunnel,
    # and host-indexing a large device array through the tunnel stalls)
    if mode in ("int8", "int4"):
        # quantized serving paths (QueryEngine pool_dtype="int8"/"int4"):
        # ~0.4% / ~3-8% score error, exact padding, rerank for exactness
        project_q, pack_q, scores_q = _quant_fns(mode)
        kw = {} if c_sub is None else {"c_sub": c_sub}
        qw, qs = project_q(q, w)
        pool, aux = pack_q(cand)
        del cand
        fn = jax.jit(lambda a, b, c_, d_: jnp.sum(
            scores_q(a, b, c_, d_, **kw)))
        args = (qw, qs, pool, aux)
    else:
        qw = project_queries(q, w)                   # bf16 (NQ, M*W1, 128)
        pool = pack_candidate_pool(cand)             # bf16 (C, 48, 128)
        del cand
        fn = jax.jit(
            lambda qw_, p_: jnp.sum(bilinear_maxsim_scores(qw_, p_)))
        args = (qw, pool)

    float(fn(*args))                                 # compile + warm
    for _ in range(warmup):
        float(fn(*args))

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    t = float(np.median(times))
    pairs = n_queries * pool_size
    return pairs / t, {"seconds_per_launch": t, "pairs_per_launch": pairs,
                       "times": times, "mode": mode}


def run_latency_bench(pool_size: int, n_queries: int, iters: int = 20,
                      mode: str = "int8", k: int = 10):
    """p50 end-to-end query latency (BASELINE.json's latency north star):
    per dispatch, project the query tokens through the learned metric,
    score the full pool with the fused kernel, take top-k on-chip, and
    fetch the (Nq, k) winners to the host (the fetch IS the fence)."""
    import jax
    import jax.numpy as jnp
    from mms_answer_selection_tpu.ops.sim_cross_pallas import (
        bilinear_maxsim_scores, pack_candidate_pool, project_queries)

    d, w1, w2, m = 50, 40, 40, 4
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(n_queries, w1, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(m, d, d)).astype(np.float32) * 0.05)
    cand = jnp.asarray(rng.normal(size=(pool_size, w2, d)).astype(np.float32))
    q_block = 8 if n_queries <= 8 else 16 if n_queries <= 32 else None

    if mode in ("int8", "int4"):
        project_q, pack_q, scores_q = _quant_fns(mode)
        pool, aux = pack_q(cand)

        def fn(q_, w_, pool_, aux_):
            qw, qs = project_q(q_, w_)
            s = scores_q(qw, qs, pool_, aux_, q_block=q_block)
            return jax.lax.top_k(s, k)
        fn = jax.jit(fn)
        args = (q, w, pool, aux)
    else:
        pool = pack_candidate_pool(cand)

        def fn(q_, w_, pool_):
            qw = project_queries(q_, w_)
            s = bilinear_maxsim_scores(qw, pool_, q_block=q_block)
            return jax.lax.top_k(s, k)
        fn = jax.jit(fn)
        args = (q, w, pool)
    del cand

    np.asarray(fn(*args)[0])  # compile + warm
    np.asarray(fn(*args)[0])
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(*args)[0])  # small (Nq, k) host fetch = fence
        times.append(time.perf_counter() - t0)
    return float(np.median(times) * 1e3)


def run_train_bench(batch: int, iters: int, fused_k: int = 0):
    """Secondary: full v4 training steps/sec (fwd+bwd+AdaDelta).

    fused_k > 0 additionally measures ``Trainer.scan_train_steps`` --
    K steps per dispatch, which removes the per-step host round-trip
    (~25-30 ms through a remote tunnel) and shows the chip's actual
    training rate."""
    import jax
    import jax.numpy as jnp
    from mms_answer_selection_tpu.models.mms_qa import V4
    from mms_answer_selection_tpu.training import Trainer, TrainerConfig

    cfg = V4.__class__(**{**V4.__dict__, "vocab_size": 20000})
    tr = Trainer(cfg, TrainerConfig(batch_size=batch))
    params, state, opt_state = tr.init()
    rng = np.random.default_rng(0)
    b = {
        "question": jnp.asarray(rng.integers(0, 20000, (batch, 40)), jnp.int32),
        "answer": jnp.asarray(rng.integers(0, 20000, (batch, 40)), jnp.int32),
        "overlap_feat": jnp.asarray(rng.random((batch, 2)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 2, (batch,)), jnp.int32),
    }
    # host-read fences throughout: block_until_ready returns early for
    # queued work through the axon tunnel (and would let warmup COMPILES
    # leak into the timed region)
    out = tr._train_step(params, state, opt_state, b, jnp.asarray(0),
                         jax.random.PRNGKey(0))
    float(out[3])
    params, state, opt_state = out[:3]
    t0 = time.perf_counter()
    for i in range(iters):
        params, state, opt_state, loss = tr._train_step(
            params, state, opt_state, b, jnp.asarray(i + 1),
            jax.random.PRNGKey(i))
        float(loss)  # per-step fence: the per-dispatch training rate
    dt = (time.perf_counter() - t0) / iters
    detail = {"sec_per_step": dt, "batch": batch}
    if fused_k:
        stacked = {k_: jnp.stack([v] * fused_k) for k_, v in b.items()}
        key = jax.random.PRNGKey(1)
        out = tr.scan_train_steps(params, state, opt_state, stacked,
                                  iters + 1, key)
        float(out[3][-1])  # fence the compile + warmup run
        params, state, opt_state = out[:3]
        reps = 3
        times = []
        for r in range(reps):
            t0 = time.perf_counter()
            params, state, opt_state, losses = tr.scan_train_steps(
                params, state, opt_state, stacked,
                iters + 1 + (r + 1) * fused_k, key)
            float(losses[-1])  # host fence per call
            times.append(time.perf_counter() - t0)
        dt_f = float(np.median(times)) / fused_k
        detail["fused_sec_per_step"] = dt_f
        detail["fused_steps_per_sec"] = 1.0 / dt_f
        detail["fused_k"] = fused_k
    return 1.0 / dt, detail


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pool", type=int, default=262144)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--mode", default="int8",
                    choices=["int8", "int4", "bf16"])
    ap.add_argument("--c-sub", type=int, default=None,
                    help="override the kernel's candidate-chunk tile "
                         "(quantized modes; tuning)")
    ap.add_argument("--secondary", action="store_true",
                    help="also run the training-step benchmark (stderr)")
    ap.add_argument("--no-latency", action="store_true",
                    help="skip the p50 query-latency measurements")
    args = ap.parse_args()

    from mms_answer_selection_tpu.utils.compile_cache import (
        enable_compilation_cache)
    enable_compilation_cache()

    try:
        pairs_per_sec, detail = run_maxsim_bench(args.pool, args.queries,
                                                 args.iters, mode=args.mode,
                                                 c_sub=args.c_sub)
        lat = {}
        if not args.no_latency:
            lat["p50_query_latency_ms_1q"] = run_latency_bench(
                args.pool, 1, mode=args.mode)
            lat["p50_query_latency_ms_32q"] = run_latency_bench(
                args.pool, 32, mode=args.mode)
        if args.secondary:
            sps, d2 = run_train_bench(50, 20, fused_k=100)
            print(f"secondary: {sps:.1f} train steps/s {d2}", file=sys.stderr)
        print(json.dumps({
            "metric": "learned_metric_pairs_scored_per_sec_per_chip",
            "value": pairs_per_sec,
            "unit": "pairs/s",
            "vs_baseline": pairs_per_sec / 1e7,
            "mode": args.mode,
            "pool": args.pool,
            **lat,
        }))
    except Exception as e:  # noqa: BLE001
        print(f"bench failed: {type(e).__name__}: {e}", file=sys.stderr)
        print(json.dumps({
            "metric": "learned_metric_pairs_scored_per_sec_per_chip",
            "value": 0.0,
            "unit": "pairs/s",
            "vs_baseline": 0.0,
        }))
        sys.exit(1)


if __name__ == "__main__":
    main()
