"""int8 fidelity error analysis at scale (VERDICT round-4 item 6).

Question: why does int8 top-10 agreement drift with pool size
(0.875 @ 262k -> 0.825 @ 1M, BENCH_r04) while top-10-in-top-50 recall
stays 1.0 — and does it plateau or keep degrading toward 10M?

Method (on-chip, same synthetic family as bench.py's pool suite):

1. **Per-pair quantization error** is pool-size INDEPENDENT by
   construction (each candidate quantizes alone): measured directly on a
   2,048-candidate subpool scored by both engines (full score vectors).
2. **Top-k score gaps** DO shrink with pool size (order statistics: the
   upper tail crowds as N grows).  Measured from the exact engine's
   top-50 score rows at each pool size.
3. Agreement@10 falls when |error_i - error_j| exceeds the rank-boundary
   gap; with gap_10(N) shrinking and sigma_err constant, agreement must
   fall with N — the drift is geometry, not a quantization bug.
4. **Serving guidance** comes from rank displacement: for every exact
   top-10 candidate, its rank in the int8 ordering; the rerank shortlist
   S must exceed the worst displacement.  The artifact reports the
   displacement distribution per pool size and a fitted S(N) rule.

Writes docs/runs/int8_error_analysis/summary.json; the PERF.md round-5
section carries the table.  Run: python examples/int8_error_analysis.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from mms_answer_selection_tpu.utils.compile_cache import (
        enable_compilation_cache)
    enable_compilation_cache()
    import jax.numpy as jnp
    from mms_answer_selection_tpu.models.mms_qa import MMSQAConfig
    from mms_answer_selection_tpu.serve import QueryEngine

    d, w1, w2, m, vocab = 50, 40, 40, 4, 50000
    nq, k, s_max = 64, 10, 512
    cfg = MMSQAConfig(vocab_size=vocab, embed_dim=d, question_len=w1,
                      answer_len=w2, sim_measures=m)
    rng = np.random.default_rng(7)
    embed_table = jnp.asarray(
        rng.normal(size=(vocab, d)).astype(np.float32) * 0.3)
    w = jnp.asarray(rng.normal(size=(m, d, d)).astype(np.float32) * 0.05)
    params = {"embed": {"w": embed_table}, "sim": {"w": w}}
    queries = rng.integers(0, vocab, (nq, w1)).astype(np.int32)

    def build(mode, cand_ids, scan=True):
        eng = QueryEngine(params, cfg,
                          pool_dtype=(jnp.bfloat16 if mode == "bf16"
                                      else mode), scan_chunks=scan)
        eng.build_index(cand_ids)
        return eng

    out = {"n_queries": nq, "k": k, "s_max": s_max}
    t0 = time.time()

    # ---- 1. per-pair error distribution (pool-size independent)
    sub_ids = rng.integers(0, vocab, (2048, w2)).astype(np.int32)
    e_bf = build("bf16", sub_ids)
    v_bf, i_bf = e_bf.query(queries, k=2048)
    e_i8 = build("int8", sub_ids)
    v_i8, i_i8 = e_i8.query(queries, k=2048)
    v_bf, i_bf = np.asarray(v_bf, np.float64), np.asarray(i_bf)
    v_i8, i_i8 = np.asarray(v_i8, np.float64), np.asarray(i_i8)
    # re-key by candidate index -> aligned per-pair scores
    bf_by_idx = np.empty_like(v_bf)
    i8_by_idx = np.empty_like(v_i8)
    for qi in range(nq):
        bf_by_idx[qi, i_bf[qi]] = v_bf[qi]
        i8_by_idx[qi, i_i8[qi]] = v_i8[qi]
    err = i8_by_idx - bf_by_idx
    out["per_pair_error"] = {
        "sigma": float(err.std()),
        "mean": float(err.mean()),
        "p99_abs": float(np.quantile(np.abs(err), 0.99)),
        "rel_sigma_vs_top_score": float(err.std()
                                        / np.abs(v_bf[:, 0]).mean()),
    }
    print(f"per-pair error: {out['per_pair_error']} "
          f"({time.time()-t0:.0f}s)", flush=True)
    del e_bf, e_i8

    # ---- 2-4. per pool size: gaps, agreement, displacement
    for pool in (262144, 1048576):
        tag = f"pool_{pool}"
        cand_ids = rng.integers(0, vocab, (pool, w2)).astype(np.int32)
        eng_bf = build("bf16", cand_ids, scan=pool <= 300_000)
        vb, ib = eng_bf.query(queries, k=50)
        vb, ib = np.asarray(vb, np.float64), np.asarray(ib)
        del eng_bf
        import gc
        gc.collect()
        eng = build("int8", cand_ids)
        vi, ii = eng.query(queries, k=s_max)
        vi, ii = np.asarray(vi, np.float64), np.asarray(ii)
        del eng
        gc.collect()

        gaps10 = vb[:, 9] - vb[:, 10]
        gaps1 = vb[:, 0] - vb[:, 1]
        agree = np.mean([len(set(ib[q, :k]) & set(ii[q, :k])) / k
                         for q in range(nq)])
        # rank displacement of every exact top-10 candidate in the int8
        # ordering (s_max+1 when pushed beyond the measured window)
        disp = []
        for q in range(nq):
            pos = {c: r for r, c in enumerate(ii[q])}
            disp.extend(pos.get(c, s_max) + 1 for c in ib[q, :k])
        disp = np.asarray(disp)
        out[tag] = {
            "gap10_median": float(np.median(gaps10)),
            "gap10_p10": float(np.quantile(gaps10, 0.10)),
            "gap1_median": float(np.median(gaps1)),
            "top10_agreement": float(agree),
            "displacement_p50": float(np.quantile(disp, 0.50)),
            "displacement_p99": float(np.quantile(disp, 0.99)),
            "displacement_max": int(disp.max()),
            "recall10_in_s": {
                str(s): float(np.mean(disp <= s))
                for s in (10, 20, 50, 100, 200, s_max)},
        }
        print(f"{tag}: {out[tag]} ({time.time()-t0:.0f}s)", flush=True)

    # ---- fit: gap10(N) ~ c * N^-a from the two measured points, and the
    # shortlist rule S(N) from worst displacement scaling
    g262 = out["pool_262144"]["gap10_median"]
    g1m = out["pool_1048576"]["gap10_median"]
    a = float(np.log(g262 / g1m) / np.log(1048576 / 262144))
    out["gap_scaling_exponent"] = a
    d262 = out["pool_262144"]["displacement_max"]
    d1m = out["pool_1048576"]["displacement_max"]
    b = float(np.log(max(d1m, 1) / max(d262, 1))
              / np.log(1048576 / 262144)) if d262 and d1m else 0.0
    out["displacement_scaling_exponent"] = b
    out["guidance"] = {
        "rule": "shortlist S(N) = max(50, 4 * worst_measured_disp * "
                "(N/1M)^b); recall@10 stays ~1.0 while the exact "
                "reranker owns the final order",
        "S_262k": int(max(50, 4 * d262)),
        "S_1m": int(max(50, 4 * d1m)),
        "S_4m_pred": int(max(50, 4 * d1m * (4 ** b))),
        "S_10m_pred": int(max(50, 4 * d1m * (10 ** b))),
    }
    out["wall_s"] = round(time.time() - t0, 1)
    dst = os.path.join(os.path.dirname(__file__), "..", "docs", "runs",
                       "int8_error_analysis")
    os.makedirs(dst, exist_ok=True)
    with open(os.path.join(dst, "summary.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
