"""Image-pair metric learning (the reference's multimodal path:
PairImageData + PairRankLoss + RankAccuracy) on a synthetic corpus.

    python examples/pair_image_metric.py [--pairs 64] [--steps 60]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=64)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--dir", default="/tmp/pair_corpus")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from mms_answer_selection_tpu.data.pair_image import (
        PairImageDataset, compute_image_mean, synthetic_pair_corpus)
    from mms_answer_selection_tpu.models.mms_qa import ConvBlock
    from mms_answer_selection_tpu.models.pair_image import (
        PairImageConfig, pair_image_apply, pair_image_init)
    from mms_answer_selection_tpu.training import SolverConfig, make_solver

    lf = synthetic_pair_corpus(args.dir, n_pairs=args.pairs, hw=16, seed=1)
    mean = compute_image_mean(lf, root=args.dir)
    ds = PairImageDataset(lf, batch_size=16, root=args.dir, seed=2,
                          mean=mean)

    cfg = PairImageConfig(height=16, width=16, channels=1,
                          blocks=(ConvBlock(3, 3, 8, "max", 2, 2),
                                  ConvBlock(3, 3, 16, "max", 2, 2)),
                          fc_dim=16)
    params, state = pair_image_init(jax.random.PRNGKey(0), cfg)
    solver = make_solver(SolverConfig(solver_type="adadelta"))
    opt_state = solver.init(params)

    @jax.jit
    def step(params, state, opt_state, batch, it):
        def loss_fn(p):
            out, ns = pair_image_apply(p, state, batch, cfg, train=True)
            return out["loss"], (ns, out["rank_accuracy"])

        (loss, (ns, acc)), g = jax.value_and_grad(loss_fn,
                                                  has_aux=True)(params)
        p2, o2 = solver.apply(params, g, opt_state, it)
        return p2, ns, o2, loss, acc

    for i in range(args.steps):
        raw = next(ds)
        batch = {k: jnp.asarray(v) for k, v in raw.items()
                 if k in ("img1", "img2", "label")}
        params, state, opt_state, loss, acc = step(params, state, opt_state,
                                                   batch, jnp.asarray(i))
        if i % 10 == 0:
            print(f"step {i}: loss {float(loss):.4f} "
                  f"rank_acc {float(acc):.3f}")
    print("done")


if __name__ == "__main__":
    main()
