"""Saliency helper + iter_size gradient-accumulation tests."""

import jax
import jax.numpy as jnp
import numpy as np

from mms_answer_selection_tpu.models.mms_qa import (
    ConvBlock,
    MMSQAConfig,
    mms_qa_init,
)
from mms_answer_selection_tpu.training import (
    SolverConfig,
    Trainer,
    TrainerConfig,
)
from mms_answer_selection_tpu.utils.saliency import token_saliency

rng = np.random.default_rng(23)

TINY = MMSQAConfig(
    vocab_size=64, embed_dim=16, question_len=12, answer_len=12,
    sim_measures=2, sim_weight_init="xavier",
    blocks=(ConvBlock(3, 3, 8, "ave", 2, 2), ConvBlock(3, 3, 8, "ave", 3, 1)),
    fc1_dim=8)


def _batch(n=8, seed=0):
    r = np.random.default_rng(seed)
    return {
        "question": jnp.asarray(r.integers(0, 64, (n, 12)), jnp.int32),
        "answer": jnp.asarray(r.integers(0, 64, (n, 12)), jnp.int32),
        "overlap_feat": jnp.asarray(r.random((n, 2)).astype(np.float32)),
        "label": jnp.asarray(r.integers(0, 2, (n,)), jnp.int32),
    }


class TestSaliency:
    def test_shapes_and_nonnegative(self):
        from mms_answer_selection_tpu.models.mms_qa import mms_qa_apply
        params, state = mms_qa_init(jax.random.PRNGKey(0), TINY)
        batch = _batch()
        # warm the BN running stats: at fresh init running var is 0 and the
        # eval-mode 1/sqrt(1e-9) scale saturates tanh, zeroing gradients
        for i in range(3):
            _, state = mms_qa_apply(params, state, batch, TINY, train=True,
                                    rng=jax.random.PRNGKey(i))
        q_sal, a_sal = token_saliency(params, state, batch, TINY)
        assert q_sal.shape == (8, 12) and a_sal.shape == (8, 12)
        assert (q_sal >= 0).all() and (a_sal >= 0).all()
        assert q_sal.max() > 0  # xavier metric -> nonzero embedding grads


class TestIterSize:
    def test_accumulation_matches_manual_micro_sum(self):
        # the accumulated step must equal: sum of per-micro-batch gradients
        # (each micro normalized by ITS OWN BN batch stats, as the
        # reference's repeated Forward calls do), divided by iter_size,
        # applied once.  NOTE a single bs-16 batch is NOT the comparison
        # point: BN statistics legitimately differ.
        import dataclasses
        nodrop = dataclasses.replace(TINY, sim_dropout=0.0, fc1_dropout=0.0)
        from mms_answer_selection_tpu.models.mms_qa import mms_qa_apply
        accum = TrainerConfig(
            solver=SolverConfig(solver_type="sgd", base_lr=0.1, momentum=0.0,
                                weight_decay=0.0, iter_size=2),
            max_iter=1, batch_size=8, test_interval=10**9,
            snapshot_interval=0, early_stop_patience=99, seed=22)
        t2 = Trainer(nodrop, accum)
        p0, s0, o0 = t2.init()
        rows = _batch(16, seed=5)
        micro = {k: v.reshape((2, 8) + v.shape[1:]) for k, v in rows.items()}
        key = jax.random.PRNGKey(3)

        # manual accumulation FIRST (the trainer step donates p0/o0 buffers)
        state_c = s0
        acc = jax.tree.map(jnp.zeros_like, p0)
        for i in range(2):
            b_i = {k: v[i] for k, v in micro.items()}

            def loss_fn(p, state_in=state_c, b=b_i, i=i):
                out, ns = mms_qa_apply(p, state_in, b, nodrop, train=True,
                                       rng=jax.random.fold_in(key, i))
                return out["loss"], ns

            (l_i, state_c), g = jax.value_and_grad(loss_fn,
                                                   has_aux=True)(p0)
            acc = jax.tree.map(jnp.add, acc, g)
        # apply the recipe's per-param lr multipliers (biases x2 etc.)
        from mms_answer_selection_tpu.models.mms_qa import param_spec
        spec = param_spec(p0, nodrop)
        is_pair = lambda x: isinstance(x, tuple) and len(x) == 2  # noqa: E731
        lr_mult = jax.tree.map(lambda s: s[0], spec, is_leaf=is_pair)
        expect = jax.tree.map(lambda p, g, l: p - 0.1 * l * (g / 2.0),
                              p0, acc, lr_mult)
        expect = jax.device_get(expect)
        state_c = jax.device_get(state_c)

        p2n, s2n, _, l2 = t2._train_step(p0, s0, o0, micro, jnp.asarray(0),
                                         key)
        for a, b in zip(jax.tree.leaves(p2n), jax.tree.leaves(expect)):
            # atol 1e-5: scan-vs-eager accumulation-order noise on the
            # near-zero bias updates
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)
        # BN state equals the sequentially threaded state
        for a, b in zip(jax.tree.leaves(s2n), jax.tree.leaves(state_c)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)

    def test_fit_runs_with_iter_size(self):
        data = {k: np.asarray(v) for k, v in _batch(45, seed=9).items()}
        data["group"] = np.repeat(np.arange(9), 5)
        cfg = TrainerConfig(
            solver=SolverConfig(solver_type="adadelta", iter_size=3),
            max_iter=8, batch_size=5, test_interval=4,
            snapshot_interval=0, early_stop_patience=99, seed=22)
        hist = Trainer(TINY, cfg).fit(data, data)
        assert len(hist["train_loss"]) >= 1
        assert np.isfinite(hist["train_loss"]).all()
