"""Pallas kernel tests (run through the Pallas interpreter on CPU; the
same kernel code compiles for TPU -- bench.py exercises that path)."""

import jax
import jax.numpy as jnp
import numpy as np

from mms_answer_selection_tpu.ops.sim_cross_pallas import (
    C_BLOCK,
    bilinear_maxsim_scores,
    bilinear_maxsim_scores_reference,
    bilinear_pair_maps,
    _pair_maps_forward,
    pack_candidate_pool,
    project_queries,
)
from mms_answer_selection_tpu.ops import sim_cross_bilinear

rng = np.random.default_rng(11)


def _qaw(n=3, w1=8, w2=8, d=50, m=2):
    q = jnp.asarray(rng.normal(size=(n, w1, d)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(n, w2, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(m, d, d)).astype(np.float32) * 0.1)
    return q, a, w


class TestPairMaps:
    def test_kernel_matches_einsum(self):
        q, a, w = _qaw()
        ref = sim_cross_bilinear(q, a, w)
        # run the actual Pallas kernel under the interpreter
        out = _pair_maps_forward(q, a, w, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_custom_vjp_matches_autodiff(self):
        q, a, w = _qaw(n=2, w1=4, w2=5, d=6, m=2)

        def fused(q_, a_, w_):
            return jnp.sum(jnp.tanh(bilinear_pair_maps(q_, a_, w_)))

        def plain(q_, a_, w_):
            return jnp.sum(jnp.tanh(sim_cross_bilinear(q_, a_, w_)))

        g1 = jax.grad(fused, argnums=(0, 1, 2))(q, a, w)
        g2 = jax.grad(plain, argnums=(0, 1, 2))(q, a, w)
        for x, y in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-4, atol=1e-4)

    def test_jit_compiles(self):
        q, a, w = _qaw(n=2, w1=4, w2=4, d=8, m=1)
        f = jax.jit(lambda *args: jnp.sum(bilinear_pair_maps(*args)))
        assert np.isfinite(float(f(q, a, w)))


class TestMaxSimScores:
    def test_matches_reference(self):
        nq, c, w1, w2, d, m = 2, 2 * C_BLOCK, 5, 7, 50, 2
        q = jnp.asarray(rng.normal(size=(nq, w1, d)).astype(np.float32))
        cand = jnp.asarray(rng.normal(size=(c, w2, d)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(m, d, d)).astype(np.float32) * 0.1)

        ref = bilinear_maxsim_scores_reference(q, cand, w)
        # f32 through the kernel for an apples-to-apples numeric check
        qw = project_queries(q, w, dtype=jnp.float32)
        pool = pack_candidate_pool(cand, dtype=jnp.float32)
        out = bilinear_maxsim_scores(qw, pool, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-3, atol=1e-3)

    def test_padding_never_wins_max(self):
        # candidates whose real similarities are ALL negative: a padded
        # zero-row would win the max (score 0) without the additive mask
        nq, c, w2, d, m = 1, C_BLOCK, 3, 50, 1
        q = jnp.ones((nq, 2, d), jnp.float32)
        cand = -jnp.ones((c, w2, d), jnp.float32)
        w = jnp.eye(d)[None]
        ref = bilinear_maxsim_scores_reference(q, cand, w)
        assert float(ref[0, 0]) < 0
        qw = project_queries(q, w, dtype=jnp.float32)
        pool = pack_candidate_pool(cand, dtype=jnp.float32)
        out = bilinear_maxsim_scores(qw, pool, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_bf16_pool_close_to_f32(self):
        nq, c, w2, d, m = 2, C_BLOCK, 6, 50, 2
        q = jnp.asarray(rng.normal(size=(nq, 4, d)).astype(np.float32))
        cand = jnp.asarray(rng.normal(size=(c, w2, d)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(m, d, d)).astype(np.float32) * 0.1)
        ref = bilinear_maxsim_scores_reference(q, cand, w)
        qw = project_queries(q, w)  # bf16
        pool = pack_candidate_pool(cand)  # bf16
        out = bilinear_maxsim_scores(qw, pool, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0.05, atol=0.5)

    def test_pool_size_must_tile(self):
        q = jnp.zeros((1, 2, 50))
        w = jnp.eye(50)[None]
        qw = project_queries(q, w, dtype=jnp.float32)
        pool = pack_candidate_pool(jnp.zeros((C_BLOCK + 1, 3, 50)),
                                   dtype=jnp.float32)
        try:
            bilinear_maxsim_scores(qw, pool, interpret=True)
            assert False, "expected ValueError"
        except ValueError:
            pass
