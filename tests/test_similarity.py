"""Value + gradient tests for the similarity ops.

The reference shipped NO tests for its custom layers (SURVEY.md §4 gap);
these are the unit tests it should have had, built against independent numpy
reference implementations of the documented layer math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mms_answer_selection_tpu.ops import (
    sim_cross_bilinear,
    sim_cross_cosine,
    sim_cross_inv_euclidean,
    sim_matrix,
    fm_pool,
)
from gradcheck import check_grad

rng = np.random.default_rng(22)


def _qa(n=3, w1=4, w2=5, d=6):
    q = rng.normal(size=(n, w1, d)).astype(np.float32)
    a = rng.normal(size=(n, w2, d)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(a)


class TestSimCrossValues:
    def test_inv_euclidean_matches_naive(self):
        q, a = _qa()
        out = np.asarray(sim_cross_inv_euclidean(q, a))
        assert out.shape == (3, 4, 5, 1)
        for n in range(3):
            for i in range(4):
                for j in range(5):
                    d = np.linalg.norm(np.asarray(q)[n, i] - np.asarray(a)[n, j])
                    np.testing.assert_allclose(out[n, i, j, 0], 1 / (1 + d),
                                               rtol=1e-5)

    def test_cosine_matches_naive(self):
        q, a = _qa()
        out = np.asarray(sim_cross_cosine(q, a))
        for n in range(3):
            for i in range(4):
                for j in range(5):
                    qv, av = np.asarray(q)[n, i], np.asarray(a)[n, j]
                    expect = qv @ av / (np.linalg.norm(qv) * np.linalg.norm(av))
                    np.testing.assert_allclose(out[n, i, j, 0], expect,
                                               rtol=1e-4, atol=1e-5)

    def test_bilinear_matches_naive(self):
        q, a = _qa()
        m = 2
        w = jnp.asarray(rng.normal(size=(m, 6, 6)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(m, 4, 5)).astype(np.float32))
        out = np.asarray(sim_cross_bilinear(q, a, w, bias))
        assert out.shape == (3, 4, 5, m)
        for n in range(3):
            for mm in range(m):
                for i in range(4):
                    for j in range(5):
                        expect = (np.asarray(q)[n, i] @ np.asarray(w)[mm]
                                  @ np.asarray(a)[n, j]
                                  + np.asarray(bias)[mm, i, j])
                        np.testing.assert_allclose(out[n, i, j, mm], expect,
                                                   rtol=1e-4, atol=1e-4)

    def test_bilinear_zero_init_still_has_weight_grad(self):
        # the recipe initializes W to zero (constant default filler,
        # do_trec_qa_clean.py:468); training works only because dW != 0
        q, a = _qa()
        w = jnp.zeros((2, 6, 6))
        g = jax.grad(lambda w_: jnp.sum(sim_cross_bilinear(q, a, w_) ** 2
                                        + sim_cross_bilinear(q, a, w_)))(w)
        assert float(jnp.max(jnp.abs(g))) > 0


class TestSimCrossGrads:
    def test_cosine_grad(self):
        q, a = _qa(2, 3, 3, 4)
        check_grad(lambda q_, a_: jnp.sum(jnp.sin(sim_cross_cosine(q_, a_))),
                   [q, a], h=1e-3, tol=2e-2)

    def test_inv_euclidean_grad(self):
        q, a = _qa(2, 3, 3, 4)
        check_grad(
            lambda q_, a_: jnp.sum(jnp.sin(sim_cross_inv_euclidean(q_, a_))),
            [q, a], h=1e-3, tol=2e-2)

    def test_bilinear_grad(self):
        q, a = _qa(2, 3, 3, 4)
        w = jnp.asarray(rng.normal(size=(2, 4, 4)).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(2, 3, 3)).astype(np.float32))
        check_grad(
            lambda q_, a_, w_, b_: jnp.sum(
                jnp.tanh(sim_cross_bilinear(q_, a_, w_, b_))),
            [q, a, w, b], h=1e-3, tol=2e-2)


class TestSimMatrix:
    def test_value(self):
        x = jnp.asarray(rng.normal(size=(4, 5)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(4, 7)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(5, 7)).astype(np.float32))
        out = np.asarray(sim_matrix(x, y, w))
        assert out.shape == (4, 1)
        for n in range(4):
            np.testing.assert_allclose(
                out[n, 0],
                np.asarray(x)[n] @ np.asarray(w) @ np.asarray(y)[n], rtol=1e-4)

    def test_grad(self):
        x = jnp.asarray(rng.normal(size=(3, 4)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(3, 4)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(4, 4)).astype(np.float32))
        check_grad(lambda *args: jnp.sum(jnp.tanh(sim_matrix(*args))),
                   [x, y, w], h=1e-3, tol=2e-2)


class TestFM:
    def test_value_matches_naive(self):
        x = jnp.asarray(rng.normal(size=(3, 4, 5)).astype(np.float32))
        bias = jnp.asarray(0.7)
        out = np.asarray(fm_pool(x, bias))
        xn = np.asarray(x)
        for n in range(3):
            t1 = 0.0
            for j in range(1, 5):
                t2 = xn[n, :, j].sum()
                t1 += t2 * t2 - (xn[n, :, j] ** 2).sum()
            expect = t1 / 2 + xn[n, :, 0].sum() + 0.7
            np.testing.assert_allclose(out[n, 0], expect, rtol=1e-4, atol=1e-4)

    def test_grad(self):
        x = jnp.asarray(rng.normal(size=(2, 3, 4)).astype(np.float32))
        b = jnp.asarray(0.3)
        check_grad(lambda x_, b_: jnp.sum(jnp.tanh(fm_pool(x_, b_))),
                   [x, b], h=1e-3, tol=2e-2)
