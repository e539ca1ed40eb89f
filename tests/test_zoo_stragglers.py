"""Value + gradient tests for the last stock-zoo layers: stochastic
pooling, SPP, InfogainLoss, MultinomialLogisticLoss (SURVEY §2.2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradcheck import check_grad
from mms_answer_selection_tpu.ops import (
    infogain_loss,
    multinomial_logistic_loss,
    pool2d_padded,
    spatial_pyramid_pool,
    stochastic_pool2d,
)
from mms_answer_selection_tpu.ops.losses import softmax_cross_entropy

rng = np.random.default_rng(17)


class TestStochasticPooling:
    def test_train_picks_window_elements(self):
        x = jnp.asarray(rng.random((2, 6, 6, 3)).astype(np.float32)) + 0.1
        out = stochastic_pool2d(x, 2, 2, stride_h=2, stride_w=2,
                                rng=jax.random.PRNGKey(0), train=True)
        assert out.shape == (2, 3, 3, 3)
        # every output must literally be one of its window's 4 elements
        xn = np.asarray(x)
        on = np.asarray(out)
        for n in range(2):
            for i in range(3):
                for j in range(3):
                    for c in range(3):
                        win = xn[n, 2*i:2*i+2, 2*j:2*j+2, c].ravel()
                        assert on[n, i, j, c] in win

    def test_train_sampling_is_value_weighted(self):
        # one window where element 0 holds 90% of the mass: it must be
        # picked ~90% of the time (StoPoolForwardTrain's cumsum rule)
        x = jnp.asarray([[[[9.0], [0.5]], [[0.25], [0.25]]]])  # (1,2,2,1)
        keys = jax.random.split(jax.random.PRNGKey(0), 400)
        outs = jax.jit(jax.vmap(lambda k: stochastic_pool2d(
            x, 2, 2, stride_h=2, stride_w=2, rng=k, train=True)))(keys)
        picks = np.asarray(outs)[:, 0, 0, 0, 0] == 9.0
        assert 0.84 <= picks.mean() <= 0.96

    def test_test_mode_weighted_average(self):
        x = jnp.asarray(rng.random((1, 4, 4, 2)).astype(np.float32))
        out = stochastic_pool2d(x, 2, 2, stride_h=2, stride_w=2, train=False)
        xn = np.asarray(x)
        win = xn[0, :2, :2, 0].ravel()
        expect = (win ** 2).sum() / (np.finfo(np.float32).tiny + win.sum())
        assert float(out[0, 0, 0, 0]) == pytest.approx(expect, rel=1e-5)

    def test_clipped_boundary_window(self):
        # 5x5 with k=2 s=2 -> ceil sizing gives 3 outputs; last window is
        # the single corner element, deterministically selected
        x = jnp.asarray(rng.random((1, 5, 5, 1)).astype(np.float32)) + 0.1
        out = stochastic_pool2d(x, 2, 2, stride_h=2, stride_w=2,
                                rng=jax.random.PRNGKey(1), train=True)
        assert out.shape == (1, 3, 3, 1)
        assert float(out[0, 2, 2, 0]) == pytest.approx(float(x[0, 4, 4, 0]))

    def test_gradient_routes_to_sampled_element(self):
        x = jnp.asarray(rng.random((1, 4, 4, 1)).astype(np.float32)) + 0.1
        key = jax.random.PRNGKey(3)

        def f(x_):
            return jnp.sum(stochastic_pool2d(x_, 2, 2, stride_h=2,
                                             stride_w=2, rng=key,
                                             train=True))

        g = np.asarray(jax.grad(f)(x))[0, :, :, 0]
        out = np.asarray(stochastic_pool2d(x, 2, 2, stride_h=2, stride_w=2,
                                           rng=key, train=True))[0, :, :, 0]
        # exactly one unit of gradient per window, at the sampled element
        assert g.sum() == pytest.approx(4.0)
        for i in range(2):
            for j in range(2):
                win_g = g[2*i:2*i+2, 2*j:2*j+2]
                win_x = np.asarray(x)[0, 2*i:2*i+2, 2*j:2*j+2, 0]
                assert win_g.sum() == pytest.approx(1.0)
                sel = np.unravel_index(win_g.argmax(), win_g.shape)
                assert win_x[sel] == pytest.approx(out[i, j])

    def test_test_mode_gradcheck(self):
        x = rng.random((1, 4, 4, 2)).astype(np.float32) + 0.2
        check_grad(lambda x_: jnp.sum(
            stochastic_pool2d(x_, 2, 2, stride_h=2, stride_w=2,
                              train=False) ** 2), [x], tol=2e-2)


class TestPool2dPadded:
    def test_max_ignores_padding(self):
        x = jnp.asarray(-rng.random((1, 4, 4, 1)).astype(np.float32)) - 0.5
        out = pool2d_padded(x, 3, 3, stride_h=3, stride_w=3, pad_h=1,
                            pad_w=1, mode="max")
        # all-negative input: padded cells must never win (no 0s leak in)
        assert np.asarray(out).max() < 0

    def test_ave_counts_padded_extent(self):
        # caffe AVE: denominator spans the padded window extent, numerator
        # only real cells.  2x2 input, k=2 s=2 pad=1 -> pooled 2x2 clipped;
        # window (0,0) covers [-1,1)x[-1,1): 1 real cell / 4 counted
        x = jnp.ones((1, 2, 2, 1), jnp.float32)
        out = pool2d_padded(x, 2, 2, stride_h=2, stride_w=2, pad_h=1,
                            pad_w=1, mode="ave")
        assert float(out[0, 0, 0, 0]) == pytest.approx(0.25)

    def test_no_pad_matches_plain_pools(self):
        from mms_answer_selection_tpu.ops import avg_pool2d, max_pool2d
        x = jnp.asarray(rng.random((2, 6, 8, 3)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(pool2d_padded(x, 2, 3, stride_h=2, stride_w=3,
                                     mode="max")),
            np.asarray(max_pool2d(x, 2, 3, stride_h=2, stride_w=3)))
        np.testing.assert_allclose(
            np.asarray(pool2d_padded(x, 2, 3, stride_h=2, stride_w=3,
                                     mode="ave")),
            np.asarray(avg_pool2d(x, 2, 3, stride_h=2, stride_w=3)),
            rtol=1e-6)


class TestSPP:
    def test_output_shape(self):
        # pyramid 3: 1 + 4 + 16 = 21 bins x C channels
        x = jnp.asarray(rng.random((2, 10, 13, 5)).astype(np.float32))
        out = spatial_pyramid_pool(x, 3, mode="max")
        assert out.shape == (2, 5 * 21)

    def test_level0_is_global_pool(self):
        x = jnp.asarray(rng.random((2, 7, 9, 4)).astype(np.float32))
        out = spatial_pyramid_pool(x, 1, mode="max")
        expect = np.asarray(x).max(axis=(1, 2))
        np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-6)

    def test_level_ordering_channel_major(self):
        # 2 levels: first C entries are level-0 global pools, then the
        # level-1 2x2 grid flattened channel-major (caffe NCHW flatten)
        x = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
        out = np.asarray(spatial_pyramid_pool(x, 2, mode="max"))
        xn = np.asarray(x)
        np.testing.assert_allclose(out[0, :3], xn[0].max(axis=(0, 1)),
                                   rtol=1e-6)
        # channel 0's 2x2 grid occupies out[0, 3:7]
        q = xn[0, :4, :4, 0].max()
        assert out[0, 3] == pytest.approx(q)

    def test_ave_gradcheck(self):
        x = rng.random((1, 6, 6, 2)).astype(np.float32)
        check_grad(lambda x_: jnp.sum(
            spatial_pyramid_pool(x_, 2, mode="ave") ** 2), [x], tol=2e-2)


class TestInfogainLosses:
    def test_multinomial_matches_hand_value(self):
        probs = jnp.asarray([[0.7, 0.3], [0.2, 0.8]])
        labels = jnp.asarray([0, 1])
        got = float(multinomial_logistic_loss(probs, labels))
        assert got == pytest.approx(-(np.log(0.7) + np.log(0.8)) / 2)

    def test_clamp_at_log_threshold(self):
        probs = jnp.asarray([[0.0, 1.0]])
        labels = jnp.asarray([0])
        got = float(multinomial_logistic_loss(probs, labels))
        assert got == pytest.approx(-np.log(1e-20))

    def test_infogain_identity_reduces_to_multinomial(self):
        probs = jnp.asarray(rng.dirichlet(np.ones(4), size=6)
                            .astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 4, 6))
        h = jnp.eye(4)
        np.testing.assert_allclose(
            float(infogain_loss(probs, labels, h)),
            float(multinomial_logistic_loss(probs, labels)), rtol=1e-5)

    def test_infogain_hand_value(self):
        probs = jnp.asarray([[0.5, 0.5]])
        labels = jnp.asarray([0])
        h = jnp.asarray([[1.0, 2.0], [0.0, 1.0]])
        # -1*(1*log .5 + 2*log .5) = 3*log 2
        assert float(infogain_loss(probs, labels, h)) == pytest.approx(
            3 * np.log(2))

    def test_infogain_consistent_with_softmax_ce(self):
        # identity infogain over softmax probs == SoftmaxWithLoss
        logits = rng.normal(size=(5, 3)).astype(np.float32)
        labels = rng.integers(0, 3, 5)
        probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
        np.testing.assert_allclose(
            float(infogain_loss(probs, jnp.asarray(labels), jnp.eye(3))),
            float(softmax_cross_entropy(jnp.asarray(logits),
                                        jnp.asarray(labels))), rtol=1e-5)

    def test_gradients(self):
        probs = rng.dirichlet(np.ones(3), size=4).astype(np.float32)
        labels = np.asarray([0, 2, 1, 0])
        h = rng.random((3, 3)).astype(np.float32)
        check_grad(lambda p: multinomial_logistic_loss(p, jnp.asarray(labels)),
                   [probs], tol=2e-2)
        check_grad(lambda p: infogain_loss(p, jnp.asarray(labels),
                                           jnp.asarray(h)),
                   [probs], tol=2e-2)
