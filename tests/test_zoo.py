"""Stock-layer-zoo semantics tests (values against hand/naive computation)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mms_answer_selection_tpu.ops import zoo

rng = np.random.default_rng(31)


class TestNeurons:
    def test_leaky_relu(self):
        x = jnp.asarray([-2.0, 3.0])
        np.testing.assert_allclose(zoo.relu(x, negative_slope=0.1),
                                   [-0.2, 3.0], rtol=1e-6)

    def test_elu(self):
        x = jnp.asarray([-1.0, 2.0])
        np.testing.assert_allclose(zoo.elu(x, alpha=2.0),
                                   [2 * (np.exp(-1) - 1), 2.0], rtol=1e-5)

    def test_prelu_per_channel(self):
        x = jnp.asarray([[-1.0, -1.0], [2.0, 2.0]])
        slopes = jnp.asarray([0.1, 0.5])
        out = zoo.prelu(x, slopes)
        np.testing.assert_allclose(out, [[-0.1, -0.5], [2.0, 2.0]], rtol=1e-6)

    def test_bnll_stable(self):
        x = jnp.asarray([-100.0, 0.0, 100.0])
        out = np.asarray(zoo.bnll(x))
        assert out[0] == pytest.approx(0.0, abs=1e-6)
        assert out[1] == pytest.approx(np.log(2), rel=1e-5)
        assert out[2] == pytest.approx(100.0, rel=1e-5)

    def test_power_exp_log(self):
        x = jnp.asarray([1.0, 2.0])
        np.testing.assert_allclose(zoo.power(x, power=2, scale=3, shift=1),
                                   [16.0, 49.0], rtol=1e-5)
        np.testing.assert_allclose(zoo.exp(x, base=2.0), [2.0, 4.0],
                                   rtol=1e-5)
        np.testing.assert_allclose(zoo.log(jnp.asarray([4.0]), base=2.0),
                                   [2.0], rtol=1e-5)

    def test_threshold(self):
        np.testing.assert_array_equal(
            zoo.threshold(jnp.asarray([-1.0, 0.5]), threshold=0.0),
            [0.0, 1.0])


class TestNormalization:
    def test_mvn_mean_only(self):
        x = jnp.asarray(rng.normal(size=(2, 3, 3, 4)).astype(np.float32))
        y = np.asarray(zoo.mvn(x, normalize_variance=False))
        # per (sample, channel) mean ~ 0
        np.testing.assert_allclose(y.mean(axis=(1, 2)), 0.0, atol=1e-5)

    def test_mvn_variance(self):
        x = jnp.asarray(rng.normal(size=(2, 4, 4, 3)).astype(np.float32) * 5)
        y = np.asarray(zoo.mvn(x))
        np.testing.assert_allclose(y.std(axis=(1, 2)), 1.0, atol=1e-2)

    def test_lrn_across_channels_naive(self):
        x = jnp.asarray(rng.normal(size=(1, 2, 2, 6)).astype(np.float32))
        out = np.asarray(zoo.lrn_across_channels(x, local_size=3, alpha=2.0,
                                                 beta=0.5, k=1.0))
        xn = np.asarray(x)
        for ci in range(6):
            lo, hi = max(0, ci - 1), min(6, ci + 2)
            denom = (1.0 + (2.0 / 3) * (xn[0, 0, 0, lo:hi] ** 2).sum()) ** 0.5
            np.testing.assert_allclose(out[0, 0, 0, ci],
                                       xn[0, 0, 0, ci] / denom, rtol=1e-5)

    def test_scale_bias(self):
        x = jnp.ones((2, 3))
        out = zoo.scale(x, jnp.asarray([2.0, 3.0, 4.0]),
                        jnp.asarray([1.0, 1.0, 1.0]))
        np.testing.assert_allclose(out[0], [3.0, 4.0, 5.0], rtol=1e-6)


class TestReductions:
    def test_eltwise(self):
        a, b = jnp.asarray([1.0, 2.0]), jnp.asarray([3.0, 4.0])
        np.testing.assert_allclose(zoo.eltwise([a, b], operation="prod"),
                                   [3.0, 8.0])
        np.testing.assert_allclose(
            zoo.eltwise([a, b], operation="sum", coeffs=[1.0, -1.0]),
            [-2.0, -2.0])
        np.testing.assert_allclose(zoo.eltwise([a, b], operation="max"),
                                   [3.0, 4.0])

    def test_reduction(self):
        x = jnp.asarray([[1.0, -2.0], [3.0, -4.0]])
        np.testing.assert_allclose(zoo.reduction(x, operation="sum", axis=1),
                                   [-1.0, -1.0])
        np.testing.assert_allclose(zoo.reduction(x, operation="asum", axis=1),
                                   [3.0, 7.0])
        np.testing.assert_allclose(
            zoo.reduction(x, operation="sumsq", axis=1), [5.0, 25.0])
        np.testing.assert_allclose(
            zoo.reduction(x, operation="mean", axis=1, coeff=2.0),
            [-1.0, -1.0])

    def test_argmax_and_accuracy(self):
        scores = jnp.asarray([[0.1, 0.7, 0.2], [0.5, 0.2, 0.3]])
        idx = zoo.argmax(scores)  # caffe shape: (N, 1, k) indices
        assert idx.shape == (2, 1, 1)
        np.testing.assert_array_equal(np.asarray(idx).reshape(2), [1, 0])
        labels = jnp.asarray([1, 2])
        assert float(zoo.accuracy(scores, labels)) == pytest.approx(0.5)
        assert float(zoo.accuracy(scores, labels, top_k=2)) == pytest.approx(
            1.0)
        labels_ig = jnp.asarray([1, -1])
        assert float(zoo.accuracy(scores, labels_ig,
                                  ignore_label=-1)) == pytest.approx(1.0)

    def test_batch_reindex(self):
        x = jnp.asarray([[1.0], [2.0], [3.0]])
        out = zoo.batch_reindex(x, jnp.asarray([2, 0]))
        np.testing.assert_allclose(out, [[3.0], [1.0]])
