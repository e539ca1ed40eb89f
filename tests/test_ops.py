"""Tests for conv / pooling / embed / dropout / losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mms_answer_selection_tpu.ops import (
    avg_pool2d,
    conv2d,
    conv_init,
    dropout,
    embed_init,
    embed_lookup,
    euclidean_loss,
    hinge_loss,
    max_pool2d,
    pair_rank_loss,
    sigmoid_cross_entropy,
    softmax_cross_entropy,
)
from gradcheck import check_grad

rng = np.random.default_rng(5)


class TestConv:
    def test_shapes_and_naive_value(self):
        x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
        params = conv_init(jax.random.PRNGKey(0), 3, 4, 5, 5)
        y = conv2d(params, x)
        assert y.shape == (2, 4, 4, 4)
        # naive correlation check at one output position
        w = np.asarray(params["w"])  # (5,5,3,4)
        patch = np.asarray(x)[0, 0:5, 0:5, :]
        expect = np.tensordot(patch, w, axes=([0, 1, 2], [0, 1, 2])) \
            + np.asarray(params["b"])
        np.testing.assert_allclose(np.asarray(y)[0, 0, 0], expect, rtol=1e-4,
                                   atol=1e-4)

    def test_xavier_scale(self):
        params = conv_init(jax.random.PRNGKey(1), 4, 32, 5, 5)
        s = (3.0 / (4 * 5 * 5)) ** 0.5
        w = np.asarray(params["w"])
        assert w.max() <= s and w.min() >= -s
        assert w.std() > 0.5 * s / np.sqrt(3)


class TestPooling:
    def test_max_pool_exact_tiling(self):
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 2)).astype(np.float32))
        y = max_pool2d(x, 4, 4, stride_h=4, stride_w=4)
        assert y.shape == (1, 2, 2, 2)
        np.testing.assert_allclose(np.asarray(y)[0, 0, 0, 0],
                                   np.asarray(x)[0, :4, :4, 0].max())

    def test_ceil_mode_output_size(self):
        # caffe: ceil((7-3)/2)+1 = 3 (floor would give 3 too); ceil((6-4)/3)+1=2
        x = jnp.ones((1, 6, 6, 1))
        y = max_pool2d(x, 4, 4, stride_h=3, stride_w=3)
        assert y.shape == (1, 2, 2, 1)

    def test_avg_pool_boundary_divides_by_true_count(self):
        x = jnp.ones((1, 5, 5, 1))
        y = avg_pool2d(x, 3, 3, stride_h=3, stride_w=3)
        # ceil((5-3)/3)+1 = 2; the last window covers only 2 rows/cols
        assert y.shape == (1, 2, 2, 1)
        np.testing.assert_allclose(np.asarray(y), 1.0, rtol=1e-6)

    def test_avg_pool_value(self):
        x = jnp.asarray(rng.normal(size=(1, 4, 4, 1)).astype(np.float32))
        y = avg_pool2d(x, 2, 2, stride_h=2, stride_w=2)
        np.testing.assert_allclose(np.asarray(y)[0, 0, 0, 0],
                                   np.asarray(x)[0, :2, :2, 0].mean(),
                                   rtol=1e-5)


class TestEmbed:
    def test_lookup_and_bias(self):
        params = embed_init(jax.random.PRNGKey(0), 10, 4)
        ids = jnp.asarray([[1, 2], [3, 9]])
        out = embed_lookup(params, ids)
        assert out.shape == (2, 2, 4)
        np.testing.assert_allclose(
            np.asarray(out)[0, 0],
            np.asarray(params["w"])[1] + np.asarray(params["b"]), rtol=1e-6)

    def test_pretrained_rows_and_random_tail(self):
        pre = rng.normal(size=(7, 4)).astype(np.float32)
        params = embed_init(jax.random.PRNGKey(0), 10, 4, pretrained=pre)
        np.testing.assert_allclose(np.asarray(params["w"])[:7], pre, rtol=1e-6)
        tail = np.asarray(params["w"])[7:]
        assert np.all(np.abs(tail) <= 0.08)  # uniform(-.08,.08) init kept

    def test_grad_is_sparse_scatter(self):
        params = embed_init(jax.random.PRNGKey(0), 10, 4)
        ids = jnp.asarray([[1, 1, 2]])

        def f(w):
            return jnp.sum(embed_lookup({"w": w, "b": params["b"]}, ids) ** 2)

        g = np.asarray(jax.grad(f)(params["w"]))
        assert np.all(g[[0, 3, 4, 5, 6, 7, 8, 9]] == 0)
        assert np.any(g[1] != 0) and np.any(g[2] != 0)


class TestDropout:
    def test_eval_identity(self):
        x = jnp.ones((4, 4))
        y = dropout(jax.random.PRNGKey(0), x, 0.5, train=False)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))

    def test_train_scaling(self):
        x = jnp.ones((100, 100))
        y = np.asarray(dropout(jax.random.PRNGKey(0), x, 0.5, train=True))
        vals = np.unique(y)
        assert set(np.round(vals, 5)) <= {0.0, 2.0}
        assert abs(y.mean() - 1.0) < 0.1


class TestLosses:
    def test_softmax_ce_value(self):
        logits = jnp.asarray([[2.0, 1.0], [0.0, 3.0]])
        labels = jnp.asarray([0, 1])
        p = jax.nn.softmax(logits)
        expect = -np.mean(np.log(np.asarray(p)[[0, 1], [0, 1]]))
        assert float(softmax_cross_entropy(logits, labels)) == pytest.approx(
            expect, rel=1e-5)

    def test_softmax_ce_ignore_label(self):
        logits = jnp.asarray([[2.0, 1.0], [0.0, 3.0], [5.0, 0.0]])
        labels = jnp.asarray([0, 1, -1])
        full = softmax_cross_entropy(logits[:2], labels[:2])
        ign = softmax_cross_entropy(logits, labels, ignore_label=-1)
        assert float(ign) == pytest.approx(float(full), rel=1e-6)

    def test_pair_rank_loss_value(self):
        # reference formula, hand-computed (pair_rank_loss_layer.cpp:26-52)
        a = jnp.asarray([1.0, 0.2])
        b = jnp.asarray([0.5, 0.6])
        label = jnp.asarray([1.0, 0.0])
        # i=0: max(0, 1 - 1*(0.5)) + |0 * 0.5| = 0.5
        # i=1: max(0, 1 - 0) + |1 * (-0.4)| = 1.4
        expect = (0.5 + 1.4) / 2
        assert float(pair_rank_loss(a, b, label)) == pytest.approx(expect,
                                                                   rel=1e-6)

    def test_pair_rank_loss_grad(self):
        a = jnp.asarray(rng.normal(size=6).astype(np.float32))
        b = jnp.asarray(rng.normal(size=6).astype(np.float32))
        label = jnp.asarray((rng.random(6) < 0.5).astype(np.float32))

        def kink(args, argnum, idx):
            # near the hinge/abs kinks finite differences are invalid
            d = float(args[0][idx] - args[1][idx])
            lab = float(label[idx])
            return abs(1.0 - lab * d) < 5e-3 or abs(d) < 5e-3

        check_grad(lambda a_, b_: pair_rank_loss(a_, b_, label), [a, b],
                   h=1e-4, tol=2e-2, kink_fn=kink)

    def test_softmax_ce_grad(self):
        logits = jnp.asarray(rng.normal(size=(5, 3)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 3, size=5))
        check_grad(lambda l: softmax_cross_entropy(l, labels), [logits],
                   h=1e-3, tol=1e-2)

    def test_euclidean_and_hinge_and_sigmoid(self):
        a = jnp.asarray([[1.0, 2.0]])
        b = jnp.asarray([[0.0, 0.0]])
        assert float(euclidean_loss(a, b)) == pytest.approx(2.5)
        scores = jnp.asarray([[0.2, -0.3]])
        assert float(hinge_loss(scores, jnp.asarray([0]))) == pytest.approx(
            max(0, 1 - 0.2) + max(0, 1 - 0.3), rel=1e-5)
        logits = jnp.asarray([[0.5]])
        t = jnp.asarray([[1.0]])
        expect = float(np.log1p(np.exp(-0.5)))
        assert float(sigmoid_cross_entropy(logits, t)) == pytest.approx(
            expect, rel=1e-4)


def test_softmax_loss_flt_min_clamp():
    """softmax_loss_layer.cpp:107 clamps prob at FLT_MIN: a huge logit
    margin caps the per-sample loss at -log(FLT_MIN) ~ 87.34."""
    from mms_answer_selection_tpu.ops.losses import softmax_cross_entropy

    logits = jnp.asarray([[200.0, 0.0]])
    labels = jnp.asarray([1])
    loss = float(softmax_cross_entropy(logits, labels))
    np.testing.assert_allclose(loss, -np.log(np.finfo(np.float32).tiny),
                               rtol=1e-4)
