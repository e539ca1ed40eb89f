"""Round-3 zoo completeness: Deconvolution, LRN WITHIN_CHANNEL, and the
FilterLayer idiom made real (filter_rows compaction + filter_reduce) --
the last named residue of SURVEY §2.2's stock-layer row."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gradcheck import check_grad
from mms_answer_selection_tpu.ops import zoo

rng = np.random.default_rng(31)


def _caffe_blob(cin, og, kh, kw):
    return jnp.asarray(rng.standard_normal((cin, og, kh, kw)),
                       jnp.float32) * 0.3


class TestDeconvolution:
    """deconv forward == the backward-data pass of the matching forward
    conv (deconv_layer.cpp:24-40 literally calls backward_cpu_gemm)."""

    @pytest.mark.parametrize("stride,pad,dilation,group",
                             [(1, 0, 1, 1), (2, 0, 1, 1), (2, 1, 1, 1),
                              (1, 0, 2, 1), (2, 1, 1, 2)])
    def test_matches_conv_vjp(self, stride, pad, dilation, group):
        cin, cout, kh, kw = 4, 6, 3, 3
        hi = wi = 5
        blob = _caffe_blob(cin, cout // group, kh, kw)
        x = jnp.asarray(rng.standard_normal((2, hi, wi, cin)), jnp.float32)
        ho = stride * (hi - 1) + dilation * (kh - 1) + 1 - 2 * pad
        wo = stride * (wi - 1) + dilation * (kw - 1) + 1 - 2 * pad

        # the forward conv the deconv inverts: (N,Ho,Wo,Cout)->(N,Hi,Wi,Cin)
        kf = jnp.transpose(blob, (2, 3, 1, 0))  # HWIO (kh,kw,Cout/g,Cin)

        def fwd(u):
            return jax.lax.conv_general_dilated(
                u, kf, (stride, stride), [(pad, pad), (pad, pad)],
                rhs_dilation=(dilation, dilation),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=group,
                precision=jax.lax.Precision.HIGHEST)

        u0 = jnp.zeros((2, ho, wo, cout), jnp.float32)
        expect = jax.vjp(fwd, u0)[1](x)[0]
        got = zoo.deconv2d(x, blob, stride=stride, pad=pad,
                           dilation=dilation, group=group)
        assert got.shape == (2, ho, wo, cout)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                                   rtol=1e-5, atol=1e-5)

    def test_single_pixel_paints_kernel(self):
        """A 1x1 input must paint the (IO-swapped) kernel scaled by the
        pixel value -- the textbook transposed-conv sanity check."""
        blob = _caffe_blob(1, 1, 3, 3)
        x = jnp.full((1, 1, 1, 1), 2.0)
        out = zoo.deconv2d(x, blob)
        assert out.shape == (1, 3, 3, 1)
        np.testing.assert_allclose(np.asarray(out)[0, :, :, 0],
                                   2.0 * np.asarray(blob)[0, 0], rtol=1e-6)

    def test_bias_and_output_shape_formula(self):
        blob = _caffe_blob(3, 5, 4, 2)
        bias = jnp.asarray(rng.standard_normal(5), jnp.float32)
        x = jnp.asarray(rng.standard_normal((1, 6, 7, 3)), jnp.float32)
        out = zoo.deconv2d(x, blob, bias, stride=3, pad=1)
        # stride*(in-1) + k - 2*pad (compute_output_shape)
        assert out.shape == (1, 3 * 5 + 4 - 2, 3 * 6 + 2 - 2, 5)
        no_bias = zoo.deconv2d(x, blob, stride=3, pad=1)
        np.testing.assert_allclose(np.asarray(out - no_bias),
                                   np.broadcast_to(np.asarray(bias),
                                                   out.shape), atol=1e-6)

    def test_gradcheck(self):
        blob = _caffe_blob(2, 3, 3, 3)
        x = jnp.asarray(rng.standard_normal((1, 3, 3, 2)), jnp.float32)
        check_grad(lambda a, w: jnp.sum(
            jnp.tanh(zoo.deconv2d(a, w, stride=2))), [x, blob])


class TestLRNWithinChannel:
    def test_value_vs_naive(self):
        """Naive per-pixel window sum with caffe's AVE-pool denominator
        (window clipped to the padded extent)."""
        x = np.asarray(rng.standard_normal((2, 5, 6, 3)), np.float32)
        size, alpha, beta = 3, 2.0, 0.75
        pad = (size - 1) // 2
        sq = x * x
        n, h, w, c = x.shape
        scale = np.empty_like(x)
        for i in range(h):
            for j in range(w):
                h0, h1 = i - pad, i - pad + size
                w0, w1 = j - pad, j - pad + size
                win = sq[:, max(h0, 0):min(h1, h), max(w0, 0):min(w1, w), :]
                # caffe AVE pool divides by the overlap with [0, dim+pad)
                denom = ((min(h1, h + pad) - h0) * (min(w1, w + pad) - w0))
                scale[:, i, j, :] = win.sum(axis=(1, 2)) / denom
        expect = x * (1.0 + alpha * scale) ** (-beta)
        got = zoo.lrn_within_channel(jnp.asarray(x), local_size=size,
                                     alpha=alpha, beta=beta)
        np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-5,
                                   atol=1e-6)

    def test_k_is_ignored_shift_is_one(self):
        """WITHIN_CHANNEL hardcodes the power shift to 1 (lrn_layer.cpp:53)
        -- there is no k parameter to pass, and alpha=0 is the identity."""
        x = jnp.asarray(rng.standard_normal((1, 4, 4, 2)), jnp.float32)
        out = zoo.lrn_within_channel(x, local_size=3, alpha=0.0, beta=0.75)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-6)

    def test_even_size_rejected(self):
        with pytest.raises(ValueError, match="odd"):
            zoo.lrn_within_channel(jnp.zeros((1, 4, 4, 1)), local_size=4)

    def test_gradcheck(self):
        x = jnp.asarray(rng.standard_normal((1, 4, 4, 2)), jnp.float32)
        check_grad(lambda a: jnp.sum(
            zoo.lrn_within_channel(a, local_size=3, alpha=1.5)), [x])


class TestFilterRows:
    """Parity with the reference's dynamic row dropping
    (filter_layer.cpp:15-67): filtered[:count] == x[selector != 0]."""

    def test_matches_dynamic_filtering(self):
        x = np.asarray(rng.standard_normal((10, 4)), np.float32)
        sel = np.asarray([1, 0, 1, 1, 0, 0, 1, 0, 1, 0], np.float32)
        got, count = jax.jit(zoo.filter_rows)(jnp.asarray(x),
                                              jnp.asarray(sel))
        count = int(count)
        assert count == 5
        np.testing.assert_array_equal(np.asarray(got)[:count],
                                      x[sel != 0])
        # rows past count are zeroed (static shape, defined content)
        assert not np.any(np.asarray(got)[count:])

    def test_multi_bottom_one_selector(self):
        a = np.asarray(rng.standard_normal((6, 3)), np.float32)
        b = np.arange(6, dtype=np.int32)
        sel = np.asarray([0, 1, 1, 0, 1, 0])
        (fa, fb), count = zoo.filter_rows((jnp.asarray(a), jnp.asarray(b)),
                                          jnp.asarray(sel))
        count = int(count)
        np.testing.assert_array_equal(np.asarray(fa)[:count], a[sel != 0])
        np.testing.assert_array_equal(np.asarray(fb)[:count], b[sel != 0])

    def test_capacity_truncates(self):
        x = np.eye(5, dtype=np.float32)
        sel = np.ones(5)
        got, count = zoo.filter_rows(jnp.asarray(x), jnp.asarray(sel),
                                     capacity=3)
        assert int(count) == 3 and got.shape == (3, 5)
        np.testing.assert_array_equal(np.asarray(got), x[:3])

    def test_all_filtered(self):
        x = np.asarray(rng.standard_normal((4, 2)), np.float32)
        got, count = zoo.filter_rows(jnp.asarray(x), jnp.zeros(4))
        assert int(count) == 0
        assert not np.any(np.asarray(got))


class TestFilterReduce:
    def test_reductions_match_dynamic(self):
        x = np.asarray(rng.standard_normal((8, 3)), np.float32)
        sel = np.asarray([1, 0, 0, 1, 1, 0, 1, 0], np.float32)
        kept = x[sel != 0]
        for op, expect in (("sum", kept.sum(0)), ("mean", kept.mean(0)),
                           ("max", kept.max(0))):
            got = jax.jit(lambda a, s, op=op: zoo.filter_reduce(
                a, s, operation=op))(jnp.asarray(x), jnp.asarray(sel))
            np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-5,
                                       atol=1e-6)

    def test_empty_selector_defined(self):
        x = jnp.asarray(rng.standard_normal((4, 2)), jnp.float32)
        assert not np.any(np.asarray(
            zoo.filter_reduce(x, jnp.zeros(4), operation="mean")))

    def test_metrics_worked_example(self):
        """The reference's common Filter->metric pattern: mean accuracy
        over only the labeled (selector=1) rows."""
        correct = jnp.asarray([1.0, 0.0, 1.0, 1.0, 0.0, 1.0])
        labeled = jnp.asarray([1, 1, 0, 1, 1, 0])
        acc = zoo.filter_reduce(correct, labeled, operation="mean")
        assert float(acc) == pytest.approx(2.0 / 4.0)
