"""GraphNet layer paths not exercised by the QA family nets: stochastic
layers at execution time, binary-decoded enum codes (ints, not names),
legacy DummyData shape fields, Python-layer class protocols, axis
broadcast permutations, graph-level Embed weight_source, and the
validation errors.  References per test; the enum int codes follow
caffe.proto's enum numbering exactly (the wire carries ints)."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mms_answer_selection_tpu.models.graph_net import GraphNet


def _apply(net, ins, **kw):
    params, state = net.init(jax.random.PRNGKey(0), ins)
    blobs, _ = net.apply(params, state, ins, **kw)
    return params, blobs


class TestStochasticExecution:
    TXT = """
    layer { name: "d" type: "Input" top: "x" }
    layer { name: "drop" type: "Dropout" bottom: "x" top: "y"
      dropout_param { dropout_ratio: 0.5 } }
    layer { name: "s" type: "Sigmoid" bottom: "y" top: "p" }
    """

    def test_dropout_train_masks_and_scales(self):
        ins = {"x": jnp.ones((4, 64), jnp.float32)}
        net = GraphNet(self.TXT, phase="train")
        params, state = net.init(jax.random.PRNGKey(0), ins)
        blobs, _ = net.apply(params, state, ins, train=True,
                             rng=jax.random.PRNGKey(1))
        y = np.asarray(blobs["y"])
        # inverted dropout: survivors scaled by 1/(1-r) = 2
        assert set(np.unique(y)) <= {0.0, 2.0}
        assert 0.0 in y and 2.0 in y
        np.testing.assert_allclose(np.asarray(blobs["p"]),
                                   1.0 / (1.0 + np.exp(-y)), rtol=1e-6)

    def test_dropout_eval_is_identity(self):
        ins = {"x": jnp.ones((4, 8), jnp.float32)}
        net = GraphNet(self.TXT, phase="train")
        params, state = net.init(jax.random.PRNGKey(0), ins)
        blobs, _ = net.apply(params, state, ins, train=False)
        np.testing.assert_array_equal(np.asarray(blobs["y"]), 1.0)

    def test_train_without_rng_raises(self):
        ins = {"x": jnp.ones((4, 8), jnp.float32)}
        net = GraphNet(self.TXT, phase="train")
        params, state = net.init(jax.random.PRNGKey(0), ins)
        with pytest.raises(ValueError, match="stochastic"):
            net.apply(params, state, ins, train=True)


class TestBinaryEnumCodes:
    """Enum fields decoded from BINARY NetParameters arrive as ints
    (proto_wire keeps wire varints); every enum-consuming layer accepts
    the caffe.proto numbering."""

    def _dict_net(self, layer):
        return {"layer": [
            {"name": "i1", "type": "Input", "top": ["a"]},
            {"name": "i2", "type": "Input", "top": ["b"]},
            layer,
        ]}

    def test_eltwise_prod_and_max(self):
        rng = np.random.default_rng(0)
        a = rng.normal(size=(3, 5)).astype(np.float32)
        b = rng.normal(size=(3, 5)).astype(np.float32)
        ins = {"a": jnp.asarray(a), "b": jnp.asarray(b)}
        for code, fn in ((0, np.multiply), (2, np.maximum)):
            net = GraphNet(self._dict_net(
                {"name": "e", "type": "Eltwise", "bottom": ["a", "b"],
                 "top": ["y"],
                 # a list-valued param dict takes the last entry (the
                 # scalar-until-second-occurrence decode convention)
                 "eltwise_param": [{"operation": 1},
                                   {"operation": code}]}))
            _, blobs = _apply(net, ins)
            np.testing.assert_allclose(np.asarray(blobs["y"]), fn(a, b),
                                       rtol=1e-6)

    def test_reduction_codes(self):
        rng = np.random.default_rng(1)
        a = rng.normal(size=(3, 5)).astype(np.float32)
        ins = {"a": jnp.asarray(a)}
        want = {2: np.abs(a).sum(1), 3: (a ** 2).sum(1), 4: a.mean(1)}
        for code, w in want.items():
            net = GraphNet({"layer": [
                {"name": "i", "type": "Input", "top": ["a"]},
                {"name": "r", "type": "Reduction", "bottom": ["a"],
                 "top": ["y"],
                 "reduction_param": {"operation": code, "axis": 1}}]})
            _, blobs = _apply(net, ins)
            np.testing.assert_allclose(np.asarray(blobs["y"]), w,
                                       rtol=1e-5, err_msg=str(code))

    def test_pooling_code_ave(self):
        x = np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1)
        net = GraphNet({"layer": [
            {"name": "i", "type": "Input", "top": ["a"]},
            {"name": "p", "type": "Pooling", "bottom": ["a"], "top": ["y"],
             "pooling_param": {"pool": 1, "kernel_size": 2,
                               "stride": 2}}]})
        _, blobs = _apply(net, {"a": jnp.asarray(x)})
        want = x.reshape(2, 2, 2, 2).mean(axis=(1, 3)).reshape(1, 2, 2, 1)
        np.testing.assert_allclose(np.asarray(blobs["y"]), want, rtol=1e-6)

    def test_hinge_l2_code(self):
        from mms_answer_selection_tpu.ops import losses as L

        rng = np.random.default_rng(2)
        x = rng.normal(size=(4, 3)).astype(np.float32)
        lab = np.array([0, 2, 1, 1], np.int32)
        net = GraphNet({"layer": [
            {"name": "i", "type": "Input", "top": ["a"]},
            {"name": "il", "type": "Input", "top": ["lab"]},
            {"name": "h", "type": "HingeLoss", "bottom": ["a", "lab"],
             "top": ["loss"], "hinge_loss_param": {"norm": 2}}]})
        _, blobs = _apply(net, {"a": jnp.asarray(x),
                                "lab": jnp.asarray(lab)})
        want = L.hinge_loss(jnp.asarray(x), jnp.asarray(lab), norm="L2")
        np.testing.assert_allclose(float(blobs["loss"]), float(want),
                                   rtol=1e-6)

    def test_sim_cross_modes_0_and_1(self):
        from mms_answer_selection_tpu.ops.similarity import (
            sim_cross_cosine, sim_cross_inv_euclidean)

        rng = np.random.default_rng(3)
        q = rng.normal(size=(2, 4, 6)).astype(np.float32)
        a = rng.normal(size=(2, 5, 6)).astype(np.float32)
        ins = {"q": jnp.asarray(q), "a": jnp.asarray(a)}
        for code, fn in ((0, sim_cross_cosine),
                         (1, sim_cross_inv_euclidean)):
            net = GraphNet({"layer": [
                {"name": "iq", "type": "Input", "top": ["q"]},
                {"name": "ia", "type": "Input", "top": ["a"]},
                {"name": "s", "type": "SimCross", "bottom": ["q", "a"],
                 "top": ["y"], "sim_cross_param": {"dist_mode": code}}]})
            _, blobs = _apply(net, ins)
            np.testing.assert_allclose(
                np.asarray(blobs["y"]),
                np.asarray(fn(jnp.asarray(q), jnp.asarray(a))),
                rtol=1e-5, err_msg=str(code))


class TestStructuralLayers:
    def test_slice_even_split_without_points(self):
        x = np.arange(2 * 3 * 1 * 4, dtype=np.float32).reshape(2, 1, 4, 3)
        # NHWC (2, 1, 4, 3); axis default 1 = caffe C -> NHWC axis 3
        net = GraphNet("""
        layer { name: "i" type: "Input" top: "x" }
        layer { name: "sl" type: "Slice" bottom: "x" top: "a" top: "b"
          top: "c" }
        """)
        _, blobs = _apply(net, {"x": jnp.asarray(x)})
        for j, t in enumerate(("a", "b", "c")):
            np.testing.assert_array_equal(np.asarray(blobs[t]),
                                          x[..., j: j + 1])

    def test_slice_indivisible_raises(self):
        net = GraphNet("""
        layer { name: "i" type: "Input" top: "x" }
        layer { name: "sl" type: "Slice" bottom: "x" top: "a" top: "b" }
        """)
        x = jnp.zeros((2, 1, 4, 3))
        with pytest.raises(ValueError, match="divisible"):
            net.init(jax.random.PRNGKey(0), {"x": x})

    def test_im2col_kernel1_identity_and_shape(self):
        rng = np.random.default_rng(4)
        x = rng.normal(size=(2, 4, 4, 3)).astype(np.float32)
        net = GraphNet("""
        layer { name: "i" type: "Input" top: "x" }
        layer { name: "c" type: "Im2col" bottom: "x" top: "y"
          convolution_param { kernel_size: 1 } }
        """)
        _, blobs = _apply(net, {"x": jnp.asarray(x)})
        np.testing.assert_allclose(np.asarray(blobs["y"]), x, rtol=1e-6)
        net2 = GraphNet("""
        layer { name: "i" type: "Input" top: "x" }
        layer { name: "c" type: "Im2col" bottom: "x" top: "y"
          convolution_param { kernel_size: 3 stride: 1 pad: 1 } }
        """)
        _, blobs2 = _apply(net2, {"x": jnp.asarray(x)})
        assert np.asarray(blobs2["y"]).shape == (2, 4, 4, 3 * 9)

    def test_hdf5output_is_silence(self):
        net = GraphNet("""
        layer { name: "i" type: "Input" top: "x" }
        layer { name: "o" type: "HDF5Output" bottom: "x" }
        """)
        _, blobs = _apply(net, {"x": jnp.ones((2, 2))})
        assert "x" in blobs  # bottom still available; no top produced

    def test_dummy_data_legacy_num_fields(self):
        # dummy_data_layer with num/channels/height/width instead of
        # shape {} (the pre-BlobShape fields, caffe.proto DummyDataParam)
        net = GraphNet({"layer": [
            {"name": "dd", "type": "DummyData", "top": ["a", "b"],
             "dummy_data_param": {
                 "num": [2, 3], "channels": [4, 1],
                 "height": [5, 1], "width": [6, 1],
                 "data_filler": {"type": "constant", "value": 7.0}}}]})
        _, blobs = _apply(net, {})
        # NCHW (2,4,5,6) -> NHWC (2,5,6,4)
        assert np.asarray(blobs["a"]).shape == (2, 5, 6, 4)
        assert np.asarray(blobs["b"]).shape == (3, 1, 1, 1)
        np.testing.assert_array_equal(np.asarray(blobs["a"]), 7.0)

    def test_infogain_needs_matrix_bottom(self):
        net = GraphNet("""
        layer { name: "i" type: "Input" top: "x" }
        layer { name: "il" type: "Input" top: "lab" }
        layer { name: "ig" type: "InfogainLoss" bottom: "x" bottom: "lab"
          top: "loss" }
        """)
        with pytest.raises(ValueError, match="third"):
            net.init(jax.random.PRNGKey(0),
                     {"x": jnp.ones((2, 3)),
                      "lab": jnp.zeros((2,), jnp.int32)})


class TestAxisBroadcast:
    def test_scale_by_scalar_parameter(self):
        net = GraphNet("""
        layer { name: "i" type: "Input" top: "x" }
        layer { name: "k" type: "Parameter" top: "k" }
        layer { name: "sc" type: "Scale" bottom: "x" bottom: "k"
          top: "y" }
        """)
        ins = {"x": jnp.full((2, 3), 4.0)}
        params, state = net.init(jax.random.PRNGKey(0), ins)
        assert np.asarray(params["k"]["w"]).shape == ()
        params["k"]["w"] = jnp.asarray(2.5, jnp.float32)
        blobs, _ = net.apply(params, state, ins)
        np.testing.assert_allclose(np.asarray(blobs["y"]), 10.0)

    def test_scale_by_full_rank_bottom(self):
        rng = np.random.default_rng(5)
        x = rng.normal(size=(2, 3, 4, 4)).astype(np.float32)
        s = rng.normal(size=(2, 3, 4, 4)).astype(np.float32)
        net = GraphNet("""
        layer { name: "i" type: "Input" top: "x" }
        layer { name: "j" type: "Input" top: "s" }
        layer { name: "sc" type: "Scale" bottom: "x" bottom: "s"
          top: "y" }
        """)
        _, blobs = _apply(net, {"x": jnp.asarray(x), "s": jnp.asarray(s)})
        np.testing.assert_allclose(np.asarray(blobs["y"]), x * s,
                                   rtol=1e-6)

    def test_bias_spanning_c_and_h_permutes(self):
        """A (C, H) operand at caffe axis 1 on a 4-D NHWC blob: NHWC
        positions (3, 1) are out of order, so the operand transposes
        before broadcasting (scale_layer.cpp:55-77 axis alignment)."""
        rng = np.random.default_rng(6)
        x = rng.normal(size=(2, 4, 5, 3)).astype(np.float32)  # NHWC
        s = rng.normal(size=(3, 4)).astype(np.float32)        # (C, H)
        net = GraphNet("""
        layer { name: "i" type: "Input" top: "x" }
        layer { name: "p" type: "Parameter" top: "s"
          parameter_param { shape { dim: 3 dim: 4 } } }
        layer { name: "bi" type: "Bias" bottom: "x" bottom: "s"
          top: "y" bias_param { axis: 1 } }
        """)
        ins = {"x": jnp.asarray(x)}
        params, state = net.init(jax.random.PRNGKey(0), ins)
        params["p"]["w"] = jnp.asarray(s)
        blobs, _ = net.apply(params, state, ins)
        want = x + s.T[None, :, None, :]  # y[n,h,w,c] = x + s[c,h]
        np.testing.assert_allclose(np.asarray(blobs["y"]), want, rtol=1e-6)


class TestPythonLayerProtocols:
    @pytest.fixture(autouse=True)
    def fake_module(self):
        mod = types.ModuleType("fake_pylayer_mod")

        class ScaleByParam:
            def __init__(self, param_str):
                self.k = float(param_str)

            def forward(self, x):
                return x * self.k

        class Negate:
            def __call__(self, x):
                return -x

        def mul_ps(x, param_str="1.0"):
            return x * float(param_str)

        mod.ScaleByParam = ScaleByParam
        mod.Negate = Negate
        mod.mul_ps = mul_ps
        sys.modules["fake_pylayer_mod"] = mod
        yield
        del sys.modules["fake_pylayer_mod"]

    def _net(self, layer, param_str=None):
        p = {"module": "fake_pylayer_mod", "layer": layer}
        if param_str is not None:
            p["param_str"] = param_str
        return GraphNet({"layer": [
            {"name": "i", "type": "Input", "top": ["x"]},
            {"name": "py", "type": "Python", "bottom": ["x"],
             "top": ["y"], "python_param": p}]})

    def test_class_consumes_param_str(self):
        net = self._net("ScaleByParam", "3.0")
        _, blobs = _apply(net, {"x": jnp.full((2, 2), 2.0)})
        np.testing.assert_allclose(np.asarray(blobs["y"]), 6.0)

    def test_class_without_param_str_ctor_falls_back(self):
        # Negate's __init__ takes no param_str: TypeError -> target()
        net = self._net("Negate", "ignored")
        _, blobs = _apply(net, {"x": jnp.full((2, 2), 2.0)})
        np.testing.assert_allclose(np.asarray(blobs["y"]), -2.0)

    def test_function_param_str_keyword(self):
        net = self._net("mul_ps", "4.0")
        _, blobs = _apply(net, {"x": jnp.full((2, 2), 2.0)})
        np.testing.assert_allclose(np.asarray(blobs["y"]), 8.0)


class TestFillers:
    def test_msra_and_unitball_and_bilinear(self):
        net = GraphNet("""
        layer { name: "i" type: "Input" top: "x" }
        layer { name: "c" type: "Convolution" bottom: "x" top: "c"
          convolution_param { num_output: 4 kernel_size: 3 pad: 1
            weight_filler { type: "msra" } } }
        layer { name: "pr" type: "PReLU" bottom: "c" top: "p"
          prelu_param { filler { type: "positive_unitball" } } }
        layer { name: "dc" type: "Deconvolution" bottom: "p" top: "d"
          convolution_param { num_output: 4 kernel_size: 2 stride: 2
            bias_term: false weight_filler { type: "bilinear" } } }
        """)
        ins = {"x": jnp.ones((1, 4, 4, 3))}
        params, _ = _apply(net, ins)
        w = np.asarray(params["c"]["w"])
        assert w.std() > 0  # msra actually random
        slopes = np.asarray(params["pr"]["slopes"])
        # PositiveUnitballFiller normalizes per leading-axis slice
        # (filler.hpp:111 dim = count/num); a 1-D (C,) blob has dim=1,
        # so every element individually normalizes to exactly 1.0.
        np.testing.assert_allclose(slopes, np.ones_like(slopes), rtol=1e-5)
        dw = np.asarray(params["dc"]["w"])
        # bilinear 2x kernel k=2: all entries 0.25..1.0 symmetric
        assert np.allclose(dw[0, 0], dw[0, 0].T)

    def test_unknown_filler_raises(self):
        net = GraphNet("""
        layer { name: "i" type: "Input" top: "x" }
        layer { name: "c" type: "Convolution" bottom: "x" top: "c"
          convolution_param { num_output: 2 kernel_size: 1
            weight_filler { type: "frobnicate" } } }
        """)
        with pytest.raises(ValueError, match="filler"):
            net.init(jax.random.PRNGKey(0), {"x": jnp.ones((1, 2, 2, 3))})


class TestConvValidation:
    def test_group_divisibility(self):
        net = GraphNet("""
        layer { name: "i" type: "Input" top: "x" }
        layer { name: "c" type: "Convolution" bottom: "x" top: "c"
          convolution_param { num_output: 4 kernel_size: 1 group: 3 } }
        """)
        with pytest.raises(ValueError, match="group"):
            net.init(jax.random.PRNGKey(0), {"x": jnp.ones((1, 2, 2, 3))})

    def test_deconv_nonsquare_kernel(self):
        net = GraphNet("""
        layer { name: "i" type: "Input" top: "x" }
        layer { name: "d" type: "Deconvolution" bottom: "x" top: "y"
          convolution_param { num_output: 2 kernel_h: 2 kernel_w: 3 } }
        """)
        with pytest.raises(ValueError, match="square"):
            net.init(jax.random.PRNGKey(0), {"x": jnp.ones((1, 2, 2, 3))})

    def test_deconv_nonsquare_stride(self):
        net = GraphNet({"layer": [
            {"name": "i", "type": "Input", "top": ["x"]},
            {"name": "d", "type": "Deconvolution", "bottom": ["x"],
             "top": ["y"],
             "convolution_param": {"num_output": 2, "kernel_size": 2,
                                   "stride_h": 2, "stride_w": 1}}]})
        with pytest.raises(ValueError, match="square"):
            net.init(jax.random.PRNGKey(0), {"x": jnp.ones((1, 2, 2, 3))})


class TestGraphEmbedWeightSource:
    def test_rows_loaded_from_txt(self, tmp_path):
        vec = tmp_path / "v.txt"
        vec.write_text("alpha 1 2 3 4\nbeta 5 6 7 8\n")
        net = GraphNet(f"""
        layer {{ name: "i" type: "Input" top: "ids" }}
        layer {{ name: "em" type: "Embed" bottom: "ids" top: "e"
          embed_param {{ num_output: 4 input_dim: 6
            weight_source: "{vec}" }} }}
        """)
        ins = {"ids": jnp.asarray([[0, 1, 5]])}
        params, blobs = _apply(net, ins)
        w = np.asarray(params["em"]["w"])
        np.testing.assert_array_equal(w[0], [1, 2, 3, 4])
        np.testing.assert_array_equal(w[1], [5, 6, 7, 8])

    def test_too_many_rows_raises(self, tmp_path):
        vec = tmp_path / "v.txt"
        vec.write_text("a 1 2\nb 3 4\nc 5 6\n")
        net = GraphNet(f"""
        layer {{ name: "i" type: "Input" top: "ids" }}
        layer {{ name: "em" type: "Embed" bottom: "ids" top: "e"
          embed_param {{ num_output: 2 input_dim: 2
            weight_source: "{vec}" }} }}
        """)
        with pytest.raises(ValueError, match="vocab|rows"):
            net.init(jax.random.PRNGKey(0),
                     {"ids": jnp.asarray([[0, 1]])})


class TestGraphValidation:
    def test_duplicate_layer_name(self):
        with pytest.raises(ValueError, match="duplicate"):
            GraphNet("""
            layer { name: "i" type: "Input" top: "x" }
            layer { name: "i" type: "Sigmoid" bottom: "x" top: "y" }
            """)

    def test_unproduced_bottom(self):
        net = GraphNet("""
        layer { name: "i" type: "Input" top: "x" }
        layer { name: "s" type: "Sigmoid" bottom: "nope" top: "y" }
        """)
        with pytest.raises(KeyError, match="not yet produced"):
            net.init(jax.random.PRNGKey(0), {"x": jnp.ones((2, 2))})

    def test_missing_param_raises(self):
        net = GraphNet("""
        layer { name: "i" type: "Input" top: "x" }
        layer { name: "fc" type: "InnerProduct" bottom: "x" top: "y"
          inner_product_param { num_output: 3 } }
        """)
        ins = {"x": jnp.ones((2, 4))}
        params, state = net.init(jax.random.PRNGKey(0), ins)
        del params["fc"]["w"]
        with pytest.raises(KeyError, match="missing parameter"):
            net.apply(params, state, ins)

    def test_none_returning_extension_layer(self):
        from mms_answer_selection_tpu.models.graph_net import (
            layer_type_list, register_layer)

        calls = []

        def _sink(ctx, node, bottoms):
            calls.append(len(bottoms))
            return None  # no tops: normalized to []

        register_layer("TestNoneSink", _sink)
        try:
            assert "TestNoneSink" in layer_type_list()
            net = GraphNet("""
            layer { name: "i" type: "Input" top: "x" }
            layer { name: "k" type: "TestNoneSink" bottom: "x" }
            """)
            _, blobs = _apply(net, {"x": jnp.ones((2, 2))})
            assert calls and "x" in blobs
        finally:
            from mms_answer_selection_tpu.models import graph_net as g
            g._REGISTRY.pop("TestNoneSink", None)
