"""NetSpec DSL -> prototxt -> GraphNet round trips.

Reference: python/caffe/net_spec.py (Top/Function/NetSpec/Layers/
Parameters, autonaming, in_place, ntop routing, assign_proto's kwarg ->
param-message rules) as exercised by the MMS driver's make_net
(do_trec_qa_clean.py:377-605).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mms_answer_selection_tpu.models.graph_net import GraphNet
from mms_answer_selection_tpu.utils import netspec
from mms_answer_selection_tpu.utils.netspec import L, P, Enum, NetSpec
from mms_answer_selection_tpu.utils.prototxt import parse_prototxt


class TestEmission:
    def test_kwargs_route_into_param_message(self):
        n = NetSpec()
        n.x = L.Input()
        n.ip = L.InnerProduct(n.x, num_output=10,
                              weight_filler=dict(type="xavier"))
        d = parse_prototxt(n.to_prototxt())
        ip = d["layer"][1]
        assert ip["type"] == "InnerProduct"
        assert ip["bottom"] == "x"
        assert ip["top"] == "ip"
        assert ip["inner_product_param"]["num_output"] == 10
        assert ip["inner_product_param"]["weight_filler"]["type"] == "xavier"

    def test_layer_level_fields_stay_top_level(self):
        n = NetSpec()
        n.x = L.Input()
        n.c = L.Convolution(
            n.x, num_output=4, kernel_size=3,
            param=[dict(name="shared_w", lr_mult=1),
                   dict(lr_mult=2, decay_mult=0)])
        d = parse_prototxt(n.to_prototxt())
        c = d["layer"][1]
        assert c["param"][0]["name"] == "shared_w"
        assert c["param"][1]["lr_mult"] == 2
        assert c["convolution_param"]["num_output"] == 4

    def test_enum_serializes_bare(self):
        n = NetSpec()
        n.x = L.Input()
        n.p = L.Pooling(n.x, pool=P.Pooling.MAX, kernel_size=2, stride=2)
        txt = n.to_prototxt()
        assert "pool: MAX" in txt
        assert '"MAX"' not in txt
        d = parse_prototxt(txt)
        assert d["layer"][1]["pooling_param"]["pool"] == "MAX"

    def test_multi_top_and_names(self):
        n = NetSpec()
        n.question, n.answer, n.label = L.HDF5Data(
            batch_size=50, source="train.txt", shuffle=1, ntop=3)
        d = parse_prototxt(n.to_prototxt())
        h5 = d["layer"]  # single layer: parse_prototxt yields the dict
        assert h5["top"] == ["question", "answer", "label"]
        # layer named after its first top (Function._get_name)
        assert h5["name"] == "question"
        assert h5["hdf5_data_param"]["batch_size"] == 50

    def test_in_place(self):
        n = NetSpec()
        n.x = L.Input()
        n.relu = L.ReLU(n.x, in_place=True)
        d = parse_prototxt(n.to_prototxt())
        relu = d["layer"][1]
        assert relu["bottom"] == "x" and relu["top"] == "x"

    def test_ntop0_sink(self):
        n = NetSpec()
        n.x = L.Input()
        n.sink = L.Silence(n.x, ntop=0)
        d = parse_prototxt(n.to_prototxt())
        s = d["layer"][1]
        assert s["type"] == "Silence" and "top" not in s
        assert s["name"] == "sink"

    def test_autonames_for_unassigned_tops(self):
        # module-level to_proto: intermediate blobs get <Type><n> names
        x = L.Input()
        h = L.TanH(x)
        y = L.TanH(h)
        d = parse_prototxt(netspec.to_prototxt(y))
        types = [l["type"] for l in d["layer"]]
        assert types == ["Input", "TanH", "TanH"]
        assert d["layer"][1]["top"] == "TanH1"
        assert d["layer"][2]["top"] == "TanH2"

    def test_unroutable_kwarg_raises(self):
        n = NetSpec()
        n.x = L.Input()
        with pytest.raises(ValueError, match="no parameter message"):
            n.s = L.Split(n.x, bogus_knob=3)
            n.to_prototxt()

    def test_scalar_to_repeated_convenience(self):
        # assign_proto: scalar against a repeated field -> one-element
        n = NetSpec()
        n.x = L.Input()
        n.s1, n.s2 = L.Slice(n.x, axis=1, slice_point=2, ntop=2)
        d = parse_prototxt(n.to_prototxt())
        assert d["layer"][1]["slice_param"]["slice_point"] == 2

    def test_non_top_positional_raises(self):
        with pytest.raises(TypeError, match="must be Tops"):
            L.ReLU(jnp.zeros((2, 2)))

    def test_register_param_message(self):
        netspec.register_param_message("MyCustomType", "my_custom_param")
        try:
            n = NetSpec()
            n.x = L.Input()
            n.m = L.MyCustomType(n.x, knob=7)
            d = parse_prototxt(n.to_prototxt())
            assert d["layer"][1]["my_custom_param"]["knob"] == 7
        finally:
            netspec._PARAM_MSG.pop("MyCustomType")


class TestExecutesThroughGraphNet:
    def test_mlp_forward_and_grad(self):
        n = NetSpec()
        n.x = L.Input()
        n.label = L.Input()
        n.ip1 = L.InnerProduct(n.x, num_output=8,
                               weight_filler=dict(type="xavier"))
        n.t1 = L.TanH(n.ip1, in_place=True)
        n.ip2 = L.InnerProduct(n.ip1, num_output=3,
                               weight_filler=dict(type="xavier"))
        n.loss = L.SoftmaxWithLoss(n.ip2, n.label)
        net = GraphNet(n.to_prototxt(name="mlp"), phase="train")
        rng = np.random.default_rng(0)
        ins = {"x": jnp.asarray(rng.normal(size=(6, 5)).astype(np.float32)),
               "label": jnp.asarray(rng.integers(0, 3, (6,)))}
        params, state = net.init(jax.random.PRNGKey(0), ins)
        loss, grads = jax.value_and_grad(
            lambda p: net.loss(p, state, ins, train=True)[0])(params)
        assert np.isfinite(float(loss))
        assert float(jnp.sum(jnp.abs(grads["ip1"]["w"]))) > 0

    def test_qa_style_fragment(self):
        # the driver's make_net shape: shared Embed + SimCross + pooling
        n = NetSpec()
        n.question = L.Input()
        n.answer = L.Input()
        shared = [dict(name="embed-weights"), dict(name="embed-bias")]
        n.w2v_q = L.Embed(
            n.question, num_output=8, input_dim=30, param=shared,
            weight_filler=dict(type="uniform", min=-1, max=1))
        n.w2v_a = L.Embed(
            n.answer, num_output=8, input_dim=30, param=shared,
            weight_filler=dict(type="uniform", min=-1, max=1))
        n.sim = L.SimCross(n.w2v_q, n.w2v_a, dist_mode=2, mesure_count=2)
        n.pool = L.Pooling(n.sim, pool=P.Pooling.MAX, global_pooling=True)
        net = GraphNet(n.to_prototxt(), phase="train")
        rng = np.random.default_rng(1)
        ins = {"question": jnp.asarray(rng.integers(0, 30, (4, 7))),
               "answer": jnp.asarray(rng.integers(0, 30, (4, 9)))}
        params, state = net.init(jax.random.PRNGKey(1), ins)
        # ParamSpec name sharing: one owner, the second Embed holds none
        assert "w2v_a" not in params
        blobs, _ = net.apply(params, state, ins, train=False)
        assert blobs["pool"].shape[0] == 4

    def test_enum_is_str_subclass(self):
        assert isinstance(P.Eltwise.SUM, str)
        assert isinstance(P.Eltwise.SUM, Enum)


class TestParamRoutingMerge:
    def test_kwargs_merge_into_explicit_param_either_order(self):
        """Direct kwargs and an explicit <type>_param dict MERGE (like
        pycaffe's assign_proto) regardless of kwarg order, without
        mutating the caller's dict."""
        from mms_answer_selection_tpu.utils.netspec import L, NetSpec
        from mms_answer_selection_tpu.utils.prototxt import parse_prototxt

        shared = dict(num_output=5)
        n = NetSpec()
        n.x = L.Input()
        n.c1 = L.Convolution(n.x, kernel_size=3,
                             convolution_param=shared)
        n.c2 = L.Convolution(n.x, convolution_param=shared,
                             kernel_size=7)
        d = parse_prototxt(str(n.to_proto()))
        by_name = {la["name"]: la for la in d["layer"]}
        assert by_name["c1"]["convolution_param"] == {
            "num_output": 5, "kernel_size": 3}
        assert by_name["c2"]["convolution_param"] == {
            "num_output": 5, "kernel_size": 7}
        assert shared == {"num_output": 5}  # caller's dict untouched
