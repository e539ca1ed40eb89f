"""`qa upgrade --binary` + utils/proto_wire.py: legacy BINARY
NetParameters (V0/V1-era .caffemodel with layer definitions + weights)
upgrade to the modern schema (tools/upgrade_net_proto_binary.cpp,
util/upgrade_proto.cpp:1-1068).

The legacy inputs are HAND-ASSEMBLED wire bytes (independent of the
codec under test), pinned to the public caffe.proto field numbers.
"""

import struct

import numpy as np
import pytest

from mms_answer_selection_tpu.utils.proto_wire import (
    collect_dropped_unknowns, decode_net_binary, encode_net_binary,
    strip_blobs)
from mms_answer_selection_tpu.utils.prototxt import upgrade_net_prototxt


# -- hand wire-format helpers (the test's own, not the codec's) -------------
def _vi(n):
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(num, wt):
    return _vi((num << 3) | wt)


def _ld(num, payload):
    return _tag(num, 2) + _vi(len(payload)) + payload


def _f32(num, v):
    return _tag(num, 5) + struct.pack("<f", v)


def _s(num, text):
    return _ld(num, text.encode())


def _blob(arr, dims):
    """BlobProto with LEGACY num/channels/height/width dims (the V0-era
    blob shape encoding) + packed float data."""
    b = b"".join(_tag(i + 1, 0) + _vi(d) for i, d in enumerate(dims))
    b += _ld(5, np.asarray(arr, "<f4").tobytes())
    return b


W = np.arange(18, dtype=np.float32).reshape(3, 6) / 10.0  # caffe (out, in)
B = np.asarray([0.5, -0.25, 1.0], np.float32)


def _v0_net_bytes():
    """V0-era: NetParameter.layers entries nest an inner V0LayerParameter
    under field 1, with lowercase string types and flat knobs."""
    v0_ip = (_s(1, "ip1") + _s(2, "innerproduct")
             + _tag(3, 0) + _vi(3)                      # num_output
             + _tag(4, 0) + _vi(1)                      # biasterm
             + _ld(50, _blob(W, (1, 1, 3, 6)))          # blobs[0]
             + _ld(50, _blob(B, (1, 1, 1, 3)))          # blobs[1]
             + _f32(51, 1.0) + _f32(51, 2.0)            # blobs_lr
             + _f32(52, 1.0) + _f32(52, 0.0))           # weight_decay
    conn_ip = _ld(1, v0_ip) + _s(2, "data") + _s(3, "ip1")
    v0_relu = _s(1, "relu1") + _s(2, "relu")
    conn_relu = _ld(1, v0_relu) + _s(2, "ip1") + _s(3, "ip1")
    return (_s(1, "v0net")
            + _s(3, "data")                             # input
            + _tag(4, 0) + _vi(4) + _tag(4, 0) + _vi(6)  # input_dim
            + _tag(4, 0) + _vi(1) + _tag(4, 0) + _vi(1)
            + _ld(2, conn_ip) + _ld(2, conn_relu))


def _v1_net_bytes():
    """V1-era: NetParameter.layers entries are flat V1LayerParameters
    with ENUM types (INNER_PRODUCT=14, RELU=18)."""
    ipp = _tag(1, 0) + _vi(3)                           # num_output
    l_ip = (_s(4, "ip1") + _tag(5, 0) + _vi(14)
            + _s(2, "data") + _s(3, "ip1")
            + _ld(6, _blob(W, (1, 1, 3, 6)))
            + _ld(6, _blob(B, (1, 1, 1, 3)))
            + _f32(7, 1.0) + _f32(7, 2.0)               # blobs_lr
            + _ld(17, ipp))                             # inner_product_param
    l_relu = _s(4, "relu1") + _tag(5, 0) + _vi(18) \
        + _s(2, "ip1") + _s(3, "ip1")
    return (_s(1, "v1net")
            + _s(3, "data")
            + _tag(4, 0) + _vi(4) + _tag(4, 0) + _vi(6)
            + _tag(4, 0) + _vi(1) + _tag(4, 0) + _vi(1)
            + _ld(2, l_ip) + _ld(2, l_relu))


class TestDecodeUpgrade:
    def test_v0_decode_and_upgrade(self):
        d = decode_net_binary(_v0_net_bytes())
        assert d["name"] == "v0net"
        assert len(d["layers"]) == 2
        assert d["layers"][0]["layer"]["type"] == "innerproduct"
        up = upgrade_net_prototxt(d)
        assert "layers" not in up
        la = up["layer"][0]
        assert la["type"] == "InnerProduct"
        assert la["inner_product_param"]["num_output"] == 3
        assert la["inner_product_param"]["bias_term"] is True
        # blobs carried through the V0 upgrade as opaque bytes
        assert [isinstance(b, bytes) for b in la["blobs"]] == [True, True]
        assert [p["lr_mult"] for p in la["param"]] == [1.0, 2.0]
        assert [p["decay_mult"] for p in la["param"]] == [1.0, 0.0]
        assert up["layer"][1]["type"] == "ReLU"

    def test_v1_decode_and_upgrade(self):
        d = decode_net_binary(_v1_net_bytes())
        assert d["layers"][0]["type"] == "INNER_PRODUCT"
        up = upgrade_net_prototxt(d)
        la = up["layer"][0]
        assert la["type"] == "InnerProduct"
        assert la["inner_product_param"] == {"num_output": 3}
        assert len(la["blobs"]) == 2
        assert [p["lr_mult"] for p in la["param"]] == [1.0, 2.0]

    def test_modern_roundtrip_fixpoint(self):
        """encode(decode(x)) reparses to the same dict for a modern
        net with every scalar kind (int/bool/float/string/enum/msg)."""
        d = {
            "name": "m", "input": "data",
            "input_shape": {"dim": [2, 6]},
            "layer": [
                {"name": "ip", "type": "InnerProduct", "bottom": "data",
                 "top": "ip",
                 # single occurrence stores as a dict (parse_prototxt's
                 # convention); values are float32-exact
                 "param": {"lr_mult": 1.0, "decay_mult": 0.5},
                 "inner_product_param": {
                     "num_output": 4, "bias_term": True,
                     "weight_filler": {"type": "gaussian", "std": 0.125}}},
                {"name": "pool", "type": "Pooling", "bottom": "ip",
                 "top": "p", "pooling_param": {
                     "pool": "AVE", "kernel_size": 2, "stride": 2}},
                {"name": "drop", "type": "Dropout", "bottom": "p",
                 "top": "p", "include": {"phase": "TRAIN"},
                 "dropout_param": {"dropout_ratio": 0.25}},
            ],
        }
        rt = decode_net_binary(encode_net_binary(d))
        assert strip_blobs(rt) == d

    def test_unknown_fields_reported(self):
        # an unassigned V1 field number (999) inside a layer
        payload = _s(4, "x") + _tag(5, 0) + _vi(18) + _tag(999, 0) + _vi(7)
        data = _s(1, "n") + _ld(2, payload)
        d = decode_net_binary(data)
        dropped = collect_dropped_unknowns(d)
        assert any(num == 999 for _path, num in dropped)

    def test_encode_rejects_legacy(self):
        with pytest.raises(ValueError, match="upgrade"):
            encode_net_binary({"layers": [{"name": "x"}]})


class TestUpgradeBinaryCLI:
    @pytest.mark.parametrize("era", ["v0", "v1"])
    def test_binary_upgrade_runs_and_keeps_weights(self, tmp_path, era):
        """The upgraded binary + structure prototxt rebuild the SAME
        net: GraphNet parses the text, load_caffemodel_binaryproto
        restores the hand-written weights, and the forward computes
        relu(x @ W.T + b)."""
        import jax
        import jax.numpy as jnp

        from mms_answer_selection_tpu.cli import main
        from mms_answer_selection_tpu.models.graph_net import GraphNet
        from mms_answer_selection_tpu.utils.caffemodel import \
            load_caffemodel_binaryproto

        raw = _v0_net_bytes() if era == "v0" else _v1_net_bytes()
        (tmp_path / "legacy.caffemodel").write_bytes(raw)
        main(["upgrade", "--binary", str(tmp_path / "legacy.caffemodel"),
              str(tmp_path / "modern.caffemodel")])
        main(["upgrade", "--binary", str(tmp_path / "legacy.caffemodel"),
              str(tmp_path / "modern.prototxt")])

        text = (tmp_path / "modern.prototxt").read_text()
        assert "layers" not in text.replace("layer {", "")
        net = GraphNet(text)
        x = np.asarray(
            np.random.default_rng(0).normal(size=(4, 1, 1, 6)),
            np.float32)  # NHWC view of the NCHW (4,6,1,1) declaration
        ins = {"data": jnp.asarray(x)}
        params, state = net.init(jax.random.PRNGKey(0), ins)
        specs = net.caffemodel_specs(params, state)
        params, state, report = load_caffemodel_binaryproto(
            str(tmp_path / "modern.caffemodel"), params, state,
            specs=specs)
        np.testing.assert_allclose(
            np.asarray(params["ip1"]["w"]), W.T, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(params["ip1"]["b"]), B, rtol=1e-6)
        blobs, _ = net.apply(params, state, ins)
        expect = np.maximum(x.reshape(4, 6) @ W.T + B, 0.0)
        np.testing.assert_allclose(np.asarray(blobs["ip1"]), expect,
                                   rtol=1e-5)

    def test_binary_requires_out(self, tmp_path):
        from mms_answer_selection_tpu.cli import main

        (tmp_path / "x.caffemodel").write_bytes(_s(1, "n"))
        with pytest.raises(SystemExit, match="output"):
            main(["upgrade", "--binary", str(tmp_path / "x.caffemodel")])


class TestCodecReviewFixes:
    """Regression pins from the round-4 self-review."""

    def test_negative_int32_roundtrip(self):
        d = {"layer": [{"name": "c", "type": "Concat", "bottom": "a",
                        "top": "c", "concat_param": {"axis": -1}},
                       {"name": "l", "type": "SoftmaxWithLoss",
                        "bottom": "c", "top": "loss",
                        "loss_param": {"ignore_label": -1,
                                       "normalization": "VALID"}}]}
        rt = decode_net_binary(encode_net_binary(d))
        assert rt["layer"][0]["concat_param"]["axis"] == -1
        assert rt["layer"][1]["loss_param"]["ignore_label"] == -1
        assert rt["layer"][1]["loss_param"]["normalization"] == "VALID"

    def test_negative_blobshape_dim(self):
        d = {"layer": {"name": "r", "type": "Reshape", "bottom": "x",
                       "top": "y",
                       "reshape_param": {"shape": {"dim": [0, -1, 4]}}}}
        rt = decode_net_binary(encode_net_binary(d))
        assert rt["layer"]["reshape_param"]["shape"]["dim"] == [0, -1, 4]

    def test_fork_extension_params_roundtrip(self):
        """The fork's own layer params (sim_cross_param 162 etc.) must
        survive a binary round trip — the repo's primary interop
        artifact uses them (reference caffe.proto:407-415)."""
        d = {"layer": [
            {"name": "s", "type": "SimCross", "bottom": "q", "top": "m",
             "sim_cross_param": {"dist_mode": 2, "mesure_count": 4,
                                 "bias_term": False}},
            {"name": "bn", "type": "BN", "bottom": "m", "top": "m",
             "bn_param": {"bn_memory": 0.875}},
            {"name": "e", "type": "Embed", "bottom": "q", "top": "emb",
             "embed_param": {"num_output": 50, "input_dim": 100,
                             "weight_source": "w2v.bin"}},
            {"name": "pl", "type": "PairRankLoss", "bottom": "m",
             "top": "loss", "pair_rank_loss_param": {"margin": 0.5}},
            {"name": "sc", "type": "Scale", "bottom": "m", "top": "sm",
             "scale_param": {"bias_term": True, "axis": -1}},
        ]}
        rt = decode_net_binary(encode_net_binary(d))
        las = {la["name"]: la for la in rt["layer"]}
        assert las["s"]["sim_cross_param"] == {
            "dist_mode": 2, "mesure_count": 4, "bias_term": False}
        assert las["bn"]["bn_param"] == {"bn_memory": 0.875}
        assert las["e"]["embed_param"]["weight_source"] == "w2v.bin"
        assert las["pl"]["pair_rank_loss_param"] == {"margin": 0.5}
        assert las["sc"]["scale_param"] == {"bias_term": True, "axis": -1}

    def test_v0_det_and_new_fields(self):
        """V0 fields 58-63: det_context_pad/det_crop_mode live at 58/59
        (crop_mode is a STRING) and new_num..new_width at 60-63."""
        v0 = (_s(1, "w") + _s(2, "window_data")
              + _tag(58, 0) + _vi(16)            # det_context_pad
              + _s(59, "square")                 # det_crop_mode
              + _tag(62, 0) + _vi(24)            # new_height
              + _tag(63, 0) + _vi(32))           # new_width
        data = _ld(2, _ld(1, v0) + _s(3, "win"))
        d = decode_net_binary(data)
        inner = d["layers"]["layer"]
        assert inner["det_context_pad"] == 16
        assert inner["det_crop_mode"] == "square"
        assert inner["new_height"] == 24 and inner["new_width"] == 32


class TestLegacyBinaryWeightLoad:
    @pytest.mark.parametrize("era", ["v0", "v1"])
    def test_loader_reads_legacy_layer_fields(self, tmp_path, era):
        """load_caffemodel_binaryproto must read V0/V1 `layers` blobs
        directly (ReadNetParamsFromBinaryFileOrDie upgrades before
        loading — silently loading nothing is the bug)."""
        import jax
        import jax.numpy as jnp

        from mms_answer_selection_tpu.models.graph_net import GraphNet
        from mms_answer_selection_tpu.utils.caffemodel import \
            load_caffemodel_binaryproto

        raw = _v0_net_bytes() if era == "v0" else _v1_net_bytes()
        (tmp_path / "legacy.caffemodel").write_bytes(raw)
        txt = """
        layer { name: "in" type: "Input" top: "data" }
        layer { name: "ip1" type: "InnerProduct" bottom: "data" top: "y"
          inner_product_param { num_output: 3 } }
        """
        net = GraphNet(txt)
        ins = {"data": jnp.ones((2, 6))}
        p, s = net.init(jax.random.PRNGKey(3), ins)
        p, s, report = load_caffemodel_binaryproto(
            str(tmp_path / "legacy.caffemodel"), p, s,
            specs=net.caffemodel_specs(p, s))
        np.testing.assert_allclose(np.asarray(p["ip1"]["w"]), W.T,
                                   rtol=1e-6)
        np.testing.assert_allclose(np.asarray(p["ip1"]["b"]), B,
                                   rtol=1e-6)
