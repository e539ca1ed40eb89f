"""matcaffe bridge: the MEX command surface (matlab/+caffe/private/
caffe_.cpp) over pynet/pysolver, plus the wire protocol the shipped
``.m`` client speaks.  Test nets/solvers mirror the reference's own
matcaffe suite (matlab/+caffe/+test/test_net.m, test_solver.m,
test_io.m): same DummyData net, same solver prototxt, same idioms."""

import numpy as np
import pytest

from mms_answer_selection_tpu.matcaffe import (MatBridge, MatClient,
                                               from_mat, serve_matcaffe,
                                               to_mat)

NUM_OUTPUT = 13

# test_net.m simple_net_file, verbatim semantics (DummyData 5x2x3x4 data
# + 5x1x1x1 label, conv 11ch k2 pad3, ip NUM_OUTPUT, softmax loss)
NET_PROTOTXT = """
name: "testnet" force_backward: true
layer { type: "DummyData" name: "data" top: "data" top: "label"
  dummy_data_param { num: 5 channels: 2 height: 3 width: 4
    num: 5 channels: 1 height: 1 width: 1
    data_filler { type: "gaussian" std: 1 }
    data_filler { type: "constant" } } }
layer { type: "Convolution" name: "conv" bottom: "data" top: "conv"
  convolution_param { num_output: 11 kernel_size: 2 pad: 3
    weight_filler { type: "gaussian" std: 1 }
    bias_filler { type: "constant" value: 2 } }
  param { decay_mult: 1 } param { decay_mult: 0 } }
layer { type: "InnerProduct" name: "ip" bottom: "conv" top: "ip"
  inner_product_param { num_output: %d
    weight_filler { type: "gaussian" std: 2.5 }
    bias_filler { type: "constant" value: -3 } } }
layer { type: "SoftmaxWithLoss" name: "loss" bottom: "ip" bottom: "label"
  top: "loss" }
""" % NUM_OUTPUT

SOLVER_PROTOTXT = """
net: "%s"
test_iter: 10 test_interval: 10 base_lr: 0.01 momentum: 0.9
weight_decay: 0.0005 lr_policy: "inv" gamma: 0.0001 power: 0.75
display: 100 max_iter: 100 snapshot_after_train: false
"""


@pytest.fixture()
def net_file(tmp_path):
    p = tmp_path / "testnet.prototxt"
    p.write_text(NET_PROTOTXT)
    return str(p)


@pytest.fixture()
def bridge():
    return MatBridge(seed=7)


def _get_net(bridge, net_file, phase="train"):
    h = bridge("get_net", net_file, phase)
    attr = bridge("net_get_attr", h)
    return h, attr


def _blob(bridge, attr, name):
    i = attr["blob_names"].index(name)
    return attr["hBlob_blobs"][i]


class TestLayout:
    def test_to_mat_reverses_dims(self):
        a = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
        m = to_mat(a)
        assert m.shape == (4, 3, 2)
        # width fastest: caffe (n, c, h, w) elem == mat (w, h, c, n)
        assert m[1, 2, 0] == a[0, 2, 1]
        np.testing.assert_array_equal(from_mat(m), a)

    def test_count_check(self):
        with pytest.raises(ValueError, match="number of elements"):
            from_mat(np.zeros((2, 2), np.float32), count=5)

    def test_scalar_becomes_1dim(self):
        assert to_mat(np.float32(3.0)).shape == (1,)


class TestHandles:
    def test_init_key_and_reset_invalidate(self, bridge, net_file):
        key = bridge("get_init_key")
        h, _ = _get_net(bridge, net_file)
        assert h["init_key"] == key
        bridge("reset")
        assert bridge("get_init_key") != key
        with pytest.raises(ValueError, match="invalid init_key"):
            bridge("net_forward", h)

    def test_unknown_command(self, bridge):
        with pytest.raises(ValueError, match="Unknown command"):
            bridge("no_such_cmd")

    def test_modes_recorded(self, bridge):
        bridge("set_mode_gpu")
        bridge("set_device", 0.0)
        assert bridge.mode == "gpu"
        bridge("set_mode_cpu")
        assert bridge.mode == "cpu"

    def test_version(self, bridge):
        assert isinstance(bridge("version"), str)


class TestNet:
    """mirrors matlab/+caffe/+test/test_net.m"""

    def test_attr_names_and_indices(self, bridge, net_file):
        _, attr = _get_net(bridge, net_file)
        assert attr["layer_names"] == ["data", "conv", "ip", "loss"]
        assert attr["blob_names"] == ["data", "label", "conv", "ip",
                                      "loss"]
        # a DummyData net has NO net inputs (test_inputs_outputs)
        assert attr["input_blob_indices"] == []
        assert [attr["blob_names"][i]
                for i in attr["output_blob_indices"]] == ["loss"]

    def test_blob_set_get_reshape(self, bridge, net_file):
        _, attr = _get_net(bridge, net_file)
        hb = _blob(bridge, attr, "data")
        shape = bridge("blob_get_shape", hb)
        assert shape == [4.0, 3.0, 2.0, 5.0]  # (w, h, c, n)
        mat_shape = tuple(int(s) for s in shape)
        bridge("blob_set_data", hb, 10 * np.ones(mat_shape, np.float32))
        np.testing.assert_array_equal(
            bridge("blob_get_data", hb),
            10 * np.ones(mat_shape, np.float32))
        bridge("blob_set_diff", hb, -2 * np.ones(mat_shape, np.float32))
        np.testing.assert_array_equal(
            bridge("blob_get_diff", hb),
            -2 * np.ones(mat_shape, np.float32))
        bridge("blob_reshape", hb, [6, 5, 4, 3, 2, 1])
        assert bridge("blob_get_shape", hb) == [6, 5, 4, 3, 2, 1]
        bridge("blob_reshape", hb, list(shape))
        bridge("net_reshape", _get_net(bridge, net_file)[0])

    def test_layer_params_and_type(self, bridge, net_file):
        _, attr = _get_net(bridge, net_file)
        i = attr["layer_names"].index("conv")
        lattr = bridge("layer_get_attr", attr["hLayer_layers"][i])
        # conv weight caffe (11, 2, 2, 2) -> mat [2 2 2 11]
        assert bridge("blob_get_shape",
                      lattr["hBlob_blobs"][0]) == [2, 2, 2, 11]
        assert bridge("blob_get_shape", lattr["hBlob_blobs"][1]) == [11]
        assert bridge("layer_get_type",
                      attr["hLayer_layers"][i]) == "Convolution"
        # bias_filler constant 2 landed
        np.testing.assert_array_equal(
            bridge("blob_get_data", lattr["hBlob_blobs"][1]),
            np.full(11, 2, np.float32))

    def test_forward_backward(self, bridge, net_file):
        h, attr = _get_net(bridge, net_file)
        hl = _blob(bridge, attr, "label")
        labels = np.random.default_rng(0).integers(
            0, NUM_OUTPUT, (1, 1, 1, 5)).astype(np.float32)
        bridge("blob_set_data", hl, labels)
        # stage data too: input diffs flow to explicitly-fed float blobs
        rngd = np.random.default_rng(3)
        bridge("blob_set_data", _blob(bridge, attr, "data"),
               rngd.normal(size=(4, 3, 2, 5)).astype(np.float32))
        bridge("net_forward", h)
        loss1 = bridge("blob_get_data", _blob(bridge, attr, "loss"))
        assert np.isfinite(loss1).all()
        bridge("blob_set_diff", _blob(bridge, attr, "loss"),
               np.ones(1, np.float32))
        bridge("net_backward", h)
        d = bridge("blob_get_diff", _blob(bridge, attr, "data"))
        assert d.shape == (4, 3, 2, 5)
        assert np.abs(d).sum() > 0  # force_backward: data diff flows

    def test_param_write_through(self, bridge, net_file):
        h, attr = _get_net(bridge, net_file)
        i = attr["layer_names"].index("ip")
        lattr = bridge("layer_get_attr", attr["hLayer_layers"][i])
        hb = lattr["hBlob_blobs"][1]  # ip bias, constant -3
        np.testing.assert_array_equal(
            bridge("blob_get_data", hb),
            np.full(NUM_OUTPUT, -3, np.float32))
        bridge("blob_set_data", hb,
               np.arange(NUM_OUTPUT, dtype=np.float32))
        np.testing.assert_array_equal(
            bridge("blob_get_data", hb),
            np.arange(NUM_OUTPUT, dtype=np.float32))

    def test_save_and_read(self, bridge, net_file, tmp_path):
        h, attr = _get_net(bridge, net_file)
        weights = str(tmp_path / "w.caffemodel")
        bridge("net_save", h, weights)
        h2, attr2 = _get_net(bridge, net_file)
        bridge("net_copy_from", h2, weights)
        for ln in ("conv", "ip"):
            i = attr["layer_names"].index(ln)
            la = bridge("layer_get_attr", attr["hLayer_layers"][i])
            i2 = attr2["layer_names"].index(ln)
            la2 = bridge("layer_get_attr", attr2["hLayer_layers"][i2])
            for b1, b2 in zip(la["hBlob_blobs"], la2["hBlob_blobs"]):
                np.testing.assert_array_equal(
                    bridge("blob_get_data", b1),
                    bridge("blob_get_data", b2))


class TestSolver:
    """mirrors matlab/+caffe/+test/test_solver.m"""

    def test_solve(self, bridge, net_file, tmp_path):
        sf = tmp_path / "solver.prototxt"
        sf.write_text(SOLVER_PROTOTXT % net_file)
        hs = bridge("get_solver", str(sf))
        attr = bridge("solver_get_attr", hs)
        assert len(attr["hNet_test_nets"]) == 1
        nattr = bridge("net_get_attr", attr["hNet_net"])
        hl = None
        for idx, name in enumerate(nattr["blob_names"]):
            if name == "label":
                hl = nattr["hBlob_blobs"][idx]
        labels = np.random.default_rng(1).integers(
            0, NUM_OUTPUT, (1, 1, 1, 5)).astype(np.float32)
        bridge("blob_set_data", hl, labels)
        assert bridge("solver_get_iter", hs) == 0
        bridge("solver_step", hs, 30.0)
        assert bridge("solver_get_iter", hs) == 30
        bridge("solver_solve", hs)
        assert bridge("solver_get_iter", hs) == 100

    def test_restore(self, bridge, net_file, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        sf = tmp_path / "solver.prototxt"
        sf.write_text((SOLVER_PROTOTXT % net_file)
                      + 'snapshot_prefix: "snap"\n')
        hs = bridge("get_solver", str(sf))
        bridge("solver_step", hs, 3.0)
        _model, state = bridge._deref(hs).snapshot()
        bridge("solver_step", hs, 2.0)
        bridge("solver_restore", hs, state)
        assert bridge("solver_get_iter", hs) == 3


class TestIO:
    """mirrors matlab/+caffe/+test/test_io.m"""

    def test_read_write_mean(self, bridge, tmp_path):
        rng = np.random.default_rng(2)
        mean_write = (255 * rng.random((20, 30, 3))).astype(np.float32)
        f = str(tmp_path / "mean.binaryproto")
        bridge("write_mean", mean_write, f)
        mean_read = bridge("read_mean", f)
        np.testing.assert_allclose(mean_read, mean_write, rtol=1e-6)

    def test_write_mean_2d(self, bridge, tmp_path):
        mean = np.ones((4, 5), np.float32)
        f = str(tmp_path / "m2.binaryproto")
        bridge("write_mean", mean, f)
        np.testing.assert_allclose(bridge("read_mean", f), mean)


class TestWireProtocol:
    """The daemon speaks the exact protocol the .m client uses — drive
    it through a socket like MATLAB would."""

    def test_end_to_end_over_socket(self, net_file):
        srv, port = serve_matcaffe(port=0, background=True)
        try:
            cli = MatClient(port=port)
            assert cli("ping") == "pong"
            key = cli("get_init_key")
            h = cli("get_net", net_file, "train")
            assert h["init_key"] == key
            attr = cli("net_get_attr", h)
            assert attr["blob_names"] == ["data", "label", "conv", "ip",
                                          "loss"]
            i = attr["blob_names"].index("data")
            hb = attr["hBlob_blobs"][i]
            cli("blob_set_data", hb, 3 * np.ones((4, 3, 2, 5),
                                                 np.float32))
            got = cli("blob_get_data", hb)
            assert isinstance(got, np.ndarray) and got.shape == (4, 3, 2, 5)
            np.testing.assert_array_equal(got, 3.0)
            cli("net_forward", h)
            j = attr["blob_names"].index("loss")
            loss = cli("blob_get_data", attr["hBlob_blobs"][j])
            assert np.isfinite(loss).all()
            with pytest.raises(RuntimeError, match="Unknown command"):
                cli("nope")
            cli.close()
        finally:
            srv.shutdown()

    def test_array_round_trip_is_column_major(self):
        from mms_answer_selection_tpu.matcaffe import (decode_value,
                                                       encode_value)
        a = np.arange(12, dtype=np.float32).reshape(3, 4)
        b = decode_value(encode_value(a))
        np.testing.assert_array_equal(a, b)
        import base64 as b64
        enc = encode_value(a)
        raw = np.frombuffer(b64.b64decode(enc["data"]), "<f4")
        np.testing.assert_array_equal(raw, a.ravel(order="F"))

    def test_reshape_accepts_matlab_row_vector(self, net_file):
        # the .m client sends shapes as 1 x N row matrices over the wire
        srv, port = serve_matcaffe(port=0, background=True)
        try:
            cli = MatClient(port=port)
            h = cli("get_net", net_file, "train")
            attr = cli("net_get_attr", h)
            hb = attr["hBlob_blobs"][attr["blob_names"].index("data")]
            cli("blob_reshape", hb,
                np.asarray([[6, 5, 4, 3, 2, 1]], np.float32))
            assert cli("blob_get_shape", hb) == [6, 5, 4, 3, 2, 1]
            cli.close()
        finally:
            srv.shutdown()
