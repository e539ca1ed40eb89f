"""pycaffe-style stateful Net wrapper (models/pynet.py).

Reference: python/caffe/pycaffe.py:22-233 (_Net_forward/_Net_backward/
blobs/params dicts), _caffe.cpp:142-345.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mms_answer_selection_tpu.models import mms_qa as M
from mms_answer_selection_tpu.models.pynet import Net
from mms_answer_selection_tpu.utils.prototxt import net_prototxt_from_config

MLP = """
layer { name: "x" type: "Input" top: "x" }
layer { name: "label" type: "Input" top: "label" }
layer { name: "ip1" type: "InnerProduct" bottom: "x" top: "ip1"
  inner_product_param { num_output: 8 weight_filler { type: "xavier" } } }
layer { name: "t1" type: "TanH" bottom: "ip1" top: "ip1" }
layer { name: "ip2" type: "InnerProduct" bottom: "ip1" top: "ip2"
  inner_product_param { num_output: 3 weight_filler { type: "xavier" } } }
layer { name: "loss" type: "SoftmaxWithLoss" bottom: "ip2" bottom: "label"
  top: "loss" }
"""


def _mlp_inputs(n=6):
    rng = np.random.default_rng(0)
    return dict(x=jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32)),
                label=jnp.asarray(rng.integers(0, 3, (n,))))


class TestForward:
    def test_forward_blobs_outputs(self):
        net = Net(MLP, phase="train", seed=1)
        assert net.layer_names[0] == "x"
        assert sorted(net.inputs) == ["label", "x"]
        out = net.forward(**_mlp_inputs())
        assert set(out) == set(net.outputs) == {"loss"}
        # every intermediate top is inspectable (pycaffe net.blobs)
        assert net.blobs["ip1"].shape == (6, 8)
        assert net.blobs["ip2"].shape == (6, 3)
        assert np.isfinite(float(out["loss"]))
        # params dict exposes layer blobs by name
        assert net.params["ip1"]["w"].shape == (5, 8)

    def test_requires_forward_before_params(self):
        net = Net(MLP)
        with pytest.raises(RuntimeError, match="forward"):
            net.params

    def test_forward_matches_graphnet(self):
        cfg = dataclasses.replace(M.V4, vocab_size=80, sim_dropout=0.0,
                                  fc1_dropout=0.0)
        text = net_prototxt_from_config(cfg, phase="eval")
        rng = np.random.default_rng(3)
        ins = {"question": jnp.asarray(rng.integers(0, 80, (4, 40))),
               "answer": jnp.asarray(rng.integers(0, 80, (4, 40))),
               "label": jnp.asarray(rng.integers(0, 2, (4,))),
               "group": jnp.asarray([0, 0, 1, 1]),
               "overlap_feat": jnp.asarray(
                   rng.normal(size=(4, 2)).astype(np.float32))}
        net = Net(text, phase="test", seed=7)
        net.forward(**ins)
        from mms_answer_selection_tpu.models.graph_net import GraphNet

        g = GraphNet(text, phase="test")
        p, s = g.init(jax.random.PRNGKey(7), ins)
        blobs, _ = g.apply(p, s, ins, train=False)
        np.testing.assert_allclose(net.blobs["prob"], blobs["prob"],
                                   atol=1e-6)


class TestBackward:
    def test_backward_param_and_input_diffs(self):
        net = Net(MLP, phase="train", seed=2)
        ins = _mlp_inputs()
        net.forward(**ins)
        diffs = net.backward(loss=jnp.ones(()))
        # float input gets a diff; int label does not
        assert set(diffs) == {"x"}
        assert diffs["x"].shape == ins["x"].shape
        assert float(jnp.sum(jnp.abs(net.param_diffs["ip2"]["w"]))) > 0
        # diffs agree with jax.grad through the functional core
        from mms_answer_selection_tpu.models.graph_net import GraphNet

        g = GraphNet(MLP, phase="train")

        def loss_fn(p, x):
            blobs, _ = g.apply(p, net.state, {**ins, "x": x}, train=True,
                               rng=net._last_rng)
            return blobs["loss"]

        gp, gx = jax.grad(loss_fn, argnums=(0, 1))(net.params, ins["x"])
        np.testing.assert_allclose(diffs["x"], gx, atol=1e-5)
        np.testing.assert_allclose(net.param_diffs["ip1"]["w"],
                                   gp["ip1"]["w"], atol=1e-5)

    def test_backward_needs_forward(self):
        net = Net(MLP)
        with pytest.raises(RuntimeError, match="forward"):
            net.backward(loss=jnp.ones(()))


class TestWeightsIO:
    def test_save_copy_from_roundtrip(self, tmp_path):
        ins = _mlp_inputs()
        a = Net(MLP, phase="test", seed=5)
        a.forward(**ins)
        path = str(tmp_path / "w.caffemodel.h5")
        a.save(path)

        b = Net(MLP, phase="test", seed=99)  # different init
        b.forward(**ins)
        b.copy_from(path)
        out = b.forward(**ins)
        np.testing.assert_allclose(out["loss"], a.forward(**ins)["loss"],
                                   atol=1e-6)

    def test_lazy_weights_at_construction(self, tmp_path):
        ins = _mlp_inputs()
        a = Net(MLP, phase="test", seed=5)
        a.forward(**ins)
        path = str(tmp_path / "w.caffemodel.h5")
        a.save(path)

        c = Net(MLP, phase="test", weights=path, seed=123)
        out = c.forward(**ins)  # weights load lazily at first forward
        np.testing.assert_allclose(out["loss"], a.forward(**ins)["loss"],
                                   atol=1e-6)


class TestDataLayerFeeds:
    """pycaffe's no-argument ``net.forward()`` advances the net's own
    data layers; PyNet streams prototxt-declared sources the same way
    (pycaffe.py:82-95 batches through the data layer)."""

    def _net_text(self, tmp_path, n=20):
        import h5py

        rng = np.random.default_rng(0)
        xs = rng.normal(size=(n, 4)).astype(np.float32)
        ys = np.arange(n).astype(np.float64)  # row id as label
        with h5py.File(tmp_path / "d.h5", "w") as f:
            f["data"], f["label"] = xs, ys
        (tmp_path / "d.txt").write_text(str(tmp_path / "d.h5") + "\n")
        return (f'layer {{ name: "d" type: "HDF5Data" top: "data" '
                f'top: "label" hdf5_data_param {{ '
                f'source: "{tmp_path / "d.txt"}" batch_size: 5 }} }}\n'
                'layer { name: "fc" type: "InnerProduct" bottom: "data" '
                'top: "fc" inner_product_param { num_output: 2 '
                'weight_filler { type: "xavier" } } }\n'), xs

    def test_forward_streams_batches(self, tmp_path):
        text, xs = self._net_text(tmp_path)
        net = Net(text, phase="test")
        net.forward()
        np.testing.assert_array_equal(np.asarray(net.blobs["label"]),
                                      [0, 1, 2, 3, 4])
        np.testing.assert_allclose(np.asarray(net.blobs["data"]),
                                   xs[:5], rtol=1e-6)
        net.forward()  # the data layer ADVANCES
        np.testing.assert_array_equal(np.asarray(net.blobs["label"]),
                                      [5, 6, 7, 8, 9])

    def test_explicit_inputs_win(self, tmp_path):
        text, xs = self._net_text(tmp_path)
        net = Net(text, phase="test")
        override = np.full((5, 4), 2.0, np.float32)
        net.forward(data=override)          # label still streams
        np.testing.assert_array_equal(np.asarray(net.blobs["data"]),
                                      override)
        np.testing.assert_array_equal(np.asarray(net.blobs["label"]),
                                      [0, 1, 2, 3, 4])

    def test_input_layers_still_require_args(self):
        net = Net('layer { name: "in" type: "Input" top: "x" }\n'
                  'layer { name: "r" type: "ReLU" bottom: "x" '
                  'top: "y" }\n')
        with pytest.raises(KeyError):
            net.forward()  # Input tops have no prototxt source


class TestMemoryData:
    def test_set_input_arrays(self):
        """pycaffe's net.set_input_arrays (pycaffe.py:235-243 over
        MemoryDataLayer::Reset): forward slices successive batch_size
        rows, wrapping."""
        txt = """
        layer { name: "md" type: "MemoryData" top: "data" top: "label"
          memory_data_param { batch_size: 2 } }
        layer { name: "fc" type: "InnerProduct" bottom: "data" top: "fc"
          inner_product_param { num_output: 3
            weight_filler { type: "xavier" } } }
        """
        net = Net(txt, phase="test")
        data = np.arange(12, dtype=np.float32).reshape(6, 2)
        labels = np.arange(6, dtype=np.float32)
        net.set_input_arrays(data, labels)
        net.forward()
        np.testing.assert_array_equal(np.asarray(net.blobs["label"]),
                                      [0, 1])
        net.forward()
        np.testing.assert_array_equal(np.asarray(net.blobs["label"]),
                                      [2, 3])
        for _ in range(2):
            net.forward()  # wraps to the start
        np.testing.assert_array_equal(np.asarray(net.blobs["label"]),
                                      [0, 1])

    def test_batch_size_mismatch_raises(self):
        txt = ('layer { name: "md" type: "MemoryData" top: "data" '
               'top: "label" memory_data_param { batch_size: 4 } }\n'
               'layer { name: "r" type: "ReLU" bottom: "data" '
               'top: "y" }\n')
        net = Net(txt, phase="test")
        with pytest.raises(ValueError, match="multiple"):
            net.set_input_arrays(np.zeros((6, 2), np.float32),
                                 np.zeros(6, np.float32))

    def test_requires_memory_data_layer(self):
        net = Net('layer { name: "in" type: "Input" top: "x" }\n'
                  'layer { name: "r" type: "ReLU" bottom: "x" '
                  'top: "y" }\n')
        with pytest.raises(ValueError, match="MemoryData"):
            net.set_input_arrays(np.zeros((2, 2)), np.zeros(2))


class TestLayersView:
    def test_layers_types_and_blob_shapes(self):
        """pycaffe's net.layers[i].type / .blobs (the _caffe.cpp Layer
        binding): caffe-ordered, caffe-SHAPED parameter blobs."""
        txt = """
        layer { name: "in" type: "Input" top: "x" }
        layer { name: "fc" type: "InnerProduct" bottom: "x" top: "fc"
          inner_product_param { num_output: 3
            weight_filler { type: "xavier" } } }
        layer { name: "relu" type: "ReLU" bottom: "fc" top: "fc" }
        """
        net = Net(txt, phase="test")
        net.forward(x=jnp.ones((2, 5)))
        layers = net.layers
        by_name = {lv.name: lv for lv in layers}
        assert by_name["fc"].type == "InnerProduct"
        # caffe InnerProduct blob 0 is (out, in); ours is (in, out)
        assert by_name["fc"].blobs[0].shape == (3, 5)
        assert by_name["fc"].blobs[1].shape == (3,)
        assert by_name["relu"].blobs == []


class TestTopBottomNames:
    def test_top_bottom_names(self):
        txt = """
        layer { name: "in" type: "Input" top: "x" }
        layer { name: "fc" type: "InnerProduct" bottom: "x" top: "fc"
          inner_product_param { num_output: 2
            weight_filler { type: "xavier" } } }
        """
        net = Net(txt, phase="test")
        assert net.top_names == {"in": ["x"], "fc": ["fc"]}
        assert net.bottom_names == {"in": [], "fc": ["x"]}


class TestBlobView:
    def test_data_idiom(self):
        """The pycaffe read idiom: net.blobs['x'].data (a numpy
        snapshot), plus array-like fallbacks."""
        txt = ('layer { name: "in" type: "Input" top: "x" }\n'
               'layer { name: "r" type: "ReLU" bottom: "x" top: "y" }\n')
        net = Net(txt, phase="test")
        net.forward(x=jnp.asarray([-1.0, 2.0]))
        b = net.blobs["y"]
        np.testing.assert_array_equal(b.data, [0.0, 2.0])
        assert b.shape == (2,) and b.ndim == 1
        np.testing.assert_array_equal(np.asarray(b), [0.0, 2.0])
        assert b[1] == 2.0
        with pytest.raises(AttributeError, match="backward"):
            _ = b.diff


class TestPartialForward:
    """pycaffe's net.forward(start=, end=) (pycaffe.py:78-105): run a
    layer RANGE against the previous forward's blobs."""

    TXT = """
    layer { name: "in" type: "Input" top: "x" }
    layer { name: "fc1" type: "InnerProduct" bottom: "x" top: "h"
      inner_product_param { num_output: 4
        weight_filler { type: "xavier" } } }
    layer { name: "relu" type: "ReLU" bottom: "h" top: "h" }
    layer { name: "fc2" type: "InnerProduct" bottom: "h" top: "y"
      inner_product_param { num_output: 2
        weight_filler { type: "xavier" } } }
    """

    def test_end_stops_early(self):
        net = Net(self.TXT, phase="test")
        x = jnp.ones((2, 3))
        net.forward(x=x)
        out = net.forward(end="fc1", x=x)
        assert set(out) == {"h"}
        # relu/fc2 did not run in the partial pass: y keeps its old value
        assert "y" in net.blobs

    def test_start_reuses_previous_blobs(self):
        net = Net(self.TXT, phase="test")
        x = jnp.ones((2, 3))
        full = net.forward(x=x)
        # rerun only fc2 from the existing h: same y
        out = net.forward(start="fc2")
        np.testing.assert_allclose(np.asarray(out["y"]),
                                   np.asarray(full["y"]), rtol=1e-6)
        # override h explicitly: y responds to the injected activation
        h2 = np.full((2, 4), 2.0, np.float32)
        out2 = net.forward(start="fc2", h=h2)
        expected = h2 @ np.asarray(net.params["fc2"]["w"]) \
            + np.asarray(net.params["fc2"]["b"])
        np.testing.assert_allclose(np.asarray(out2["y"]), expected,
                                   rtol=1e-5)

    def test_start_requires_prior_forward(self):
        net = Net(self.TXT, phase="test")
        with pytest.raises(RuntimeError, match="prior full forward"):
            net.forward(start="fc2")

    def test_unknown_layer_raises(self):
        net = Net(self.TXT, phase="test")
        net.forward(x=jnp.ones((2, 3)))
        with pytest.raises(KeyError, match="no layer named"):
            net.forward(end="nope")


class TestPartialBackward:
    """pycaffe's net.backward(start=, end=) (pycaffe.py:111-157):
    cotangents enter at `start` (the later layer) and stop after `end`
    (the earlier one)."""

    def test_range_matches_manual_grad(self):
        txt = TestPartialForward.TXT
        net = Net(txt, phase="test")
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 3)).astype(np.float32))
        net.forward(x=x)
        # backward only through fc2, w.r.t. its input h
        g = net.backward(start="fc2", end="fc2", y=np.ones((2, 2),
                                                           np.float32))
        # dL/dh with L = sum(y) is just fc2's weight rows summed
        expected = np.tile(
            np.asarray(net.params["fc2"]["w"]).sum(1), (2, 1))
        np.testing.assert_allclose(np.asarray(g["h"]), expected,
                                   rtol=1e-5)
        # and only fc2's params carry diffs through the range
        assert float(np.abs(np.asarray(
            net.param_diffs["fc2"]["w"])).sum()) > 0
        assert float(np.abs(np.asarray(
            net.param_diffs["fc1"]["w"])).sum()) == 0.0

    def test_full_backward_unchanged(self):
        txt = TestPartialForward.TXT
        net = Net(txt, phase="test")
        x = jnp.ones((2, 3))
        net.forward(x=x)
        g = net.backward(y=np.ones((2, 2), np.float32))
        assert "x" in g
        assert float(np.abs(np.asarray(
            net.param_diffs["fc1"]["w"])).sum()) > 0


class TestBlobDataWrite:
    """The standard pycaffe input-setting idiom must WORK (not silently
    no-op): ``net.blobs[in_].data[...] = x`` then ``net.forward()``
    (python/caffe/pycaffe.py:97-104 sets input blobs exactly this way)."""

    def test_input_write_feeds_next_forward(self):
        ins = _mlp_inputs()
        net = Net(MLP, phase="test", seed=1)
        net.forward(**ins)
        x2 = np.asarray(ins["x"]) * 2.0 + 0.5
        net.blobs["x"].data[...] = x2
        net.blobs["label"].data[...] = np.asarray(ins["label"])
        out = net.forward()  # no kwargs: the written buffers feed it
        ref = Net(MLP, phase="test", seed=1)
        expect = ref.forward(x=x2, label=ins["label"])
        np.testing.assert_allclose(float(out["loss"]),
                                   float(expect["loss"]), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(net.blobs["ip2"].data),
                                   np.asarray(ref.blobs["ip2"].data),
                                   rtol=1e-6)

    def test_clean_read_does_not_refeed(self):
        """Reading .data without writing must not override explicit
        inputs or change results (the buffer is clean)."""
        ins = _mlp_inputs()
        net = Net(MLP, phase="test", seed=1)
        out0 = float(net.forward(**ins)["loss"])
        _ = net.blobs["x"].data  # read only
        ins2 = {**ins, "x": np.asarray(ins["x"]) * 3.0}
        out1 = float(net.forward(**ins2)["loss"])
        ref = Net(MLP, phase="test", seed=1)
        ref.forward(**ins)
        out_ref = float(ref.forward(**ins2)["loss"])
        np.testing.assert_allclose(out1, out_ref, rtol=1e-6)
        assert out1 != out0

    def test_intermediate_write_seeds_partial_forward(self):
        """pycaffe mutates intermediate blobs then forward(start=) — the
        written value must seed the range."""
        txt = TestPartialForward.TXT
        net = Net(txt, phase="test")
        x = jnp.ones((2, 3))
        net.forward(x=x)
        h2 = np.asarray(net.blobs["h"].data) + 1.25
        net.blobs["h"].data[...] = h2
        out = net.forward(start="fc2", end="fc2")
        expected = h2 @ np.asarray(net.params["fc2"]["w"]) \
            + np.asarray(net.params["fc2"]["b"])
        np.testing.assert_allclose(np.asarray(out["y"]), expected,
                                   rtol=1e-5)

    def test_array_view_reflects_write(self):
        net = Net(MLP, phase="test", seed=1)
        net.forward(**_mlp_inputs())
        net.blobs["ip1"].data[...] = 7.0
        assert float(np.asarray(net.blobs["ip1"]).max()) == 7.0
        assert float(net.blobs["ip1"][0, 0]) == 7.0

    def test_held_buffer_survives_forwards(self):
        """The classic pycaffe loop holds ONE .data reference and writes
        it every iteration — the buffer must stay live across forwards
        (real pycaffe's .data is a persistent zero-copy view)."""
        net = Net(MLP, phase="test", seed=1)
        ins = _mlp_inputs()
        net.forward(**ins)
        buf = net.blobs["x"].data
        lbl = net.blobs["label"].data
        ref = Net(MLP, phase="test", seed=1)
        ref.forward(**ins)
        for it in range(3):
            x_it = np.asarray(ins["x"]) * (it + 2.0)
            buf[...] = x_it
            lbl[...] = np.asarray(ins["label"])
            out = net.forward()
            expect = ref.forward(x=x_it, label=ins["label"])
            np.testing.assert_allclose(float(out["loss"]),
                                       float(expect["loss"]), rtol=1e-6,
                                       err_msg=f"iteration {it}")
            assert net.blobs["x"].data is buf  # same object, still live
