"""The drop-in `caffe` namespace (caffe_compat.py vs
python/caffe/__init__.py): ported pycaffe scripts find every name they
import, with the reference constructor shapes."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

import jax.numpy as jnp  # noqa: E402

from mms_answer_selection_tpu import caffe_compat as caffe
from tests.test_graph_solver import _setup
from tests.test_io import DEPLOY


class TestNamespace:
    def test_reference_exports_present(self):
        # python/caffe/__init__.py's export list, name for name
        for name in ("Net", "Classifier", "Detector", "SGDSolver",
                     "NesterovSolver", "AdaGradSolver", "RMSPropSolver",
                     "AdaDeltaSolver", "AdamSolver", "get_solver",
                     "NetSpec", "layers", "params", "to_proto", "io",
                     "TRAIN", "TEST", "set_mode_cpu", "set_mode_gpu",
                     "set_device", "set_random_seed"):
            assert hasattr(caffe, name), name

    def test_mode_setters_are_noops(self):
        caffe.set_mode_cpu()
        caffe.set_mode_gpu()
        caffe.set_device(0)
        caffe.set_random_seed(1234)

    def test_io_namespace(self):
        arr = np.ones((2, 2), np.float32)
        blob = caffe.io.array_to_blobproto(arr)
        np.testing.assert_array_equal(caffe.io.blobproto_to_array(blob),
                                      arr)


class TestNetConstructorShapes:
    def test_model_phase(self, tmp_path):
        (tmp_path / "deploy.prototxt").write_text(DEPLOY)
        net = caffe.Net(str(tmp_path / "deploy.prototxt"), caffe.TEST)
        out = net.forward(data=jnp.zeros((2, 8, 8, 3)))
        assert out["prob"].shape == (2, 4)

    def test_model_weights_phase(self, tmp_path):
        (tmp_path / "deploy.prototxt").write_text(DEPLOY)
        a = caffe.Net(str(tmp_path / "deploy.prototxt"), caffe.TEST)
        a.forward(data=jnp.zeros((1, 8, 8, 3)))
        a.save(str(tmp_path / "w.caffemodel.h5"))
        # old positional shape: Net(model, weights, phase)
        b = caffe.Net(str(tmp_path / "deploy.prototxt"),
                      str(tmp_path / "w.caffemodel.h5"), caffe.TEST)
        b.forward(data=jnp.zeros((1, 8, 8, 3)))
        np.testing.assert_array_equal(
            np.asarray(a.params["fc"]["w"]),
            np.asarray(b.params["fc"]["w"]))

    def test_keyword_weights(self, tmp_path):
        (tmp_path / "deploy.prototxt").write_text(DEPLOY)
        a = caffe.Net(str(tmp_path / "deploy.prototxt"), caffe.TEST)
        a.forward(data=jnp.zeros((1, 8, 8, 3)))
        a.save(str(tmp_path / "w.caffemodel.h5"))
        b = caffe.Net(str(tmp_path / "deploy.prototxt"), caffe.TEST,
                      weights=str(tmp_path / "w.caffemodel.h5"))
        b.forward(data=jnp.zeros((1, 8, 8, 3)))
        np.testing.assert_array_equal(
            np.asarray(a.params["fc"]["w"]),
            np.asarray(b.params["fc"]["w"]))

    def test_bad_args_raise(self, tmp_path):
        (tmp_path / "deploy.prototxt").write_text(DEPLOY)
        with pytest.raises(TypeError):
            caffe.Net(str(tmp_path / "deploy.prototxt"), "w.h5",
                      "also.h5", caffe.TEST)


class TestPortedScriptFlow:
    def test_solver_script(self, tmp_path):
        """The canonical pycaffe training script, ported verbatim."""
        solver = caffe.get_solver(str(_setup(tmp_path)))
        solver.step(30)
        assert solver.iter == 30
        acc = solver.test_nets[0].forward()
        assert float(acc["acc"]) > 0.5

    def test_netspec_script(self):
        """The canonical net_spec usage builds prototxt that Net runs."""
        ns = caffe.NetSpec()
        ns.data = caffe.layers.Input()
        ns.fc = caffe.layers.InnerProduct(
            ns.data, num_output=3,
            weight_filler={"type": "xavier"})
        ns.prob = caffe.layers.Softmax(ns.fc)
        text = str(ns.to_proto())  # the pycaffe write-to-file idiom
        net = caffe.Net(text, caffe.TEST)
        out = net.forward(data=jnp.ones((2, 5)))
        assert out["prob"].shape == (2, 3)
        np.testing.assert_allclose(np.asarray(out["prob"]).sum(1), 1.0,
                                   rtol=1e-5)


class TestPortedExample:
    def test_pycaffe_port_example(self, tmp_path, monkeypatch, capsys):
        """examples/pycaffe_port.py: the canonical pycaffe tutorial flow
        end-to-end (net_spec -> solver -> step/blobs -> snapshot ->
        restore -> deploy Net)."""
        import importlib
        import os
        import sys

        examples = os.path.join(os.path.dirname(__file__), "..",
                                "examples")
        monkeypatch.syspath_prepend(examples)
        monkeypatch.setattr(sys, "argv", ["pycaffe_port",
                                          str(tmp_path)])
        mod = importlib.import_module("pycaffe_port")
        mod.main()
        out = capsys.readouterr().out
        assert "OK" in out
        assert "iter 500" in out


class TestLayerTypeList:
    def test_layer_type_list(self):
        """caffe.layer_type_list (python/caffe/test/test_layer_type_list
        checks 'Data' is present; _caffe.cpp binds
        LayerRegistry::LayerTypeList)."""
        types = caffe.layer_type_list()
        for t in ("Data", "Convolution", "InnerProduct", "ReLU",
                  "SoftmaxWithLoss", "SimCross", "Python"):
            assert t in types
        assert types == sorted(types)
