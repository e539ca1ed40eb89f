"""`qa upgrade` + the prototxt emitter (utils/prototxt.py
emit_prototxt / upgrade_solver_prototxt vs
tools/upgrade_net_proto_text.cpp, tools/upgrade_solver_proto_text.cpp,
util/upgrade_proto.cpp:1002-1068)."""

import numpy as np
import pytest

from mms_answer_selection_tpu.utils.prototxt import (
    emit_prototxt, parse_prototxt, upgrade_net_prototxt,
    upgrade_solver_prototxt)

V1_NET = """
name: "legacy"
layers { name: "ip1" type: INNER_PRODUCT bottom: "data" top: "ip1"
  blobs_lr: 1 blobs_lr: 2
  inner_product_param { num_output: 8
    weight_filler { type: "xavier" } } }
layers { name: "relu1" type: RELU bottom: "ip1" top: "ip1" }
layers { name: "loss" type: SOFTMAX_LOSS bottom: "ip1" bottom: "label"
  top: "loss" }
"""

LEGACY_SOLVER = """
net: "net.prototxt"
base_lr: 0.01
lr_policy: "step"
stepsize: 10
gamma: 0.5
momentum: 0.9
max_iter: 100
solver_type: ADAGRAD
"""


class TestEmit:
    def test_parse_emit_parse_fixpoint(self):
        d = parse_prototxt(V1_NET)
        assert parse_prototxt(emit_prototxt(d)) == d

    def test_enum_vs_string_quoting(self):
        text = emit_prototxt(parse_prototxt(
            'layer { name: "d" type: "Input" include { phase: TRAIN } }\n'
            'layer { name: "p" type: "Pooling"\n'
            '  pooling_param { pool: MAX kernel_size: 2 } }'))
        assert 'type: "Input"' in text
        assert "phase: TRAIN" in text        # enum: bare
        assert "pool: MAX" in text
        assert '"MAX"' not in text

    def test_string_escaping(self):
        d = {"name": 'a"b\\c', "note": "line1\nline2"}
        assert parse_prototxt(emit_prototxt(d)) == d

    def test_floats_and_bools(self):
        d = {"base_lr": 0.001, "shuffle": True, "max_iter": 100,
             "momentum2": 0.999}
        rt = parse_prototxt(emit_prototxt(d))
        assert rt == d


class TestSolverUpgrade:
    def test_enum_to_string_type(self):
        d = upgrade_solver_prototxt(parse_prototxt(LEGACY_SOLVER))
        assert d["type"] == "AdaGrad"
        assert "solver_type" not in d

    def test_all_six_names(self):
        for enum, modern in [("SGD", "SGD"), ("NESTEROV", "Nesterov"),
                             ("ADAGRAD", "AdaGrad"), ("RMSPROP", "RMSProp"),
                             ("ADADELTA", "AdaDelta"), ("ADAM", "Adam")]:
            d = upgrade_solver_prototxt({"solver_type": enum})
            assert d["type"] == modern

    def test_numeric_enum_values(self):
        # text-format ints for enum fields (proto2 accepts them)
        assert upgrade_solver_prototxt({"solver_type": 4})["type"] == \
            "AdaDelta"

    def test_modern_passthrough(self):
        d = {"type": "Adam", "base_lr": 0.001}
        assert upgrade_solver_prototxt(d) == d

    def test_both_fields_is_error(self):
        # the reference CHECK-fails on both fields present
        # (upgrade_proto.cpp:1003-1005)
        with pytest.raises(ValueError, match="both"):
            upgrade_solver_prototxt({"solver_type": "SGD", "type": "SGD"})

    def test_unknown_type_raises(self):
        with pytest.raises(ValueError, match="unknown"):
            upgrade_solver_prototxt({"solver_type": "QUANTUM"})


class TestUpgradeCLI:
    def test_net_upgrade_runs_after(self, tmp_path, capsys):
        """Upgraded V1 text is modern: parses with `layer:` + string
        types, and still builds/runs in GraphNet."""
        import jax
        import jax.numpy as jnp

        from mms_answer_selection_tpu.cli import main
        from mms_answer_selection_tpu.models.graph_net import GraphNet

        (tmp_path / "v1.prototxt").write_text(V1_NET)
        main(["upgrade", str(tmp_path / "v1.prototxt"),
              str(tmp_path / "modern.prototxt")])
        text = (tmp_path / "modern.prototxt").read_text()
        d = parse_prototxt(text)
        assert "layers" not in d and "layer" in d
        types = [la["type"] for la in d["layer"]]
        assert types == ["InnerProduct", "ReLU", "SoftmaxWithLoss"]
        # blobs_lr hoisted into param specs
        assert [p["lr_mult"] for p in d["layer"][0]["param"]] == [1, 2]

        net = GraphNet(text)
        rng = np.random.default_rng(0)
        ins = {"data": jnp.asarray(
                   rng.normal(size=(4, 6)).astype(np.float32)),
               "label": jnp.asarray(rng.integers(0, 3, (4,)))}
        params, state = net.init(jax.random.PRNGKey(0), ins)
        total, _ = net.loss(params, state, ins)
        assert np.isfinite(float(total))

    def test_solver_upgrade_stdout(self, tmp_path, capsys):
        from mms_answer_selection_tpu.cli import main

        (tmp_path / "s.prototxt").write_text(LEGACY_SOLVER)
        main(["upgrade", str(tmp_path / "s.prototxt")])
        out = capsys.readouterr().out
        assert 'type: "AdaGrad"' in out
        assert "solver_type" not in out
        # kind auto-detected as solver (no layer/layers/input fields)
        d = parse_prototxt(out)
        assert d["lr_policy"] == "step" and d["stepsize"] == 10

    def test_upgraded_solver_drives_training(self, tmp_path, capsys):
        """End-to-end: legacy solver -> qa upgrade -> GraphSolver."""
        from mms_answer_selection_tpu.cli import main
        from mms_answer_selection_tpu.training.graph_solver import \
            GraphSolver
        from tests.test_graph_solver import _setup

        _setup(tmp_path)  # writes net.prototxt + data
        legacy = ("net: \"net.prototxt\"\nbase_lr: 0.05\n"
                  "lr_policy: \"fixed\"\nmomentum: 0.9\nmax_iter: 20\n"
                  "test_interval: 0\nsolver_type: NESTEROV\n"
                  "random_seed: 3\nsnapshot_prefix: \"up\"\n")
        (tmp_path / "legacy_solver.prototxt").write_text(legacy)
        main(["upgrade", str(tmp_path / "legacy_solver.prototxt"),
              str(tmp_path / "modern_solver.prototxt")])
        gs = GraphSolver(str(tmp_path / "modern_solver.prototxt"))
        assert gs.cfg.solver_type == "nesterov"
        smoothed = gs.step(10)
        assert gs.iter_ == 10 and np.isfinite(smoothed)


class TestExtractFeatures:
    def test_extract_features_blobs(self, tmp_path, capsys):
        """`qa extract_features` ≙ tools/extract_features.cpp: trained
        weights + TEST-phase data layer -> per-blob feature dumps."""
        from mms_answer_selection_tpu.cli import main
        from tests.test_graph_solver import _setup

        sp = _setup(tmp_path)
        main(["solve", "--solver", str(sp)])
        capsys.readouterr()
        main(["extract_features",
              "--model", str(tmp_path / "net.prototxt"),
              "--weights", str(tmp_path / "snap_iter_60.caffemodel.h5"),
              "--blobs", "fc1,fc2", "--iterations", "3",
              "--out", str(tmp_path / "feats")])
        fc1 = np.load(tmp_path / "feats" / "fc1.npy")
        fc2 = np.load(tmp_path / "feats" / "fc2.npy")
        # TEST-phase HDF5Data batch_size is 50 -> 3 batches of 50
        assert fc1.shape == (150, 16)
        assert fc2.shape == (150, 3)
        # trained features separate the classes: argmax accuracy high
        import h5py

        with h5py.File(tmp_path / "test.h5") as f:
            labels = np.asarray(f["label"])[:100]
        preds = fc2[:100].argmax(1)
        assert (preds == labels).mean() > 0.85

    def test_unknown_blob_name_exits(self, tmp_path):
        from mms_answer_selection_tpu.cli import main
        from tests.test_graph_solver import _setup

        _setup(tmp_path)
        with pytest.raises(SystemExit, match="Unknown feature blob"):
            main(["extract_features",
                  "--model", str(tmp_path / "net.prototxt"),
                  "--blobs", "nope", "--iterations", "1",
                  "--out", str(tmp_path / "feats")])
