"""GraphSolver: the generic `caffe train --solver=...` loop over
arbitrary prototxt nets (training/graph_solver.py vs solver.cpp:193-495
and tools/caffe.cpp:157-252)."""

import json
import os

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

import jax  # noqa: E402

from mms_answer_selection_tpu.training.graph_solver import GraphSolver


def _write_h5(path, data, label):
    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=data)
        f.create_dataset("label", data=label.astype(np.float64))


def _make_data(tmp_path, n_train=256, n_test=100, seed=0):
    """A linearly separable 3-class problem: argmax of a fixed linear
    map of the inputs."""
    rng = np.random.default_rng(seed)
    W = rng.normal(size=(6, 3))
    xs = rng.normal(size=(n_train + n_test, 6)).astype(np.float32)
    ys = np.argmax(xs @ W, axis=1)
    _write_h5(tmp_path / "train.h5", xs[:n_train], ys[:n_train])
    _write_h5(tmp_path / "test.h5", xs[n_train:], ys[n_train:])
    (tmp_path / "train.txt").write_text(str(tmp_path / "train.h5") + "\n")
    (tmp_path / "test.txt").write_text(str(tmp_path / "test.h5") + "\n")


NET = """
name: "tiny"
layer {{ name: "data" type: "HDF5Data" top: "data" top: "label"
  hdf5_data_param {{ source: "{train}" batch_size: 32 shuffle: true }}
  include {{ phase: TRAIN }} }}
layer {{ name: "data" type: "HDF5Data" top: "data" top: "label"
  hdf5_data_param {{ source: "{test}" batch_size: 50 }}
  include {{ phase: TEST }} }}
layer {{ name: "fc1" type: "InnerProduct" bottom: "data" top: "fc1"
  inner_product_param {{ num_output: 16
                         weight_filler {{ type: "xavier" }} }} }}
layer {{ name: "relu1" type: "ReLU" bottom: "fc1" top: "fc1" }}
layer {{ name: "fc2" type: "InnerProduct" bottom: "fc1" top: "fc2"
  inner_product_param {{ num_output: 3
                         weight_filler {{ type: "xavier" }} }} }}
layer {{ name: "loss" type: "SoftmaxWithLoss" bottom: "fc2"
  bottom: "label" top: "loss" }}
layer {{ name: "acc" type: "Accuracy" bottom: "fc2" bottom: "label"
  top: "acc" include {{ phase: TEST }} }}
"""

SOLVER = """
net: "net.prototxt"
test_iter: 2
test_interval: 20
base_lr: 0.1
lr_policy: "fixed"
display: 10
average_loss: 5
max_iter: 60
momentum: 0.9
type: "SGD"
random_seed: 7
snapshot_prefix: "snap"
snapshot_format: HDF5
"""


def _setup(tmp_path, solver_text=SOLVER, **data_kw):
    _make_data(tmp_path, **data_kw)
    (tmp_path / "net.prototxt").write_text(NET.format(
        train=tmp_path / "train.txt", test=tmp_path / "test.txt"))
    sp = tmp_path / "solver.prototxt"
    sp.write_text(solver_text)
    return sp


class TestSolve:
    def test_solve_learns_and_tests(self, tmp_path):
        gs = GraphSolver(str(_setup(tmp_path)))
        gs.solve()
        assert gs.iter_ == 60
        train_recs = [r for r in gs.history if r["phase"] == "Train"]
        test_recs = [r for r in gs.history if r["phase"] == "Test#0"]
        # test_initialization default true: a test pass at iter 0
        assert test_recs[0]["iter"] == 0
        # iters 0,20,40 inside step + the final at 60 (solver.cpp:320)
        assert [r["iter"] for r in test_recs] == [0, 20, 40, 60]
        assert train_recs[-1]["loss"] < train_recs[0]["loss"] * 0.7
        # separable problem: the final accuracy pass is near-perfect
        assert test_recs[-1]["acc"] > 0.85
        # Accuracy is not a loss output; SoftmaxWithLoss is
        assert "loss" in test_recs[-1]
        # snapshot_after_train (proto default true) wrote the HDF5 pair
        assert (tmp_path / "snap_iter_60.caffemodel.h5").exists()
        assert (tmp_path / "snap_iter_60.solverstate.h5").exists()

    def test_test_initialization_false(self, tmp_path):
        sp = _setup(tmp_path, SOLVER + "test_initialization: false\n"
                    + "snapshot_after_train: false\n")
        gs = GraphSolver(str(sp))
        gs.step(5)
        assert not [r for r in gs.history if r["phase"].startswith("Test")]
        assert not list(tmp_path.glob("snap_iter_*"))

    def test_smoothed_loss_window(self, tmp_path):
        gs = GraphSolver(str(_setup(tmp_path)))
        gs.step(12)
        # average_loss 5: after 12 iters the smoothed loss is the mean
        # of the last 5 raw losses (solver.cpp:482-495) -- reconstruct
        # from the recorded window
        assert len(gs._losses) == 5
        assert gs._smoothed == pytest.approx(np.mean(gs._losses))


class TestResume:
    def test_snapshot_resume_bit_exact(self, tmp_path):
        sp = _setup(tmp_path, SOLVER.replace('snapshot_prefix: "snap"',
                                             'snapshot: 30\n'
                                             'snapshot_prefix: "snap"'))
        a = GraphSolver(str(sp))
        a.step(60)
        st = tmp_path / "snap_iter_30.solverstate.h5"
        assert st.exists()

        b = GraphSolver(str(sp))
        assert b.restore(str(st)) == 30
        b.step(30)
        assert b.iter_ == a.iter_ == 60
        # fast-forwarded feeds + iter-keyed rng: bit-identical trajectory
        jax.tree.map(np.testing.assert_array_equal, a.params, b.params)
        jax.tree.map(np.testing.assert_array_equal, a.opt_state,
                     b.opt_state)

    def test_copy_weights(self, tmp_path):
        gs = GraphSolver(str(_setup(tmp_path)))
        gs.solve()
        model = tmp_path / "snap_iter_60.caffemodel.h5"
        (tmp_path / "b").mkdir()
        fresh = GraphSolver(str(_setup(tmp_path / "b")))
        report = fresh.copy_weights(str(model))
        assert all(v == "loaded" for v in report.values()), report
        jax.tree.map(np.testing.assert_array_equal, gs.params,
                     fresh.params)

    def test_binaryproto_snapshot_roundtrip(self, tmp_path):
        sp = _setup(tmp_path,
                    SOLVER.replace("snapshot_format: HDF5", ""))
        a = GraphSolver(str(sp))
        a.step(10)
        model, st = a.snapshot()
        assert model.endswith(".caffemodel") and st.endswith(".solverstate")
        b = GraphSolver(str(sp))
        b.restore(st)
        jax.tree.map(np.testing.assert_array_equal, a.params, b.params)
        jax.tree.map(np.testing.assert_allclose, a.opt_state, b.opt_state)


class TestGenerality:
    def test_dummy_data_net_no_feeds(self, tmp_path):
        """A net whose data is generated in-graph trains with no feeds:
        fit a Parameter blob to a constant target (pure prototxt, no
        host data at all)."""
        (tmp_path / "net.prototxt").write_text("""
name: "dummy"
layer { name: "d" type: "DummyData" top: "x"
  dummy_data_param { shape { dim: 4 dim: 3 }
                     data_filler { type: "constant" value: 2.0 } } }
layer { name: "w" type: "Parameter" top: "w"
  parameter_param { shape { dim: 4 dim: 3 } } }
layer { name: "loss" type: "EuclideanLoss" bottom: "w" bottom: "x"
  top: "loss" }
""")
        (tmp_path / "solver.prototxt").write_text("""
net: "net.prototxt"
base_lr: 0.5
lr_policy: "fixed"
max_iter: 50
type: "SGD"
snapshot_after_train: false
""")
        gs = GraphSolver(str(tmp_path / "solver.prototxt"))
        gs.solve()
        np.testing.assert_allclose(np.asarray(gs.params["w"]["w"]),
                                   np.full((4, 3), 2.0), atol=1e-2)

    def test_iter_size_accumulation(self, tmp_path):
        sp = _setup(tmp_path, SOLVER + "iter_size: 2\n")
        gs = GraphSolver(str(sp))
        gs.step(20)
        recs = [r for r in gs.history if r["phase"] == "Train"]
        assert recs[-1]["loss"] < recs[0]["loss"]

    def test_memory_feed_layer(self, tmp_path):
        """A MemoryData-style source arrives via feeds= (the decoupled
        pipeline stance: the prototxt declares the top names, the caller
        owns the arrays)."""
        (tmp_path / "net.prototxt").write_text("""
layer { name: "src" type: "MemoryData" top: "x" top: "y" }
layer { name: "fc" type: "InnerProduct" bottom: "x" top: "out"
  inner_product_param { num_output: 1
                        weight_filler { type: "xavier" } } }
layer { name: "loss" type: "EuclideanLoss" bottom: "out" bottom: "y"
  top: "loss" }
""")
        (tmp_path / "solver.prototxt").write_text("""
net: "net.prototxt"
base_lr: 0.05
lr_policy: "fixed"
max_iter: 80
type: "SGD"
momentum: 0.9
snapshot_after_train: false
""")
        rng = np.random.default_rng(3)
        x = rng.normal(size=(128, 5)).astype(np.float32)
        y = (x @ rng.normal(size=(5, 1))).astype(np.float32)
        gs = GraphSolver(str(tmp_path / "solver.prototxt"),
                         feeds={"src": {"x": x, "y": y, "batch_size": 32}})
        loss = gs.solve()
        assert loss < 0.1

    def test_missing_feed_raises(self, tmp_path):
        (tmp_path / "net.prototxt").write_text(
            'layer { name: "src" type: "MemoryData" top: "x" }\n')
        (tmp_path / "solver.prototxt").write_text(
            'net: "net.prototxt"\nmax_iter: 1\nbase_lr: 1.0\n')
        with pytest.raises(ValueError, match="feeds="):
            GraphSolver(str(tmp_path / "solver.prototxt"))


class TestImageFeeds:
    def test_image_data_net(self, tmp_path):
        """The stock ImageData layer path: list file of `path label`
        rows feeds a conv net through the generic loop
        (image_data_layer.cpp:37-52 semantics, host-side feed)."""
        from mms_answer_selection_tpu.data.pair_image import (
            synthetic_image_corpus)

        listf = synthetic_image_corpus(str(tmp_path / "imgs"), n_images=60,
                                       hw=8, n_classes=3)
        (tmp_path / "net.prototxt").write_text(f"""
layer {{ name: "data" type: "ImageData" top: "data" top: "label"
  image_data_param {{ source: "{listf}" batch_size: 20 shuffle: true }}
  transform_param {{ scale: 0.5 }} }}
layer {{ name: "conv" type: "Convolution" bottom: "data" top: "conv"
  convolution_param {{ num_output: 8 kernel_size: 3
                       weight_filler {{ type: "xavier" }} }} }}
layer {{ name: "relu" type: "ReLU" bottom: "conv" top: "conv" }}
layer {{ name: "fc" type: "InnerProduct" bottom: "conv" top: "fc"
  inner_product_param {{ num_output: 3
                         weight_filler {{ type: "xavier" }} }} }}
layer {{ name: "loss" type: "SoftmaxWithLoss" bottom: "fc"
  bottom: "label" top: "loss" }}
""")
        (tmp_path / "solver.prototxt").write_text("""
net: "net.prototxt"
base_lr: 0.001
lr_policy: "fixed"
max_iter: 40
type: "Adam"
momentum: 0.9
display: 10
snapshot_after_train: false
""")
        gs = GraphSolver(str(tmp_path / "solver.prototxt"))
        gs.solve()
        recs = [r for r in gs.history if r["phase"] == "Train"]
        assert recs[-1]["loss"] < recs[0]["loss"] * 0.8

    def test_pair_image_family_via_generic_path(self, tmp_path):
        """The fork's PairImageData family trains end-to-end through the
        GENERIC solver from its reference prototxt (the same file the
        typed models/pair_image.py consumes): PairImageData stacks the
        pair on channels, Slice splits, weight-tied towers, PairRankLoss
        (pair_image_data_layer.cpp + pair_rank_loss_layer.cpp)."""
        from mms_answer_selection_tpu.data.pair_image import (
            synthetic_pair_corpus)
        from mms_answer_selection_tpu.models.pair_image import (
            PairImageConfig)
        from mms_answer_selection_tpu.utils.prototxt import (
            pair_image_net_prototxt)

        listf = synthetic_pair_corpus(str(tmp_path / "pairs"), n_pairs=48,
                                      hw=16)
        cfg = PairImageConfig()
        (tmp_path / "net.prototxt").write_text(
            pair_image_net_prototxt(cfg, source=listf, batch_size=16))
        (tmp_path / "solver.prototxt").write_text("""
net: "net.prototxt"
base_lr: 1.0
lr_policy: "fixed"
delta: 5e-7
momentum: 0.95
max_iter: 100
type: "AdaDelta"
display: 5
random_seed: 3
snapshot_after_train: false
""")
        gs = GraphSolver(str(tmp_path / "solver.prototxt"))
        gs.solve()
        recs = [r for r in gs.history if r["phase"] == "Train"]
        # same robustness as the typed family test: windowed means
        assert (np.mean([r["loss"] for r in recs[-3:]])
                < np.mean([r["loss"] for r in recs[:3]]))
        # the ranking head separates the planted signal
        assert recs[-1]["rank_acc"] > 0.55


class TestMesh:
    def test_dp_mesh_equivalence(self, tmp_path):
        """Generic nets train data-parallel over a mesh: the 8-device dp
        run matches single-device to float tolerance (the P2PSync
        1-vs-N contract, test_gradient_based_solver.cpp:459-488
        pattern, on an arbitrary prototxt net)."""
        from mms_answer_selection_tpu.parallel.mesh import make_mesh

        sp = _setup(tmp_path)
        a = GraphSolver(str(sp))
        a.step(15)
        b = GraphSolver(str(sp), mesh=make_mesh(tp=1))
        b.step(15)
        jax.tree.map(
            lambda x, y: np.testing.assert_allclose(
                np.asarray(x), np.asarray(y), rtol=2e-4, atol=2e-5),
            a.params, b.params)
        # test passes agree too (shared-layer merge under the mesh)
        ta = [r for r in a.history if r["phase"] == "Test#0"][-1]
        tb = [r for r in b.history if r["phase"] == "Test#0"][-1]
        assert ta["acc"] == pytest.approx(tb["acc"], abs=1e-6)

    def test_iter_size_on_mesh(self, tmp_path):
        from mms_answer_selection_tpu.parallel.mesh import make_mesh

        sp = _setup(tmp_path, SOLVER + "iter_size: 2\n"
                    + "test_interval: 0\ndisplay: 2\n")
        gs = GraphSolver(str(sp), mesh=make_mesh(tp=1))
        gs.step(20)
        recs = [r for r in gs.history if r["phase"] == "Train"]
        assert recs[-1]["loss"] < recs[0]["loss"]


class TestCLI:
    def test_qa_solve(self, tmp_path, capsys):
        from mms_answer_selection_tpu.cli import main

        sp = _setup(tmp_path)
        main(["solve", "--solver", str(sp)])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["iter"] == 60
        assert out["last_test"]["acc"] > 0.85
        assert (tmp_path / "snap_iter_60.caffemodel.h5").exists()

    def test_qa_nettest(self, tmp_path, capsys):
        """`qa nettest` ≙ `caffe test` (tools/caffe.cpp:246-296):
        TEST-phase scoring of a net prototxt with trained weights."""
        from mms_answer_selection_tpu.cli import main

        sp = _setup(tmp_path)
        main(["solve", "--solver", str(sp)])
        capsys.readouterr()
        main(["nettest", "--model", str(tmp_path / "net.prototxt"),
              "--weights", str(tmp_path / "snap_iter_60.caffemodel.h5"),
              "--iterations", "2"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["acc"] > 0.85
        # loss output carries weight 1; the mean weighted loss is small
        assert out["loss"] < 0.5

    def test_qa_solve_resume(self, tmp_path, capsys):
        from mms_answer_selection_tpu.cli import main

        sp = _setup(tmp_path, SOLVER.replace('snapshot_prefix: "snap"',
                                             'snapshot: 30\n'
                                             'snapshot_prefix: "snap"'))
        main(["solve", "--solver", str(sp)])
        capsys.readouterr()
        main(["solve", "--solver", str(sp), "--snapshot",
              str(tmp_path / "snap_iter_30.solverstate.h5")])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["iter"] == 60


class TestSignalActions:
    """SolverAction polling (solver.cpp:259-272 + caffe.cpp:44-49):
    SNAPSHOT checkpoints and continues, STOP breaks the loop and
    snapshot_after_train covers the final checkpoint."""

    def test_snapshot_action_continues(self, tmp_path):
        from mms_answer_selection_tpu.training.signals import Action

        sp = _setup(tmp_path, SOLVER + "test_interval: 0\ndisplay: 0\n")
        gs = GraphSolver(str(sp))
        fired = []

        def action():
            if gs.iter_ == 5 and not fired:
                fired.append(1)
                return Action.SNAPSHOT
            return Action.NONE

        gs.step(10, action_fn=action)
        assert gs.iter_ == 10  # ran to completion
        assert (tmp_path / "snap_iter_5.solverstate.h5").exists()

    def test_stop_action_breaks_and_solve_snapshots(self, tmp_path):
        from mms_answer_selection_tpu.training.signals import Action

        sp = _setup(tmp_path, SOLVER + "test_interval: 0\ndisplay: 0\n")
        gs = GraphSolver(str(sp))

        def action():
            return Action.STOP if gs.iter_ >= 7 else Action.NONE

        gs.solve(action_fn=action)
        assert gs.iter_ == 7  # stopped early, max_iter 60 never reached
        # snapshot_after_train covered the early exit (solver.cpp:304)
        assert (tmp_path / "snap_iter_7.solverstate.h5").exists()
        # early exit skips the final test pass
        assert not [r for r in gs.history if r["phase"].startswith("Test")]

    def test_resume_after_stop(self, tmp_path):
        from mms_answer_selection_tpu.training.signals import Action

        sp = _setup(tmp_path, SOLVER + "test_interval: 0\ndisplay: 0\n")
        gs = GraphSolver(str(sp))
        gs.solve(action_fn=lambda: (Action.STOP if gs.iter_ >= 7
                                    else Action.NONE))
        gs2 = GraphSolver(str(sp))
        gs2.restore(str(tmp_path / "snap_iter_7.solverstate.h5"))
        assert gs2.iter_ == 7
        gs2.solve()
        assert gs2.iter_ == 60


class TestConvNet:
    def test_lenet_shaped_net_learns(self, tmp_path):
        """The generic path on a real vision stack (the examples/mnist
        LeNet shape: conv-pool-conv-pool-fc-relu-fc-loss), HDF5-fed.
        Labels depend on spatial structure so conv must actually work."""
        rng = np.random.default_rng(0)
        n = 256
        # NHWC, this framework's data layout (docs/ARCHITECTURE.md)
        xs = rng.normal(size=(n, 12, 12, 1)).astype(np.float32)
        # class = which half (top/bottom) holds the brighter blob
        bright = rng.integers(0, 2, n)
        for i in range(n):
            r = 2 if bright[i] == 0 else 8
            xs[i, r:r + 2, 4:8, 0] += 3.0
        _write_h5(tmp_path / "train.h5", xs, bright)
        (tmp_path / "train.txt").write_text(
            str(tmp_path / "train.h5") + "\n")
        net = f"""
        layer {{ name: "d" type: "HDF5Data" top: "data" top: "label"
          hdf5_data_param {{ source: "{tmp_path / 'train.txt'}"
            batch_size: 32 shuffle: true }} }}
        layer {{ name: "conv1" type: "Convolution" bottom: "data"
          top: "conv1" convolution_param {{ num_output: 8 kernel_size: 3
            weight_filler {{ type: "xavier" }} }} }}
        layer {{ name: "pool1" type: "Pooling" bottom: "conv1"
          top: "pool1" pooling_param {{ pool: MAX kernel_size: 2
            stride: 2 }} }}
        layer {{ name: "conv2" type: "Convolution" bottom: "pool1"
          top: "conv2" convolution_param {{ num_output: 8 kernel_size: 3
            weight_filler {{ type: "xavier" }} }} }}
        layer {{ name: "relu1" type: "ReLU" bottom: "conv2"
          top: "conv2" }}
        layer {{ name: "fc1" type: "InnerProduct" bottom: "conv2"
          top: "fc1" inner_product_param {{ num_output: 2
            weight_filler {{ type: "xavier" }} }} }}
        layer {{ name: "loss" type: "SoftmaxWithLoss" bottom: "fc1"
          bottom: "label" top: "loss" }}
        layer {{ name: "acc" type: "Accuracy" bottom: "fc1"
          bottom: "label" top: "acc" }}
        """
        (tmp_path / "net.prototxt").write_text(net)
        (tmp_path / "solver.prototxt").write_text(
            'net: "net.prototxt"\nbase_lr: 0.01\nlr_policy: "fixed"\n'
            'momentum: 0.9\nmax_iter: 80\ntest_interval: 0\n'
            'display: 20\nsnapshot_prefix: "s"\nrandom_seed: 5\n'
            'type: "SGD"\n')
        gs = GraphSolver(str(tmp_path / "solver.prototxt"))
        gs.step(80)
        accs = [r["acc"] for r in gs.history
                if r["phase"] == "Train" and "acc" in r]
        assert accs[-1] > 0.9, accs


class TestTypedModelTrainingParity:
    def test_generic_path_matches_typed_sgd_loop(self, tmp_path):
        """Capstone pin: GraphSolver training the GENERATED V4 prototxt
        takes the same SGD+momentum trajectory as a hand-rolled loop
        over the typed model (same batches, same solver recurrence) —
        the generic `caffe train` path IS the flagship path.

        SGD rather than AdaDelta: at the zero-init sim-metric point
        AdaDelta's self-normalization turns jit-vs-eager ULP noise in
        near-zero gradient elements into +-constant sign-flipped updates
        (the recipe_scale_v4 reproducibility note), so only an update
        rule whose step is PROPORTIONAL to the gradient pins trajectory
        equality at float tolerance."""
        import dataclasses

        import jax
        import jax.numpy as jnp

        from mms_answer_selection_tpu.models import mms_qa as M
        from mms_answer_selection_tpu.training.optim import (SolverConfig,
                                                             make_solver)
        from mms_answer_selection_tpu.utils.prototxt import \
            net_prototxt_from_config

        cfg = dataclasses.replace(M.V4, vocab_size=120, sim_dropout=0.0,
                                  fc1_dropout=0.0)
        rng = np.random.default_rng(11)
        n = 6
        batch = {
            "question": np.asarray(rng.integers(0, 120, (n, 40)),
                                   np.int32),
            "answer": np.asarray(rng.integers(0, 120, (n, 40)), np.int32),
            "label": np.asarray(rng.integers(0, 2, (n,)), np.int32),
            "overlap_feat": rng.normal(size=(n, 2)).astype(np.float32),
        }
        (tmp_path / "net.prototxt").write_text(
            net_prototxt_from_config(cfg))
        (tmp_path / "solver.prototxt").write_text(
            'net: "net.prototxt"\nbase_lr: 0.1\nlr_policy: "fixed"\n'
            'momentum: 0.9\nweight_decay: 0.0005\ntype: "SGD"\n'
            'max_iter: 5\ntest_interval: 0\nrandom_seed: 7\n'
            'snapshot_prefix: "s"\n')
        gs = GraphSolver(str(tmp_path / "solver.prototxt"),
                         feeds={"data": {**batch, "batch_size": n,
                                         "shuffle": False}})
        # TRUE copies: GraphSolver's jitted step donates its buffers
        copy = lambda t: jax.tree.map(  # noqa: E731
            lambda x: jnp.array(np.asarray(x)), t)
        name_map = {"embed": "w2v_q", "sim": "sim_cross",
                    "conv0": "conv0", "bn0": "bn0", "conv1": "conv1",
                    "bn1": "bn1", "fc1": "fc1", "fc2": "fc2"}
        params = {k: copy(gs.params[v]) for k, v in name_map.items()}
        state = {"bn0": copy(gs.state["bn0"]),
                 "bn1": copy(gs.state["bn1"])}
        gs.step(5)

        solver = make_solver(
            SolverConfig(solver_type="sgd", base_lr=0.1, momentum=0.9,
                         weight_decay=5e-4),
            M.param_spec(params, cfg))
        opt = solver.init(params)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}

        def loss_fn(p, s):
            out, new_s = M.mms_qa_apply(p, s, jb, cfg, train=True,
                                        rng=jax.random.PRNGKey(0))
            return out["loss"], new_s

        # ONE jitted fused step, like GraphSolver's _build_step — the
        # same XLA compilation regime keeps reduction orderings close
        # (eager-vs-jit drift compounds visibly over steps otherwise)
        @jax.jit
        def typed_step(p, s, o, it):
            (loss, new_s), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p, s)
            p2, o2 = solver.apply(p, grads, o, it)
            return p2, new_s, o2, loss

        for it in range(5):
            params, state, opt, loss = typed_step(params, state, opt, it)

        for typed_key, gs_key in name_map.items():
            for blob, arr in params[typed_key].items():
                np.testing.assert_allclose(
                    np.asarray(gs.params[gs_key][blob]), np.asarray(arr),
                    rtol=1e-4, atol=1e-6,
                    err_msg=f"{gs_key}/{blob} diverged")
        # the BN running stats walked the same EMA too
        for bn in ("bn0", "bn1"):
            for k, arr in state[bn].items():
                np.testing.assert_allclose(
                    np.asarray(gs.state[bn][k]), np.asarray(arr),
                    rtol=1e-4, atol=1e-6, err_msg=f"{bn}/{k} diverged")


    def test_generic_path_matches_typed_adadelta_warm_start(self, tmp_path):
        """The flagship solver (AdaDelta, the recipe's actual update
        rule) pins on the capstone path too — after a 5-step SGD warm
        start moves the net off the zero-init sim-metric point where
        ULP sign flips make AdaDelta trajectories chaotic (see the SGD
        test's docstring).  Params, BN running state, AND both AdaDelta
        accumulators must agree over 5 steps at float tolerance
        (adadelta_solver.cpp:26-106 recurrence)."""
        import dataclasses

        import jax
        import jax.numpy as jnp

        from mms_answer_selection_tpu.models import mms_qa as M
        from mms_answer_selection_tpu.training.optim import (SolverConfig,
                                                             make_solver)
        from mms_answer_selection_tpu.utils.prototxt import \
            net_prototxt_from_config

        cfg = dataclasses.replace(M.V4, vocab_size=120, sim_dropout=0.0,
                                  fc1_dropout=0.0)
        rng = np.random.default_rng(11)
        n = 6
        batch = {
            "question": np.asarray(rng.integers(0, 120, (n, 40)),
                                   np.int32),
            "answer": np.asarray(rng.integers(0, 120, (n, 40)), np.int32),
            "label": np.asarray(rng.integers(0, 2, (n,)), np.int32),
            "overlap_feat": rng.normal(size=(n, 2)).astype(np.float32),
        }
        (tmp_path / "net.prototxt").write_text(
            net_prototxt_from_config(cfg))
        (tmp_path / "solver.prototxt").write_text(
            'net: "net.prototxt"\nbase_lr: 1.0\nlr_policy: "fixed"\n'
            'momentum: 0.95\nweight_decay: 0.0005\ntype: "AdaDelta"\n'
            'delta: 1e-6\nmax_iter: 5\ntest_interval: 0\n'
            'random_seed: 7\nsnapshot_prefix: "s"\n')
        gs = GraphSolver(str(tmp_path / "solver.prototxt"),
                         feeds={"data": {**batch, "batch_size": n,
                                         "shuffle": False}})
        copy = lambda t: jax.tree.map(  # noqa: E731
            lambda x: jnp.array(np.asarray(x)), t)
        name_map = {"embed": "w2v_q", "sim": "sim_cross",
                    "conv0": "conv0", "bn0": "bn0", "conv1": "conv1",
                    "bn1": "bn1", "fc1": "fc1", "fc2": "fc2"}
        params = {k: copy(gs.params[v]) for k, v in name_map.items()}
        state = {"bn0": copy(gs.state["bn0"]),
                 "bn1": copy(gs.state["bn1"])}
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        spec = M.param_spec(params, cfg)

        def loss_fn(p, s):
            out, new_s = M.mms_qa_apply(p, s, jb, cfg, train=True,
                                        rng=jax.random.PRNGKey(0))
            return out["loss"], new_s

        def make_step(solver):
            @jax.jit
            def step(p, s, o, it):
                (loss, new_s), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(p, s)
                p2, o2 = solver.apply(p, grads, o, it)
                return p2, new_s, o2, loss
            return step

        # -- warm start: 5 typed SGD steps off the zero-init W point --
        warm = make_solver(SolverConfig(
            solver_type="sgd", base_lr=0.1, momentum=0.9,
            weight_decay=5e-4), spec)
        warm_step = make_step(warm)
        wopt = warm.init(params)
        for it in range(5):
            params, state, wopt, _ = warm_step(params, state, wopt, it)
        assert float(jnp.abs(params["sim"]["w"]).max()) > 0  # off zero-W

        # inject the SAME warm point into the generic solver (fresh
        # copies both ways: the jitted steps donate their buffers)
        gs.params = {**gs.params,
                     **{v: copy(params[k]) for k, v in name_map.items()}}
        gs.state = {**gs.state, "bn0": copy(state["bn0"]),
                    "bn1": copy(state["bn1"])}
        gs.opt_state = gs.solver.init(gs.params)
        gs.step(5)

        solver = make_solver(SolverConfig(
            solver_type="adadelta", base_lr=1.0, momentum=0.95,
            weight_decay=5e-4, delta=1e-6), spec)
        opt = solver.init(params)
        typed_step = make_step(solver)
        for it in range(5):
            params, state, opt, loss = typed_step(params, state, opt, it)

        for typed_key, gs_key in name_map.items():
            for blob, arr in params[typed_key].items():
                np.testing.assert_allclose(
                    np.asarray(gs.params[gs_key][blob]), np.asarray(arr),
                    rtol=1e-4, atol=1e-6,
                    err_msg=f"{gs_key}/{blob} diverged")
            # the AdaDelta accumulator HISTORY walked identically too
            for acc in ("h", "h2"):
                for blob, arr in opt[acc][typed_key].items():
                    np.testing.assert_allclose(
                        np.asarray(gs.opt_state[acc][gs_key][blob]),
                        np.asarray(arr), rtol=1e-4, atol=1e-7,
                        err_msg=f"opt.{acc}.{gs_key}/{blob} diverged")
        for bn in ("bn0", "bn1"):
            for k, arr in state[bn].items():
                np.testing.assert_allclose(
                    np.asarray(gs.state[bn][k]), np.asarray(arr),
                    rtol=1e-4, atol=1e-6, err_msg=f"{bn}/{k} diverged")


class TestPairImageFamily:
    def test_pair_image_net_trains_generically(self, tmp_path):
        """The SECOND model family end-to-end through the generic path:
        PairImageData feed -> Slice -> weight-tied towers ->
        PairRankLoss, driven by `caffe train` semantics alone."""
        import dataclasses

        from mms_answer_selection_tpu.data.pair_image import \
            synthetic_pair_corpus
        from mms_answer_selection_tpu.models.pair_image import \
            PairImageConfig
        from mms_answer_selection_tpu.utils.prototxt import \
            pair_image_net_prototxt

        cfg = PairImageConfig()
        src = synthetic_pair_corpus(str(tmp_path / "imgs"), n_pairs=48,
                                    hw=cfg.height)
        (tmp_path / "net.prototxt").write_text(
            pair_image_net_prototxt(cfg, source=src, batch_size=16))
        (tmp_path / "solver.prototxt").write_text(
            'net: "net.prototxt"\nbase_lr: 0.01\nlr_policy: "fixed"\n'
            'momentum: 0.9\nmax_iter: 8\ntest_interval: 0\n'
            'random_seed: 3\nsnapshot_prefix: "s"\n')
        gs = GraphSolver(str(tmp_path / "solver.prototxt"))
        smoothed = gs.step(8)
        assert np.isfinite(smoothed)
        # the snapshot round-trips through the generic caffemodel specs
        model, st = gs.snapshot()
        b = GraphSolver(str(tmp_path / "solver.prototxt"))
        b.restore(st)
        jax.tree.map(np.testing.assert_array_equal, gs.params, b.params)


class TestCaptionImageFamily:
    def test_caption_image_net_trains_generically(self, tmp_path):
        """The THIRD model family through the generic path: HDF5-fed
        cross-modal net (Embed caption x two conv towers under the
        shared metric, MaxSim via MAX Pooling + SUM Reduction,
        PairRankLoss)."""
        from mms_answer_selection_tpu.models.caption_image import \
            CaptionImageConfig
        from mms_answer_selection_tpu.utils.prototxt import \
            caption_image_net_prototxt

        cfg = CaptionImageConfig(vocab_size=50, embed_dim=16,
                                 caption_len=8, height=12, width=12)
        rng = np.random.default_rng(0)
        n = 32
        with h5py.File(tmp_path / "d.h5", "w") as f:
            f["caption"] = rng.integers(
                0, 50, (n, cfg.caption_len)).astype(np.float64)
            f["image_pos"] = rng.normal(
                size=(n, 12, 12, 3)).astype(np.float32)
            f["image_neg"] = rng.normal(
                size=(n, 12, 12, 3)).astype(np.float32)
            f["label"] = np.ones(n, np.float64)
        (tmp_path / "d.txt").write_text(str(tmp_path / "d.h5") + "\n")
        (tmp_path / "net.prototxt").write_text(
            caption_image_net_prototxt(cfg,
                                       source=str(tmp_path / "d.txt"),
                                       batch_size=16))
        (tmp_path / "solver.prototxt").write_text(
            'net: "net.prototxt"\nbase_lr: 0.01\nlr_policy: "fixed"\n'
            'momentum: 0.9\nmax_iter: 6\ntest_interval: 0\n'
            'random_seed: 2\nsnapshot_prefix: "s"\n')
        gs = GraphSolver(str(tmp_path / "solver.prototxt"))
        smoothed = gs.step(6)
        assert np.isfinite(smoothed)
        # shared proj/w2v params resolved to single owners
        assert "w2v" in gs.params


class TestMeshCLI:
    def test_qa_solve_mesh_dp(self, tmp_path, capsys):
        """`qa solve --mesh-dp` ≙ `caffe train -gpu 0,1,..`
        (tools/caffe.cpp:75-113): data-parallel over a device mesh from
        the CLI."""
        from mms_answer_selection_tpu.cli import main

        sp = _setup(tmp_path, SOLVER.replace("max_iter: 60",
                                             "max_iter: 20"))
        main(["solve", "--solver", str(sp), "--mesh-dp", "4"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["iter"] == 20
        assert np.isfinite(out["loss"])

    def test_mesh_dp_all_and_overask(self, tmp_path):
        import argparse

        from mms_answer_selection_tpu.cli import _mesh_from_args

        ns = argparse.Namespace(mesh_dp=-1)
        m = _mesh_from_args(ns)
        assert m.shape["dp"] == 8  # conftest's virtual 8-device mesh
        ns = argparse.Namespace(mesh_dp=99)
        with pytest.raises(SystemExit, match="only"):
            _mesh_from_args(ns)
        assert _mesh_from_args(argparse.Namespace(mesh_dp=0)) is None


class TestGenericMlpExample:
    def test_example_workflow(self, tmp_path, capsys, monkeypatch):
        """examples/generic_mlp: the tools-centric README workflow runs
        end-to-end (solve -> nettest -> time --model -> upgrade)."""
        import shutil
        import subprocess
        import sys

        from mms_answer_selection_tpu.cli import main

        src = os.path.join(os.path.dirname(__file__), "..", "examples",
                           "generic_mlp")
        for f in os.listdir(src):
            shutil.copy(os.path.join(src, f), tmp_path)
        monkeypatch.chdir(tmp_path)
        # make_data.py writes next to itself — run it in the copy
        subprocess.run([sys.executable, str(tmp_path / "make_data.py")],
                       check=True, env={**os.environ,
                                        "JAX_PLATFORMS": "cpu"})
        main(["solve", "--solver", str(tmp_path / "solver.prototxt")])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["iter"] == 300 and out["last_test"]["acc"] > 0.9
        main(["nettest", "--model", str(tmp_path / "net.prototxt"),
              "--weights", str(tmp_path / "snap_iter_300.caffemodel.h5"),
              "--iterations", "2"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["acc"] > 0.9
        main(["upgrade", str(tmp_path / "legacy_v1.prototxt")])
        assert 'type: "InnerProduct"' in capsys.readouterr().out


class TestMultiWeights:
    def test_comma_separated_weights(self, tmp_path, capsys):
        """`caffe train --weights a.caffemodel,b.caffemodel`
        (tools/caffe.cpp:139-154): each file applies in order."""
        from mms_answer_selection_tpu.cli import main

        sp = _setup(tmp_path)
        main(["solve", "--solver", str(sp)])
        capsys.readouterr()
        model = str(tmp_path / "snap_iter_60.caffemodel.h5")
        # same file twice: still loads cleanly, later file wins
        main(["solve", "--solver", str(sp), "--weights",
              f"{model},{model}"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["iter"] == 60


class TestRound4ReviewFixes:
    """Regression pins from the round-4 self-review."""

    def test_numeric_bool_literals(self):
        """Protobuf text accepts 0/1 for bools; `shuffle: 1` etc. must
        read as True (the str().lower()=='true' idiom read them False)."""
        from mms_answer_selection_tpu.training.graph_solver import _pbool

        assert _pbool(1) is True and _pbool(0) is False
        assert _pbool(True) is True and _pbool(False) is False
        assert _pbool("true") is True and _pbool("false") is False
        assert _pbool("1") is True and _pbool("0") is False
        assert _pbool(None, True) is True and _pbool(None) is False
        assert _pbool([0, 1]) is True  # repeated: last wins

    def test_hdf5_shuffle_numeric_literal(self, tmp_path):
        """`shuffle: 1` in an HDF5Data layer actually shuffles."""
        from mms_answer_selection_tpu.training.graph_solver import \
            _build_feed

        _make_data(tmp_path)
        cfg = {"name": "d", "type": "HDF5Data",
               "top": ["data", "label"],
               "hdf5_data_param": {"source": str(tmp_path / "train.txt"),
                                   "batch_size": 32, "shuffle": 1}}
        f = _build_feed(cfg, "train", 3, ".", None)
        first = next(f)["label"]
        cfg0 = {**cfg, "hdf5_data_param": {**cfg["hdf5_data_param"],
                                           "shuffle": 0}}
        f0 = _build_feed(cfg0, "train", 3, ".", None)
        unshuffled = next(f0)["label"]
        assert not np.array_equal(np.asarray(first),
                                  np.asarray(unshuffled))

    def test_restore_mid_run_rewinds_feeds(self, tmp_path):
        """restore() on a solver that ALREADY stepped must land the
        feeds at the snapshot position, not double-advance them — and
        test-net feeds must fast-forward too, so the post-restore
        test-metric history matches the uninterrupted run's."""
        sp = _setup(tmp_path, SOLVER.replace('snapshot_prefix: "snap"',
                                             'snapshot: 20\n'
                                             'snapshot_prefix: "snap"'))
        a = GraphSolver(str(sp))
        a.step(60)
        a_hist = [r for r in a.history if r["phase"] == "Test#0"
                  and r["iter"] >= 20]

        b = GraphSolver(str(sp))
        b.step(37)  # arbitrary mid-run position PAST the snapshot
        assert b.restore(str(tmp_path / "snap_iter_20.solverstate.h5")) \
            == 20
        b.step(40)
        assert b.iter_ == a.iter_ == 60
        jax.tree.map(np.testing.assert_array_equal, a.params, b.params)
        b_hist = [r for r in b.history if r["phase"] == "Test#0"
                  and r["iter"] >= 20]
        # same test batches replayed -> identical test metrics
        a_tail = [r for r in a_hist if r["iter"] > 20]
        b_tail = [r for r in b_hist if r["iter"] > 20]
        assert len(a_tail) == len(b_tail) > 0
        for ra, rb in zip(a_tail, b_tail):
            assert ra["iter"] == rb["iter"]
            np.testing.assert_allclose(ra["acc"], rb["acc"], rtol=0,
                                       atol=0, err_msg=str(ra["iter"]))


class TestNettestBatchZero:
    def test_nettest_scores_from_batch_zero(self, tmp_path, capsys):
        """`caffe test` scores batches 0..N-1; init's shape peek must
        not consume batch 0 (round-4 review).  A passthrough net makes
        the scored rows directly observable."""
        import h5py

        from mms_answer_selection_tpu.cli import main

        labels = np.arange(40, dtype=np.float64)
        with h5py.File(tmp_path / "t.h5", "w") as f:
            f["data"] = np.zeros((40, 3), np.float32)
            f["label"] = labels
        (tmp_path / "t.txt").write_text(str(tmp_path / "t.h5") + "\n")
        (tmp_path / "net.prototxt").write_text(f"""
layer {{ name: "data" type: "HDF5Data" top: "data" top: "label"
  hdf5_data_param {{ source: "{tmp_path / 't.txt'}" batch_size: 10 }} }}
layer {{ name: "sil" type: "Silence" bottom: "data" }}
layer {{ name: "out" type: "Power" bottom: "label" top: "out" }}
""")
        import json

        main(["nettest", "--model", str(tmp_path / "net.prototxt"),
              "--iterations", "1"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        # batch 0 = labels 0..9 (NOT 10..19, the consumed-peek bug)
        np.testing.assert_allclose(out["out"], labels[:10])
