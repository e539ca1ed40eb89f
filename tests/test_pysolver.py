"""pycaffe-style Solver wrapper (models/pysolver.py vs
python/caffe/_caffe.cpp:259-345 Solver bindings + pycaffe usage):
get_solver / per-type classes, live net views, step/solve/snapshot/
restore, test-net weight sharing."""

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

import jax.numpy as jnp  # noqa: E402

from mms_answer_selection_tpu.models import (AdamSolver, SGDSolver,
                                             get_solver)
from tests.test_graph_solver import SOLVER, _setup


class TestSolverSurface:
    def test_step_and_blobs(self, tmp_path):
        solver = get_solver(str(_setup(tmp_path)))
        assert solver.iter == 0
        loss0 = solver.step(5)
        assert solver.iter == 5
        # last step's output blobs land in net.blobs without a re-forward
        assert "loss" in solver.net.blobs
        loss1 = solver.step(40)
        assert solver.iter == 45
        assert loss1 < loss0

    def test_net_forward_all_tops(self, tmp_path):
        solver = get_solver(str(_setup(tmp_path)))
        out = solver.net.forward()
        # every intermediate top materializes on explicit forward
        for blob in ("data", "fc1", "fc2", "loss"):
            assert blob in solver.net.blobs
        assert "loss" in out

    def test_test_net_shares_train_weights(self, tmp_path):
        solver = get_solver(str(_setup(tmp_path)))
        solver.step(30)
        tv = solver.test_nets[0]
        assert tv.params["fc1"]["w"] is solver.net.params["fc1"]["w"]
        tv.forward()
        acc = float(tv.blobs["acc"])
        assert acc > 0.5  # trained weights, not the test net's init

    def test_forward_override_inputs(self, tmp_path):
        solver = get_solver(str(_setup(tmp_path)))
        x = jnp.zeros((4, 6), jnp.float32)
        y = jnp.zeros((4,), jnp.float32)
        solver.net.forward(data=x, label=y)
        assert solver.net.blobs["fc2"].shape == (4, 3)

    def test_snapshot_restore(self, tmp_path):
        solver = get_solver(str(_setup(tmp_path)))
        solver.step(20)
        model, state = solver.snapshot()
        ref = np.asarray(solver.net.params["fc1"]["w"])
        solver.step(10)
        assert not np.allclose(np.asarray(solver.net.params["fc1"]["w"]),
                               ref)
        solver2 = get_solver(str(tmp_path / "solver.prototxt"))
        solver2.restore(state)
        assert solver2.iter == 20
        np.testing.assert_array_equal(
            np.asarray(solver2.net.params["fc1"]["w"]), ref)

    def test_restore_missing_file_raises(self, tmp_path):
        solver = get_solver(str(_setup(tmp_path)))
        with pytest.raises(FileNotFoundError):
            solver.restore(str(tmp_path / "nope.solverstate"))

    def test_net_save_copy_from(self, tmp_path):
        solver = get_solver(str(_setup(tmp_path)))
        solver.step(10)
        solver.net.save(str(tmp_path / "w.caffemodel.h5"))
        fresh = get_solver(str(tmp_path / "solver.prototxt"))
        assert not np.allclose(
            np.asarray(fresh.net.params["fc1"]["w"]),
            np.asarray(solver.net.params["fc1"]["w"]))
        fresh.net.copy_from(str(tmp_path / "w.caffemodel.h5"))
        np.testing.assert_array_equal(
            np.asarray(fresh.net.params["fc1"]["w"]),
            np.asarray(solver.net.params["fc1"]["w"]))


class TestTypedClasses:
    def test_typed_class_overrides_prototxt(self, tmp_path):
        # SOLVER says type SGD; AdamSolver must construct Adam anyway
        # (_caffe.cpp's per-type classes ignore the type field)
        solver = AdamSolver(str(_setup(tmp_path)))
        assert solver._gs.cfg.solver_type == "adam"
        solver.step(3)

    def test_sgd_class_matches_graph_solver(self, tmp_path):
        from mms_answer_selection_tpu.training.graph_solver import \
            GraphSolver

        sp = _setup(tmp_path, SOLVER + "test_interval: 0\ndisplay: 0\n")
        a = SGDSolver(str(sp))
        b = GraphSolver(str(sp))
        a.step(10)
        b.step(10)
        np.testing.assert_array_equal(
            np.asarray(a.net.params["fc2"]["w"]),
            np.asarray(b.params["fc2"]["w"]))


class TestCallbacks:
    def test_add_callback_fires_per_iteration(self, tmp_path):
        """Solver::Callback pair (solver.hpp:78-89, fired at
        solver.cpp:215/251): on_start at iteration start,
        on_gradients_ready after the step."""
        solver = get_solver(str(_setup(tmp_path)))
        events = []
        solver.add_callback(lambda: events.append("start"),
                            lambda: events.append("ready"))
        solver.step(3)
        assert events == ["start", "ready"] * 3
