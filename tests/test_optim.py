"""Solver-family tests.

Mirrors the reference's methodology (src/caffe/test/
test_gradient_based_solver.cpp:224-300): compute the expected update
analytically from the update-rule recurrences on a tiny least-squares
problem and assert the solver reproduces it, including history evolution
across steps, lr/decay multipliers, clipping, and iter_size."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mms_answer_selection_tpu.training import SolverConfig, make_solver
from mms_answer_selection_tpu.training.optim import learning_rate

rng = np.random.default_rng(3)


def _quad_problem():
    # f(w) = 0.5 ||X w - y||^2 / n -- simple convex problem
    X = rng.normal(size=(8, 4)).astype(np.float32)
    y = rng.normal(size=(8,)).astype(np.float32)

    def loss(w):
        r = X @ w - y
        return 0.5 * jnp.mean(r * r)

    w0 = jnp.asarray(rng.normal(size=(4,)).astype(np.float32))
    return loss, w0


def _run(solver_type, steps=3, **kw):
    loss, w0 = _quad_problem()
    cfg = SolverConfig(solver_type=solver_type, weight_decay=0.0, **kw)
    solver = make_solver(cfg)
    params = {"w": w0}
    st = solver.init(params)
    trace = [np.asarray(params["w"])]
    grads_seen = []
    for i in range(steps):
        g = jax.grad(lambda p: loss(p["w"]))(params)
        grads_seen.append(np.asarray(g["w"], np.float64))
        params, st = solver.apply(params, g, st, i)
        trace.append(np.asarray(params["w"]))
    return np.asarray(trace, np.float64), grads_seen, cfg


class TestAnalyticUpdates:
    def test_sgd_momentum(self):
        tr, gs, cfg = _run("sgd", base_lr=0.1, momentum=0.9)
        h = np.zeros(4)
        w = tr[0].copy()
        for i in range(3):
            h = 0.9 * h + 0.1 * gs[i]
            w = w - h
            np.testing.assert_allclose(tr[i + 1], w, rtol=1e-5, atol=1e-6)

    def test_nesterov(self):
        tr, gs, cfg = _run("nesterov", base_lr=0.1, momentum=0.9)
        h = np.zeros(4)
        w = tr[0].copy()
        for i in range(3):
            h_new = 0.9 * h + 0.1 * gs[i]
            w = w - ((1 + 0.9) * h_new - 0.9 * h)
            h = h_new
            np.testing.assert_allclose(tr[i + 1], w, rtol=1e-5, atol=1e-6)

    def test_adagrad(self):
        tr, gs, _ = _run("adagrad", base_lr=0.1, delta=1e-7)
        h = np.zeros(4)
        w = tr[0].copy()
        for i in range(3):
            h = h + gs[i] ** 2
            w = w - 0.1 * gs[i] / (np.sqrt(h) + 1e-7)
            np.testing.assert_allclose(tr[i + 1], w, rtol=1e-4, atol=1e-6)

    def test_rmsprop(self):
        tr, gs, _ = _run("rmsprop", base_lr=0.1, rms_decay=0.95, delta=1e-7)
        h = np.zeros(4)
        w = tr[0].copy()
        for i in range(3):
            h = 0.05 * gs[i] ** 2 + 0.95 * h
            w = w - 0.1 * gs[i] / (np.sqrt(h) + 1e-7)
            np.testing.assert_allclose(tr[i + 1], w, rtol=1e-4, atol=1e-6)

    def test_adadelta_reference_recurrence(self):
        # h/h2 EMAs with delta added to BOTH before the ratio
        # (adadelta_solver.cpp:45-68)
        tr, gs, _ = _run("adadelta", base_lr=1.0, momentum=0.95, delta=5e-7)
        h = np.zeros(4)
        h2 = np.zeros(4)
        w = tr[0].copy()
        for i in range(3):
            h = 0.05 * gs[i] ** 2 + 0.95 * h
            u = gs[i] * np.sqrt((h2 + 5e-7) / (h + 5e-7))
            h2 = 0.05 * u ** 2 + 0.95 * h2
            w = w - 1.0 * u
            np.testing.assert_allclose(tr[i + 1], w, rtol=1e-4, atol=1e-7)

    def test_adam_with_bias_correction(self):
        tr, gs, _ = _run("adam", base_lr=0.01, momentum=0.9, momentum2=0.999,
                         delta=1e-8)
        m = np.zeros(4)
        v = np.zeros(4)
        w = tr[0].copy()
        for i in range(3):
            t = i + 1
            m = 0.1 * gs[i] + 0.9 * m
            v = 0.001 * gs[i] ** 2 + 0.999 * v
            corr = np.sqrt(1 - 0.999 ** t) / (1 - 0.9 ** t)
            w = w - 0.01 * corr * m / (np.sqrt(v) + 1e-8)
            np.testing.assert_allclose(tr[i + 1], w, rtol=1e-4, atol=1e-5)


class TestSolverMechanics:
    def test_weight_decay_l2_into_grad(self):
        cfg = SolverConfig(solver_type="sgd", base_lr=1.0, momentum=0.0,
                           weight_decay=0.1)
        solver = make_solver(cfg)
        params = {"w": jnp.asarray([2.0])}
        st = solver.init(params)
        g = {"w": jnp.asarray([0.5])}
        new, _ = solver.apply(params, g, st, 0)
        # diff = g + 0.1 * w = 0.5 + 0.2
        np.testing.assert_allclose(np.asarray(new["w"]), [2.0 - 0.7],
                                   rtol=1e-6)

    def test_lr_and_decay_multipliers(self):
        cfg = SolverConfig(solver_type="sgd", base_lr=1.0, momentum=0.0,
                           weight_decay=0.1)
        spec = {"a": (2.0, 0.0), "b": (1.0, 1.0)}
        solver = make_solver(cfg, spec)
        params = {"a": jnp.asarray([1.0]), "b": jnp.asarray([1.0])}
        st = solver.init(params)
        g = {"a": jnp.asarray([0.5]), "b": jnp.asarray([0.5])}
        new, _ = solver.apply(params, g, st, 0)
        np.testing.assert_allclose(np.asarray(new["a"]), [1.0 - 2 * 0.5],
                                   rtol=1e-6)  # lr x2, no decay
        np.testing.assert_allclose(np.asarray(new["b"]), [1.0 - (0.5 + 0.1)],
                                   rtol=1e-6)  # decay into grad

    def test_global_clip_before_decay(self):
        # clip operates on the raw gradient norm (sgd_solver.cpp:102-116)
        cfg = SolverConfig(solver_type="sgd", base_lr=1.0, momentum=0.0,
                           weight_decay=0.0, clip_gradients=1.0)
        solver = make_solver(cfg)
        params = {"w": jnp.asarray([0.0, 0.0])}
        st = solver.init(params)
        g = {"w": jnp.asarray([3.0, 4.0])}  # norm 5 -> scaled by 1/5
        new, _ = solver.apply(params, g, st, 0)
        np.testing.assert_allclose(np.asarray(new["w"]), [-0.6, -0.8],
                                   rtol=1e-6)

    def test_iter_size_normalization(self):
        cfg = SolverConfig(solver_type="sgd", base_lr=1.0, momentum=0.0,
                           weight_decay=0.0, iter_size=4)
        solver = make_solver(cfg)
        params = {"w": jnp.asarray([0.0])}
        new, _ = solver.apply(params, {"w": jnp.asarray([2.0])},
                              solver.init(params), 0)
        np.testing.assert_allclose(np.asarray(new["w"]), [-0.5], rtol=1e-6)

    def test_jit_and_convergence(self):
        loss, w0 = _quad_problem()
        cfg = SolverConfig(solver_type="adadelta", base_lr=1.0, momentum=0.95,
                           delta=5e-7, weight_decay=0.0)
        solver = make_solver(cfg)
        params = {"w": w0}
        st = solver.init(params)

        @jax.jit
        def step(p, s, i):
            g = jax.grad(lambda p_: loss(p_["w"]))(p)
            return solver.apply(p, g, s, i)

        l0 = float(loss(params["w"]))
        for i in range(200):
            params, st = step(params, st, jnp.asarray(i))
        assert float(loss(params["w"])) < 0.5 * l0


class TestLearningRatePolicies:
    def test_policies(self):
        base = dict(base_lr=1.0, gamma=0.5, power=2.0, stepsize=10,
                    max_iter=100)
        assert float(learning_rate(SolverConfig(lr_policy="fixed", **base),
                                   7)) == 1.0
        assert float(learning_rate(SolverConfig(lr_policy="step", **base),
                                   25)) == pytest.approx(0.25)
        assert float(learning_rate(SolverConfig(lr_policy="exp", **base),
                                   2)) == pytest.approx(0.25)
        assert float(learning_rate(SolverConfig(lr_policy="inv", **base),
                                   2)) == pytest.approx((1 + 0.5 * 2) ** -2.0)
        assert float(learning_rate(SolverConfig(lr_policy="poly", **base),
                                   50)) == pytest.approx(0.25)
        ms = SolverConfig(lr_policy="multistep", stepvalues=(10, 20), **{
            k: v for k, v in base.items() if k != "stepsize"}, stepsize=1)
        assert float(learning_rate(ms, 5)) == pytest.approx(1.0)
        assert float(learning_rate(ms, 15)) == pytest.approx(0.5)
        assert float(learning_rate(ms, 25)) == pytest.approx(0.25)
        sg = SolverConfig(lr_policy="sigmoid", **base)
        assert float(learning_rate(sg, 10)) == pytest.approx(0.5)


class TestRound4OptimFixes:
    def test_clip_gradients_zero_freezes(self):
        """sgd_solver.cpp:83 clips for ANY >= 0: clip 0 scales every
        gradient to zero (frozen training), it does not disable."""
        from mms_answer_selection_tpu.training.optim import (SolverConfig,
                                                             make_solver)

        params = {"w": jnp.asarray([1.0, -2.0])}
        grads = {"w": jnp.asarray([0.5, 0.25])}
        s0 = make_solver(SolverConfig(solver_type="sgd", base_lr=0.1,
                                      momentum=0.0, weight_decay=0.0,
                                      clip_gradients=0.0))
        p2, _ = s0.apply(params, grads, s0.init(params), 0)
        np.testing.assert_array_equal(np.asarray(p2["w"]),
                                      np.asarray(params["w"]))
        sneg = make_solver(SolverConfig(solver_type="sgd", base_lr=0.1,
                                        momentum=0.0, weight_decay=0.0,
                                        clip_gradients=-1.0))
        p3, _ = sneg.apply(params, grads, sneg.init(params), 0)
        assert not np.array_equal(np.asarray(p3["w"]),
                                  np.asarray(params["w"]))

    def test_step_policy_requires_stepsize(self):
        from mms_answer_selection_tpu.training.optim import (SolverConfig,
                                                             learning_rate)

        with pytest.raises(ValueError, match="stepsize"):
            learning_rate(SolverConfig(solver_type="sgd", base_lr=0.1,
                                       lr_policy="step", stepsize=0), 5)
