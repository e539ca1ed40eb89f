"""BN-v0 semantics tests (reference src/caffe/layers/bn_layer.cpp)."""

import jax
import jax.numpy as jnp
import numpy as np

from mms_answer_selection_tpu.ops import bn_init, bn_apply
from gradcheck import check_grad

rng = np.random.default_rng(7)


def _x(n=4, h=3, w=3, c=5):
    return jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32) * 2 + 1)


def test_train_normalizes_with_batch_stats():
    x = _x()
    params, state = bn_init(5)
    y, _ = bn_apply(params, state, x, train=True)
    xn = np.asarray(x)
    mu = xn.mean(axis=(0, 1, 2))
    var = (xn ** 2).mean(axis=(0, 1, 2)) - mu ** 2  # biased, E[x^2]-(EX)^2
    expect = (xn - mu) / np.sqrt(var + 1e-9) * 1.0 + 1e-3
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-4, atol=1e-4)


def test_ema_update_direction_and_momentum():
    # running = 0.1 * batch + 0.9 * running (bn_layer.cpp:166-171, memory=0.9)
    x = _x()
    params, state = bn_init(5)
    state = {"mean": jnp.full((5,), 2.0), "var": jnp.full((5,), 3.0)}
    _, new_state = bn_apply(params, state, x, train=True)
    xn = np.asarray(x)
    mu = xn.mean(axis=(0, 1, 2))
    var = (xn ** 2).mean(axis=(0, 1, 2)) - mu ** 2
    np.testing.assert_allclose(np.asarray(new_state["mean"]),
                               0.1 * mu + 0.9 * 2.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["var"]),
                               0.1 * var + 0.9 * 3.0, rtol=1e-5)


def test_eval_uses_running_stats():
    x = _x()
    params, _ = bn_init(5)
    state = {"mean": jnp.full((5,), 0.5), "var": jnp.full((5,), 4.0)}
    y, new_state = bn_apply(params, state, x, train=False)
    expect = (np.asarray(x) - 0.5) / np.sqrt(4.0 + 1e-9) + 1e-3
    np.testing.assert_allclose(np.asarray(y), expect, rtol=1e-5, atol=1e-5)
    assert new_state is state


def test_scale_shift_applied():
    x = _x()
    params, state = bn_init(5)
    params = {"scale": jnp.full((5,), 2.0), "shift": jnp.full((5,), -1.0)}
    y, _ = bn_apply(params, state, x, train=True)
    params1 = {"scale": jnp.ones((5,)), "shift": jnp.zeros((5,))}
    y1, _ = bn_apply(params1, state, x, train=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y1) * 2.0 - 1.0,
                               rtol=1e-4, atol=1e-4)


def test_grads_flow_through_batch_stats():
    # the full BN backward (through mean and variance) -- reference
    # bn_layer.cpp:262-383 -- equals autodiff through the train forward
    x = jnp.asarray(rng.normal(size=(3, 2, 2, 2)).astype(np.float32))
    params, state = bn_init(2)

    def f(x_, scale, shift):
        y, _ = bn_apply({"scale": scale, "shift": shift}, state, x_, train=True)
        return jnp.sum(jnp.tanh(y))

    check_grad(f, [x, params["scale"], params["shift"]], h=1e-3, tol=2e-2)


def test_ema_update_carries_no_gradient():
    x = _x()
    params, state = bn_init(5)

    def f(x_):
        _, new_state = bn_apply(params, state, x_, train=True)
        return jnp.sum(new_state["mean"]) + jnp.sum(new_state["var"])

    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), 0.0)
