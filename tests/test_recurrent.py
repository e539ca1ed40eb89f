"""LSTM / RNN tests: naive-loop equivalence, state reset, gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from mms_answer_selection_tpu.ops.recurrent import (
    lstm_apply,
    lstm_init,
    rnn_apply,
    rnn_init,
)
from gradcheck import check_grad

rng = np.random.default_rng(53)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


class TestLSTM:
    def test_matches_naive_loop(self):
        t, n, d, h_dim = 4, 3, 5, 6
        params = lstm_init(jax.random.PRNGKey(0), d, h_dim)
        x = jnp.asarray(rng.normal(size=(t, n, d)).astype(np.float32))
        out, (h_fin, c_fin) = lstm_apply(params, x)

        wx = np.asarray(params["wx"]); wh = np.asarray(params["wh"])
        b = np.asarray(params["b"]); xn = np.asarray(x)
        h = np.zeros((n, h_dim)); c = np.zeros((n, h_dim))
        for tt in range(t):
            gates = xn[tt] @ wx + h @ wh + b
            i, f, o, g = np.split(gates, 4, axis=-1)
            c = _sigmoid(f) * c + _sigmoid(i) * np.tanh(g)
            h = _sigmoid(o) * np.tanh(c)
            np.testing.assert_allclose(np.asarray(out[tt]), h, rtol=1e-4,
                                       atol=1e-5)
        np.testing.assert_allclose(np.asarray(h_fin), h, rtol=1e-4,
                                   atol=1e-5)

    def test_cont_resets_state(self):
        t, n, d, h_dim = 4, 2, 3, 4
        params = lstm_init(jax.random.PRNGKey(1), d, h_dim)
        x = jnp.asarray(rng.normal(size=(t, n, d)).astype(np.float32))
        cont = jnp.ones((t, n)).at[2, :].set(0.0)  # reset before step 2
        out_reset, _ = lstm_apply(params, x, cont=cont)
        out_fresh, _ = lstm_apply(params, x[2:])
        np.testing.assert_allclose(np.asarray(out_reset[2:]),
                                   np.asarray(out_fresh), rtol=1e-5)

    def test_gradients(self):
        params = lstm_init(jax.random.PRNGKey(2), 3, 4)
        x = jnp.asarray(rng.normal(size=(3, 2, 3)).astype(np.float32))
        check_grad(
            lambda wx, wh, b: jnp.sum(
                lstm_apply({"wx": wx, "wh": wh, "b": b}, x)[0] ** 2),
            [params["wx"], params["wh"], params["b"]], h=1e-3, tol=2e-2)


class TestRNN:
    def test_matches_naive_loop(self):
        t, n, d, h_dim = 3, 2, 4, 5
        params = rnn_init(jax.random.PRNGKey(3), d, h_dim)
        x = jnp.asarray(rng.normal(size=(t, n, d)).astype(np.float32))
        out, h_fin = rnn_apply(params, x)
        h = np.zeros((n, h_dim))
        for tt in range(t):
            h = np.tanh(np.asarray(x[tt]) @ np.asarray(params["wx"])
                        + h @ np.asarray(params["wh"])
                        + np.asarray(params["b"]))
            np.testing.assert_allclose(np.asarray(out[tt]), h, rtol=1e-4,
                                       atol=1e-5)

    def test_initial_state_carries(self):
        params = rnn_init(jax.random.PRNGKey(4), 3, 3)
        x = jnp.asarray(rng.normal(size=(2, 1, 3)).astype(np.float32))
        h0 = jnp.ones((1, 3)) * 0.5
        out_a, _ = rnn_apply(params, x, h0=h0)
        out_b, _ = rnn_apply(params, x)
        assert not np.allclose(np.asarray(out_a[0]), np.asarray(out_b[0]))
