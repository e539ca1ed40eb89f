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
            # the TOP is the projected output (rnn_layer.cpp:204-226)
            o = np.tanh(h @ np.asarray(params["wo"])
                        + np.asarray(params["bo"]))
            np.testing.assert_allclose(np.asarray(out[tt]), o, rtol=1e-4,
                                       atol=1e-5)
        np.testing.assert_allclose(np.asarray(h_fin), h, rtol=1e-4,
                                   atol=1e-5)

    def test_initial_state_carries(self):
        params = rnn_init(jax.random.PRNGKey(4), 3, 3)
        x = jnp.asarray(rng.normal(size=(2, 1, 3)).astype(np.float32))
        h0 = jnp.ones((1, 3)) * 0.5
        out_a, _ = rnn_apply(params, x, h0=h0)
        out_b, _ = rnn_apply(params, x)
        assert not np.allclose(np.asarray(out_a[0]), np.asarray(out_b[0]))


class TestRnnOutputProjection:
    def test_rnn_top_is_projected(self):
        """rnn_layer.cpp:204-226: the top is o_t = tanh(W_ho h_t + b_o),
        not the raw hidden state — and the layer carries FIVE blobs."""
        import jax

        from mms_answer_selection_tpu.ops.recurrent import (rnn_apply,
                                                            rnn_init)

        params = rnn_init(jax.random.PRNGKey(0), 3, 4)
        assert set(params) == {"wx", "wh", "b", "wo", "bo"}
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 3, 3)).astype(np.float32))
        out, h_t = rnn_apply(params, x)
        # manual unroll
        h = np.zeros((3, 4), np.float32)
        outs = []
        for t in range(2):
            h = np.tanh(np.asarray(x)[t] @ np.asarray(params["wx"])
                        + h @ np.asarray(params["wh"])
                        + np.asarray(params["b"]))
            outs.append(np.tanh(h @ np.asarray(params["wo"])
                                + np.asarray(params["bo"])))
        np.testing.assert_allclose(np.asarray(out), np.stack(outs),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(h_t), h, rtol=1e-5)

    def test_rnn_prototxt_five_blob_roundtrip(self, tmp_path):
        import jax

        from mms_answer_selection_tpu.models.graph_net import GraphNet
        from mms_answer_selection_tpu.utils.caffemodel import (
            load_caffemodel_binaryproto, save_caffemodel_binaryproto)

        txt = """
        layer { name: "x" type: "Input" top: "x" }
        layer { name: "rnn" type: "RNN" bottom: "x" top: "y"
          recurrent_param { num_output: 4
            weight_filler { type: "xavier" } } }
        """
        net = GraphNet(txt)
        ins = {"x": jnp.ones((2, 3, 5))}
        p, s = net.init(jax.random.PRNGKey(1), ins)
        rows = next(r for name, r, _ in net.caffemodel_specs(p, s)
                    if name == "rnn")
        assert [r[0] for r in rows] == [0, 1, 2, 3, 4]
        path = str(tmp_path / "r.caffemodel")
        save_caffemodel_binaryproto(path, p, s,
                                    specs=net.caffemodel_specs(p, s))
        p2, s2 = net.init(jax.random.PRNGKey(9), ins)
        p2, s2, _ = load_caffemodel_binaryproto(
            path, p2, s2, specs=net.caffemodel_specs(p2, s2))
        b1, _ = net.apply(p, s, ins)
        b2, _ = net.apply(p2, s2, ins)
        np.testing.assert_allclose(np.asarray(b1["y"]),
                                   np.asarray(b2["y"]), rtol=1e-6)
