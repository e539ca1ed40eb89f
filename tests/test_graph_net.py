"""GraphNet: arbitrary prototxt DAGs -> executable JAX functions.

The reference counterpart is Net::Init + Forward/Backward over the layer
registry (src/caffe/net.cpp:39-595, layer_factory.hpp); these tests pin
the generality the typed-config families don't cover: phase filtering,
ParamSpec weight sharing, legacy-prototxt ingestion, loss_weight
accumulation, and the long tail of stock layer types.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mms_answer_selection_tpu.metrics import ir_metrics
from mms_answer_selection_tpu.models import mms_qa as M
from mms_answer_selection_tpu.models.graph_net import GraphNet
from mms_answer_selection_tpu.utils.prototxt import net_prototxt_from_config


def _qa_batch(rng, n=6, vocab=120):
    return {
        "question": jnp.asarray(rng.integers(0, vocab, (n, 40))),
        "answer": jnp.asarray(rng.integers(0, vocab, (n, 40))),
        "label": jnp.asarray(rng.integers(0, 2, (n,))),
        "group": jnp.asarray(np.repeat(np.arange(n // 3), 3)[:n]),
        "overlap_feat": jnp.asarray(
            rng.normal(size=(n, 2)).astype(np.float32)),
    }


class TestQAFamilyParity:
    """The generated QA net run through GraphNet must equal the typed
    model exactly, weight-for-weight."""

    def test_eval_forward_matches_typed_model(self):
        cfg = dataclasses.replace(M.V4, vocab_size=120, sim_dropout=0.0,
                                  fc1_dropout=0.0)
        net = GraphNet(net_prototxt_from_config(cfg, phase="eval"),
                       phase="test")
        batch = _qa_batch(np.random.default_rng(0))
        params, state = net.init(jax.random.PRNGKey(7), batch)
        # shared embed: ONE owner (w2v_q); w2v_a holds no blobs
        assert "w2v_a" not in params
        blobs, _ = net.apply(params, state, batch, train=False)
        mp = {"embed": params["w2v_q"], "sim": params["sim_cross"],
              "conv0": params["conv0"], "bn0": params["bn0"],
              "conv1": params["conv1"], "bn1": params["bn1"],
              "fc1": params["fc1"], "fc2": params["fc2"]}
        ms = {"bn0": state["bn0"], "bn1": state["bn1"]}
        out, _ = M.mms_qa_apply(mp, ms, batch, cfg, train=False)
        np.testing.assert_allclose(blobs["prob"], out["prob"], atol=1e-6)
        np.testing.assert_allclose(blobs["loss"], out["loss"], atol=1e-6)
        # in-graph metric layers agree with the metrics module
        mrr = ir_metrics.mean_reciprocal_rank_jax(
            out["prob"][:, 1], batch["label"], batch["group"])
        np.testing.assert_allclose(blobs["mrr"], mrr, atol=1e-6)

    def test_train_loss_and_grad(self):
        cfg = dataclasses.replace(M.V4, vocab_size=120, sim_dropout=0.0,
                                  fc1_dropout=0.0)
        net = GraphNet(net_prototxt_from_config(cfg), phase="train")
        batch = _qa_batch(np.random.default_rng(1))
        params, state = net.init(jax.random.PRNGKey(3), batch)

        def loss_fn(p):
            return net.loss(p, state, batch, train=True,
                            rng=jax.random.PRNGKey(5))[0]

        total, grads = jax.value_and_grad(loss_fn)(params)
        assert np.isfinite(float(total))
        # fc2 sees gradient; the zero-init sim metric blocks embed grads
        # at step 0 (the reference's constant-filler quirk, CLAUDE.md)
        assert float(jnp.sum(jnp.abs(grads["fc2"]["w"]))) > 0
        np.testing.assert_allclose(np.asarray(grads["w2v_q"]["w"]), 0.0)

    def test_jit_apply(self):
        cfg = dataclasses.replace(M.V4, vocab_size=64, sim_dropout=0.0,
                                  fc1_dropout=0.0)
        net = GraphNet(net_prototxt_from_config(cfg, phase="eval"),
                       phase="test")
        batch = _qa_batch(np.random.default_rng(2), vocab=64)
        params, state = net.init(jax.random.PRNGKey(0), batch)
        fast = jax.jit(lambda p, s, b: net.apply(p, s, b, train=False))
        blobs, _ = fast(params, state, batch)
        ref, _ = net.apply(params, state, batch, train=False)
        np.testing.assert_allclose(blobs["prob"], ref["prob"], atol=1e-6)


class TestSharingAndSpecs:
    SHARED = """
    layer { name: "d" type: "Input" top: "x" top: "y" }
    layer { name: "fa" type: "InnerProduct" bottom: "x" top: "a"
      param { name: "tied-w" lr_mult: 1 } param { name: "tied-b" lr_mult: 2 }
      inner_product_param { num_output: 4
        weight_filler { type: "gaussian" std: 0.1 } } }
    layer { name: "fb" type: "InnerProduct" bottom: "y" top: "b"
      param { name: "tied-w" } param { name: "tied-b" }
      inner_product_param { num_output: 4 } }
    layer { name: "sum" type: "Eltwise" bottom: "a" bottom: "b" top: "s" }
    layer { name: "loss" type: "EuclideanLoss" bottom: "s" bottom: "s0"
      top: "loss" }
    """

    def test_param_sharing(self):
        net = GraphNet(self.SHARED)
        rng = np.random.default_rng(0)
        ins = {"x": jnp.asarray(rng.normal(size=(3, 5)).astype(np.float32)),
               "y": jnp.asarray(rng.normal(size=(3, 5)).astype(np.float32)),
               "s0": jnp.zeros((3, 4), jnp.float32)}
        params, state = net.init(jax.random.PRNGKey(1), ins)
        # one storage slot, owned by the first declarer (net.cpp:472-550)
        assert sorted(params) == ["fa"]
        blobs, _ = net.apply(params, state, ins)
        w, b = params["fa"]["w"], params["fa"]["b"]
        np.testing.assert_allclose(blobs["a"], ins["x"] @ w + b, atol=1e-6)
        np.testing.assert_allclose(blobs["b"], ins["y"] @ w + b, atol=1e-6)
        # gradient accumulates across BOTH uses of the shared blob
        g = jax.grad(lambda p: net.loss(p, state, ins)[0])(params)
        direct = jax.grad(
            lambda w_: float(0.0) + jnp.sum(jnp.square(
                (ins["x"] @ w_ + b) + (ins["y"] @ w_ + b))) / (2 * 3)
        )(w)
        np.testing.assert_allclose(np.asarray(g["fa"]["w"]),
                                   np.asarray(direct), atol=1e-5)

    def test_param_spec_tree(self):
        net = GraphNet(self.SHARED)
        ins = {"x": jnp.zeros((2, 5)), "y": jnp.zeros((2, 5)),
               "s0": jnp.zeros((2, 4))}
        params, _ = net.init(jax.random.PRNGKey(0), ins)
        spec = net.param_spec(params)
        assert spec == {"fa": {"w": (1.0, 1.0), "b": (2.0, 1.0)}}

    def test_loss_weight_override(self):
        txt = """
        layer { name: "d" type: "Input" top: "x" }
        layer { name: "r" type: "Reduction" bottom: "x" top: "r"
          loss_weight: 0.5 }
        """
        net = GraphNet(txt)
        ins = {"x": jnp.asarray([[1.0, 2.0], [3.0, 4.0]])}
        params, state = net.init(jax.random.PRNGKey(0), ins)
        total, _ = net.loss(params, state, ins)
        assert total == pytest.approx(0.5 * 10.0)


class TestPhases:
    TXT = """
    layer { name: "d" type: "Input" top: "x" }
    layer { name: "drop" type: "Dropout" bottom: "x" top: "x"
      include { phase: TRAIN } dropout_param { dropout_ratio: 0.4 } }
    layer { name: "s" type: "Sigmoid" bottom: "x" top: "s"
      exclude { phase: TRAIIN_TYPO } }
    layer { name: "acc" type: "Accuracy" bottom: "s" bottom: "lab"
      top: "acc" include { phase: TEST } }
    """.replace("TRAIIN_TYPO", "TRAIN")

    def test_filternet(self):
        train = GraphNet(self.TXT, phase="train")
        test = GraphNet(self.TXT, phase="test")
        assert [n.name for n in train.layers] == ["d", "drop"]
        assert [n.name for n in test.layers] == ["d", "s", "acc"]

    def test_unknown_type_raises(self):
        with pytest.raises(ValueError, match="unknown layer type"):
            GraphNet('layer { name: "z" type: "Frobnicate" }')


class TestLegacyIngestion:
    """A V1-era prototxt (layers: + enum types + blobs_lr) builds and
    runs through the same upgrade path the reference applies on load
    (util/upgrade_proto.cpp)."""

    V1 = """
    name: "legacy"
    layers { name: "ip1" type: INNER_PRODUCT bottom: "data" top: "ip1"
      blobs_lr: 1 blobs_lr: 2
      inner_product_param { num_output: 8
        weight_filler { type: "xavier" } } }
    layers { name: "relu1" type: RELU bottom: "ip1" top: "ip1" }
    layers { name: "ip2" type: INNER_PRODUCT bottom: "ip1" top: "ip2"
      inner_product_param { num_output: 3 } }
    layers { name: "loss" type: SOFTMAX_LOSS bottom: "ip2" bottom: "label"
      top: "loss" }
    """

    def test_v1_net_runs(self):
        net = GraphNet(self.V1)
        rng = np.random.default_rng(0)
        ins = {"data": jnp.asarray(rng.normal(size=(4, 6)).astype(np.float32)),
               "label": jnp.asarray(rng.integers(0, 3, (4,)))}
        params, state = net.init(jax.random.PRNGKey(0), ins)
        total, (blobs, _) = net.loss(params, state, ins)
        assert blobs["ip2"].shape == (4, 3)
        assert np.isfinite(float(total))
        spec = net.param_spec(params)
        assert spec["ip1"] == {"w": (1.0, 1.0), "b": (2.0, 1.0)}


class TestTraining:
    """GraphNet + training/optim: the generic graph trains under the
    reference solver stack (the `caffe train` path for arbitrary nets,
    tools/caffe.cpp:157-252)."""

    def test_legacy_net_trains_with_solver(self):
        from mms_answer_selection_tpu.training.optim import (SolverConfig,
                                                             make_solver)

        net = GraphNet(TestLegacyIngestion.V1)
        rng = np.random.default_rng(0)
        x = rng.normal(size=(32, 6)).astype(np.float32)
        y = (x[:, 0] + x[:, 1] > 0).astype(np.int64) + (x[:, 2] > 0)
        ins = {"data": jnp.asarray(x), "label": jnp.asarray(y)}
        params, state = net.init(jax.random.PRNGKey(0), ins)
        solver = make_solver(SolverConfig(solver_type="adadelta",
                                          base_lr=1.0, momentum=0.9,
                                          delta=1e-6, lr_policy="fixed"),
                             net.param_spec(params))
        opt = solver.init(params)

        @jax.jit
        def step(params, state, opt, i):
            (loss, (_, new_state)), grads = jax.value_and_grad(
                lambda p: net.loss(p, state, ins), has_aux=True)(params)
            params, opt = solver.apply(params, grads, opt, i)
            return params, new_state, opt, loss

        first = None
        for i in range(40):
            params, state, opt, loss = step(params, state, opt, i)
            if first is None:
                first = float(loss)
        assert float(loss) < first * 0.7, (first, float(loss))


class TestLayerZoo:
    """One forward per remaining stock type, value-checked where cheap."""

    def _run(self, txt, ins, *, train=False, rng=None, phase="train"):
        net = GraphNet(txt, phase=phase)
        params, state = net.init(jax.random.PRNGKey(0), ins)
        return net.apply(params, state, ins, train=train, rng=rng)

    def test_neuron_chain(self):
        txt = """
        layer { name: "d" type: "Input" top: "x" }
        layer { name: "p" type: "Power" bottom: "x" top: "p"
          power_param { power: 2 scale: 3 shift: 1 } }
        layer { name: "e" type: "Exp" bottom: "x" top: "e"
          exp_param { base: 2 } }
        layer { name: "l" type: "Log" bottom: "e" top: "l"
          log_param { base: 2 } }
        layer { name: "t" type: "Threshold" bottom: "x" top: "t"
          threshold_param { threshold: 0.5 } }
        layer { name: "a" type: "AbsVal" bottom: "x" top: "a" }
        layer { name: "bn" type: "BNLL" bottom: "x" top: "bn" }
        layer { name: "el" type: "ELU" bottom: "x" top: "el"
          elu_param { alpha: 0.5 } }
        layer { name: "re" type: "ReLU" bottom: "x" top: "re"
          relu_param { negative_slope: 0.1 } }
        """
        x = jnp.asarray([[-1.0, 0.25, 2.0]])
        blobs, _ = self._run(txt, {"x": x})
        np.testing.assert_allclose(blobs["p"], (1 + 3 * x) ** 2, atol=1e-6)
        np.testing.assert_allclose(blobs["l"], x, atol=1e-5)  # log2(2^x)
        np.testing.assert_allclose(blobs["t"], [[0.0, 0.0, 1.0]])
        np.testing.assert_allclose(blobs["re"], [[-0.1, 0.25, 2.0]],
                                   atol=1e-6)

    def test_structural(self):
        txt = """
        layer { name: "d" type: "Input" top: "x" }
        layer { name: "sl" type: "Slice" bottom: "x" top: "s1" top: "s2"
          slice_param { axis: 1 slice_point: 2 } }
        layer { name: "cc" type: "Concat" bottom: "s2" bottom: "s1"
          top: "cat" concat_param { axis: 1 } }
        layer { name: "sp" type: "Split" bottom: "cat" top: "c1" top: "c2" }
        layer { name: "ew" type: "Eltwise" bottom: "c1" bottom: "c2"
          top: "ew" eltwise_param { operation: SUM coeff: 1 coeff: -1 } }
        layer { name: "ti" type: "Tile" bottom: "x" top: "ti"
          tile_param { axis: 0 tiles: 2 } }
        layer { name: "fl" type: "Flatten" bottom: "x" top: "fl" }
        layer { name: "rs" type: "Reshape" bottom: "x" top: "rs"
          reshape_param { shape { dim: 0 dim: -1 dim: 2 } } }
        """
        x = jnp.arange(8.0).reshape(2, 4)
        blobs, _ = self._run(txt, {"x": x})
        np.testing.assert_allclose(
            blobs["cat"], jnp.concatenate([x[:, 2:], x[:, :2]], axis=1))
        np.testing.assert_allclose(blobs["ew"], jnp.zeros((2, 4)))
        assert blobs["ti"].shape == (4, 4)
        assert blobs["rs"].shape == (2, 2, 2)

    def test_vision_stack(self):
        txt = """
        layer { name: "d" type: "Input" top: "x" }
        layer { name: "cv" type: "Convolution" bottom: "x" top: "cv"
          convolution_param { num_output: 4 kernel_size: 3 pad: 1 stride: 1
            weight_filler { type: "msra" } bias_filler { type: "constant"
            value: 0.5 } } }
        layer { name: "po" type: "Pooling" bottom: "cv" top: "po"
          pooling_param { pool: MAX kernel_size: 2 stride: 2 } }
        layer { name: "gp" type: "Pooling" bottom: "cv" top: "gp"
          pooling_param { pool: AVE global_pooling: true } }
        layer { name: "lr" type: "LRN" bottom: "cv" top: "lr"
          lrn_param { local_size: 3 alpha: 2 beta: 0.5 } }
        layer { name: "lw" type: "LRN" bottom: "cv" top: "lw"
          lrn_param { local_size: 3 norm_region: WITHIN_CHANNEL } }
        layer { name: "mv" type: "MVN" bottom: "cv" top: "mv" }
        layer { name: "dc" type: "Deconvolution" bottom: "po" top: "dc"
          convolution_param { num_output: 2 kernel_size: 2 stride: 2
            weight_filler { type: "bilinear" } bias_term: false } }
        layer { name: "sc" type: "Scale" bottom: "cv" top: "sc"
          scale_param { bias_term: true } }
        layer { name: "bi" type: "Bias" bottom: "cv" top: "bi" }
        layer { name: "cr" type: "Crop" bottom: "cv" bottom: "po" top: "cr"
          crop_param { axis: 2 offset: 1 } }
        layer { name: "spp" type: "SPP" bottom: "cv" top: "spp"
          spp_param { pyramid_height: 2 } }
        """
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 8, 8, 3)).astype(np.float32))
        blobs, _ = self._run(txt, {"x": x})
        assert blobs["cv"].shape == (2, 8, 8, 4)
        assert blobs["po"].shape == (2, 4, 4, 4)
        assert blobs["gp"].shape == (2, 1, 1, 4)
        assert blobs["dc"].shape == (2, 8, 8, 2)
        assert blobs["cr"].shape == (2, 4, 4, 4)
        # SPP: 1x1 + 2x2 bins = 5 bins x 4 channels
        assert blobs["spp"].shape == (2, 20)
        # Scale init: multiplier 1 + bias 0 == identity
        np.testing.assert_allclose(blobs["sc"], blobs["cv"], atol=1e-6)

    def test_grouped_and_dilated_conv(self):
        txt = """
        layer { name: "d" type: "Input" top: "x" }
        layer { name: "cv" type: "Convolution" bottom: "x" top: "cv"
          convolution_param { num_output: 4 kernel_size: 3 group: 2
            dilation: 2 weight_filler { type: "gaussian" std: 1 } } }
        """
        x = jnp.asarray(np.random.default_rng(1).normal(
            size=(1, 9, 9, 4)).astype(np.float32))
        blobs, _ = self._run(txt, {"x": x})
        # dilated VALID: 9 - (2*(3-1)+1) + 1 = 5
        assert blobs["cv"].shape == (1, 5, 5, 4)

    def test_stochastic_pool_modes(self):
        txt = """
        layer { name: "d" type: "Input" top: "x" }
        layer { name: "po" type: "Pooling" bottom: "x" top: "po"
          pooling_param { pool: STOCHASTIC kernel_size: 2 stride: 2 } }
        """
        x = jnp.abs(jnp.asarray(np.random.default_rng(2).normal(
            size=(1, 4, 4, 2)).astype(np.float32)))
        train_blobs, _ = self._run(txt, {"x": x}, train=True,
                                   rng=jax.random.PRNGKey(0))
        eval_blobs, _ = self._run(txt, {"x": x}, train=False)
        assert train_blobs["po"].shape == eval_blobs["po"].shape == \
            (1, 2, 2, 2)

    def test_recurrent_and_similarity(self):
        txt = """
        layer { name: "d" type: "Input" top: "x" top: "q" top: "a"
          top: "u" top: "v" }
        layer { name: "ls" type: "LSTM" bottom: "x" top: "ls"
          recurrent_param { num_output: 5
            weight_filler { type: "uniform" min: -0.1 max: 0.1 } } }
        layer { name: "rn" type: "RNN" bottom: "x" top: "rn"
          recurrent_param { num_output: 5
            weight_filler { type: "uniform" min: -0.1 max: 0.1 } } }
        layer { name: "sx" type: "SimCross" bottom: "q" bottom: "a"
          top: "sx" sim_cross_param { dist_mode: 1 } }
        layer { name: "sm" type: "SimMatrix" bottom: "u" bottom: "v"
          top: "sm" sim_matrix_param {
            weight_filler { type: "gaussian" std: 0.2 } } }
        layer { name: "fm" type: "FM" bottom: "q" top: "fm" }
        """
        rng = np.random.default_rng(3)
        ins = {"x": jnp.asarray(rng.normal(size=(7, 2, 3)).astype(np.float32)),
               "q": jnp.asarray(rng.normal(size=(2, 4, 3)).astype(np.float32)),
               "a": jnp.asarray(rng.normal(size=(2, 5, 3)).astype(np.float32)),
               "u": jnp.asarray(rng.normal(size=(2, 4)).astype(np.float32)),
               "v": jnp.asarray(rng.normal(size=(2, 6)).astype(np.float32))}
        blobs, _ = self._run(txt, ins)
        assert blobs["ls"].shape == (7, 2, 5)
        assert blobs["sx"].shape == (2, 4, 5, 1)
        assert blobs["sm"].shape == (2, 1)
        assert blobs["fm"].shape == (2, 1)

    def test_losses_and_metrics(self):
        txt = """
        layer { name: "d" type: "Input" top: "lg" top: "lab" top: "pa"
          top: "pb" top: "py" top: "H" }
        layer { name: "sm" type: "Softmax" bottom: "lg" top: "prob" }
        layer { name: "l1" type: "SoftmaxWithLoss" bottom: "lg"
          bottom: "lab" top: "l1" }
        layer { name: "l2" type: "HingeLoss" bottom: "lg" bottom: "lab"
          top: "l2" hinge_loss_param { norm: L2 } }
        layer { name: "l3" type: "SigmoidCrossEntropyLoss" bottom: "pa"
          bottom: "py" top: "l3" }
        layer { name: "l4" type: "EuclideanLoss" bottom: "pa" bottom: "pb"
          top: "l4" }
        layer { name: "l5" type: "ContrastiveLoss" bottom: "pa"
          bottom: "pb" bottom: "lab" top: "l5"
          contrastive_loss_param { margin: 2 } }
        layer { name: "l6" type: "MultinomialLogisticLoss" bottom: "prob"
          bottom: "lab" top: "l6" }
        layer { name: "l7" type: "InfogainLoss" bottom: "prob"
          bottom: "lab" bottom: "H" top: "l7" }
        layer { name: "l8" type: "PairRankLoss" bottom: "pa" bottom: "pb"
          bottom: "lab" top: "l8" pair_rank_loss_param { margin: 0.5 } }
        layer { name: "ac" type: "Accuracy" bottom: "lg" bottom: "lab"
          top: "ac" }
        layer { name: "am" type: "ArgMax" bottom: "lg" top: "am" }
        layer { name: "ra" type: "RankAccuracy" bottom: "pa" bottom: "pb"
          bottom: "lab" top: "ra" }
        """
        rng = np.random.default_rng(4)
        n = 4
        ins = {"lg": jnp.asarray(rng.normal(size=(n, 2)).astype(np.float32)),
               "lab": jnp.asarray(rng.integers(0, 2, (n,))),
               "pa": jnp.asarray(rng.normal(size=(n, 1)).astype(np.float32)),
               "pb": jnp.asarray(rng.normal(size=(n, 1)).astype(np.float32)),
               "py": jnp.asarray(rng.integers(0, 2, (n, 1)).astype(
                   np.float32)),
               "H": jnp.eye(2, dtype=jnp.float32)}
        net = GraphNet(txt)
        params, state = net.init(jax.random.PRNGKey(0), ins)
        total, (blobs, _) = net.loss(params, state, ins)
        for k in ("l1", "l2", "l3", "l4", "l5", "l6", "l7", "l8"):
            assert np.isfinite(float(blobs[k])), k
        # identity infogain == multinomial logistic (infogain_loss_layer.cpp)
        np.testing.assert_allclose(blobs["l7"], blobs["l6"], atol=1e-6)
        # total = the 8 unit-weight losses (metrics contribute nothing)
        expect = sum(float(blobs[f"l{i}"]) for i in range(1, 9))
        assert float(total) == pytest.approx(expect, rel=1e-6)

    def test_filter_and_reindex(self):
        txt = """
        layer { name: "d" type: "Input" top: "x" top: "sel" top: "perm" }
        layer { name: "f" type: "Filter" bottom: "x" bottom: "sel"
          top: "fx" }
        layer { name: "br" type: "BatchReindex" bottom: "x" bottom: "perm"
          top: "bx" }
        """
        x = jnp.arange(12.0).reshape(4, 3)
        ins = {"x": x, "sel": jnp.asarray([1.0, 0.0, 1.0, 0.0]),
               "perm": jnp.asarray([3, 0])}
        blobs, _ = self._run(txt, ins)
        np.testing.assert_allclose(blobs["fx"][:2], x[jnp.asarray([0, 2])])
        np.testing.assert_allclose(blobs["bx"], x[jnp.asarray([3, 0])])

    def test_dummy_data_and_parameter(self):
        txt = """
        layer { name: "dd" type: "DummyData" top: "c"
          dummy_data_param { shape { dim: 2 dim: 3 }
            data_filler { type: "constant" value: 4 } } }
        layer { name: "pp" type: "Parameter" top: "w"
          parameter_param { shape { dim: 3 } } }
        layer { name: "sc" type: "Scale" bottom: "c" bottom: "w"
          top: "out" }
        layer { name: "si" type: "Silence" bottom: "out" }
        """
        net = GraphNet(txt)
        params, state = net.init(jax.random.PRNGKey(0), {})
        blobs, _ = net.apply(params, state, {})
        np.testing.assert_allclose(blobs["c"], jnp.full((2, 3), 4.0))
        assert params["pp"]["w"].shape == (3,)
        # Parameter blob is learnable: grads flow into it
        g = jax.grad(lambda p: jnp.sum(
            net.apply(p, state, {})[0]["out"]))(params)
        np.testing.assert_allclose(np.asarray(g["pp"]["w"]),
                                   np.full((3,), 8.0))

    def test_batchnorm_upstream(self):
        txt = """
        layer { name: "d" type: "Input" top: "x" }
        layer { name: "bn" type: "BatchNorm" bottom: "x" top: "bn" }
        """
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(2.0, 3.0, size=(16, 4)).astype(np.float32))
        net = GraphNet(txt)
        params, state = net.init(jax.random.PRNGKey(0), {"x": x})
        blobs, st = net.apply(params, state, {"x": x}, train=True)
        # train mode normalizes with batch stats
        np.testing.assert_allclose(np.mean(np.asarray(blobs["bn"]), axis=0),
                                   0.0, atol=1e-5)
        np.testing.assert_allclose(np.std(np.asarray(blobs["bn"]), axis=0),
                                   1.0, atol=1e-2)
        # eval mode uses the factor-normalized moving stats
        blobs2, _ = net.apply(params, st, {"x": x}, train=False)
        np.testing.assert_allclose(np.mean(np.asarray(blobs2["bn"]), axis=0),
                                   0.0, atol=1e-1)

    def test_caffemodel_interop_qa(self, tmp_path):
        """Weights saved through the GENERIC GraphNet spec load into the
        typed-family tree through the FAMILY spec — both speak the same
        reference format (Net::ToHDF5 / ToProto, net.cpp:847-913)."""
        from mms_answer_selection_tpu.utils import caffemodel as cm

        cfg = dataclasses.replace(M.V4, vocab_size=60, sim_dropout=0.0,
                                  fc1_dropout=0.0)
        net = GraphNet(net_prototxt_from_config(cfg), phase="train")
        batch = _qa_batch(np.random.default_rng(0), vocab=60)
        params, state = net.init(jax.random.PRNGKey(11), batch)
        specs = net.caffemodel_specs(params, state)
        by_name = dict((n, (r, s)) for n, r, s in specs)
        # every layer appears (ToHDF5 writes empty groups), shared marked
        assert by_name["w2v_a"][1] is True
        assert by_name["relu0"][0] == []
        for ext, save, load in (
                (".h5", cm.save_caffemodel_h5, cm.load_caffemodel_h5),
                (".caffemodel", cm.save_caffemodel_binaryproto,
                 cm.load_caffemodel_binaryproto)):
            path = str(tmp_path / f"gn{ext}")
            save(path, params, state, specs=specs)
            tp, ts = M.mms_qa_init(jax.random.PRNGKey(0), cfg)
            tp2, ts2, report = load(path, tp, ts)
            np.testing.assert_allclose(tp2["embed"]["w"],
                                       params["w2v_q"]["w"], atol=0)
            np.testing.assert_allclose(tp2["conv0"]["w"],
                                       params["conv0"]["w"], atol=0)
            np.testing.assert_allclose(tp2["fc1"]["w"],
                                       params["fc1"]["w"], atol=0)
            np.testing.assert_allclose(ts2["bn0"]["mean"],
                                       state["bn0"]["mean"], atol=0)

    def test_caffemodel_generic_roundtrip(self, tmp_path):
        """A net OUTSIDE every typed family (LSTM + PReLU + Scale + FM)
        round-trips .caffemodel through its own generic specs."""
        from mms_answer_selection_tpu.utils import caffemodel as cm

        txt = """
        layer { name: "d" type: "Input" top: "x" top: "q" }
        layer { name: "ls" type: "LSTM" bottom: "x" top: "ls"
          recurrent_param { num_output: 4
            weight_filler { type: "gaussian" std: 0.3 } } }
        layer { name: "pr" type: "PReLU" bottom: "ls" top: "pr" }
        layer { name: "fm" type: "FM" bottom: "q" top: "fm" }
        """
        rng = np.random.default_rng(7)
        ins = {"x": jnp.asarray(rng.normal(size=(5, 2, 3)).astype(
                   np.float32)),
               "q": jnp.asarray(rng.normal(size=(2, 3, 4)).astype(
                   np.float32))}
        net = GraphNet(txt)
        params, state = net.init(jax.random.PRNGKey(1), ins)
        params["fm"]["b"] = jnp.asarray(0.75)  # non-default scalar blob
        path = str(tmp_path / "gn.caffemodel")
        cm.save_caffemodel_binaryproto(
            path, params, state, specs=net.caffemodel_specs(params, state))
        # fresh init, restore, identical forward
        p2, s2 = net.init(jax.random.PRNGKey(99), ins)
        p3, s3, report = cm.load_caffemodel_binaryproto(
            path, p2, s2, specs=net.caffemodel_specs(p2, s2))
        for layer in ("ls", "pr", "fm"):
            for k in params[layer]:
                np.testing.assert_allclose(p3[layer][k], params[layer][k],
                                           atol=0, err_msg=f"{layer}/{k}")
        a, _ = net.apply(params, state, ins)
        b, _ = net.apply(p3, s3, ins)
        np.testing.assert_allclose(b["pr"], a["pr"], atol=0)
        np.testing.assert_allclose(b["fm"], a["fm"], atol=0)

    def test_embed_layer(self):
        txt = """
        layer { name: "d" type: "Input" top: "ids" }
        layer { name: "em" type: "Embed" bottom: "ids" top: "em"
          embed_param { num_output: 4 input_dim: 10
            weight_filler { type: "uniform" min: -1 max: 1 } } }
        """
        ins = {"ids": jnp.asarray([[1, 2], [3, 9]])}
        net = GraphNet(txt)
        params, state = net.init(jax.random.PRNGKey(0), ins)
        blobs, _ = net.apply(params, state, ins)
        w, b = params["em"]["w"], params["em"]["b"]
        np.testing.assert_allclose(blobs["em"][0, 0], w[1] + b, atol=1e-6)


class TestExtension:
    """The public layer-extension surface: register_layer (the
    REGISTER_LAYER_CLASS equivalent, layer_factory.hpp:56-141) and the
    Python layer type (python_layer.hpp) that resolves user callables
    from a prototxt."""

    def test_register_layer_custom_type(self):
        from mms_answer_selection_tpu.models import graph_net as G

        def scale_shift(ctx, node, bottoms):
            (x,) = bottoms
            w = ctx.param(node, "w", lambda k: jnp.ones((1,)) * 3.0)
            return x * w + 1.0

        G.register_layer("ScaleShiftX", scale_shift, param_keys=("w",))
        try:
            txt = """
            layer { name: "d" type: "Input" top: "x" }
            layer { name: "ss" type: "ScaleShiftX" bottom: "x" top: "y" }
            """
            ins = {"x": jnp.asarray([[1.0, 2.0]])}
            net = GraphNet(txt)
            params, state = net.init(jax.random.PRNGKey(0), ins)
            assert list(params["ss"]) == ["w"]
            blobs, _ = net.apply(params, state, ins)
            np.testing.assert_allclose(blobs["y"], [[4.0, 7.0]], atol=1e-6)
            # gradients flow through the registered blob
            g = jax.grad(lambda p: float(0) + jnp.sum(
                net.apply(p, state, ins)[0]["y"]))(params)
            np.testing.assert_allclose(g["ss"]["w"], [3.0], atol=1e-6)
        finally:
            G._REGISTRY.pop("ScaleShiftX")

    def test_register_layer_duplicate_raises(self):
        from mms_answer_selection_tpu.models import graph_net as G
        with pytest.raises(ValueError, match="already registered"):
            G.register_layer("ReLU", lambda ctx, node, bottoms: bottoms[0])

    def test_python_layer_function(self):
        import sys
        import types

        mod = types.ModuleType("_gn_pylayer_mod")
        mod.double = lambda x: x * 2.0
        sys.modules["_gn_pylayer_mod"] = mod
        try:
            txt = """
            layer { name: "d" type: "Input" top: "x" }
            layer { name: "py" type: "Python" bottom: "x" top: "y"
              python_param { module: "_gn_pylayer_mod" layer: "double" } }
            """
            ins = {"x": jnp.asarray([[1.0, -2.0]])}
            net = GraphNet(txt)
            params, state = net.init(jax.random.PRNGKey(0), ins)
            blobs, _ = net.apply(params, state, ins)
            np.testing.assert_allclose(blobs["y"], [[2.0, -4.0]])
        finally:
            del sys.modules["_gn_pylayer_mod"]

    def test_python_layer_class_with_param_str(self):
        import sys
        import types

        class AffineLayer:
            def __init__(self, param_str=None):
                self.scale = float(param_str) if param_str else 1.0

            def forward(self, x):
                return x * self.scale

        mod = types.ModuleType("_gn_pylayer_mod2")
        mod.AffineLayer = AffineLayer
        sys.modules["_gn_pylayer_mod2"] = mod
        try:
            txt = """
            layer { name: "d" type: "Input" top: "x" }
            layer { name: "py" type: "Python" bottom: "x" top: "y"
              python_param { module: "_gn_pylayer_mod2"
                layer: "AffineLayer" param_str: "2.5" } }
            """
            ins = {"x": jnp.asarray([2.0, 4.0])}
            net = GraphNet(txt)
            params, state = net.init(jax.random.PRNGKey(0), ins)
            blobs, _ = net.apply(params, state, ins)
            np.testing.assert_allclose(blobs["y"], [5.0, 10.0])
        finally:
            del sys.modules["_gn_pylayer_mod2"]

    def test_python_layer_missing_module_field(self):
        txt = """
        layer { name: "d" type: "Input" top: "x" }
        layer { name: "py" type: "Python" bottom: "x" top: "y"
          python_param { layer: "f" } }
        """
        net = GraphNet(txt)
        with pytest.raises(ValueError, match="python_param"):
            net.init(jax.random.PRNGKey(0), {"x": jnp.zeros((1,))})


class TestDeclaredInputShapes:
    """Deploy-style input shape declarations (net.cpp:47-69 input
    handling; input_layer.cpp:9-25) feed `qa time --model`."""

    def test_net_level_input_shape(self):
        txt = """
        input: "data"
        input_shape { dim: 2 dim: 3 dim: 8 dim: 8 }
        layer { name: "r" type: "ReLU" bottom: "data" top: "out" }
        """
        net = GraphNet(txt)
        # caffe NCHW (2,3,8,8) -> our NHWC (2,8,8,3)
        assert net.declared_input_shapes() == {"data": (2, 8, 8, 3)}
        assert net.declared_input_shapes(nhwc=False) == {
            "data": (2, 3, 8, 8)}

    def test_legacy_input_dim(self):
        txt = """
        input: "a"
        input: "b"
        input_dim: 1
        input_dim: 2
        input_dim: 4
        input_dim: 4
        input_dim: 1
        input_dim: 2
        input_dim: 4
        input_dim: 4
        layer { name: "e" type: "Eltwise" bottom: "a" bottom: "b"
                top: "s" }
        """
        net = GraphNet(txt)
        shapes = net.declared_input_shapes()
        assert shapes == {"a": (1, 4, 4, 2), "b": (1, 4, 4, 2)}

    def test_input_layer_shapes(self):
        # one shape per top; a single shape broadcasts to all tops
        # (input_layer.cpp:16-24)
        txt = """
        layer { name: "in" type: "Input" top: "x" top: "y"
          input_param { shape { dim: 5 dim: 7 } } }
        layer { name: "e" type: "Eltwise" bottom: "x" bottom: "y"
                top: "s" }
        """
        net = GraphNet(txt)
        assert net.declared_input_shapes() == {
            "x": (5, 7), "y": (5, 7)}

    def test_undeclared_absent(self):
        txt = 'layer { name: "in" type: "Input" top: "x" }\n' \
              'layer { name: "r" type: "ReLU" bottom: "x" top: "y" }'
        assert GraphNet(txt).declared_input_shapes() == {}

    def test_embed_accepts_float_ids(self):
        # caffe blobs are float; EmbedLayer casts values to indices
        # (embed_layer.cpp:107) — declared float inputs must still feed
        # Embed
        txt = """
        input: "ids"
        input_shape { dim: 2 dim: 3 }
        layer { name: "emb" type: "Embed" bottom: "ids" top: "v"
          embed_param { input_dim: 10 num_output: 4
            weight_filler { type: "uniform" min: -1 max: 1 } } }
        """
        net = GraphNet(txt)
        ids_f = jnp.asarray([[1.0, 2.0, 3.0], [4.0, 0.0, 9.0]])
        params, state = net.init(jax.random.PRNGKey(0), {"ids": ids_f})
        blobs_f, _ = net.apply(params, state, {"ids": ids_f})
        blobs_i, _ = net.apply(params, state,
                               {"ids": ids_f.astype(jnp.int32)})
        np.testing.assert_allclose(blobs_f["v"], blobs_i["v"])


class TestTimeModelCLI:
    def test_qa_time_model(self, tmp_path, capsys):
        """`qa time --model` ≙ `caffe time --model` on ANY prototxt
        (tools/caffe.cpp:301-387)."""
        import json

        from mms_answer_selection_tpu.cli import main

        txt = """
        input: "x"
        input_shape { dim: 4 dim: 6 }
        input: "label"
        input_shape { dim: 4 }
        layer { name: "fc" type: "InnerProduct" bottom: "x" top: "fc"
          inner_product_param { num_output: 3
            weight_filler { type: "xavier" } } }
        layer { name: "loss" type: "SoftmaxWithLoss" bottom: "fc"
          bottom: "label" top: "loss" }
        """
        (tmp_path / "net.prototxt").write_text(txt)
        main(["time", "--model", str(tmp_path / "net.prototxt"),
              "--iters", "2"])
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["full_forward_ms"] > 0
        assert out["full_forward_backward_ms"] >= out["full_forward_ms"] * 0

    def test_qa_time_model_missing_shapes(self, tmp_path):
        from mms_answer_selection_tpu.cli import main

        (tmp_path / "net.prototxt").write_text(
            'layer { name: "in" type: "Input" top: "x" }\n'
            'layer { name: "r" type: "ReLU" bottom: "x" top: "y" }\n')
        with pytest.raises(SystemExit, match="declares no shapes"):
            main(["time", "--model", str(tmp_path / "net.prototxt"),
                  "--iters", "1"])


class TestAdviceRound3:
    """Regression pins for the round-3 advisor findings (ADVICE.md)."""

    def test_two_bottom_scale_bias_is_blob_zero(self, tmp_path):
        """Two-bottom Scale with bias_term=true: the ONLY learned blob
        is the bias, stored at caffemodel blob index 0
        (scale_layer.cpp LayerSetUp: the scale is bottom[1], so
        this->blobs_ holds just the bias)."""
        txt = """
        layer { name: "x" type: "Input" top: "x" }
        layer { name: "s" type: "Input" top: "s" }
        layer { name: "sc" type: "Scale" bottom: "x" bottom: "s" top: "y"
          scale_param { bias_term: true } }
        """
        net = GraphNet(txt)
        ins = {"x": jnp.ones((2, 3)), "s": jnp.full((3,), 2.0)}
        params, state = net.init(jax.random.PRNGKey(0), ins)
        assert "bias" in params["sc"] and "scale" not in params["sc"]
        rows = next(r for name, r, _ in
                    net.caffemodel_specs(params, state) if name == "sc")
        assert [r[0] for r in rows] == [0]
        assert rows[0][2] == ("sc", "bias")
        # survives a binaryproto round trip
        from mms_answer_selection_tpu.utils.caffemodel import (
            load_caffemodel_binaryproto, save_caffemodel_binaryproto)
        params["sc"]["bias"] = jnp.asarray([1.0, 2.0, 3.0])
        path = str(tmp_path / "sc.caffemodel")
        save_caffemodel_binaryproto(
            path, params, state, specs=net.caffemodel_specs(params, state))
        p2, s2 = net.init(jax.random.PRNGKey(9), ins)
        p2, s2, _ = load_caffemodel_binaryproto(
            path, p2, s2, specs=net.caffemodel_specs(p2, s2))
        np.testing.assert_allclose(np.asarray(p2["sc"]["bias"]),
                                   [1.0, 2.0, 3.0])

    def test_conv_repeated_kernel_size_is_per_axis(self):
        """kernel_size: 3 kernel_size: 5 means kh=3, kw=5 —
        base_conv_layer.cpp reads repeated spatial fields per-axis,
        not last-wins."""
        txt = """
        layer { name: "x" type: "Input" top: "x" }
        layer { name: "cv" type: "Convolution" bottom: "x" top: "y"
          convolution_param { num_output: 4
            kernel_size: 3 kernel_size: 5 stride: 1 stride: 2
            weight_filler { type: "xavier" } } }
        """
        net = GraphNet(txt)
        x = jnp.zeros((1, 10, 11, 2))
        params, state = net.init(jax.random.PRNGKey(0), {"x": x})
        assert params["cv"]["w"].shape == (3, 5, 2, 4)
        blobs, _ = net.apply(params, state, {"x": x})
        # H: (10-3)/1+1 = 8;  W: (11-5)/2+1 = 4
        assert blobs["y"].shape == (1, 8, 4, 4)

    def test_dummy_data_4d_shape_is_nchw(self):
        """A 4-D DummyData shape declaration is caffe NCHW and must
        land NHWC here, exactly like net-level input_shape — else
        downstream convs silently read C=W."""
        txt = """
        layer { name: "dd" type: "DummyData" top: "d"
          dummy_data_param { shape { dim: 2 dim: 3 dim: 8 dim: 6 }
            data_filler { type: "constant" value: 1 } } }
        layer { name: "cv" type: "Convolution" bottom: "d" top: "y"
          convolution_param { num_output: 5 kernel_size: 3
            weight_filler { type: "xavier" } } }
        """
        net = GraphNet(txt)
        params, state = net.init(jax.random.PRNGKey(0), {})
        blobs, _ = net.apply(params, state, {})
        assert blobs["d"].shape == (2, 8, 6, 3)
        assert params["cv"]["w"].shape == (3, 3, 3, 5)
        assert blobs["y"].shape == (2, 6, 4, 5)


class TestLSTMUnit:
    def test_standalone_prototxt_type(self):
        """LSTMUnit (lstm_unit_layer.cpp) as a directly-named prototxt
        type: one parameter-free cell step, gate order i,f,o,g."""
        txt = """
        layer { name: "c0" type: "Input" top: "c_prev" }
        layer { name: "x0" type: "Input" top: "x" }
        layer { name: "ct" type: "Input" top: "cont" }
        layer { name: "u" type: "LSTMUnit" bottom: "c_prev" bottom: "x"
          bottom: "cont" top: "c" top: "h" }
        """
        rng = np.random.default_rng(4)
        n, hdim = 3, 4
        c_prev = rng.normal(size=(1, n, hdim)).astype(np.float32)
        x = rng.normal(size=(1, n, 4 * hdim)).astype(np.float32)
        cont = np.asarray([[1.0, 0.0, 1.0]], np.float32)
        net = GraphNet(txt)
        ins = {"c_prev": jnp.asarray(c_prev), "x": jnp.asarray(x),
               "cont": jnp.asarray(cont)}
        params, state = net.init(jax.random.PRNGKey(0), ins)
        assert params == {}  # parameter-free
        blobs, _ = net.apply(params, state, ins)

        def sig(v):
            return 1.0 / (1.0 + np.exp(-v))

        i, f, o, g = np.split(x, 4, axis=-1)
        c = cont[..., None] * sig(f) * c_prev + sig(i) * np.tanh(g)
        h = sig(o) * np.tanh(c)
        np.testing.assert_allclose(np.asarray(blobs["c"]), c, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(blobs["h"]), h, rtol=1e-5)

    def test_matches_lstm_apply_step(self):
        """Composing the unit with the fused gate linear reproduces one
        lstm_apply step (lstm_layer.cpp's unrolled net IS this
        composition)."""
        from mms_answer_selection_tpu.ops.recurrent import (lstm_apply,
                                                            lstm_init)

        rng = np.random.default_rng(5)
        d, hdim, n = 5, 4, 3
        params = lstm_init(jax.random.PRNGKey(1), d, hdim)
        x_seq = rng.normal(size=(1, n, d)).astype(np.float32)
        out, _ = lstm_apply(params, jnp.asarray(x_seq))

        gates = x_seq[0] @ np.asarray(params["wx"]) \
            + np.asarray(params["b"])  # h0 = 0 -> no wh term
        txt = """
        layer { name: "c0" type: "Input" top: "c_prev" }
        layer { name: "x0" type: "Input" top: "x" }
        layer { name: "u" type: "LSTMUnit" bottom: "c_prev" bottom: "x"
          top: "c" top: "h" }
        """
        net = GraphNet(txt)
        ins = {"c_prev": jnp.zeros((1, n, hdim)),
               "x": jnp.asarray(gates[None])}
        p, s = net.init(jax.random.PRNGKey(0), ins)
        blobs, _ = net.apply(p, s, ins)
        np.testing.assert_allclose(np.asarray(blobs["h"]),
                                   np.asarray(out), rtol=1e-5)


class TestZooParityRound4:
    """Parity fixes from the round-4 graph_net/zoo review."""

    def _run(self, txt, ins):
        net = GraphNet(txt)
        params, state = net.init(jax.random.PRNGKey(0), ins)
        blobs, _ = net.apply(params, state, ins)
        return blobs

    def test_argmax_flatten_nchw_and_out_max_val(self):
        txt = """
        layer { name: "x" type: "Input" top: "x" }
        layer { name: "am" type: "ArgMax" bottom: "x" top: "am"
          argmax_param { top_k: 2 out_max_val: true } }
        """
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 3, 4, 5)).astype(np.float32)  # NHWC
        blobs = self._run(txt, {"x": jnp.asarray(x)})
        out = np.asarray(blobs["am"])
        assert out.shape == (2, 2, 2)  # (N, [idx, val], k)
        nchw = np.transpose(x, (0, 3, 1, 2)).reshape(2, -1)
        for i in range(2):
            order = np.argsort(-nchw[i])[:2]
            np.testing.assert_array_equal(out[i, 0], order)
            np.testing.assert_allclose(out[i, 1], nchw[i][order],
                                       rtol=1e-6)

    def test_argmax_axis_out_max_val_returns_values(self):
        txt = """
        layer { name: "x" type: "Input" top: "x" }
        layer { name: "am" type: "ArgMax" bottom: "x" top: "am"
          argmax_param { top_k: 1 out_max_val: true axis: 1 } }
        """
        x = np.asarray([[1.0, 5.0, 3.0], [7.0, 2.0, 4.0]], np.float32)
        blobs = self._run(txt, {"x": jnp.asarray(x)})
        np.testing.assert_allclose(np.asarray(blobs["am"]).ravel(),
                                   [5.0, 7.0])

    def test_reduction_trailing_nchw_axes(self):
        txt = """
        layer { name: "x" type: "Input" top: "x" }
        layer { name: "r" type: "Reduction" bottom: "x" top: "r"
          reduction_param { axis: 2 } }
        """
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 3, 4, 5)).astype(np.float32)  # NHWC
        blobs = self._run(txt, {"x": jnp.asarray(x)})
        # caffe axis 2 on NCHW = reduce {H, W} -> (N, C)
        want = np.transpose(x, (0, 3, 1, 2)).sum(axis=(2, 3))
        assert blobs["r"].shape == (2, 5)
        np.testing.assert_allclose(np.asarray(blobs["r"]), want,
                                   rtol=1e-5)

    def test_reduction_negative_axis(self):
        from mms_answer_selection_tpu.ops import zoo

        x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(3, 4))
        np.testing.assert_allclose(
            np.asarray(zoo.reduction(x, axis=-1)),
            np.arange(12, dtype=np.float32).reshape(3, 4).sum(1))

    def test_eltwise_coeff_count_checked(self):
        txt = """
        layer { name: "a" type: "Input" top: "a" }
        layer { name: "b" type: "Input" top: "b" }
        layer { name: "e" type: "Eltwise" bottom: "a" bottom: "b"
          top: "e" eltwise_param { operation: SUM coeff: 2.0 } }
        """
        with pytest.raises(ValueError, match="coeff"):
            self._run(txt, {"a": jnp.ones((2, 3)),
                            "b": jnp.ones((2, 3))})

    def test_dummy_data_single_shape_broadcasts(self):
        txt = """
        layer { name: "dd" type: "DummyData" top: "a" top: "b"
          dummy_data_param { shape { dim: 2 dim: 3 }
            data_filler { type: "constant" value: 1 } } }
        layer { name: "s" type: "Eltwise" bottom: "a" bottom: "b"
          top: "s" eltwise_param { operation: SUM } }
        """
        blobs = self._run(txt, {})
        np.testing.assert_allclose(np.asarray(blobs["s"]),
                                   np.full((2, 3), 2.0))

    def test_two_bottom_scale_axis0(self):
        """Scale with bottom[1] = (N,) at axis 0: per-sample scaling
        (scale_layer.cpp's axis/num_axes broadcast)."""
        txt = """
        layer { name: "x" type: "Input" top: "x" }
        layer { name: "s" type: "Input" top: "s" }
        layer { name: "sc" type: "Scale" bottom: "x" bottom: "s"
          top: "y" scale_param { axis: 0 } }
        """
        rng = np.random.default_rng(2)
        x = rng.normal(size=(3, 2, 2, 4)).astype(np.float32)
        sv = np.asarray([2.0, -1.0, 0.5], np.float32)
        blobs = self._run(txt, {"x": jnp.asarray(x), "s": jnp.asarray(sv)})
        np.testing.assert_allclose(np.asarray(blobs["y"]),
                                   x * sv[:, None, None, None], rtol=1e-6)

    def test_stage_rule_rejected(self):
        txt = """
        layer { name: "x" type: "Input" top: "x"
          include { stage: "multi-gpu" } }
        """
        with pytest.raises(ValueError, match="stage"):
            GraphNet(txt)


class TestCaffemodelSpecsZoo:
    """caffemodel_specs rows for the blob-bearing layer types the QA
    family doesn't use: Deconvolution, Scale (learned and two-bottom),
    Bias, Parameter, SimMatrix, BatchNorm (net.cpp:847-913 ToProto
    conventions per layer)."""

    NET = """
name: "interopzoo"
layer { name: "in" type: "Input" top: "x"
  input_param { shape { dim: 2 dim: 3 dim: 4 dim: 4 } } }
layer { name: "inq" type: "Input" top: "q"
  input_param { shape { dim: 2 dim: 5 } } }
layer { name: "inr" type: "Input" top: "r"
  input_param { shape { dim: 2 dim: 5 } } }
layer { name: "pvec" type: "Parameter" top: "pv"
  parameter_param { shape { dim: 2 } } }
layer { name: "dc" type: "Deconvolution" bottom: "x" top: "dx"
  convolution_param { num_output: 2 kernel_size: 2 stride: 2
    weight_filler { type: "gaussian" std: 0.5 } } }
layer { name: "bnm" type: "BatchNorm" bottom: "dx" top: "bx" }
layer { name: "sc" type: "Scale" bottom: "bx" top: "sx"
  scale_param { bias_term: true
    filler { type: "gaussian" std: 1.0 }
    bias_filler { type: "gaussian" std: 1.0 } } }
layer { name: "sc2" type: "Scale" bottom: "sx" bottom: "pv" top: "s2"
  scale_param { bias_term: true
    bias_filler { type: "gaussian" std: 1.0 } } }
layer { name: "bi" type: "Bias" bottom: "s2" top: "bz"
  bias_param { filler { type: "gaussian" std: 1.0 } } }
layer { name: "sm" type: "SimMatrix" bottom: "q" bottom: "r" top: "s"
  sim_matrix_param { weight_filler { type: "gaussian" std: 1.0 } } }
"""

    def _randomize(self, tree, rng):
        if isinstance(tree, dict):
            return {k: self._randomize(v, rng) for k, v in tree.items()}
        arr = np.asarray(tree)
        return jnp.asarray(rng.normal(size=arr.shape).astype(arr.dtype)
                           if np.issubdtype(arr.dtype, np.floating)
                           else arr)

    @pytest.mark.parametrize("fmt", ["h5", "binaryproto"])
    def test_roundtrip(self, tmp_path, fmt):
        from mms_answer_selection_tpu.utils import caffemodel as cm

        rng = np.random.default_rng(7)
        ins = {"x": jnp.asarray(rng.normal(size=(2, 4, 4, 3)),
                                jnp.float32),
               "q": jnp.asarray(rng.normal(size=(2, 5)), jnp.float32),
               "r": jnp.asarray(rng.normal(size=(2, 5)), jnp.float32)}
        net = GraphNet(self.NET, phase="train")
        params, state = net.init(jax.random.PRNGKey(0), ins)
        # make every leaf distinctive so the round-trip is a real check
        params = self._randomize(params, rng)
        state = self._randomize(state, rng)

        # spec sanity: two-bottom Scale stores ONLY its bias, at index 0
        by_name = {n: rows for n, rows, _ in
                   net.caffemodel_specs(params, state)}
        assert [r[0] for r in by_name["sc2"]] == [0]
        assert by_name["sc2"][0][2][1] == "bias"
        assert [r[0] for r in by_name["sc"]] == [0, 1]
        assert [r[0] for r in by_name["bnm"]] == [0, 1, 2]  # mean/var/factor
        assert [r[0] for r in by_name["bi"]] == [0]
        assert [r[0] for r in by_name["pvec"]] == [0]
        assert [r[0] for r in by_name["sm"]] == [0]

        save = (cm.save_caffemodel_h5 if fmt == "h5"
                else cm.save_caffemodel_binaryproto)
        load = (cm.load_caffemodel_h5 if fmt == "h5"
                else cm.load_caffemodel_binaryproto)
        path = str(tmp_path / f"zoo.{fmt}")
        save(path, params, state, specs=net.caffemodel_specs(params, state))

        p2, s2 = net.init(jax.random.PRNGKey(99), ins)
        p3, s3, report = load(path, p2, s2,
                              specs=net.caffemodel_specs(p2, s2))
        for layer in params:
            for k in params[layer]:
                np.testing.assert_allclose(
                    p3[layer][k], params[layer][k], atol=0,
                    err_msg=f"params {layer}/{k}")
        for layer in state:
            for k in state[layer]:
                np.testing.assert_allclose(
                    s3[layer][k], state[layer][k], atol=0,
                    err_msg=f"state {layer}/{k}")
        # restored net computes the identical forward
        a, _ = net.apply(params, state, ins)
        b, _ = net.apply(p3, s3, ins)
        for top in a:
            np.testing.assert_allclose(np.asarray(b[top]),
                                       np.asarray(a[top]), atol=0,
                                       err_msg=top)
