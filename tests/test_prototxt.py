"""prototxt ingestion: the reference's SolverParameter text format ->
SolverConfig/TrainerConfig (upgrade path for migrating users)."""

import pytest

from mms_answer_selection_tpu.utils.prototxt import (
    parse_prototxt,
    solver_config_from_prototxt,
    trainer_config_from_prototxt,
)

# the shape the QA driver writes via str(SolverParameter()),
# do_trec_qa_clean.py:322-348 field set
DRIVER_STYLE = """
train_net: "run/train.prototxt"
test_net: "run/dev.prototxt"
test_iter: 23
test_interval: 100
base_lr: 1.0
display: 20
max_iter: 40001
lr_policy: "fixed"
momentum: 0.95
weight_decay: 0.0005
snapshot: 100
snapshot_prefix: "run/qa"
random_seed: 22
delta: 5e-07
type: "AdaDelta"
"""


class TestParser:
    def test_scalars_strings_repeats(self):
        d = parse_prototxt(DRIVER_STYLE)
        assert d["train_net"] == "run/train.prototxt"
        assert d["base_lr"] == 1.0
        assert d["max_iter"] == 40001
        assert d["delta"] == 5e-07
        assert d["type"] == "AdaDelta"

    def test_nested_and_enum_and_comments(self):
        d = parse_prototxt("""
        # a NetStateRule block, like FilterNet consumes
        layer {
          name: "data"
          include { phase: TRAIN }
        }
        layer {
          name: "loss"
          loss_weight: 1.0
        }
        solver_type: ADADELTA
        stepvalue: 10
        stepvalue: 20
        """)
        assert isinstance(d["layer"], list) and len(d["layer"]) == 2
        assert d["layer"][0]["include"]["phase"] == "TRAIN"
        assert d["solver_type"] == "ADADELTA"
        assert d["stepvalue"] == [10, 20]

    def test_unbalanced_braces_rejected(self):
        with pytest.raises(ValueError):
            parse_prototxt("a { b: 1")


class TestSolverMapping:
    def test_driver_style(self):
        cfg, ex = solver_config_from_prototxt(DRIVER_STYLE)
        assert cfg.solver_type == "adadelta"
        assert cfg.base_lr == 1.0 and cfg.momentum == 0.95
        assert cfg.delta == 5e-07 and cfg.weight_decay == 5e-4
        assert cfg.lr_policy == "fixed"
        assert ex["test_interval"] == 100 and ex["snapshot"] == 100
        assert ex["random_seed"] == 22

    def test_legacy_enum_and_steps(self):
        cfg, _ = solver_config_from_prototxt("""
        solver_type: RMSPROP
        rms_decay: 0.9
        lr_policy: "multistep"
        stepvalue: 5000
        stepvalue: 9000
        gamma: 0.5
        """)
        assert cfg.solver_type == "rmsprop" and cfg.rms_decay == 0.9
        assert cfg.stepvalues == (5000, 9000) and cfg.gamma == 0.5

    def test_trainer_config(self):
        tcfg = trainer_config_from_prototxt(DRIVER_STYLE,
                                            snapshot_dir="/tmp/x")
        assert tcfg.max_iter == 40001
        assert tcfg.test_interval == 100
        assert tcfg.snapshot_interval == 100
        assert tcfg.seed == 22
        assert tcfg.snapshot_prefix == "qa"
        assert tcfg.snapshot_dir == "/tmp/x"
        assert tcfg.solver.solver_type == "adadelta"

    def test_unknown_type_rejected(self):
        with pytest.raises(ValueError):
            solver_config_from_prototxt('type: "Ftrl"')


class TestCLI:
    def test_train_with_solver_prototxt(self, tmp_path, capsys):
        import json as _json

        import numpy as np

        from mms_answer_selection_tpu.cli import main
        from mms_answer_selection_tpu.data import (
            prepare_trec_qa, save_dataset, synthetic_corpus)

        xml, w2v = synthetic_corpus(n_questions=6, answers_per_q=4, seed=2)
        splits, info = prepare_trec_qa(xml, xml, xml, w2v)
        data_dir = tmp_path / "prepped"
        data_dir.mkdir()
        for name, split in splits.items():
            save_dataset(str(data_dir / f"{name}.npz"), split)
        np.savez_compressed(str(data_dir / "vocab.npz"),
                            pretrained=info["pretrained"],
                            words=np.asarray(list(info["vocab"])))
        with open(data_dir / "meta.json", "w") as f:
            _json.dump({"vocab_size": info["vocab_size"],
                        "unknown_idx": info["unknown_idx"],
                        "pad_idx": info["pad_idx"], "dim": 50,
                        "q_len": 40, "a_len": 40}, f)
        sp = tmp_path / "solver.prototxt"
        sp.write_text(DRIVER_STYLE.replace("max_iter: 40001",
                                           "max_iter: 3"))
        exp = tmp_path / "run"
        main(["train", "--data", str(data_dir), "--exp", str(exp),
              "--solver-prototxt", str(sp)])
        with open(exp / "config.json") as f:
            saved = _json.load(f)
        txt = _json.dumps(saved)
        assert '"adadelta"' in txt and '"max_iter": 3' in txt


# a NetSpec-printed V4 train net (the exact field set network_v4 emits,
# do_trec_qa_clean.py:452-498), hand-rendered in protobuf text format
V4_NET = """
layer { name: "data" type: "HDF5Data" top: "question" top: "answer"
  top: "label" top: "overlap_feat"
  hdf5_data_param { source: "train.txt" batch_size: 50 shuffle: true } }
layer { name: "w2v_q" type: "Embed" bottom: "question" top: "w2v_q"
  param { name: "w2v-weights" lr_mult: 1 decay_mult: 0 }
  param { name: "w2v-bias" lr_mult: 2 decay_mult: 0 }
  embed_param { num_output: 50 input_dim: 19804
    weight_filler { type: "uniform" min: -0.08 max: 0.08 } } }
layer { name: "w2v_a" type: "Embed" bottom: "answer" top: "w2v_a"
  param { name: "w2v-weights" lr_mult: 1 decay_mult: 0 }
  param { name: "w2v-bias" lr_mult: 2 decay_mult: 0 }
  embed_param { num_output: 50 input_dim: 19804 } }
layer { name: "sim_cross" type: "SimCross" bottom: "w2v_q" bottom: "w2v_a"
  top: "sim_cross" param { name: "embed-weights" decay_mult: 1 lr_mult: 1 }
  sim_cross_param { dist_mode: 2 mesure_count: 4 bias_term: true } }
layer { name: "sim_drop" type: "Dropout" bottom: "sim_cross"
  top: "sim_drop" dropout_param { dropout_ratio: 0.1 } }
layer { name: "conv0" type: "Convolution" bottom: "sim_drop" top: "conv0"
  convolution_param { kernel_h: 5 kernel_w: 5 stride: 1 num_output: 32 } }
layer { name: "bn0" type: "BN" bottom: "conv0" top: "bn0"
  bn_param { scale_filler { type: "constant" value: 1 }
             shift_filler { type: "constant" value: 0.001 } } }
layer { name: "pool0" type: "Pooling" bottom: "bn0" top: "pool0"
  pooling_param { pool: AVE kernel_h: 4 kernel_w: 4 stride_h: 4
                  stride_w: 4 } }
layer { name: "relu0" type: "TanH" bottom: "pool0" top: "pool0" }
layer { name: "conv1" type: "Convolution" bottom: "pool0" top: "conv1"
  convolution_param { kernel_h: 5 kernel_w: 5 stride: 1 num_output: 64 } }
layer { name: "bn1" type: "BN" bottom: "conv1" top: "bn1" }
layer { name: "pool1" type: "Pooling" bottom: "bn1" top: "pool1"
  pooling_param { pool: AVE kernel_h: 5 kernel_w: 5 stride_h: 1
                  stride_w: 1 } }
layer { name: "relu1" type: "TanH" bottom: "pool1" top: "pool1" }
layer { name: "flt" type: "Flatten" bottom: "pool1" top: "flt" }
layer { name: "feat" type: "Concat" bottom: "flt" bottom: "overlap_feat"
  top: "feat" concat_param { concat_dim: 1 } }
layer { name: "fc1" type: "InnerProduct" bottom: "feat" top: "fc1"
  inner_product_param { num_output: 32 weight_filler { type: "xavier" } } }
layer { name: "relu2" type: "TanH" bottom: "fc1" top: "fc1" }
layer { name: "drop1" type: "Dropout" bottom: "fc1" top: "fc1"
  dropout_param { dropout_ratio: 0.5 } }
layer { name: "fc2" type: "InnerProduct" bottom: "fc1" top: "fc2"
  inner_product_param { num_output: 2 } }
layer { name: "loss" type: "SoftmaxWithLoss" bottom: "fc2" bottom: "label"
  top: "loss" }
"""


class TestNetPrototxt:
    def test_v4_net_recovers_the_v4_config(self):
        from mms_answer_selection_tpu.models.mms_qa import V4
        from mms_answer_selection_tpu.utils.prototxt import (
            model_config_from_net_prototxt)
        import dataclasses as dc
        cfg = model_config_from_net_prototxt(V4_NET)
        expect = dc.replace(V4, vocab_size=19804, embed_dim=50)
        assert cfg == expect  # blocks, sim params, dropouts, fc dims, all

    def test_derived_config_actually_runs(self):
        import jax
        import numpy as np
        from mms_answer_selection_tpu.models.mms_qa import (
            mms_qa_apply, mms_qa_init)
        from mms_answer_selection_tpu.utils.prototxt import (
            model_config_from_net_prototxt)
        cfg = model_config_from_net_prototxt(V4_NET, vocab_size=50)
        params, state = mms_qa_init(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        batch = {"question": rng.integers(0, 50, (2, 40)).astype(np.int32),
                 "answer": rng.integers(0, 50, (2, 40)).astype(np.int32),
                 "overlap_feat": rng.random((2, 2)).astype(np.float32),
                 "label": rng.integers(0, 2, (2,)).astype(np.int32)}
        out, _ = mms_qa_apply(params, state, batch, cfg, train=False)
        assert np.isfinite(float(out["loss"]))

    def test_non_mms_net_rejected(self):
        from mms_answer_selection_tpu.utils.prototxt import (
            model_config_from_net_prototxt)
        with pytest.raises(ValueError, match="MMS-family"):
            model_config_from_net_prototxt("""
            layer { name: "d" type: "Input" top: "x" }
            layer { name: "ip" type: "InnerProduct" bottom: "x" top: "y"
              inner_product_param { num_output: 10 } }
            """)


class TestExport:
    def test_net_roundtrip_all_presets(self):
        """config -> prototxt -> config is the identity for every
        reference model variant."""
        import dataclasses as dc

        from mms_answer_selection_tpu.models.mms_qa import (
            V3, V4, V4_2, V5, V4_WIDE)
        from mms_answer_selection_tpu.utils.prototxt import (
            model_config_from_net_prototxt, net_prototxt_from_config)
        for preset in (V3, V4, V4_2, V5, V4_WIDE):
            cfg = dc.replace(preset, vocab_size=1234)
            text = net_prototxt_from_config(cfg)
            back = model_config_from_net_prototxt(
                text, question_len=cfg.question_len,
                answer_len=cfg.answer_len)
            assert back == cfg, preset

    def test_solver_roundtrip(self):
        from mms_answer_selection_tpu.training import (
            SolverConfig, TrainerConfig)
        from mms_answer_selection_tpu.utils.prototxt import (
            solver_prototxt_from_config, trainer_config_from_prototxt)
        tcfg = TrainerConfig(
            solver=SolverConfig(solver_type="adadelta", base_lr=1.0,
                                momentum=0.95, delta=5e-7,
                                weight_decay=5e-4, clip_gradients=3.0),
            max_iter=40001, test_interval=100, snapshot_interval=100,
            seed=22)
        text = solver_prototxt_from_config(tcfg)
        back = trainer_config_from_prototxt(text)
        assert back.solver == tcfg.solver
        assert back.max_iter == tcfg.max_iter
        assert back.test_interval == tcfg.test_interval
        assert back.snapshot_interval == tcfg.snapshot_interval
        assert back.seed == tcfg.seed

    def test_eval_net_has_metric_heads(self):
        from mms_answer_selection_tpu.models.mms_qa import V4
        from mms_answer_selection_tpu.utils.prototxt import (
            net_prototxt_from_config, parse_prototxt)
        text = net_prototxt_from_config(V4, phase="eval")
        d = parse_prototxt(text)
        types = [la["type"] for la in d["layer"]]
        assert "MRR" in types and "MAP" in types and "AUC" in types
        assert 'top: "group"' in text


class TestConvertPrototxtCLI:
    def test_export_trio_roundtrips(self, tmp_path):
        import dataclasses as dc
        import json as _json

        from mms_answer_selection_tpu.cli import main
        from mms_answer_selection_tpu.models.mms_qa import V4
        from mms_answer_selection_tpu.training import (
            SolverConfig, TrainerConfig)
        from mms_answer_selection_tpu.utils.config import experiment_to_json
        from mms_answer_selection_tpu.utils.prototxt import (
            model_config_from_net_prototxt, trainer_config_from_prototxt)

        model_cfg = dc.replace(V4, vocab_size=777)
        trainer_cfg = TrainerConfig(
            solver=SolverConfig(solver_type="adadelta", clip_gradients=3.0,
                                max_iter=123),  # poly-policy horizon: keep
            max_iter=123, test_interval=10,     # consistent w/ the loop's
            snapshot_interval=10, seed=22)
        cfg_json = tmp_path / "config.json"
        cfg_json.write_text(experiment_to_json(model_cfg, trainer_cfg))
        out = tmp_path / "v4.prototxt"
        main(["convert", "--config", str(cfg_json), "--out", str(out)])
        back_model = model_config_from_net_prototxt(out.read_text())
        assert back_model == model_cfg
        back_tcfg = trainer_config_from_prototxt(
            (tmp_path / "v4_solver.prototxt").read_text())
        assert back_tcfg.solver == trainer_cfg.solver
        assert back_tcfg.max_iter == 123
        assert "MRR" in (tmp_path / "v4_eval.prototxt").read_text()


class TestProtoFaithfulDefaults:
    """Review findings: omitted SolverParameter fields must mean what they
    mean to the reference (proto defaults), and test_interval 0 = never
    test (solver.cpp:204-212)."""

    def test_absent_momentum_is_zero(self):
        cfg, _ = solver_config_from_prototxt(
            'base_lr: 0.01\nlr_policy: "fixed"\ntype: "SGD"')
        assert cfg.momentum == 0.0  # proto has NO default for momentum

    def test_test_interval_zero_honored(self):
        tcfg = trainer_config_from_prototxt(
            'base_lr: 1.0\nlr_policy: "fixed"\ntype: "AdaDelta"\n'
            'max_iter: 5')
        assert tcfg.test_interval == 0

    def test_fit_with_test_interval_zero_never_evals(self):
        import dataclasses as dc

        import numpy as np

        from mms_answer_selection_tpu.data import (
            prepare_trec_qa, synthetic_corpus)
        from mms_answer_selection_tpu.models.mms_qa import V4
        from mms_answer_selection_tpu.training import (
            SolverConfig, Trainer, TrainerConfig)
        xml, w2v = synthetic_corpus(n_questions=6, answers_per_q=4, seed=1)
        splits, info = prepare_trec_qa(xml, xml, xml, w2v)
        cfg = dc.replace(V4, vocab_size=info["vocab_size"], embed_dim=50)
        tcfg = TrainerConfig(solver=SolverConfig(solver_type="adadelta"),
                             max_iter=6, batch_size=8, test_interval=0,
                             snapshot_interval=0, early_stop_patience=1,
                             train_loss_record_interval=1, seed=22)
        hist = Trainer(cfg, tcfg).fit(splits["train"], splits["dev"],
                                      pretrained=info["pretrained"])
        assert hist["steps"] == [] and hist["dev_map"] == []
        # no dev signal -> no early stop: ALL 6 iterations ran even with
        # patience 1 (per-step loss records prove the count)
        assert len(hist["train_loss"]) == 6
        assert np.isfinite(hist["train_loss"]).all()

    def test_cli_explicit_max_iter_overrides_prototxt(self, tmp_path):
        import argparse

        from mms_answer_selection_tpu.cli import main  # noqa: F401
        # parser-level check: default None distinguishes "not given"
        from mms_answer_selection_tpu import cli as cli_mod
        ap = argparse.ArgumentParser()
        # replicate: the train subparser stores None by default
        ns = cli_mod.main.__module__  # noqa: F841  (import guard)
        # functional check via the real parser
        import sys
        from unittest import mock
        captured = {}

        def fake_train(args):
            captured["max_iter"] = args.max_iter
        with mock.patch.object(cli_mod, "cmd_train", fake_train):
            cli_mod.main(["train", "--data", "d", "--exp", "e"])
            assert captured["max_iter"] is None
            cli_mod.main(["train", "--data", "d", "--exp", "e",
                          "--max-iter", "40001"])
            assert captured["max_iter"] == 40001


class TestNetPrototxtCLI:
    def test_train_with_net_prototxt_takes_batch_size(self, tmp_path):
        import json as _json

        import numpy as np

        from mms_answer_selection_tpu.cli import main
        from mms_answer_selection_tpu.data import (
            prepare_trec_qa, save_dataset, synthetic_corpus)

        xml, w2v = synthetic_corpus(n_questions=6, answers_per_q=4, seed=3)
        splits, info = prepare_trec_qa(xml, xml, xml, w2v)
        data_dir = tmp_path / "prepped"
        data_dir.mkdir()
        for name, split in splits.items():
            save_dataset(str(data_dir / f"{name}.npz"), split)
        np.savez_compressed(str(data_dir / "vocab.npz"),
                            pretrained=info["pretrained"],
                            words=np.asarray(list(info["vocab"])))
        with open(data_dir / "meta.json", "w") as f:
            _json.dump({"vocab_size": info["vocab_size"],
                        "unknown_idx": info["unknown_idx"],
                        "pad_idx": info["pad_idx"], "dim": 50,
                        "q_len": 40, "a_len": 40}, f)
        net = tmp_path / "train.prototxt"
        net.write_text(V4_NET.replace("batch_size: 50", "batch_size: 10"))
        exp = tmp_path / "run"
        main(["train", "--data", str(data_dir), "--exp", str(exp),
              "--net-prototxt", str(net), "--max-iter", "2"])
        with open(exp / "config.json") as f:
            saved = _json.dumps(_json.load(f))
        # architecture from the file, batch from its hdf5_data_param,
        # vocab corrected to the prepped data's
        assert '"batch_size": 10' in saved
        assert '"sim_measures": 4' in saved
        assert f'"vocab_size": {info["vocab_size"]}' in saved


class TestStepsizeDefault:
    def test_omitted_stepsize_reads_proto_default_zero(self):
        from mms_answer_selection_tpu.utils.prototxt import (
            solver_config_from_prototxt)
        cfg, _ = solver_config_from_prototxt('base_lr: 0.1\n')
        assert cfg.stepsize == 0  # SolverParameter has no declared default

    def test_step_policy_without_stepsize_rejected(self):
        """The reference would integer-divide by zero in GetLearningRate
        (sgd_solver.cpp:37); we fail loudly instead of inventing one."""
        from mms_answer_selection_tpu.utils.prototxt import (
            solver_config_from_prototxt)
        with pytest.raises(ValueError, match="stepsize"):
            solver_config_from_prototxt(
                'base_lr: 0.1\nlr_policy: "step"\ngamma: 0.5\n')


def test_loss_normalization_emits_bare_enum():
    """LossParameter.NormalizationMode is an enum: `normalization:
    VALID` must emit unquoted or the reference's text parser rejects
    the upgraded prototxt."""
    from mms_answer_selection_tpu.utils.prototxt import (emit_prototxt,
                                                         parse_prototxt)

    text = emit_prototxt({"layer": {"name": "l", "type": "SoftmaxWithLoss",
                                    "loss_param": {"normalization":
                                                   "VALID"}}})
    assert "normalization: VALID" in text
    assert '"VALID"' not in text
    assert parse_prototxt(text)["layer"]["loss_param"]["normalization"] \
        == "VALID"
