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
