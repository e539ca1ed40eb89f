"""Golden end-to-end regression: a fully deterministic small training run
whose dev-MAP trajectory is pinned.

The reference's only MMS verification was the end-to-end trec_eval number
(SURVEY.md §4 gap).  This is the hermetic equivalent: any change to the
numeric stack (init, BN, sim metric, AdaDelta, shuffling, metrics) that
alters training dynamics trips this test.  If a change is INTENDED to alter
numerics, regenerate the golden values and say so in the commit.
"""

import json
import os

import numpy as np
import pytest

from mms_answer_selection_tpu.data import prepare_trec_qa, synthetic_corpus
from mms_answer_selection_tpu.models.mms_qa import ConvBlock, MMSQAConfig
from mms_answer_selection_tpu.training import SolverConfig, Trainer, TrainerConfig

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_e2e.json")


def _run():
    xml, w2v = synthetic_corpus(n_questions=10, answers_per_q=6, seed=77)
    splits, info = prepare_trec_qa(xml, xml, xml, w2v)
    for s in splits.values():
        s["question"] = s["question"][:, 14:26]
        s["answer"] = s["answer"][:, 14:26]
    cfg = MMSQAConfig(
        vocab_size=info["vocab_size"], embed_dim=50,
        question_len=12, answer_len=12, sim_measures=2,
        blocks=(ConvBlock(3, 3, 8, "ave", 2, 2),
                ConvBlock(3, 3, 8, "ave", 3, 1)),
        fc1_dim=8)
    tcfg = TrainerConfig(
        solver=SolverConfig(solver_type="adadelta", base_lr=1.0,
                            momentum=0.95, delta=5e-7, weight_decay=5e-4),
        max_iter=61, batch_size=15, test_interval=20,
        snapshot_interval=0, early_stop_patience=99, seed=22)
    hist = Trainer(cfg, tcfg).fit(splits["train"], splits["dev"],
                                  pretrained=info["pretrained"])
    return {
        "train_loss": [round(float(x), 5) for x in hist["train_loss"]],
        "dev_map": [round(float(x), 5) for x in hist["dev_map"]],
        "best_dev_map": round(float(hist["best_dev_map"]), 5),
    }


def test_golden_training_trajectory():
    got = _run()
    if not os.path.exists(GOLDEN_PATH):
        with open(GOLDEN_PATH, "w") as f:
            json.dump(got, f, indent=2)
        pytest.skip("golden file created; rerun to verify")
    with open(GOLDEN_PATH) as f:
        golden = json.load(f)
    # losses drift slightly across XLA releases; metrics must match tighter
    np.testing.assert_allclose(got["train_loss"], golden["train_loss"],
                               rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(got["dev_map"], golden["dev_map"],
                               rtol=1e-3, atol=1e-4)
    assert got["best_dev_map"] == pytest.approx(golden["best_dev_map"],
                                                rel=1e-3)
