"""Recipe-scale hermetic accuracy golden (VERDICT round-1 item #2).

The full-size artifact (50k pairs, vocab ~20k, thousands of iterations on
the real TPU) lives under docs/runs/recipe_scale_v4/ and is produced by
examples/recipe_scale_rehearsal.py.  This test pins a scaled-down-but-real
version of the same thing on the CPU mesh: the FULL V4 geometry (40x40,
4 measures, 32/64-channel blocks) trained for hundreds of steps on the
topic-structured corpus whose overlap features carry no label signal --
so any MAP rise above the chance floor demonstrates that the
parity-critical numerics chain (zero-init bilinear metric -> BN
rsqrt(1e-9) -> AdaDelta self-normalization, SURVEY 'hard parts') actually
produces *learning* at recipe geometry, not just finite losses.
"""

import dataclasses
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mms_answer_selection_tpu.data import (  # noqa: E402
    prepare_trec_qa, synthetic_split, synthetic_world)
from mms_answer_selection_tpu.metrics import (  # noqa: E402
    mean_average_precision, mean_reciprocal_rank, trec_eval)
from mms_answer_selection_tpu.models.mms_qa import V4  # noqa: E402
from mms_answer_selection_tpu.training import (  # noqa: E402
    SolverConfig, Trainer, TrainerConfig)


def _corpus(train_q=150, dev_q=30, test_q=30):
    world = synthetic_world(vocab_words=3000, n_topics=60, seed=22)
    train_xml = synthetic_split(world, train_q, 30, 50, seed=101)
    dev_xml = synthetic_split(world, dev_q, 12, 24, seed=202)
    test_xml = synthetic_split(world, test_q, 15, 29, seed=303)
    return prepare_trec_qa(train_xml, dev_xml, test_xml, world["w2v"])


def test_overlap_features_carry_no_label_signal():
    """The corpus design invariant: literal-overlap features are matched
    between positives and negatives, so the model cannot shortcut through
    the overlap_feat input."""
    splits, info = _corpus(train_q=120)
    tr = splits["train"]
    pos = tr["overlap_feat"][tr["label"] == 1]
    neg = tr["overlap_feat"][tr["label"] == 0]
    # mean overlap fraction differs by < 15% relative between classes
    for col in range(2):
        p, n = float(pos[:, col].mean()), float(neg[:, col].mean())
        assert abs(p - n) / max(p, n) < 0.15, (col, p, n)
    # world stats: OOV path exercised, some all-negative groups exist
    assert info["vocab_size"] < 3000  # oov_frac withheld from w2v
    assert (tr["question"] == info["unknown_idx"]).any()
    lab_by_group = {}
    for g, lab in zip(tr["group"], tr["label"]):
        lab_by_group.setdefault(int(g), []).append(int(lab))
    assert any(not any(v) for v in lab_by_group.values()), \
        "expected some all-negative groups (effective-group filter case)"


def test_full_v4_learns_above_chance():
    """Train the published V4 recipe (AdaDelta 1.0/.95/5e-7, wd 5e-4,
    batch 50, seed 22) for 301 steps; dev MAP must rise well above the
    step-0 chance floor, and the final test scores must agree across the
    in-graph jit metrics, the numpy metrics, and in-process trec_eval."""
    splits, info = _corpus()
    model_cfg = dataclasses.replace(V4, vocab_size=info["vocab_size"],
                                    embed_dim=50)
    trainer_cfg = TrainerConfig(
        solver=SolverConfig(solver_type="adadelta", base_lr=1.0,
                            momentum=0.95, delta=5e-7, weight_decay=5e-4),
        max_iter=301, batch_size=50, test_interval=100,
        snapshot_interval=0, early_stop_patience=5, seed=22)
    trainer = Trainer(model_cfg, trainer_cfg)
    hist = trainer.fit(splits["train"], splits["dev"],
                       pretrained=info["pretrained"])
    chance = hist["dev_map"][0]
    assert 0.35 < chance < 0.58, chance   # ~#pos/#ans baseline, not degenerate
    assert hist["best_dev_map"] > chance + 0.12, \
        (chance, hist["best_dev_map"])

    res = trainer.evaluate(hist["params"], hist["state"], splits["test"])
    scores = np.asarray(res["prob"][:, 1], np.float64)
    labels, groups = splits["test"]["label"], splits["test"]["group"]
    np_map = mean_average_precision(scores, labels, groups)
    np_mrr = mean_reciprocal_rank(scores, labels, groups)
    ev = trec_eval(scores=scores, labels=labels, groups=groups)
    assert abs(float(res["map"]) - np_map) < 1e-5
    assert abs(float(res["mrr"]) - np_mrr) < 1e-5
    assert abs(ev["map"] - np_map) < 1e-9
    assert abs(ev["recip_rank"] - np_mrr) < 1e-9


def test_hard_variant_has_intrinsic_bayes_error():
    """The --hard construction: distractor negatives are built from the
    weak-positive recipe with HIGHER topic density, so a density-optimal
    ranker must misorder those pairs -- an irreducible error floor (the
    docs/runs/recipe_scale_v4_hard artifact's claim, checked on the
    corpus itself)."""
    from mms_answer_selection_tpu.data.trec_qa import parse_trec_xml

    world = synthetic_world(vocab_words=3000, n_topics=60, seed=22)
    xml = synthetic_split(world, 150, 30, 50, seed=7,
                          weak_pos_frac=0.35, weak_topic_rate=0.12,
                          distractor_frac=0.30, distractor_topic_rate=0.30)
    # density of question-topic tokens per answer, computed from the raw
    # corpus directly: words are named t<topic>w<i>
    qids, questions, answers, labels = parse_trec_xml(xml)

    def topic_of(tok):
        return int(tok[1:].split("w")[0]) if tok.startswith("t") else -1

    weak_pos, distract = [], []
    for q, a, lab in zip(questions, answers, labels):
        q_topics = [topic_of(w) for w in q if topic_of(w) >= 0]
        if not q_topics:
            continue
        t = max(set(q_topics), key=q_topics.count)
        dens = sum(1 for w in a if topic_of(w) == t) / len(a)
        if lab == 1 and dens < 0.2:
            weak_pos.append(dens)
        if lab == 0 and dens > 0.2:
            distract.append(dens)
    assert len(weak_pos) > 50 and len(distract) > 100
    # the discriminative feature ORDERS THE CLASSES BACKWARDS for these
    # subsets: every such distractor outranks every such weak positive
    assert float(np.mean(distract)) > float(np.mean(weak_pos)) + 0.1


def test_full_budget_artifact_invariants():
    """Pins docs/runs/recipe_full_budget/ — the 40,001-iteration recipe
    budget run on-chip (fused scan + compile cache + snapshot cadence +
    dual-split evals, early stop disabled so every step of the budget
    executes; do_trec_qa_clean.py:782-867's loop shape).  Skips until
    the artifact is produced on real hardware."""
    import json

    path = os.path.join(os.path.dirname(__file__), "..", "docs", "runs",
                        "recipe_full_budget", "summary.json")
    if not os.path.exists(path):
        import pytest

        pytest.skip("recipe_full_budget artifact not yet produced "
                    "(needs the TPU)")
    with open(path) as f:
        s = json.load(f)
    assert s["max_iter"] == 40001
    assert s["early_stop_patience"] == 0      # full budget, no early out
    assert s["last_eval_step"] >= 40000       # every eval interval ran
    assert s["backend"] == "tpu"
    assert s["best_dev_map"] > s["chance_dev_map_step0"] + 0.25
    assert s["test_map"] > 0.5                # hard-corpus interior level
    assert s["wall_s"] < 12000                # the budget is tractable


def test_wide300_artifact_invariants():
    """Pins docs/runs/recipe_scale_wide300/ — configs[1]'s shape: the
    300-d GloVe-style wide encoder (do_trec_qa_clean.py:94-114 loads
    the word2vec 300-d bin; SURVEY configs[1]) trained at recipe scale
    on-chip.  Skips until the artifact is produced on real hardware."""
    import json

    path = os.path.join(os.path.dirname(__file__), "..", "docs", "runs",
                        "recipe_scale_wide300", "summary.json")
    if not os.path.exists(path):
        import pytest

        pytest.skip("recipe_scale_wide300 artifact not yet produced "
                    "(needs the TPU)")
    with open(path) as f:
        s = json.load(f)
    assert s["model"] == "v4_wide"
    assert s["embed_dim"] == 300
    assert s["backend"] == "tpu"
    assert s["best_dev_map"] > s["chance_dev_map_step0"] + 0.25
    assert s["test_map"] > 0.6


def test_wikiqa_artifact_invariants():
    """Pins docs/runs/recipe_scale_wikiqa/ — configs[2]'s shape: the
    WikiQA-format corpus (TSV splits, sparse positives, all-negative
    questions dropped by prepare_wikiqa) trained at recipe scale
    on-chip.  Skips until the artifact is produced on real hardware."""
    import json

    path = os.path.join(os.path.dirname(__file__), "..", "docs", "runs",
                        "recipe_scale_wikiqa", "summary.json")
    if not os.path.exists(path):
        import pytest

        pytest.skip("recipe_scale_wikiqa artifact not yet produced "
                    "(needs the TPU)")
    with open(path) as f:
        s = json.load(f)
    assert s["format"] == "wikiqa"
    assert s["backend"] == "tpu"
    assert s["best_dev_map"] > s["chance_dev_map_step0"] + 0.25
    assert s["test_map"] > 0.6


def test_int8_error_analysis_artifact():
    """Pins docs/runs/int8_error_analysis/summary.json — the VERDICT
    round-4 item-6 deliverable: per-pair quantization error vs top-k
    gap geometry across pool sizes, with the serving-shortlist rule.
    recall@10-in-top-50 == 1.0 at every measured scale is the contract
    the rerank path's default shortlist relies on."""
    import json

    path = os.path.join(os.path.dirname(__file__), "..", "docs", "runs",
                        "int8_error_analysis", "summary.json")
    if not os.path.exists(path):
        import pytest

        pytest.skip("int8_error_analysis artifact not yet produced "
                    "(needs the TPU)")
    with open(path) as f:
        s = json.load(f)
    for pool in ("pool_262144", "pool_1048576"):
        assert s[pool]["recall10_in_s"]["50"] == 1.0
        assert s[pool]["top10_agreement"] > 0.75
    assert s["guidance"]["S_1m"] <= 512
