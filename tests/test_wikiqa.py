"""WikiQA loader tests."""

import numpy as np

from mms_answer_selection_tpu.data import parse_wikiqa_tsv, prepare_wikiqa

TSV = "\t".join(["QuestionID", "Question", "DocumentID", "DocumentTitle",
                 "SentenceID", "Sentence", "Label"]) + "\n" + "\n".join([
    "\t".join(["Q1", "how are glacier caves formed?", "D1", "Glacier cave",
               "D1-0", "A glacier cave is a cave formed within the ice.",
               "1"]),
    "\t".join(["Q1", "how are glacier caves formed?", "D1", "Glacier cave",
               "D1-1", "The weather was nice.", "0"]),
    "\t".join(["Q2", "who wrote hamlet?", "D2", "Hamlet", "D2-0",
               "Hamlet was written by Shakespeare.", "1"]),
    "\t".join(["Q2", "who wrote hamlet?", "D2", "Hamlet", "D2-1",
               "It rains a lot in spring.", "0"]),
])


def test_parse():
    qids, qs, ans, labels = parse_wikiqa_tsv(TSV)
    assert qids == ["Q1", "Q1", "Q2", "Q2"]
    assert labels == [1, 0, 1, 0]
    assert qs[0][:3] == ["how", "are", "glacier"]
    assert "ice" in ans[0]


def test_prepare_same_artifacts_as_trecqa():
    words = set()
    for line in TSV.splitlines()[1:]:
        parts = line.split("\t")
        words |= set(parts[1].lower().replace("?", "").split())
        words |= set(parts[5].lower().replace(".", "").split())
    rng = np.random.default_rng(0)
    w2v = {w: rng.normal(size=8).tolist() for w in words}
    splits, info = prepare_wikiqa(TSV, TSV, TSV, w2v, q_len=10, a_len=12)
    tr = splits["train"]
    assert tr["question"].shape == (4, 10)
    assert tr["answer"].shape == (4, 12)
    assert set(np.unique(tr["group"])) == {0, 1}
    assert tr["overlap_feat"].shape == (4, 2)
    assert info["vocab_size"] == len(info["vocab"]) + 2
    # every group has a positive and a negative -> both effective
    from mms_answer_selection_tpu.metrics import mean_average_precision
    assert mean_average_precision(
        np.asarray([0.9, 0.1, 0.8, 0.2]), tr["label"], tr["group"]) == 1.0


def test_cli_prep_wikiqa(tmp_path, capsys):
    from mms_answer_selection_tpu.cli import main
    tsv = tmp_path / "wiki.tsv"
    tsv.write_text(TSV)
    words = set()
    for line in TSV.splitlines()[1:]:
        parts = line.split("\t")
        words |= set(parts[1].lower().replace("?", "").split())
        words |= set(parts[5].lower().replace(".", "").split())
    rng = np.random.default_rng(1)
    glove = tmp_path / "glove.txt"
    with open(glove, "w") as f:
        for w in words:
            f.write(w + " " + " ".join(
                f"{x:.4f}" for x in rng.normal(size=50)) + "\n")
    out = tmp_path / "prep"
    main(["prep", "--format", "wikiqa", "--train-xml", str(tsv),
          "--dev-xml", str(tsv), "--test-xml", str(tsv), "--glove",
          str(glove), "--out", str(out), "--q-len", "10", "--a-len", "12"])
    with np.load(out / "train.npz") as z:
        assert z["question"].shape == (4, 10)
