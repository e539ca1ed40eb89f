"""`qa reproduce` -- the real-data parity gate (README.md:20-49).

Two layers of coverage:
* hermetic wiring tests on the synthetic corpus (PASS and FAIL exits,
  artifact shape), always run;
* the actual gate against jacana TREC-QA + GloVe, auto-skipped until the
  data exists in this zero-egress sandbox (point TREC_QA_DATA at a
  directory holding train-all.xml/dev.xml/test.xml/glove.6B.50d.txt, or
  set the four TREC_QA_*_XML / TREC_QA_GLOVE variables) -- the day the
  data lands, parity is one `pytest tests/test_reproduce.py` away.
"""

import json
import os

import pytest

from mms_answer_selection_tpu.cli import main
from mms_answer_selection_tpu.data import synthetic_corpus


def _real_data_paths():
    """Resolve the real-data file set from env, or None if absent."""
    base = os.environ.get("TREC_QA_DATA")
    if base:
        paths = {
            "train": os.path.join(base, "train-all.xml"),
            "dev": os.path.join(base, "dev.xml"),
            "test": os.path.join(base, "test.xml"),
            "glove": os.path.join(base, "glove.6B.50d.txt"),
        }
    else:
        paths = {
            "train": os.environ.get("TREC_QA_TRAIN_XML"),
            "dev": os.environ.get("TREC_QA_DEV_XML"),
            "test": os.environ.get("TREC_QA_TEST_XML"),
            "glove": os.environ.get("TREC_QA_GLOVE"),
        }
    if all(p and os.path.exists(p) for p in paths.values()):
        return paths
    return None


def _synthetic_files(tmp_path, seed=22):
    xml, w2v = synthetic_corpus(n_questions=10, answers_per_q=6, seed=seed)
    xml_path = str(tmp_path / "corpus.xml")
    with open(xml_path, "w") as f:
        f.write(xml)
    glove_path = str(tmp_path / "vectors.txt")
    with open(glove_path, "w") as f:
        for w, v in w2v.items():
            f.write(w + " " + " ".join(f"{x:.6f}" for x in v) + "\n")
    return xml_path, glove_path


class TestReproduceWiring:
    def test_pass_exit_and_artifacts(self, tmp_path, capsys):
        xml, glove = _synthetic_files(tmp_path)
        out = str(tmp_path / "run")
        # wide-open tolerance: the gate machinery must PASS (exit 0)
        main(["reproduce", "--train-xml", xml, "--dev-xml", xml,
              "--test-xml", xml, "--glove", glove, "--out", out,
              "--max-iter", "30", "--expected-map", "0.5",
              "--expected-mrr", "0.5", "--tolerance", "1.0"])
        printed = capsys.readouterr().out
        assert "reproduce PASS" in printed
        assert "map" in printed and "recip_rank" in printed  # README table
        ev = json.load(open(os.path.join(out, "trec_eval.json")))
        assert {"map", "recip_rank", "num_q", "bpref"} <= set(ev)
        assert os.path.exists(os.path.join(out, "truth"))
        assert os.path.exists(os.path.join(out, "result"))

    def test_fail_exits_nonzero(self, tmp_path, capsys):
        xml, glove = _synthetic_files(tmp_path)
        with pytest.raises(SystemExit) as e:
            main(["reproduce", "--train-xml", xml, "--dev-xml", xml,
                  "--test-xml", xml, "--glove", glove,
                  "--out", str(tmp_path / "run"),
                  "--max-iter", "30", "--expected-map", "99.0",
                  "--tolerance", "0.001"])
        assert e.value.code == 1
        assert "reproduce FAIL" in capsys.readouterr().out


@pytest.mark.skipif(_real_data_paths() is None,
                    reason="real TREC-QA data + GloVe not present "
                           "(zero-egress sandbox); set TREC_QA_DATA")
def test_reproduce_readme_numbers(tmp_path):
    """THE gate: published recipe, published numbers (README.md:26,29)."""
    p = _real_data_paths()
    main(["reproduce", "--train-xml", p["train"], "--dev-xml", p["dev"],
          "--test-xml", p["test"], "--glove", p["glove"],
          "--out", str(tmp_path / "run"), "--fused-steps", "8"])
    # main() returning (no SystemExit(1)) IS the pass condition
