"""fit_stream as a first-class training path: snapshots, resume, test-split
scoring, signal handling, and the CLI --stream drive (VERDICT round-1 #8)."""

import json
import os
import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mms_answer_selection_tpu.data import prepare_trec_qa, synthetic_corpus
from mms_answer_selection_tpu.data.loader import ArrayDataset, BatchIterator
from mms_answer_selection_tpu.models.mms_qa import ConvBlock, MMSQAConfig
from mms_answer_selection_tpu.training import (
    SolverConfig,
    Trainer,
    TrainerConfig,
    load_checkpoint,
)


@pytest.fixture(scope="module")
def corpus():
    xml, w2v = synthetic_corpus(n_questions=10, answers_per_q=6, seed=8)
    splits, info = prepare_trec_qa(xml, xml, xml, w2v)
    for s in splits.values():
        s["question"] = s["question"][:, 14:26]
        s["answer"] = s["answer"][:, 14:26]
    model_cfg = MMSQAConfig(
        vocab_size=info["vocab_size"], embed_dim=50,
        question_len=12, answer_len=12, sim_measures=2,
        blocks=(ConvBlock(3, 3, 8, "ave", 2, 2),
                ConvBlock(3, 3, 8, "ave", 3, 1)),
        fc1_dim=8)
    return splits, info, model_cfg


def _tcfg(snapshot_dir):
    return TrainerConfig(
        solver=SolverConfig(solver_type="adadelta", weight_decay=5e-4),
        max_iter=10, batch_size=15, test_interval=4, snapshot_interval=1,
        early_stop_patience=99, seed=22, snapshot_dir=snapshot_dir)


def _iterator(splits):
    return BatchIterator(
        ArrayDataset({k: v for k, v in splits["train"].items()
                      if k != "group"}), 15, seed=22)


class TestFitStreamFirstClass:
    def test_history_schema_matches_fit(self, corpus, tmp_path):
        splits, info, model_cfg = corpus
        tr = Trainer(model_cfg, _tcfg(None))
        hist_s = tr.fit_stream(_iterator(splits), splits["dev"], steps=10,
                               test_data=splits["test"],
                               pretrained=info["pretrained"])
        hist_f = tr.fit(splits["train"], splits["dev"],
                        test_data=splits["test"],
                        pretrained=info["pretrained"])
        assert set(hist_s) == set(hist_f)
        assert len(hist_s["test_map"]) == len(hist_s["dev_map"]) > 0

    def test_snapshots_and_bit_exact_resume(self, corpus, tmp_path):
        """Stream-train 10 == stream-train 5 + snapshot + restore + 5,
        with the caller repositioning the stream (the reference contract:
        .solverstate has no data-layer cursor either)."""
        splits, info, model_cfg = corpus
        dir_a, dir_b = str(tmp_path / "a"), str(tmp_path / "b")

        tr_a = Trainer(model_cfg, _tcfg(dir_a))
        tr_a.fit_stream(_iterator(splits), splits["dev"], steps=10,
                        pretrained=info["pretrained"])
        assert os.path.isdir(os.path.join(dir_a, "qa_iter_9"))

        it_b = _iterator(splits)
        for _ in range(5):  # reposition the stream past steps 0..4
            next(it_b)
        tr_b = Trainer(model_cfg, _tcfg(dir_b))
        hist_b = tr_b.fit_stream(it_b, splits["dev"], steps=10,
                                 pretrained=info["pretrained"],
                                 resume_from=os.path.join(dir_a, "qa_iter_4"))
        ba, _ = load_checkpoint(os.path.join(dir_a, "qa_iter_9"))
        bb, _ = load_checkpoint(os.path.join(dir_b, "qa_iter_9"))
        for a, b in zip(jax.tree.leaves(ba), jax.tree.leaves(bb)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # inherited eval curve: evals at 0 and 4 come from run A's meta
        assert hist_b["steps"][:2] == [0, 4]

    def test_patience_stops_early(self, corpus):
        splits, info, model_cfg = corpus
        tr = Trainer(model_cfg, _tcfg(None))
        hist = tr.fit_stream(_iterator(splits), splits["dev"], steps=200,
                             eval_interval=1, patience_evals=2,
                             pretrained=info["pretrained"])
        assert len(hist["dev_map"]) < 200


class TestCLIStream:
    @pytest.mark.skipif(shutil.which("g++") is None,
                        reason="no C++ toolchain")
    def test_prep_mmsp_train_stream(self, tmp_path, capsys):
        from mms_answer_selection_tpu.cli import main
        from mms_answer_selection_tpu.utils.config import experiment_to_json

        xml, w2v = synthetic_corpus(n_questions=8, answers_per_q=5, seed=6)
        xml_path = tmp_path / "data.xml"
        xml_path.write_text(xml)
        glove = tmp_path / "glove.txt"
        with open(glove, "w") as f:
            for w, v in w2v.items():
                f.write(w + " " + " ".join(f"{x:.5f}" for x in v) + "\n")
        out = tmp_path / "prep"
        main(["prep", "--train-xml", str(xml_path), "--dev-xml",
              str(xml_path), "--test-xml", str(xml_path), "--glove",
              str(glove), "--out", str(out), "--q-len", "12",
              "--a-len", "12", "--mmsp"])
        assert (out / "train.mmsp").exists()
        capsys.readouterr()

        meta = json.loads((out / "meta.json").read_text())
        exp = tmp_path / "exp"
        model = MMSQAConfig(
            vocab_size=meta["vocab_size"], embed_dim=50,
            question_len=12, answer_len=12, sim_measures=2,
            blocks=(ConvBlock(3, 3, 4, "ave", 2, 2),
                    ConvBlock(3, 3, 4, "ave", 3, 1)),
            fc1_dim=4)
        tcfg = TrainerConfig(solver=SolverConfig(), max_iter=8,
                             batch_size=10, test_interval=4,
                             snapshot_interval=4, early_stop_patience=99,
                             snapshot_dir=str(exp / "models"))
        cfg_path = tmp_path / "config.json"
        cfg_path.write_text(experiment_to_json(model, tcfg))
        main(["train", "--data", str(out), "--exp", str(exp), "--config",
              str(cfg_path), "--stream"])
        out1 = capsys.readouterr().out
        assert "best dev MAP" in out1
        hist = json.loads((exp / "history.json").read_text())
        assert hist["steps"] == [0, 4]
        assert (exp / "models" / "qa_iter_4").exists()


class TestStreamFusedDispatch:
    def test_fused_matches_k1(self, corpus):
        splits, info, model_cfg = corpus
        tcfg = TrainerConfig(
            solver=SolverConfig(solver_type="adadelta", weight_decay=5e-4),
            max_iter=24, batch_size=15, test_interval=8,
            snapshot_interval=0, early_stop_patience=99, seed=22)
        h1 = Trainer(model_cfg, tcfg).fit_stream(
            _iterator(splits), splits["dev"], steps=24,
            pretrained=info["pretrained"])
        hk = Trainer(model_cfg, tcfg).fit_stream(
            _iterator(splits), splits["dev"], steps=24,
            pretrained=info["pretrained"], steps_per_dispatch=8)
        assert h1["steps"] == hk["steps"]
        np.testing.assert_allclose(hk["train_loss"], h1["train_loss"],
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(hk["dev_map"], h1["dev_map"],
                                   rtol=1e-4, atol=1e-5)

    def test_fused_native_prefetcher(self, corpus, tmp_path):
        import shutil
        if shutil.which("g++") is None:
            pytest.skip("no C++ toolchain")
        from mms_answer_selection_tpu.native import (
            NativePrefetcher, PackedStore, write_mmsp)
        splits, info, model_cfg = corpus
        path = str(tmp_path / "t.mmsp")
        write_mmsp(path, {k: v for k, v in splits["train"].items()
                          if k != "group"})
        store = PackedStore(path)
        pf = NativePrefetcher(
            store, ["question", "answer", "label", "overlap_feat"], 15,
            seed=22)
        tcfg = TrainerConfig(
            solver=SolverConfig(solver_type="adadelta", weight_decay=5e-4),
            max_iter=12, batch_size=15, test_interval=6,
            snapshot_interval=0, early_stop_patience=99, seed=22)
        hist = Trainer(model_cfg, tcfg).fit_stream(
            pf, splits["dev"], steps=12, pretrained=info["pretrained"],
            steps_per_dispatch=6)
        assert len(hist["train_loss"]) > 0
        assert np.isfinite(hist["train_loss"]).all()
        pf.close(); store.close()


class TestFusedOnMesh:
    def test_fit_fused_on_dp_mesh_matches_k1(self, corpus):
        """fit(steps_per_dispatch=K) under a dp mesh: step-identical
        history to K=1 on the same mesh (the P2PSync-replacement path
        combined with the fused dispatch)."""
        from mms_answer_selection_tpu.parallel import make_mesh
        splits, info, model_cfg = corpus
        mesh = make_mesh()
        # dev sliced to a dp-divisible row count (the eval step shards
        # the batch over dp)
        dev = {k: v[:56] for k, v in splits["dev"].items()}
        tcfg = TrainerConfig(
            solver=SolverConfig(solver_type="adadelta", weight_decay=5e-4),
            max_iter=16, batch_size=16, test_interval=8,
            snapshot_interval=0, early_stop_patience=99, seed=22)
        h1 = Trainer(model_cfg, tcfg, mesh=mesh).fit(
            splits["train"], dev, pretrained=info["pretrained"])
        hk = Trainer(model_cfg, tcfg, mesh=mesh).fit(
            splits["train"], dev, pretrained=info["pretrained"],
            steps_per_dispatch=8)
        assert h1["steps"] == hk["steps"]
        np.testing.assert_allclose(hk["train_loss"], h1["train_loss"],
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(hk["dev_map"], h1["dev_map"],
                                   rtol=1e-4, atol=1e-5)

    def test_fit_stream_fused_on_dp_mesh(self, corpus):
        from mms_answer_selection_tpu.parallel import make_mesh
        splits, info, model_cfg = corpus
        mesh = make_mesh()
        tcfg = TrainerConfig(
            solver=SolverConfig(solver_type="adadelta", weight_decay=5e-4),
            max_iter=12, batch_size=16, test_interval=6,
            snapshot_interval=0, early_stop_patience=99, seed=22)
        it = BatchIterator(
            ArrayDataset({k: v for k, v in splits["train"].items()
                          if k != "group"}), 16, seed=22)
        dev = {k: v[:56] for k, v in splits["dev"].items()}
        hist = Trainer(model_cfg, tcfg, mesh=mesh).fit_stream(
            it, dev, steps=12, pretrained=info["pretrained"],
            steps_per_dispatch=6)
        assert np.isfinite(hist["train_loss"]).all()
        assert len(hist["dev_map"]) == 2  # evals at 0 and 6


def test_fit_stream_iter_size(tmp_path):
    """fit_stream with solver.iter_size > 1 stacks consecutive stream
    batches on a leading micro-batch axis (round-4 review: the flat
    batch used to trace-error against the accumulation scan)."""
    import dataclasses

    import jax

    from mms_answer_selection_tpu.models.mms_qa import ConvBlock, MMSQAConfig
    from mms_answer_selection_tpu.training import (SolverConfig, Trainer,
                                                   TrainerConfig)

    cfg = MMSQAConfig(
        vocab_size=48, embed_dim=12, question_len=10, answer_len=10,
        sim_measures=2, blocks=(ConvBlock(3, 3, 6, "ave", 2, 2),),
        fc1_dim=6)
    tcfg = TrainerConfig(
        solver=SolverConfig(solver_type="sgd", base_lr=0.05, momentum=0.9,
                            iter_size=2),
        batch_size=8, test_interval=0, snapshot_interval=0, seed=3,
        train_loss_record_interval=1)
    trainer = Trainer(cfg, tcfg)
    params, state, opt = trainer.init()
    rng = np.random.default_rng(0)

    def batch():
        return {"question": rng.integers(0, 48, (8, 10)).astype(np.int32),
                "answer": rng.integers(0, 48, (8, 10)).astype(np.int32),
                "overlap_feat": rng.random((8, 2)).astype(np.float32),
                "label": rng.integers(0, 2, (8,)).astype(np.int32)}

    dev = batch()
    dev["group"] = np.repeat(np.arange(4), 2).astype(np.int32)
    stream = iter([batch() for _ in range(8)])  # 8 micro = 4 steps
    hist = trainer.fit_stream(stream, dev, steps=4, eval_interval=0)
    assert len(hist["train_loss"]) == 4
    assert np.isfinite(hist["train_loss"]).all()


def test_fit_stream_iter_size_on_mesh():
    """iter_size > 1 on the dp mesh shards the SAMPLE axis, not the
    micro-batch axis."""
    import jax

    from mms_answer_selection_tpu.models.mms_qa import ConvBlock, MMSQAConfig
    from mms_answer_selection_tpu.parallel import make_mesh
    from mms_answer_selection_tpu.training import (SolverConfig, Trainer,
                                                   TrainerConfig)

    cfg = MMSQAConfig(
        vocab_size=48, embed_dim=12, question_len=10, answer_len=10,
        sim_measures=2, blocks=(ConvBlock(3, 3, 6, "ave", 2, 2),),
        fc1_dim=6)
    mesh = make_mesh(tp=1)
    tcfg = TrainerConfig(
        solver=SolverConfig(solver_type="sgd", base_lr=0.05, momentum=0.9,
                            iter_size=2),
        batch_size=8, test_interval=0, snapshot_interval=0, seed=3)
    trainer = Trainer(cfg, tcfg, mesh=mesh)
    params, state, opt = trainer.init()
    rng = np.random.default_rng(1)
    # (iter_size, batch, ...) stacked batch, like _epoch_batches yields
    b = {"question": rng.integers(0, 48, (2, 8, 10)).astype(np.int32),
         "answer": rng.integers(0, 48, (2, 8, 10)).astype(np.int32),
         "overlap_feat": rng.random((2, 8, 2)).astype(np.float32),
         "label": rng.integers(0, 2, (2, 8)).astype(np.int32)}
    params, state, opt, loss = trainer._train_step(
        params, state, opt, b, jnp.asarray(0), jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
