"""Full native data path feeding training: synthetic corpus -> MMSP packed
file -> C++ prefetch ring -> jitted train steps (the
DataReader/BasePrefetchingDataLayer -> Solver pipeline, end to end)."""

import shutil

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")

from mms_answer_selection_tpu.data import prepare_trec_qa, synthetic_corpus  # noqa: E402
from mms_answer_selection_tpu.models.mms_qa import ConvBlock, MMSQAConfig  # noqa: E402
from mms_answer_selection_tpu.native import (  # noqa: E402
    NativePrefetcher,
    PackedStore,
    write_mmsp,
)
from mms_answer_selection_tpu.training import (  # noqa: E402
    SolverConfig,
    Trainer,
    TrainerConfig,
)


def test_mmsp_prefetcher_feeds_training(tmp_path):
    xml, w2v = synthetic_corpus(n_questions=10, answers_per_q=6, seed=19)
    splits, info = prepare_trec_qa(xml, xml, xml, w2v)
    train = splits["train"]
    train = {k: (v[:, 14:26] if k in ("question", "answer") else v)
             for k, v in train.items()}

    path = str(tmp_path / "train.mmsp")
    write_mmsp(path, train)
    store = PackedStore(path)
    pf = NativePrefetcher(store, ["question", "answer", "label",
                                  "overlap_feat"],
                          batch_size=15, seed=3, depth=2)

    cfg = MMSQAConfig(
        vocab_size=info["vocab_size"], embed_dim=50,
        question_len=12, answer_len=12, sim_measures=2,
        blocks=(ConvBlock(3, 3, 8, "ave", 2, 2),
                ConvBlock(3, 3, 8, "ave", 3, 1)),
        fc1_dim=8)
    trainer = Trainer(cfg, TrainerConfig(
        solver=SolverConfig(solver_type="adadelta"), batch_size=15, seed=22))
    params, state, opt_state = trainer.init(pretrained=info["pretrained"])

    losses = []
    for it in range(12):
        raw = pf.next()
        batch = {
            "question": jnp.asarray(raw["question"], jnp.int32),
            "answer": jnp.asarray(raw["answer"], jnp.int32),
            "label": jnp.asarray(raw["label"][:, 0], jnp.int32),
            "overlap_feat": jnp.asarray(raw["overlap_feat"]),
        }
        params, state, opt_state, loss = trainer._train_step(
            params, state, opt_state, batch, jnp.asarray(it),
            jax.random.PRNGKey(it))
        losses.append(float(loss))
    pf.close()
    store.close()
    assert np.isfinite(losses).all()
    assert np.mean(losses[-4:]) < np.mean(losses[:4])


def test_two_prefetchers_concurrently(tmp_path):
    # race-condition smoke: two rings over one store, interleaved draws
    arrays = {"x": np.arange(4000, dtype=np.int32).reshape(1000, 4)}
    path = str(tmp_path / "d.mmsp")
    write_mmsp(path, arrays)
    store = PackedStore(path)
    a = NativePrefetcher(store, ["x"], batch_size=64, seed=1, depth=3)
    b = NativePrefetcher(store, ["x"], batch_size=64, seed=2, depth=3)
    src = {tuple(r) for r in arrays["x"]}
    for _ in range(40):
        for pf in (a, b):
            batch = pf.next()["x"]
            assert batch.shape == (64, 4)
            assert tuple(batch[0]) in src
    a.close()
    b.close()
    store.close()


def test_fit_stream_with_native_prefetcher(tmp_path):
    xml, w2v = synthetic_corpus(n_questions=10, answers_per_q=6, seed=29)
    splits, info = prepare_trec_qa(xml, xml, xml, w2v)
    train = {k: (v[:, 14:26] if k in ("question", "answer") else v)
             for k, v in splits["train"].items()}
    dev = {k: (v[:, 14:26] if k in ("question", "answer") else v)
           for k, v in splits["dev"].items()}

    path = str(tmp_path / "t.mmsp")
    write_mmsp(path, {k: v for k, v in train.items() if k != "group"})
    store = PackedStore(path)
    pf = NativePrefetcher(store, ["question", "answer", "label",
                                  "overlap_feat"],
                          batch_size=15, seed=4, depth=2)

    cfg = MMSQAConfig(
        vocab_size=info["vocab_size"], embed_dim=50,
        question_len=12, answer_len=12, sim_measures=2,
        blocks=(ConvBlock(3, 3, 8, "ave", 2, 2),
                ConvBlock(3, 3, 8, "ave", 3, 1)),
        fc1_dim=8)
    trainer = Trainer(cfg, TrainerConfig(
        solver=SolverConfig(solver_type="adadelta"), batch_size=15,
        test_interval=20, seed=22))
    hist = trainer.fit_stream(pf, dev, steps=80,
                              pretrained=info["pretrained"],
                              patience_evals=50)
    pf.close()
    store.close()
    assert hist["best_dev_map"] > 0.6
    assert len(hist["dev_map"]) >= 2
