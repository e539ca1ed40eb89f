"""Multimodal image-pair metric path: data pipeline + siamese model +
pair-rank training loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mms_answer_selection_tpu.data.pair_image import (
    PairImageDataset,
    parse_pair_list,
    synthetic_pair_corpus,
    transform,
)
from mms_answer_selection_tpu.models.pair_image import (
    PairImageConfig,
    pair_image_apply,
    pair_image_init,
)
from mms_answer_selection_tpu.training import SolverConfig, make_solver

CFG = PairImageConfig(height=12, width=12, channels=1,
                      blocks=(
                          __import__("mms_answer_selection_tpu.models.mms_qa",
                                     fromlist=["ConvBlock"]).ConvBlock(
                              3, 3, 4, "max", 2, 2),),
                      fc_dim=8)


class TestData:
    def test_parse_list(self):
        rows = parse_pair_list("a.npy b.npy 0.5 1.5 1\nx.npy y.npy 0 0 0\n")
        assert rows[0] == ("a.npy", "b.npy", 0.5, 1.5, 1)
        assert rows[1][4] == 0

    def test_dataset_batches(self, tmp_path):
        lf = synthetic_pair_corpus(str(tmp_path), n_pairs=10, hw=12)
        ds = PairImageDataset(lf, batch_size=4, root=str(tmp_path), seed=1)
        b = next(ds)
        assert b["img1"].shape == (4, 12, 12, 1)
        assert b["img2"].shape == (4, 12, 12, 1)
        assert b["label"].shape == (4,)
        assert b["angles"].shape == (4, 2)

    def test_wraparound_and_reshuffle(self, tmp_path):
        lf = synthetic_pair_corpus(str(tmp_path), n_pairs=5, hw=12)
        ds = PairImageDataset(lf, batch_size=4, root=str(tmp_path), seed=1)
        for _ in range(4):  # 16 draws > 5 rows -> multiple wraps
            b = next(ds)
            assert b["img1"].shape[0] == 4

    def test_transform_crop_and_scale(self):
        rng = np.random.default_rng(0)
        arr = np.arange(36, dtype=np.float32).reshape(6, 6, 1)
        out = transform(arr, scale=0.5, crop_size=4, rng=rng, train=False)
        assert out.shape == (4, 4, 1)
        np.testing.assert_allclose(out[0, 0, 0], arr[1, 1, 0] * 0.5)


class TestModel:
    def test_forward_shapes_and_loss(self, tmp_path):
        params, state = pair_image_init(jax.random.PRNGKey(0), CFG)
        rng = np.random.default_rng(2)
        batch = {
            "img1": jnp.asarray(rng.normal(size=(6, 12, 12, 1)),
                                jnp.float32),
            "img2": jnp.asarray(rng.normal(size=(6, 12, 12, 1)),
                                jnp.float32),
            "label": jnp.asarray(rng.integers(0, 2, 6), jnp.float32),
        }
        out, new_state = pair_image_apply(params, state, batch, CFG,
                                          train=True)
        assert out["score1"].shape == (6,)
        assert np.isfinite(float(out["loss"]))
        assert 0.0 <= float(out["rank_accuracy"]) <= 1.0

    def test_training_reduces_loss(self, tmp_path):
        lf = synthetic_pair_corpus(str(tmp_path), n_pairs=40, hw=12, seed=3)
        ds = PairImageDataset(lf, batch_size=16, root=str(tmp_path), seed=1,
                              scale=1.0)
        params, state = pair_image_init(jax.random.PRNGKey(0), CFG)
        solver = make_solver(SolverConfig(solver_type="adadelta",
                                          weight_decay=0.0))
        opt_state = solver.init(params)

        @jax.jit
        def step(params, state, opt_state, batch, it):
            def loss_fn(p):
                out, ns = pair_image_apply(p, state, batch, CFG, train=True)
                return out["loss"], ns

            (loss, ns), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
            p2, o2 = solver.apply(params, g, opt_state, it)
            return p2, ns, o2, loss

        losses = []
        for i in range(30):
            b = next(ds)
            jb = {k: jnp.asarray(v) for k, v in b.items()
                  if k in ("img1", "img2", "label")}
            params, state, opt_state, loss = step(params, state, opt_state,
                                                  jb, jnp.asarray(i))
            losses.append(float(loss))
        assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_compute_image_mean(tmp_path):
    from mms_answer_selection_tpu.data.pair_image import compute_image_mean
    lf = synthetic_pair_corpus(str(tmp_path), n_pairs=6, hw=8)
    mean = compute_image_mean(lf, root=str(tmp_path))
    assert mean.shape == (8, 8, 1)
    # mean of N(0,1) samples over 12 images: near zero, bounded
    assert abs(mean.mean()) < 0.5


class TestRound4PairImageFixes:
    def test_rand_skip_range_and_check(self, tmp_path):
        """caffe_rng_rand() % rand_skip -> [0, rand_skip-1], and the
        layer CHECKs rand_skip < list size."""
        from mms_answer_selection_tpu.data.pair_image import \
            PairImageDataset

        rng = np.random.default_rng(0)
        for i in range(4):
            np.save(tmp_path / f"i{i}.npy",
                    rng.random((4, 4, 3)).astype(np.float32) * 255)
        rows = "\n".join(f"i{i}.npy i{(i+1) % 4}.npy 0 0 1"
                         for i in range(4))
        (tmp_path / "list.txt").write_text(rows + "\n")
        with pytest.raises(ValueError, match="rand_skip"):
            PairImageDataset(str(tmp_path / "list.txt"), 2,
                             root=str(tmp_path), rand_skip=4)
        seen = {PairImageDataset(str(tmp_path / "list.txt"), 2,
                                 root=str(tmp_path), rand_skip=3,
                                 seed=s).cursor for s in range(40)}
        assert seen <= {0, 1, 2} and 2 in seen  # never == rand_skip

    def test_missing_list_path_raises(self):
        from mms_answer_selection_tpu.data.pair_image import \
            parse_pair_list

        with pytest.raises(FileNotFoundError):
            parse_pair_list("/nonexistent/paris.txt")
        # inline text still parses
        rows = parse_pair_list("a.png b.png 0.5 1.0 1\n")
        assert rows == [("a.png", "b.png", 0.5, 1.0, 1)]
