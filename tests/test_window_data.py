"""WindowData layer (data/window_data.py vs
src/caffe/layers/window_data_layer.cpp): window-file parsing, fg/bg
sampling, context-pad crop/warp, GraphSolver feed wiring."""

import numpy as np
import pytest

from mms_answer_selection_tpu.data.window_data import (WindowListDataset,
                                                       parse_window_file)


def _write_corpus(tmp_path, n_images=3, size=16, seed=0):
    rng = np.random.default_rng(seed)
    lines = []
    for i in range(n_images):
        img = rng.integers(0, 256, (size, size, 3)).astype(np.float32)
        np.save(tmp_path / f"im{i}.npy", img)
        lines += [f"# {i}", str(tmp_path / f"im{i}.npy"),
                  "3", str(size), str(size), "3",
                  # one fg (label 1, overlap .8), one mid (dropped),
                  # one bg (overlap .1, label forced 0)
                  "1 0.8 0 0 7 7",
                  "2 0.55 2 2 9 9" if i == 0 else "2 0.7 2 2 9 9",
                  "3 0.1 4 4 11 11"]
    p = tmp_path / "windows.txt"
    p.write_text("\n".join(lines) + "\n")
    return p


class TestParse:
    def test_partition(self, tmp_path):
        src = _write_corpus(tmp_path)
        db, fg, bg = parse_window_file(str(src), fg_threshold=0.6,
                                       bg_threshold=0.3)
        assert len(db) == 3
        # image 0's 0.55 window falls between thresholds -> dropped;
        # images 1,2 have 0.7 ones kept as fg
        assert len(fg) == 3 + 2
        assert len(bg) == 3
        assert all(w[1] == 0 and w[2] == 0.0 for w in bg)  # forced 0
        assert all(w[1] > 0 for w in fg)

    def test_fg_label_zero_rejected(self, tmp_path):
        (tmp_path / "im0.npy").write_bytes(b"")
        (tmp_path / "w.txt").write_text(
            f"# 0\n{tmp_path}/im0.npy\n3 8 8\n1\n0 0.9 0 0 3 3\n")
        with pytest.raises(ValueError, match="label"):
            parse_window_file(str(tmp_path / "w.txt"))

    def test_nonsequential_index_rejected(self, tmp_path):
        (tmp_path / "w.txt").write_text(
            "# 5\nx.npy\n3 8 8\n0\n")
        with pytest.raises(ValueError, match="non-sequential"):
            parse_window_file(str(tmp_path / "w.txt"))


class TestSampling:
    def test_batch_composition(self, tmp_path):
        src = _write_corpus(tmp_path)
        ds = WindowListDataset(str(src), 8, crop_size=8,
                               fg_fraction=0.25, seed=1)
        b = next(ds)
        assert b["data"].shape == (8, 8, 8, 3)
        assert b["label"].shape == (8,)
        # bg first (6 = 8 - 8*0.25), then 2 fg (window_data_layer:330)
        np.testing.assert_array_equal(b["label"][:6], 0)
        assert np.all(b["label"][6:] > 0)

    def test_seed_deterministic(self, tmp_path):
        src = _write_corpus(tmp_path)
        a = next(WindowListDataset(str(src), 6, crop_size=8, seed=3))
        b = next(WindowListDataset(str(src), 6, crop_size=8, seed=3))
        np.testing.assert_array_equal(a["data"], b["data"])
        np.testing.assert_array_equal(a["label"], b["label"])

    def test_needs_both_classes(self, tmp_path):
        (tmp_path / "im0.npy").write_bytes(b"")
        (tmp_path / "w.txt").write_text(
            f"# 0\n{tmp_path}/im0.npy\n3 8 8\n1\n1 0.9 0 0 3 3\n")
        with pytest.raises(ValueError, match="foreground and"):
            WindowListDataset(str(tmp_path / "w.txt"), 4, crop_size=8)


class TestCrop:
    def test_plain_warp_identity(self, tmp_path):
        """crop_size == window size, no context: the crop IS the image
        region."""
        src = _write_corpus(tmp_path)
        # fg_threshold 0.75 keeps only the (0,0)-(7,7) label-1 windows
        ds = WindowListDataset(str(src), 2, crop_size=8, fg_fraction=1.0,
                               fg_threshold=0.75, seed=0)
        b = next(ds)  # all fg: window (0,0)-(7,7) of some image
        img_region = [np.load(tmp_path / f"im{i}.npy")[:8, :8]
                      for i in range(3)]
        match = any(np.allclose(b["data"][0], r, atol=1e-4)
                    for r in img_region)
        assert match

    def test_context_pad_border_zeros(self, tmp_path):
        """A corner window with context padding leaves the out-of-image
        border at ZERO (the canvas is zeroed and padding is never
        mean-subtracted, window_data_layer.cpp:302,394)."""
        src = _write_corpus(tmp_path)
        ds = WindowListDataset(str(src), 2, crop_size=8, fg_fraction=1.0,
                               context_pad=2, mean=(10.0, 10.0, 10.0),
                               seed=0)
        b = next(ds)
        # fg windows start at (0,0): context extends out of bounds
        assert np.all(b["data"][0][0, 0] == 0.0)

    def test_square_mode_square_region(self, tmp_path):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (32, 32, 3)).astype(np.float32)
        np.save(tmp_path / "im0.npy", img)
        (tmp_path / "w.txt").write_text(
            f"# 0\n{tmp_path}/im0.npy\n3 32 32\n2\n"
            "1 0.9 8 8 23 11\n"      # wide fg window (16 x 4)
            "2 0.1 0 0 3 3\n")
        ds = WindowListDataset(str(tmp_path / "w.txt"), 2, crop_size=8,
                               fg_fraction=1.0, crop_mode="square",
                               seed=0)
        b = next(ds)
        assert b["data"].shape == (2, 8, 8, 3)
        assert np.isfinite(b["data"]).all()

    def test_mean_and_scale(self, tmp_path):
        src = _write_corpus(tmp_path)
        raw = next(WindowListDataset(str(src), 2, crop_size=8,
                                     fg_fraction=1.0, seed=5))
        tx = next(WindowListDataset(str(src), 2, crop_size=8,
                                    fg_fraction=1.0, seed=5,
                                    mean=(5.0, 5.0, 5.0), scale=0.5))
        np.testing.assert_allclose(tx["data"],
                                   (raw["data"] - 5.0) * 0.5, atol=1e-4)


class TestGraphSolverFeed:
    def test_window_data_net_trains(self, tmp_path):
        from mms_answer_selection_tpu.training.graph_solver import \
            GraphSolver

        src = _write_corpus(tmp_path)
        net = f"""
        layer {{ name: "wd" type: "WindowData" top: "data" top: "label"
          window_data_param {{ source: "{src}" batch_size: 8
            fg_fraction: 0.25 context_pad: 2 }}
          transform_param {{ crop_size: 8 mirror: true }} }}
        layer {{ name: "flat" type: "Flatten" bottom: "data" top: "flat" }}
        layer {{ name: "fc" type: "InnerProduct" bottom: "flat" top: "fc"
          inner_product_param {{ num_output: 4
            weight_filler {{ type: "xavier" }} }} }}
        layer {{ name: "loss" type: "SoftmaxWithLoss" bottom: "fc"
          bottom: "label" top: "loss" }}
        """
        (tmp_path / "net.prototxt").write_text(net)
        (tmp_path / "solver.prototxt").write_text(
            'net: "net.prototxt"\nbase_lr: 0.01\nlr_policy: "fixed"\n'
            'momentum: 0.9\nmax_iter: 6\ntest_interval: 0\n'
            'snapshot_prefix: "s"\n')
        gs = GraphSolver(str(tmp_path / "solver.prototxt"))
        smoothed = gs.step(6)
        assert np.isfinite(smoothed)


class TestParseErrors:
    def test_empty_file(self, tmp_path):
        (tmp_path / "w.txt").write_text("")
        with pytest.raises(ValueError, match="empty"):
            parse_window_file(str(tmp_path / "w.txt"))

    def test_missing_hash_separator(self, tmp_path):
        (tmp_path / "w.txt").write_text("0\nx.npy\n3 8 8\n0\n")
        with pytest.raises(ValueError, match="separator"):
            parse_window_file(str(tmp_path / "w.txt"))


class TestInitValidation:
    def test_crop_size_required(self, tmp_path):
        src = _write_corpus(tmp_path)
        with pytest.raises(ValueError, match="crop_size"):
            WindowListDataset(str(src), 4, crop_size=0)

    def test_unknown_crop_mode(self, tmp_path):
        src = _write_corpus(tmp_path)
        with pytest.raises(ValueError, match="crop_mode"):
            WindowListDataset(str(src), 4, crop_size=8,
                              crop_mode="jitter")


class TestMeanImage:
    def test_full_mean_image_center_crop_offset(self, tmp_path):
        """A full mean IMAGE (H, W, C) subtracts the center-cropped
        region aligned with the canvas placement
        (window_data_layer.cpp:404-415)."""
        src = _write_corpus(tmp_path, n_images=1)
        mean = np.full((12, 12, 3), 10.0, np.float32)
        mean[4:8, 4:8] = 50.0  # distinctive center region
        ds = WindowListDataset(str(src), 2, crop_size=8, mean=mean,
                               fg_threshold=0.6, bg_threshold=0.3, seed=3)
        batch = next(ds)
        x = batch["data"]
        assert x.shape == (2, 8, 8, 3)
        # plain warp, no padding: subtracted mean is mean[2:10, 2:10]
        img = np.load(tmp_path / "im0.npy")
        from mms_answer_selection_tpu.utils.io import resize_image

        found_match = False
        for row_i in range(2):
            lbl = batch["label"][row_i]
            for w in (ds.fg + ds.bg):
                if w[1] != lbl:
                    continue
                x1, y1, x2, y2 = w[3], w[4], w[5], w[6]
                patch = resize_image(img[y1:y2 + 1, x1:x2 + 1], (8, 8))
                want = patch - mean[2:10, 2:10]
                if np.allclose(x[row_i], want, atol=1e-4):
                    found_match = True
        assert found_match

    def test_lru_eviction(self, tmp_path):
        src = _write_corpus(tmp_path, n_images=3)
        ds = WindowListDataset(str(src), 2, crop_size=8,
                               fg_threshold=0.6, bg_threshold=0.3)
        old_cap = WindowListDataset._LRU_CAP
        WindowListDataset._LRU_CAP = 1
        try:
            for i in range(3):
                ds._image(i)
            assert len(ds._cache) == 1  # evicted down to cap
        finally:
            WindowListDataset._LRU_CAP = old_cap
