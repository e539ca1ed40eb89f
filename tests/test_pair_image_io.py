"""Image decode / transform / mean-file edges of data/pair_image.py.

Covers the real-image (PIL) decode path, the train-time random crop and
mirror of the DataTransformer subset (src/caffe/data_transformer.cpp), the
ImageListDataset rand_skip CHECK (image_data_layer.cpp:60-66), the stock
`path label` list fallback of compute_image_mean
(tools/compute_image_mean.cpp), and load_mean_hwc validation.
"""

import numpy as np
import pytest

from mms_answer_selection_tpu.data.pair_image import (
    ImageListDataset,
    PairImageDataset,
    compute_image_mean,
    load_image,
    load_mean_hwc,
    transform,
)


def _write_png(path, h, w, value=128, color=True):
    from PIL import Image

    arr = np.full((h, w, 3) if color else (h, w), value, np.uint8)
    Image.fromarray(arr).save(str(path))


class TestLoadImage:
    def test_png_color(self, tmp_path):
        p = tmp_path / "img.png"
        _write_png(p, 6, 4, value=200)
        arr = load_image(str(p))
        # HWC float32 in [0, 255] — the cv::Mat convention, NOT [0, 1]
        assert arr.shape == (6, 4, 3) and arr.dtype == np.float32
        assert float(arr.max()) == 200.0

    def test_png_resize(self, tmp_path):
        p = tmp_path / "img.png"
        _write_png(p, 6, 4)
        arr = load_image(str(p), new_height=8, new_width=10)
        assert arr.shape == (8, 10, 3)

    def test_png_grayscale(self, tmp_path):
        p = tmp_path / "img.png"
        _write_png(p, 5, 5, value=77, color=False)
        arr = load_image(str(p), is_color=False)
        assert arr.shape == (5, 5, 1)
        assert float(arr[0, 0, 0]) == 77.0

    def test_npy_2d_gets_channel_axis(self, tmp_path):
        p = tmp_path / "img.npy"
        np.save(p, np.ones((4, 4), np.float32))
        assert load_image(str(p)).shape == (4, 4, 1)

    def test_npy_size_mismatch_raises(self, tmp_path):
        p = tmp_path / "img.npy"
        np.save(p, np.ones((4, 4, 1), np.float32))
        with pytest.raises(ValueError, match="target-sized"):
            load_image(str(p), new_height=8, new_width=8)


class TestTransformTrainPaths:
    def test_random_crop_stays_in_bounds(self):
        arr = np.arange(8 * 8 * 1, dtype=np.float32).reshape(8, 8, 1)
        rng = np.random.default_rng(0)
        seen = set()
        for _ in range(20):
            out = transform(arr, crop_size=5, rng=rng, train=True)
            assert out.shape == (5, 5, 1)
            # every crop is a contiguous window of the source
            y0 = int(out[0, 0, 0]) // 8
            x0 = int(out[0, 0, 0]) % 8
            np.testing.assert_array_equal(out, arr[y0:y0 + 5, x0:x0 + 5])
            seen.add((y0, x0))
        assert len(seen) > 1  # actually random, not center

    def test_center_crop_at_test(self):
        arr = np.arange(64, dtype=np.float32).reshape(8, 8, 1)
        out = transform(arr, crop_size=4, train=False)
        np.testing.assert_array_equal(out, arr[2:6, 2:6])

    def test_mirror_flips_half_the_time(self):
        arr = np.arange(6, dtype=np.float32).reshape(1, 6, 1)
        rng = np.random.default_rng(3)
        flipped = sum(
            float(transform(arr, mirror=True, rng=rng)[0, 0, 0]) == 5.0
            for _ in range(100))
        assert 20 < flipped < 80  # ~Bernoulli(0.5)

    def test_mirror_without_rng_is_noop(self):
        arr = np.arange(6, dtype=np.float32).reshape(1, 6, 1)
        np.testing.assert_array_equal(transform(arr, mirror=True), arr)


class TestDatasetChecks:
    def test_pair_empty_list_raises(self, tmp_path):
        p = tmp_path / "empty.txt"
        p.write_text("\n")
        with pytest.raises(ValueError, match="empty"):
            PairImageDataset(str(p), 2)

    def test_imagelist_empty_raises(self, tmp_path):
        p = tmp_path / "empty.txt"
        p.write_text("")
        with pytest.raises(ValueError, match="empty"):
            ImageListDataset(str(p), 2)

    def test_imagelist_rand_skip(self, tmp_path):
        imgs = []
        for i in range(6):
            q = tmp_path / f"i{i}.npy"
            np.save(q, np.full((4, 4, 1), i, np.float32))
            imgs.append(f"{q} {i}")
        lst = tmp_path / "list.txt"
        lst.write_text("\n".join(imgs) + "\n")
        # CHECK_GT(lines_.size(), skip): skip >= size raises
        with pytest.raises(ValueError, match="rand_skip"):
            ImageListDataset(str(lst), 2, rand_skip=6)
        ds = ImageListDataset(str(lst), 2, rand_skip=3, seed=1)
        assert 0 <= ds.cursor < 3
        batch = next(ds)
        assert batch["data"].shape == (2, 4, 4, 1)
        assert batch["label"].shape == (2,)


def test_compute_mean_stock_image_list(tmp_path):
    # `path label` rows (the stock ImageData list format) hit the fallback
    # branch; mean is over the single image column.
    a = tmp_path / "a.npy"
    b = tmp_path / "b.npy"
    np.save(a, np.full((4, 4, 1), 10, np.float32))
    np.save(b, np.full((4, 4, 1), 30, np.float32))
    lst = tmp_path / "list.txt"
    lst.write_text(f"{a} 0\n{b} 1\n")
    mean = compute_image_mean(str(lst))
    np.testing.assert_allclose(mean, np.full((4, 4, 1), 20, np.float32))


def test_load_mean_hwc_rejects_bad_rank(tmp_path):
    from mms_answer_selection_tpu.utils.caffemodel import (
        save_blob_binaryproto,
    )

    p = tmp_path / "mean.binaryproto"
    # leading dims of 1 are stripped, so only a blob with a real 4th axis
    # (batch > 1) fails the (1, C, H, W) contract
    save_blob_binaryproto(str(p), np.ones((2, 3, 4, 5), np.float32))
    with pytest.raises(ValueError, match="shape"):
        load_mean_hwc(str(p))
