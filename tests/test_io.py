"""caffe.io equivalents (utils/io.py vs python/caffe/io.py) and the
Classifier / Detector application wrappers (models/classifier.py,
models/detector.py vs python/caffe/classifier.py, detector.py)."""

import numpy as np
import pytest

from mms_answer_selection_tpu.utils import io as cio
from mms_answer_selection_tpu.utils.caffemodel import _field


class TestBlobProto:
    def test_roundtrip(self):
        arr = np.random.default_rng(0).normal(
            size=(2, 3, 4)).astype(np.float32)
        blob = cio.array_to_blobproto(arr)
        np.testing.assert_array_equal(cio.blobproto_to_array(blob), arr)

    def test_diff(self):
        arr = np.ones((3, 2), np.float32)
        diff = np.full((3, 2), 0.5, np.float32)
        blob = cio.array_to_blobproto(arr, diff)
        np.testing.assert_array_equal(
            cio.blobproto_to_array(blob, return_diff=True), diff)

    def test_diff_shape_mismatch(self):
        with pytest.raises(ValueError):
            cio.array_to_blobproto(np.ones((2,)), np.ones((3,)))

    def test_no_diff_raises(self):
        blob = cio.array_to_blobproto(np.ones((2,)))
        with pytest.raises(ValueError, match="diff"):
            cio.blobproto_to_array(blob, return_diff=True)

    def test_legacy_dims(self):
        # hand-built wire: legacy num/channels/height/width, no BlobShape
        # (blobproto_to_array reads both generations, io.py:24-27)
        data = np.arange(24, dtype="<f4")
        wire = (_field(1, 0, 1) + _field(2, 0, 2) + _field(3, 0, 3)
                + _field(4, 0, 4) + _field(5, 2, data.tobytes()))
        out = cio.blobproto_to_array(wire)
        assert out.shape == (1, 2, 3, 4)
        np.testing.assert_array_equal(out.ravel(), data)

    def test_cross_codec_with_mean_file(self, tmp_path):
        """Our public converter parses what save_blob_binaryproto writes
        (and vice versa) — one wire convention across the codebase."""
        from mms_answer_selection_tpu.utils.caffemodel import (
            load_blob_binaryproto, save_blob_binaryproto)

        arr = np.random.default_rng(1).normal(
            size=(1, 3, 4, 4)).astype(np.float32)
        p = tmp_path / "mean.binaryproto"
        save_blob_binaryproto(str(p), arr)
        np.testing.assert_array_equal(
            cio.blobproto_to_array(p.read_bytes()), arr)
        p2 = tmp_path / "mean2.binaryproto"
        p2.write_bytes(cio.array_to_blobproto(arr))
        np.testing.assert_array_equal(load_blob_binaryproto(str(p2)), arr)

    def test_blobprotovector(self):
        arrs = [np.ones((2, 2), np.float32),
                np.arange(3, dtype=np.float32)]
        s = cio.arraylist_to_blobprotovector_str(arrs)
        out = cio.blobprotovector_str_to_arraylist(s)
        assert len(out) == 2
        for a, b in zip(arrs, out):
            np.testing.assert_array_equal(a, b)


class TestDatum:
    def test_uint8_roundtrip(self):
        arr = np.random.default_rng(0).integers(
            0, 256, (3, 4, 5)).astype(np.uint8)
        d = cio.array_to_datum(arr, label=7)
        np.testing.assert_array_equal(cio.datum_to_array(d), arr)
        assert cio.datum_label(d) == 7

    def test_float_roundtrip(self):
        arr = np.random.default_rng(0).normal(
            size=(2, 3, 3)).astype(np.float32)
        d = cio.array_to_datum(arr, label=0)
        np.testing.assert_array_equal(cio.datum_to_array(d), arr)
        assert cio.datum_label(d) == 0

    def test_label_absent_reads_proto_default(self):
        d = cio.array_to_datum(np.zeros((1, 1, 1), np.uint8), label=None)
        assert cio.datum_label(d) == 0

    def test_non_3d_raises(self):
        with pytest.raises(ValueError, match="shape"):
            cio.array_to_datum(np.zeros((2, 2)))


class TestTransformer:
    def _tf(self):
        tf = cio.Transformer({"data": (1, 3, 8, 8)})
        tf.set_transpose("data", (2, 0, 1))
        tf.set_channel_swap("data", (2, 1, 0))
        tf.set_raw_scale("data", 255.0)
        tf.set_mean("data", np.array([10.0, 20.0, 30.0]))
        tf.set_input_scale("data", 0.5)
        return tf

    def test_preprocess_deprocess_inverse(self):
        tf = self._tf()
        im = np.random.default_rng(0).random((8, 8, 3)).astype(np.float32)
        x = tf.preprocess("data", im)
        assert x.shape == (3, 8, 8)
        back = tf.deprocess("data", x)
        np.testing.assert_allclose(back, im, atol=1e-5)

    def test_preprocess_order(self):
        # hand-compute: transpose -> swap -> *raw -> -mean -> *scale
        tf = self._tf()
        im = np.random.default_rng(1).random((8, 8, 3)).astype(np.float32)
        ref = im.transpose(2, 0, 1)[[2, 1, 0], :, :] * 255.0
        ref -= np.array([10.0, 20.0, 30.0])[:, None, None]
        ref *= 0.5
        np.testing.assert_allclose(tf.preprocess("data", im), ref,
                                   rtol=1e-6)

    def test_resizes_on_mismatch(self):
        tf = self._tf()
        im = np.random.default_rng(2).random((16, 16, 3)).astype(
            np.float32)
        assert tf.preprocess("data", im).shape == (3, 8, 8)

    def test_unknown_input_raises(self):
        with pytest.raises(KeyError):
            self._tf().preprocess("nope", np.zeros((8, 8, 3)))

    def test_mean_validation(self):
        tf = cio.Transformer({"data": (1, 3, 8, 8)})
        with pytest.raises(ValueError):
            tf.set_mean("data", np.zeros(2))        # wrong channels
        with pytest.raises(ValueError):
            tf.set_mean("data", np.zeros((3, 4, 4)))  # wrong spatial
        tf.set_mean("data", np.zeros((3, 8, 8)))      # exact: ok
        tf.set_mean("data", np.zeros(3))              # per-channel: ok

    def test_transpose_validation(self):
        tf = cio.Transformer({"data": (1, 3, 8, 8)})
        with pytest.raises(ValueError):
            tf.set_transpose("data", (0, 1))
        with pytest.raises(ValueError):
            tf.set_channel_swap("data", (0, 1))


class TestImageUtils:
    def test_resize_constant_shortcircuit(self):
        im = np.full((5, 5, 3), 2.5, np.float32)
        out = cio.resize_image(im, (9, 7))
        assert out.shape == (9, 7, 3)
        np.testing.assert_array_equal(out, 2.5)

    def test_resize_gradient(self):
        im = np.linspace(0, 1, 64, dtype=np.float32).reshape(8, 8, 1)
        out = cio.resize_image(im, (16, 16))
        assert out.shape == (16, 16, 1)
        assert out.min() >= -1e-3 and out.max() <= 1 + 1e-3

    def test_load_image_npy(self, tmp_path):
        im = np.random.default_rng(0).random((6, 5)).astype(np.float32)
        np.save(tmp_path / "g.npy", im)
        out = cio.load_image(str(tmp_path / "g.npy"))
        assert out.shape == (6, 5, 3)          # gray tiled to RGB
        gray = cio.load_image(str(tmp_path / "g.npy"), color=False)
        assert gray.shape == (6, 5, 1)

    def test_oversample(self):
        rng = np.random.default_rng(3)
        ims = [rng.random((8, 8, 3)).astype(np.float32)
               for _ in range(2)]
        crops = cio.oversample(ims, (4, 4))
        assert crops.shape == (20, 4, 4, 3)
        # crop 0 is the top-left corner; crop 5 is its mirror
        np.testing.assert_array_equal(crops[0], ims[0][:4, :4, :])
        np.testing.assert_array_equal(crops[5], crops[0][:, ::-1, :])
        # crop 4 is the center crop
        np.testing.assert_array_equal(crops[4], ims[0][2:6, 2:6, :])


DEPLOY = """
name: "tinyclf"
input: "data"
input_shape { dim: 1 dim: 3 dim: 8 dim: 8 }
layer { name: "flat" type: "Flatten" bottom: "data" top: "flat" }
layer { name: "fc" type: "InnerProduct" bottom: "flat" top: "fc"
  inner_product_param { num_output: 4
    weight_filler { type: "gaussian" std: 0.1 } } }
layer { name: "prob" type: "Softmax" bottom: "fc" top: "prob" }
"""


class TestClassifier:
    def test_predict_oversample(self, tmp_path):
        from mms_answer_selection_tpu.models import Classifier

        (tmp_path / "deploy.prototxt").write_text(DEPLOY)
        clf = Classifier(str(tmp_path / "deploy.prototxt"),
                         image_dims=(12, 12),
                         mean=np.array([0.1, 0.2, 0.3]),
                         raw_scale=1.0, channel_swap=(2, 1, 0))
        rng = np.random.default_rng(0)
        ims = [rng.random((10, 11, 3)).astype(np.float32)
               for _ in range(2)]
        preds = clf.predict(ims, oversample=True)
        assert preds.shape == (2, 4)
        np.testing.assert_allclose(preds.sum(1), 1.0, rtol=1e-5)

    def test_predict_center_crop(self, tmp_path):
        from mms_answer_selection_tpu.models import Classifier

        (tmp_path / "deploy.prototxt").write_text(DEPLOY)
        clf = Classifier(str(tmp_path / "deploy.prototxt"))
        rng = np.random.default_rng(1)
        preds = clf.predict([rng.random((8, 8, 3)).astype(np.float32)],
                            oversample=False)
        assert preds.shape == (1, 4)
        np.testing.assert_allclose(preds.sum(1), 1.0, rtol=1e-5)

    def test_requires_declared_shape(self, tmp_path):
        from mms_answer_selection_tpu.models import Classifier

        (tmp_path / "d.prototxt").write_text(
            'layer { name: "in" type: "Input" top: "data" }\n'
            'layer { name: "r" type: "ReLU" bottom: "data" top: "y" }\n')
        with pytest.raises(ValueError, match="declare"):
            Classifier(str(tmp_path / "d.prototxt"))


class TestDetector:
    def test_detect_windows(self, tmp_path):
        from mms_answer_selection_tpu.models import Detector

        (tmp_path / "deploy.prototxt").write_text(DEPLOY)
        im = np.random.default_rng(0).random((16, 16, 3)).astype(
            np.float32)
        np.save(tmp_path / "im.npy", im)
        det = Detector(str(tmp_path / "deploy.prototxt"))
        dets = det.detect_windows([
            (str(tmp_path / "im.npy"), [np.array([0, 0, 8, 8]),
                                        np.array([4, 4, 16, 16])])])
        assert len(dets) == 2
        assert dets[0]["prediction"].shape == (4,)
        assert dets[0]["filename"].endswith("im.npy")
        np.testing.assert_array_equal(dets[1]["window"], [4, 4, 16, 16])

    def test_context_pad_crop(self, tmp_path):
        from mms_answer_selection_tpu.models import Detector

        (tmp_path / "deploy.prototxt").write_text(DEPLOY)
        det = Detector(str(tmp_path / "deploy.prototxt"),
                       mean=np.array([0.5, 0.5, 0.5]), context_pad=2)
        im = np.random.default_rng(1).random((16, 16, 3)).astype(
            np.float32)
        crop = det.crop(im, np.array([2, 2, 10, 10]))
        # warped into the full net input with context + mean padding
        assert crop.shape == tuple(det.crop_dims)

    def test_context_pad_at_border_pads_with_mean(self, tmp_path):
        from mms_answer_selection_tpu.models import Detector

        (tmp_path / "deploy.prototxt").write_text(DEPLOY)
        det = Detector(str(tmp_path / "deploy.prototxt"), context_pad=3)
        im = np.random.default_rng(2).random((12, 12, 3)).astype(
            np.float32)
        # window at the image corner: context extends out of bounds,
        # the out-of-bounds region fills with crop_mean (zeros here)
        crop = det.crop(im, np.array([0, 0, 6, 6]))
        assert crop.shape == tuple(det.crop_dims)
        assert np.any(crop == 0.0)


    def test_conv_head_output_squeezed(self, tmp_path):
        """A fully-convolutional head emits (N, 1, 1, C); detect_windows
        squeezes the singleton spatial dims like the reference's
        squeeze(axis=(2, 3)) (python/caffe/detector.py:85)."""
        from mms_answer_selection_tpu.models import Detector

        deploy = """
name: "tinyconv"
input: "data"
input_shape { dim: 1 dim: 3 dim: 8 dim: 8 }
layer { name: "conv" type: "Convolution" bottom: "data" top: "conv"
  convolution_param { num_output: 4 kernel_size: 8
    weight_filler { type: "gaussian" std: 0.1 } } }
"""
        (tmp_path / "deploy.prototxt").write_text(deploy)
        im = np.random.default_rng(3).random((16, 16, 3)).astype(
            np.float32)
        np.save(tmp_path / "im.npy", im)
        det = Detector(str(tmp_path / "deploy.prototxt"))
        dets = det.detect_windows(
            [(str(tmp_path / "im.npy"), [np.array([0, 0, 12, 12])])])
        assert dets[0]["prediction"].shape == (4,)

    def test_full_preproc_crop_mean(self, tmp_path):
        """context_pad with mean + channel_swap + raw_scale + input_scale:
        the crop mean must be mapped back to unprocessed input space
        (python/caffe/detector.py:195-214)."""
        from mms_answer_selection_tpu.models import Detector

        (tmp_path / "deploy.prototxt").write_text(DEPLOY)
        det = Detector(str(tmp_path / "deploy.prototxt"),
                       mean=np.array([25.5, 51.0, 76.5]),
                       input_scale=0.5, raw_scale=255.0,
                       channel_swap=(1, 2, 0), context_pad=2)
        # the mean is given in TRANSFORMED (post-swap) channel order; the
        # crop lives in unprocessed space, so it is unswapped (index(i))
        # and divided by raw_scale: swap (1,2,0) has inverse (2,0,1).
        np.testing.assert_allclose(det.crop_mean[0, 0], [0.3, 0.1, 0.2])
        im = np.random.default_rng(4).random((12, 12, 3)).astype(
            np.float32)
        # corner window: the out-of-bounds context (top-left) is filled
        # with the unprocessed-space mean
        crop = det.crop(im, np.array([0, 0, 5, 5]))
        assert crop.shape == tuple(det.crop_dims)
        np.testing.assert_allclose(crop[0, 0], [0.3, 0.1, 0.2])

    def test_requires_4d_declared_shape(self, tmp_path):
        from mms_answer_selection_tpu.models import Detector

        (tmp_path / "d.prototxt").write_text(
            'input: "data"\n'
            'input_shape { dim: 2 dim: 6 }\n'
            'layer { name: "r" type: "ReLU" bottom: "data" top: "y" }\n')
        with pytest.raises(ValueError, match="4-D"):
            Detector(str(tmp_path / "d.prototxt"))


class TestClassifyDetectCLI:
    def test_qa_classify_npy_stack(self, tmp_path, capsys):
        """`qa classify` ≙ python/classify.py on a .npy image stack."""
        from mms_answer_selection_tpu.cli import main

        (tmp_path / "deploy.prototxt").write_text(DEPLOY)
        ims = np.random.default_rng(0).random((3, 10, 10, 3)).astype(
            np.float32)
        np.save(tmp_path / "ims.npy", ims)
        main(["classify", str(tmp_path / "ims.npy"),
              str(tmp_path / "out.npy"),
              "--model-def", str(tmp_path / "deploy.prototxt"),
              "--images-dim", "12,12"])
        preds = np.load(tmp_path / "out.npy")
        assert preds.shape == (3, 4)
        np.testing.assert_allclose(preds.sum(1), 1.0, rtol=1e-5)

    def test_qa_classify_center_only_single_image(self, tmp_path):
        from mms_answer_selection_tpu.cli import main

        (tmp_path / "deploy.prototxt").write_text(DEPLOY)
        np.save(tmp_path / "im.npy",
                np.random.default_rng(1).random((9, 9, 3)).astype(
                    np.float32))
        # single .npy IMAGE loads via load_image (ndim 3) not as a stack
        main(["classify", str(tmp_path / "im.npy"),
              str(tmp_path / "out.npy"),
              "--model-def", str(tmp_path / "deploy.prototxt"),
              "--images-dim", "8,8", "--center-only"])
        assert np.load(tmp_path / "out.npy").shape == (1, 4)

    def test_qa_detect_csv(self, tmp_path, capsys):
        """`qa detect` ≙ python/detect.py list mode, CSV in/out."""
        import csv

        from mms_answer_selection_tpu.cli import main

        (tmp_path / "deploy.prototxt").write_text(DEPLOY)
        im = np.random.default_rng(2).random((20, 20, 3)).astype(
            np.float32)
        np.save(tmp_path / "im.npy", im)
        with open(tmp_path / "win.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["filename", "ymin", "xmin", "ymax", "xmax"])
            w.writerow([str(tmp_path / "im.npy"), 0, 0, 10, 10])
            w.writerow([str(tmp_path / "im.npy"), 5, 5, 18, 18])
        main(["detect", str(tmp_path / "win.csv"),
              str(tmp_path / "out.csv"),
              "--model-def", str(tmp_path / "deploy.prototxt"),
              "--context-pad", "2"])
        with open(tmp_path / "out.csv", newline="") as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == 2
        assert rows[0]["class0"]
        assert int(rows[1]["ymax"]) == 18

    def test_qa_detect_npz_out(self, tmp_path):
        from mms_answer_selection_tpu.cli import main

        (tmp_path / "deploy.prototxt").write_text(DEPLOY)
        np.save(tmp_path / "im.npy",
                np.random.default_rng(3).random((16, 16, 3)).astype(
                    np.float32))
        import csv

        with open(tmp_path / "win.csv", "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["filename", "ymin", "xmin", "ymax", "xmax"])
            w.writerow([str(tmp_path / "im.npy"), 0, 0, 8, 8])
        main(["detect", str(tmp_path / "win.csv"),
              str(tmp_path / "out.npz"),
              "--model-def", str(tmp_path / "deploy.prototxt"),
              "--context-pad", "0"])
        z = np.load(tmp_path / "out.npz")
        assert z["predictions"].shape == (1, 4)
        assert z["windows"].shape == (1, 4)


class TestLoadImageDtype:
    """img_as_float keys normalization on the SOURCE DTYPE, never the
    pixel values (skimage img_as_float semantics the reference's
    io.load_image relies on)."""

    def test_uint8_mask_scales_by_255(self, tmp_path):
        from PIL import Image

        mask = np.zeros((4, 4), np.uint8)
        mask[0, 0] = 1  # max value 1 but dtype uint8 -> still /255
        Image.fromarray(mask, mode="L").save(tmp_path / "m.png")
        out = cio.load_image(str(tmp_path / "m.png"))
        assert out.shape == (4, 4, 3)
        assert out.max() == pytest.approx(1.0 / 255.0)
        assert out.min() == 0.0

    def test_uint8_full_range(self, tmp_path):
        from PIL import Image

        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (5, 4, 3), dtype=np.uint8)
        Image.fromarray(img, mode="RGB").save(tmp_path / "c.png")
        out = cio.load_image(str(tmp_path / "c.png"))
        np.testing.assert_allclose(out, img.astype(np.float32) / 255.0,
                                   atol=1e-7)


class TestRound4IoFixes:
    def test_negative_datum_label_roundtrip(self):
        from mms_answer_selection_tpu.utils.io import (array_to_datum,
                                                       datum_label)

        d = array_to_datum(np.zeros((1, 2, 2), np.uint8), label=-1)
        assert datum_label(d) == -1  # used to hang in _varint

    def test_blobproto_unpacked_floats(self):
        """A writer emitting repeated floats UNPACKED (one wt-5 field
        per element) is legal wire; the parser must accept it."""
        import struct

        from mms_answer_selection_tpu.utils.io import blobproto_to_array

        def vi(n):
            out = bytearray()
            while True:
                b = n & 0x7F
                n >>= 7
                if n:
                    out.append(b | 0x80)
                else:
                    out.append(b)
                    return bytes(out)

        blob = vi(1 << 3) + vi(1) + vi(2 << 3) + vi(1) \
            + vi(3 << 3) + vi(1) + vi(4 << 3) + vi(2)
        for v in (1.5, -2.0):
            blob += vi((5 << 3) | 5) + struct.pack("<f", v)
        np.testing.assert_allclose(
            blobproto_to_array(blob).ravel(), [1.5, -2.0])

    def test_palette_png_decodes_rgb(self, tmp_path):
        from PIL import Image

        img = np.zeros((4, 4, 3), np.uint8)
        img[0, 0] = [255, 0, 0]
        pal = Image.fromarray(img, "RGB").convert(
            "P", palette=Image.ADAPTIVE)
        pal.save(tmp_path / "p.png")
        out = cio.load_image(str(tmp_path / "p.png"))
        # true colors, not palette indices: red pixel ~1.0 in channel 0
        assert out[0, 0, 0] > 0.9 and out[0, 0, 1] < 0.1
        assert out[1, 1].max() < 0.1

    def test_16bit_png_scale(self, tmp_path):
        from PIL import Image

        arr = np.asarray([[0, 65535], [32768, 0]], np.uint16)
        Image.fromarray(arr, mode="I;16").save(tmp_path / "d.png")
        out = cio.load_image(str(tmp_path / "d.png"), color=False)
        np.testing.assert_allclose(
            out[:, :, 0], np.asarray(arr, np.float32) / 65535.0,
            atol=1e-4)
