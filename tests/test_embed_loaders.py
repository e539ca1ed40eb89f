"""Pretrained-vector file parsers and filler initializers.

Pins ``ops.embed.load_pretrained_vectors`` against the reference's three
weight_source formats (src/caffe/layers/embed_layer.cpp:46-110):

* ``.txt`` — ``word f0 f1 ... fD-1`` per line (fscanf %s then D %f),
* ``.all`` — header ``bias K-1 N-1`` then ``index D-floats word`` records,
* ``.bin`` — word2vec binary: ascii header ``vocab dim``, then per record
  the word bytes terminated by ' ' (skipping '\\n') followed by dim raw
  little-endian float32s.

Plus the fillers' default-fan_in paths (include/caffe/filler.hpp).
"""

import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mms_answer_selection_tpu.ops.embed import (
    embed_init,
    load_pretrained_vectors,
)
from mms_answer_selection_tpu.utils import fillers


class TestTxtLoader:
    def test_basic(self, tmp_path):
        p = tmp_path / "vecs.txt"
        p.write_text("hello 1 2 3\nworld 4 5 6\n")
        words, vecs = load_pretrained_vectors(str(p), 3)
        assert words == ["hello", "world"]
        np.testing.assert_array_equal(vecs, [[1, 2, 3], [4, 5, 6]])
        assert vecs.dtype == np.float32

    def test_short_line_skipped(self, tmp_path):
        # A truncated line (fewer than dim floats) is dropped, not padded.
        p = tmp_path / "vecs.txt"
        p.write_text("ok 1 2 3\nbad 1 2\nalso_ok 7 8 9\n")
        words, vecs = load_pretrained_vectors(str(p), 3)
        assert words == ["ok", "also_ok"]
        np.testing.assert_array_equal(vecs, [[1, 2, 3], [7, 8, 9]])

    def test_empty_file(self, tmp_path):
        p = tmp_path / "vecs.txt"
        p.write_text("")
        words, vecs = load_pretrained_vectors(str(p), 3)
        assert words == [] and vecs.shape == (0, 3)


class TestAllLoader:
    def test_header_and_records(self, tmp_path):
        # Reference format (embed_layer.cpp:63-79): "bias K-1 N-1" header,
        # then "<row-index> <N floats> <word>" records.
        p = tmp_path / "vecs.all"
        p.write_text(
            "0.5 9 2\n"
            "0 1.0 2.0 3.0 alpha\n"
            "1 4.0 5.0 6.0 beta\n"
        )
        words, vecs = load_pretrained_vectors(str(p), 3)
        assert words == ["alpha", "beta"]
        np.testing.assert_array_equal(vecs, [[1, 2, 3], [4, 5, 6]])

    def test_trailing_partial_record_dropped(self, tmp_path):
        p = tmp_path / "vecs.all"
        p.write_text("0.5 9 2\n0 1.0 2.0 3.0 alpha\n1 4.0 5.0\n")
        words, vecs = load_pretrained_vectors(str(p), 3)
        assert words == ["alpha"]
        np.testing.assert_array_equal(vecs, [[1, 2, 3]])

    def test_empty_body(self, tmp_path):
        p = tmp_path / "vecs.all"
        p.write_text("0.5 9 2\n")
        words, vecs = load_pretrained_vectors(str(p), 3)
        assert words == [] and vecs.shape == (0, 3)


class TestBinLoader:
    @staticmethod
    def _write_bin(path, dim, records, sep=b"\n"):
        """records: list of (word, floats). word2vec.c writes
        '<word> <floats>\\n' per record with a '<vocab> <dim>\\n' header."""
        with open(path, "wb") as f:
            f.write(f"{len(records)} {dim}\n".encode())
            for word, floats in records:
                f.write(word.encode() + b" ")
                f.write(struct.pack(f"<{dim}f", *floats))
                f.write(sep)

    def test_word2vec_binary(self, tmp_path):
        p = tmp_path / "vecs.bin"
        self._write_bin(p, 3, [("cat", [1, 2, 3]), ("dog", [4, 5, 6])])
        words, vecs = load_pretrained_vectors(str(p), 3)
        # the record separator '\n' is skipped while scanning the next word
        # (embed_layer.cpp:92-97: chars == '\n' don't advance the pointer)
        assert words == ["cat", "dog"]
        np.testing.assert_allclose(vecs, [[1, 2, 3], [4, 5, 6]])

    def test_no_record_separator(self, tmp_path):
        # Some exporters omit the trailing newline; parser must not eat a
        # byte of the next word.
        p = tmp_path / "vecs.bin"
        self._write_bin(p, 2, [("a", [1, 2]), ("b", [3, 4])], sep=b"")
        words, vecs = load_pretrained_vectors(str(p), 2)
        assert words == ["a", "b"]
        np.testing.assert_allclose(vecs, [[1, 2], [3, 4]])

    def test_dim_mismatch_raises(self, tmp_path):
        p = tmp_path / "vecs.bin"
        self._write_bin(p, 3, [("x", [1, 2, 3])])
        with pytest.raises(ValueError, match="dim"):
            load_pretrained_vectors(str(p), 4)


class TestEmbedInitValidation:
    def test_pretrained_dim_mismatch(self):
        with pytest.raises(ValueError, match="dim"):
            embed_init(jax.random.PRNGKey(0), 10, 4,
                       pretrained=np.zeros((3, 5), np.float32))

    def test_pretrained_too_many_rows(self):
        with pytest.raises(ValueError, match="rows"):
            embed_init(jax.random.PRNGKey(0), 2, 4,
                       pretrained=np.zeros((3, 4), np.float32))

    def test_no_bias(self):
        params = embed_init(jax.random.PRNGKey(0), 5, 4, bias_term=False)
        assert set(params) == {"w"}


class TestFillers:
    def test_xavier_default_fan_in(self):
        # filler.hpp XavierFiller: fan_in = count / num = prod(shape[1:]).
        w = fillers.xavier(jax.random.PRNGKey(0), (7, 4, 3))
        s = (3.0 / 12.0) ** 0.5
        assert float(jnp.max(jnp.abs(w))) <= s
        # explicit fan_in overrides
        w2 = fillers.xavier(jax.random.PRNGKey(0), (7, 4, 3), fan_in=3)
        assert float(jnp.max(jnp.abs(w2))) <= 1.0
        assert float(jnp.max(jnp.abs(w2))) > s  # wider range actually used

    def test_msra_default_fan_in(self):
        # MSRAFiller: normal(0, sqrt(2/fan_in)); check the std statistically.
        w = fillers.msra(jax.random.PRNGKey(1), (512, 64))
        want = (2.0 / 64.0) ** 0.5
        got = float(jnp.std(w))
        assert abs(got - want) / want < 0.05

    def test_positive_unitball(self):
        w = fillers.positive_unitball(jax.random.PRNGKey(2), (5, 3, 2))
        assert float(jnp.min(w)) >= 0.0
        sums = jnp.sum(w.reshape(5, -1), axis=1)
        np.testing.assert_allclose(np.asarray(sums), 1.0, rtol=1e-5)

    def test_bilinear_kernel(self):
        # BilinearFiller: the classic 2x-upsampling kernel for k=4 has
        # corner weight 1/16 and center weights 9/16 * ... known values.
        k = fillers.bilinear((1, 1, 4, 4))
        k2 = np.asarray(k[0, 0])
        np.testing.assert_allclose(k2[0, 0], 0.0625, rtol=1e-6)
        np.testing.assert_allclose(k2[1, 1], 0.5625, rtol=1e-6)
        assert np.allclose(k2, k2.T)
