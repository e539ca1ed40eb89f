"""Native packed-store tests: format roundtrip, threaded gather,
deterministic shuffle, background prefetch ring, sharding."""

import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")

from mms_answer_selection_tpu.native import (  # noqa: E402
    NativePrefetcher,
    PackedStore,
    write_mmsp,
)
from mms_answer_selection_tpu.native.packed_format import native_shuffle  # noqa: E402

rng = np.random.default_rng(13)


@pytest.fixture(scope="module")
def store_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("mmsp") / "data.mmsp"
    arrays = {
        "question": rng.integers(0, 100, (500, 12)).astype(np.int32),
        "label": rng.integers(0, 2, 500).astype(np.int32),
        "overlap_feat": rng.random((500, 2)).astype(np.float32),
    }
    write_mmsp(str(path), arrays)
    return str(path), arrays


class TestStore:
    def test_open_and_metadata(self, store_path):
        path, arrays = store_path
        s = PackedStore(path)
        assert s.n_rows == 500
        assert set(s.fields) == {"question", "label", "overlap_feat"}
        assert s.fields["question"][2] == 12
        s.close()

    def test_gather_matches_numpy(self, store_path):
        path, arrays = store_path
        s = PackedStore(path)
        idx = rng.integers(0, 500, 64)
        for field in arrays:
            got = s.gather(field, idx)
            expect = arrays[field][idx]
            if expect.ndim == 1:
                expect = expect[:, None]
            np.testing.assert_array_equal(got, expect)
        s.close()

    def test_gather_multithreaded_large(self, store_path):
        path, arrays = store_path
        s = PackedStore(path)
        idx = rng.integers(0, 500, 5000)  # > threading threshold
        got = s.gather("question", idx, threads=4)
        np.testing.assert_array_equal(got, arrays["question"][idx])
        s.close()

    def test_gather_out_of_range_rejected(self, store_path):
        path, _ = store_path
        s = PackedStore(path)
        with pytest.raises(IndexError):
            s.gather("label", np.asarray([0, 10_000]))
        s.close()


class TestShuffle:
    def test_deterministic_permutation(self):
        a = native_shuffle(100, seed=7)
        b = native_shuffle(100, seed=7)
        c = native_shuffle(100, seed=8)
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)
        assert sorted(a.tolist()) == list(range(100))


class TestPrefetcher:
    def test_batches_stream_and_cover_epoch(self, store_path):
        path, arrays = store_path
        s = PackedStore(path)
        pf = NativePrefetcher(s, ["question", "label"], batch_size=100,
                              seed=3, depth=2)
        seen = []
        for _ in range(5):  # one epoch of 500 rows
            b = pf.next()
            assert b["question"].shape == (100, 12)
            assert b["question"].dtype == np.int32
            seen.append(b["label"][:, 0])
        pf.close()
        s.close()

    def test_rows_are_real_rows(self, store_path):
        path, arrays = store_path
        s = PackedStore(path)
        pf = NativePrefetcher(s, ["question"], batch_size=50, seed=1)
        b = pf.next()
        # every gathered row must exist verbatim in the source
        src = {tuple(r) for r in arrays["question"]}
        for row in b["question"]:
            assert tuple(row) in src
        pf.close()
        s.close()

    def test_shard_partition(self, store_path):
        path, arrays = store_path
        s = PackedStore(path)
        pf0 = NativePrefetcher(s, ["label"], batch_size=250, seed=5,
                               shuffle=False, shard=(0, 2))
        pf1 = NativePrefetcher(s, ["label"], batch_size=250, seed=5,
                               shuffle=False, shard=(1, 2))
        b0 = pf0.next()["label"]
        b1 = pf1.next()["label"]
        np.testing.assert_array_equal(b0[:, 0], arrays["label"][0::2])
        np.testing.assert_array_equal(b1[:, 0], arrays["label"][1::2])
        pf0.close()
        pf1.close()
        s.close()


class TestZeroCopy:
    def test_acquire_view_matches_next(self, store_path):
        """Same seed -> acquire_view yields byte-identical batches to the
        copying next() path, without the slot-out memcpy."""
        path, _ = store_path
        s1, s2 = PackedStore(path), PackedStore(path)
        fields = ["question", "label", "overlap_feat"]
        p1 = NativePrefetcher(s1, fields, 32, seed=5)
        p2 = NativePrefetcher(s2, fields, 32, seed=5)
        for _ in range(5):
            copied = p1.next()
            step, views = p2.acquire_view()
            for f in fields:
                np.testing.assert_array_equal(views[f], copied[f])
            p2.release()
        p1.close(); p2.close(); s1.close(); s2.close()

    def test_double_acquire_rejected(self, store_path):
        path, _ = store_path
        s = PackedStore(path)
        p = NativePrefetcher(s, ["label"], 16, seed=1)
        p.acquire_view()
        with pytest.raises(RuntimeError):
            p.acquire_view()
        p.release()
        p.acquire_view()  # release unblocks the single-consumer slot
        p.release()
        p.close(); s.close()

    def test_next_device_lands_on_device(self, store_path):
        import jax
        import jax.numpy as jnp
        path, _ = store_path
        s1, s2 = PackedStore(path), PackedStore(path)
        fields = ["question", "overlap_feat"]
        p1 = NativePrefetcher(s1, fields, 32, seed=9)
        p2 = NativePrefetcher(s2, fields, 32, seed=9)
        for _ in range(3):
            host = p1.next()
            dev = p2.next_device()
            for f in fields:
                assert isinstance(dev[f], jax.Array)
                np.testing.assert_array_equal(np.asarray(dev[f]), host[f])
            # device batch is safe to use after the slot was recycled
            assert jnp.sum(dev["overlap_feat"]).dtype == jnp.float32
        p1.close(); p2.close(); s1.close(); s2.close()


class TestRound4NativeGuards:
    def test_native_shuffle_zero_raises(self):
        from mms_answer_selection_tpu.native.packed_format import \
            native_shuffle

        with pytest.raises(ValueError, match="n > 0"):
            native_shuffle(0, 1)

    def test_empty_shard_prefetcher_raises(self, tmp_path):
        from mms_answer_selection_tpu.native.packed_format import (
            NativePrefetcher, PackedStore, write_mmsp)

        path = str(tmp_path / "t.mmsp")
        write_mmsp(path, {"x": np.arange(6, dtype=np.int32).reshape(3, 2)})
        store = PackedStore(path)
        with pytest.raises(ValueError, match="empty"):
            NativePrefetcher(store, ["x"], 2, shard=(3, 4))

    def test_long_field_name_rejected(self, tmp_path):
        from mms_answer_selection_tpu.native.packed_format import \
            write_mmsp

        with pytest.raises(ValueError, match="31"):
            write_mmsp(str(tmp_path / "t.mmsp"),
                       {"f" * 40: np.zeros((2, 2), np.int32)})


class TestCorruptFiles:
    """mmsp_open must bounds-check the header: a truncated or corrupted
    file fails to open instead of faulting inside a later gather."""

    def _valid_bytes(self, tmp_path):
        path = str(tmp_path / "v.mmsp")
        write_mmsp(path, {"x": np.arange(12, dtype=np.int32).reshape(3, 4),
                          "y": np.ones((3, 2), np.float32)})
        with open(path, "rb") as f:
            return path, bytearray(f.read())

    def _expect_open_fail(self, tmp_path, blob, name):
        p = str(tmp_path / name)
        with open(p, "wb") as f:
            f.write(blob)
        with pytest.raises(IOError):
            PackedStore(p)

    def test_truncated_header(self, tmp_path):
        _, raw = self._valid_bytes(tmp_path)
        self._expect_open_fail(tmp_path, raw[:10], "trunc_hdr.mmsp")

    def test_truncated_field_table(self, tmp_path):
        _, raw = self._valid_bytes(tmp_path)
        self._expect_open_fail(tmp_path, raw[:20 + 30], "trunc_tbl.mmsp")

    def test_field_count_lies(self, tmp_path):
        import struct as _struct
        _, raw = self._valid_bytes(tmp_path)
        raw[8:12] = _struct.pack("<I", 10_000)  # n_fields way past EOF
        self._expect_open_fail(tmp_path, raw, "lie_count.mmsp")

    def test_data_extent_past_eof(self, tmp_path):
        _, raw = self._valid_bytes(tmp_path)
        self._expect_open_fail(tmp_path, raw[:len(raw) // 2],
                               "trunc_data.mmsp")

    def test_bad_dtype(self, tmp_path):
        import struct as _struct
        _, raw = self._valid_bytes(tmp_path)
        raw[20 + 32:20 + 36] = _struct.pack("<I", 77)  # unknown dtype tag
        self._expect_open_fail(tmp_path, raw, "bad_dtype.mmsp")

    def test_valid_still_opens(self, tmp_path):
        path, _ = self._valid_bytes(tmp_path)
        s = PackedStore(path)
        assert s.n_rows == 3 and set(s.fields) == {"x", "y"}
        np.testing.assert_array_equal(
            s.gather("x", [2, 0]),
            np.arange(12, dtype=np.int32).reshape(3, 4)[[2, 0]])
        s.close()
