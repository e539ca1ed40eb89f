"""LMDB ingest: utils/lmdb_io.py (pure-Python mdb reader + bulk writer)
+ the `Data` prototxt layer feed (db_lmdb.cpp:1-113, data_layer.cpp,
data_reader.cpp:79-117 semantics)."""

import os
import struct

import numpy as np
import pytest

from mms_answer_selection_tpu.utils.io import array_to_datum
from mms_answer_selection_tpu.utils.lmdb_io import (LmdbReader, write_lmdb)


class TestRoundtrip:
    def test_small(self, tmp_path):
        rows = [(f"k{i:03d}".encode(), f"value-{i}".encode() * (i % 5 + 1))
                for i in range(20)]
        path = write_lmdb(str(tmp_path / "env"), rows)
        assert os.path.basename(path) == "data.mdb"
        r = LmdbReader(str(tmp_path / "env"))
        assert len(r) == 20
        assert list(r.items()) == sorted(rows)

    def test_unsorted_input_sorts(self, tmp_path):
        rows = [(b"zz", b"1"), (b"aa", b"2"), (b"mm", b"3")]
        write_lmdb(str(tmp_path / "env"), rows)
        assert [k for k, _ in LmdbReader(str(tmp_path / "env")).items()] \
            == [b"aa", b"mm", b"zz"]

    def test_multi_level_btree(self, tmp_path):
        """Enough entries to force leaves AND at least one branch level;
        page accounting in the meta must match."""
        rng = np.random.default_rng(0)
        rows = [(f"{i:06d}".encode(), rng.bytes(120)) for i in range(2000)]
        write_lmdb(str(tmp_path / "env"), rows)
        r = LmdbReader(str(tmp_path / "env"))
        assert r.depth >= 2 and r.branch_pages >= 1
        got = list(r.items())
        assert got == rows  # already sorted
        assert r.leaf_pages > 10

    def test_overflow_values(self, tmp_path):
        """Values past the inline node limit ride overflow pages
        (F_BIGDATA), including multi-page ones."""
        rng = np.random.default_rng(1)
        big1 = rng.bytes(3000)       # < 1 page of data
        big2 = rng.bytes(20000)      # ~5 pages
        rows = [(b"a", b"small"), (b"b", big1), (b"c", big2),
                (b"d", b"also-small")]
        write_lmdb(str(tmp_path / "env"), rows)
        r = LmdbReader(str(tmp_path / "env"))
        assert r.overflow_pages >= 6
        assert dict(r.items()) == dict(rows)

    def test_empty_db(self, tmp_path):
        write_lmdb(str(tmp_path / "env"), [])
        r = LmdbReader(str(tmp_path / "env"))
        assert len(r) == 0 and list(r.items()) == []

    def test_explicit_mdb_file_path(self, tmp_path):
        p = write_lmdb(str(tmp_path / "direct.mdb"), [(b"k", b"v")])
        assert p.endswith("direct.mdb")
        assert list(LmdbReader(p).items()) == [(b"k", b"v")]

    def test_bad_magic_raises(self, tmp_path):
        (tmp_path / "data.mdb").write_bytes(b"\0" * 8192)
        with pytest.raises(ValueError, match="magic"):
            LmdbReader(str(tmp_path))

    def test_meta_structure(self, tmp_path):
        """The emitted metas carry the mdb v1 wire layout: magic at
        page offset 16, page size in the FREE db's md_pad, twin metas."""
        write_lmdb(str(tmp_path / "env"), [(b"k", b"v")])
        buf = (tmp_path / "env" / "data.mdb").read_bytes()
        for base in (16, 4096 + 16):
            magic, version = struct.unpack_from("<II", buf, base)
            assert magic == 0xBEEFC0DE and version == 1
        assert struct.unpack_from("<I", buf, 16 + 24)[0] == 4096  # psize


class TestDatumDataset:
    @staticmethod
    def _make_env(tmp_path, n=10, c=1, h=6, w=6):
        """n uint8 Datums, label i % 3, keys in convert_imageset's
        zero-padded format."""
        rng = np.random.default_rng(3)
        arrays, rows = [], []
        for i in range(n):
            arr = rng.integers(0, 255, (c, h, w), dtype=np.uint8)
            arrays.append(arr)
            rows.append((f"{i:08d}".encode(),
                         array_to_datum(arr, label=i % 3)))
        write_lmdb(str(tmp_path / "train_db"), rows)
        return arrays

    def test_batches_in_key_order(self, tmp_path):
        from mms_answer_selection_tpu.data.lmdb_data import \
            LmdbDatumDataset

        arrays = self._make_env(tmp_path)
        ds = LmdbDatumDataset(str(tmp_path / "train_db"), 4, train=False)
        b = next(ds)
        assert b["data"].shape == (4, 6, 6, 1)
        assert b["data"].dtype == np.float32
        np.testing.assert_array_equal(b["label"], [0, 1, 2, 0])
        np.testing.assert_allclose(
            b["data"][0], np.transpose(arrays[0], (1, 2, 0)))
        # wrap-around after 10 rows
        next(ds)
        b3 = next(ds)
        np.testing.assert_allclose(
            b3["data"][2], np.transpose(arrays[0], (1, 2, 0)))

    def test_scale_and_mean(self, tmp_path):
        from mms_answer_selection_tpu.data.lmdb_data import \
            LmdbDatumDataset

        arrays = self._make_env(tmp_path)
        ds = LmdbDatumDataset(str(tmp_path / "train_db"), 2,
                              scale=1 / 255.0, mean=np.asarray([128.0]),
                              train=False)
        b = next(ds)
        np.testing.assert_allclose(
            b["data"][0],
            (np.transpose(arrays[0], (1, 2, 0)) - 128.0) / 255.0,
            rtol=1e-5)

    def test_data_layer_trains_under_graph_solver(self, tmp_path):
        """End-to-end `caffe train` shape: a Data-layer prototxt over a
        label-separable LMDB learns under GraphSolver."""
        from mms_answer_selection_tpu.training.graph_solver import \
            GraphSolver

        rng = np.random.default_rng(5)
        rows = []
        for i in range(60):
            label = i % 2
            arr = (rng.normal(2.0 * label - 1.0, 0.3, (1, 4, 4)) * 32
                   + 128).clip(0, 255).astype(np.uint8)
            rows.append((f"{i:08d}".encode(), array_to_datum(arr, label)))
        write_lmdb(str(tmp_path / "train_db"), rows)
        (tmp_path / "net.prototxt").write_text("""
layer { name: "data" type: "Data" top: "data" top: "label"
  data_param { source: "train_db" batch_size: 20 backend: LMDB }
  transform_param { scale: 0.00390625 mean_value: 128 } }
layer { name: "fc" type: "InnerProduct" bottom: "data" top: "fc"
  inner_product_param { num_output: 2
    weight_filler { type: "xavier" } } }
layer { name: "loss" type: "SoftmaxWithLoss" bottom: "fc" bottom: "label"
  top: "loss" }
layer { name: "acc" type: "Accuracy" bottom: "fc" bottom: "label"
  top: "acc" }
""")
        (tmp_path / "solver.prototxt").write_text(
            'net: "net.prototxt"\nbase_lr: 0.1\nlr_policy: "fixed"\n'
            'momentum: 0.9\nmax_iter: 60\ntest_interval: 0\n'
            'random_seed: 4\nsnapshot_prefix: "s"\ndisplay: 20\n'
            'type: "SGD"\n')
        gs = GraphSolver(str(tmp_path / "solver.prototxt"))
        gs.step(60)
        accs = [rec["acc"] for rec in gs.history
                if rec["phase"] == "Train" and "acc" in rec]
        assert accs[-1] > 0.9, accs

    def test_unrecognized_db_dir_rejected(self, tmp_path):
        """A source that is neither LMDB nor LevelDB fails loudly (the
        LEVELDB backend itself now reads natively — test_leveldb.py)."""
        from mms_answer_selection_tpu.training.graph_solver import \
            _build_feed

        os.makedirs(tmp_path / "ldb")
        cfg = {"name": "d", "type": "Data", "top": ["data", "label"],
               "data_param": {"source": str(tmp_path / "ldb"),
                              "batch_size": 2, "backend": "LEVELDB"}}
        with pytest.raises(ValueError, match="neither"):
            _build_feed(cfg, "train", 0, ".", None)


class TestConvertImagesetLmdb:
    def test_backend_lmdb_roundtrip(self, tmp_path, capsys):
        """`qa convert_imageset --backend lmdb` writes the reference's
        artifact (uint8 CHW Datums keyed %08d_%path,
        convert_imageset.cpp:140-156) and a Data-layer prototxt
        consumes it."""
        from mms_answer_selection_tpu.cli import main
        from mms_answer_selection_tpu.data.lmdb_data import \
            LmdbDatumDataset
        from mms_answer_selection_tpu.utils.io import (datum_label,
                                                       datum_to_array)

        rng = np.random.default_rng(0)
        ims = []
        lines = []
        for i in range(6):
            im = rng.integers(0, 256, (5, 4, 3)).astype(np.float32)
            ims.append(im)
            np.save(tmp_path / f"im{i}.npy", im)
            lines.append(f"im{i}.npy {i % 3}")
        (tmp_path / "list.txt").write_text("\n".join(lines) + "\n")
        main(["convert_imageset", str(tmp_path),
              str(tmp_path / "list.txt"), str(tmp_path / "db"),
              "--backend", "lmdb"])
        assert "Processed 6 files." in capsys.readouterr().out

        r = LmdbReader(str(tmp_path / "db"))
        assert len(r) == 6
        keys = list(r.keys())
        assert keys[0] == b"00000000_im0.npy"
        first = next(r.values())
        assert datum_label(first) == 0
        np.testing.assert_array_equal(
            datum_to_array(first),
            np.transpose(ims[0].astype(np.uint8), (2, 0, 1)))

        ds = LmdbDatumDataset(str(tmp_path / "db"), 3, train=False)
        b = next(ds)
        assert b["data"].shape == (3, 5, 4, 3)
        np.testing.assert_array_equal(b["label"], [0, 1, 2])


class TestReviewFixes:
    def test_oversized_key_rejected(self, tmp_path):
        with pytest.raises(ValueError, match="511"):
            write_lmdb(str(tmp_path / "env"), [(b"k" * 600, b"v")])

    def test_unpacked_float_datum(self, tmp_path):
        """Reference-written float Datums encode repeated float_data
        UNPACKED (one wiretype-5 field per element) — the Data-layer
        ingest must read them."""
        from mms_answer_selection_tpu.data.lmdb_data import \
            LmdbDatumDataset
        from mms_answer_selection_tpu.utils.io import datum_to_array

        vals = np.arange(12, dtype=np.float32).reshape(1, 3, 4)

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

        datum = b"".join([vi(1 << 3) + vi(1), vi(2 << 3) + vi(3),
                          vi(3 << 3) + vi(4)])
        for v in vals.ravel():
            datum += vi((6 << 3) | 5) + struct.pack("<f", v)
        datum += vi(5 << 3) + vi(1)  # label
        np.testing.assert_allclose(datum_to_array(datum), vals)
        write_lmdb(str(tmp_path / "env"), [(b"k", datum)])
        b = next(LmdbDatumDataset(str(tmp_path / "env"), 1, train=False))
        np.testing.assert_allclose(b["data"][0],
                                   np.transpose(vals, (1, 2, 0)))
        np.testing.assert_array_equal(b["label"], [1])
