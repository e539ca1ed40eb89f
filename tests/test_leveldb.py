"""Pure-Python LevelDB path (utils/leveldb_io.py): the reference's other
DB backend (src/caffe/util/db_leveldb.cpp:23, db.cpp:41).  Format pieces
are pinned against the published on-disk spec (leveldb doc/log_format.md,
doc/table_format.md) with known crc32c/snappy vectors, then the whole
read path ingests through the `Data` prototxt layer like LMDB does."""

import os
import struct

import numpy as np
import pytest

from mms_answer_selection_tpu.utils.io import array_to_datum
from mms_answer_selection_tpu.utils.leveldb_io import (
    LevelDbReader, _decode_batch, _encode_batch, _read_log_records,
    _read_sstable, _write_log, crc32c, crc32c_mask, crc32c_unmask,
    snappy_decompress, write_leveldb)


class TestPrimitives:
    def test_crc32c_check_vector(self):
        # the canonical CRC-32C (Castagnoli) check value
        assert crc32c(b"123456789") == 0xE3069283

    def test_crc32c_leveldb_vectors(self):
        # util/crc32c_test.cc: 32 zero bytes -> 0x8a9136aa
        assert crc32c(b"\x00" * 32) == 0x8A9136AA
        assert crc32c(b"\xff" * 32) == 0x62A8AB43

    def test_crc_mask_roundtrip(self):
        for v in (0, 1, 0xE3069283, 0xFFFFFFFF):
            assert crc32c_unmask(crc32c_mask(v)) == v
            assert crc32c_mask(v) != v

    def test_snappy_literal(self):
        # uncompressed len 5, one literal tag (len-1=4 in high bits)
        assert snappy_decompress(bytes([5, 4 << 2]) + b"hello") == b"hello"

    def test_snappy_overlapping_copy(self):
        # "abc" literal then a copy(offset=3, len=9): the classic
        # self-overlapping pattern -> "abcabcabcabc"
        blob = bytes([12, 2 << 2]) + b"abc" + bytes([((9 - 4) << 2) | 1,
                                                     3])
        assert snappy_decompress(blob) == b"abcabcabcabc"

    def test_snappy_two_byte_offset_copy(self):
        # 70-byte literal (length needs the 1-extra-byte form), then a
        # 2-byte-offset copy of its first 20 bytes
        lit = bytes(range(70))
        blob = bytes([90, 60 << 2, 69]) + lit \
            + bytes([((20 - 1) << 2) | 2]) + struct.pack("<H", 70)
        assert snappy_decompress(blob) == lit + lit[:20]

    def test_snappy_bad_offset_raises(self):
        with pytest.raises(ValueError, match="offset"):
            snappy_decompress(bytes([4, 0 << 2]) + b"a" + bytes([1 | 1,
                                                                 9]))


class TestLogFormat:
    def test_roundtrip_small(self):
        recs = [b"alpha", b"", b"x" * 100]
        assert list(_read_log_records(_write_log(recs))) == recs

    def test_roundtrip_multiblock(self):
        # a record spanning >2 blocks forces FIRST/MIDDLE/LAST reassembly
        recs = [b"head", bytes(range(256)) * 300, b"tail"]  # 76,800 bytes
        data = _write_log(recs)
        assert len(data) > 2 * 32768
        assert list(_read_log_records(data)) == recs

    def test_crc_corruption_detected(self):
        data = bytearray(_write_log([b"payload-payload"]))
        data[9] ^= 0xFF  # flip a payload byte
        with pytest.raises(ValueError, match="crc"):
            list(_read_log_records(bytes(data)))

    def test_writebatch_roundtrip(self):
        entries = [(b"k1", b"v1"), (b"k2", None), (b"k3", b"")]
        rec = _encode_batch(41, entries)
        got = list(_decode_batch(rec))
        assert got == [(41, 1, b"k1", b"v1"), (42, 0, b"k2", None),
                       (43, 1, b"k3", b"")]


class TestDbRoundtrip:
    ROWS = [(f"{i:08d}".encode(), bytes([i % 251]) * (i % 97 + 1))
            for i in range(300)]

    @pytest.mark.parametrize("sst", [False, True])
    def test_roundtrip_sorted(self, tmp_path, sst):
        import random
        shuffled = list(self.ROWS)
        random.Random(3).shuffle(shuffled)
        path = write_leveldb(str(tmp_path / "db"), shuffled, sst=sst)
        rd = LevelDbReader(path)
        assert list(rd.items()) == sorted(self.ROWS)
        assert len(rd) == len(self.ROWS)

    def test_sst_multiblock_prefix_compression(self, tmp_path):
        # >4 KiB of shared-prefix keys: multiple data blocks, restart
        # arrays, and non-zero shared lengths all exercised
        rows = [(b"shared/prefix/key/" + f"{i:06d}".encode(),
                 b"v" * 64) for i in range(200)]
        path = write_leveldb(str(tmp_path / "db"), rows, sst=True)
        entries = list(_read_sstable(os.path.join(path, "000004.ldb")))
        assert [(k, v) for _s, _t, k, v in entries] == rows
        assert list(LevelDbReader(path).items()) == rows

    def test_wal_overrides_table(self, tmp_path):
        """Freshest sequence wins: a WAL put/delete shadows table rows —
        LevelDB's memtable-over-sstable read order."""
        path = write_leveldb(str(tmp_path / "db"),
                             [(b"a", b"old"), (b"b", b"keep"),
                              (b"c", b"dead")], sst=True)
        batch = _encode_batch(100, [(b"a", b"new"), (b"c", None),
                                    (b"d", b"added")])
        with open(os.path.join(path, "000005.log"), "wb") as f:
            f.write(_write_log([batch]))
        assert list(LevelDbReader(path).items()) == [
            (b"a", b"new"), (b"b", b"keep"), (b"d", b"added")]

    def test_wal_delete_and_rewrite(self, tmp_path):
        path = write_leveldb(str(tmp_path / "db"), [(b"k", b"v0")])
        extra = [_encode_batch(50, [(b"k", None)]),
                 _encode_batch(51, [(b"k", b"v2")])]
        log_path = os.path.join(path, "000003.log")
        with open(log_path, "rb") as f:
            old = list(_read_log_records(f.read()))
        with open(log_path, "wb") as f:
            f.write(_write_log(old + extra))
        assert list(LevelDbReader(path).items()) == [(b"k", b"v2")]

    def test_not_a_leveldb_dir(self, tmp_path):
        with pytest.raises(ValueError, match="CURRENT"):
            LevelDbReader(str(tmp_path))


class TestDatumIngest:
    def _db(self, tmp_path, sst):
        rng = np.random.default_rng(5)
        arrays, rows = [], []
        for i in range(12):
            arr = rng.integers(0, 256, (3, 5, 4)).astype(np.uint8)
            arrays.append(arr)
            rows.append((f"{i:08d}".encode(), array_to_datum(arr, i % 3)))
        write_leveldb(str(tmp_path / "db"), rows, sst=sst)
        return arrays

    @pytest.mark.parametrize("sst", [False, True])
    def test_dataset_batches(self, tmp_path, sst):
        from mms_answer_selection_tpu.data.lmdb_data import (
            LevelDbDatumDataset, open_datum_dataset)

        arrays = self._db(tmp_path, sst)
        ds = LevelDbDatumDataset(str(tmp_path / "db"), 4, train=False)
        b = next(ds)
        assert b["data"].shape == (4, 5, 4, 3)
        np.testing.assert_allclose(
            b["data"][0], np.transpose(arrays[0], (1, 2, 0)))
        assert list(b["label"][:3]) == [0, 1, 2]
        # the sniffing opener picks the same reader
        ds2 = open_datum_dataset(str(tmp_path / "db"), 4, train=False)
        assert type(ds2).__name__ == "LevelDbDatumDataset"

    def test_data_layer_trains_under_graph_solver(self, tmp_path):
        """`caffe train` over a LEVELDB-backend Data layer — the exact
        shape test_lmdb.py pins for LMDB."""
        from mms_answer_selection_tpu.training.graph_solver import \
            GraphSolver

        rng = np.random.default_rng(6)
        rows = []
        for i in range(60):
            label = i % 2
            arr = (rng.normal(2.0 * label - 1.0, 0.3, (1, 4, 4)) * 32
                   + 128).clip(0, 255).astype(np.uint8)
            rows.append((f"{i:08d}".encode(), array_to_datum(arr, label)))
        write_leveldb(str(tmp_path / "train_db"), rows, sst=True)
        (tmp_path / "net.prototxt").write_text("""
layer { name: "data" type: "Data" top: "data" top: "label"
  data_param { source: "train_db" batch_size: 20 backend: LEVELDB }
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


class TestConvertImagesetLeveldb:
    def test_backend_leveldb_roundtrip(self, tmp_path, capsys):
        """`qa convert_imageset --backend leveldb` writes the
        reference's OTHER artifact format (convert_imageset.cpp with
        FLAGS_backend=leveldb) as a level-0 table DB."""
        from mms_answer_selection_tpu.cli import main
        from mms_answer_selection_tpu.utils.io import (datum_label,
                                                       datum_to_array)

        rng = np.random.default_rng(0)
        ims, lines = [], []
        for i in range(6):
            im = rng.integers(0, 256, (5, 4, 3)).astype(np.float32)
            ims.append(im)
            np.save(tmp_path / f"im{i}.npy", im)
            lines.append(f"im{i}.npy {i % 3}")
        (tmp_path / "list.txt").write_text("\n".join(lines) + "\n")
        main(["convert_imageset", str(tmp_path),
              str(tmp_path / "list.txt"), str(tmp_path / "db"),
              "--backend", "leveldb"])
        assert "Processed 6 files." in capsys.readouterr().out

        r = LevelDbReader(str(tmp_path / "db"))
        assert len(r) == 6
        assert next(r.keys()) == b"00000000_im0.npy"
        first = next(r.values())
        assert datum_label(first) == 0
        np.testing.assert_array_equal(
            datum_to_array(first),
            np.transpose(ims[0].astype(np.uint8), (2, 0, 1)))
