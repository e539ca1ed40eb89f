"""Reference .caffemodel.h5 weight interop (net.cpp:797-913 layout):
roundtrip, layout shape conventions, name-based partial loading, the
finetune path, and the qa convert CLI."""

import dataclasses

import h5py
import jax
import numpy as np
import pytest

from mms_answer_selection_tpu.models.mms_qa import (
    V4, mms_qa_apply, mms_qa_init)
from mms_answer_selection_tpu.utils.caffemodel import (
    load_caffemodel_h5, save_caffemodel_h5)

CFG = dataclasses.replace(V4, vocab_size=60, embed_dim=50)


def _init(seed=0):
    return mms_qa_init(jax.random.PRNGKey(seed), CFG)


def _batch(n=3, seed=5):
    rng = np.random.default_rng(seed)
    return {
        "question": rng.integers(0, 60, (n, 40)).astype(np.int32),
        "answer": rng.integers(0, 60, (n, 40)).astype(np.int32),
        "overlap_feat": rng.random((n, 2)).astype(np.float32),
        "label": rng.integers(0, 2, (n,)).astype(np.int32),
    }


class TestRoundtrip:
    def test_forward_equivalence(self, tmp_path):
        """save A -> load into a differently-seeded B -> B computes A's
        exact outputs (every tensor restored, incl. BN running stats)."""
        p_a, s_a = _init(seed=1)
        # make the zero-init tensors distinctive so the roundtrip is real
        p_a["sim"]["w"] = jax.random.normal(jax.random.PRNGKey(9),
                                            p_a["sim"]["w"].shape) * 0.1
        s_a["bn0"]["mean"] = s_a["bn0"]["mean"] + 0.25
        s_a["bn0"]["var"] = s_a["bn0"]["var"] + 1.5
        path = str(tmp_path / "a.caffemodel.h5")
        save_caffemodel_h5(path, p_a, s_a)

        p_b, s_b = _init(seed=2)
        p_b, s_b, report = load_caffemodel_h5(path, p_b, s_b)
        assert all(v in ("loaded", "absent (shared param)")
                   for k, v in report.items() if not k.startswith("w2v_a"))
        batch = _batch()
        out_a, _ = mms_qa_apply(p_a, s_a, batch, CFG, train=False)
        out_b, _ = mms_qa_apply(p_b, s_b, batch, CFG, train=False)
        np.testing.assert_array_equal(np.asarray(out_a["prob"]),
                                      np.asarray(out_b["prob"]))

    def test_reference_layout_conventions(self, tmp_path):
        """The file must hold reference-shaped tensors: conv OIHW, fc
        (out, in), bn (1, C, 1, 1), embed bias 1-D (D,) — net.cpp readers
        would reject anything else."""
        p, s = _init()
        path = str(tmp_path / "m.h5")
        save_caffemodel_h5(path, p, s)
        with h5py.File(path, "r") as f:
            d = f["data"]
            b0 = CFG.blocks[0]
            assert d["conv0/0"].shape == (b0.out_channels,
                                          CFG.sim_channels(), b0.kh, b0.kw)
            assert d["bn0/0"].shape == (1, b0.out_channels, 1, 1)
            assert d["bn0/2"].shape == (1, b0.out_channels, 1, 1)
            assert d["fc2/0"].shape == (CFG.num_classes, CFG.fc1_dim)
            assert d["w2v_q/0"].shape == (60, 50)
            assert d["w2v_q/1"].shape == (50,)
            assert d["sim_cross/0"].shape == (CFG.sim_measures, 50, 50)
            assert d["sim_cross/1"].shape == (CFG.sim_measures, 40, 40)
            # shared-owner layer saved as an empty group (net.cpp:897:
            # "Only save params that own themselves")
            assert list(d["w2v_a"]) == []

    def test_unknown_source_layer_ignored(self, tmp_path):
        p, s = _init()
        path = str(tmp_path / "m.h5")
        save_caffemodel_h5(path, p, s)
        with h5py.File(path, "a") as f:
            g = f["data"].create_group("some_other_net_layer")
            g.create_dataset("0", data=np.ones((3, 3), np.float32))
        _, _, report = load_caffemodel_h5(path, p, s)
        assert report["some_other_net_layer"].startswith("ignored")

    def test_shape_mismatch_raises(self, tmp_path):
        p, s = _init()
        path = str(tmp_path / "m.h5")
        save_caffemodel_h5(path, p, s)
        with h5py.File(path, "a") as f:
            del f["data/fc1/0"]
            f["data"]["fc1"].create_dataset(
                "0", data=np.ones((7, 7), np.float32))
        with pytest.raises(ValueError, match="shape mismatch"):
            load_caffemodel_h5(path, p, s)


class TestFinetunePath:
    def test_fit_weights_accepts_h5(self, tmp_path):
        """Trainer.fit(weights='*.h5') = `caffe train -weights x.h5`."""
        from mms_answer_selection_tpu.data import (
            prepare_trec_qa, synthetic_corpus)
        from mms_answer_selection_tpu.training import (
            SolverConfig, Trainer, TrainerConfig)

        xml, w2v = synthetic_corpus(n_questions=8, answers_per_q=5, seed=3)
        splits, info = prepare_trec_qa(xml, xml, xml, w2v)
        cfg = dataclasses.replace(V4, vocab_size=info["vocab_size"],
                                  embed_dim=50)
        donor, donor_state = mms_qa_init(jax.random.PRNGKey(7), cfg)
        donor["fc1"]["b"] = donor["fc1"]["b"] + 0.125
        path = str(tmp_path / "donor.caffemodel.h5")
        save_caffemodel_h5(path, donor, donor_state)

        tcfg = TrainerConfig(solver=SolverConfig(solver_type="adadelta"),
                             max_iter=1, batch_size=8, test_interval=1,
                             snapshot_interval=0, seed=22)
        captured = {}
        trainer = Trainer(cfg, tcfg)
        orig = trainer._train_step

        def spy(params, state, opt_state, batch, step, rng):
            captured.setdefault("fc1_b", np.asarray(params["fc1"]["b"]))
            return orig(params, state, opt_state, batch, step, rng)

        trainer._train_step = spy
        trainer.fit(splits["train"], splits["dev"],
                    pretrained=info["pretrained"], weights=path)
        np.testing.assert_allclose(captured["fc1_b"],
                                   np.asarray(donor["fc1"]["b"]))


class TestConvertCLI:
    def test_export_import_roundtrip(self, tmp_path):
        from mms_answer_selection_tpu.cli import main
        from mms_answer_selection_tpu.data import (
            prepare_trec_qa, synthetic_corpus)
        from mms_answer_selection_tpu.training.checkpoint import (
            load_checkpoint, save_checkpoint)

        # prepped data dir (shapes for import)
        xml, w2v = synthetic_corpus(n_questions=6, answers_per_q=4, seed=4)
        splits, info = prepare_trec_qa(xml, xml, xml, w2v)
        data_dir = tmp_path / "prepped"
        import json as _json
        import os

        from mms_answer_selection_tpu.data import save_dataset
        os.makedirs(data_dir)
        for name, split in splits.items():
            save_dataset(str(data_dir / f"{name}.npz"), split)
        np.savez_compressed(str(data_dir / "vocab.npz"),
                            pretrained=info["pretrained"],
                            words=np.asarray(list(info["vocab"])))
        with open(data_dir / "meta.json", "w") as f:
            _json.dump({"vocab_size": info["vocab_size"],
                        "unknown_idx": info["unknown_idx"],
                        "pad_idx": info["pad_idx"], "dim": 50,
                        "q_len": 40, "a_len": 40}, f)

        cfg = dataclasses.replace(V4, vocab_size=info["vocab_size"],
                                  embed_dim=50)
        params, state = mms_qa_init(jax.random.PRNGKey(11), cfg)
        ckpt = tmp_path / "src"
        save_checkpoint(str(ckpt), 5, {"params": params, "state": state})
        h5 = tmp_path / "export.caffemodel.h5"
        main(["convert", "--ckpt", str(ckpt / "qa_iter_5"),
              "--out", str(h5)])
        assert h5.exists()
        out_dir = tmp_path / "imported"
        main(["convert", "--caffemodel", str(h5), "--data", str(data_dir),
              "--out", str(out_dir)])
        bundle, _ = load_checkpoint(str(out_dir / "imported_iter_0"))
        np.testing.assert_array_equal(
            np.asarray(bundle["params"]["embed"]["w"]),
            np.asarray(params["embed"]["w"]))
        np.testing.assert_array_equal(
            np.asarray(bundle["params"]["fc2"]["w"]),
            np.asarray(params["fc2"]["w"]))

        # binaryproto legs: extension-dispatched export, magic-dispatched
        # import (solver.cpp:470-481's extension dispatch, modernized)
        bp = tmp_path / "export.caffemodel"
        main(["convert", "--ckpt", str(ckpt / "qa_iter_5"),
              "--out", str(bp)])
        with open(bp, "rb") as f:
            assert f.read(4) != b"\x89HDF"  # really binaryproto
        out_dir2 = tmp_path / "imported_bp"
        main(["convert", "--caffemodel", str(bp), "--data", str(data_dir),
              "--out", str(out_dir2)])
        bundle2, _ = load_checkpoint(str(out_dir2 / "imported_iter_0"))
        np.testing.assert_array_equal(
            np.asarray(bundle2["params"]["fc2"]["w"]),
            np.asarray(params["fc2"]["w"]))


class TestBinaryproto:
    def test_roundtrip_forward_equivalence(self, tmp_path):
        from mms_answer_selection_tpu.utils.caffemodel import (
            load_caffemodel_binaryproto, save_caffemodel_binaryproto)
        p_a, s_a = _init(seed=3)
        p_a["sim"]["w"] = jax.random.normal(jax.random.PRNGKey(4),
                                            p_a["sim"]["w"].shape) * 0.1
        s_a["bn1"]["mean"] = s_a["bn1"]["mean"] - 0.5
        path = str(tmp_path / "a.caffemodel")
        save_caffemodel_binaryproto(path, p_a, s_a)
        p_b, s_b = _init(seed=5)
        p_b, s_b, report = load_caffemodel_binaryproto(path, p_b, s_b)
        batch = _batch()
        out_a, _ = mms_qa_apply(p_a, s_a, batch, CFG, train=False)
        out_b, _ = mms_qa_apply(p_b, s_b, batch, CFG, train=False)
        np.testing.assert_array_equal(np.asarray(out_a["prob"]),
                                      np.asarray(out_b["prob"]))

    def test_matches_h5_format_content(self, tmp_path):
        """Both serializations of the same weights load back equal."""
        from mms_answer_selection_tpu.utils.caffemodel import (
            load_caffemodel_binaryproto, save_caffemodel_binaryproto)
        p, s = _init(seed=6)
        bp = str(tmp_path / "w.caffemodel")
        h5 = str(tmp_path / "w.caffemodel.h5")
        save_caffemodel_binaryproto(bp, p, s)
        save_caffemodel_h5(h5, p, s)
        p1, s1, _ = load_caffemodel_binaryproto(bp, *_init(seed=7))
        p2, s2, _ = load_caffemodel_h5(h5, *_init(seed=8))
        for a, b in zip(jax.tree.leaves((p1, s1)),
                        jax.tree.leaves((p2, s2))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_wire_format_pinned_by_hand(self):
        """Parse a NetParameter built from raw wire-format literals (not
        our writer), pinning the field numbers/encodings against
        caffe.proto:7-21,92,311-329."""
        from mms_answer_selection_tpu.utils.caffemodel import _parse_layers

        def varint_key(field, wt):
            return bytes([(field << 3) | wt])

        data = np.asarray([1.5, -2.0, 3.25, 0.0, 7.0, -0.5], "<f4")
        shape_dims = bytes([2, 3])                      # dim=[2,3] packed
        blobshape = varint_key(1, 2) + bytes([len(shape_dims)]) + shape_dims
        blob = (varint_key(7, 2) + bytes([len(blobshape)]) + blobshape
                + varint_key(5, 2) + bytes([data.nbytes]) + data.tobytes())
        name = b"fc9"
        layer = (varint_key(1, 2) + bytes([len(name)]) + name
                 + varint_key(7, 2) + bytes([len(blob)]) + blob)
        # field 100 key = 100<<3|2 = 802 -> varint a2 06
        net = b"\xa2\x06" + bytes([len(layer)]) + layer
        layers = _parse_layers(memoryview(net))
        assert len(layers) == 1
        lname, blobs = layers[0]
        assert lname == "fc9"
        assert blobs[0].shape == (2, 3)
        np.testing.assert_array_equal(blobs[0].ravel(), data)

    def test_fit_weights_accepts_binaryproto(self, tmp_path):
        from mms_answer_selection_tpu.data import (
            prepare_trec_qa, synthetic_corpus)
        from mms_answer_selection_tpu.training import (
            SolverConfig, Trainer, TrainerConfig)
        from mms_answer_selection_tpu.utils.caffemodel import (
            save_caffemodel_binaryproto)

        xml, w2v = synthetic_corpus(n_questions=8, answers_per_q=5, seed=3)
        splits, info = prepare_trec_qa(xml, xml, xml, w2v)
        cfg = dataclasses.replace(V4, vocab_size=info["vocab_size"],
                                  embed_dim=50)
        donor, donor_state = mms_qa_init(jax.random.PRNGKey(13), cfg)
        donor["fc2"]["b"] = donor["fc2"]["b"] + 0.375
        path = str(tmp_path / "donor.caffemodel")
        save_caffemodel_binaryproto(path, donor, donor_state)
        tcfg = TrainerConfig(solver=SolverConfig(solver_type="adadelta"),
                             max_iter=1, batch_size=8, test_interval=1,
                             snapshot_interval=0, seed=22)
        captured = {}
        trainer = Trainer(cfg, tcfg)
        orig = trainer._train_step

        def spy(params, state, opt_state, batch, step, rng):
            captured.setdefault("fc2_b", np.asarray(params["fc2"]["b"]))
            return orig(params, state, opt_state, batch, step, rng)

        trainer._train_step = spy
        trainer.fit(splits["train"], splits["dev"],
                    pretrained=info["pretrained"], weights=path)
        np.testing.assert_allclose(captured["fc2_b"],
                                   np.asarray(donor["fc2"]["b"]))


class TestSolverState:
    def test_roundtrip(self, tmp_path):
        from mms_answer_selection_tpu.training import SolverConfig, make_solver
        from mms_answer_selection_tpu.utils.caffemodel import (
            load_solverstate, save_solverstate_binaryproto)
        p, s = _init(seed=1)
        solver = make_solver(SolverConfig(solver_type="adadelta"))
        opt = solver.init(p)
        # distinctive accumulator values
        opt["h"] = jax.tree.map(lambda x: x + 0.5, opt["h"])
        opt["h2"] = jax.tree.map(lambda x: x + 2.0, opt["h2"])
        path = str(tmp_path / "x.solverstate")
        save_solverstate_binaryproto(path, p, s, opt, 123,
                                     learned_net="x.caffemodel")
        opt2 = solver.init(p)
        opt2, it, cur, learned, report = load_solverstate(path, p, s, opt2)
        assert it == 123 and learned == "x.caffemodel"
        for a, b in zip(jax.tree.leaves(opt["h"]),
                        jax.tree.leaves(opt2["h"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(opt["h2"]),
                        jax.tree.leaves(opt2["h2"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_family_mismatch_raises(self, tmp_path):
        from mms_answer_selection_tpu.training import SolverConfig, make_solver
        from mms_answer_selection_tpu.utils.caffemodel import (
            load_solverstate, save_solverstate_binaryproto)
        p, s = _init(seed=1)
        sgd = make_solver(SolverConfig(solver_type="sgd")).init(p)
        path = str(tmp_path / "sgd.solverstate")
        save_solverstate_binaryproto(path, p, s, sgd, 7)
        ada = make_solver(SolverConfig(solver_type="adadelta")).init(p)
        with pytest.raises(ValueError, match="solver family"):
            load_solverstate(path, p, s, ada)

    def test_resume_from_reference_pair_continues_exactly(self, tmp_path):
        """Train 12 uninterrupted; separately snapshot at 4, export the
        snapshot as a reference solverstate+caffemodel pair, resume a
        FRESH trainer from the .solverstate -- the continuation's evals
        and final params match the uninterrupted run (the
        test_gradient_based_solver.cpp:490-540 pattern, across snapshot
        FORMATS)."""
        from mms_answer_selection_tpu.cli import main
        from mms_answer_selection_tpu.data import (
            prepare_trec_qa, synthetic_corpus)
        from mms_answer_selection_tpu.training import (
            SolverConfig, Trainer, TrainerConfig)

        xml, w2v = synthetic_corpus(n_questions=8, answers_per_q=5, seed=6)
        splits, info = prepare_trec_qa(xml, xml, xml, w2v)
        cfg = dataclasses.replace(V4, vocab_size=info["vocab_size"],
                                  embed_dim=50)

        def tcfg(snapdir):
            return TrainerConfig(
                solver=SolverConfig(solver_type="adadelta", base_lr=1.0,
                                    momentum=0.95, delta=5e-7,
                                    weight_decay=5e-4),
                max_iter=12, batch_size=10, test_interval=4,
                snapshot_interval=4, early_stop_patience=99, seed=22,
                snapshot_dir=str(snapdir))

        h_full = Trainer(cfg, tcfg(tmp_path / "full")).fit(
            splits["train"], splits["dev"], pretrained=info["pretrained"])

        ss = tmp_path / "export.solverstate"
        main(["convert", "--ckpt", str(tmp_path / "full" / "qa_iter_4"),
              "--out", str(ss)])
        h_res = Trainer(cfg, tcfg(tmp_path / "res")).fit(
            splits["train"], splits["dev"], pretrained=info["pretrained"],
            resume_from=str(ss))
        # resumed at iter 5: evals at 8 must match the uninterrupted run
        full = dict(zip(h_full["steps"], h_full["dev_map"]))
        res = dict(zip(h_res["steps"], h_res["dev_map"]))
        assert 8 in res and res[8] == full[8]
        for a, b in zip(jax.tree.leaves(h_full["params"]),
                        jax.tree.leaves(h_res["params"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestReferenceConventions:
    """Review findings: the formats must match what the reference ACTUALLY
    writes/reads, not just our own writer<->reader pair."""

    def test_binaryproto_writes_shared_layer_blobs(self, tmp_path):
        """Net::ToProto serializes EVERY layer's blobs (shared ones
        duplicated, net.cpp:847-856); CopyTrainedLayersFrom CHECK_EQs the
        count, so w2v_a must carry its 2 (data-shared) blobs."""
        from mms_answer_selection_tpu.utils.caffemodel import (
            _parse_layers, save_caffemodel_binaryproto)
        p, s = _init()
        path = str(tmp_path / "w.caffemodel")
        save_caffemodel_binaryproto(path, p, s)
        with open(path, "rb") as f:
            layers = dict(_parse_layers(memoryview(f.read())))
        assert len(layers["w2v_a"]) == 2  # duplicated shared blobs
        np.testing.assert_array_equal(layers["w2v_a"][0],
                                      layers["w2v_q"][0])

    def test_h5_keeps_shared_group_empty(self, tmp_path):
        """...while ToHDF5 only saves owners (net.cpp:889-897)."""
        p, s = _init()
        path = str(tmp_path / "w.h5")
        save_caffemodel_h5(path, p, s)
        with h5py.File(path, "r") as f:
            assert list(f["data"]["w2v_a"]) == []

    def test_load_binaryproto_with_duplicated_shared_blobs(self, tmp_path):
        """A real reference-written .caffemodel (w2v_a WITH blobs) loads
        without error -- the regression the first version raised on."""
        from mms_answer_selection_tpu.utils.caffemodel import (
            load_caffemodel_binaryproto, save_caffemodel_binaryproto)
        p, s = _init(seed=3)
        path = str(tmp_path / "w.caffemodel")
        save_caffemodel_binaryproto(path, p, s)
        p2, s2, report = load_caffemodel_binaryproto(path, *_init(seed=4))
        np.testing.assert_array_equal(np.asarray(p2["embed"]["w"]),
                                      np.asarray(p["embed"]["w"]))

    def test_h5_solverstate_with_nul_learned_net(self, tmp_path):
        """caffe's hdf5_save_string stores the NUL terminator; the loader
        must strip it, and fit must route *.solverstate.h5 files."""
        from mms_answer_selection_tpu.training import (
            SolverConfig, make_solver)
        from mms_answer_selection_tpu.utils.caffemodel import (
            load_solverstate)
        p, s = _init(seed=5)
        solver = make_solver(SolverConfig(solver_type="adadelta"))
        opt = solver.init(p)
        opt["h"] = jax.tree.map(lambda x: x + 1.0, opt["h"])
        # hand-build the HDF5 layout SnapshotSolverStateToHDF5 writes
        from mms_answer_selection_tpu.utils.caffemodel import _solver_rows
        rows = _solver_rows(p, s)
        path = str(tmp_path / "x.solverstate.h5")
        trees = {"params": p, "state": s}
        from mms_answer_selection_tpu.utils.caffemodel import _get
        with h5py.File(path, "w") as f:
            f.create_dataset("iter", data=np.int64(77))
            f.create_dataset("current_step", data=np.int64(0))
            f.create_dataset(
                "learned_net",
                data=np.frombuffer(b"net.caffemodel.h5\x00", np.uint8))
            hist = f.create_group("history")
            i = 0
            for acc in ("h", "h2"):
                for is_param, tree, keypath, to_c, _ in rows:
                    if is_param:
                        arr = to_c(np.asarray(
                            _get({"params": opt[acc]}, "params", keypath),
                            np.float32))
                    else:
                        arr = to_c(np.zeros_like(np.asarray(
                            _get(trees, tree, keypath), np.float32)))
                    hist.create_dataset(str(i), data=arr)
                    i += 1
        opt2, it, cur, learned, report = load_solverstate(
            path, p, s, solver.init(p))
        assert it == 77
        assert learned == "net.caffemodel.h5"  # NUL stripped
        for a, b in zip(jax.tree.leaves(opt["h"]),
                        jax.tree.leaves(opt2["h"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_fit_routes_solverstate_h5(self, tmp_path):
        from mms_answer_selection_tpu.data import (
            prepare_trec_qa, synthetic_corpus)
        from mms_answer_selection_tpu.training import (
            SolverConfig, Trainer, TrainerConfig, make_solver)
        from mms_answer_selection_tpu.utils.caffemodel import (
            _get, _solver_rows, save_caffemodel_h5)

        xml, w2v = synthetic_corpus(n_questions=8, answers_per_q=5, seed=9)
        splits, info = prepare_trec_qa(xml, xml, xml, w2v)
        cfg = dataclasses.replace(V4, vocab_size=info["vocab_size"],
                                  embed_dim=50)
        p, s = mms_qa_init(jax.random.PRNGKey(1), cfg)
        solver = make_solver(SolverConfig(solver_type="adadelta"))
        opt = solver.init(p)
        rows = _solver_rows(p, s)
        trees = {"params": p, "state": s}
        save_caffemodel_h5(str(tmp_path / "net.caffemodel.h5"), p, s)
        path = str(tmp_path / "run.solverstate.h5")
        with h5py.File(path, "w") as f:
            f.create_dataset("iter", data=np.int64(2))
            f.create_dataset(
                "learned_net",
                data=np.frombuffer(b"net.caffemodel.h5\x00", np.uint8))
            hist = f.create_group("history")
            i = 0
            for acc in ("h", "h2"):
                for is_param, tree, keypath, to_c, _ in rows:
                    arr = to_c(np.zeros_like(np.asarray(
                        _get(trees, tree, keypath), np.float32))) \
                        if not is_param else to_c(np.asarray(
                            _get({"params": opt[acc]}, "params", keypath),
                            np.float32))
                    hist.create_dataset(str(i), data=arr)
                    i += 1
        tcfg = TrainerConfig(solver=SolverConfig(solver_type="adadelta"),
                             max_iter=4, batch_size=8, test_interval=2,
                             snapshot_interval=0, seed=22)
        hist = Trainer(cfg, tcfg).fit(
            splits["train"], splits["dev"], pretrained=info["pretrained"],
            resume_from=path)
        # resumed at iter 2: only the step-2 eval happened
        assert hist["steps"] == [2]


class TestSolverStateH5Export:
    def test_h5_roundtrip(self, tmp_path):
        from mms_answer_selection_tpu.training import (
            SolverConfig, make_solver)
        from mms_answer_selection_tpu.utils.caffemodel import (
            load_solverstate, save_solverstate_h5)
        p, s = _init(seed=2)
        solver = make_solver(SolverConfig(solver_type="adam"))
        opt = solver.init(p)
        opt["h"] = jax.tree.map(lambda x: x + 0.25, opt["h"])
        path = str(tmp_path / "x.solverstate.h5")
        save_solverstate_h5(path, p, s, opt, 55,
                            learned_net="x.caffemodel.h5")
        # learned_net must be a STRING-typed dataset (hdf5_load_string
        # allocates by the type size; a uint8 array would under-allocate)
        with h5py.File(path, "r") as f:
            assert h5py.check_string_dtype(f["learned_net"].dtype)
        opt2, it, cur, learned, _ = load_solverstate(path, p, s,
                                                     solver.init(p))
        assert it == 55 and learned == "x.caffemodel.h5"
        for a, b in zip(jax.tree.leaves(opt["h"]),
                        jax.tree.leaves(opt2["h"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_cli_h5_pair_resumes(self, tmp_path):
        """qa convert --out x.solverstate.h5 writes a pair that
        fit(resume_from=...) restores exactly (the .h5 flavor of the
        cross-format continuation test)."""
        from mms_answer_selection_tpu.cli import main
        from mms_answer_selection_tpu.data import (
            prepare_trec_qa, synthetic_corpus)
        from mms_answer_selection_tpu.training import (
            SolverConfig, Trainer, TrainerConfig)

        xml, w2v = synthetic_corpus(n_questions=8, answers_per_q=5, seed=6)
        splits, info = prepare_trec_qa(xml, xml, xml, w2v)
        cfg = dataclasses.replace(V4, vocab_size=info["vocab_size"],
                                  embed_dim=50)

        def tcfg(snapdir):
            return TrainerConfig(
                solver=SolverConfig(solver_type="adadelta", base_lr=1.0,
                                    momentum=0.95, delta=5e-7,
                                    weight_decay=5e-4),
                max_iter=12, batch_size=10, test_interval=4,
                snapshot_interval=4, early_stop_patience=99, seed=22,
                snapshot_dir=str(snapdir))

        h_full = Trainer(cfg, tcfg(tmp_path / "full")).fit(
            splits["train"], splits["dev"], pretrained=info["pretrained"])
        ss = tmp_path / "export.solverstate.h5"
        main(["convert", "--ckpt", str(tmp_path / "full" / "qa_iter_4"),
              "--out", str(ss)])
        assert (tmp_path / "export.caffemodel.h5").exists()
        h_res = Trainer(cfg, tcfg(tmp_path / "res")).fit(
            splits["train"], splits["dev"], pretrained=info["pretrained"],
            resume_from=str(ss))
        full = dict(zip(h_full["steps"], h_full["dev_map"]))
        res = dict(zip(h_res["steps"], h_res["dev_map"]))
        assert 8 in res and res[8] == full[8]


class TestBlobCountCheck:
    def test_fewer_blobs_than_model_raises(self, tmp_path):
        """CopyTrainedLayersFrom CHECK_EQs the per-layer blob count
        (net.cpp:755): a bias-less source conv must hard-fail rather than
        silently leave init values in the unfilled rows."""
        from mms_answer_selection_tpu.utils.caffemodel import (
            _emit_blob, _field, load_caffemodel_binaryproto)
        p, s = _init()
        path = str(tmp_path / "m.caffemodel")
        # a file holding ONLY conv0's weight blob (no bias)
        body = _field(1, 2, b"conv0") + _field(7, 2, _emit_blob(
            np.transpose(np.asarray(p["conv0"]["w"]), (3, 2, 0, 1))))
        with open(path, "wb") as f:
            f.write(_field(100, 2, bytes(body)))
        with pytest.raises(ValueError, match="blobs"):
            load_caffemodel_binaryproto(path, p, s)


class TestRound4LoaderFixes:
    def test_h5_missing_owned_dataset_fails(self, tmp_path):
        """net.cpp:797-844 LOG(FATAL)s when an OWNED param has no
        dataset; silently training on random init is the bug."""
        import h5py

        from mms_answer_selection_tpu.utils.caffemodel import (
            load_caffemodel_h5, save_caffemodel_h5)

        p, s = _init(seed=3)
        path = str(tmp_path / "w.caffemodel.h5")
        save_caffemodel_h5(path, p, s)
        with h5py.File(path, "a") as f:
            del f["data"]["fc1"]["1"]  # drop fc1's bias dataset
        with pytest.raises(ValueError, match="owns param"):
            load_caffemodel_h5(path, *_init(seed=4))

    def test_auto_loader_dispatches_by_magic(self, tmp_path):
        """A renamed HDF5 caffemodel (no .h5 suffix) still loads — the
        dispatch reads the 4-byte magic, not the name."""
        from mms_answer_selection_tpu.utils.caffemodel import (
            load_caffemodel_auto, save_caffemodel_binaryproto,
            save_caffemodel_h5)

        p, s = _init(seed=3)
        h5 = str(tmp_path / "renamed.caffemodel")  # LIES about format
        save_caffemodel_h5(h5, p, s)
        p2, s2, rep = load_caffemodel_auto(h5, *_init(seed=5))
        np.testing.assert_array_equal(np.asarray(p2["fc1"]["w"]),
                                      np.asarray(p["fc1"]["w"]))
        bp = str(tmp_path / "b.caffemodel.h5")  # and the reverse lie
        save_caffemodel_binaryproto(bp, p, s)
        p3, s3, rep = load_caffemodel_auto(bp, *_init(seed=6))
        np.testing.assert_array_equal(np.asarray(p3["fc1"]["w"]),
                                      np.asarray(p["fc1"]["w"]))

    def test_h5_extra_dataset_fails(self, tmp_path):
        """net.cpp:819-821 CHECK_LE: a source layer with MORE blobs than
        ours is a different architecture, not a partial load."""
        import h5py

        from mms_answer_selection_tpu.utils.caffemodel import (
            load_caffemodel_h5, save_caffemodel_h5)

        p, s = _init(seed=3)
        path = str(tmp_path / "w.caffemodel.h5")
        save_caffemodel_h5(path, p, s)
        with h5py.File(path, "a") as f:
            f["data"]["fc1"]["9"] = np.zeros((2, 2), np.float32)
        with pytest.raises(ValueError, match="datasets"):
            load_caffemodel_h5(path, *_init(seed=4))
