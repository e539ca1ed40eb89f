"""Reference interop beyond the QA family (VERDICT r2 #4): PairImage and
CaptionImage round-trip .caffemodel (h5 + binaryproto), .solverstate, and
prototxt; legacy V0/V1 `layers:` prototxt auto-upgrades on ingestion
(util/upgrade_proto.cpp's job)."""

import dataclasses

import jax
import numpy as np
import pytest

from mms_answer_selection_tpu.models.caption_image import (
    CaptionImageConfig, caption_image_apply, caption_image_init)
from mms_answer_selection_tpu.models.mms_qa import ConvBlock
from mms_answer_selection_tpu.models.pair_image import (
    PairImageConfig, pair_image_apply, pair_image_init)
from mms_answer_selection_tpu.utils.caffemodel import (
    detect_family,
    load_caffemodel_binaryproto,
    load_caffemodel_h5,
    load_solverstate,
    save_caffemodel_binaryproto,
    save_caffemodel_h5,
    save_solverstate_binaryproto,
)

rng = np.random.default_rng(23)

PAIR_CFG = PairImageConfig(height=12, width=12, channels=1,
                           blocks=(ConvBlock(3, 3, 4, "max", 2, 2),),
                           fc_dim=6, margin=0.5)
CAP_CFG = CaptionImageConfig(vocab_size=40, embed_dim=16, caption_len=5,
                             height=10, width=10, channels=3,
                             blocks=(ConvBlock(3, 3, 8, "max", 2, 2),),
                             sim_measures=2)


def _pair_batch(n=3):
    return {"img1": np.asarray(rng.random((n, 12, 12, 1)), np.float32),
            "img2": np.asarray(rng.random((n, 12, 12, 1)), np.float32),
            "label": np.asarray(rng.choice([-1.0, 1.0], n), np.float32)}


def _cap_batch(n=3):
    return {"caption": rng.integers(0, 40, (n, 5)).astype(np.int32),
            "image_pos": np.asarray(rng.random((n, 10, 10, 3)), np.float32),
            "image_neg": np.asarray(rng.random((n, 10, 10, 3)), np.float32)}


class TestFamilyDetection:
    def test_families(self):
        pp, _ = pair_image_init(jax.random.PRNGKey(0), PAIR_CFG)
        cp, _ = caption_image_init(jax.random.PRNGKey(0), CAP_CFG)
        from mms_answer_selection_tpu.models.mms_qa import V4, mms_qa_init
        qp, _ = mms_qa_init(jax.random.PRNGKey(0),
                            dataclasses.replace(V4, vocab_size=30))
        assert detect_family(pp) == "pair_image"
        assert detect_family(cp) == "caption_image"
        assert detect_family(qp) == "mms_qa"
        with pytest.raises(ValueError, match="register_model_family"):
            detect_family({"mystery": {}})


class TestPairImageCaffemodel:
    @pytest.mark.parametrize("fmt", ["h5", "binaryproto"])
    def test_roundtrip_forward_equivalence(self, tmp_path, fmt):
        p_a, s_a = pair_image_init(jax.random.PRNGKey(1), PAIR_CFG)
        s_a["bn0"]["mean"] = s_a["bn0"]["mean"] + 0.25
        path = str(tmp_path / f"pair.{fmt}")
        save = save_caffemodel_h5 if fmt == "h5" \
            else save_caffemodel_binaryproto
        load = load_caffemodel_h5 if fmt == "h5" \
            else load_caffemodel_binaryproto
        save(path, p_a, s_a)
        p_b, s_b = pair_image_init(jax.random.PRNGKey(9), PAIR_CFG)
        p_b, s_b, report = load(path, p_b, s_b)
        assert all(v == "loaded" for v in report.values()), report
        batch = _pair_batch()
        out_a, _ = pair_image_apply(p_a, s_a, batch, PAIR_CFG, train=False)
        out_b, _ = pair_image_apply(p_b, s_b, batch, PAIR_CFG, train=False)
        np.testing.assert_array_equal(np.asarray(out_a["score1"]),
                                      np.asarray(out_b["score1"]))

    def test_reference_blob_shapes(self, tmp_path):
        import h5py
        p, s = pair_image_init(jax.random.PRNGKey(1), PAIR_CFG)
        path = str(tmp_path / "pair.h5")
        save_caffemodel_h5(path, p, s)
        with h5py.File(path, "r") as f:
            d = f["data"]
            assert d["conv0/0"].shape == (4, 1, 3, 3)       # OIHW
            assert d["bn0/0"].shape == (1, 4, 1, 1)
            assert d["fc/0"].shape[0] == PAIR_CFG.fc_dim    # (out, in)
            assert d["score/0"].shape == (1, PAIR_CFG.fc_dim)


class TestCaptionImageCaffemodel:
    def test_roundtrip_forward_equivalence(self, tmp_path):
        p_a, s_a = caption_image_init(jax.random.PRNGKey(2), CAP_CFG)
        path = str(tmp_path / "cap.caffemodel")
        save_caffemodel_binaryproto(path, p_a, s_a)
        p_b, s_b = caption_image_init(jax.random.PRNGKey(8), CAP_CFG)
        p_b, s_b, report = load_caffemodel_binaryproto(path, p_b, s_b)
        assert all(v == "loaded" for v in report.values()), report
        batch = _cap_batch()
        out_a, _ = caption_image_apply(p_a, s_a, batch, CAP_CFG,
                                       train=False)
        out_b, _ = caption_image_apply(p_b, s_b, batch, CAP_CFG,
                                       train=False)
        np.testing.assert_array_equal(np.asarray(out_a["score_pos"]),
                                      np.asarray(out_b["score_pos"]))


class TestSolverStateFamilies:
    def test_pair_image_adadelta_roundtrip(self, tmp_path):
        from mms_answer_selection_tpu.training import (
            SolverConfig, make_solver)
        p, s = pair_image_init(jax.random.PRNGKey(3), PAIR_CFG)
        solver = make_solver(SolverConfig(solver_type="adadelta"))
        opt = solver.init(p)
        opt["h"] = jax.tree.map(lambda x: x + 0.125, opt["h"])
        opt["h2"] = jax.tree.map(lambda x: x + 0.5, opt["h2"])
        path = str(tmp_path / "pair.solverstate")
        save_solverstate_binaryproto(path, p, s, opt, 77, current_step=2)
        opt2 = solver.init(p)
        opt2, it, cur, _, report = load_solverstate(path, p, s, opt2)
        assert (it, cur) == (77, 2)
        for acc in ("h", "h2"):
            for a, b in zip(jax.tree.leaves(opt[acc]),
                            jax.tree.leaves(opt2[acc])):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestNetPrototxtFamilies:
    def test_pair_image_roundtrip(self):
        from mms_answer_selection_tpu.utils.prototxt import (
            pair_image_config_from_net_prototxt, pair_image_net_prototxt)
        text = pair_image_net_prototxt(PAIR_CFG)
        assert "PairImageData" in text and "PairRankLoss" in text
        cfg2 = pair_image_config_from_net_prototxt(text)
        assert cfg2 == PAIR_CFG

    def test_caption_image_roundtrip(self):
        from mms_answer_selection_tpu.utils.prototxt import (
            caption_image_config_from_net_prototxt,
            caption_image_net_prototxt)
        text = caption_image_net_prototxt(CAP_CFG)
        assert "SimCross" in text and "Reduction" in text
        cfg2 = caption_image_config_from_net_prototxt(
            text, caption_len=5, height=10, width=10, channels=3)
        assert cfg2 == CAP_CFG


class TestLegacyUpgrade:
    V1_NET = """
name: "legacy"
layers {
  name: "data" type: HDF5_DATA top: "data" top: "label"
  hdf5_data_param { source: "train.txt" batch_size: 32 }
}
layers {
  name: "conv1" type: CONVOLUTION bottom: "data" top: "conv1"
  blobs_lr: 1 blobs_lr: 2
  weight_decay: 1 weight_decay: 0
  convolution_param { num_output: 20 kernel_size: 5 stride: 1 }
}
layers { name: "pool1" type: POOLING bottom: "conv1" top: "pool1"
  pooling_param { pool: MAX kernel_size: 2 stride: 2 } }
layers { name: "act" type: TANH bottom: "pool1" top: "pool1" }
layers { name: "ip1" type: INNER_PRODUCT bottom: "pool1" top: "ip1"
  inner_product_param { num_output: 10 } }
layers { name: "loss" type: SOFTMAX_LOSS bottom: "ip1" bottom: "label" }
"""

    V0_NET = """
name: "ancient"
layers {
  layer { name: "conv1" type: "conv" num_output: 16 kernelsize: 3
          stride: 2 blobs_lr: 1 blobs_lr: 2 }
  bottom: "data" top: "conv1"
}
layers {
  layer { name: "pool1" type: "pool" pool: AVE kernelsize: 2 stride: 2 }
  bottom: "conv1" top: "pool1"
}
layers {
  layer { name: "drop" type: "dropout" dropout_ratio: 0.4 }
  bottom: "pool1" top: "pool1"
}
layers {
  layer { name: "ip" type: "innerproduct" num_output: 5 }
  bottom: "pool1" top: "ip"
}
"""

    def test_v1_upgrade(self):
        from mms_answer_selection_tpu.utils.prototxt import (
            parse_prototxt, upgrade_net_prototxt)
        d = upgrade_net_prototxt(parse_prototxt(self.V1_NET))
        assert "layers" not in d and len(d["layer"]) == 6
        types = [la["type"] for la in d["layer"]]
        assert types == ["HDF5Data", "Convolution", "Pooling", "TanH",
                         "InnerProduct", "SoftmaxWithLoss"]
        conv = d["layer"][1]
        assert conv["param"] == [{"lr_mult": 1, "decay_mult": 1},
                                 {"lr_mult": 2, "decay_mult": 0}]
        assert conv["convolution_param"]["kernel_size"] == 5

    def test_v0_upgrade(self):
        from mms_answer_selection_tpu.utils.prototxt import (
            parse_prototxt, upgrade_net_prototxt)
        d = upgrade_net_prototxt(parse_prototxt(self.V0_NET))
        types = [la["type"] for la in d["layer"]]
        assert types == ["Convolution", "Pooling", "Dropout",
                         "InnerProduct"]
        conv = d["layer"][0]
        assert conv["convolution_param"] == {"num_output": 16,
                                             "kernel_size": 3, "stride": 2}
        assert conv["param"][0]["lr_mult"] == 1
        assert conv["bottom"] == "data" and conv["top"] == "conv1"
        pool = d["layer"][1]
        assert pool["pooling_param"]["pool"] == "AVE"
        drop = d["layer"][2]
        assert drop["dropout_param"]["dropout_ratio"] == 0.4

    def test_v1_era_mms_net_ingested(self):
        """A transitional QA-family net: generic layers still in V1 enum
        form, fork layers (post-V1) as modern strings -- the upgrade must
        normalize the generic part so config recovery works end-to-end."""
        from mms_answer_selection_tpu.utils.prototxt import (
            model_config_from_net_prototxt)
        net = """
layers { name: "data" type: HDF5_DATA
  top: "question" top: "answer" top: "label" top: "overlap_feat"
  hdf5_data_param { source: "t.txt" batch_size: 50 } }
layers { name: "w2v_q" type: Embed bottom: "question" top: "w2v_q"
  embed_param { num_output: 50 input_dim: 120 } }
layers { name: "w2v_a" type: Embed bottom: "answer" top: "w2v_a"
  embed_param { num_output: 50 input_dim: 120 } }
layers { name: "sim" type: SimCross bottom: "w2v_q" bottom: "w2v_a"
  top: "sim"
  sim_cross_param { dist_mode: 2 mesure_count: 4 bias_term: true } }
layers { name: "conv0" type: CONVOLUTION bottom: "sim" top: "conv0"
  convolution_param { num_output: 32 kernel_size: 5 } }
layers { name: "pool0" type: POOLING bottom: "conv0" top: "pool0"
  pooling_param { pool: AVE kernel_size: 4 stride: 4 } }
layers { name: "fc1" type: INNER_PRODUCT bottom: "pool0" top: "fc1"
  inner_product_param { num_output: 32 } }
layers { name: "fc2" type: INNER_PRODUCT bottom: "fc1" top: "fc2"
  inner_product_param { num_output: 2 } }
layers { name: "loss" type: SOFTMAX_LOSS bottom: "fc2" bottom: "label" }
"""
        cfg = model_config_from_net_prototxt(net)
        assert cfg.vocab_size == 120 and cfg.sim_measures == 4
        assert cfg.blocks == (ConvBlock(5, 5, 32, "ave", 4, 4),)
        assert cfg.fc1_dim == 32 and cfg.num_classes == 2
