"""Data-prep tests: XML parsing rules, vocab layout, IDF/overlap features,
center padding, deterministic shuffling."""

import numpy as np
import math
import pytest

from mms_answer_selection_tpu.data import (
    ArrayDataset,
    BatchIterator,
    compute_dfs,
    compute_overlap_features,
    encode_split,
    parse_trec_xml,
    prepare_trec_qa,
    synthetic_corpus,
)
from mms_answer_selection_tpu.data.trec_qa import encode_tokens

XML = """<QApairs id='32.1'>
<question>
who\tshot\tkennedy
</question>
<positive>
oswald\tshot\tkennedy
</positive>
<negative>
the\tweather\tis\tnice
</negative>
<negative>
""" + "\t".join(["tok"] * 61) + """
</negative>
</QApairs>
<QApairs id='32.2'>
<question>
where\tis\tparis
</question>
<positive>
paris\tis\tin\tfrance
</positive>
</QApairs>
"""


class TestParse:
    def test_parse_rules(self):
        qids, qs, ans, labels = parse_trec_xml(XML)
        # the 61-token negative is skipped (answers > 60 tokens) — but
        # BUG-FOR-BUG with the reference, its `continue` leaves prev on
        # the label tag, so the CLOSING tag lands as a spurious 1-token
        # answer with the same label (do_trec_qa_clean.py:139-147;
        # reference artifacts contain these rows, so must ours)
        assert labels == [1, 0, 0, 1]
        assert qids == ["32.1", "32.1", "32.1", "32.2"]
        assert qs[0] == ["who", "shot", "kennedy"]
        assert ans[0] == ["oswald", "shot", "kennedy"]
        assert ans[1] == ["the", "weather", "is", "nice"]
        assert ans[2] == ["</negative>"]  # the reference's quirk row

    def test_idf(self):
        docs = [["a", "b"], ["b", "c"], ["c", "c"]]
        dfs = compute_dfs(docs)
        assert dfs["a"] == pytest.approx(math.log(3 / 1))
        assert dfs["b"] == pytest.approx(math.log(3 / 2))
        assert dfs["c"] == pytest.approx(math.log(3 / 2))

    def test_overlap_features(self):
        q = [["a", "b", "c"]]
        a = [["b", "c", "d", "d"]]
        feats = compute_overlap_features(q, a, word2df={"b": 2.0})
        # sets: |Q|=3 |A|=3, overlap {b,c}; idf: b->2.0, c->11.0 (OOV)
        np.testing.assert_allclose(feats[0], [2 / 6, 13.0 / 6], rtol=1e-6)

    def test_center_padding(self):
        vocab = {"x": 0, "y": 1}
        out = encode_tokens(["x", "y"], vocab, 9, 8, 6)
        # slen=2, pad_b=(6-2)//2=2, pad_a=2
        assert out == [8, 8, 0, 1, 8, 8]
        out = encode_tokens(["x"] * 9, vocab, 9, 8, 4)  # truncate
        assert out == [0, 0, 0, 0]


class TestPrepare:
    def test_end_to_end_prepare(self):
        xml, w2v = synthetic_corpus(n_questions=6, seed=1)
        splits, info = prepare_trec_qa(xml, xml, xml, w2v)
        tr = splits["train"]
        assert tr["question"].shape[1] == 40
        assert tr["answer"].shape[1] == 40
        assert tr["overlap_feat"].shape[1] == 2
        assert info["vocab_size"] == len(info["vocab"]) + 2
        assert info["pretrained"].shape == (len(info["vocab"]), 50)
        # ids within range; pad id used
        assert tr["question"].max() < info["vocab_size"]
        assert (tr["question"] == info["pad_idx"]).any()
        # groups dense 0..n-1
        assert set(np.unique(tr["group"])) == set(range(6))
        # every group has at least one positive
        for g in range(6):
            assert tr["label"][tr["group"] == g].max() == 1

    def test_oov_maps_to_unknown(self):
        xml, w2v = synthetic_corpus(n_questions=4, seed=2)
        splits, info = prepare_trec_qa(xml, xml, xml, w2v)
        # synthetic corpus has ~15% OOV words -> unknown idx must appear
        assert (splits["train"]["answer"] == info["unknown_idx"]).any() or \
               (splits["train"]["question"] == info["unknown_idx"]).any()


class TestLoader:
    def _ds(self, n=10):
        return ArrayDataset({"x": np.arange(n), "y": np.arange(n) * 2})

    def test_deterministic_shuffle(self):
        it1 = BatchIterator(self._ds(), 4, seed=5)
        it2 = BatchIterator(self._ds(), 4, seed=5)
        for _ in range(5):
            b1, b2 = next(it1), next(it2)
            np.testing.assert_array_equal(b1["x"], b2["x"])

    def test_epoch_covers_all_rows(self):
        it = BatchIterator(self._ds(10), 5, seed=0)
        seen = np.concatenate([next(it)["x"], next(it)["x"]])
        assert set(seen) == set(range(10))

    def test_wraparound_keeps_batch_size(self):
        it = BatchIterator(self._ds(10), 7, seed=0)
        for _ in range(4):
            assert len(next(it)["x"]) == 7

    def test_sharding_partitions_rows(self):
        ds = self._ds(12)
        a = BatchIterator(ds, 6, seed=1, shard=(0, 2))
        b = BatchIterator(ds, 6, seed=1, shard=(1, 2))
        rows_a = set(next(a)["x"])
        rows_b = set(next(b)["x"])
        assert rows_a.isdisjoint(rows_b)
        assert rows_a | rows_b == set(range(12))

    def test_no_shuffle_is_sequential(self):
        it = BatchIterator(self._ds(6), 3, seed=0, shuffle=False)
        np.testing.assert_array_equal(next(it)["x"], [0, 1, 2])
        np.testing.assert_array_equal(next(it)["x"], [3, 4, 5])


class TestRound4LoaderFixes:
    def test_empty_shard_raises(self):
        from mms_answer_selection_tpu.data.loader import (ArrayDataset,
                                                          BatchIterator)

        ds = ArrayDataset({"x": np.arange(3)})
        with pytest.raises(ValueError, match="empty"):
            BatchIterator(ds, 2, shard=(3, 4))  # stripe 3 of 4 rows 3::4

    def test_shuffle_chain_unchanged_on_cpu_device(self):
        """The CPU-pinned permutation must produce the SAME threefry
        chain (golden trajectories depend on it)."""
        import jax

        from mms_answer_selection_tpu.data.loader import (ArrayDataset,
                                                          BatchIterator)

        ds = ArrayDataset({"x": np.arange(64)})
        it = BatchIterator(ds, 64, seed=5)
        got = next(it)["x"]
        key = jax.random.fold_in(jax.random.PRNGKey(5), 0)
        want = np.arange(64)[np.asarray(jax.random.permutation(key, 64))]
        np.testing.assert_array_equal(got, want)


def test_hdf5_two_phases_share_directory(tmp_path):
    """Phase-scoped chunk names: train + test splits in ONE directory
    must not clobber each other (the list file is the read contract)."""
    from mms_answer_selection_tpu.data.hdf5_compat import (load_hdf5_list,
                                                           save_hdf5_chunks)

    tr = {"data": np.ones((4, 3), np.float32), "label": np.zeros(4)}
    te = {"data": np.full((2, 3), 9.0, np.float32), "label": np.ones(2)}
    ltr = save_hdf5_chunks(str(tmp_path), "train", tr)
    lte = save_hdf5_chunks(str(tmp_path), "test", te)
    back_tr = load_hdf5_list(ltr)
    back_te = load_hdf5_list(lte)
    np.testing.assert_array_equal(back_tr["data"], tr["data"])
    np.testing.assert_array_equal(back_te["data"], te["data"])
