"""Metric suite tests: hand-computed expectations per the reference layer
semantics, numpy-vs-jax parity (including ties), trec_eval convention."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mms_answer_selection_tpu.metrics import (
    auc,
    auc_jax,
    mean_average_precision,
    mean_average_precision_jax,
    mean_reciprocal_rank,
    mean_reciprocal_rank_jax,
    rank_accuracy,
    rank_accuracy_jax,
    trec_eval,
    write_trec_files,
)

rng = np.random.default_rng(22)


class TestHandComputed:
    # group 0: scores [.9 pos, .8 neg, .7 pos]  -> first pos rank 1, AP=(1/1+2/3)/2
    # group 1: scores [.6 neg, .5 pos]          -> first pos rank 2, AP=1/2
    # group 2: all positive -> skipped (mrr_layer.cpp:71-73)
    scores = [0.9, 0.8, 0.7, 0.6, 0.5, 0.4, 0.3]
    labels = [1, 0, 1, 0, 1, 1, 1]
    groups = [0, 0, 0, 1, 1, 2, 2]

    def test_mrr(self):
        expect = (1.0 / 1 + 1.0 / 2) / 2
        assert mean_reciprocal_rank(self.scores, self.labels,
                                    self.groups) == pytest.approx(expect)

    def test_map(self):
        ap0 = (1.0 / 1 + 2.0 / 3) / 2
        ap1 = 1.0 / 2
        expect = (ap0 + ap1) / 2
        assert mean_average_precision(self.scores, self.labels,
                                      self.groups) == pytest.approx(expect)

    def test_auc_rank_sum(self):
        # sorted order = input order; walk: high after each element,
        # auc += high per negative above it (auc_layer.cpp:119-123)
        scores = [0.9, 0.8, 0.7, 0.6]
        labels = [1, 0, 1, 0]
        # neg .8 sees 1 pos above; neg .6 sees 2 -> (1+2)/(2*2)
        assert auc(scores, labels) == pytest.approx(3 / 4)

    def test_auc_no_positives_is_zero(self):
        assert auc([0.5, 0.4], [0, 0]) == 0.0

    def test_auc_ignore_label(self):
        scores = [0.9, 0.8, 0.7, 0.6]
        labels = [1, 2, 1, 0]
        assert auc(scores, labels, ignore_label=2) == pytest.approx(1.0)

    def test_rank_accuracy(self):
        a = [1.0, 2.0, 3.0, 1.0]
        b = [0.5, 2.5, 2.0, 1.0]
        label = [1, 1, -1, 1]  # wins: +0.5>0 yes; -0.5>0 no; -1*1>0 no; 0>0 no
        assert rank_accuracy(a, b, label) == pytest.approx(0.25)


class TestNumpyJaxParity:
    def _random_case(self, n=60, n_groups=7, ties=False):
        scores = rng.normal(size=n).astype(np.float32)
        if ties:
            scores = np.round(scores * 4) / 4
        labels = (rng.random(n) < 0.35).astype(np.int64)
        groups = rng.integers(0, n_groups, size=n)
        return scores, labels, groups

    @pytest.mark.parametrize("ties", [False, True])
    def test_mrr_map_auc_parity(self, ties):
        for _ in range(5):
            s, l, g = self._random_case(ties=ties)
            np.testing.assert_allclose(
                float(mean_reciprocal_rank_jax(jnp.asarray(s), jnp.asarray(l),
                                               jnp.asarray(g))),
                mean_reciprocal_rank(s, l, g), rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(
                float(mean_average_precision_jax(jnp.asarray(s), jnp.asarray(l),
                                                 jnp.asarray(g))),
                mean_average_precision(s, l, g), rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(
                float(auc_jax(jnp.asarray(s), jnp.asarray(l))),
                auc(s, l), rtol=1e-5, atol=1e-6)

    def test_rank_accuracy_parity(self):
        a = rng.normal(size=20).astype(np.float32)
        b = rng.normal(size=20).astype(np.float32)
        l = rng.choice([-1.0, 1.0], size=20).astype(np.float32)
        np.testing.assert_allclose(
            float(rank_accuracy_jax(jnp.asarray(a), jnp.asarray(b),
                                    jnp.asarray(l))),
            rank_accuracy(a, b, l), rtol=1e-6)

    def test_jax_metrics_jit(self):
        s, l, g = self._random_case()
        f = jax.jit(lambda s_, l_, g_: (
            mean_reciprocal_rank_jax(s_, l_, g_),
            mean_average_precision_jax(s_, l_, g_),
            auc_jax(s_, l_)))
        out = f(jnp.asarray(s), jnp.asarray(l), jnp.asarray(g))
        np.testing.assert_allclose(float(out[0]),
                                   mean_reciprocal_rank(s, l, g), rtol=1e-5)


class TestTrecEval:
    def test_in_memory_matches_layer_metrics_when_tie_free(self):
        n, n_groups = 80, 9
        scores = rng.permutation(n).astype(np.float64) / n  # tie-free
        labels = (rng.random(n) < 0.4).astype(np.int64)
        groups = rng.integers(0, n_groups, size=n)
        res = trec_eval(scores=scores, labels=labels, groups=groups)
        if res["num_q"] == 0:
            pytest.skip("degenerate draw")
        assert res["map"] == pytest.approx(
            mean_average_precision(scores, labels, groups), abs=1e-9)
        assert res["recip_rank"] == pytest.approx(
            mean_reciprocal_rank(scores, labels, groups), abs=1e-9)

    def test_file_roundtrip(self, tmp_path):
        scores = [0.9, 0.8, 0.7, 0.6, 0.5]
        labels = [1, 0, 0, 1, 1]
        groups = [0, 0, 1, 1, 2]  # group 2 all-pos -> filtered
        truth, result = tmp_path / "truth", tmp_path / "result"
        write_trec_files(truth, result, scores, labels, groups)
        lines = truth.read_text().strip().split("\n")
        assert len(lines) == 4  # group 2 dropped
        assert lines[0].split() == ["1", "0", "0", "1"]
        res_file = trec_eval(str(truth), str(result))
        res_mem = trec_eval(scores=scores, labels=labels, groups=groups)
        assert res_file["map"] == pytest.approx(res_mem["map"])
        assert res_file["num_q"] == 2

    def test_p_at_k_and_counts(self):
        scores = [0.9, 0.8, 0.7]
        labels = [1, 0, 1]
        groups = [0, 0, 0]
        res = trec_eval(scores=scores, labels=labels, groups=groups)
        assert res["num_q"] == 1
        assert res["num_rel"] == 2
        assert res["P_5"] == pytest.approx(2 / 5)
        assert res["ircl_prn.0.00"] == pytest.approx(1.0)
        assert res["ircl_prn.1.00"] == pytest.approx(2 / 3)


class TestEdgeCases:
    def test_empty_inputs(self):
        assert mean_reciprocal_rank([], [], []) == 0.0
        assert mean_average_precision([], [], []) == 0.0
        assert auc([], []) == 0.0

    def test_single_sample_group_skipped(self):
        # one sample cannot have both a positive and a negative
        assert mean_average_precision([0.5], [1], [0]) == 0.0
        assert mean_reciprocal_rank([0.5], [0], [0]) == 0.0

    def test_all_ties(self):
        scores = [0.5, 0.5, 0.5, 0.5]
        labels = [1, 0, 1, 0]
        groups = [0, 0, 0, 0]
        # insertion order: pos@1, neg@2, pos@3, neg@4
        assert mean_reciprocal_rank(scores, labels, groups) == 1.0
        expect_ap = (1 / 1 + 2 / 3) / 2
        assert mean_average_precision(scores, labels,
                                      groups) == pytest.approx(expect_ap)
        # jax twin agrees on full ties
        np.testing.assert_allclose(
            float(mean_average_precision_jax(jnp.asarray(scores),
                                             jnp.asarray(labels),
                                             jnp.asarray(groups))),
            expect_ap, rtol=1e-5)

    def test_negative_and_noncontiguous_group_ids(self):
        scores = [0.9, 0.1, 0.8, 0.2]
        labels = [1, 0, 1, 0]
        groups = [-7, -7, 1000, 1000]
        assert mean_average_precision(scores, labels, groups) == 1.0
        np.testing.assert_allclose(
            float(mean_average_precision_jax(jnp.asarray(scores),
                                             jnp.asarray(labels),
                                             jnp.asarray(groups, jnp.int32))),
            1.0, rtol=1e-5)

    def test_trec_eval_no_effective_groups(self):
        res = trec_eval(scores=[0.5, 0.4], labels=[1, 1], groups=[0, 0])
        assert res["num_q"] == 0


class TestSortedForms:
    from mms_answer_selection_tpu.metrics import (
        auc_jax_sorted,
        mean_average_precision_jax_sorted,
        mean_reciprocal_rank_jax_sorted,
    )

    @pytest.mark.parametrize("ties", [False, True])
    def test_sorted_matches_numpy(self, ties):
        from mms_answer_selection_tpu.metrics import (
            auc_jax_sorted, mean_average_precision_jax_sorted,
            mean_reciprocal_rank_jax_sorted)
        for trial in range(6):
            n = int(rng.integers(10, 400))
            scores = rng.normal(size=n).astype(np.float32)
            if ties:
                scores = np.round(scores * 3) / 3
            labels = (rng.random(n) < 0.3).astype(np.int64)
            groups = rng.integers(-3, 12, size=n)
            np.testing.assert_allclose(
                float(mean_average_precision_jax_sorted(
                    jnp.asarray(scores), jnp.asarray(labels),
                    jnp.asarray(groups))),
                mean_average_precision(scores, labels, groups),
                rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(
                float(mean_reciprocal_rank_jax_sorted(
                    jnp.asarray(scores), jnp.asarray(labels),
                    jnp.asarray(groups))),
                mean_reciprocal_rank(scores, labels, groups),
                rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(
                float(auc_jax_sorted(jnp.asarray(scores),
                                     jnp.asarray(labels))),
                auc(scores, labels), rtol=1e-5, atol=1e-6)

    def test_sorted_jit_large(self):
        from mms_answer_selection_tpu.metrics import (
            mean_average_precision_jax_sorted)
        n = 20000  # far beyond the O(N^2) comfort zone
        scores = rng.normal(size=n).astype(np.float32)
        labels = (rng.random(n) < 0.2).astype(np.int64)
        groups = rng.integers(0, 800, size=n)
        f = jax.jit(mean_average_precision_jax_sorted)
        got = float(f(jnp.asarray(scores), jnp.asarray(labels),
                      jnp.asarray(groups)))
        np.testing.assert_allclose(
            got, mean_average_precision(scores, labels, groups),
            rtol=1e-4, atol=1e-5)


class TestBprefGmap:
    """bpref + gm_ap hand-computed cases (trec_eval-8.0 m_bpref semantics:
    per relevant doc, 1 - min(nonrel_above, R)/min(R, N), averaged over R;
    gm_ap = exp(mean(log(max(AP, 1e-5))))."""

    @staticmethod
    def _ev(scores, labels, groups):
        from mms_answer_selection_tpu.metrics import trec_eval
        return trec_eval(scores=np.asarray(scores, np.float64),
                         labels=np.asarray(labels),
                         groups=np.asarray(groups))

    def test_bpref_interleaved(self):
        # ranking 1,0,1,0,1: R=3, N=2 -> (1 + (1-1/2) + (1-2/2)) / 3 = 0.5
        ev = self._ev([5, 4, 3, 2, 1], [1, 0, 1, 0, 1], [0] * 5)
        assert ev["bpref"] == pytest.approx(0.5)
        assert ev["map"] == pytest.approx((1 + 2 / 3 + 3 / 5) / 3)

    def test_bpref_perfect_ranking(self):
        ev = self._ev([4, 3, 2, 1], [1, 1, 0, 0], [0] * 4)
        assert ev["bpref"] == pytest.approx(1.0)

    def test_bpref_worst_ranking(self):
        # all nonrel above all rel: every term is 1 - min(2,2)/2 = 0
        ev = self._ev([4, 3, 2, 1], [0, 0, 1, 1], [0] * 4)
        assert ev["bpref"] == pytest.approx(0.0)

    def test_bpref_cap_at_R(self):
        # R=1, N=3; rel ranked last: penalty min(3,1)/min(1,3) = 1 -> 0
        ev = self._ev([4, 3, 2, 1], [0, 0, 0, 1], [0] * 4)
        assert ev["bpref"] == pytest.approx(0.0)
        # rel ranked second: min(1,1)/1 = 1 -> 0 as well (cap bites)
        ev = self._ev([4, 3, 2, 1], [0, 1, 0, 0], [0] * 4)
        assert ev["bpref"] == pytest.approx(0.0)

    def test_gm_ap_two_queries(self):
        # query 0: AP 1.0; query 1: AP 0.5 -> gm_ap = sqrt(0.5)
        ev = self._ev([2, 1, 2, 1], [1, 0, 0, 1], [0, 0, 1, 1])
        assert ev["map"] == pytest.approx(0.75)
        assert ev["gm_ap"] == pytest.approx(np.sqrt(0.5))

    def test_gm_ap_equals_map_single_query(self):
        ev = self._ev([5, 4, 3, 2, 1], [1, 0, 1, 0, 1], [0] * 5)
        assert ev["gm_ap"] == pytest.approx(ev["map"])

    def test_file_and_array_paths_agree(self, tmp_path):
        from mms_answer_selection_tpu.metrics import (trec_eval,
                                                      write_trec_files)
        rng = np.random.default_rng(5)
        scores = rng.normal(size=60)
        labels = (rng.random(60) < 0.3).astype(np.int64)
        groups = np.repeat(np.arange(6), 10)
        truth, result = str(tmp_path / "t"), str(tmp_path / "r")
        write_trec_files(truth, result, scores, labels, groups)
        ev_f = trec_eval(truth, result)
        ev_a = trec_eval(scores=scores, labels=labels, groups=groups)
        for k in ("map", "gm_ap", "bpref", "recip_rank", "R-prec"):
            assert ev_f[k] == pytest.approx(ev_a[k]), k

    def test_format_trec_table_shape(self):
        from mms_answer_selection_tpu.metrics import format_trec_table
        ev = self._ev([5, 4, 3, 2, 1], [1, 0, 1, 0, 1], [0] * 5)
        table = format_trec_table(ev)
        lines = table.split("\n")
        # 9 headline rows + 11 ircl + 9 P@k = 29, README.md:20-49 shape
        assert len(lines) == 29
        assert lines[0].split("\t") == ["num_q          ", "all", "1"]
        assert any(ln.startswith("gm_ap") for ln in lines)
        assert any(ln.startswith("bpref") for ln in lines)
        assert any(ln.startswith("P5 ") for ln in lines)
        for ln in lines:
            assert len(ln.split("\t")) == 3


class TestRound4MetricFixes:
    def test_auc_sorted_large_split_no_overflow(self):
        """auc_jax_sorted's rank-sum overflowed int32 near 100k balanced
        samples — the exact regime the sorted form exists for."""
        from mms_answer_selection_tpu.metrics.ir_metrics import (auc,
                                                                 auc_jax_sorted)

        rng = np.random.default_rng(0)
        n = 150_000
        labels = rng.integers(0, 2, n).astype(np.int32)
        scores = (labels * 0.3 + rng.normal(0, 1, n)).astype(np.float32)
        want = auc(scores, labels)  # numpy path is int64-exact
        got = float(auc_jax_sorted(jnp.asarray(scores),
                                   jnp.asarray(labels)))
        assert 0.5 < want < 0.8  # sanity: separable but noisy
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_auc_no_negatives_is_zero_both(self):
        from mms_answer_selection_tpu.metrics.ir_metrics import (
            auc, auc_jax, auc_jax_sorted)

        scores = np.asarray([0.3, 0.9, 0.1], np.float32)
        ones = np.ones(3, np.int32)
        assert auc(scores, ones) == 0.0
        assert float(auc_jax(jnp.asarray(scores), jnp.asarray(ones))) == 0.0
        assert float(auc_jax_sorted(jnp.asarray(scores),
                                    jnp.asarray(ones))) == 0.0

    def test_rank_accuracy_jax_ravels_blob_shapes(self):
        from mms_answer_selection_tpu.metrics.ir_metrics import (
            rank_accuracy, rank_accuracy_jax)

        rng = np.random.default_rng(1)
        a = rng.normal(size=(16, 1)).astype(np.float32)  # caffe (N,1) blob
        b = rng.normal(size=(16, 1)).astype(np.float32)
        labels = rng.choice([-1.0, 1.0], 16).astype(np.float32)
        want = rank_accuracy(a, b, labels)
        got = float(rank_accuracy_jax(jnp.asarray(a), jnp.asarray(b),
                                      jnp.asarray(labels)))
        np.testing.assert_allclose(got, want)


class TestTrecEvalRound4:
    def test_tie_break_is_string_descending(self):
        """trec_eval-8.0 breaks sim ties by docno STRING comparison
        descending: '9' outranks '10'."""
        from mms_answer_selection_tpu.metrics.trec_eval import trec_eval

        scores = np.asarray([0.5, 0.5, 0.5], np.float64)
        labels = np.asarray([0, 0, 1], np.int32)
        groups = np.asarray([0, 0, 0], np.int32)
        # docnos are per-group insertion indices "0","1","2"... build a
        # group with 11 docs so "9" and "10" coexist; relevant doc = "9"
        scores = np.full(11, 0.5)
        labels = np.zeros(11, np.int32)
        labels[9] = 1
        groups = np.zeros(11, np.int32)
        ev = trec_eval(scores=scores, labels=labels, groups=groups)
        # string-descending tie order: 9,8,7,6,5,4,3,2,10,1,0 -> doc "9"
        # ranks FIRST
        assert ev["recip_rank"] == 1.0

    def test_all_degenerate_returns_full_zeroed(self):
        from mms_answer_selection_tpu.metrics.trec_eval import trec_eval

        ev = trec_eval(scores=np.asarray([0.1, 0.2]),
                       labels=np.asarray([0, 0]),
                       groups=np.asarray([0, 0]))
        assert ev["num_q"] == 0 and ev["map"] == 0.0
        assert "recip_rank" in ev and "P_5" in ev and "bpref" in ev
