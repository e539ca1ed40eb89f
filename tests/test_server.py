"""HTTP retrieval service tests (serve/server.py).

The reference has no serving daemon — its closest path is ``caffe test``
batch scoring (tools/caffe.cpp:229-296).  These tests pin the rebuild's
persistent service: route behavior, tokens/text query parity with direct
``QueryEngine.query`` calls, the two-phase rerank path, error handling,
and the stats counters."""

import json
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mms_answer_selection_tpu.data.trec_qa import build_vocab
from mms_answer_selection_tpu.models.mms_qa import (ConvBlock, MMSQAConfig,
                                                    mms_qa_init)
from mms_answer_selection_tpu.serve import QAServer, QueryEngine

CFG = MMSQAConfig(
    vocab_size=34, embed_dim=16, question_len=6, answer_len=6,
    sim_measures=2,
    blocks=(ConvBlock(3, 3, 4, "ave", 2, 2), ConvBlock(2, 2, 4, "ave", 1, 1)),
    fc1_dim=4)

rng = np.random.default_rng(5)
WORDS = [f"w{i}" for i in range(32)]  # vocab_size = 32 + unknown + pad


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, json.loads(r.read())


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, json.loads(r.read())


@pytest.fixture(scope="module")
def served():
    params, state = mms_qa_init(jax.random.PRNGKey(0), CFG)
    params["sim"]["w"] = jnp.asarray(
        rng.normal(size=params["sim"]["w"].shape).astype(np.float32) * 0.2)
    cand_ids = rng.integers(0, CFG.vocab_size, (24, CFG.answer_len))
    eng = QueryEngine(params, CFG, pool_dtype=jnp.float32, interpret=True)
    eng.build_index(cand_ids)
    srv = QAServer(eng, state=state, vocab_words=np.asarray(WORDS),
                   port=0).start()
    yield srv, eng, state
    srv.close()


class TestRoutes:
    def test_healthz(self, served):
        srv, eng, _ = served
        code, h = _get(f"http://{srv.host}:{srv.port}/healthz")
        assert code == 200 and h["ok"] and h["pool"] == eng.pool_size
        assert h["text_queries"] is True

    def test_unknown_route_404(self, served):
        srv, _, _ = served
        with pytest.raises(urllib.error.HTTPError) as ei:
            _get(f"http://{srv.host}:{srv.port}/nope")
        assert ei.value.code == 404

    def test_stats_counters_advance(self, served):
        srv, _, _ = served
        _post(f"http://{srv.host}:{srv.port}/query",
              {"tokens": [list(range(CFG.question_len))], "k": 3})
        code, s = _get(f"http://{srv.host}:{srv.port}/stats")
        assert code == 200 and s["queries_served"] >= 1
        assert s["p50_ms"] > 0


class TestQueries:
    def test_tokens_match_direct_engine_call(self, served):
        srv, eng, _ = served
        q = rng.integers(0, CFG.vocab_size,
                         (3, CFG.question_len)).astype(int)
        code, out = _post(f"http://{srv.host}:{srv.port}/query",
                          {"tokens": q.tolist(), "k": 5})
        assert code == 200 and len(out["results"]) == 3
        vals, idx = eng.query(q.astype(np.int32), k=5)
        for r, ri, rv in zip(out["results"], np.asarray(idx),
                             np.asarray(vals)):
            got = np.asarray(r["topk"])
            np.testing.assert_array_equal(got[:, 0].astype(int), ri)
            np.testing.assert_allclose(got[:, 1], rv, rtol=1e-5, atol=1e-6)

    def test_single_row_autobatch_and_short_row_padding(self, served):
        srv, eng, _ = served
        # a 2-token row center-pads with pad_idx (build_vocab tail), the
        # same transform the data pipeline applies (encode_tokens)
        code, out = _post(f"http://{srv.host}:{srv.port}/query",
                          {"tokens": [1, 2], "k": 4})
        assert code == 200 and len(out["results"]) == 1
        padded = np.full((1, CFG.question_len), 33, np.int32)
        pad_b = (CFG.question_len - 2) // 2
        padded[0, pad_b: pad_b + 2] = [1, 2]
        vals, idx = eng.query(padded, k=4)
        got = np.asarray(out["results"][0]["topk"])
        np.testing.assert_array_equal(got[:, 0].astype(int),
                                      np.asarray(idx)[0])

    def test_text_query_matches_manual_encoding(self, served):
        srv, eng, _ = served
        # "w3 w7 zzz" -> [3, 7, unknown_idx], center-padded; parity with
        # build_vocab's (n, n+1) unknown/pad layout (data/trec_qa.py)
        vocab, unk, pad, _, _ = build_vocab(WORDS, {w: [0.0] for w in WORDS})
        assert (unk, pad) == (32, 33)
        code, out = _post(f"http://{srv.host}:{srv.port}/query",
                          {"text": "W3 w7 zzz", "k": 4})
        assert code == 200
        row = np.full((1, CFG.question_len), pad, np.int32)
        pad_b = (CFG.question_len - 3) // 2
        row[0, pad_b: pad_b + 3] = [3, 7, unk]
        vals, idx = eng.query(row, k=4)
        got = np.asarray(out["results"][0]["topk"])
        np.testing.assert_array_equal(got[:, 0].astype(int),
                                      np.asarray(idx)[0])
        np.testing.assert_allclose(got[:, 1], np.asarray(vals)[0],
                                   rtol=1e-5, atol=1e-6)

    def test_rerank_matches_engine_rerank(self, served):
        srv, eng, state = served
        q = rng.integers(0, CFG.vocab_size,
                         (2, CFG.question_len)).astype(np.int32)
        code, out = _post(f"http://{srv.host}:{srv.port}/query",
                          {"tokens": q.tolist(), "k": 3, "rerank": 8})
        assert code == 200
        vals, idx = eng.query_rerank(state, q, k=3, shortlist=8)
        for r, ri in zip(out["results"], np.asarray(idx)):
            got = np.asarray(r["topk"])
            np.testing.assert_array_equal(got[:, 0].astype(int), ri)


class TestErrors:
    def test_missing_body_fields_400(self, served):
        srv, _, _ = served
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"http://{srv.host}:{srv.port}/query", {"k": 3})
        assert ei.value.code == 400

    def test_out_of_range_token_400(self, served):
        srv, _, _ = served
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"http://{srv.host}:{srv.port}/query",
                  {"tokens": [[0, 1, 99]]})
        assert ei.value.code == 400
        body = json.loads(ei.value.read())
        assert "token ids" in body["error"]

    def test_bad_k_400(self, served):
        srv, _, _ = served
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"http://{srv.host}:{srv.port}/query",
                  {"tokens": [[0, 1]], "k": 0})
        assert ei.value.code == 400

    def test_errors_counted_and_server_survives(self, served):
        srv, _, _ = served
        try:
            _post(f"http://{srv.host}:{srv.port}/query", {"k": 0})
        except urllib.error.HTTPError:
            pass
        code, h = _get(f"http://{srv.host}:{srv.port}/healthz")
        assert code == 200 and h["errors"] >= 1

    def test_unbuilt_engine_rejected(self):
        params, _ = mms_qa_init(jax.random.PRNGKey(0), CFG)
        eng = QueryEngine(params, CFG, interpret=True)
        with pytest.raises(ValueError):
            QAServer(eng, port=0)


class TestErrorBranches:
    """The remaining 4xx/5xx branches and the no-vocab server mode."""

    def _url(self, srv):
        return f"http://{srv.host}:{srv.port}"

    def test_post_unknown_route_404(self, served):
        srv, _, _ = served
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(self._url(srv) + "/nope", {"tokens": [[1, 2]]})
        assert ei.value.code == 404

    def test_non_object_body_400(self, served):
        srv, _, _ = served
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(self._url(srv) + "/query", [1, 2, 3])
        assert ei.value.code == 400
        assert "JSON object" in json.loads(ei.value.read())["error"]

    def test_bad_text_type_400(self, served):
        srv, _, _ = served
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(self._url(srv) + "/query", {"text": [1, 2]})
        assert ei.value.code == 400

    def test_empty_tokens_400(self, served):
        srv, _, _ = served
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(self._url(srv) + "/query", {"tokens": []})
        assert ei.value.code == 400

    def test_max_batch_400(self, served):
        srv, _, _ = served
        old = srv.max_batch
        srv.max_batch = 2
        try:
            with pytest.raises(urllib.error.HTTPError) as ei:
                _post(self._url(srv) + "/query",
                      {"tokens": [[1], [2], [3]]})
            assert ei.value.code == 400
            assert "max_batch" in json.loads(ei.value.read())["error"]
        finally:
            srv.max_batch = old

    def test_invalid_json_400(self, served):
        srv, _, _ = served
        req = urllib.request.Request(
            self._url(srv) + "/query", data=b"{not json",
            headers={"Content-Type": "application/json"}, method="POST")
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 400
        assert "invalid JSON" in json.loads(ei.value.read())["error"]

    def test_tokens_not_a_list_400(self, served):
        srv, _, _ = served
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(self._url(srv) + "/query", {"tokens": {"a": 1}})
        assert ei.value.code == 400

    def test_tokens_row_not_ids_400(self, served):
        srv, _, _ = served
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(self._url(srv) + "/query", {"tokens": [["x", "y"]]})
        assert ei.value.code == 400
        assert "row 0" in json.loads(ei.value.read())["error"]

    def test_negative_rerank_400(self, served):
        srv, _, _ = served
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(self._url(srv) + "/query",
                  {"tokens": [[1, 2]], "rerank": -3})
        assert ei.value.code == 400

    def test_non_integer_k_400(self, served):
        srv, _, _ = served
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(self._url(srv) + "/query",
                  {"tokens": [[1, 2]], "k": "many"})
        assert ei.value.code == 400
        assert "integers" in json.loads(ei.value.read())["error"]

    def test_unexpected_error_500_and_survives(self, served, monkeypatch):
        srv, _, _ = served
        monkeypatch.setattr(
            srv, "handle_query",
            lambda req: (_ for _ in ()).throw(RuntimeError("boom")))
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(self._url(srv) + "/query", {"tokens": [[1]]})
        assert ei.value.code == 500
        assert "boom" in json.loads(ei.value.read())["error"]
        monkeypatch.undo()
        code, _ = _post(self._url(srv) + "/query",
                        {"tokens": [[1, 2, 3]], "k": 2})
        assert code == 200


class TestApproximateMode:
    """POST /query {"shortlist": N}: the coarse-probe path over the
    engine's IVF index (serve/ivf.py), server-side plumbing."""

    @pytest.fixture(scope="class")
    def ivf_served(self):
        params, state = mms_qa_init(jax.random.PRNGKey(0), CFG)
        params["sim"]["w"] = jnp.asarray(
            rng.normal(size=params["sim"]["w"].shape).astype(np.float32)
            * 0.2)
        cand_ids = rng.integers(0, CFG.vocab_size, (48, CFG.answer_len))
        eng = QueryEngine(params, CFG, pool_dtype=jnp.float32,
                          interpret=True)
        eng.build_index(cand_ids)
        eng.build_ivf(n_clusters=4, coarse_tokens=3)
        srv = QAServer(eng, state=state, port=0).start()
        yield srv, eng
        srv.close()

    def _url(self, srv):
        return f"http://{srv.host}:{srv.port}"

    def test_full_shortlist_matches_brute_force(self, ivf_served):
        srv, eng = ivf_served
        row = list(range(CFG.question_len))
        code, out = _post(self._url(srv) + "/query",
                          {"tokens": row, "k": 5, "shortlist": 48})
        assert code == 200
        bv, bi = eng.query(srv._pad_tokens([row]), k=5)
        got_v = [p[1] for p in out["results"][0]["topk"]]
        np.testing.assert_allclose(got_v, np.asarray(bv)[0], rtol=1e-5)

    def test_healthz_reports_ivf(self, ivf_served):
        srv, _ = ivf_served
        _, h = _get(self._url(srv) + "/healthz")
        assert h["ivf"] is True

    def test_shortlist_plus_rerank_400(self, ivf_served):
        srv, _ = ivf_served
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(self._url(srv) + "/query",
                  {"tokens": [1, 2], "shortlist": 8, "rerank": 8})
        assert ei.value.code == 400

    def test_shortlist_without_ivf_400(self, served):
        srv, _, _ = served  # module fixture: engine has no IVF
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"http://{srv.host}:{srv.port}/query",
                  {"tokens": [1, 2], "shortlist": 8})
        assert ei.value.code == 400
        assert "IVF" in json.loads(ei.value.read())["error"]

    def test_negative_shortlist_400(self, ivf_served):
        srv, _ = ivf_served
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(self._url(srv) + "/query",
                  {"tokens": [1, 2], "shortlist": -1})
        assert ei.value.code == 400


class TestMicroBatching:
    """Concurrent-request coalescing (serve/server.py _MicroBatcher)
    and power-of-two bucket padding -- rebuild-only serving features;
    results must be bit-identical to unbatched dispatch."""

    @pytest.fixture(scope="class")
    def batched(self):
        params, state = mms_qa_init(jax.random.PRNGKey(0), CFG)
        params["sim"]["w"] = jnp.asarray(
            rng.normal(size=params["sim"]["w"].shape).astype(np.float32)
            * 0.2)
        cand_ids = rng.integers(0, CFG.vocab_size, (24, CFG.answer_len))
        eng = QueryEngine(params, CFG, pool_dtype=jnp.float32,
                          interpret=True)
        eng.build_index(cand_ids)
        srv = QAServer(eng, state=state, vocab_words=np.asarray(WORDS),
                       port=0, batch_window_ms=60.0).start()
        yield srv, eng
        srv.close()

    def _url(self, srv):
        return f"http://{srv.host}:{srv.port}"

    def test_concurrent_requests_coalesce_and_match_sequential(
            self, batched):
        import threading
        srv, eng = batched
        queries = [[(i * 3 + j) % CFG.vocab_size for j in range(4)]
                   for i in range(6)]
        # ground truth: each row queried alone, directly on the engine
        direct = [tuple(np.asarray(a)[0].tolist()
                        for a in eng.query(srv._pad_tokens([qr]), k=3))
                  for qr in queries]

        before = srv.stats.snapshot()
        results = [None] * len(queries)

        def fire(i):
            _, out = _post(self._url(srv) + "/query",
                           {"tokens": queries[i], "k": 3})
            results[i] = out["results"][0]["topk"]

        threads = [threading.Thread(target=fire, args=(i,))
                   for i in range(len(queries))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        after = srv.stats.snapshot()
        for i, (dv, di) in enumerate(direct):
            got_i = [p[0] for p in results[i]]
            got_v = [p[1] for p in results[i]]
            assert got_i == list(di), f"row {i} indices"
            np.testing.assert_allclose(got_v, dv, rtol=1e-6)
        made = after["device_dispatches"] - before["device_dispatches"]
        served = after["queries_served"] - before["queries_served"]
        assert served == len(queries)
        assert made < served, "no coalescing happened"

    def test_mixed_keys_dispatch_separately_but_correctly(self, batched):
        import threading
        srv, eng = batched
        row = list(range(5))
        want = {}
        for k in (2, 4):
            v, i = eng.query(srv._pad_tokens([row]), k=k)
            want[k] = (np.asarray(v)[0], np.asarray(i)[0])
        outs = {}

        def fire(k):
            _, out = _post(self._url(srv) + "/query",
                           {"tokens": row, "k": k})
            outs[k] = out["results"][0]["topk"]

        threads = [threading.Thread(target=fire, args=(k,))
                   for k in (2, 4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for k in (2, 4):
            assert [p[0] for p in outs[k]] == want[k][1].tolist()
            np.testing.assert_allclose([p[1] for p in outs[k]],
                                       want[k][0], rtol=1e-6)

    def test_bucket_padding_rows_counted(self, batched):
        srv, _ = batched
        before = srv.stats.snapshot()
        code, out = _post(self._url(srv) + "/query",
                          {"tokens": [[1, 2], [3, 4], [5, 6]], "k": 2})
        assert code == 200 and len(out["results"]) == 3
        after = srv.stats.snapshot()
        # 3 request rows pad up to the 4-row bucket
        assert (after["device_dispatch_rows"]
                - before["device_dispatch_rows"]) == 4

    def test_batcher_delivers_engine_errors_and_survives(
            self, batched, monkeypatch):
        srv, eng = batched
        monkeypatch.setattr(
            eng, "query",
            lambda *a, **kw: (_ for _ in ()).throw(RuntimeError("kaboom")))
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(self._url(srv) + "/query", {"tokens": [1, 2]})
        assert ei.value.code == 500
        assert "kaboom" in json.loads(ei.value.read())["error"]
        monkeypatch.undo()
        code, _ = _post(self._url(srv) + "/query", {"tokens": [1, 2]})
        assert code == 200

    def test_submit_after_close_rejected(self):
        params, _ = mms_qa_init(jax.random.PRNGKey(0), CFG)
        eng = QueryEngine(params, CFG, pool_dtype=jnp.float32,
                          interpret=True)
        eng.build_index(rng.integers(0, CFG.vocab_size,
                                     (8, CFG.answer_len)))
        srv = QAServer(eng, port=0, batch_window_ms=10.0)
        srv.close()
        with pytest.raises(RuntimeError, match="shutting down"):
            srv._batcher.submit((2, 0), srv._pad_tokens([[1, 2]]))


class TestNoVocabNoState:
    @pytest.fixture(scope="class")
    def bare(self):
        params, _state = mms_qa_init(jax.random.PRNGKey(1), CFG)
        params["sim"]["w"] = jnp.asarray(
            rng.normal(size=params["sim"]["w"].shape).astype(
                np.float32) * 0.2)
        cand_ids = rng.integers(0, CFG.vocab_size, (12, CFG.answer_len))
        eng = QueryEngine(params, CFG, pool_dtype=jnp.float32,
                          interpret=True)
        eng.build_index(cand_ids)
        srv = QAServer(eng, port=0).start()  # no vocab, no state
        yield srv
        srv.close()

    def test_vocab_tail_indices_inferred(self, bare):
        # build_vocab layout: unknown = V-2, pad = V-1
        assert bare.unknown_idx == CFG.vocab_size - 2
        assert bare.pad_idx == CFG.vocab_size - 1
        code, h = _get(f"http://{bare.host}:{bare.port}/healthz")
        assert code == 200 and h["text_queries"] is False

    def test_text_query_400_without_vocab(self, bare):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"http://{bare.host}:{bare.port}/query",
                  {"text": "hello world"})
        assert ei.value.code == 400
        assert "vocabulary" in json.loads(ei.value.read())["error"]

    def test_rerank_400_without_state(self, bare):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"http://{bare.host}:{bare.port}/query",
                  {"tokens": [[1, 2, 3]], "rerank": 8})
        assert ei.value.code == 400
        assert "state" in json.loads(ei.value.read())["error"]

    def test_tokens_still_served(self, bare):
        code, out = _post(f"http://{bare.host}:{bare.port}/query",
                          {"tokens": [[1, 2, 3, 4]], "k": 3})
        assert code == 200 and len(out["results"][0]["topk"]) == 3


class TestLiveUpdates:
    """POST /add and /remove mutate the live pool (rebuild-only — the
    reference re-embeds its whole split every run)."""

    @pytest.fixture()
    def fresh(self):
        params, state = mms_qa_init(jax.random.PRNGKey(1), CFG)
        params["sim"]["w"] = jnp.asarray(
            rng.normal(size=params["sim"]["w"].shape).astype(np.float32)
            * 0.2)
        cand_ids = rng.integers(0, CFG.vocab_size, (24, CFG.answer_len))
        eng = QueryEngine(params, CFG, pool_dtype=jnp.float32,
                          interpret=True)
        eng.build_index(cand_ids)
        srv = QAServer(eng, state=state, vocab_words=np.asarray(WORDS),
                       port=0).start()
        yield srv, eng
        srv.close()

    def test_add_then_query_sees_new_rows(self, fresh):
        srv, eng = fresh
        base = f"http://{srv.host}:{srv.port}"
        new = rng.integers(0, CFG.vocab_size,
                           (4, CFG.answer_len)).astype(int)
        code, out = _post(base + "/add", {"tokens": new.tolist()})
        assert code == 200 and out["added"] == [24, 25, 26, 27]
        assert out["pool"] == 28 and out["n_live"] == 28
        code, h = _get(base + "/healthz")
        assert h["pool"] == 28 and h["n_live"] == 28
        # the duplicate of an existing row must tie its twin's score
        code, q = _post(base + "/query",
                        {"tokens": [list(range(CFG.question_len))],
                         "k": 28})
        idx = [int(i) for i, _ in q["results"][0]["topk"]]
        assert set(idx) == set(range(28))

    def test_add_text_rows(self, fresh):
        srv, _ = fresh
        base = f"http://{srv.host}:{srv.port}"
        code, out = _post(base + "/add", {"text": ["w1 w2 w3", "w4 w5"]})
        assert code == 200 and out["added"] == [24, 25]

    def test_remove_tombstones(self, fresh):
        srv, eng = fresh
        base = f"http://{srv.host}:{srv.port}"
        code, q0 = _post(base + "/query",
                         {"tokens": [[1, 2, 3]], "k": 3})
        dead = [int(i) for i, _ in q0["results"][0]["topk"]][:2]
        code, out = _post(base + "/remove", {"rows": dead})
        assert code == 200 and out["removed"] == 2
        assert out["n_live"] == 22 and out["pool"] == 24
        code, q1 = _post(base + "/query", {"tokens": [[1, 2, 3]], "k": 10})
        got = {int(i) for i, _ in q1["results"][0]["topk"]}
        assert not (got & set(dead))

    def test_remove_bad_rows_400(self, fresh):
        srv, _ = fresh
        base = f"http://{srv.host}:{srv.port}"
        for body in ({"rows": []}, {"rows": "x"}, {"rows": [True]},
                     {"rows": [99]}, {}):
            with pytest.raises(urllib.error.HTTPError) as ei:
                _post(base + "/remove", body)
            assert ei.value.code == 400

    def test_add_drops_ivf_and_reports_it(self, fresh):
        srv, eng = fresh
        base = f"http://{srv.host}:{srv.port}"
        eng.build_ivf(n_clusters=3)
        code, out = _post(base + "/add", {"text": "w7 w8"})
        assert out["ivf_dropped"] is True
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base + "/query", {"tokens": [[1, 2]], "shortlist": 8})
        assert ei.value.code == 400

    def test_add_bad_shape_400(self, fresh):
        srv, _ = fresh
        base = f"http://{srv.host}:{srv.port}"
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(base + "/add", {"tokens": [[999]]})
        assert ei.value.code == 400

    def test_compact_endpoint(self, fresh):
        srv, eng = fresh
        base = f"http://{srv.host}:{srv.port}"
        _post(base + "/remove", {"rows": [0, 1]})
        code, out = _post(base + "/compact", {})
        assert code == 200 and out["pool"] == 22
        assert out["reclaimed"] == 2 and out["indices_shifted"] is True
        code, h = _get(base + "/healthz")
        assert h["pool"] == 22 and h["n_live"] == 22

    def test_concurrent_queries_and_updates(self, fresh):
        # queries race adds/removes; the device lock serializes them —
        # every response must be 200 and the final pool consistent
        import threading
        srv, eng = fresh
        base = f"http://{srv.host}:{srv.port}"
        errs = []

        def client(n):
            try:
                for _ in range(6):
                    code, _ = _post(base + "/query",
                                    {"tokens": [[1, 2, 3]], "k": 3})
                    assert code == 200
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        def mutator():
            try:
                for i in range(3):
                    code, _ = _post(
                        base + "/add",
                        {"tokens": [[int(i) % 30, 2, 3, 4]]})
                    assert code == 200
                    code, _ = _post(base + "/remove", {"rows": [i]})
                    assert code == 200
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(4)] + [threading.Thread(target=mutator)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert not errs, errs
        code, h = _get(base + "/healthz")
        assert h["pool"] == 27 and h["n_live"] == 24

    def test_overlong_k_never_emits_minus_infinity(self, fresh):
        # k > live pool ties into the -inf region; the JSON answer must
        # drop those sentinel slots (strict parsers reject -Infinity)
        srv, eng = fresh
        base = f"http://{srv.host}:{srv.port}"
        _post(base + "/remove", {"rows": [0, 1, 2]})
        req = urllib.request.Request(
            base + "/query",
            data=json.dumps({"tokens": [[1, 2, 3]], "k": 200}).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            raw = r.read().decode()
        assert "Infinity" not in raw
        out = json.loads(raw)
        topk = out["results"][0]["topk"]
        assert len(topk) == 21  # the 21 live candidates, nothing else
        assert all(i >= 0 for i, _ in topk)
