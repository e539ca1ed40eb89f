"""Incremental index updates (QueryEngine.add_candidates /
remove_candidates).

Contracts:
  * add: engine state after appending == a fresh build over the full id
    list, EXACTLY (repacking is deterministic; int8 scales are
    per-candidate so old rows never requantize).
  * remove: tombstoned rows score -inf on every path and can never
    surface; every other row's score is untouched.
  * reserve capacity absorbs adds without growing the chunk stack
    (each distinct chunk count compiles its own scan program).

The reference has no incremental story: its serve path re-embeds the
whole split every run (do_trec_qa_clean.py:617-652)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mms_answer_selection_tpu.models.mms_qa import (ConvBlock, MMSQAConfig,
                                                    mms_qa_init)
from mms_answer_selection_tpu.serve import QueryEngine

CFG = MMSQAConfig(
    vocab_size=50, embed_dim=16, question_len=6, answer_len=6,
    sim_measures=2,
    blocks=(ConvBlock(3, 3, 4, "ave", 2, 2), ConvBlock(2, 2, 4, "ave", 1, 1)),
    fc1_dim=4)

rng = np.random.default_rng(7)
QUERIES = rng.integers(0, CFG.vocab_size, (4, CFG.question_len))


def _params():
    params, _ = mms_qa_init(jax.random.PRNGKey(0), CFG)
    params["sim"]["w"] = jnp.asarray(
        rng.normal(size=np.shape(params["sim"]["w"])).astype(np.float32)
        * 0.3)
    return params


PARAMS = _params()


def _ids(n, seed=None):
    r = np.random.default_rng(seed) if seed is not None else rng
    return r.integers(0, CFG.vocab_size, (n, CFG.answer_len))


def _engine(pool_dtype=jnp.float32, **kw):
    return QueryEngine(PARAMS, CFG, pool_dtype=pool_dtype, interpret=True,
                       **kw)


def _assert_same_answers(eng, fresh, k=6):
    v1, i1 = eng.query(QUERIES, k=k)
    v2, i2 = fresh.query(QUERIES, k=k)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=0)


class TestAdd:
    def test_unchunked_matches_fresh_build(self):
        a, b = _ids(40, seed=1), _ids(24, seed=2)
        eng = _engine().build_index(a)
        new_rows = eng.add_candidates(b)
        assert list(new_rows) == list(range(40, 64))
        assert eng.pool_size == 64 and eng.n_live == 64
        fresh = _engine().build_index(np.concatenate([a, b]))
        _assert_same_answers(eng, fresh)

    def test_unchunked_to_chunked_transition(self):
        a, b = _ids(100, seed=3), _ids(200, seed=4)
        eng = _engine(chunk_size=128).build_index(a)
        assert eng.chunks is None
        eng.add_candidates(b)
        assert eng.chunks is not None  # crossed into chunked storage
        fresh = _engine(chunk_size=128).build_index(np.concatenate([a, b]))
        _assert_same_answers(eng, fresh)

    def test_chunked_growth_matches_fresh_build(self):
        a, b = _ids(300, seed=5), _ids(150, seed=6)
        eng = _engine(chunk_size=128).build_index(a)
        n0 = eng.chunks[0].shape[0]
        eng.add_candidates(b)
        assert eng.chunks[0].shape[0] > n0
        fresh = _engine(chunk_size=128).build_index(np.concatenate([a, b]))
        _assert_same_answers(eng, fresh)

    def test_reserve_absorbs_adds_without_growth(self):
        a, b = _ids(200, seed=7), _ids(100, seed=8)
        eng = _engine(chunk_size=128).build_index(a, reserve=200)
        n0 = eng.chunks[0].shape[0]
        pad0 = eng._padded_size
        eng.add_candidates(b)
        assert eng.chunks[0].shape[0] == n0  # no new scan length
        assert eng._padded_size == pad0
        fresh = _engine(chunk_size=128).build_index(np.concatenate([a, b]))
        _assert_same_answers(eng, fresh)

    def test_int8_tokmaj_chunked_add(self):
        a, b = _ids(2048, seed=9), _ids(1024, seed=10)
        eng = _engine("int8", chunk_size=1024).build_index(a)
        eng.add_candidates(b)
        fresh = _engine("int8", chunk_size=1024).build_index(
            np.concatenate([a, b]))
        _assert_same_answers(eng, fresh)

    def test_add_drops_ivf(self):
        eng = _engine().build_index(_ids(96, seed=11))
        eng.build_ivf(n_clusters=4)
        eng.add_candidates(_ids(8, seed=12))
        assert eng.ivf is None

    def test_rerank_sees_added_rows(self):
        a, b = _ids(40, seed=13), _ids(24, seed=14)
        eng = _engine().build_index(a)
        eng.add_candidates(b)
        assert eng.cand_token_ids.shape[0] == 64
        _, state = mms_qa_init(jax.random.PRNGKey(0), CFG)
        vals, idx = eng.query_rerank(state, QUERIES, k=4, shortlist=16)
        assert np.asarray(idx).max() < 64

    def test_token_built_refuses(self):
        toks = rng.normal(size=(32, CFG.answer_len, CFG.embed_dim)) \
            .astype(np.float32)
        eng = _engine().build_index_from_tokens(toks)
        with pytest.raises(ValueError, match="ids-built"):
            eng.add_candidates(_ids(4))

    def test_mesh_refuses(self):
        from jax.sharding import Mesh
        mesh = Mesh(np.asarray(jax.devices()), ("c",))
        eng = _engine(mesh=mesh).build_index(_ids(64, seed=15))
        with pytest.raises(ValueError, match="single-device"):
            eng.add_candidates(_ids(4))

    def test_shape_mismatch_refuses(self):
        eng = _engine().build_index(_ids(32, seed=16))
        with pytest.raises(ValueError, match="token ids"):
            eng.add_candidates(rng.integers(0, 50, (4, CFG.answer_len + 1)))


class TestRemove:
    def _top_indices(self, eng, k=10):
        _, idx = eng.query(QUERIES, k=k)
        return set(np.asarray(idx).ravel().tolist())

    def test_removed_never_surfaces_float(self):
        eng = _engine().build_index(_ids(64, seed=20))
        v0, i0 = eng.query(QUERIES, k=8)
        dead = {int(np.asarray(i0)[0, 0]), int(np.asarray(i0)[0, 1])}
        eng.remove_candidates(sorted(dead))
        assert eng.n_live == 62
        assert not (self._top_indices(eng, k=8) & dead)

    def test_survivor_scores_untouched(self):
        eng = _engine().build_index(_ids(64, seed=21))
        v0, i0 = eng.query(QUERIES, k=64)
        dead = int(np.asarray(i0)[0, 0])
        eng.remove_candidates([dead])
        v1, i1 = eng.query(QUERIES, k=64)
        # survivors keep their exact scores, in the same relative order
        for q in range(QUERIES.shape[0]):
            keep0 = [(int(i), float(v)) for i, v in
                     zip(np.asarray(i0)[q], np.asarray(v0)[q])
                     if int(i) != dead]
            got = [(int(i), float(v)) for i, v in
                   zip(np.asarray(i1)[q], np.asarray(v1)[q])]
            assert got[:len(keep0)] == keep0

    def test_removed_never_surfaces_int8_chunked(self):
        eng = _engine("int8", chunk_size=1024).build_index(
            _ids(2048, seed=22))
        _, i0 = eng.query(QUERIES, k=6)
        dead = {int(x) for x in np.asarray(i0)[:, 0]}
        eng.remove_candidates(sorted(dead))
        assert not (self._top_indices(eng, k=6) & dead)

    def test_remove_survives_add_repack(self):
        # tombstone in the tail chunk, then add -> that chunk repacks
        # from ids and must re-mask the tombstone
        a = _ids(300, seed=23)
        eng = _engine(chunk_size=128).build_index(a)
        eng.remove_candidates([299])
        eng.add_candidates(_ids(50, seed=24))
        assert eng.pool_size == 350 and eng.n_live == 349
        assert 299 not in self._top_indices(eng, k=64)

    def test_meshed_remove(self):
        from jax.sharding import Mesh
        mesh = Mesh(np.asarray(jax.devices()), ("c",))
        ids = _ids(64, seed=25)
        eng_m = _engine(mesh=mesh).build_index(ids)
        eng_s = _engine().build_index(ids)
        _, i0 = eng_s.query(QUERIES, k=4)
        dead = sorted({int(x) for x in np.asarray(i0)[:, 0]})
        eng_m.remove_candidates(dead)
        eng_s.remove_candidates(dead)
        _assert_same_answers(eng_m, eng_s, k=6)

    def test_meshed_chunked_remove(self):
        from jax.sharding import Mesh
        mesh = Mesh(np.asarray(jax.devices()), ("c",))
        ids = _ids(2048, seed=26)  # 2048 > 8 shards * 128 -> chunked
        eng_m = _engine(mesh=mesh, chunk_size=128).build_index(ids)
        assert eng_m.chunks is not None
        eng_s = _engine(chunk_size=128).build_index(ids)
        dead = [0, 130, 1027, 2047]
        eng_m.remove_candidates(dead)
        eng_s.remove_candidates(dead)
        _assert_same_answers(eng_m, eng_s, k=6)
        assert not (set(dead) &
                    set(np.asarray(eng_m.query(QUERIES, k=10)[1])
                        .ravel().tolist()))

    def test_ivf_paths_exclude_removed(self):
        eng = _engine().build_index(_ids(96, seed=27))
        eng.build_ivf(n_clusters=6, coarse_tokens=3, seed=1)
        _, i0 = eng.query(QUERIES, k=4)
        dead = sorted({int(x) for x in np.asarray(i0)[:, 0]})
        eng.remove_candidates(dead)
        _, pi = eng.query_ivf(QUERIES, k=4, nprobe=6)
        assert not (set(np.asarray(pi).ravel().tolist()) & set(dead))
        _, ci = eng.ivf.query_coarse(QUERIES, k=4, shortlist=48)
        assert not (set(np.asarray(ci).ravel().tolist()) & set(dead))

    def test_out_of_range_refuses(self):
        eng = _engine().build_index(_ids(32, seed=28))
        with pytest.raises(ValueError, match="out of range"):
            eng.remove_candidates([32])

    def test_persistence_carries_tombstones(self, tmp_path):
        eng = _engine().build_index(_ids(64, seed=29))
        _, i0 = eng.query(QUERIES, k=4)
        dead = sorted({int(x) for x in np.asarray(i0)[:, 0]})
        eng.remove_candidates(dead)
        path = str(tmp_path / "inc.npz")
        eng.save_index(path)
        eng2 = _engine()
        eng2.load_index(path)
        assert eng2.n_live == eng.n_live
        assert list(eng2.deleted) == list(eng.deleted)
        _assert_same_answers(eng2, eng)
        # and adds after a load still re-mask the tombstones
        eng2.add_candidates(_ids(8, seed=30))
        assert not (set(np.asarray(eng2.query(QUERIES, k=10)[1])
                        .ravel().tolist()) & set(dead))


class TestCompact:
    def test_compact_reclaims_and_remaps(self):
        ids = _ids(64, seed=40)
        eng = _engine().build_index(ids)
        _, i0 = eng.query(QUERIES, k=64)
        dead = sorted({int(np.asarray(i0)[0, j]) for j in range(3)})
        eng.remove_candidates(dead)
        v_before, i_before = eng.query(QUERIES, k=8)
        mapping = eng.compact()
        assert eng.pool_size == 61 and eng.n_live == 61
        assert len(eng.deleted) == 0
        assert all(mapping[d] == -1 for d in dead)
        # survivors keep their scores under the new indices
        v_after, i_after = eng.query(QUERIES, k=8)
        np.testing.assert_allclose(np.asarray(v_after),
                                   np.asarray(v_before), rtol=0)
        np.testing.assert_array_equal(
            np.asarray(i_after),
            mapping[np.asarray(i_before)])

    def test_compact_equals_fresh_build(self):
        ids = _ids(300, seed=41)
        eng = _engine(chunk_size=128).build_index(ids)
        eng.remove_candidates([0, 150, 299])
        eng.compact()
        keep = np.setdiff1d(np.arange(300), [0, 150, 299])
        fresh = _engine(chunk_size=128).build_index(ids[keep])
        _assert_same_answers(eng, fresh)

    def test_compact_without_tombstones_is_identity(self):
        eng = _engine().build_index(_ids(32, seed=42))
        mapping = eng.compact()
        assert list(mapping) == list(range(32))

    def test_compact_all_dead_refuses(self):
        eng = _engine().build_index(_ids(8, seed=43))
        eng.remove_candidates(list(range(8)))
        with pytest.raises(ValueError, match="live"):
            eng.compact()

    def test_meshed_compact(self):
        from jax.sharding import Mesh
        mesh = Mesh(np.asarray(jax.devices()), ("c",))
        ids = _ids(64, seed=44)
        eng = _engine(mesh=mesh).build_index(ids)
        eng.remove_candidates([1, 2])
        eng.compact()
        fresh = _engine(mesh=mesh).build_index(
            np.delete(ids, [1, 2], axis=0))
        _assert_same_answers(eng, fresh)


class TestRandomizedModelBased:
    """Random interleavings of add/remove/compact checked against a
    plain host-side model of the pool (live id list): after every
    sequence, the engine's full ranking equals a fresh build over the
    live rows, with indices remapped through the model's bookkeeping."""

    @pytest.mark.parametrize("seed", [101, 202, 303])
    def test_random_ops_match_model(self, seed):
        r = np.random.default_rng(seed)
        ids = _ids(64, seed=seed)
        eng = _engine(chunk_size=128).build_index(ids)
        # host model: rows ever added (in engine order) + live flags
        all_ids = [row for row in ids]
        live = [True] * len(all_ids)

        for _ in range(8):
            op = r.choice(["add", "remove", "compact"])
            if op == "add":
                n = int(r.integers(1, 20))
                new = _ids(n, seed=int(r.integers(1 << 30)))
                eng.add_candidates(new)
                all_ids.extend(row for row in new)
                live.extend([True] * n)
            elif op == "remove":
                candidates = [i for i, ok in enumerate(live) if ok]
                if len(candidates) <= 4:
                    continue
                kill = r.choice(candidates,
                                size=int(r.integers(1, 4)), replace=False)
                eng.remove_candidates([int(x) for x in kill])
                for x in kill:
                    live[int(x)] = False
            else:
                if sum(live) == 0:
                    continue
                eng.compact()
                all_ids = [row for row, ok in zip(all_ids, live) if ok]
                live = [True] * len(all_ids)
            assert eng.pool_size == len(all_ids)
            assert eng.n_live == sum(live)

        # final equivalence: engine ranking == fresh build on live rows
        keep = [i for i, ok in enumerate(live) if ok]
        fresh = _engine(chunk_size=128).build_index(
            np.asarray([all_ids[i] for i in keep]))
        k = min(8, len(keep))
        v1, i1 = eng.query(QUERIES, k=k)
        v2, i2 = fresh.query(QUERIES, k=k)
        remap = {old: new for new, old in enumerate(keep)}
        got = np.vectorize(remap.get)(np.asarray(i1))
        np.testing.assert_array_equal(got, np.asarray(i2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=0)


class TestRerankTombstones:
    def test_rerank_never_resurrects_deleted(self):
        # shortlist > n_live used to tie into the -inf region and hand
        # tombstoned rows to the exact rescorer, which gave them real
        # probabilities again (regression)
        eng = _engine().build_index(_ids(24, seed=50))
        _, i0 = eng.query(QUERIES, k=4)
        dead = sorted({int(np.asarray(i0)[q, 0])
                       for q in range(QUERIES.shape[0])})
        eng.remove_candidates(dead)
        _, state = mms_qa_init(jax.random.PRNGKey(0), CFG)
        vals, idx = eng.query_rerank(state, QUERIES, k=6, shortlist=64)
        got = set(np.asarray(idx).ravel().tolist())
        assert not (got & set(dead))
        assert max(got) < 24  # never a pool-padding index either

    def test_rerank_all_dead_refuses(self):
        eng = _engine().build_index(_ids(8, seed=51))
        eng.remove_candidates(list(range(8)))
        _, state = mms_qa_init(jax.random.PRNGKey(0), CFG)
        with pytest.raises(ValueError, match="live"):
            eng.query_rerank(state, QUERIES, k=2, shortlist=4)
