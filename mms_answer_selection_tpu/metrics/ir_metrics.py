"""IR metric suite: MAP / MRR / AUC / RankAccuracy.

The reference computes these inside TEST-phase graphs as CPU-only layers
(src/caffe/layers/{map,mrr,auc,rank_accuracy}_layer.cpp) and reads them back
as blobs for early stopping.  Here each metric exists twice with *identical
numerics including tie handling*:

* a numpy host function (ground truth / offline eval), and
* a ``*_jax`` on-device function (pure jnp, jit-able, O(N^2) pairwise-rank
  formulation -- no host round-trips, no data-dependent shapes, so it runs
  inside a compiled eval step on a sharded mesh; N is the eval-split size,
  1.5k for TREC-QA, so the N^2 mask is trivia for the VPU).

Shared semantics (cited):
* grouping by integer qid; a group counts toward the mean only if it has at
  least one positive AND at least one negative ("effective samples",
  mrr_layer.cpp:60-76, map_layer.cpp:79-97)
* descending sort with strict-greater comparison; equal scores keep
  insertion order (mycompare, map_layer.cpp:34-38) -- reproduced exactly by
  ranking on (score desc, index asc)
* MRR: mean over effective groups of 1/(rank of first positive)
  (mrr_layer.cpp:56-78)
* MAP: AP = sum over positives of (hits-so-far / position) / n_pos
  (map_layer.cpp:74-99)
* AUC: global (ungrouped) rank-sum counting -- walk the sorted list, add the
  number of positives seen above each negative, normalize by P*N
  (auc_layer.cpp:119-134); 0 if there are no positives.  ``ignore_label``
  drops samples before sorting (auc_layer.cpp:64-79).
* RankAccuracy: fraction of pairs with label*(a-b) > 0
  (rank_accuracy_layer.cpp:36-50).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# host (numpy) versions
# ---------------------------------------------------------------------------


def _group_order(scores):
    """Indices sorting scores descending, ties by insertion order."""
    return np.lexsort((np.arange(len(scores)), -np.asarray(scores, np.float64)))


def mean_reciprocal_rank(scores, labels, groups) -> float:
    scores = np.asarray(scores, np.float64)
    labels = np.asarray(labels).astype(np.int64)
    groups = np.asarray(groups).astype(np.int64)
    total, effective = 0.0, 0
    for g in np.unique(groups):
        sel = groups == g
        ls = labels[sel][_group_order(scores[sel])]
        if ls.max(initial=0) == 0 or ls.min(initial=1) == 1:
            continue  # needs at least one positive and one negative
        effective += 1
        total += 1.0 / (int(np.argmax(ls == 1)) + 1)
    return total / effective if effective else 0.0


def mean_average_precision(scores, labels, groups) -> float:
    scores = np.asarray(scores, np.float64)
    labels = np.asarray(labels).astype(np.int64)
    groups = np.asarray(groups).astype(np.int64)
    total, effective = 0.0, 0
    for g in np.unique(groups):
        sel = groups == g
        ls = labels[sel][_group_order(scores[sel])]
        n_pos = int(ls.sum())
        if n_pos == 0 or n_pos == ls.size:
            continue
        hits = np.cumsum(ls)
        ap = float(np.sum(hits[ls == 1] / (np.nonzero(ls == 1)[0] + 1.0))) / n_pos
        effective += 1
        total += ap
    return total / effective if effective else 0.0


def auc(scores, labels, *, ignore_label: int | None = None) -> float:
    scores = np.asarray(scores, np.float64)
    labels = np.asarray(labels).astype(np.int64)
    if ignore_label is not None:
        keep = labels != ignore_label
        scores, labels = scores[keep], labels[keep]
    order = _group_order(scores)
    ls = labels[order]
    high = np.cumsum(ls)
    value = float(np.sum(high * (1 - ls)))
    p = int(ls.sum())
    n = ls.size - p
    if p == 0 or n == 0:  # degenerate split: match the jax twin's 0.0
        return 0.0
    return value / p / n


def rank_accuracy(a, b, labels) -> float:
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    labels = np.asarray(labels, np.float64).ravel()
    return float(np.mean((labels * (a - b)) > 0))


# ---------------------------------------------------------------------------
# on-device (jax) versions
# ---------------------------------------------------------------------------
#
# Rank of sample i inside its group = number of same-group samples strictly
# ahead of it in the (score desc, index asc) order.  All metrics follow from
# pairwise masks; shapes are static so the whole eval step jits.


def _pairwise_ahead(scores):
    """(N, N) bool: [j, i] True if j sorts strictly ahead of i."""
    s = scores.astype(jnp.float32)
    idx = jnp.arange(s.shape[0])
    gt = s[:, None] > s[None, :]
    tie_first = (s[:, None] == s[None, :]) & (idx[:, None] < idx[None, :])
    return gt | tie_first


def _group_masks(labels, groups):
    same = groups[:, None] == groups[None, :]
    pos = labels.astype(jnp.int32) == 1
    # effective group: has >=1 positive and >=1 negative among its members
    has_pos = jnp.any(same & pos[None, :], axis=1)
    has_neg = jnp.any(same & ~pos[None, :], axis=1)
    return same, pos, has_pos & has_neg


def mean_reciprocal_rank_jax(scores, labels, groups):
    """jit-able MRR over (N,) scores/labels/int groups."""
    ahead = _pairwise_ahead(scores)
    same, pos, effective = _group_masks(labels, groups)
    n = scores.shape[0]
    rank = jnp.sum(ahead & same, axis=0)  # 0-based rank within group
    # first positive of a group = the positive whose rank is minimal
    pos_rank = jnp.where(pos, rank, n + 1)
    # segment-min via pairwise: i is the group's first positive iff no other
    # positive in the group has a smaller (rank, index)
    better = same & pos[None, :] & (pos_rank[None, :] < pos_rank[:, None])
    is_first_pos = pos & ~jnp.any(better, axis=1) & effective
    # one representative per group: the first positive itself
    contrib = jnp.where(is_first_pos, 1.0 / (rank + 1.0), 0.0)
    n_eff = _count_effective_groups(same, effective)
    return jnp.sum(contrib) / jnp.maximum(n_eff, 1.0)


def mean_average_precision_jax(scores, labels, groups):
    """jit-able MAP over (N,) scores/labels/int groups."""
    ahead = _pairwise_ahead(scores)
    same, pos, effective = _group_masks(labels, groups)
    rank = jnp.sum(ahead & same, axis=0)
    # hits at position of i = positives in the group ranked <= rank_i
    at_or_ahead = (ahead | jnp.eye(scores.shape[0], dtype=bool)) & same
    hits = jnp.sum(at_or_ahead & pos[:, None], axis=0)
    prec = jnp.where(pos, hits / (rank + 1.0), 0.0)
    n_pos = jnp.sum(same & pos[None, :], axis=1)
    ap_contrib = jnp.where(effective & pos, prec / jnp.maximum(n_pos, 1), 0.0)
    n_eff = _count_effective_groups(same, effective)
    return jnp.sum(ap_contrib) / jnp.maximum(n_eff, 1.0)


def _count_effective_groups(same, effective):
    # each sample contributes 1/|group| so every effective group counts once
    group_size = jnp.sum(same, axis=1)
    return jnp.sum(jnp.where(effective, 1.0 / group_size, 0.0))


def auc_jax(scores, labels, *, valid=None):
    """jit-able global AUC.  ``valid``: optional bool mask (the static-shape
    replacement for ignore_label filtering)."""
    pos = labels.astype(jnp.int32) == 1
    if valid is None:
        valid = jnp.ones_like(pos)
    pos = pos & valid
    neg = ~ (labels.astype(jnp.int32) == 1) & valid
    ahead = _pairwise_ahead(scores)
    # pair (i pos, j neg) counts when i sorts ahead of j
    wins = jnp.sum(ahead & pos[:, None] & neg[None, :])
    p = jnp.sum(pos)
    n = jnp.sum(neg)
    return jnp.where(p > 0, wins / jnp.maximum(p * n, 1), 0.0)


def rank_accuracy_jax(a, b, labels):
    # ravel like the numpy twin: caffe-style (N, 1) score blobs must not
    # broadcast against (N,) labels into an (N, N) pair matrix
    a, b = jnp.ravel(a), jnp.ravel(b)
    labels = jnp.ravel(labels)
    return jnp.mean(((labels * (a - b)) > 0).astype(jnp.float32))


# ---------------------------------------------------------------------------
# O(N log N) on-device versions (sort + segment ops)
# ---------------------------------------------------------------------------
#
# The pairwise forms above are exact and trivially correct but O(N^2); these
# sorted forms scale to 100k+ eval splits.  Tie semantics are preserved
# exactly: jnp.argsort(..., stable=True) on -scores reproduces the
# (score desc, insertion order) rule.  Group segmentation is built from a
# second stable sort into group-major order, so every quantity is a
# fixed-shape segment reduction (num_segments = N covers any group count).


def _group_major(scores, labels, groups):
    order = jnp.argsort(-scores.astype(jnp.float32), stable=True)
    g1, l1 = groups[order], labels.astype(jnp.int32)[order]
    order2 = jnp.argsort(g1, stable=True)  # stable: keeps score order
    g2, l2 = g1[order2], l1[order2]
    n = scores.shape[0]
    idx = jnp.arange(n)
    boundary = jnp.concatenate([jnp.ones((1,), jnp.int32),
                                (g2[1:] != g2[:-1]).astype(jnp.int32)])
    seg = jnp.cumsum(boundary) - 1              # dense segment ids
    start = jax.lax.cummax(jnp.where(boundary == 1, idx, 0))
    pos_in_group = idx - start                  # 0-based rank within group
    return seg, l2, pos_in_group, n


def mean_average_precision_jax_sorted(scores, labels, groups):
    """O(N log N) MAP; numerically identical to the pairwise form."""
    seg, l2, pos, n = _group_major(scores, labels, groups)
    csum = jnp.cumsum(l2)
    # hits-so-far inclusive = csum - csum[segment start] + l2[segment start]
    start_csum = jax.ops.segment_max(
        jnp.where(pos == 0, csum - l2, 0), seg, num_segments=n)[seg]
    hits = csum - start_csum
    prec = jnp.where(l2 == 1, hits / (pos + 1.0), 0.0)
    ap_num = jax.ops.segment_sum(prec, seg, num_segments=n)
    n_pos = jax.ops.segment_sum(l2.astype(jnp.float32), seg, num_segments=n)
    n_tot = jax.ops.segment_sum(jnp.ones((n,), jnp.float32), seg,
                                num_segments=n)
    effective = (n_pos > 0) & (n_pos < n_tot)
    ap = jnp.where(effective, ap_num / jnp.maximum(n_pos, 1.0), 0.0)
    n_eff = jnp.sum(effective.astype(jnp.float32))
    return jnp.sum(ap) / jnp.maximum(n_eff, 1.0)


def mean_reciprocal_rank_jax_sorted(scores, labels, groups):
    """O(N log N) MRR; numerically identical to the pairwise form."""
    seg, l2, pos, n = _group_major(scores, labels, groups)
    big = n + 1
    first_pos = jax.ops.segment_min(
        jnp.where(l2 == 1, pos, big), seg, num_segments=n)
    n_pos = jax.ops.segment_sum(l2.astype(jnp.float32), seg, num_segments=n)
    n_tot = jax.ops.segment_sum(jnp.ones((n,), jnp.float32), seg,
                                num_segments=n)
    effective = (n_pos > 0) & (n_pos < n_tot)
    rr = jnp.where(effective, 1.0 / (first_pos + 1.0), 0.0)
    return jnp.sum(rr) / jnp.maximum(
        jnp.sum(effective.astype(jnp.float32)), 1.0)


def auc_jax_sorted(scores, labels):
    """O(N log N) global AUC (the reference's rank-sum walk on the sorted
    list, vectorized)."""
    order = jnp.argsort(-scores.astype(jnp.float32), stable=True)
    ls = labels.astype(jnp.int32)[order]
    high = jnp.cumsum(ls)
    # the pair count p*n (and the rank-sum) overflow int32 around 100k
    # balanced samples — exactly this function's regime — and jax won't
    # promote to int64 without x64; accumulate the SUM in f32 (counts
    # stay exact up to 2^24, the sum's ~1e-7 relative rounding is far
    # below metric noise)
    value = jnp.sum(high.astype(jnp.float32) * (1 - ls).astype(jnp.float32))
    p = jnp.sum(ls).astype(jnp.float32)
    n = ls.shape[0] - p
    return jnp.where(p > 0, value / jnp.maximum(p * n, 1.0), 0.0)
