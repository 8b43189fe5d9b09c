"""Unit tests for the core device ops against plain-numpy references."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from serendipity_tpu.graph import build_normalized_adjacency
from serendipity_tpu.ops import (
    contains_in_rows,
    lightgcn_propagate,
    ranking_metrics_cumulative,
    sample_bpr_batch,
    searchsorted_in_rows,
    spmm_edges,
)
from serendipity_tpu.ops.metrics import hit_matrix


def test_searchsorted_in_rows():
    rng = np.random.default_rng(1)
    rows = [np.sort(rng.choice(100, size=rng.integers(0, 20), replace=False)) for _ in range(30)]
    flat = np.concatenate([r for r in rows]) if rows else np.array([])
    ptr = np.cumsum([0] + [len(r) for r in rows])
    q_rows = rng.integers(0, 30, 200)
    queries = rng.integers(0, 100, 200)
    lo, hi = ptr[q_rows], ptr[q_rows + 1]
    got = searchsorted_in_rows(jnp.asarray(flat), jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(queries))
    for g, r, q, l in zip(np.asarray(got), q_rows, queries, lo):
        assert g - l == np.searchsorted(rows[r], q, side="left")
    member = contains_in_rows(jnp.asarray(flat), jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(queries))
    for m, r, q in zip(np.asarray(member), q_rows, queries):
        assert bool(m) == (q in rows[r])


def test_spmm_vs_scipy(tiny_inter):
    sp = pytest.importorskip("scipy.sparse")
    adj = build_normalized_adjacency(tiny_inter, pad_multiple=128)
    e = adj.n_edges
    rng = np.random.default_rng(2)
    x = rng.standard_normal((tiny_inter.n_items, 16)).astype(np.float32)
    got = spmm_edges(
        jnp.asarray(adj.u_dst), jnp.asarray(adj.u_src), jnp.asarray(adj.u_w),
        jnp.asarray(x), tiny_inter.n_users,
    )
    ref = sp.coo_matrix(
        (adj.u_w[:e], (adj.u_dst[:e], adj.u_src[:e])),
        shape=(tiny_inter.n_users, tiny_inter.n_items),
    ) @ x
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)


def test_lightgcn_propagate_vs_dense(tiny_inter):
    """K-layer propagation + mean pool == dense block-matrix computation
    (semantics of `model.computer()`, model.py:145-177)."""
    adj = build_normalized_adjacency(tiny_inter)
    e = adj.n_edges
    n_u, n_i = tiny_inter.n_users, tiny_inter.n_items
    a = np.zeros((n_u + n_i, n_u + n_i), dtype=np.float64)
    a[adj.u_dst[:e], adj.u_src[:e] + n_u] = adj.u_w[:e]
    a[adj.i_dst[:e] + n_u, adj.i_src[:e]] = adj.i_w[:e]

    rng = np.random.default_rng(3)
    ue = rng.standard_normal((n_u, 8)).astype(np.float32)
    ie = rng.standard_normal((n_i, 8)).astype(np.float32)
    for n_layers in (1, 3):
        u_out, i_out = lightgcn_propagate(
            jnp.asarray(ue), jnp.asarray(ie),
            jnp.asarray(adj.u_dst), jnp.asarray(adj.u_src), jnp.asarray(adj.u_w),
            jnp.asarray(adj.i_dst), jnp.asarray(adj.i_src), jnp.asarray(adj.i_w),
            n_layers,
        )
        x = np.concatenate([ue, ie]).astype(np.float64)
        acc = x.copy()
        cur = x
        for _ in range(n_layers):
            cur = a @ cur
            acc += cur
        acc /= n_layers + 1
        np.testing.assert_allclose(np.asarray(u_out), acc[:n_u], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(i_out), acc[n_u:], rtol=1e-4, atol=1e-5)


def test_sample_bpr_batch(tiny_inter):
    key = jax.random.PRNGKey(0)
    ptr = jnp.asarray(tiny_inter.train_indptr, dtype=jnp.int32)
    idx = jnp.asarray(tiny_inter.train_indices, dtype=jnp.int32)
    deg = np.diff(tiny_inter.train_indptr)
    valid = jnp.asarray(np.nonzero(deg > 0)[0].astype(np.int32))
    users, pos, neg = sample_bpr_batch(
        key, valid, ptr, idx, tiny_inter.n_items, batch_size=512
    )
    users, pos, neg = map(np.asarray, (users, pos, neg))
    for u, p, n in zip(users, pos, neg):
        its = set(tiny_inter.train_items_of(u).tolist())
        assert p in its
        assert n not in its
        assert 0 <= n < tiny_inter.n_items
    # distribution sanity: all valid users reachable
    assert len(np.unique(users)) > len(np.asarray(valid)) // 2


def _naive_foldout_metrics(ranked, truth):
    """Direct transliteration of the formulas in evaluate_foldout.h:16-112."""
    k = len(ranked)
    tset = set(truth)
    hits = [1.0 if r in tset else 0.0 for r in ranked]
    out = {"precision": [], "recall": [], "ap": [], "ndcg": [], "mrr": []}
    ch, sum_pre, dcg, idcg, rr = 0, 0.0, 0.0, 0.0, 0.0
    found = False
    for i in range(k):
        if hits[i]:
            ch += 1
            sum_pre += ch / (i + 1)
            dcg += 1.0 / np.log2(i + 2)
            if not found:
                rr = 1.0 / (i + 1)
                found = True
        if i < len(truth):
            idcg += 1.0 / np.log2(i + 2)
        out["precision"].append(ch / (i + 1))
        out["recall"].append(ch / len(truth))
        out["ap"].append(sum_pre / len(truth))
        out["ndcg"].append(dcg / idcg if idcg > 0 else 0.0)
        out["mrr"].append(rr if found else 0.0)
    return {m: np.array(v) for m, v in out.items()}


def test_ranking_metrics_vs_naive():
    rng = np.random.default_rng(4)
    b, k, n = 16, 20, 200
    ranked = np.stack([rng.choice(n, k, replace=False) for _ in range(b)])
    truths = [rng.choice(n, rng.integers(1, 30), replace=False) for _ in range(b)]
    flat = np.concatenate([np.sort(t) for t in truths])
    ptr = np.cumsum([0] + [len(t) for t in truths])
    lo, hi = jnp.asarray(ptr[:-1]), jnp.asarray(ptr[1:])
    hits = hit_matrix(jnp.asarray(ranked), lo, hi, jnp.asarray(flat))
    got = ranking_metrics_cumulative(hits, jnp.asarray([len(t) for t in truths]))
    for bi in range(b):
        ref = _naive_foldout_metrics(list(ranked[bi]), list(truths[bi]))
        for m in ref:
            np.testing.assert_allclose(
                np.asarray(got[m])[bi], ref[m], rtol=1e-5, atol=1e-6, err_msg=m
            )


def test_topk_exact_2stage():
    from serendipity_tpu.ops.topk import topk_exact_2stage

    rng = np.random.default_rng(9)
    for b, n, k in ((4, 1000, 20), (2, 257, 10), (3, 100, 5)):
        s = rng.standard_normal((b, n)).astype(np.float32)
        v, i = topk_exact_2stage(jnp.asarray(s), k)
        ref_i = np.argsort(-s, axis=1)[:, :k]
        np.testing.assert_allclose(
            np.asarray(v), np.take_along_axis(s, ref_i, 1), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.take_along_axis(s, np.asarray(i), 1),
            np.take_along_axis(s, ref_i, 1), rtol=1e-6,
        )


def test_auc_rows_vs_sklearn():
    """auc_rows must match sklearn roc_auc_score per user, incl. tie handling and
    train-item exclusion (`code/utils.py:265-274` semantics)."""
    from sklearn.metrics import roc_auc_score

    from serendipity_tpu.ops.metrics import auc_rows

    rng = np.random.default_rng(3)
    b, n = 12, 200
    scores = np.round(rng.normal(size=(b, n)), 1)  # coarse grid → many ties
    valid = rng.random((b, n)) > 0.2
    pos = (rng.random((b, n)) > 0.9) & valid
    # guarantee >=1 pos and >=1 neg per row
    for r in range(b):
        vi = np.nonzero(valid[r])[0]
        pos[r, vi[0]] = True
        pos[r, vi[1]] = False

    got = np.asarray(auc_rows(jnp.asarray(scores), jnp.asarray(pos), jnp.asarray(valid)))
    for r in range(b):
        want = roc_auc_score(pos[r, valid[r]], scores[r, valid[r]])
        assert got[r] == pytest.approx(want, abs=1e-6), r


def test_auc_rows_degenerate_rows():
    from serendipity_tpu.ops.metrics import auc_rows

    s = jnp.asarray([[1.0, 2.0, 3.0], [1.0, 2.0, 3.0], [1.0, 2.0, 3.0]])
    pos = jnp.asarray([[1, 1, 1], [0, 0, 0], [0, 0, 1]], bool)
    valid = jnp.ones((3, 3), bool)
    out = np.asarray(auc_rows(s, pos, valid))
    assert out[0] == 0.0 and out[1] == 0.0  # no-neg / no-pos rows
    assert out[2] == 1.0  # single top-ranked positive


def test_bitmap_sampler_matches_bisection():
    """The bitmap membership test must reproduce the bisection sampler's output
    BIT-FOR-BIT for the same PRNG key (same draws -> same accept/reject)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from serendipity_tpu.data.synthetic import synthetic_interactions
    from serendipity_tpu.ops.pallas_score import pack_mask_bitmap
    from serendipity_tpu.ops.sampling import sample_bpr_batch

    inter = synthetic_interactions(500, 2000, avg_degree=30, seed=5)
    n_pad = -(-inter.n_items // 1024) * 1024
    bitmap = jnp.asarray(pack_mask_bitmap(
        inter.train_indptr, inter.train_indices, inter.n_users, n_pad))
    valid = jnp.asarray(
        np.nonzero(np.diff(inter.train_indptr) > 0)[0].astype(np.int32))
    indptr = jnp.asarray(inter.train_indptr.astype(np.int32))
    indices = jnp.asarray(inter.train_indices.astype(np.int32))
    for seed in (0, 7):
        key = jax.random.PRNGKey(seed)
        a = sample_bpr_batch(key, valid, indptr, indices, inter.n_items, 512)
        b = sample_bpr_batch(key, valid, indptr, indices, inter.n_items, 512,
                             bitmap=bitmap)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        # sanity: negatives are never positives of their user
        users, pos, neg = map(np.asarray, b)
        for u, n_ in zip(users[:100], neg[:100]):
            row = inter.train_indices[
                inter.train_indptr[u]:inter.train_indptr[u + 1]]
            assert n_ not in row or len(row) > 0.9 * inter.n_items
