"""Unexpectedness sample generation (P15 spec) + synthetic graph generator tests."""

import numpy as np

from serendipity_tpu.data.synthetic import synthetic_interactions
from serendipity_tpu.rec.unexpectedness import (
    cooccurrence_dense,
    sample_unexpectedness_pairs,
    unexpectedness_scores,
)


def test_cooccurrence_dense(tiny_inter):
    c = cooccurrence_dense(tiny_inter, user_block=16)
    assert c.shape == (tiny_inter.n_items, tiny_inter.n_items)
    # diagonal = item degree; symmetric
    np.testing.assert_allclose(
        np.diag(c), np.diff(tiny_inter.train_indptr_by_item), rtol=1e-6
    )
    np.testing.assert_allclose(c, c.T, rtol=1e-6)
    # spot check one pair by brute force
    users_a = set()
    users_b = set()
    for u in range(tiny_inter.n_users):
        its = set(tiny_inter.train_items_of(u).tolist())
        if 3 in its:
            users_a.add(u)
        if 7 in its:
            users_b.add(u)
    assert c[3, 7] == len(users_a & users_b)


def test_unexpectedness_scores_and_pairs(tiny_inter):
    rng = np.random.default_rng(0)
    cand = np.stack([
        rng.choice(tiny_inter.n_items, 20, replace=False)
        for _ in range(tiny_inter.n_users)
    ]).astype(np.int32)
    cooc = cooccurrence_dense(tiny_inter)
    unexp = unexpectedness_scores(tiny_inter, cand, cooc, user_block=16)
    assert unexp.shape == cand.shape
    assert np.isfinite(unexp).all() and (unexp >= 0).all()

    # frequently co-consumed items must be LESS unexpected: compare a candidate
    # with max cooc to one with zero cooc for the same user
    u = int(np.argmax(np.diff(tiny_inter.train_indptr)))
    hist = tiny_inter.train_items_of(u)
    cooc_to_hist = cooc[hist][:, cand[u]].mean(axis=0)
    hi, lo = np.argmax(cooc_to_hist), np.argmin(cooc_to_hist)
    if cooc_to_hist[hi] > cooc_to_hist[lo]:
        assert unexp[u, hi] < unexp[u, lo]

    pos, neg = sample_unexpectedness_pairs(cand, unexp, n_pos=5, seed=1)
    assert pos.shape == (tiny_inter.n_users, 5)
    # positives drawn from more-unexpected pool than negatives on average
    pos_scores = np.take_along_axis(
        unexp, np.searchsorted(cand[0], pos[0])[None, :].clip(0, 19), axis=1
    )
    assert np.isfinite(pos_scores).all()


def test_synthetic_interactions():
    inter = synthetic_interactions(500, 800, avg_degree=20, seed=3)
    assert inter.n_users == 500 and inter.n_items == 800
    deg = np.diff(inter.train_indptr)
    te = np.diff(inter.test_indptr)
    active = deg + te > 0
    assert (deg[active] >= 1).all()
    assert (te[deg + te >= 2] >= 1).all()
    # popularity skew: top 10% of items cover > 30% of interactions
    ic = np.sort(np.diff(inter.train_indptr_by_item))[::-1]
    assert ic[: len(ic) // 10].sum() > 0.3 * ic.sum()


def test_cooccurrence_topk_matches_dense(tiny_inter):
    """With T >= n_items the truncated lists are exact; the topk scorer must
    reproduce the dense scorer bit-for-bit in that regime."""
    from serendipity_tpu.rec.unexpectedness import (
        cooccurrence_dense, cooccurrence_topk, unexpectedness_scores,
    )
    import numpy as np

    dense = cooccurrence_dense(tiny_inter)
    idx, cnt = cooccurrence_topk(tiny_inter, top_t=tiny_inter.n_items,
                                 item_block=16, edge_chunk=32)
    # reconstruct dense from the lists
    rec = np.zeros_like(dense)
    rows = np.repeat(np.arange(tiny_inter.n_items), idx.shape[1])
    mask = idx.reshape(-1) < tiny_inter.n_items
    rec[rows[mask], idx.reshape(-1)[mask]] = cnt.reshape(-1)[mask]
    np.testing.assert_allclose(rec, dense, atol=1e-6)

    rng = np.random.default_rng(0)
    cand = rng.integers(0, tiny_inter.n_items, (tiny_inter.n_users, 12)).astype(np.int32)
    s_dense = unexpectedness_scores(tiny_inter, cand, dense)
    s_topk = unexpectedness_scores(tiny_inter, cand, (idx, cnt))
    np.testing.assert_allclose(s_topk, s_dense, rtol=1e-5, atol=1e-6)


def test_cooccurrence_topk_truncated_monotone(tiny_inter):
    """Small T keeps the largest counts: reconstructed entries are a subset of
    the dense matrix with per-row maxima preserved."""
    from serendipity_tpu.rec.unexpectedness import cooccurrence_dense, cooccurrence_topk
    import numpy as np

    dense = cooccurrence_dense(tiny_inter)
    t = 4
    idx, cnt = cooccurrence_topk(tiny_inter, top_t=t, item_block=16, edge_chunk=32)
    for i in range(tiny_inter.n_items):
        kept = cnt[i][idx[i] < tiny_inter.n_items]
        expect = np.sort(dense[i])[-t:]
        np.testing.assert_allclose(np.sort(kept), expect[expect > 0][-len(kept):] if len(kept) else [], atol=1e-6)
