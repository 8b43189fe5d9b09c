"""Training/eval data assembly for the SerenEnhance transformer re-ranker.

Capability of the reference `DataBuilder` (`SerenEnhance/code/SerenEnhance.py:16-118`),
which streams per-user CSVs of pre-encoded item embeddings into
(history [B, 20, D], candidates [B, 100, D]) batches.  Here the same tensors come
straight from an `Interactions` + item-embedding table:

  * history  = the user's LAST `n_reviews` train items (temporal order when
    timestamps exist, CSR order otherwise), zero-padded at the front;
  * serendipity candidates = n_pos positively-labeled test items (resampled to
    n_pos) followed by n_pos random non-interacted negatives;
  * relevance candidates   = n_pos held-out train items + random negatives;
  * unexpectedness candidates = the top/bottom-unexpectedness pairs from
    `rec/unexpectedness.py` (P15);
  * test batches follow the reference protocol (`SerenEnhance.py:303-320`):
    1 true item at index 0 + n_cand-1 negatives.

All assembly is vectorized over the CSR (round 4): histories via a right-aligned
position gather, negatives via batched rejection rounds with sorted-key membership
search, positive resampling via degree-bucketed Gumbel selection — linear in nnz,
where the round-3 per-user Python loops melted above ~50k users.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from serendipity_tpu.data.datasets import Interactions


def user_histories(
    inter: Interactions, emb_item: np.ndarray, n_reviews: int = 20
) -> np.ndarray:
    """[U, n_reviews, D] last-n train-item embeddings, front-padded with zeros."""
    u_count = inter.n_users
    idx = np.asarray(inter.train_indices, np.int64)
    ptr = np.asarray(inter.train_indptr, np.int64)
    deg = np.diff(ptr)
    if len(idx) == 0:
        return np.zeros((u_count, n_reviews, emb_item.shape[1]), np.float32)
    if inter.train_timestamps is not None:
        # per-row temporal order via one stable global lexsort keyed (row, ts):
        # rows stay contiguous, items within a row sort by timestamp
        rows = np.repeat(np.arange(u_count, dtype=np.int64), deg)
        order = np.lexsort((np.asarray(inter.train_timestamps), rows))
        idx = idx[order]
    # right-aligned tail positions: slot j holds item at ptr[u+1] - (R - j)
    r = n_reviews
    pos = ptr[1:, None] - (r - np.arange(r, dtype=np.int64))[None, :]
    valid = pos >= ptr[:-1, None]
    ids = idx[np.clip(pos, 0, max(len(idx) - 1, 0))]
    out = emb_item[ids].astype(np.float32)                   # [U, R, D]
    out[~valid] = 0.0
    return out


def _interaction_keys(inter: Interactions) -> np.ndarray:
    """Sorted int64 keys u * n_items + i over ALL of a user's interactions
    (train + test) — the membership structure for negative rejection."""
    tr_deg = np.diff(inter.train_indptr)
    te_deg = np.diff(inter.test_indptr)
    rows_tr = np.repeat(np.arange(inter.n_users, dtype=np.int64), tr_deg)
    rows_te = np.repeat(np.arange(inter.n_users, dtype=np.int64), te_deg)
    keys = np.concatenate(
        [
            rows_tr * inter.n_items + np.asarray(inter.train_indices, np.int64),
            rows_te * inter.n_items + np.asarray(inter.test_indices, np.int64),
        ]
    )
    keys.sort()
    return keys


def sample_negatives_all(
    inter: Interactions,
    n: int,
    rng: np.random.Generator,
    users: Optional[np.ndarray] = None,
    keys: Optional[np.ndarray] = None,
) -> np.ndarray:
    """[len(users), n] uniform non-interacted item ids per user — the exact
    rejection distribution of the reference sampler, in batched vectorized
    rounds (draw for every unfilled slot, reject members via binary search)."""
    if users is None:
        users = np.arange(inter.n_users)
    users = np.asarray(users, np.int64)
    if keys is None:
        keys = _interaction_keys(inter)
    out = np.full((len(users), n), -1, np.int64)
    row_user = np.broadcast_to(users[:, None], out.shape)
    while True:
        need = out < 0
        cnt = int(need.sum())
        if cnt == 0:
            return out
        draws = rng.integers(0, inter.n_items, cnt)
        q = row_user[need] * inter.n_items + draws
        pos = np.searchsorted(keys, q)
        hit = np.zeros(cnt, bool)
        inb = pos < len(keys)
        hit[inb] = keys[pos[inb]] == q[inb]
        fill = np.where(hit, -1, draws)
        out[need] = fill


def _resample_rows(
    indices: np.ndarray,    # flat CSR column ids
    lo: np.ndarray,         # [U] row starts
    deg: np.ndarray,        # [U] row degrees
    n: int,
    rng: np.random.Generator,
) -> np.ndarray:
    """[U, n] row samples: without replacement when deg >= n (degree-bucketed
    Gumbel top-n — total key work is linear in nnz), with replacement when
    0 < deg < n, zeros when the row is empty (reference `resample` contract)."""
    u_count = len(deg)
    out = np.zeros((u_count, n), np.int64)
    small = (deg > 0) & (deg < n)
    if small.any():
        d = deg[small][:, None]
        off = (rng.random((int(small.sum()), n)) * d).astype(np.int64)
        out[small] = indices[lo[small][:, None] + off]
    big = deg >= n
    if big.any():
        dmax = int(deg[big].max())
        w, prev = max(n, 64), 0
        while True:
            sel = big & (deg <= w) & (deg > prev)
            if sel.any():
                keys = rng.random((int(sel.sum()), w))
                keys[np.arange(w)[None, :] >= deg[sel][:, None]] = np.inf
                top = np.argpartition(keys, n - 1, axis=1)[:, :n]
                out[sel] = indices[lo[sel][:, None] + top]
            if w >= dmax:
                break
            prev, w = w, w * 2
    return out


def build_seren_training_batches(
    inter: Interactions,
    emb_item: np.ndarray,
    n_reviews: int = 20,
    n_pos: int = 50,
    unexp_pairs: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    """Per-user tensors: history [U, R, D]; y_seren / y_rel / y_unp [U, 2*n_pos, D]
    with positives in the first half (`SerenEnhance.py:322-334` label layout)."""
    rng = np.random.default_rng(seed)
    hist = user_histories(inter, emb_item, n_reviews)
    u_count = inter.n_users

    te_ptr = np.asarray(inter.test_indptr, np.int64)
    te_idx = np.asarray(inter.test_indices, np.int64)
    te_deg = np.diff(te_ptr)
    labels = (
        np.asarray(inter.test_ser_labels)
        if inter.test_ser_labels is not None
        else np.ones(inter.n_test)
    )
    # serendipity positives: the ser-labeled test items, falling back to the whole
    # test row when a user has none.  Compact the labeled items into their own CSR
    # so the row sampler sees only them.
    is_ser = labels[: len(te_idx)] > 0.99
    rows_te = np.repeat(np.arange(u_count, dtype=np.int64), te_deg)
    ser_idx = te_idx[is_ser]
    ser_deg = np.bincount(rows_te[is_ser], minlength=u_count).astype(np.int64)
    ser_lo = np.concatenate([[0], np.cumsum(ser_deg)[:-1]])
    use_all = ser_deg == 0
    # mixed source: labeled rows sample from ser CSR, unlabeled from the test CSR
    samp_ser = _resample_rows(ser_idx, ser_lo, ser_deg, n_pos, rng)
    samp_all = _resample_rows(te_idx, te_ptr[:-1], te_deg, n_pos, rng)
    ser_samples = np.where(use_all[:, None], samp_all, samp_ser)

    tr_ptr = np.asarray(inter.train_indptr, np.int64)
    tr_deg = np.diff(tr_ptr)
    rel_samples = _resample_rows(
        np.asarray(inter.train_indices, np.int64), tr_ptr[:-1], tr_deg, n_pos, rng
    )
    negs = sample_negatives_all(inter, n_pos, rng)

    d = emb_item.shape[1]
    y_seren = np.empty((u_count, 2 * n_pos, d), np.float32)
    y_rel = np.empty((u_count, 2 * n_pos, d), np.float32)
    y_seren[:, :n_pos] = emb_item[ser_samples]
    y_seren[:, n_pos:] = emb_item[negs]
    y_rel[:, :n_pos] = emb_item[rel_samples]
    y_rel[:, n_pos:] = emb_item[negs]

    if unexp_pairs is not None:
        up, un = unexp_pairs
        y_unp = np.concatenate([emb_item[up], emb_item[un]], axis=1).astype(np.float32)
    else:
        y_unp = y_rel.copy()
    return {
        "history": hist,
        "y_seren": y_seren,
        "y_rel": y_rel,
        "y_unp": y_unp,
    }


def build_seren_test_batch(
    inter: Interactions,
    emb_item: np.ndarray,
    n_reviews: int = 20,
    n_cand: int = 100,
    seed: int = 1,
) -> Dict[str, np.ndarray]:
    """Eval protocol: truth at candidate index 0 + (n_cand-1) negatives per user
    (only users with >=1 test item)."""
    rng = np.random.default_rng(seed)
    te_ptr = np.asarray(inter.test_indptr, np.int64)
    users = np.nonzero(np.diff(te_ptr) > 0)[0]
    hist = user_histories(inter, emb_item, n_reviews)[users]
    truth = np.asarray(inter.test_indices, np.int64)[te_ptr[users + 1] - 1]
    negs = sample_negatives_all(inter, n_cand - 1, rng, users=users)
    d = emb_item.shape[1]
    y = np.empty((len(users), n_cand, d), np.float32)
    y[:, 0] = emb_item[truth]
    y[:, 1:] = emb_item[negs]
    return {"history": hist, "y_cand": y, "users": users}
