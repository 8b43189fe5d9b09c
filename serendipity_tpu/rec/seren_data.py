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
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from serendipity_tpu.data.datasets import Interactions


def user_histories(
    inter: Interactions, emb_item: np.ndarray, n_reviews: int = 20
) -> np.ndarray:
    """[U, n_reviews, D] last-n train-item embeddings, front-padded with zeros."""
    d = emb_item.shape[1]
    out = np.zeros((inter.n_users, n_reviews, d), np.float32)
    for u in range(inter.n_users):
        items = inter.train_items_of(u)
        if inter.train_timestamps is not None:
            ts = inter.train_timestamps[
                inter.train_indptr[u]:inter.train_indptr[u + 1]
            ]
            items = items[np.argsort(ts, kind="stable")]
        tail = items[-n_reviews:]
        if len(tail):
            out[u, n_reviews - len(tail):] = emb_item[tail]
    return out


def _sample_negatives(
    inter: Interactions, u: int, n: int, rng: np.random.Generator
) -> np.ndarray:
    pos = set(inter.train_items_of(u).tolist()) | set(inter.test_items_of(u).tolist())
    out = np.empty(n, np.int64)
    i = 0
    while i < n:
        c = int(rng.integers(0, inter.n_items))
        if c not in pos:
            out[i] = c
            i += 1
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
    d = emb_item.shape[1]

    def resample(items: np.ndarray, n: int) -> np.ndarray:
        if len(items) == 0:
            return np.zeros(n, np.int64)
        return rng.choice(items, n, replace=len(items) < n)

    labels = (
        np.asarray(inter.test_ser_labels)
        if inter.test_ser_labels is not None
        else np.ones(inter.n_test)
    )
    y_seren = np.zeros((u_count, 2 * n_pos, d), np.float32)
    y_rel = np.zeros((u_count, 2 * n_pos, d), np.float32)
    for u in range(u_count):
        te = inter.test_items_of(u)
        lab = labels[inter.test_indptr[u]:inter.test_indptr[u + 1]]
        ser_pos = te[lab > 0.99] if len(te) else te
        if len(ser_pos) == 0:
            ser_pos = te
        tr = inter.train_items_of(u)
        negs = _sample_negatives(inter, u, n_pos, rng)
        y_seren[u, :n_pos] = emb_item[resample(ser_pos, n_pos)]
        y_seren[u, n_pos:] = emb_item[negs]
        y_rel[u, :n_pos] = emb_item[resample(tr, n_pos)]
        y_rel[u, n_pos:] = emb_item[negs]

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
    users = np.nonzero(np.diff(inter.test_indptr) > 0)[0]
    hist = user_histories(inter, emb_item, n_reviews)[users]
    d = emb_item.shape[1]
    y = np.zeros((len(users), n_cand, d), np.float32)
    for r, u in enumerate(users):
        te = inter.test_items_of(u)
        y[r, 0] = emb_item[te[-1]]
        y[r, 1:] = emb_item[_sample_negatives(inter, u, n_cand - 1, rng)]
    return {"history": hist, "y_cand": y, "users": users}
