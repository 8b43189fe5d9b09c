"""Synthetic bipartite interaction graphs for scale benchmarking.

The reference has no scale-out story; BASELINE.json's scaling config calls for a
"MovieLens-25M-scale synthetic graph".  This generator draws power-law item
popularity (Zipf) and log-normal user activity, producing graphs with realistic
degree skew at arbitrary scale without shipping datasets.
"""

from __future__ import annotations

import numpy as np

from serendipity_tpu.data.datasets import Interactions, interactions_from_arrays


def synthetic_interactions(
    n_users: int,
    n_items: int,
    avg_degree: float = 40.0,
    zipf_exponent: float = 1.05,
    test_fraction: float = 0.2,
    seed: int = 0,
) -> Interactions:
    rng = np.random.default_rng(seed)
    # user activity: log-normal, min 2 so every user has train + test rows
    act = np.maximum(
        rng.lognormal(mean=np.log(avg_degree) - 0.5, sigma=0.9, size=n_users), 2
    ).astype(np.int64)
    total = int(act.sum())
    users = np.repeat(np.arange(n_users, dtype=np.int64), act)
    # item popularity: Zipf ranks
    ranks = np.arange(1, n_items + 1, dtype=np.float64)
    probs = ranks ** (-zipf_exponent)
    probs /= probs.sum()
    items = rng.choice(n_items, size=total, p=probs)
    # dedupe (user, item)
    pairs = np.unique(users * np.int64(n_items) + items)
    users = (pairs // n_items).astype(np.int64)
    items = (pairs % n_items).astype(np.int64)
    # per-user split: last ceil(f * n) interactions to test, at least 1 train
    order = np.argsort(users, kind="stable")
    users, items = users[order], items[order]
    counts = np.bincount(users, minlength=n_users)
    test_mask = np.zeros(len(users), bool)
    pos = 0
    for u in range(n_users):
        c = counts[u]
        if c >= 2:
            n_te = max(1, int(c * test_fraction))
            test_mask[pos + c - n_te: pos + c] = True
        pos += c
    return interactions_from_arrays(
        users[~test_mask], items[~test_mask],
        users[test_mask], items[test_mask],
        n_users=n_users, n_items=n_items,
    )
