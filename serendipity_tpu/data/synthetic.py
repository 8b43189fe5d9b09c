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
    n_clusters: int = 0,
    affinity: float = 0.8,
) -> Interactions:
    """Power-law bipartite graph; optionally with LATENT CLUSTER structure.

    With the default `n_clusters=0`, items are drawn i.i.d. from a global Zipf
    — realistic degree skew, but NO learnable user-item affinity beyond
    popularity (recall@k of any trained model is then bounded by the popularity
    baseline; fine for throughput benchmarks, useless for quality studies).
    With `n_clusters=K`, users and items are assigned uniformly to K latent
    clusters and each interaction draws its item from the user's own cluster's
    Zipf with probability `affinity` (else the global Zipf) — giving embedding
    models real structure to recover, so warm-start/quality comparisons at
    synthetic scale are meaningful.  Same degree-skew machinery either way.
    """
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
    if n_clusters > 0:
        user_c = rng.integers(0, n_clusters, size=n_users)
        item_c = rng.integers(0, n_clusters, size=n_items)
        in_cluster = rng.random(total) < affinity
        edge_c = user_c[users]
        for c in range(n_clusters):
            sel = in_cluster & (edge_c == c)
            m = int(sel.sum())
            if m == 0:
                continue
            members = np.flatnonzero(item_c == c)
            if len(members) == 0:
                continue
            p_c = probs[members] / probs[members].sum()
            # inverse-CDF sampling within the cluster's own Zipf weights
            cdf = np.cumsum(p_c)
            idx = np.searchsorted(cdf, rng.random(m), side="right")
            items[sel] = members[np.minimum(idx, len(members) - 1)]
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
