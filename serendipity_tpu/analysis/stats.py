"""Embedding/dataset statistics (compute half of `exp_analysis.py`, P13).

Covers `StatiSimiEmbed` (`exp_analysis.py:202-360`) and the blocked cosine variant
`StatiSimiEmbedCos` (`:362-442`): mean/std of user-item and item-item similarities
over (a) all pairs, (b) rated (train) pairs, (c) test pairs split by serendipity
label — plus the long-tail interaction frequency stats (`interactions_num_freq`,
`:564-576`).  All pairwise reductions run blocked on device; nothing materializes an
N x N matrix on the host.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from serendipity_tpu.data.datasets import Interactions


def _blocked_moments(
    a: np.ndarray, b: np.ndarray, block: int = 2048, cosine: bool = False
) -> Tuple[float, float, float, float]:
    """mean/std/min/max of all entries of A @ B^T, blocked over A's rows."""
    a_d = jnp.asarray(a, jnp.float32)
    b_d = jnp.asarray(b, jnp.float32)
    if cosine:
        a_d = a_d / jnp.maximum(jnp.linalg.norm(a_d, axis=1, keepdims=True), 1e-12)
        b_d = b_d / jnp.maximum(jnp.linalg.norm(b_d, axis=1, keepdims=True), 1e-12)

    @jax.jit
    def stats(rows):
        s = rows @ b_d.T
        return jnp.sum(s), jnp.sum(s * s), jnp.min(s), jnp.max(s)

    tot, tot2, mn, mx = 0.0, 0.0, np.inf, -np.inf
    n = 0
    for s in range(0, a.shape[0], block):
        t, t2, bmn, bmx = stats(a_d[s:s + block])
        tot += float(t)
        tot2 += float(t2)
        mn = min(mn, float(bmn))
        mx = max(mx, float(bmx))
        n += (min(s + block, a.shape[0]) - s) * b.shape[0]
    mean = tot / n
    var = max(tot2 / n - mean * mean, 0.0)
    return mean, float(np.sqrt(var)), mn, mx


def _pair_dots(
    emb_a: np.ndarray, emb_b: np.ndarray, rows: np.ndarray, cols: np.ndarray,
    cosine: bool = False,
) -> np.ndarray:
    a = emb_a[rows]
    b = emb_b[cols]
    if cosine:
        a = a / np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-12)
        b = b / np.maximum(np.linalg.norm(b, axis=1, keepdims=True), 1e-12)
    return np.einsum("nd,nd->n", a, b)


def embedding_similarity_stats(
    inter: Interactions,
    emb_user: np.ndarray,
    emb_item: np.ndarray,
    cosine: bool = False,
) -> Dict[str, Dict[str, float]]:
    """mean/std of similarities over: all user-item pairs, rated (train) pairs,
    test pairs (split by serLabel when present), and all item-item pairs."""
    out: Dict[str, Dict[str, float]] = {}

    m, s, mn, mx = _blocked_moments(emb_user, emb_item, cosine=cosine)
    out["ui_all"] = {"mean": m, "std": s, "min": mn, "max": mx}
    m, s, mn, mx = _blocked_moments(emb_item, emb_item, cosine=cosine)
    out["ii_all"] = {"mean": m, "std": s, "min": mn, "max": mx}

    users, items = inter.train_user_item_pairs()
    rated = _pair_dots(emb_user, emb_item, users, items, cosine)
    out["ui_rated"] = {"mean": float(rated.mean()), "std": float(rated.std())}

    te_users = np.repeat(
        np.arange(inter.n_users, dtype=np.int64), np.diff(inter.test_indptr)
    )
    te_items = inter.test_indices
    if len(te_items):
        te = _pair_dots(emb_user, emb_item, te_users, te_items, cosine)
        out["ui_test"] = {"mean": float(te.mean()), "std": float(te.std())}
        if inter.test_ser_labels is not None:
            lab = np.asarray(inter.test_ser_labels) > 0.99
            for name, mask in (("ui_test_ser_pos", lab), ("ui_test_ser_neg", ~lab)):
                if mask.any():
                    out[name] = {
                        "mean": float(te[mask].mean()),
                        "std": float(te[mask].std()),
                    }
    return out


def interaction_frequency_stats(
    inter: Interactions, n_buckets: int = 20
) -> Dict[str, np.ndarray]:
    """Long-tail stats (`interactions_num_freq`): histogram of per-item interaction
    counts + the share of interactions covered by the top-x% most popular items."""
    counts = np.diff(inter.train_indptr_by_item)
    order = np.sort(counts)[::-1]
    cum = np.cumsum(order) / max(order.sum(), 1)
    fractions = np.linspace(0, 1, n_buckets + 1)[1:]
    coverage = np.array([
        cum[min(int(f * len(order)) - 1, len(order) - 1)] if len(order) else 0.0
        for f in fractions
    ])
    hist, edges = np.histogram(counts, bins=n_buckets)
    return {
        "item_degree_hist": hist,
        "item_degree_edges": edges,
        "top_fraction": fractions,
        "coverage": coverage,
    }


def factor_impact_ranks(
    mean_matrices: Dict[str, np.ndarray],
    method_names,
    metric_col: int = 6,
) -> Dict[str, np.ndarray]:
    """Cross-dataset factor ranking on a chosen metric column (default ser1),
    capability of `ImpactsOfFactorsOnSerendipity` (`exp_analysis.py:444-496`):
    for each dataset, the rank (1 = best) of every strategy."""
    out = {}
    for ds, mat in mean_matrices.items():
        vals = mat[:, metric_col]
        order = np.argsort(-vals)
        ranks = np.empty(len(vals), dtype=int)
        ranks[order] = np.arange(1, len(vals) + 1)
        out[ds] = ranks
    return out


def topk_sensitivity(
    evaluator,
    recs_full: Dict[str, np.ndarray],
    candidates: np.ndarray,
    ks,
) -> Dict[str, np.ndarray]:
    """Metric-vs-K curves (capability of `topk_single_factor`,
    `exp_analysis.py:625-691`): evaluate each strategy's rec list truncated to each
    K, returning ser1 per (method, K)."""
    out = {m: np.zeros(len(ks)) for m in recs_full}
    pm = evaluator.create_pm(candidates)
    for j, k in enumerate(ks):
        trunc = {m: r[:, :k] for m, r in recs_full.items()}
        res = evaluator.evaluate_methods(trunc, pm=pm)
        for m in recs_full:
            out[m][j] = res[m]["ser1"]
    return out
