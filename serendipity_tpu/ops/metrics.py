"""On-device ranking metrics at every cutoff 1..K.

Vectorized equivalents of the reference C++ evaluator (`evaluate_foldout.h:16-112`):
per user, cumulative precision / recall / AP / NDCG / MRR vectors over cutoffs
1..rank_len, from a [B, K] matrix of ranked item ids and the test-set CSR.  The
binary-relevance NDCG variant of the PyTorch evaluator (`code/utils.py:243-262`) is
identical to the foldout formula (iDCG truncates at truth_len), so one implementation
serves both.

All O(B*K) work is elementwise/cumsum on the VPU; the only gathers are the test-set
membership binary searches.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from serendipity_tpu.ops.search import contains_in_rows


def hit_matrix(
    ranked_items: jnp.ndarray,   # [B, K] int32
    test_lo: jnp.ndarray,        # [B] start offsets into test_indices
    test_hi: jnp.ndarray,        # [B] end offsets
    test_indices: jnp.ndarray,   # flat sorted-per-row test CSR indices
) -> jnp.ndarray:
    b, k = ranked_items.shape
    lo = jnp.broadcast_to(test_lo[:, None], (b, k)).reshape(-1)
    hi = jnp.broadcast_to(test_hi[:, None], (b, k)).reshape(-1)
    hits = contains_in_rows(test_indices, lo, hi, ranked_items.reshape(-1))
    return hits.reshape(b, k).astype(jnp.float32)


def ranking_metrics_cumulative(
    hits: jnp.ndarray,           # [B, K] float 0/1
    truth_len: jnp.ndarray,      # [B] number of test items per user
) -> Dict[str, jnp.ndarray]:
    """Per-user metric vectors at cutoffs 1..K, shape [B, K] each.

    Exact formulas of `evaluate_foldout.h`:
      precision@k = hits_cum / k                         (:16-30)
      recall@k    = hits_cum / truth_len                 (:32-46)
      ap@k        = (sum over hit positions i<=k of hits_cum_i / i) / truth_len  (:48-66)
      ndcg@k      = DCG_k / iDCG_k, DCG = sum hits_i/log2(i+1),
                    iDCG_k = sum_{i<=min(k,truth_len)} 1/log2(i+1)               (:68-87)
      mrr@k       = 1/rank of first hit if <= k else 0   (:89-112)
    """
    b, k = hits.shape
    ranks = jnp.arange(1, k + 1, dtype=jnp.float32)       # 1-based position
    cum_hits = jnp.cumsum(hits, axis=1)
    tl = jnp.maximum(truth_len.astype(jnp.float32), 1.0)[:, None]

    precision = cum_hits / ranks[None, :]
    recall = cum_hits / tl
    ap = jnp.cumsum(hits * precision, axis=1) / tl

    discounts = 1.0 / jnp.log2(ranks + 1.0)
    dcg = jnp.cumsum(hits * discounts[None, :], axis=1)
    ideal_mask = (ranks[None, :] <= tl).astype(jnp.float32)
    idcg = jnp.cumsum(ideal_mask * discounts[None, :], axis=1)
    ndcg = dcg / jnp.maximum(idcg, 1e-12)

    rr_at = hits * (1.0 / ranks[None, :])
    mrr = jax_cummax(rr_at)

    return {
        "precision": precision,
        "recall": recall,
        "ap": ap,
        "ndcg": ndcg,
        "mrr": mrr,
    }


def jax_cummax(x: jnp.ndarray) -> jnp.ndarray:
    import jax.lax as lax

    return lax.associative_scan(jnp.maximum, x, axis=1)


def loo_metrics_cumulative(
    ranked_items: jnp.ndarray,   # [B, K] int32 ranked item ids
    truth: jnp.ndarray,          # [B] int32: the single held-out item per user
) -> Dict[str, jnp.ndarray]:
    """Leave-one-out protocol metric vectors at cutoffs 1..K, shape [B, K] each.

    Exact formulas of the reference's second evaluator package
    (`LightGCN-tf/evaluator/python/evaluate_loo.py:13-64`): with `i` the 0-based
    rank of the ground-truth item (or never found),
      hr@k   = 1[i < k]
      ndcg@k = 1[i < k] / log2(i + 2)
      mrr@k  = 1[i < k] / (i + 1)
    """
    found = ranked_items == truth[:, None]                 # at most one True
    step = jax_cummax(found.astype(jnp.float32))           # 1 from rank i onward
    idx = jnp.argmax(found, axis=1).astype(jnp.float32)    # 0 when absent; step=0 then
    return {
        "hr": step,
        "ndcg": step * (1.0 / jnp.log2(idx + 2.0))[:, None],
        "mrr": step * (1.0 / (idx + 1.0))[:, None],
    }


def _tie_average_ranks(scores: jnp.ndarray) -> jnp.ndarray:
    """Per-row 1-based average ranks (ascending), ties sharing their mean position.

    Matches scipy's `rankdata(method='average')` row-wise: sort, find tie runs via
    neighbor comparison, give each run the mean of its positions, scatter back.
    Everything is sort/cumsum/associative-scan — no data-dependent shapes.
    """
    import jax.lax as lax

    b, n = scores.shape
    order = jnp.argsort(scores, axis=1)
    s_sorted = jnp.take_along_axis(scores, order, axis=1)
    pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.float32), (b, n))
    changed = s_sorted[:, 1:] != s_sorted[:, :-1]
    is_start = jnp.concatenate([jnp.ones((b, 1), bool), changed], axis=1)
    is_end = jnp.concatenate([changed, jnp.ones((b, 1), bool)], axis=1)
    run_start = lax.associative_scan(jnp.maximum, jnp.where(is_start, pos, -1.0), axis=1)
    run_end = jnp.flip(
        lax.associative_scan(
            jnp.minimum, jnp.flip(jnp.where(is_end, pos, float(n)), axis=1), axis=1
        ),
        axis=1,
    )
    avg_rank_sorted = (run_start + run_end) * 0.5 + 1.0
    inv = jnp.argsort(order, axis=1)
    return jnp.take_along_axis(avg_rank_sorted, inv, axis=1)


def auc_rows(
    scores: jnp.ndarray,      # [B, N] float
    pos_mask: jnp.ndarray,    # [B, N] bool: ground-truth (test) items
    valid_mask: jnp.ndarray,  # [B, N] bool: items that participate (non-train)
) -> jnp.ndarray:
    """Per-user ROC AUC, the contract of `code/utils.py:265-274` (reference AUC):
    labels 1 on test items, candidates = all items except the user's train items,
    sklearn `roc_auc_score` semantics (tie-averaged ranks).

    Mann-Whitney form: AUC = (sum of positive ranks - P(P+1)/2) / (P*N).  Invalid
    entries are pushed below the row minimum so they occupy the lowest ranks as a
    block and subtract out exactly.  Rows with no positive or no negative return 0.
    """
    neg_fill = jnp.min(jnp.where(valid_mask, scores, jnp.inf), axis=1, keepdims=True) - 1.0
    s = jnp.where(valid_mask, scores, neg_fill)
    ranks = _tie_average_ranks(s)
    n_invalid = jnp.sum(~valid_mask, axis=1).astype(jnp.float32)
    pos = pos_mask & valid_mask
    n_pos = jnp.sum(pos, axis=1).astype(jnp.float32)
    n_neg = jnp.sum(valid_mask, axis=1).astype(jnp.float32) - n_pos
    rank_sum = jnp.sum(jnp.where(pos, ranks, 0.0), axis=1) - n_pos * n_invalid
    auc = (rank_sum - n_pos * (n_pos + 1.0) * 0.5) / jnp.maximum(n_pos * n_neg, 1.0)
    return jnp.where((n_pos > 0) & (n_neg > 0), auc, 0.0)
