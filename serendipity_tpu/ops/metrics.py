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
