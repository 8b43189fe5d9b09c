"""Stratified candidate generation, on device.

Capability match for `create_candidates_stratification` (`recommend.py:359-452`):
score every (user, item) pair, bin scores into `num_fold` equi-width buckets using the
GLOBAL score min/max (+epsilon on max), then per user draw K_c candidates from the
non-train items with per-bucket quotas proportional to bucket sizes, shuffle, and
overwrite the tail with the user's test items.

TPU-native design: the [U, N] score matrix is never materialized on the host — user
blocks are scored on the MXU, a first pass reduces global min/max, a second pass bins
and samples.  Per-user stratified sampling without replacement is a Gumbel-style
"priority top-K within bucket" selection:

    rank_in_bucket(item) among eligible items ordered by random priority;
    selected  <=>  rank_in_bucket < quota[bucket].

With proportional quotas this draws exactly the reference's stratified distribution.
Items beyond the quota-selected set fill remaining slots in priority order (the
reference instead re-samples duplicates when short, `recommend.py:314-325`; we keep
candidates distinct — documented deviation).

Output is a dense int32 [n_users, K_c] matrix (the reference's dict-of-lists has
constant length K_c too: K_c - n_test sampled + n_test appended).
Users whose test-item count exceeds K_c are not supported (same as the reference).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from serendipity_tpu.config import RecConfig
from serendipity_tpu.data.datasets import Interactions


def global_score_minmax(
    emb_user: jnp.ndarray,
    emb_item: jnp.ndarray,
    user_block: int = 1024,
    fp16: bool = True,
) -> Tuple[float, float]:
    """Global min/max of U @ I^T, blocked over users.

    The reference computes the full matrix in fp16 (`recommend.py:375`); we reduce
    per block with the matmul in fp32 and optionally round through fp16 to preserve
    the reference's binning boundaries.
    """
    n_users = emb_user.shape[0]

    @jax.jit
    def block_minmax(ub):
        s = ub @ emb_item.T
        if fp16:
            s = s.astype(jnp.float16).astype(jnp.float32)
        return jnp.min(s), jnp.max(s)

    mn, mx = np.inf, -np.inf
    for s in range(0, n_users, user_block):
        ub = emb_user[s:s + user_block]
        bmn, bmx = block_minmax(ub)
        mn = min(mn, float(bmn))
        mx = max(mx, float(bmx))
    return mn, mx


@partial(jax.jit, static_argnames=("k_c", "num_fold", "n_items", "h_max"))
def _sample_block(
    key: jax.Array,
    user_emb_block: jnp.ndarray,     # [B, D]
    item_emb: jnp.ndarray,           # [N, D]
    rows: jnp.ndarray,               # [B] int32 user ids (train mask built on device)
    tr_ptr: jnp.ndarray,             # [U+1] int32 train CSR
    tr_idx: jnp.ndarray,             # [nnz] int32
    n_keep: jnp.ndarray,             # [B] int32: K_c - n_test(u), slots to sample
    min_dis: jnp.ndarray,            # scalars (global, max already includes +eps)
    max_dis: jnp.ndarray,
    k_c: int,
    num_fold: int,
    n_items: int,
    h_max: int,
) -> jnp.ndarray:
    """Stratified candidate sampling for one user block -> [B, k_c] (tail unfilled
    slots hold extra priority-ordered items; test items overwrite the tail later)."""
    b = user_emb_block.shape[0]
    # dense per-user train mask from CSR, on device (the padded-row scatter lands
    # pad ids in an extra column that is sliced away)
    from serendipity_tpu.rec.strategies import padded_rows_device

    hist = padded_rows_device(tr_ptr, tr_idx, rows, h_max, n_items)
    train_mask = (
        jnp.zeros((b, n_items + 1), jnp.bool_)
        .at[jnp.arange(b)[:, None], hist]
        .set(True)[:, :n_items]
    )
    scores = (user_emb_block @ item_emb.T).astype(jnp.float16).astype(jnp.float32)
    inter = (max_dis - min_dis) / num_fold
    labels = jnp.clip(
        jnp.floor((scores - min_dis) / inter), 0, num_fold - 1
    ).astype(jnp.int32)                                           # [B, N]

    eligible = ~train_mask

    def count_bucket(f):
        return jnp.sum((labels == f) & eligible, axis=1).astype(jnp.float32)

    bucket_counts = jnp.stack(
        [count_bucket(f) for f in range(num_fold)], axis=1
    )                                                             # [B, F]
    total = jnp.maximum(jnp.sum(bucket_counts, axis=1, keepdims=True), 1.0)
    # rint quotas, proportional allocation (`recommend.py:346-351`)
    quotas = jnp.round(n_keep[:, None] * bucket_counts / total)   # [B, F]

    priority = jax.random.uniform(key, (b, n_items))
    priority = jnp.where(eligible, priority, -1.0)
    # rank of each item within its bucket by priority (descending); computed one
    # bucket at a time so peak memory stays O(B*N), not O(B*N*F)
    order = jnp.argsort(-priority, axis=1)                        # eligible first
    labels_sorted = jnp.take_along_axis(labels, order, axis=1)

    def add_bucket_rank(f, acc):
        mask = (labels_sorted == f).astype(jnp.float32)
        return acc + (jnp.cumsum(mask, axis=1) - mask) * mask

    rank_sorted = jax.lax.fori_loop(
        0, num_fold, add_bucket_rank, jnp.zeros((b, n_items), jnp.float32)
    )                                                             # [B, N]
    elig_sorted = jnp.take_along_axis(eligible, order, axis=1)
    quota_of_item = jnp.take_along_axis(
        quotas, labels_sorted, axis=1
    )
    selected_sorted = (rank_sorted < quota_of_item) & elig_sorted

    # pack: quota-selected first (by priority), then remaining eligible by priority
    sel_key = (
        selected_sorted.astype(jnp.float32) * 2.0
        + elig_sorted.astype(jnp.float32)
    )
    # stable ordering: primary sel_key desc, secondary original priority order asc
    pos = jnp.arange(n_items, dtype=jnp.float32)[None, :] / n_items
    final_order = jnp.argsort(-(sel_key - pos * 0.5), axis=1)
    cand_sorted = jnp.take_along_axis(order, final_order, axis=1)
    return cand_sorted[:, :k_c]


def create_candidates(
    inter: Interactions,
    emb_user: np.ndarray,
    emb_item: np.ndarray,
    cfg: RecConfig,
    seed: int = 0,
    user_block: int = 512,
) -> np.ndarray:
    """Full candidate matrix [n_users, K_c] with test items in the tail slots."""
    k_c = cfg.n_candidates
    eu = jnp.asarray(emb_user, dtype=jnp.float32)
    ei = jnp.asarray(emb_item, dtype=jnp.float32)
    mn, mx = global_score_minmax(eu, ei)
    mx = mx + cfg.bin_epsilon                                    # `recommend.py:377`

    n_users, n_items = inter.n_users, inter.n_items
    test_deg = np.diff(inter.test_indptr).astype(np.int32)
    if (test_deg > k_c).any():
        raise ValueError("a user has more test items than K_c")
    n_keep = (k_c - test_deg).astype(np.int32)

    tr_ptr = jnp.asarray(inter.train_indptr, jnp.int32)
    tr_idx = jnp.asarray(inter.train_indices, jnp.int32)
    h_max = max(1, int(np.diff(inter.train_indptr).max()))

    out = np.zeros((n_users, k_c), dtype=np.int32)
    key = jax.random.PRNGKey(seed)
    for s in range(0, n_users, user_block):
        e = min(s + user_block, n_users)
        b = e - s
        rows = np.minimum(np.arange(s, s + user_block, dtype=np.int32), n_users - 1)
        ue = np.zeros((user_block, eu.shape[1]), np.float32)
        ue[:b] = emb_user[s:e]
        nk = np.zeros((user_block,), np.int32)
        nk[:b] = n_keep[s:e]
        key, sub = jax.random.split(key)
        cand = np.asarray(
            _sample_block(
                sub, jnp.asarray(ue), ei, jnp.asarray(rows), tr_ptr, tr_idx,
                jnp.asarray(nk), jnp.float32(mn), jnp.float32(mx),
                k_c, cfg.n_score_bins, n_items, h_max,
            )
        )[:b]
        out[s:e] = cand

    # overwrite tail slots with the user's test items (`recommend.py:444-451`)
    for u in range(n_users):
        t = inter.test_items_of(u)
        if len(t):
            out[u, k_c - len(t):] = t
    return out
