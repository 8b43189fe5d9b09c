"""On-device BPR (user, pos, neg) batch sampling.

Contract of the reference C++ sampler `sample_negative` (`sampling.cpp:27-56`) and its
Python fallback `UniformSample_original_python` (`code/utils.py:67-99`): a sample is
(u ~ uniform over users with >=1 positive, pos ~ uniform over u's positives,
neg ~ uniform over items rejected while in u's positive set).

TPU-native formulation: no data-dependent loops — negatives are drawn for a fixed
number of rounds R and the first non-positive draw per slot is kept.  The residual
bias (all R draws positive) is < max_density^R, negligible for R>=8 at recommender
sparsity levels; the host C++ sampler (`stpu_sample_negatives` in `native/graphio.cpp`)
provides the exact rejection loop as a differential cross-check, mirroring the
reference's dual implementations (`code/utils.py:21-31`).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from serendipity_tpu.ops.search import contains_in_rows


def sample_bpr_batch(
    key: jax.Array,
    valid_users: jnp.ndarray,     # [n_valid] user ids with >=1 train item
    train_indptr: jnp.ndarray,    # [n_users+1] int32
    train_indices: jnp.ndarray,   # [nnz] int32, sorted per row
    n_items: int,
    batch_size: int,
    resample_rounds: int = 16,
    search_iters: int = 0,        # 0 = ceil(log2(n_items)) + 1 (always enough)
    bitmap: jnp.ndarray | None = None,   # [n_users, nbytes] uint8 membership
                                         # bitmap (pack_mask_bitmap layout);
                                         # replaces bisection when given
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (users, pos_items, neg_items), each int32 [batch_size].

    Membership testing for the rejection rounds comes in two bit-identical
    flavors (same PRNG draws -> same accept/reject decisions -> same outputs):

      * bisection (`contains_in_rows`): ~log2(max_degree) dependent [R*B]
        gathers per batch — latency-bound on TPU;
      * bitmap (when `bitmap` is given): ONE byte gather per draw into the
        plane-packed train bitmap (`ops/pallas_score.pack_mask_bitmap` layout:
        item i -> byte (i>>10)*128 + (i&127), bit (i>>7)&7) — the same bitmap
        the fused masked evaluator uses.
    """
    import math

    k_user, k_pos, k_neg = jax.random.split(key, 3)

    uidx = jax.random.randint(k_user, (batch_size,), 0, valid_users.shape[0])
    users = valid_users[uidx]

    lo = train_indptr[users].astype(jnp.int32)
    hi = train_indptr[users + 1].astype(jnp.int32)
    deg = hi - lo
    pos_off = jax.random.randint(k_pos, (batch_size,), 0, 1 << 30) % jnp.maximum(deg, 1)
    pos = train_indices[lo + pos_off]

    cands = jax.random.randint(
        k_neg, (resample_rounds, batch_size), 0, n_items, dtype=jnp.int32
    )
    if bitmap is not None:
        byte_idx = (cands >> 10) * 128 + (cands & 127)
        bit = (cands >> 7) & 7
        # 2-D gather (row, byte) rather than a flattened index: n_users * nbytes
        # can exceed int32 range at >ML-25M scale, which would silently wrap
        # under jit; per-axis indices stay well inside int32.
        rows = jnp.broadcast_to(users[None, :].astype(jnp.int32), cands.shape)
        bytes_g = bitmap[rows.reshape(-1), byte_idx.reshape(-1)].astype(jnp.int32)
        is_pos = (((bytes_g >> bit.reshape(-1)) & 1) > 0).reshape(cands.shape)
    else:
        # row segments hold <= n_items sorted entries, so log2(n_items)+1
        # bisection steps always converge — a fixed 32 wasted ~2/3 of the search
        if search_iters <= 0:
            search_iters = int(math.ceil(math.log2(max(n_items, 2)))) + 1
        is_pos = contains_in_rows(
            train_indices,
            jnp.broadcast_to(lo, cands.shape).reshape(-1),
            jnp.broadcast_to(hi, cands.shape).reshape(-1),
            cands.reshape(-1),
            n_iters=search_iters,
        ).reshape(cands.shape)
    # first non-positive round per slot; if all rounds hit positives keep the last draw
    first_ok = jnp.argmax(~is_pos, axis=0)
    any_ok = jnp.any(~is_pos, axis=0)
    row = jnp.where(any_ok, first_ok, resample_rounds - 1)
    neg = cands[row, jnp.arange(batch_size)]
    return users.astype(jnp.int32), pos.astype(jnp.int32), neg.astype(jnp.int32)
