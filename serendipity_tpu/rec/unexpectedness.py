"""Unexpectedness training-sample generation (capability of P15,
`SerenEnhance/code/Unexpectedness_generation.py` — which is unrunnable as shipped
(syntax errors at :147-152) and is treated as a spec, per SURVEY.md §2).

Semantics: from item co-occurrence counts and item popularity, the smoothed
conditional co-consumption probability of item i given user u's history H(u) is

    p(i|u) = mean_{h in H(u)} (cooc(h, i) + mu * p(i)) / (count(h) + mu),   mu = 1

and the unexpectedness of i for u is -log p(i|u).  Per user, the TOP 30% most
unexpected candidates become positive samples and the BOTTOM 30% negatives; n_pos
of each are drawn to build the transformer re-ranker's training pairs.

Co-occurrence source: either caller-provided (e.g. from also_buy/also_view metadata,
the reference's source) or computed from train co-consumption as C = R^T R via
blocked MXU matmuls over the binary incidence matrix.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from serendipity_tpu.data.datasets import Interactions


def cooccurrence_dense(inter: Interactions, user_block: int = 1024) -> np.ndarray:
    """C[i, j] = #users that interacted with both i and j (train), via blocked
    R_block^T @ R_block accumulation on device.  Intended for item vocabularies
    that fit an I x I f32 matrix; larger catalogs should supply metadata-based
    co-occurrence instead."""
    n_items = inter.n_items
    acc = jnp.zeros((n_items, n_items), jnp.float32)

    @jax.jit
    def add_block(acc, r_block):
        return acc + jax.lax.dot_general(
            r_block, r_block, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    for s in range(0, inter.n_users, user_block):
        e = min(s + user_block, inter.n_users)
        r = np.zeros((user_block, n_items), np.float32)
        for row, u in enumerate(range(s, e)):
            r[row, inter.train_items_of(u)] = 1.0
        acc = add_block(acc, jnp.asarray(r))
    return np.asarray(acc)


def unexpectedness_scores(
    inter: Interactions,
    candidates: np.ndarray,          # [U, C] int32
    cooc: np.ndarray,                # [I, I] counts (or metadata co-occurrence)
    mu: float = 1.0,
    user_block: int = 256,
) -> np.ndarray:
    """-log p(cand | user history) per candidate: [U, C] float32."""
    counts = np.maximum(np.diff(inter.train_indptr_by_item).astype(np.float32), 0)
    pop = counts / max(counts.sum(), 1.0)
    n_users, c = candidates.shape
    out = np.zeros((n_users, c), np.float32)
    cooc_dev = jnp.asarray(cooc, jnp.float32)
    pop_dev = jnp.asarray(pop)
    counts_dev = jnp.asarray(counts)

    from serendipity_tpu.rec.strategies import padded_rows

    @jax.jit
    def block(hist, cand):
        # p(i|h) = (cooc[h, i] + mu*p(i)) / (count(h) + mu); mean over valid h
        valid = (hist < inter.n_items)
        h_safe = jnp.minimum(hist, inter.n_items - 1)
        cc = cooc_dev[h_safe[:, :, None], cand[:, None, :]]         # [B, T, C]
        p = (cc + mu * pop_dev[cand][:, None, :]) / (
            counts_dev[h_safe][:, :, None] + mu
        )
        p = jnp.where(valid[:, :, None], p, 0.0)
        denom = jnp.maximum(valid.sum(axis=1, keepdims=True), 1)
        p_mean = p.sum(axis=1) / denom
        return -jnp.log(jnp.maximum(p_mean, 1e-12))

    for s in range(0, n_users, user_block):
        e = min(s + user_block, n_users)
        hist = padded_rows(
            inter.train_indptr, inter.train_indices, np.arange(s, e), inter.n_items
        )
        out[s:e] = np.asarray(block(jnp.asarray(hist), jnp.asarray(candidates[s:e])))
    return out


def sample_unexpectedness_pairs(
    candidates: np.ndarray,
    unexp: np.ndarray,
    n_pos: int = 50,
    top_frac: float = 0.3,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """(pos_items [U, n_pos], neg_items [U, n_pos]): n_pos draws from the top-30%
    most-unexpected candidates and n_pos from the bottom 30%."""
    rng = np.random.default_rng(seed)
    n_users, c = candidates.shape
    cut = max(int(c * top_frac), n_pos)
    order = np.argsort(-unexp, axis=1)
    pos = np.zeros((n_users, n_pos), np.int32)
    neg = np.zeros((n_users, n_pos), np.int32)
    for u in range(n_users):
        top = candidates[u, order[u, :cut]]
        bot = candidates[u, order[u, -cut:]]
        pos[u] = rng.choice(top, n_pos, replace=cut < n_pos)
        neg[u] = rng.choice(bot, n_pos, replace=cut < n_pos)
    return pos, neg
