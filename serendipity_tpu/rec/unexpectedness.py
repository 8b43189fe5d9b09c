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

from functools import partial
from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from serendipity_tpu.data.datasets import Interactions

# truncated co-occurrence: per-item (sorted neighbor ids [I, T], counts [I, T])
CoocTopK = Tuple[np.ndarray, np.ndarray]


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


def cooccurrence_topk(
    inter: Interactions,
    top_t: int = 64,
    item_block: int = 512,
    edge_chunk: int = 8192,
) -> CoocTopK:
    """Per-item TRUNCATED co-occurrence lists — the amazon-book-scale path.

    The dense C = R^T R is I x I (33 GB f32 at 91,599 items); what the
    unexpectedness score actually consumes is cooc(h, i) lookups, for which the
    top-T co-occurring neighbors per item suffice (pairs beyond the top T are
    treated as 0 — a documented truncation, exact when T >= the item's true
    co-consumption fan-out).

    TPU-native construction: C's rows for an item block are one sparse-dense
    SpMM, C_blk = A_iu[blk] @ R — a structured gather of user-incidence rows +
    a segment-sum, never materializing more than [item_block, I] at a time;
    per-row exact top-T happens on device and only [I, T] returns to the host.
    The incidence matrix R lives on device in bf16 (0/1 exact): ~9.6 GB at
    amazon-book scale; catalogs beyond HBM should supply metadata co-occurrence
    (the reference's also_buy/also_view source) instead.
    """
    n_users, n_items = inter.n_users, inter.n_items
    if n_users * n_items * 2 > 12 << 30:
        raise ValueError(
            "incidence matrix exceeds the device-memory budget; supply "
            "metadata-based co-occurrence (reference also_buy/also_view path)"
        )
    # the chunk gather materializes [edge_chunk, n_items] in bf16 + f32; keep
    # that transient around ~1.5 GB so R (up to ~10 GB) still fits beside it
    edge_chunk = max(512, min(edge_chunk, int(1.5e9 / (n_items * 6))))
    deg_u = np.diff(inter.train_indptr)
    u_of_edge = np.repeat(
        np.arange(n_users, dtype=np.int32), deg_u
    )
    r = (
        jnp.zeros((n_users + 1, n_items), jnp.bfloat16)
        .at[jnp.asarray(u_of_edge), jnp.asarray(inter.train_indices.astype(np.int32))]
        .set(1)
    )                                   # +1 dummy row for padded edges

    from serendipity_tpu.ops.topk import topk_exact_2stage

    # r passed explicitly (a jit CLOSURE would embed the multi-GB incidence
    # matrix as a lowering constant); acc donated so only one block buffer lives
    @partial(jax.jit, donate_argnums=(1,))
    def accum(r_arg, acc, users_chunk, dst_chunk):
        part = r_arg[users_chunk].astype(jnp.float32)   # [E, n_items]
        return acc + jax.ops.segment_sum(
            part, dst_chunk, num_segments=acc.shape[0]
        )

    @jax.jit
    def block_topk(acc):
        return topk_exact_2stage(acc, min(top_t, n_items))

    ptr = inter.train_indptr_by_item
    src = inter.train_indices_by_item.astype(np.int32)
    t_eff = min(top_t, n_items)
    idx_out = np.full((n_items, t_eff), n_items, np.int32)
    cnt_out = np.zeros((n_items, t_eff), np.float32)
    for s in range(0, n_items, item_block):
        e = min(s + item_block, n_items)
        lo, hi = int(ptr[s]), int(ptr[e])
        acc = jnp.zeros((item_block, n_items), jnp.float32)
        dst_local = np.repeat(
            np.arange(e - s, dtype=np.int32), np.diff(ptr[s:e + 1])
        )
        for cs in range(lo, hi, edge_chunk):
            ce = min(cs + edge_chunk, hi)
            users = np.full(edge_chunk, n_users, np.int32)      # dummy row pad
            users[: ce - cs] = src[cs:ce]
            dst = np.full(edge_chunk, item_block, np.int32)     # dropped pad
            dst[: ce - cs] = dst_local[cs - lo:ce - lo]
            acc = accum(r, acc, jnp.asarray(users), jnp.asarray(dst))
        cnt, idx = block_topk(acc)
        cnt = np.asarray(cnt[: e - s])
        idx = np.asarray(idx[: e - s])
        idx = np.where(cnt > 0, idx, n_items)   # zero-count slots never match
        order = np.argsort(idx, axis=1)         # sorted ids for binary search
        idx_out[s:e] = np.take_along_axis(idx, order, axis=1)
        cnt_out[s:e] = np.take_along_axis(cnt, order, axis=1)
    return idx_out, cnt_out


def _search_sorted_rows(sorted_idx, cnt, q):
    """cnt value where q appears in its sorted row, else 0.

    `sorted_idx`/`cnt`: [..., T]; `q`: [..., C] sharing the leading dims — each
    of the C queries binary-searches its row's T entries (fixed-step loop)."""
    import math

    t = sorted_idx.shape[-1]
    lo = jnp.zeros(q.shape, jnp.int32)
    hi = jnp.full(q.shape, t - 1, jnp.int32)
    for _ in range(int(math.ceil(math.log2(max(t, 2)))) + 1):
        mid = (lo + hi) // 2
        v = jnp.take_along_axis(sorted_idx, mid, axis=-1)
        go_right = v < q
        lo = jnp.where(go_right, jnp.minimum(mid + 1, t - 1), lo)
        hi = jnp.where(go_right, hi, mid)
    v = jnp.take_along_axis(sorted_idx, hi, axis=-1)
    c = jnp.take_along_axis(cnt, hi, axis=-1)
    return jnp.where(v == q, c, 0.0)


def unexpectedness_scores(
    inter: Interactions,
    candidates: np.ndarray,          # [U, C] int32
    cooc: Union[np.ndarray, CoocTopK],   # [I, I] dense, or (idx, cnt) top-T lists
    mu: float = 1.0,
    user_block: int = 256,
) -> np.ndarray:
    """-log p(cand | user history) per candidate: [U, C] float32.

    `cooc` may be the dense [I, I] matrix (small catalogs / metadata) or the
    truncated `cooccurrence_topk` lists (amazon-book+ scale)."""
    if isinstance(cooc, tuple):
        return _unexpectedness_scores_topk(
            inter, candidates, cooc, mu=mu, user_block=user_block
        )
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


def _unexpectedness_scores_topk(
    inter: Interactions,
    candidates: np.ndarray,
    cooc: CoocTopK,
    mu: float = 1.0,
    user_block: int = 64,
) -> np.ndarray:
    """Same formula as the dense path, with cooc(h, i) looked up by binary search
    in each history item's sorted top-T neighbor list (missing pair -> 0)."""
    idx_t, cnt_t = cooc
    counts = np.maximum(np.diff(inter.train_indptr_by_item).astype(np.float32), 0)
    pop = counts / max(counts.sum(), 1.0)
    n_users, c = candidates.shape
    n_items = inter.n_items
    out = np.zeros((n_users, c), np.float32)
    # +1 dummy row (history padding points here; all-sentinel ids never match)
    idx_dev = jnp.asarray(
        np.concatenate([idx_t, np.full((1, idx_t.shape[1]), n_items, np.int32)])
    )
    cnt_dev = jnp.asarray(
        np.concatenate([cnt_t, np.zeros((1, cnt_t.shape[1]), np.float32)])
    )
    pop_dev = jnp.asarray(pop)
    counts_dev = jnp.asarray(np.concatenate([counts, np.zeros(1, np.float32)]))

    from serendipity_tpu.rec.strategies import padded_rows

    @jax.jit
    def block(hist, cand):
        valid = hist < n_items                                  # [B, T_h]
        rows_i = idx_dev[hist]                                  # [B, T_h, T]
        rows_c = cnt_dev[hist]
        q = jnp.broadcast_to(cand[:, None, :], hist.shape + (cand.shape[1],))
        cc = _search_sorted_rows(rows_i, rows_c, q)             # [B, T_h, C]
        p = (cc + mu * pop_dev[cand][:, None, :]) / (
            counts_dev[hist][:, :, None] + mu
        )
        p = jnp.where(valid[:, :, None], p, 0.0)
        denom = jnp.maximum(valid.sum(axis=1, keepdims=True), 1)
        p_mean = p.sum(axis=1) / denom
        return -jnp.log(jnp.maximum(p_mean, 1e-12))

    for s in range(0, n_users, user_block):
        e = min(s + user_block, n_users)
        hist = padded_rows(
            inter.train_indptr, inter.train_indices, np.arange(s, e), n_items
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
    top = np.take_along_axis(candidates, order[:, :cut], axis=1)
    bot = np.take_along_axis(candidates, order[:, -cut:], axis=1)
    # vectorized row sampling (fixed width `cut` for every user): Gumbel top-n
    # without replacement when the slice is wide enough, uniform draws otherwise
    if cut >= n_pos:
        def draw(rows):
            keys = rng.random((n_users, cut))
            sel = np.argpartition(keys, n_pos - 1, axis=1)[:, :n_pos]
            return np.take_along_axis(rows, sel, axis=1).astype(np.int32)
    else:
        def draw(rows):
            sel = rng.integers(0, cut, size=(n_users, n_pos))
            return np.take_along_axis(rows, sel, axis=1).astype(np.int32)
    return draw(top), draw(bot)
