"""Stratified candidate generation, on device.

Capability match for `create_candidates_stratification` (`recommend.py:359-452`):
score every (user, item) pair, bin scores into `num_fold` equi-width buckets using the
GLOBAL score min/max (+epsilon on max), then per user draw K_c candidates from the
non-train items with per-bucket quotas proportional to bucket sizes, and overwrite
the tail with the user's test items.

TPU-native design (round 4 — sort-free): the [U, N] score matrix is never
materialized on the host OR fully sorted on device.  One jit runs two passes as
`fori_loop`s over user blocks (compile time independent of trip count):

  pass A   global fp16 min/max of U.I^T, accumulated on device (one host sync
           for the WHOLE stage, vs one per 1024-user block in rounds 1-3 — each
           sync is a ~77 ms RPC on tunneled TPU backends);
  pass B   per block: bin scores, per-(user, bucket) quota thresholds by
           vectorized bisection on the random priorities (48 halvings resolve
           any float32 gap), one fused bisection for the fill threshold (tops
           the selection up to n_keep) and the trim threshold (caps rint-quota
           overshoot by priority), then extraction into [B, K_c] by a
           SINGLE-KEY SORT COMPACTION (round 5): admitted item ids first,
           non-admitted shifted by +N, take the first K_c sorted columns.

The round-3 implementation sorted each [B, N] block three times (argsort by
priority, rank cumsum, argsort by packing key) — at amazon-book scale those
sorts were ~300 s of the 315 s stage.  SELECTION is a threshold problem, not a
sort: selected(item) <=> priority(item) < t[bucket(item)] where t is the
quota-quantile of the bucket's priorities, found by counting passes.
COMPACTION (round 5 lesson) is the opposite: the round-4 cumsum + batched
`searchsorted` extraction was ~17 serial gather passes over [B, N] (8.6 s per
32k-user chunk at ML-25M shape) where one value sort with no gather postlude
is 1.4 s — see DESIGN.md §7e rule 3.

Sampling semantics are unchanged: with proportional (rint) quotas this draws
the reference's stratified distribution; candidates stay distinct (documented
deviation — the reference re-samples duplicates when short,
`recommend.py:314-325`).  Priorities are keyed per USER (`fold_in(key, uid)`),
so results are independent of block partitioning and identical between the
single-chip and mesh-sharded paths.

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
from serendipity_tpu.utils.aot import aot_call, gather_rows

# bisection halvings: enough to separate any two distinct float32 priorities
# in [2^-24, 1) — collisions below that are measure-zero for this use and only
# cost +-1 item at a bucket boundary
BISECT_ITERS = 48


@partial(jax.jit, static_argnames=("fp16", "block"))
def _minmax_all(eu: jnp.ndarray, ei: jnp.ndarray, fp16: bool, block: int):
    """Global (min, max) of eu @ ei.T, fori-accumulated on device."""
    n_users = eu.shape[0]
    block = min(block, max(n_users, 1))
    n_steps = -(-n_users // block)
    rows0 = jnp.arange(block, dtype=jnp.int32)

    def body(i, mnmx):
        mn, mx = mnmx
        rows = jnp.minimum(i * block + rows0, n_users - 1)
        s = eu[rows] @ ei.T
        if fp16:
            s = s.astype(jnp.float16).astype(jnp.float32)
        return jnp.minimum(mn, jnp.min(s)), jnp.maximum(mx, jnp.max(s))

    init = (jnp.float32(jnp.inf), jnp.float32(-jnp.inf))
    return jax.lax.fori_loop(0, n_steps, body, init)


USERS_PER_DISPATCH = 32768   # keep single executions well under the tunneled
                             # worker's tolerance (multi-minute dispatches crash
                             # it); dispatches pipeline, so chunking is free


def _chunk_rows(n: int, chunk: int):
    """[(start, padded_len)] host chunking; the last chunk pads by clamping."""
    return [(s, min(chunk, n - s)) for s in range(0, n, chunk)]


def _minmax_chunked(eu: jnp.ndarray, ei: jnp.ndarray, fp16: bool, block: int):
    """Global (min, max) device scalars, host-chunked over users."""

    n = eu.shape[0]
    chunk = USERS_PER_DISPATCH
    if n <= chunk:
        return aot_call(_minmax_all, (eu, ei), static=dict(fp16=fp16, block=block))
    parts = []
    for s, _c in _chunk_rows(n, chunk):
        # clamp-pad short chunks to one compiled shape (duplicate rows cannot
        # change a min/max)
        rows = np.minimum(np.arange(s, s + chunk), n - 1)
        parts.append(
            aot_call(_minmax_all, (eu[rows], ei), static=dict(fp16=fp16, block=block))
        )
    mn = parts[0][0]
    mx = parts[0][1]
    for a, b in parts[1:]:
        mn = jnp.minimum(mn, a)
        mx = jnp.maximum(mx, b)
    return mn, mx


def global_score_minmax(
    emb_user: jnp.ndarray,
    emb_item: jnp.ndarray,
    user_block: int = 1024,
    fp16: bool = True,
) -> Tuple[float, float]:
    """Global min/max of U @ I^T, blocked over users, device-accumulated.

    The reference computes the full matrix in fp16 (`recommend.py:375`); we reduce
    per block with the matmul in fp32 and optionally round through fp16 to preserve
    the reference's binning boundaries.
    """
    mn, mx = _minmax_chunked(
        jnp.asarray(emb_user, jnp.float32), jnp.asarray(emb_item, jnp.float32),
        fp16, user_block,
    )
    return float(mn), float(mx)


def _priority_rows(key: jax.Array, uids: jnp.ndarray, n_items: int) -> jnp.ndarray:
    """[B, n_items] uniform(0,1) priorities keyed per USER id — independent of
    how users are batched into blocks or sharded over devices."""
    keys = jax.vmap(lambda u: jax.random.fold_in(key, u))(uids)
    return jax.vmap(lambda k: jax.random.uniform(k, (n_items,)))(keys)


def _bucket_counts(labels: jnp.ndarray, mask: jnp.ndarray, num_fold: int):
    """[B, F] counts of `mask` cells per score bucket (fused sibling reductions)."""
    return jnp.stack(
        [jnp.sum((labels == f) & mask, axis=1) for f in range(num_fold)], axis=1
    )


def _block_candidates(
    key: jax.Array,
    user_emb_block: jnp.ndarray,     # [B, D]
    item_emb: jnp.ndarray,           # [N, D]
    uids: jnp.ndarray,               # [B] int32 GLOBAL user ids (for the RNG)
    train_mask: jnp.ndarray,         # [B, N] bool
    n_keep: jnp.ndarray,             # [B] int32: K_c - n_test(u), slots to sample
    min_dis: jnp.ndarray,            # scalars (global; max already includes +eps)
    max_dis: jnp.ndarray,
    k_c: int,
    num_fold: int,
    n_items: int,
) -> jnp.ndarray:
    """Stratified candidate sampling for one user block -> [B, k_c] (columns past
    n_keep(u) hold clamped placeholders; test items overwrite that tail later)."""
    scores = (user_emb_block @ item_emb.T).astype(jnp.float16).astype(jnp.float32)
    inter = (max_dis - min_dis) / num_fold
    labels = jnp.clip(
        jnp.floor((scores - min_dis) / inter), 0, num_fold - 1
    ).astype(jnp.int8)                                            # [B, N]
    eligible = ~train_mask

    counts = _bucket_counts(labels, eligible, num_fold).astype(jnp.float32)
    total = jnp.maximum(jnp.sum(counts, axis=1, keepdims=True), 1.0)
    # rint quotas, proportional allocation (`recommend.py:346-351`)
    quotas = jnp.round(n_keep[:, None].astype(jnp.float32) * counts / total)

    prio = _priority_rows(key, uids, n_items)
    prio = jnp.where(eligible, prio, 2.0)      # ineligible never admits (t <= 1)

    # per-(user, bucket) threshold t: smallest t with |{prio < t, bucket f}| >= q_f
    def bs_body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        cnt = jnp.stack(
            [
                jnp.sum((labels == f) & (prio < mid[:, f, None]), axis=1)
                for f in range(num_fold)
            ],
            axis=1,
        ).astype(jnp.float32)
        ge = cnt >= quotas
        return jnp.where(ge, lo, mid), jnp.where(ge, mid, hi)

    b = user_emb_block.shape[0]
    _, t_sel = jax.lax.fori_loop(
        0, BISECT_ITERS, bs_body,
        (jnp.zeros((b, num_fold)), jnp.ones((b, num_fold))),
    )
    sel = jnp.zeros_like(eligible)
    for f in range(num_fold):
        sel |= (labels == f) & (prio < t_sel[:, f, None])

    # fill threshold: top the selection up to exactly n_keep by priority among
    # the remaining eligible items (rint quotas rarely sum to n_keep exactly).
    # trim threshold: rint quotas can also OVERSHOOT n_keep (by up to
    # ~num_fold/2); cap at n_keep by keeping the n_keep LOWEST-priority selected
    # items — an unbiased drop (extraction order below is ascending item id, so
    # clipping there would systematically drop high item ids).  Fill and trim
    # are mutually exclusive per user (fill_quota > 0 <=> n_sel < n_keep, where
    # trim converges to keep-everything; overshoot => fill_quota = 0, where the
    # fill threshold converges to admit-nothing), so trim can bisect over the
    # SELECTED-only priorities independent of the fill result — both thresholds
    # resolve in ONE fori loop whose two count reductions fuse into a single
    # pass over `prio` (a separate trim loop measured ~+10 s at ML-25M scale).
    n_sel = jnp.sum(sel, axis=1).astype(jnp.float32)
    fill_quota = jnp.maximum(n_keep.astype(jnp.float32) - n_sel, 0.0)
    nk_f = n_keep.astype(jnp.float32)
    prio_fill = jnp.where(sel, 2.0, prio)     # eligible, not selected
    prio_sel = jnp.where(sel, prio, 2.0)      # selected only

    def bs_ft(_, lohi):
        lo_f, hi_f, lo_t, hi_t = lohi
        mid_f = 0.5 * (lo_f + hi_f)
        mid_t = 0.5 * (lo_t + hi_t)
        cnt_f = jnp.sum(prio_fill < mid_f[:, None], axis=1).astype(jnp.float32)
        cnt_t = jnp.sum(prio_sel < mid_t[:, None], axis=1).astype(jnp.float32)
        ge_f = cnt_f >= fill_quota
        ge_t = cnt_t >= nk_f
        return (
            jnp.where(ge_f, lo_f, mid_f), jnp.where(ge_f, mid_f, hi_f),
            jnp.where(ge_t, lo_t, mid_t), jnp.where(ge_t, mid_t, hi_t),
        )

    _, t_fill, _, t_trim = jax.lax.fori_loop(
        0, BISECT_ITERS, bs_ft,
        (jnp.zeros((b,)), jnp.ones((b,)),
         jnp.zeros((b,)), jnp.full((b,), 1.0 + 1e-6)),
    )
    admit = (sel & (prio_sel < t_trim[:, None])) | (prio_fill < t_fill[:, None])

    # extraction by single-key sort compaction (round 5): keys put admitted
    # item ids first (ascending, as before), non-admitted ids shifted by +N —
    # the first k_c sorted keys ARE the admitted ids.  6x faster than the
    # round-4 cumsum + batched-searchsorted extraction at ML-25M chunk shape
    # (1.41 vs 8.58 s per 32k users: binary search is ~17 serial gather passes
    # over [B, N], the single-key sort pipelines on-chip).  This is NOT the
    # round-3 sort regression (three chained [B, N] ARGSORTS per block); one
    # value sort with no gather postlude is the cheapest compaction measured.
    ids = jnp.broadcast_to(
        jnp.arange(n_items, dtype=jnp.int32)[None, :], admit.shape
    )
    keys = jnp.where(admit, ids, n_items + ids)
    srt = jax.lax.sort(keys, dimension=1, is_stable=False)[:, :k_c]
    # columns past the admitted count hold shifted (>= N) keys.  For users with
    # >= n_keep eligible items those are only columns >= n_keep, all
    # overwritten by the test tail; for under-filled users (eligible < n_keep)
    # columns [admitted, n_keep) also miss — repeat the user's FIRST sampled
    # candidate there (an eligible non-train item already in the list) rather
    # than a clamped arbitrary id that could be a train item.  A user with
    # zero eligible items degrades to the n_items-1 clamp as a last resort.
    first = jnp.minimum(srt[:, :1], n_items - 1)
    return jnp.where(srt < n_items, srt, first).astype(jnp.int32)


@jax.jit
def _set_tail_dev(dev, rows, cols, vals):
    """Test-tail overwrite on the device copy (`recommend.py:444-451`)."""
    return dev.at[rows, cols].set(vals)


@partial(jax.jit, static_argnames=("n", "to_u16"))
def _assemble_candidates(parts, n: int, to_u16: bool):
    """(int32 device matrix [n, K_c], narrow transfer copy) from chunk parts."""
    dev = jnp.concatenate(parts, axis=0)[:n] if len(parts) > 1 else parts[0][:n]
    return dev, (dev.astype(jnp.uint16) if to_u16 else dev)


@partial(
    jax.jit,
    static_argnames=("k_c", "num_fold", "n_items", "h_max", "block"),
)
def _candidates_chunk(
    key: jax.Array,
    eu_c: jnp.ndarray,               # [B_chunk, D] user-chunk embeddings
    ei: jnp.ndarray,                 # [N, D]
    uids: jnp.ndarray,               # [B_chunk] global user ids (RNG keying)
    tr_start: jnp.ndarray,           # [B_chunk] CSR starts (gathered)
    tr_deg: jnp.ndarray,             # [B_chunk]
    tr_idx: jnp.ndarray,             # [nnz] int32
    n_keep: jnp.ndarray,             # [B_chunk] int32
    mn: jnp.ndarray,                 # global score min (device scalar)
    mx: jnp.ndarray,                 # global score max + eps (device scalar)
    k_c: int,
    num_fold: int,
    n_items: int,
    h_max: int,
    block: int,
) -> jnp.ndarray:
    """Stratified sampling for one user chunk -> [B_chunk, k_c].

    The stage is host-chunked (`users_per_dispatch`) rather than one whole-graph
    dispatch: a multi-minute single execution crashes tunneled TPU workers at
    ML-25M scale (observed round 4), and chunked dispatches pipeline
    asynchronously anyway, so the wall cost of splitting is nil."""
    from serendipity_tpu.rec.strategies import loop_user_blocks, padded_rows_start_deg

    def blk(rows):
        hist = padded_rows_start_deg(
            tr_start[rows], tr_deg[rows], tr_idx, h_max, n_items
        )
        b = rows.shape[0]
        train_mask = (
            jnp.zeros((b, n_items + 1), jnp.bool_)
            .at[jnp.arange(b)[:, None], hist]
            .set(True)[:, :n_items]
        )
        return (
            _block_candidates(
                key, eu_c[rows], ei, uids[rows], train_mask, n_keep[rows],
                mn, mx, k_c, num_fold, n_items,
            ),
        )

    return loop_user_blocks(blk, eu_c.shape[0], block=min(block, eu_c.shape[0]))[0]


def _test_tail_indices(inter: Interactions, k_c: int):
    """(rows, cols, vals) scatter triple that writes each user's test items into
    the candidate tail slots (`recommend.py:444-451`), vectorized over the CSR."""
    n_t = np.diff(inter.test_indptr).astype(np.int64)
    nnz = int(inter.test_indptr[-1])
    rows = np.repeat(np.arange(inter.n_users), n_t)
    off = np.arange(nnz) - np.repeat(inter.test_indptr[:-1].astype(np.int64), n_t)
    cols = k_c - np.repeat(n_t, n_t) + off
    return rows, cols, np.asarray(inter.test_indices[:nnz])


def append_test_tail(out: np.ndarray, inter: Interactions, k_c: int) -> np.ndarray:
    """Overwrite tail slots with each user's test items (`recommend.py:444-451`),
    vectorized over the test CSR (the per-user Python loop cost seconds at 100k+
    users)."""
    if int(inter.test_indptr[-1]) == 0:
        return out
    rows, cols, vals = _test_tail_indices(inter, k_c)
    out[rows, cols] = vals
    return out


def create_candidates(
    inter: Interactions,
    emb_user: np.ndarray,
    emb_item: np.ndarray,
    cfg: RecConfig,
    seed: int = 0,
    user_block: int = 1024,
    mesh=None,
    return_device: bool = False,
):
    """Full candidate matrix [n_users, K_c] with test items in the tail slots.

    With `mesh`, the user axis fans out over all devices
    (`parallel/study.candidates_sharded`), matching the other study stages.
    With `return_device`, returns (host matrix, device-resident copy) — the
    copy is assembled from the per-chunk outputs already on device, so
    downstream stages skip a [U, K_c] re-upload (~13 s at ML-25M scale)."""
    k_c = cfg.n_candidates
    n_users, n_items = inter.n_users, inter.n_items
    test_deg = np.diff(inter.test_indptr).astype(np.int32)
    if (test_deg > k_c).any():
        raise ValueError("a user has more test items than K_c")
    n_keep = (k_c - test_deg).astype(np.int32)
    h_max = max(1, int(np.diff(inter.train_indptr).max()))
    key = jax.random.PRNGKey(seed)

    if mesh is not None:
        from serendipity_tpu.parallel.study import candidates_sharded

        cand_parts = candidates_sharded(
            mesh, key, inter, emb_user, emb_item, n_keep,
            k_c=k_c, num_fold=cfg.n_score_bins, bin_eps=cfg.bin_epsilon,
            h_max=h_max, block=user_block,
        )
    else:
        eu = jnp.asarray(emb_user, jnp.float32)
        ei = jnp.asarray(emb_item, jnp.float32)
        tr_idx = jnp.asarray(inter.train_indices, jnp.int32)
        starts = inter.train_indptr[:-1].astype(np.int32)
        degs = np.diff(inter.train_indptr).astype(np.int32)
        mn, mx = _minmax_chunked(eu, ei, True, min(user_block, max(n_users, 1)))
        mx = mx + jnp.float32(cfg.bin_epsilon)                   # `recommend.py:377`
        cand_parts = []
        chunk = min(USERS_PER_DISPATCH, n_users)
        for s, c in _chunk_rows(n_users, chunk):
            # pad short (last) chunks to the common size by repeating the last
            # user — keeps ONE compiled shape per dataset (each distinct shape
            # costs a full kernel compile on remote toolchains)
            rows = np.minimum(np.arange(s, s + chunk, dtype=np.int32), n_users - 1)

            cand_parts.append(
                aot_call(
                    _candidates_chunk,
                    (key, eu[rows], ei, jnp.asarray(rows),
                     jnp.asarray(starts[rows]), jnp.asarray(degs[rows]),
                     tr_idx, jnp.asarray(n_keep[rows]), mn, mx),
                    static=dict(
                        k_c=k_c, num_fold=cfg.n_score_bins, n_items=n_items,
                        h_max=h_max, block=min(user_block, chunk),
                    ),
                )[:c]
            )

    to_u16 = n_items <= np.iinfo(np.uint16).max
    if isinstance(cand_parts, list):
        parts = tuple(cand_parts)
    else:
        parts = (cand_parts,)
    # one AOT-cached jit assembles (concat + slice + narrow): first-use EAGER
    # concat/cast at [162k, 1000] shapes each cost a relay compile per process
    dev, narrow = aot_call(
        _assemble_candidates, (parts,), static=dict(n=n_users, to_u16=to_u16)
    )
    # the host copy exists for the reference's candidate.npy memoize contract
    # (`recommend.py:365-368`) and the host-side consumers; at ML-25M it is a
    # 650 MB int32 matrix moving through a ~20 MB/s tunnel (~32 s of the
    # candidates stage) — ship it as uint16 when the catalog fits (halves it)
    # astype copies (and widens); the plain-int32 branch must copy explicitly —
    # np.asarray of a jax array is a READ-ONLY view and the tail write mutates
    host = (
        np.asarray(narrow).astype(np.int32) if to_u16
        else np.array(narrow, copy=True)
    )
    out = append_test_tail(host, inter, k_c)
    if not return_device:
        return out
    if int(inter.test_indptr[-1]) > 0:
        rows, cols, vals = _test_tail_indices(inter, k_c)
        dev = aot_call(
            _set_tail_dev,
            (dev, jnp.asarray(rows.astype(np.int32)),
             jnp.asarray(cols.astype(np.int32)),
             jnp.asarray(vals.astype(np.int32))),
        )
    return out, dev
