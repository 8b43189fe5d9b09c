"""Mesh-sharded serendipity-study stages: the user axis fans out over devices.

The study pipeline (candidate scoring, ser1 acc/dif, ser2, DPP re-ranking) is
embarrassingly parallel across users — the reference fans the same loops out over
host processes (`ProcessPoolExecutor` at `recommend.py:419-431`, `Pool(32)` at
`utils.py:271-287`).  The TPU-native equivalent is `shard_map` over the flattened
device mesh: each device runs the SAME blocked kernels as the single-chip path
(`rec/strategies.py`, `rec/serendipity.py`, `rec/dpp.py`) on its contiguous user
slice, with the item table, embeddings, and CSR column arrays replicated and the
per-user CSR offsets decomposed into (start, degree) arrays that shard with the
users.  No collectives are needed inside a stage; outputs come back row-sharded
and are reassembled by the host slice.

Parity: tests/test_study_sharded.py checks every stage against the single-chip
path on the 8-device CPU mesh (identical to float tolerance — same kernels, same
block schedule, different devices).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from serendipity_tpu.rec.strategies import (
    loop_user_blocks,
    max_sim_chunked,
    padded_rows_start_deg,
)


def flat_axes(mesh: Mesh) -> Tuple[str, ...]:
    return tuple(mesh.axis_names)


def mesh_devices(mesh: Mesh) -> int:
    return int(np.prod(list(mesh.shape.values())))


def pad_users(arr: np.ndarray, mult: int, fill=0) -> np.ndarray:
    """Pad axis 0 to a multiple of `mult` with `fill` rows."""
    n = arr.shape[0]
    target = ((n + mult - 1) // mult) * mult
    if target == n:
        return arr
    pad = np.full((target - n,) + arr.shape[1:], fill, dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def csr_start_deg(indptr: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-row (start, degree) int32 arrays — the user-shardable CSR offsets."""
    ptr = np.asarray(indptr, np.int64)
    return ptr[:-1].astype(np.int32), np.diff(ptr).astype(np.int32)


@partial(
    jax.jit,
    static_argnames=("mesh", "n_items", "h_max", "block"),
)
def raw_and_maxsim_sharded(
    mesh: Mesh,
    eu: jnp.ndarray,            # [U_pad, D]   row-sharded
    ei_pad: jnp.ndarray,        # [N+1, D]     replicated
    cand: jnp.ndarray,          # [U_pad, C]   row-sharded
    tr_start: jnp.ndarray,      # [U_pad]      row-sharded
    tr_deg: jnp.ndarray,        # [U_pad]
    tr_idx: jnp.ndarray,        # [nnz]        replicated
    n_items: int,
    h_max: int,
    block: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sharded `strategies._raw_and_maxsim_all`: (raw dots, train max-sim)."""
    axes = flat_axes(mesh)

    def local(eu_l, cand_l, tr_s, tr_d, ei_pad, tr_idx):
        u_local = eu_l.shape[0]

        def blk(rows):
            ce = ei_pad[cand_l[rows]]
            raw = jnp.einsum(
                "bd,bcd->bc", eu_l[rows], ce, preferred_element_type=jnp.float32
            )
            hist = padded_rows_start_deg(
                tr_s[rows], tr_d[rows], tr_idx, h_max, n_items
            )
            ms = max_sim_chunked(ce, hist, ei_pad, n_items)
            return raw, ms

        out = loop_user_blocks(blk, u_local, block=min(block, u_local))
        return jax.tree.map(lambda x: x[:u_local], out)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(axes, None), P(axes, None), P(axes), P(axes), P(), P(),
        ),
        out_specs=(P(axes, None), P(axes, None)),
        check_vma=False,
    )(eu, cand, tr_start, tr_deg, ei_pad, tr_idx)


@partial(
    jax.jit,
    static_argnames=("mesh", "n_items", "h_te", "h_tr", "block"),
)
def acc_dif_sharded(
    mesh: Mesh,
    mat_rec: jnp.ndarray,       # [U_pad, K] row-sharded
    ei_pad: jnp.ndarray,
    te_start: jnp.ndarray, te_deg: jnp.ndarray, te_idx: jnp.ndarray,
    tr_start: jnp.ndarray, tr_deg: jnp.ndarray, tr_idx: jnp.ndarray,
    n_items: int, h_te: int, h_tr: int, block: int = 8192,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sharded `serendipity._acc_dif_device`: (test max-sim, train max-sim)."""
    axes = flat_axes(mesh)

    def local(rec_l, te_s, te_d, tr_s, tr_d, ei_pad, te_idx, tr_idx):
        u_local = rec_l.shape[0]

        def blk(rows):
            rec_emb = ei_pad[rec_l[rows]]
            te = padded_rows_start_deg(te_s[rows], te_d[rows], te_idx, h_te, n_items)
            tr = padded_rows_start_deg(tr_s[rows], tr_d[rows], tr_idx, h_tr, n_items)
            return (
                max_sim_chunked(rec_emb, te, ei_pad, n_items),
                max_sim_chunked(rec_emb, tr, ei_pad, n_items),
            )

        out = loop_user_blocks(blk, u_local, block=min(block, u_local))
        return jax.tree.map(lambda x: x[:u_local], out)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(axes, None), P(axes), P(axes), P(axes), P(axes), P(), P(), P(),
        ),
        out_specs=(P(axes, None), P(axes, None)),
        check_vma=False,
    )(mat_rec, te_start, te_deg, tr_start, tr_deg, ei_pad, te_idx, tr_idx)


@partial(
    jax.jit,
    static_argnames=("mesh", "n_items", "h_tr", "block"),
)
def ser2_sharded(
    mesh: Mesh,
    mat_rec: jnp.ndarray,       # [U_pad, K] row-sharded
    pm_sorted: jnp.ndarray,     # [U_pad, M] row-sharded, rows sorted asc
    ei_pad: jnp.ndarray,
    tr_start: jnp.ndarray, tr_deg: jnp.ndarray, tr_idx: jnp.ndarray,
    ii_min: jnp.ndarray,
    n_items: int, h_tr: int, block: int = 8192,
) -> jnp.ndarray:
    """Sharded `serendipity._ser2_device` -> [U_pad]."""
    from serendipity_tpu.rec.serendipity import _membership_sorted_rows

    axes = flat_axes(mesh)

    def local(rec_l, pm_l, tr_s, tr_d, ei_pad, tr_idx, ii_min):
        u_local = rec_l.shape[0]

        def blk(rows):
            rec = rec_l[rows]
            keep = ~_membership_sorted_rows(rec, pm_l[rows])
            rec_emb = ei_pad[rec]
            tr = padded_rows_start_deg(tr_s[rows], tr_d[rows], tr_idx, h_tr, n_items)
            ms = max_sim_chunked(rec_emb, tr, ei_pad, n_items)
            cnt = keep.sum(axis=1)
            summed = (ms * keep).sum(axis=1)
            return (jnp.where(cnt > 0, summed / jnp.maximum(cnt, 1), ii_min),)

        out = loop_user_blocks(blk, u_local, block=min(block, u_local))[0]
        return out[:u_local]

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(axes, None), P(axes, None), P(axes), P(axes), P(), P(), P(),
        ),
        out_specs=P(axes),
        check_vma=False,
    )(mat_rec, pm_sorted, tr_start, tr_deg, ei_pad, tr_idx, ii_min)


@partial(jax.jit, static_argnames=("mesh", "block"))
def _minmax_sharded_jit(mesh: Mesh, eu: jnp.ndarray, ei: jnp.ndarray, block: int):
    """Global fp16-rounded (min, max) of a user-chunk over the mesh."""
    from serendipity_tpu.rec.candidates import _minmax_all

    axes = flat_axes(mesh)

    def local(eu_l, ei):
        mn_l, mx_l = _minmax_all(eu_l, ei, True, min(block, eu_l.shape[0]))
        return jax.lax.pmin(mn_l, axes), jax.lax.pmax(mx_l, axes)

    return jax.shard_map(
        local, mesh=mesh, in_specs=(P(axes, None), P()),
        out_specs=(P(), P()), check_vma=False,
    )(eu, ei)


@partial(
    jax.jit,
    static_argnames=("mesh", "k_c", "num_fold", "n_items", "h_max", "block"),
)
def _candidates_sharded_jit(
    mesh: Mesh,
    key: jnp.ndarray,
    eu: jnp.ndarray,            # [B_chunk, D]  row-sharded user chunk
    ei: jnp.ndarray,            # [N, D]        replicated
    uid: jnp.ndarray,           # [B_chunk]     global user ids, row-sharded
    tr_start: jnp.ndarray, tr_deg: jnp.ndarray, tr_idx: jnp.ndarray,
    n_keep: jnp.ndarray,        # [B_chunk] int32, row-sharded
    mn: jnp.ndarray, mx: jnp.ndarray,     # global score range (replicated)
    k_c: int, num_fold: int, n_items: int, h_max: int, block: int,
) -> jnp.ndarray:
    """Sharded stratified sampling for one user chunk.  Per-user keyed
    priorities make the result identical to the single-chip path; the stage is
    host-chunked like the single-chip path (multi-minute single dispatches
    crash tunneled workers)."""
    from serendipity_tpu.rec.candidates import _block_candidates

    axes = flat_axes(mesh)

    def local(key, eu_l, uid_l, tr_s, tr_d, nk_l, mn, mx, ei, tr_idx):
        u_local = eu_l.shape[0]

        def blk(rows):
            hist = padded_rows_start_deg(
                tr_s[rows], tr_d[rows], tr_idx, h_max, n_items
            )
            b = rows.shape[0]
            train_mask = (
                jnp.zeros((b, n_items + 1), jnp.bool_)
                .at[jnp.arange(b)[:, None], hist]
                .set(True)[:, :n_items]
            )
            return (
                _block_candidates(
                    key, eu_l[rows], ei, uid_l[rows], train_mask, nk_l[rows],
                    mn, mx, k_c, num_fold, n_items,
                ),
            )

        out = loop_user_blocks(blk, u_local, block=min(block, u_local))[0]
        return out[:u_local]

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(), P(axes, None), P(axes), P(axes), P(axes), P(axes),
            P(), P(), P(), P(),
        ),
        out_specs=P(axes, None),
        check_vma=False,
    )(key, eu, uid, tr_start, tr_deg, n_keep, mn, mx, ei, tr_idx)


def candidates_sharded(
    mesh: Mesh,
    key: jnp.ndarray,
    inter,
    emb_user: np.ndarray,
    emb_item: np.ndarray,
    n_keep: np.ndarray,
    *,
    k_c: int, num_fold: int, bin_eps: float, h_max: int, block: int,
    users_per_dispatch: int | None = None,
):
    """Host wrapper: chunk the user axis (each chunk clamp-padded to one common
    shape, rows duplicating the last user so min/max is unchanged) and fan each
    chunk out over the mesh.  Returns a list of per-chunk device arrays."""
    from serendipity_tpu.rec.candidates import USERS_PER_DISPATCH, _chunk_rows

    nd = mesh_devices(mesh)
    u = inter.n_users
    eu = jnp.asarray(np.asarray(emb_user, np.float32))
    ei = jnp.asarray(emb_item, jnp.float32)
    tr_s, tr_d = csr_start_deg(inter.train_indptr)
    n_keep = np.asarray(n_keep, np.int32)
    tr_idx = jnp.asarray(inter.train_indices, jnp.int32)

    per = users_per_dispatch or USERS_PER_DISPATCH
    chunk = min(-(-min(per, u) // nd) * nd, -(-u // nd) * nd)

    mns, mxs = [], []
    row_sets = []
    for s, _c in _chunk_rows(u, chunk):
        rows = np.minimum(np.arange(s, s + chunk, dtype=np.int64), u - 1)
        row_sets.append((s, _c, rows))
        a, b = _minmax_sharded_jit(mesh, eu[rows], ei, block)
        mns.append(a)
        mxs.append(b)
    mn, mx = mns[0], mxs[0]
    for a, b in zip(mns[1:], mxs[1:]):
        mn = jnp.minimum(mn, a)
        mx = jnp.maximum(mx, b)
    mx = mx + jnp.float32(bin_eps)

    out = []
    for s, c, rows in row_sets:
        part = _candidates_sharded_jit(
            mesh, key,
            eu[rows], ei,
            jnp.asarray(rows.astype(np.int32)),
            jnp.asarray(tr_s[rows]), jnp.asarray(tr_d[rows]),
            tr_idx,
            jnp.asarray(n_keep[rows]),
            mn, mx,
            k_c=k_c, num_fold=num_fold, n_items=inter.n_items, h_max=h_max,
            block=block,
        )
        out.append(part[:c])
    return out


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "k", "div_weight", "degenerate_diag", "rel_factor", "block"
    ),
)
def dpp_positions_sharded(
    mesh: Mesh,
    cand: jnp.ndarray,          # [U_pad, C] int32, row-sharded (ALL users)
    ei_unit: jnp.ndarray,       # [N, D] l2-normalized, replicated
    rel: Optional[jnp.ndarray],  # [U_pad, C] or None
    k: int,
    div_weight: float = 0.5,
    degenerate_diag: bool = False,
    rel_factor: float = 1.0,
    block: int = 256,
) -> jnp.ndarray:
    """Sharded greedy-DPP positions for ALL users in one dispatch -> [U_pad, k];
    each device loops its user slice in `block`-row chunks (the [block, C, C]
    kernel is the per-device HBM high-water mark)."""
    from serendipity_tpu.rec.dpp import dpp_select_block

    axes = flat_axes(mesh)

    def local(cand_l, ei_unit, *rel_l):
        u_local = cand_l.shape[0]
        r = rel_l[0] if rel_l else None

        def blk(rows):
            ce = ei_unit[cand_l[rows]]
            return (
                dpp_select_block(
                    ce, None if r is None else r[rows], k,
                    div_weight=div_weight, degenerate_diag=degenerate_diag,
                    rel_factor=rel_factor,
                ),
            )

        out = loop_user_blocks(blk, u_local, block=min(block, u_local))[0]
        return out[:u_local]

    args = (cand, ei_unit) + ((rel,) if rel is not None else ())
    in_specs = (P(axes, None), P()) + ((P(axes, None),) if rel is not None else ())
    return jax.shard_map(
        local, mesh=mesh, in_specs=in_specs, out_specs=P(axes, None),
        check_vma=False,
    )(*args)
