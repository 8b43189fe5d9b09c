"""Segmented-ELL SpMM: scatter-free sparse propagation with a custom VJP.

The plain edge-list formulation (`ops/spmm.py`) costs one [nnz, D] gather plus one
[nnz, D] scatter-add per SpMM — and autodiff adds another scatter-add for the
gather's transpose.  Scatter-add is the slow path on TPU.  This layout removes it:

  * every destination row's neighbor list is cut into fixed-width segments
    (width W, padded with a dummy source row), giving arrays
        seg_idx [S, W] (source ids), seg_w [S, W], seg_dst [S]
    with S ~ nnz/W + n_dst;
  * forward:  partial[s] = sum_w seg_w[s,w] * E[seg_idx[s,w]]  (a structured batched
    gather + an in-register reduction over W), then a sorted segment-sum of only
    S partials — W times fewer scattered elements;
  * backward: dE = A^T @ dOut runs the SAME kernel on the TRANSPOSE layout (which
    the bipartite graph provides for free: the CSR-by-item half IS the transpose of
    the CSR-by-user half), wired in with jax.custom_vjp — autodiff never sees the
    gather, so no scatter-add is ever emitted.

Normalization weights are non-trainable constants; the layouts are closed over as
jit constants by `make_spmm_pair`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class EllLayout:
    """Host-built segmented-ELL arrays for one propagation direction."""

    seg_idx: np.ndarray     # [S, W] int32 source rows (pad = n_src)
    seg_w: np.ndarray       # [S, W] float32 (pad = 0)
    seg_dst: np.ndarray     # [S] int32 destination rows, sorted asc (pad = n_dst)
    n_dst: int
    n_src: int


def build_ell(
    indptr: np.ndarray,
    indices: np.ndarray,
    weights: np.ndarray,
    n_dst: int,
    n_src: int,
    width: int = 16,
    pad_segments_to: int = 256,
) -> EllLayout:
    """Vectorized host construction of the segmented layout."""
    indptr = np.asarray(indptr, np.int64)
    deg = np.diff(indptr)
    segs_per_row = -(-deg // width)
    s = int(segs_per_row.sum())
    s_pad = max(
        pad_segments_to,
        ((s + pad_segments_to - 1) // pad_segments_to) * pad_segments_to,
    )

    seg_idx = np.full((s_pad, width), n_src, np.int32)
    seg_w = np.zeros((s_pad, width), np.float32)
    seg_dst = np.full(s_pad, n_dst, np.int32)

    if len(indices):
        seg_base = np.zeros(n_dst, np.int64)
        np.cumsum(segs_per_row[:-1], out=seg_base[1:])
        off_in_row = np.arange(len(indices)) - np.repeat(indptr[:-1], deg)
        elem_seg = np.repeat(seg_base, deg) + off_in_row // width
        elem_slot = off_in_row % width
        seg_idx[elem_seg, elem_slot] = indices
        seg_w[elem_seg, elem_slot] = weights
        seg_dst[:s] = np.repeat(np.arange(n_dst, dtype=np.int32), segs_per_row)
    return EllLayout(seg_idx, seg_w, seg_dst, n_dst, n_src)


def _ell_apply(x, seg_idx, seg_w, seg_dst, n_dst):
    x_pad = jnp.concatenate([x, jnp.zeros((1, x.shape[1]), x.dtype)], axis=0)
    gathered = x_pad[seg_idx]                                   # [S, W, D]
    part = jnp.einsum(
        "swd,sw->sd", gathered, seg_w.astype(x.dtype),
        preferred_element_type=x.dtype,
    )
    return jax.ops.segment_sum(
        part, seg_dst, num_segments=n_dst, indices_are_sorted=True
    )


def _ell_dev(layout: EllLayout):
    return (
        jnp.asarray(layout.seg_idx),
        jnp.asarray(layout.seg_w),
        jnp.asarray(layout.seg_dst),
    )


def _bind_ell(consts, n_dst: int, n_src: int) -> Callable:
    """Operator closure from (fwd triple, bwd triple) — callable on tracers, so
    jitted code can pass the triples as arguments (see `ops/spmm_common`)."""
    (fi, fw, fd), (bi, bw, bd) = consts

    @jax.custom_vjp
    def f(x):
        return _ell_apply(x, fi, fw, fd, n_dst)

    def f_fwd(x):
        return f(x), None

    def f_bwd(_res, g):
        return (_ell_apply(g, bi, bw, bd, n_src),)

    f.defvjp(f_fwd, f_bwd)
    return f


def split_spmm(fwd: EllLayout, bwd: EllLayout):
    """SplitSpmm for one direction (consts-as-arguments form)."""
    from functools import partial

    from serendipity_tpu.ops.spmm_common import SplitSpmm

    return SplitSpmm(
        consts=(_ell_dev(fwd), _ell_dev(bwd)),
        bind=partial(_bind_ell, n_dst=fwd.n_dst, n_src=fwd.n_src),
    )


def make_spmm(fwd: EllLayout, bwd: EllLayout) -> Callable:
    """A-matvec closure whose VJP applies the transpose layout (`bwd`)."""
    return split_spmm(fwd, bwd).ops()


def csr_order_perms(inter) -> Tuple[np.ndarray, np.ndarray]:
    """(perm, inv): `arr_by_item = arr_by_user[perm]` and `arr_by_user = arr_by_item[inv]`.

    CSR-by-user edge order is (user asc, item asc); a stable sort on the item column
    yields (item asc, user asc) = CSR-by-item order.
    """
    perm = np.argsort(inter.train_indices, kind="stable")
    inv = np.argsort(perm, kind="stable")
    return perm, inv


def _bind_pair(consts, n_users: int, n_items: int):
    ui_c, iu_c = consts
    return (
        _bind_ell(ui_c, n_dst=n_users, n_src=n_items),
        _bind_ell(iu_c, n_dst=n_items, n_src=n_users),
    )


def split_bipartite_spmm(
    inter,
    weights_by_user: np.ndarray,
    weights_by_item: np.ndarray,
    width: int = 16,
):
    """SplitSpmm whose bind yields the (user<-items, item<-users) op pair."""
    from functools import partial

    from serendipity_tpu.ops.spmm_common import SplitSpmm

    ui, ui_t, iu, iu_t = _bipartite_layouts(
        inter, weights_by_user, weights_by_item, width
    )
    return SplitSpmm(
        consts=((_ell_dev(ui), _ell_dev(ui_t)), (_ell_dev(iu), _ell_dev(iu_t))),
        bind=partial(_bind_pair, n_users=inter.n_users, n_items=inter.n_items),
    )


def make_bipartite_spmm(
    inter,
    weights_by_user: np.ndarray,
    weights_by_item: np.ndarray,
    width: int = 16,
) -> Tuple[Callable, Callable]:
    """(user<-items op, item<-users op) for the normalized bipartite adjacency.

    `weights_by_user` are the per-edge values of the user<-items block in CSR-by-user
    order; `weights_by_item` those of the item<-users block in CSR-by-item order.
    Each op's TRANSPOSE layout carries its own forward weights reordered into the
    opposite CSR order — for the symmetric operators (pre/plain) that equals the
    other direction's weights, but for the row-normalized ones (gcmc/norm) the two
    blocks differ and the gradient needs the true A^T, not the other block.
    """
    ui, ui_t, iu, iu_t = _bipartite_layouts(
        inter, weights_by_user, weights_by_item, width
    )
    return make_spmm(ui, ui_t), make_spmm(iu, iu_t)


def _bipartite_layouts(inter, weights_by_user, weights_by_item, width):
    perm, inv = csr_order_perms(inter)
    ui = build_ell(
        inter.train_indptr, inter.train_indices, weights_by_user,
        inter.n_users, inter.n_items, width,
    )
    iu = build_ell(
        inter.train_indptr_by_item, inter.train_indices_by_item, weights_by_item,
        inter.n_items, inter.n_users, width,
    )
    if np.array_equal(weights_by_user[perm], weights_by_item):
        # symmetric operator (pre/plain): A_ui^T == A_iu, share the layouts
        ui_t, iu_t = iu, ui
    else:
        ui_t = build_ell(
            inter.train_indptr_by_item, inter.train_indices_by_item,
            weights_by_user[perm], inter.n_items, inter.n_users, width,
        )
        iu_t = build_ell(
            inter.train_indptr, inter.train_indices, weights_by_item[inv],
            inter.n_users, inter.n_items, width,
        )
    return ui, ui_t, iu, iu_t


def split_joint_spmm(
    inter,
    weights_by_user: np.ndarray,
    weights_by_item: np.ndarray,
    width: int = 16,
):
    """ONE A_hat-matvec over the joint (U+I) x (U+I) bipartite adjacency —
    the reference's actual formulation (`dataloader.py:349-364`: the block
    matrix [[0, R],[R^T, 0]] normalized as a whole).

    x is the concatenated [user; item] embedding stack (users first).  Halves
    the op count per propagation layer vs the pair form (one gather + one
    segment-sum instead of two), which XLA schedules better.  The VJP applies
    the joint transpose (identical layout for the symmetric operators)."""
    n_u = inter.n_users
    n = n_u + inter.n_items
    indptr = np.concatenate([
        inter.train_indptr,
        inter.train_indptr[-1] + inter.train_indptr_by_item[1:],
    ])
    indices = np.concatenate([
        inter.train_indices.astype(np.int64) + n_u,
        inter.train_indices_by_item.astype(np.int64),
    ])
    weights = np.concatenate([weights_by_user, weights_by_item])
    ell = build_ell(indptr, indices, weights, n, n, width)
    perm, inv = csr_order_perms(inter)
    if np.array_equal(weights_by_user[perm], weights_by_item):
        ell_t = ell
    else:
        # A^T swaps the off-diagonal blocks: the user-row block carries the
        # item->user weights read in by-user edge order, and vice versa
        w_t = np.concatenate([weights_by_item[inv], weights_by_user[perm]])
        ell_t = build_ell(indptr, indices, w_t, n, n, width)
    return split_spmm(ell, ell_t)


def make_joint_spmm(
    inter,
    weights_by_user: np.ndarray,
    weights_by_item: np.ndarray,
    width: int = 16,
) -> Callable:
    return split_joint_spmm(inter, weights_by_user, weights_by_item, width).ops()
