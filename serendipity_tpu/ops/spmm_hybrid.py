"""Hybrid dense-head / ELL-tail SpMM: propagation at HBM speed on skewed graphs.

The segmented-ELL formulation (`ops/spmm_ell.py`) is gather-bound: XLA's dynamic
row gather moves ~128-byte embedding rows at a few percent of HBM peak (measured
~4.7 ns/edge at gowalla scale — ~20x off the bandwidth roofline, DESIGN.md §7b).
Contiguous reads are the fast path on TPU, so this layout converts the bulk of the
edges into *dense* MXU matmuls and leaves only a thin sparse tail to the gather:

  * Interaction graphs are power-law in ITEM degree (`recommend.py`'s datasets,
    and the reference benchmarks gowalla/yelp/amazon-book): the top-K items by
    train degree carry most edges (measured: top-4096 of 40,981 items = 95.3% of
    gowalla-scale edges).  User degrees (log-normal) are NOT concentrated — so the
    trick must come from the item axis in both directions:
      - user <- items: head items are GATHER sources  -> dense  D^T @ E_i[head]
      - item <- users: head items are OUTPUT rows     -> dense  D @ E_u, scattered
        into the head rows
    Both matmuls stream the same [K, n_users] dense block from HBM at full
    bandwidth; at K=4096/gowalla scale that is ~0.3 ms vs ~2.1 ms for the pure
    gather formulation.  The MXU (idle in the gather formulation) does the FLOPs.
  * Edges incident to TAIL items (the remaining few percent) go through the
    existing segmented-ELL kernel — small enough that its per-edge gather cost no
    longer matters.
  * Backward never sees a gather: like `ops/spmm_ell.make_spmm`, each direction is
    a `jax.custom_vjp` whose cotangent applies the TRANSPOSE operator — the dense
    block transposes by swapping the contraction side of the same array, the tail
    by swapping the pre-built transpose ELL layout.

The head size K is chosen per graph by a measured-constant cost model
(`choose_head_k`); K=0 degrades to pure ELL and K=n_items to fully dense, so the
same code path covers mlls (tiny: fully dense wins) through ML-25M scale.

Semantics covered (cited for parity): the K-layer propagation hot loop
`/root/reference/lightGCN/LightGCN-PyTorch-master/code/model.py:163-171` and the
TF fold-split equivalent `/root/reference/LightGCN-tf/LightGCN.py:232-253`; the
adjacency operators come in as per-edge weights from `graph/adjacency.py`.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from serendipity_tpu.ops.spmm_ell import EllLayout, _ell_apply, build_ell, csr_order_perms

# Cost-model constants, measured on v5e (DESIGN.md §7b): sustained HBM stream
# bandwidth and the per-edge cost of the gather-bound ELL path.
_HBM_BYTES_PER_S = 8.2e11
_ELL_S_PER_EDGE = 4.7e-9
_ELL_FIXED_S = 5e-5          # segment-sum + dispatch floor per SpMM


def choose_head_k(
    item_degrees: np.ndarray,
    n_users: int,
    dense_bytes_per_elem: int = 2,
    granularity: int = 256,
) -> int:
    """Head size minimizing modeled per-SpMM time: dense [K, n_users] stream cost
    vs ELL cost of the uncovered tail edges.  Returns a multiple of `granularity`
    (or n_items when fully dense wins)."""
    n_items = len(item_degrees)
    order = np.sort(np.asarray(item_degrees, np.int64))[::-1]
    cum = np.concatenate([[0], np.cumsum(order)])
    nnz = int(cum[-1])
    best_k, best_t = 0, _ELL_S_PER_EDGE * nnz + _ELL_FIXED_S
    k = granularity
    while k < n_items + granularity:
        kk = min(k, n_items)
        tail = nnz - int(cum[kk])
        t = kk * n_users * dense_bytes_per_elem / _HBM_BYTES_PER_S
        t += (_ELL_S_PER_EDGE * tail + _ELL_FIXED_S) if tail else 0.0
        if t < best_t:
            best_k, best_t = kk, t
        k *= 2
    return best_k


@dataclass
class HybridLayout:
    """Host-built arrays for one hybrid bipartite operator pair."""

    head_idx: np.ndarray          # [K] item ids, ascending
    dense_ui: np.ndarray          # [K, n_users] user<-item weights of head edges
    dense_iu: np.ndarray          # [K, n_users] item<-user weights (may alias)
    tail_ui: Optional[EllLayout]  # dst=user, src=item, tail edges, ui weights
    tail_iu: Optional[EllLayout]  # dst=item, src=user, tail edges, iu weights
    tail_ui_t: Optional[EllLayout]  # transpose of tail_ui (dst=item, ui weights)
    tail_iu_t: Optional[EllLayout]  # transpose of tail_iu (dst=user, iu weights)
    n_users: int
    n_items: int


def _filtered_csr(dst, src, w, n_dst, keep):
    """CSR (indptr, indices, weights) over the kept edges, rows = dst."""
    d, s, ww = dst[keep], src[keep], w[keep]
    # input edge lists are sorted by dst (CSR order) and stay sorted after masking
    counts = np.bincount(d, minlength=n_dst)
    indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    return indptr, s, ww


def build_hybrid(
    inter,
    weights_by_user: np.ndarray,
    weights_by_item: np.ndarray,
    head_k: Optional[int] = None,
    dense_dtype=jnp.bfloat16,
    ell_width: int = 16,
) -> Optional[HybridLayout]:
    """Build the hybrid layout, or None when the cost model says pure ELL.

    `weights_by_user`: per-edge user<-item weights in CSR-by-user order;
    `weights_by_item`: per-edge item<-user weights in CSR-by-item order
    (same contract as `spmm_ell.make_bipartite_spmm`).
    """
    n_u, n_i = inter.n_users, inter.n_items
    item_deg = np.diff(inter.train_indptr_by_item)
    if head_k is None:
        head_k = choose_head_k(
            item_deg, n_u, dense_bytes_per_elem=jnp.dtype(dense_dtype).itemsize
        )
    if head_k <= 0:
        return None
    head_k = min(head_k, n_i)
    # top-K items by degree; ascending ids for deterministic gather/scatter
    head_idx = np.sort(np.argpartition(-item_deg, head_k - 1)[:head_k]).astype(np.int32)
    is_head = np.zeros(n_i, bool)
    is_head[head_idx] = True
    head_rank = np.full(n_i, -1, np.int64)
    head_rank[head_idx] = np.arange(head_k)

    # dense blocks from the CSR-by-item rows of head items
    users_by_i = np.repeat(
        np.arange(n_i, dtype=np.int64), np.diff(inter.train_indptr_by_item)
    )
    srcs_by_i = inter.train_indices_by_item.astype(np.int64)
    in_head_bi = is_head[users_by_i]
    rows = head_rank[users_by_i[in_head_bi]]
    cols = srcs_by_i[in_head_bi]
    dense_iu = np.zeros((head_k, n_u), np.float32)
    dense_iu[rows, cols] = weights_by_item[in_head_bi]
    perm, inv = csr_order_perms(inter)
    symmetric = np.array_equal(weights_by_user[perm], weights_by_item)
    if symmetric:
        dense_ui = dense_iu
    else:
        dense_ui = np.zeros((head_k, n_u), np.float32)
        dense_ui[rows, cols] = weights_by_user[perm][in_head_bi]

    # tail edge lists in both CSR orders
    users_by_u = np.repeat(
        np.arange(n_u, dtype=np.int64), np.diff(inter.train_indptr)
    )
    items_by_u = inter.train_indices.astype(np.int64)
    in_tail_bu = ~is_head[items_by_u]
    in_tail_bi = ~in_head_bi
    n_tail = int(in_tail_bu.sum())
    tail_ui = tail_iu = tail_ui_t = tail_iu_t = None
    if n_tail:
        p_u, s_u, w_u = _filtered_csr(
            users_by_u, items_by_u, weights_by_user, n_u, in_tail_bu
        )
        p_i, s_i, w_i = _filtered_csr(
            users_by_i, srcs_by_i, weights_by_item, n_i, in_tail_bi
        )
        tail_ui = build_ell(p_u, s_u, w_u, n_u, n_i, ell_width)
        tail_iu = build_ell(p_i, s_i, w_i, n_i, n_u, ell_width)
        if symmetric:
            tail_ui_t, tail_iu_t = tail_iu, tail_ui
        else:
            # transpose carries the forward weights in the opposite CSR order
            w_u_bi = weights_by_user[perm][in_tail_bi]
            w_i_bu = weights_by_item[inv][in_tail_bu]
            tail_ui_t = build_ell(p_i, s_i, w_u_bi, n_i, n_u, ell_width)
            tail_iu_t = build_ell(p_u, s_u, w_i_bu, n_u, n_i, ell_width)

    dense_iu_c = np.asarray(dense_iu, jnp.dtype(dense_dtype))
    dense_ui_c = dense_iu_c if symmetric else np.asarray(dense_ui, jnp.dtype(dense_dtype))
    return HybridLayout(
        head_idx=head_idx,
        dense_ui=dense_ui_c,
        dense_iu=dense_iu_c,
        tail_ui=tail_ui,
        tail_iu=tail_iu,
        tail_ui_t=tail_ui_t,
        tail_iu_t=tail_iu_t,
        n_users=n_u,
        n_items=n_i,
    )


def _dev_ell(tail: Optional[EllLayout]):
    if tail is None:
        return None
    return (
        jnp.asarray(tail.seg_idx), jnp.asarray(tail.seg_w), jnp.asarray(tail.seg_dst)
    )


def _apply_to_users(x_items, head_idx, dense, tail, n_users):
    """[n_items, D] -> [n_users, D]: dense^T @ x[head] + tail-ELL."""
    head_x = x_items[head_idx]
    out = jnp.einsum(
        "ku,kd->ud", dense.astype(x_items.dtype), head_x,
        preferred_element_type=jnp.float32,
    ).astype(x_items.dtype)
    if tail is not None:
        out = out + _ell_apply(x_items, *tail, n_users)
    return out


def _apply_to_items(x_users, head_idx, dense, tail, n_items):
    """[n_users, D] -> [n_items, D]: dense @ x scattered into head rows + tail-ELL."""
    head_out = jnp.einsum(
        "ku,ud->kd", dense.astype(x_users.dtype), x_users,
        preferred_element_type=jnp.float32,
    ).astype(x_users.dtype)
    if tail is not None:
        out = _ell_apply(x_users, *tail, n_items)
    else:
        out = jnp.zeros((n_items, x_users.shape[1]), x_users.dtype)
    # head rows receive nothing from the tail (all their edges are dense), so
    # this is a disjoint row update of K sorted unique rows
    return out.at[head_idx].add(head_out)


def hybrid_consts(layout: HybridLayout) -> dict:
    """Device-array pytree for the consts-as-arguments form (`ops/spmm_common`)."""
    return {
        "hi": jnp.asarray(layout.head_idx),
        "d_ui": jnp.asarray(layout.dense_ui),
        "d_iu": jnp.asarray(layout.dense_iu),
        "t_ui": _dev_ell(layout.tail_ui),
        "t_iu": _dev_ell(layout.tail_iu),
        "t_ui_t": _dev_ell(layout.tail_ui_t),
        "t_iu_t": _dev_ell(layout.tail_iu_t),
    }


def bind_hybrid(consts: dict, n_u: int, n_i: int) -> Tuple[Callable, Callable]:
    """(user<-items op, item<-users op) closures with transpose-applying VJPs;
    callable on tracers, so jitted code can take `consts` as an argument."""
    hi, d_ui, d_iu = consts["hi"], consts["d_ui"], consts["d_iu"]
    t_ui, t_iu = consts["t_ui"], consts["t_iu"]
    t_ui_t, t_iu_t = consts["t_ui_t"], consts["t_iu_t"]

    @jax.custom_vjp
    def ui_op(x):
        return _apply_to_users(x, hi, d_ui, t_ui, n_u)

    def ui_fwd(x):
        return ui_op(x), None

    def ui_bwd(_res, g):
        # dX_items = A_ui^T @ g: head items are output rows, ui weights
        return (_apply_to_items(g, hi, d_ui, t_ui_t, n_i),)

    ui_op.defvjp(ui_fwd, ui_bwd)

    @jax.custom_vjp
    def iu_op(x):
        return _apply_to_items(x, hi, d_iu, t_iu, n_i)

    def iu_fwd(x):
        return iu_op(x), None

    def iu_bwd(_res, g):
        # dX_users = A_iu^T @ g: head items are gather sources, iu weights
        return (_apply_to_users(g, hi, d_iu, t_iu_t, n_u),)

    iu_op.defvjp(iu_fwd, iu_bwd)
    return ui_op, iu_op


def make_hybrid_spmm(layout: HybridLayout) -> Tuple[Callable, Callable]:
    """Eagerly-bound op pair (single-controller, outside-jit use)."""
    return bind_hybrid(hybrid_consts(layout), layout.n_users, layout.n_items)


def bind_hybrid_transposed(consts: dict, n_u: int, n_i: int) -> Tuple[Callable, Callable]:
    """(A_ui^T, A_iu^T) as forward closures: items<-users with the ui weights and
    users<-items with the iu weights.  The operator-SVD `rmatvec` path (ProNE
    pre-factorization, `proNE.py:37-47`) applies transposes as primal ops, so it
    needs them directly rather than through a VJP."""
    hi = consts["hi"]

    def ui_t(y):
        return _apply_to_items(y, hi, consts["d_ui"], consts["t_ui_t"], n_i)

    def iu_t(y):
        return _apply_to_users(y, hi, consts["d_iu"], consts["t_iu_t"], n_u)

    return ui_t, iu_t


def split_bipartite_hybrid_spmm(
    inter,
    weights_by_user: np.ndarray,
    weights_by_item: np.ndarray,
    head_k: Optional[int] = None,
    dense_dtype=jnp.bfloat16,
    ell_width: int = 16,
):
    """SplitSpmm (consts + bind) form; None when the cost model says pure ELL."""
    from functools import partial

    from serendipity_tpu.ops.spmm_common import SplitSpmm

    layout = build_hybrid(
        inter, weights_by_user, weights_by_item,
        head_k=head_k, dense_dtype=dense_dtype, ell_width=ell_width,
    )
    if layout is None:
        return None
    return SplitSpmm(
        consts=hybrid_consts(layout),
        bind=partial(bind_hybrid, n_u=layout.n_users, n_i=layout.n_items),
    )


def make_bipartite_hybrid_spmm(
    inter,
    weights_by_user: np.ndarray,
    weights_by_item: np.ndarray,
    head_k: Optional[int] = None,
    dense_dtype=jnp.bfloat16,
    ell_width: int = 16,
) -> Optional[Tuple[Callable, Callable]]:
    """Drop-in for `spmm_ell.make_bipartite_spmm`; None when pure ELL is cheaper."""
    split = split_bipartite_hybrid_spmm(
        inter, weights_by_user, weights_by_item,
        head_k=head_k, dense_dtype=dense_dtype, ell_width=ell_width,
    )
    return None if split is None else split.ops()
