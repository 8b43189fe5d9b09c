"""Dst-sharded segmented-ELL SpMM over a device mesh (shard_map + custom VJP).

Multi-chip propagation for A_hat @ E with per-chip adjacency memory ~ nnz / n_devices
— the TPU-native replacement for the reference's memory fold-split of the sparse
adjacency (`LightGCN-tf/LightGCN.py:201-213`, `code/dataloader.py:319-329`), which
splits A into row blocks so each block fits; here the row blocks live on different
chips and compute in parallel.

Layout: the single-chip segmented-ELL arrays (`ops/spmm_ell.py`) are partitioned by
DESTINATION-row owner.  Tables are row-sharded in contiguous blocks over the
flattened ('data','model') mesh axes, and every segment writes to exactly one
destination row, so each shard holds exactly the segments of its own rows:

  seg_idx [n_shards, S, W]   global source ids     P(('data','model'), None, None)
  seg_w   [n_shards, S, W]   A_hat edge values     same
  seg_dst [n_shards, S]      SHARD-LOCAL dst rows  P(('data','model'), None)

Per-shard compute: all_gather the source activations over ICI (the only collective;
O(n_src * D) per chip), structured gather + in-register reduce over W, then a local
sorted segment-sum into the shard's own rows — no psum, no scatter across shards,
segments are local by construction.  The backward pass is the same kernel on the
transpose layout (CSR-by-item IS the transpose of CSR-by-user for a bipartite
graph), wired with jax.custom_vjp so autodiff never emits a scatter-add.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from serendipity_tpu.ops.spmm_ell import build_ell

MESH_AXES = ("data", "model")


def build_sharded_ell_chunks(
    indptr: np.ndarray,
    indices: np.ndarray,
    weights: np.ndarray,
    n_dst_pad: int,
    n_src_pad: int,
    n_shards: int,
    width: int = 16,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Partition the segmented-ELL layout by destination-row owner.

    Returns (seg_idx [n_shards, S, W], seg_w [n_shards, S, W], seg_dst [n_shards, S])
    with shard-LOCAL destination ids; padding segments carry dst = rows_per_shard
    (out of range for the per-shard segment_sum, hence dropped) and source id
    n_src_pad (the appended zero row of the gathered activations).
    """
    assert n_dst_pad % n_shards == 0 and n_src_pad % n_shards == 0
    rows_per = n_dst_pad // n_shards
    ell = build_ell(indptr, indices, weights, len(indptr) - 1, n_src_pad, width,
                    pad_segments_to=1)
    n_real = int(np.sum(ell.seg_dst < len(indptr) - 1))
    dst = ell.seg_dst[:n_real]
    owner = dst // rows_per                      # sorted because dst is sorted
    bounds = np.searchsorted(owner, np.arange(n_shards + 1))
    counts = np.diff(bounds)
    s_max = max(int(counts.max(initial=0)), 1)
    s_max = ((s_max + 7) // 8) * 8

    seg_idx = np.full((n_shards, s_max, width), n_src_pad, np.int32)
    seg_w = np.zeros((n_shards, s_max, width), np.float32)
    seg_dst = np.full((n_shards, s_max), rows_per, np.int32)
    for s in range(n_shards):
        lo, hi = bounds[s], bounds[s + 1]
        c = hi - lo
        if c:
            seg_idx[s, :c] = ell.seg_idx[lo:hi]
            seg_w[s, :c] = ell.seg_w[lo:hi]
            seg_dst[s, :c] = dst[lo:hi] - s * rows_per
    return seg_idx, seg_w, seg_dst


def _apply_sharded(mesh: Mesh, x, seg_idx, seg_w, seg_dst, rows_local: int):
    def local(x_blk, si, sw, sd):
        x_full = jax.lax.all_gather(x_blk, MESH_AXES, axis=0, tiled=True)
        x_pad = jnp.concatenate(
            [x_full, jnp.zeros((1, x_full.shape[1]), x_full.dtype)], axis=0
        )
        gathered = x_pad[si[0]]                                  # [S, W, D]
        part = jnp.einsum(
            "swd,sw->sd", gathered, sw[0].astype(x_full.dtype),
            preferred_element_type=x_full.dtype,
        )
        return jax.ops.segment_sum(
            part, sd[0], num_segments=rows_local, indices_are_sorted=True
        )

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(MESH_AXES, None),
            P(MESH_AXES, None, None),
            P(MESH_AXES, None, None),
            P(MESH_AXES, None),
        ),
        out_specs=P(MESH_AXES, None),
        check_vma=False,
    )(x, seg_idx, seg_w, seg_dst)


def place_chunks(mesh: Mesh, chunks):
    """device_put a (seg_idx, seg_w, seg_dst) triple with its mesh shardings."""
    if isinstance(chunks[0], jax.Array):
        return chunks
    sharding3 = NamedSharding(mesh, P(MESH_AXES, None, None))
    sharding2 = NamedSharding(mesh, P(MESH_AXES, None))
    return (
        jax.device_put(chunks[0], sharding3),
        jax.device_put(chunks[1], sharding3),
        jax.device_put(chunks[2], sharding2),
    )


def _bind_sharded(consts, mesh: Mesh, rows_out: int, rows_in: int) -> Callable:
    """Operator closure from ((fwd chunks), (bwd chunks)); callable on tracers so
    jitted code passes the chunk arrays as arguments — required both for compile
    hygiene and for multi-controller runs (`ops/spmm_common`)."""
    fwd, bwd = consts

    @jax.custom_vjp
    def f(x):
        return _apply_sharded(mesh, x, *fwd, rows_out)

    def f_fwd(x):
        return f(x), None

    def f_bwd(_res, g):
        return (_apply_sharded(mesh, g, *bwd, rows_in),)

    f.defvjp(f_fwd, f_bwd)
    return f


def make_sharded_spmm(mesh: Mesh, fwd_chunks, bwd_chunks,
                      n_dst_pad: int, n_src_pad: int) -> Callable:
    """A-matvec closure: x [n_src_pad, D] row-sharded -> out [n_dst_pad, D]
    row-sharded; VJP applies the transpose layout (`bwd_chunks`)."""
    n_shards = int(np.prod([mesh.shape[a] for a in MESH_AXES]))
    fwd = place_chunks(mesh, fwd_chunks)
    bwd = place_chunks(mesh, bwd_chunks)
    return _bind_sharded(
        (fwd, bwd), mesh, n_dst_pad // n_shards, n_src_pad // n_shards
    )


def _bind_sharded_pair(consts, mesh: Mesh, rows_u: int, rows_i: int):
    ui_c, iu_c = consts
    return (
        _bind_sharded(ui_c, mesh, rows_u, rows_i),
        _bind_sharded(iu_c, mesh, rows_i, rows_u),
    )


def split_sharded_bipartite_spmm(
    mesh: Mesh,
    inter,
    weights_by_user: np.ndarray,
    weights_by_item: np.ndarray,
    n_users_pad: int,
    n_items_pad: int,
    width: int = 16,
):
    """SplitSpmm for the dst-sharded (user<-items, item<-users) op pair,
    dst-sharded over the full mesh.  Mirrors `ops/spmm_ell.make_bipartite_spmm`,
    including the true-transpose weight handling for asymmetric operators."""
    from functools import partial

    from serendipity_tpu.ops.spmm_common import SplitSpmm
    from serendipity_tpu.ops.spmm_ell import csr_order_perms

    n_shards = int(np.prod([mesh.shape[a] for a in MESH_AXES]))
    ui = build_sharded_ell_chunks(
        inter.train_indptr, inter.train_indices, weights_by_user,
        n_users_pad, n_items_pad, n_shards, width,
    )
    iu = build_sharded_ell_chunks(
        inter.train_indptr_by_item, inter.train_indices_by_item, weights_by_item,
        n_items_pad, n_users_pad, n_shards, width,
    )
    ui, iu = place_chunks(mesh, ui), place_chunks(mesh, iu)
    perm, inv = csr_order_perms(inter)
    if np.array_equal(weights_by_user[perm], weights_by_item):
        ui_t, iu_t = iu, ui
    else:
        ui_t = place_chunks(mesh, build_sharded_ell_chunks(
            inter.train_indptr_by_item, inter.train_indices_by_item,
            weights_by_user[perm], n_items_pad, n_users_pad, n_shards, width,
        ))
        iu_t = place_chunks(mesh, build_sharded_ell_chunks(
            inter.train_indptr, inter.train_indices, weights_by_item[inv],
            n_users_pad, n_items_pad, n_shards, width,
        ))
    return SplitSpmm(
        consts=(((ui, ui_t), (iu, iu_t))),
        bind=partial(
            _bind_sharded_pair, mesh=mesh,
            rows_u=n_users_pad // n_shards, rows_i=n_items_pad // n_shards,
        ),
    )


def make_sharded_bipartite_spmm(
    mesh: Mesh,
    inter,
    weights_by_user: np.ndarray,
    weights_by_item: np.ndarray,
    n_users_pad: int,
    n_items_pad: int,
    width: int = 16,
) -> Tuple[Callable, Callable]:
    """Eagerly-bound form of `split_sharded_bipartite_spmm` (outside-jit use)."""
    return split_sharded_bipartite_spmm(
        mesh, inter, weights_by_user, weights_by_item,
        n_users_pad, n_items_pad, width,
    ).ops()
