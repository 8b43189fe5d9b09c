"""Sparse adjacency propagation (SpMM) for TPU.

Replaces `torch.sparse.mm` (`model.py:163-171`) and the TF 100-fold
`tf.sparse_tensor_dense_matmul` loop (`LightGCN.py:232-253`).  The fold split existed
only to bound GPU memory; on TPU the natural formulation is a weighted gather +
`segment_sum` over a static, padded edge list, which XLA lowers to a fused
gather / scatter-add pipeline that is HBM-bandwidth bound (the speed of light for this
op at LightGCN sparsity levels — there is no MXU win to be had when rows average
tens of nonzeros).

`lightgcn_propagate` implements the exact `computer()` semantics
(`model.py:145-177`): K propagation steps over the symmetric normalized bipartite
adjacency, then the mean over layer outputs (including layer 0).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def spmm_edges(
    dst: jnp.ndarray,
    src: jnp.ndarray,
    w: jnp.ndarray,
    x: jnp.ndarray,
    num_rows: int,
) -> jnp.ndarray:
    """out[d] = sum_{e: dst[e]=d} w[e] * x[src[e]]  for d in [0, num_rows).

    `dst` must be sorted ascending (pad entries = num_rows are dropped), which lets XLA
    use the fast sorted-segment path.  x: [n_src, D] -> out: [num_rows, D].
    """
    gathered = x[src] * w[:, None].astype(x.dtype)
    return jax.ops.segment_sum(
        gathered, dst, num_segments=num_rows, indices_are_sorted=True
    )


def lightgcn_propagate(
    user_emb: jnp.ndarray,
    item_emb: jnp.ndarray,
    u_dst: jnp.ndarray,
    u_src: jnp.ndarray,
    u_w: jnp.ndarray,
    i_dst: jnp.ndarray,
    i_src: jnp.ndarray,
    i_w: jnp.ndarray,
    n_layers: int,
    edge_keep: Optional[jnp.ndarray] = None,
    self_u: Optional[jnp.ndarray] = None,
    self_i: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """K-layer LightGCN propagation + mean-pool over layers.

    Semantics of `LightGCN.computer()` (`model.py:145-177`) on the bipartite split:
    each step maps (u_k, i_k) -> (A_ui @ i_k, A_iu @ u_k); the result is the mean of
    all K+1 per-layer embeddings.  `edge_keep` (float mask, already rescaled by
    1/keep_prob) implements sparse edge dropout (`model.py:125-134`,
    `LightGCN.py:364-374`); the same mask is applied to both halves so the dropped
    operator stays symmetric.
    """
    if edge_keep is not None:
        u_w = u_w * edge_keep
        i_w = i_w * edge_keep
    n_users = user_emb.shape[0]
    n_items = item_emb.shape[0]

    u_acc, i_acc = user_emb, item_emb
    u_cur, i_cur = user_emb, item_emb
    for _ in range(n_layers):
        u_nxt = spmm_edges(u_dst, u_src, u_w, i_cur, n_users)
        i_nxt = spmm_edges(i_dst, i_src, i_w, u_cur, n_items)
        if self_u is not None:
            # diagonal of the normalized operator (adj_type="norm" self loops)
            u_nxt = u_nxt + self_u[:, None] * u_cur
            i_nxt = i_nxt + self_i[:, None] * i_cur
        u_cur, i_cur = u_nxt, i_nxt
        u_acc = u_acc + u_cur
        i_acc = i_acc + i_cur
    inv = 1.0 / (n_layers + 1)
    return u_acc * inv, i_acc * inv
