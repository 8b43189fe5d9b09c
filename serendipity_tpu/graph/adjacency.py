"""Symmetric-normalized bipartite adjacency in TPU-friendly edge-list form.

The reference builds the (U+I)x(U+I) block matrix A = [[0, R], [R^T, 0]] and normalizes
A_hat = D^-1/2 A D^-1/2 (`code/dataloader.py:349-364`, cached as `s_pre_adj_mat.npz`,
and the TF `pre` adjacency `utility/load_data.py:99-146`).  A TPU port of a scipy CSR
would be pointless; instead we exploit the bipartite block structure directly:

    user_out = A_hat[:U, U:] @ item_emb      ("user <- items" half)
    item_out = A_hat[U:, :U] @ user_emb      ("item <- users" half)

Each half is one weighted gather + segment-sum over the SAME set of nnz edges, stored
twice: sorted by user (dst=user) and sorted by item (dst=item).  The per-edge weight is
w(u,i) = deg(u)^-1/2 * deg(i)^-1/2, identical in both halves, which reproduces the
reference normalization exactly (validated against the bundled `s_pre_adj_mat.npz` in
tests/test_adjacency.py).

Edges are padded to a multiple of `pad_multiple` with dst = n_rows (a dummy segment
dropped by `segment_sum(..., num_segments=n_rows)`), src = 0, w = 0, so downstream jit
shapes are static and tile-aligned.
"""

from __future__ import annotations

from dataclasses import dataclass
import numpy as np

from serendipity_tpu.data.datasets import Interactions


@dataclass
class BipartiteAdjacency:
    """Normalized adjacency as two aligned edge lists (host numpy; int32/float32)."""

    n_users: int
    n_items: int
    n_edges: int                 # true nnz per half (before padding)
    # "user <- items" half, sorted by user:
    u_dst: np.ndarray            # [E_pad] user ids (pad rows = n_users)
    u_src: np.ndarray            # [E_pad] item ids
    u_w: np.ndarray              # [E_pad] float32 weights (pad = 0)
    # "item <- users" half, sorted by item:
    i_dst: np.ndarray            # [E_pad] item ids (pad rows = n_items)
    i_src: np.ndarray            # [E_pad] user ids
    i_w: np.ndarray              # [E_pad] float32
    user_degrees: np.ndarray     # [n_users] int32 train degrees
    item_degrees: np.ndarray     # [n_items] int32
    # self-loop diagonal of the normalized (U+I)x(U+I) operator; nonzero only for
    # adj_type="norm" (row-normalized A+I, `load_data.py:142`)
    self_w_u: np.ndarray | None = None   # [n_users] float32
    self_w_i: np.ndarray | None = None   # [n_items] float32

    @property
    def n_edges_padded(self) -> int:
        return int(self.u_dst.shape[0])


def _pad_to(arr: np.ndarray, size: int, fill) -> np.ndarray:
    out = np.full(size, fill, dtype=arr.dtype)
    out[: arr.shape[0]] = arr
    return out


def build_normalized_adjacency(
    inter: Interactions, pad_multiple: int = 1024, adj_type: str = "pre"
) -> BipartiteAdjacency:
    """Edge-list adjacency for any of the reference's four operators
    (`LightGCN-tf/utility/load_data.py:77-146`, selected by `--adj_type`,
    `LightGCN.py:444-456`):

      pre    D^-1/2 A D^-1/2        (symmetric; the LightGCN default)
      plain  A                      (raw 0/1)
      gcmc   D^-1 A                 ("mean" / single-normalized, no self loop)
      norm   D'^-1 (A + I)          (row-normalized with self loops; the diagonal
                                     lands in self_w_u / self_w_i)
    """
    deg_u = np.diff(inter.train_indptr).astype(np.float64)
    deg_i = np.diff(inter.train_indptr_by_item).astype(np.float64)

    users_by_u, items_by_u = inter.train_user_item_pairs()
    users_by_i = np.repeat(
        np.arange(inter.n_items, dtype=np.int32),
        np.diff(inter.train_indptr_by_item),
    )  # these are the item (dst) ids in CSR-by-item order
    srcs_by_i = inter.train_indices_by_item

    self_w_u = self_w_i = None
    if adj_type == "pre":
        # D^-1/2 with 0 for isolated nodes (`dataloader.py:356-358`: inf -> 0)
        inv_sqrt_u = np.where(deg_u > 0, 1.0 / np.sqrt(np.maximum(deg_u, 1)), 0.0)
        inv_sqrt_i = np.where(deg_i > 0, 1.0 / np.sqrt(np.maximum(deg_i, 1)), 0.0)
        w_by_u = (inv_sqrt_u[users_by_u] * inv_sqrt_i[items_by_u]).astype(np.float32)
        w_by_i = (inv_sqrt_i[users_by_i] * inv_sqrt_u[srcs_by_i]).astype(np.float32)
    elif adj_type == "plain":
        w_by_u = np.ones(users_by_u.shape[0], dtype=np.float32)
        w_by_i = np.ones(users_by_i.shape[0], dtype=np.float32)
    elif adj_type in ("gcmc", "mean"):
        inv_u = np.where(deg_u > 0, 1.0 / np.maximum(deg_u, 1), 0.0)
        inv_i = np.where(deg_i > 0, 1.0 / np.maximum(deg_i, 1), 0.0)
        w_by_u = inv_u[users_by_u].astype(np.float32)
        w_by_i = inv_i[users_by_i].astype(np.float32)
    elif adj_type == "norm":
        inv_u = 1.0 / (deg_u + 1.0)
        inv_i = 1.0 / (deg_i + 1.0)
        w_by_u = inv_u[users_by_u].astype(np.float32)
        w_by_i = inv_i[users_by_i].astype(np.float32)
        self_w_u = inv_u.astype(np.float32)
        self_w_i = inv_i.astype(np.float32)
    else:
        raise ValueError(f"unknown adj_type {adj_type!r}")

    e = int(items_by_u.shape[0])
    e_pad = ((e + pad_multiple - 1) // pad_multiple) * pad_multiple if e else pad_multiple

    return BipartiteAdjacency(
        n_users=inter.n_users,
        n_items=inter.n_items,
        n_edges=e,
        u_dst=_pad_to(users_by_u.astype(np.int32), e_pad, inter.n_users),
        u_src=_pad_to(items_by_u.astype(np.int32), e_pad, 0),
        u_w=_pad_to(w_by_u, e_pad, 0.0),
        i_dst=_pad_to(users_by_i.astype(np.int32), e_pad, inter.n_items),
        i_src=_pad_to(srcs_by_i.astype(np.int32), e_pad, 0),
        i_w=_pad_to(w_by_i, e_pad, 0.0),
        user_degrees=deg_u.astype(np.int32),
        item_degrees=deg_i.astype(np.int32),
        self_w_u=self_w_u,
        self_w_i=self_w_i,
    )
