"""Adjacency construction parity with the reference normalization.

The bundled `s_pre_adj_mat.npz` was produced by the reference's
D^-1/2 (A) D^-1/2 on mlls (`dataloader.py:349-364`); our bipartite edge-list weights
must match it entry for entry.
"""

import numpy as np
import pytest

from serendipity_tpu.graph import build_normalized_adjacency


def test_matches_bundled_pre_adj(mlls):
    sp = pytest.importorskip("scipy.sparse")
    ref = sp.load_npz("/root/reference/LightGCN-tf/Data/mlls/s_pre_adj_mat.npz").tocsr()
    adj = build_normalized_adjacency(mlls)
    n_u = mlls.n_users

    e = adj.n_edges
    # user<-item half must equal ref[:U, U:]
    ours = sp.coo_matrix(
        (adj.u_w[:e], (adj.u_dst[:e], adj.u_src[:e] + n_u)),
        shape=ref.shape,
    ).tocsr()
    ref_ui = ref[:n_u, :].tocsr()
    ours_ui = ours[:n_u, :].tocsr()
    assert (ref_ui != 0).sum() == e
    diff = abs(ref_ui - ours_ui)
    assert diff.max() < 1e-6

    # item<-user half must equal ref[U:, :U]
    ours_iu = sp.coo_matrix(
        (adj.i_w[:e], (adj.i_dst[:e] + n_u, adj.i_src[:e])),
        shape=ref.shape,
    ).tocsr()[n_u:, :]
    diff2 = abs(ref[n_u:, :].tocsr() - ours_iu)
    assert diff2.max() < 1e-6


def test_symmetry_and_padding(tiny_inter):
    adj = build_normalized_adjacency(tiny_inter, pad_multiple=256)
    e = adj.n_edges
    assert adj.n_edges_padded % 256 == 0
    # identical multiset of weighted edges in both halves
    ui = {(int(u), int(i)): float(w) for u, i, w in zip(adj.u_dst[:e], adj.u_src[:e], adj.u_w[:e])}
    iu = {(int(u), int(i)): float(w) for i, u, w in zip(adj.i_dst[:e], adj.i_src[:e], adj.i_w[:e])}
    assert ui.keys() == iu.keys()
    for k in ui:
        assert ui[k] == pytest.approx(iu[k], rel=1e-6)
    # padding is inert
    assert (adj.u_w[e:] == 0).all() and (adj.u_dst[e:] == tiny_inter.n_users).all()
    # weight formula
    du = adj.user_degrees
    di = adj.item_degrees
    for (u, i), w in list(ui.items())[:50]:
        assert w == pytest.approx(1.0 / np.sqrt(du[u] * di[i]), rel=1e-5)
