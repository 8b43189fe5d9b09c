"""Segmented-ELL SpMM: forward parity with scipy, custom-VJP gradient parity with
the autodiff of the edge-list formulation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from serendipity_tpu.graph import build_normalized_adjacency
from serendipity_tpu.ops.spmm import spmm_edges
from serendipity_tpu.ops.spmm_ell import build_ell, make_bipartite_spmm, make_spmm


def test_forward_matches_scipy(tiny_inter):
    sp = pytest.importorskip("scipy.sparse")
    adj = build_normalized_adjacency(tiny_inter)
    e = adj.n_edges
    w_by_user = adj.u_w[:e]
    w_by_item = adj.i_w[:e]
    ui_op, iu_op = make_bipartite_spmm(tiny_inter, w_by_user, w_by_item, width=8)

    rng = np.random.default_rng(0)
    xi = rng.standard_normal((tiny_inter.n_items, 12)).astype(np.float32)
    xu = rng.standard_normal((tiny_inter.n_users, 12)).astype(np.float32)
    a_ui = sp.coo_matrix(
        (w_by_user, (adj.u_dst[:e], adj.u_src[:e])),
        shape=(tiny_inter.n_users, tiny_inter.n_items),
    )
    np.testing.assert_allclose(np.asarray(ui_op(jnp.asarray(xi))), a_ui @ xi, rtol=1e-4, atol=1e-5)
    a_iu = sp.coo_matrix(
        (w_by_item, (adj.i_dst[:e], adj.i_src[:e])),
        shape=(tiny_inter.n_items, tiny_inter.n_users),
    )
    np.testing.assert_allclose(np.asarray(iu_op(jnp.asarray(xu))), a_iu @ xu, rtol=1e-4, atol=1e-5)


def test_custom_vjp_matches_autodiff(tiny_inter):
    adj = build_normalized_adjacency(tiny_inter)
    e = adj.n_edges
    ui_op, iu_op = make_bipartite_spmm(tiny_inter, adj.u_w[:e], adj.i_w[:e], width=8)

    rng = np.random.default_rng(1)
    xi = jnp.asarray(rng.standard_normal((tiny_inter.n_items, 12)).astype(np.float32))
    tangent = rng.standard_normal((tiny_inter.n_users, 12)).astype(np.float32)

    def loss_ell(x):
        return jnp.sum(ui_op(x) * tangent)

    def loss_edges(x):
        return jnp.sum(
            spmm_edges(
                jnp.asarray(adj.u_dst), jnp.asarray(adj.u_src), jnp.asarray(adj.u_w),
                x, tiny_inter.n_users,
            ) * tangent
        )

    g_ell = jax.grad(loss_ell)(xi)
    g_edges = jax.grad(loss_edges)(xi)
    np.testing.assert_allclose(np.asarray(g_ell), np.asarray(g_edges), rtol=1e-4, atol=1e-5)


def test_build_ell_layout():
    indptr = np.array([0, 3, 3, 8])
    indices = np.array([4, 1, 2, 0, 1, 2, 3, 4])
    weights = np.arange(8, dtype=np.float32) + 1
    ell = build_ell(indptr, indices, weights, n_dst=3, n_src=5, width=4, pad_segments_to=4)
    # row 0: 1 segment; row 1: 0; row 2: 2 segments
    assert list(ell.seg_dst[:3]) == [0, 2, 2]
    np.testing.assert_array_equal(ell.seg_idx[0], [4, 1, 2, 5])   # pad=5
    np.testing.assert_array_equal(ell.seg_idx[1], [0, 1, 2, 3])
    np.testing.assert_array_equal(ell.seg_idx[2], [4, 5, 5, 5])
    np.testing.assert_allclose(ell.seg_w[0], [1, 2, 3, 0])
    np.testing.assert_allclose(ell.seg_w[2], [8, 0, 0, 0])
