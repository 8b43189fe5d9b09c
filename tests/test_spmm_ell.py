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


@pytest.mark.parametrize("adj_type", ["pre", "gcmc", "norm"])
def test_joint_spmm_matches_pair(tiny_inter, adj_type):
    """Joint (U+I)-stacked propagation must equal the pair form, fwd and grad,
    for symmetric AND asymmetric operators."""
    import jax
    import jax.numpy as jnp

    from serendipity_tpu.config import ExperimentConfig, apply_overrides
    from serendipity_tpu.models.lightgcn import init_params
    from serendipity_tpu.train.device import build_device_data
    from serendipity_tpu.train.runner import build_model

    inter = tiny_inter
    cfg = apply_overrides(
        ExperimentConfig(),
        ["model.embed_dim=16", "model.compute_dtype=float32",
         f"model.adj_type={adj_type}"],
    )
    d_pair = build_device_data(inter, adj_type=adj_type, joint=False)
    d_joint = build_device_data(inter, adj_type=adj_type, joint=True)
    model = build_model(cfg, inter.n_users, inter.n_items)
    params = init_params(jax.random.PRNGKey(0), cfg.model, inter.n_users, inter.n_items)
    up, ip_ = model.propagate(params, d_pair.adj, spmm_ops=d_pair.spmm_ops)
    uj, ij = model.propagate(params, d_joint.adj, spmm_ops=d_joint.spmm_ops)
    np.testing.assert_allclose(np.asarray(uj), np.asarray(up), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ij), np.asarray(ip_), rtol=1e-5, atol=1e-6)

    def loss(p, d):
        au, ai = model.propagate(p, d.adj, spmm_ops=d.spmm_ops)
        return jnp.sum(au * au) + jnp.sum(ai[:5] ** 3)

    g1 = jax.grad(lambda p: loss(p, d_pair))(params)
    g2 = jax.grad(lambda p: loss(p, d_joint))(params)
    for key in g1:
        np.testing.assert_allclose(
            np.asarray(g2[key]), np.asarray(g1[key]), rtol=1e-4, atol=1e-5
        )
