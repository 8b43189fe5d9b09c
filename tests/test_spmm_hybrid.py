"""Hybrid dense-head/ELL-tail SpMM (`ops/spmm_hybrid`): forward and custom-VJP
parity with the edge-list formulation across all four adjacency operators
(`LightGCN-tf/utility/load_data.py:77-146`), head-size sweep from pure-tail to
fully dense, and end-to-end propagation parity inside the model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from serendipity_tpu.graph import build_normalized_adjacency
from serendipity_tpu.ops.spmm import spmm_edges
from serendipity_tpu.ops.spmm_hybrid import (
    build_hybrid,
    choose_head_k,
    make_bipartite_hybrid_spmm,
)


def _ref_ops(adj, n_users, n_items):
    ui = lambda x: spmm_edges(  # noqa: E731
        jnp.asarray(adj.u_dst), jnp.asarray(adj.u_src), jnp.asarray(adj.u_w),
        x, n_users,
    )
    iu = lambda x: spmm_edges(  # noqa: E731
        jnp.asarray(adj.i_dst), jnp.asarray(adj.i_src), jnp.asarray(adj.i_w),
        x, n_items,
    )
    return ui, iu


@pytest.mark.parametrize("adj_type", ["pre", "plain", "gcmc", "norm"])
@pytest.mark.parametrize("head_k", [8, 40, None])  # None = all items (fully dense)
def test_hybrid_matches_edges_fwd_and_grad(tiny_inter, adj_type, head_k):
    inter = tiny_inter
    adj = build_normalized_adjacency(inter, adj_type=adj_type)
    e = adj.n_edges
    k = inter.n_items if head_k is None else head_k
    ui, iu = make_bipartite_hybrid_spmm(
        inter, adj.u_w[:e], adj.i_w[:e], head_k=k, dense_dtype=jnp.float32,
        ell_width=8,
    )
    ref_ui, ref_iu = _ref_ops(adj, inter.n_users, inter.n_items)

    rng = np.random.default_rng(0)
    xi = jnp.asarray(rng.standard_normal((inter.n_items, 12)), jnp.float32)
    xu = jnp.asarray(rng.standard_normal((inter.n_users, 12)), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(ui(xi)), np.asarray(ref_ui(xi)), rtol=2e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(iu(xu)), np.asarray(ref_iu(xu)), rtol=2e-4, atol=1e-5
    )

    gu = jnp.asarray(rng.standard_normal((inter.n_users, 12)), jnp.float32)
    gi = jnp.asarray(rng.standard_normal((inter.n_items, 12)), jnp.float32)
    for op, ref, x, g in ((ui, ref_ui, xi, gu), (iu, ref_iu, xu, gi)):
        _, vjp = jax.vjp(op, x)
        _, vjp_ref = jax.vjp(ref, x)
        np.testing.assert_allclose(
            np.asarray(vjp(g)[0]), np.asarray(vjp_ref(g)[0]), rtol=2e-4, atol=1e-5
        )


def test_head_rows_disjoint_from_tail(tiny_inter):
    """Every edge of a head item must live in the dense block, none in the tail."""
    adj = build_normalized_adjacency(tiny_inter)
    e = adj.n_edges
    layout = build_hybrid(
        tiny_inter, adj.u_w[:e], adj.i_w[:e], head_k=16, dense_dtype=jnp.float32
    )
    head = set(layout.head_idx.tolist())
    # tail_iu rows (dst=item) must avoid head items entirely
    tail_rows = set(layout.tail_iu.seg_dst[layout.tail_iu.seg_dst < tiny_inter.n_items].tolist())
    assert not (head & tail_rows)
    # dense block edge count + tail edge count == nnz
    n_dense = int((np.asarray(layout.dense_iu, np.float32) != 0).sum())
    n_tail = int((layout.tail_iu.seg_w != 0).sum())
    assert n_dense + n_tail == e


def test_choose_head_k_extremes():
    # heavy concentration -> nonzero head; flat tiny degrees -> pure ELL (0)
    skewed = np.array([5000, 3000, 1000] + [1] * 500)
    assert choose_head_k(skewed, n_users=10_000, granularity=4) > 0
    flat = np.full(50, 2)
    assert choose_head_k(flat, n_users=100_000_000) == 0


@pytest.mark.parametrize("adj_type", ["pre", "norm"])
def test_model_propagation_hybrid_vs_ell(tiny_inter, adj_type):
    """Full K-layer propagation (`model.py:145-177`) agrees between spmm modes."""
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
    d_hyb = build_device_data(
        inter, adj_type=adj_type, spmm_mode="hybrid", compute_dtype="float32"
    )
    d_ell = build_device_data(inter, adj_type=adj_type, spmm_mode="ell")
    model = build_model(cfg, inter.n_users, inter.n_items)
    params = init_params(jax.random.PRNGKey(0), cfg.model, inter.n_users, inter.n_items)
    uh, ih = model.propagate(params, d_hyb.adj, spmm_ops=d_hyb.spmm_ops)
    ue, ie = model.propagate(params, d_ell.adj, spmm_ops=d_ell.spmm_ops)
    np.testing.assert_allclose(np.asarray(uh), np.asarray(ue), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ih), np.asarray(ie), rtol=1e-4, atol=1e-5)

    def loss(p, d):
        au, ai = model.propagate(p, d.adj, spmm_ops=d.spmm_ops)
        return jnp.sum(au * au) + jnp.sum(ai[:5] ** 3)

    g1 = jax.grad(lambda p: loss(p, d_hyb))(params)
    g2 = jax.grad(lambda p: loss(p, d_ell))(params)
    for key in g1:
        np.testing.assert_allclose(
            np.asarray(g1[key]), np.asarray(g2[key]), rtol=2e-4, atol=1e-5
        )
