"""End-to-end multi-chip training path: dst-sharded ELL SpMM correctness (fwd +
true-transpose VJP), sharded-evaluator parity with the dense evaluator, and a
sharded fit through BPRTrainer (the `mesh.data_axis/model_axis` CLI path)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from serendipity_tpu.config import ExperimentConfig, apply_overrides
from serendipity_tpu.graph.adjacency import build_normalized_adjacency
from serendipity_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def mesh42():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(n_data=4, n_model=2)


def _dense_blocks(inter, adj_type="pre"):
    adj = build_normalized_adjacency(inter, adj_type=adj_type)
    e = adj.n_edges
    a_ui = sp.coo_matrix(
        (adj.u_w[:e], (adj.u_dst[:e], adj.u_src[:e])),
        shape=(inter.n_users, inter.n_items),
    ).toarray()
    a_iu = sp.coo_matrix(
        (adj.i_w[:e], (adj.i_dst[:e], adj.i_src[:e])),
        shape=(inter.n_items, inter.n_users),
    ).toarray()
    return adj, a_ui, a_iu


@pytest.mark.parametrize("adj_type", ["pre", "gcmc"])
def test_sharded_spmm_matches_dense(mesh42, tiny_inter, adj_type):
    from serendipity_tpu.ops.spmm_ell_sharded import make_sharded_bipartite_spmm

    inter = tiny_inter
    adj, a_ui, a_iu = _dense_blocks(inter, adj_type)
    e = adj.n_edges
    up = ((inter.n_users + 7) // 8) * 8
    ip = ((inter.n_items + 7) // 8) * 8
    ui_op, iu_op = make_sharded_bipartite_spmm(
        mesh42, inter, adj.u_w[:e], adj.i_w[:e], up, ip
    )
    rng = np.random.default_rng(0)
    x = np.zeros((ip, 8), np.float32)
    x[: inter.n_items] = rng.standard_normal((inter.n_items, 8))
    y = jax.jit(ui_op)(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(y)[: inter.n_users], a_ui @ x[: inter.n_items],
        rtol=1e-5, atol=1e-5,
    )
    assert np.allclose(np.asarray(y)[inter.n_users:], 0)

    # VJP must apply the true transpose (A_ui^T, not A_iu — they differ for gcmc)
    g = rng.standard_normal((up, 8)).astype(np.float32)
    gr = jax.grad(lambda xx: jnp.sum(ui_op(xx) * g))(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(gr)[: inter.n_items], a_ui.T @ g[: inter.n_users],
        rtol=1e-4, atol=1e-5,
    )


def test_unsharded_ell_transpose_gradients_gcmc(tiny_inter):
    """The single-chip ELL custom VJP must also use A^T for asymmetric operators
    (`gcmc` = D^-1 A: the item<-users block is NOT the transpose of user<-items)."""
    from serendipity_tpu.ops.spmm_ell import make_bipartite_spmm

    inter = tiny_inter
    adj, a_ui, a_iu = _dense_blocks(inter, "gcmc")
    e = adj.n_edges
    ui_op, iu_op = make_bipartite_spmm(inter, adj.u_w[:e], adj.i_w[:e])
    rng = np.random.default_rng(1)
    x = rng.standard_normal((inter.n_items, 8)).astype(np.float32)
    g = rng.standard_normal((inter.n_users, 8)).astype(np.float32)
    gr = jax.grad(lambda xx: jnp.sum(ui_op(xx) * g))(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(gr), a_ui.T @ g, rtol=1e-4, atol=1e-5)
    xu = rng.standard_normal((inter.n_users, 8)).astype(np.float32)
    gi = rng.standard_normal((inter.n_items, 8)).astype(np.float32)
    gr2 = jax.grad(lambda xx: jnp.sum(iu_op(xx) * gi))(jnp.asarray(xu))
    np.testing.assert_allclose(np.asarray(gr2), a_iu.T @ gi, rtol=1e-4, atol=1e-5)


def _sharded_pieces(cfg, inter, mesh):
    from serendipity_tpu.parallel.sharded import build_sharded_device_data

    return build_sharded_device_data(cfg, inter, mesh)


def test_sharded_evaluator_matches_dense(mesh42, tiny_inter):
    """ShardedEvaluator (row-sharded item table, local top-k + all-gather merge)
    must reproduce the dense Evaluator's metrics on the same embeddings."""
    from serendipity_tpu.parallel.evaluator import ShardedEvaluator
    from serendipity_tpu.train.device import build_device_data
    from serendipity_tpu.train.evaluator import Evaluator
    from serendipity_tpu.train.runner import build_model

    inter = tiny_inter
    cfg = apply_overrides(
        ExperimentConfig(),
        ["model.embed_dim=16", "model.compute_dtype=float32", "eval.user_batch=32"],
    )
    data_dense = build_device_data(inter)
    model_dense = build_model(cfg, inter.n_users, inter.n_items)
    data_sh, model_sh, up, ip = _sharded_pieces(cfg, inter, mesh42)

    rng = np.random.default_rng(2)
    eu = rng.standard_normal((inter.n_users, 16)).astype(np.float32)
    ei = rng.standard_normal((inter.n_items, 16)).astype(np.float32)
    eu_pad = np.pad(eu, ((0, up - inter.n_users), (0, 0)))
    ei_pad = np.pad(ei, ((0, ip - inter.n_items), (0, 0)))

    ev = Evaluator(model_dense, data_dense, inter, cfg.eval)
    dense = ev.evaluate(None, all_emb=(jnp.asarray(eu), jnp.asarray(ei)))
    sev = ShardedEvaluator(
        model_sh, data_sh, inter, cfg.eval, mesh=mesh42, n_items_padded=ip
    )
    sharded = sev.evaluate(
        None, all_emb=(jnp.asarray(eu_pad), jnp.asarray(ei_pad))
    )
    for k, v in dense.items():
        assert sharded[k] == pytest.approx(v, rel=1e-5), k
    # AUC path with padded rows excluded
    auc_d = ev.evaluate_auc(None, all_emb=(jnp.asarray(eu), jnp.asarray(ei)))
    auc_s = sev.evaluate_auc(
        None, all_emb=(jnp.asarray(eu_pad), jnp.asarray(ei_pad))
    )
    assert auc_s == pytest.approx(auc_d, rel=1e-5)


def test_sharded_fit_end_to_end(mesh42, tiny_inter, tmp_path):
    """run_training with mesh axes >1: trains, evaluates sharded, early-stops,
    exports real-sized embeddings, and the loss decreases."""
    from serendipity_tpu.train.runner import run_training

    cfg = apply_overrides(
        ExperimentConfig(),
        [
            "mesh.data_axis=4", "mesh.model_axis=2",
            "model.embed_dim=16", "model.n_layers=2",
            "model.compute_dtype=float32",
            "train.batch_size=66",           # deliberately not divisible by n_data
            "train.epochs=6", "train.eval_every=2", "train.patience=2",
            "train.scan_chunk=4", "eval.user_batch=32",
            f"out_dir={tmp_path}",
        ],
    )
    res = run_training(cfg, inter=tiny_inter, log_fn=lambda m: None)
    hist = res["history"]
    losses = [h["loss"] for h in hist]
    assert losses[-1] < losses[0]
    assert res["emb_user"].shape == (tiny_inter.n_users, 16)
    assert res["emb_item"].shape == (tiny_inter.n_items, 16)
    assert any("recall@20" in h for h in hist)
    assert 0.0 <= res["record"]["recall@20"] <= 1.0


def test_sharded_fit_trajectory_matches_mesh_layouts(tiny_inter):
    """Same padded shapes + keys on 8x1 vs 2x4 meshes give the same loss path
    (mesh layout must not change the math, only the placement)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from serendipity_tpu.parallel.sharded import build_sharded_train_setup

    cfg = apply_overrides(
        ExperimentConfig(),
        ["train.batch_size=64", "model.embed_dim=16", "model.n_layers=2",
         "model.compute_dtype=float32"],
    )
    traj = {}
    for n_data, n_model in ((8, 1), (2, 4)):
        mesh = make_mesh(n_data=n_data, n_model=n_model)
        setup = build_sharded_train_setup(cfg, tiny_inter, mesh, pad_multiple=8)
        p, o, k = setup.params, setup.opt_state, jax.random.PRNGKey(7)
        losses = []
        for _ in range(10):
            p, o, k, loss = setup.step_fn(p, o, k)
            losses.append(float(loss))
        traj[(n_data, n_model)] = losses
    np.testing.assert_allclose(traj[(8, 1)], traj[(2, 4)], rtol=1e-4, atol=1e-6)


def test_sharded_evaluator_loo_matches_dense(mesh42, tiny_inter):
    """eval.protocol=loo through the sharded evaluator equals the dense path."""
    from serendipity_tpu.parallel.evaluator import ShardedEvaluator
    from serendipity_tpu.train.device import build_device_data
    from serendipity_tpu.train.evaluator import Evaluator
    from serendipity_tpu.train.runner import build_model

    inter = tiny_inter
    cfg = apply_overrides(
        ExperimentConfig(),
        ["model.embed_dim=16", "model.compute_dtype=float32",
         "eval.user_batch=32", "eval.protocol=loo"],
    )
    data_dense = build_device_data(inter)
    model_dense = build_model(cfg, inter.n_users, inter.n_items)
    data_sh, model_sh, up, ip = _sharded_pieces(cfg, inter, mesh42)
    rng = np.random.default_rng(3)
    eu = rng.standard_normal((inter.n_users, 16)).astype(np.float32)
    ei = rng.standard_normal((inter.n_items, 16)).astype(np.float32)
    eu_pad = np.pad(eu, ((0, up - inter.n_users), (0, 0)))
    ei_pad = np.pad(ei, ((0, ip - inter.n_items), (0, 0)))
    dense = Evaluator(model_dense, data_dense, inter, cfg.eval).evaluate(
        None, all_emb=(jnp.asarray(eu), jnp.asarray(ei))
    )
    sharded = ShardedEvaluator(
        model_sh, data_sh, inter, cfg.eval, mesh=mesh42, n_items_padded=ip
    ).evaluate(None, all_emb=(jnp.asarray(eu_pad), jnp.asarray(ei_pad)))
    assert set(dense) == set(sharded) and "hr@20" in dense
    for k, v in dense.items():
        assert sharded[k] == pytest.approx(v, rel=1e-5), k
