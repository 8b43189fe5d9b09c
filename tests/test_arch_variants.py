"""NGCF / GCN / GCMC / MF variants: shapes, trainability, and semantic checks
(`LightGCN-tf/LightGCN.py:255-340` capability coverage)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from serendipity_tpu.config import ExperimentConfig, apply_overrides
from serendipity_tpu.models.lightgcn import init_params
from serendipity_tpu.train.bpr import BPRTrainer
from serendipity_tpu.train.device import build_device_data
from serendipity_tpu.train.runner import build_model


@pytest.mark.parametrize("arch,out_mult", [
    # gcmc collects only the K per-layer MLP outputs — no ego term
    # (`LightGCN.py:328`: all_embeddings = [])
    ("mf", 1), ("lightgcn", 1), ("gcn", 3), ("gcmc", 2), ("ngcf", 3),
])
def test_propagate_shapes(arch, out_mult, tiny_inter):
    cfg = apply_overrides(
        ExperimentConfig(),
        [f"model.arch={arch}", "model.embed_dim=8", "model.n_layers=2"],
    )
    data = build_device_data(tiny_inter)
    model = build_model(cfg, tiny_inter.n_users, tiny_inter.n_items)
    params = init_params(
        jax.random.PRNGKey(0), cfg.model, tiny_inter.n_users, tiny_inter.n_items
    )
    # concat archs emit (n_layers+1) * D features (`LightGCN.py:291-293` concat)
    all_u, all_i = model.propagate(params, data.adj)
    assert all_u.shape == (tiny_inter.n_users, 8 * out_mult)
    assert all_i.shape == (tiny_inter.n_items, 8 * out_mult)
    assert np.isfinite(np.asarray(all_u)).all()


@pytest.mark.parametrize("arch", ["mf", "gcn", "gcmc", "ngcf"])
def test_variant_trains(arch, tiny_inter):
    cfg = apply_overrides(
        ExperimentConfig(),
        [
            f"model.arch={arch}", "model.embed_dim=8", "model.n_layers=2",
            "train.batch_size=64", "train.lr=0.01",
        ],
    )
    data = build_device_data(tiny_inter)
    model = build_model(cfg, tiny_inter.n_users, tiny_inter.n_items)
    trainer = BPRTrainer(cfg, model, data)
    state = trainer.init_state()
    losses = []
    for _ in range(4):
        state, loss, _ = trainer.train_epoch(state)
        losses.append(loss)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_ngcf_weights_exist(tiny_inter):
    cfg = apply_overrides(ExperimentConfig(), ["model.arch=ngcf", "model.n_layers=2"])
    params = init_params(jax.random.PRNGKey(0), cfg.model, 10, 20)
    for k in range(2):
        for name in ("w_gc", "w_bi", "w_mlp", "b_gc", "b_bi", "b_mlp"):
            assert f"{name}_{k}" in params


def test_mf_matches_plain_tables(tiny_inter):
    """MF propagation is the identity on the tables (`model.py:41-84`)."""
    cfg = apply_overrides(ExperimentConfig(), ["model.arch=mf", "model.embed_dim=8"])
    data = build_device_data(tiny_inter)
    model = build_model(cfg, tiny_inter.n_users, tiny_inter.n_items)
    params = init_params(jax.random.PRNGKey(1), cfg.model, tiny_inter.n_users, tiny_inter.n_items)
    all_u, all_i = model.propagate(params, data.adj)
    # identity up to the compute-dtype cast (bf16 default)
    np.testing.assert_allclose(
        np.asarray(all_u, np.float32), np.asarray(params["user_embedding"]),
        rtol=1e-2, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(all_i, np.float32), np.asarray(params["item_embedding"]),
        rtol=1e-2, atol=1e-4,
    )


def _dense_operator(inter, adj_type):
    """Numpy transliteration of `create_adj_mat` (`load_data.py:108-146`) over the
    full (U+I)x(U+I) block matrix."""
    n = inter.n_users + inter.n_items
    A = np.zeros((n, n))
    u, i = inter.train_user_item_pairs()
    A[u, inter.n_users + i] = 1.0
    A[inter.n_users + i, u] = 1.0
    if adj_type == "plain":
        return A
    if adj_type == "norm":
        M = A + np.eye(n)
    else:
        M = A
    deg = M.sum(1)
    if adj_type == "pre":
        with np.errstate(divide="ignore"):
            dinv = np.power(deg, -0.5)
        dinv[np.isinf(dinv)] = 0.0
        return np.diag(dinv) @ A @ np.diag(dinv)
    with np.errstate(divide="ignore"):
        dinv = np.power(deg, -1.0)
    dinv[np.isinf(dinv)] = 0.0
    return np.diag(dinv) @ M


@pytest.mark.parametrize("adj_type", ["pre", "plain", "norm", "gcmc"])
def test_adj_type_propagation_vs_dense(adj_type, tiny_inter):
    """One LightGCN hop under each adjacency operator == dense (U+I) matmul."""
    from serendipity_tpu.models.lightgcn import EmbeddingModel

    nu, ni, d = tiny_inter.n_users, tiny_inter.n_items, 8
    data = build_device_data(tiny_inter, adj_type=adj_type, use_ell=False)
    model = EmbeddingModel(
        arch="lightgcn", n_users=nu, n_items=ni, embed_dim=d, n_layers=1,
        compute_dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    params = {
        "user_embedding": jnp.asarray(rng.normal(size=(nu, d)), jnp.float32),
        "item_embedding": jnp.asarray(rng.normal(size=(ni, d)), jnp.float32),
    }
    all_u, all_i = model.propagate(params, data.adj)

    Ahat = _dense_operator(tiny_inter, adj_type)
    x0 = np.concatenate([params["user_embedding"], params["item_embedding"]])
    x1 = Ahat @ x0
    want = (x0 + x1) / 2.0
    np.testing.assert_allclose(np.asarray(all_u), want[:nu], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(all_i), want[nu:], rtol=1e-4, atol=1e-5)


def test_adj_type_norm_ell_path(tiny_inter):
    """The segmented-ELL fast path must apply the self-loop diagonal too."""
    data_ell = build_device_data(tiny_inter, adj_type="norm", use_ell=True)
    data_ref = build_device_data(tiny_inter, adj_type="norm", use_ell=False)
    cfg = apply_overrides(
        ExperimentConfig(),
        ["model.embed_dim=8", "model.n_layers=2", "model.compute_dtype=float32",
         "model.adj_type=norm"],
    )
    model = build_model(cfg, tiny_inter.n_users, tiny_inter.n_items)
    params = init_params(
        jax.random.PRNGKey(0), cfg.model, tiny_inter.n_users, tiny_inter.n_items
    )
    u1, i1 = model.propagate(params, data_ell.adj, spmm_ops=data_ell.spmm_ops)
    u2, i2 = model.propagate(params, data_ref.adj)
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u2), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(i1), np.asarray(i2), rtol=1e-4, atol=1e-6)


def _leaky(x):
    return np.where(x > 0, x, 0.2 * x)


@pytest.mark.parametrize("arch", ["gcn", "gcmc", "ngcf"])
def test_weighted_variants_vs_dense_transliteration(arch, tiny_inter):
    """ngcf/gcn/gcmc recurrences == numpy transliterations of the TF formulas
    (`LightGCN.py:255-340`), on the dense (U+I) operator."""
    nu, ni = tiny_inter.n_users, tiny_inter.n_items
    cfg = apply_overrides(
        ExperimentConfig(),
        [f"model.arch={arch}", "model.embed_dim=8", "model.n_layers=2",
         "model.compute_dtype=float32"],
    )
    data = build_device_data(tiny_inter, use_ell=False)
    model = build_model(cfg, nu, ni)
    params = init_params(jax.random.PRNGKey(3), cfg.model, nu, ni)
    all_u, all_i = model.propagate(params, data.adj)

    Ahat = _dense_operator(tiny_inter, "pre")
    ego = np.concatenate(
        [np.asarray(params["user_embedding"]), np.asarray(params["item_embedding"])]
    ).astype(np.float64)
    outs = [] if arch == "gcmc" else [ego]
    cur = ego
    for k in range(2):
        side = Ahat @ cur
        w1, b1 = np.asarray(params[f"w_gc_{k}"]), np.asarray(params[f"b_gc_{k}"])
        if arch == "gcn":
            cur = _leaky(side @ w1 + b1)
            outs.append(cur)
        elif arch == "gcmc":
            cur = _leaky(side @ w1 + b1)
            wm, bm = np.asarray(params[f"w_mlp_{k}"]), np.asarray(params[f"b_mlp_{k}"])
            outs.append(cur @ wm + bm)
        else:  # ngcf
            w2, b2 = np.asarray(params[f"w_bi_{k}"]), np.asarray(params[f"b_bi_{k}"])
            cur = _leaky(side @ w1 + b1) + _leaky((cur * side) @ w2 + b2)
            # tf.math.l2_normalize clamps the SQUARED norm at 1e-12: rows with
            # norm < 1e-6 are damped, not unit-normalized
            outs.append(cur / np.sqrt(np.maximum((cur ** 2).sum(1, keepdims=True), 1e-12)))
    want = np.concatenate(outs, axis=1)
    got = np.concatenate([np.asarray(all_u), np.asarray(all_i)])
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)
