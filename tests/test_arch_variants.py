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
    ("mf", 1), ("lightgcn", 1), ("gcn", 3), ("gcmc", 3), ("ngcf", 3),
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
