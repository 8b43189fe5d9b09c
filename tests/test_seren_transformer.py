"""SerenEnhance-equivalent transformer re-ranker: shape/training/metric tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from serendipity_tpu.models.seren_transformer import (
    SerenTrainer,
    SerenTransformer,
    sinusoidal_positions,
)


def test_sinusoidal_positions():
    pe = sinusoidal_positions(20, 128)
    assert pe.shape == (20, 128)
    np.testing.assert_allclose(pe[0, 0::2], 0.0, atol=1e-7)   # sin(0)
    np.testing.assert_allclose(pe[0, 1::2], 1.0, atol=1e-7)   # cos(0)
    assert np.abs(pe).max() <= 1.0 + 1e-6


@pytest.fixture(scope="module")
def trained():
    dim, n_rev, n_cand, n_pos = 32, 8, 20, 10
    model = SerenTransformer(embed_dim=dim, n_reviews=n_rev)
    trainer = SerenTrainer(model=model, lr=1e-3, n_pos=n_pos)
    params, opt_state = trainer.init(jax.random.PRNGKey(0), n_rev, n_cand, dim)
    step = trainer.make_train_step()

    rng = np.random.default_rng(0)
    # learnable structure: positives near the history mean, negatives opposite
    hist = rng.standard_normal((16, n_rev, dim)).astype(np.float32)
    mean = hist.mean(axis=1, keepdims=True)
    pos = mean + 0.1 * rng.standard_normal((16, n_pos, dim)).astype(np.float32)
    neg = -mean + 0.1 * rng.standard_normal((16, n_pos, dim)).astype(np.float32)
    y = np.concatenate([pos, neg], axis=1)
    batch = {
        "history": jnp.asarray(hist),
        "y_seren": jnp.asarray(y),
        "y_rel": jnp.asarray(y),
        "y_unp": jnp.asarray(y),
    }
    key = jax.random.PRNGKey(1)
    losses = []
    for _ in range(30):
        params, opt_state, key, loss = step(params, opt_state, batch, key)
        losses.append(float(loss))
    return model, trainer, params, batch, losses


def test_training_reduces_loss(trained):
    _, _, _, _, losses = trained
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_eval_ranks_positives_first(trained):
    model, trainer, params, batch, _ = trained
    ev = trainer.make_eval_step()
    scores = np.asarray(ev(params, batch["history"], batch["y_seren"]))
    assert scores.shape == (16, 20)
    # after training, positive candidates (first half) should outscore negatives
    assert scores[:, :10].mean() > scores[:, 10:].mean()


def test_ranking_metrics():
    scores = np.array([
        [5.0, 1.0, 2.0, 3.0, 0.5],     # truth (idx 0) ranked 1st
        [1.0, 2.0, 3.0, 4.0, 5.0],     # truth ranked 5th
    ])
    m = SerenTrainer.ranking_metrics(scores, ks=(1, 5))
    assert m["hr@1"] == 0.5
    assert m["hr@5"] == 1.0
    assert 0 < m["ndcg@5"] <= 1.0
