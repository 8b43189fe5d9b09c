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


def test_seren_data_pipeline_end_to_end(request):
    """DataBuilder-equivalent tensors feed the transformer end-to-end."""
    tiny = request.getfixturevalue("tiny_inter")
    from serendipity_tpu.rec.seren_data import (
        build_seren_test_batch,
        build_seren_training_batches,
        user_histories,
    )
    from serendipity_tpu.models.seren_transformer import SerenTrainer, SerenTransformer

    rng = np.random.default_rng(0)
    dim = 16
    ei = rng.standard_normal((tiny.n_items, dim)).astype(np.float32)
    hist = user_histories(tiny, ei, n_reviews=6)
    assert hist.shape == (tiny.n_users, 6, dim)
    # front padding: users with < 6 train items have zero rows first
    deg = np.diff(tiny.train_indptr)
    u_small = int(np.argmin(np.where(deg > 0, deg, 999)))
    n_hist = min(deg[u_small], 6)
    assert np.allclose(hist[u_small, : 6 - n_hist], 0.0)

    batch = build_seren_training_batches(tiny, ei, n_reviews=6, n_pos=4)
    assert batch["y_seren"].shape == (tiny.n_users, 8, dim)
    # positives are real test/train embeddings
    u = int(np.nonzero(np.diff(tiny.test_indptr) > 0)[0][0])
    te_embs = ei[tiny.test_items_of(u)]
    assert any(
        np.allclose(batch["y_seren"][u, j], e) for j in range(4) for e in te_embs
    )

    model = SerenTransformer(embed_dim=dim, n_reviews=6)
    trainer = SerenTrainer(model=model, lr=1e-3, n_pos=4)
    params, opt_state = trainer.init(jax.random.PRNGKey(0), 6, 8, dim)
    step = trainer.make_train_step()
    jb = {k: jnp.asarray(v[:16]) for k, v in batch.items()}
    params, opt_state, key, loss = step(params, opt_state, jb, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))

    test_b = build_seren_test_batch(tiny, ei, n_reviews=6, n_cand=10)
    ev = trainer.make_eval_step()
    scores = np.asarray(ev(params, jnp.asarray(test_b["history"][:8]),
                           jnp.asarray(test_b["y_cand"][:8])))
    m = SerenTrainer.ranking_metrics(scores)
    assert 0.0 <= m["hr@10"] <= 1.0


def test_seren_data_vectorized_assembly(request):
    """Round-4 vectorized assembly: histories match a per-user loop
    transliteration; negatives exclude every interacted item; positive samples
    come from the right row and are distinct when the row is large enough."""
    tiny = request.getfixturevalue("tiny_inter")
    from serendipity_tpu.rec.seren_data import (
        _resample_rows,
        sample_negatives_all,
        user_histories,
    )

    rng = np.random.default_rng(3)
    dim = 8
    ei = rng.standard_normal((tiny.n_items, dim)).astype(np.float32)
    r = 5
    hist = user_histories(tiny, ei, n_reviews=r)
    for u in range(tiny.n_users):
        items = tiny.train_items_of(u)
        if tiny.train_timestamps is not None:
            ts = tiny.train_timestamps[
                tiny.train_indptr[u]:tiny.train_indptr[u + 1]
            ]
            items = items[np.argsort(ts, kind="stable")]
        tail = items[-r:]
        ref = np.zeros((r, dim), np.float32)
        if len(tail):
            ref[r - len(tail):] = ei[tail]
        np.testing.assert_array_equal(hist[u], ref)

    negs = sample_negatives_all(tiny, 6, rng)
    for u in range(tiny.n_users):
        pos = set(tiny.train_items_of(u).tolist()) | set(
            tiny.test_items_of(u).tolist()
        )
        assert not (set(negs[u].tolist()) & pos)
        assert negs[u].min() >= 0 and negs[u].max() < tiny.n_items

    lo = tiny.train_indptr[:-1].astype(np.int64)
    deg = np.diff(tiny.train_indptr).astype(np.int64)
    n = 4
    samp = _resample_rows(tiny.train_indices.astype(np.int64), lo, deg, n, rng)
    for u in range(tiny.n_users):
        row_items = set(tiny.train_items_of(u).tolist())
        if deg[u] == 0:
            assert (samp[u] == 0).all()
            continue
        assert set(samp[u].tolist()) <= row_items
        if deg[u] >= n:
            assert len(set(samp[u].tolist())) == n  # without replacement
