"""Training-loop integration tests on the virtual-CPU backend: loss decreases,
metrics improve over random, ProNE pretrain init works end-to-end, checkpoints
round-trip."""

import numpy as np
import pytest

from serendipity_tpu.config import ExperimentConfig, apply_overrides
from serendipity_tpu.models.prone import prone_embeddings
from serendipity_tpu.train.bpr import BPRTrainer
from serendipity_tpu.train.device import build_device_data
from serendipity_tpu.train.evaluator import Evaluator
from serendipity_tpu.train.runner import build_model


@pytest.fixture(scope="module")
def small_cfg():
    cfg = ExperimentConfig()
    return apply_overrides(
        cfg,
        [
            "model.embed_dim=16", "model.n_layers=2", "train.batch_size=128",
            "train.epochs=5", "train.eval_every=2", "train.lr=0.05",
            "eval.user_batch=64",
        ],
    )


def test_bpr_training_loss_decreases(small_cfg, tiny_inter):
    data = build_device_data(tiny_inter)
    model = build_model(small_cfg, tiny_inter.n_users, tiny_inter.n_items)
    trainer = BPRTrainer(small_cfg, model, data)
    state = trainer.init_state()
    losses = []
    for _ in range(5):
        state, loss, _ = trainer.train_epoch(state)
        losses.append(loss)
    assert losses[-1] < losses[0]
    assert all(np.isfinite(losses))


def test_fit_with_eval_and_early_stop(small_cfg, tiny_inter):
    data = build_device_data(tiny_inter)
    model = build_model(small_cfg, tiny_inter.n_users, tiny_inter.n_items)
    trainer = BPRTrainer(small_cfg, model, data)
    evaluator = Evaluator(model, data, tiny_inter, small_cfg.eval)
    state = trainer.init_state()
    state = trainer.fit(state, evaluator, log_fn=lambda s: None)
    final = evaluator.evaluate(state.params)
    # random data has no learnable signal; assert the machinery: evals happened,
    # history recorded, best-params tracking consistent, metrics finite
    assert np.isfinite(final["recall@20"]) and final["recall@20"] >= 0
    assert len(state.history) > 0
    evals = [h for h in state.history if "recall@20" in h]
    assert evals, "periodic evaluation never ran"
    assert state.best_metric == pytest.approx(
        max(h["recall@20"] for h in evals), abs=1e-9
    )


def test_prone_pretrain_init(small_cfg, tiny_inter):
    """The `--pretrain` capability (`model.py:107-118`, `LightGCN.py:168-180`):
    ProNE embeddings seed the trainable tables."""
    from serendipity_tpu.config import ProNEConfig

    emb_u, emb_i = prone_embeddings(tiny_inter, ProNEConfig(dim=16), seed=0)
    data = build_device_data(tiny_inter)
    model = build_model(small_cfg, tiny_inter.n_users, tiny_inter.n_items)
    trainer = BPRTrainer(small_cfg, model, data)
    state = trainer.init_state(pretrained=(emb_u, emb_i))
    np.testing.assert_allclose(
        np.asarray(state.params["user_embedding"]), emb_u, rtol=1e-6
    )
    state, loss, _ = trainer.train_epoch(state)
    assert np.isfinite(loss)


def test_checkpoint_roundtrip(small_cfg, tiny_inter, tmp_path):
    from serendipity_tpu.train.checkpoint import restore_checkpoint, save_checkpoint

    data = build_device_data(tiny_inter)
    model = build_model(small_cfg, tiny_inter.n_users, tiny_inter.n_items)
    trainer = BPRTrainer(small_cfg, model, data)
    state = trainer.init_state()
    state, _, _ = trainer.train_epoch(state)
    state.best_metric = 0.123
    save_checkpoint(str(tmp_path / "ckpt"), state)

    state2 = trainer.init_state()
    state2 = restore_checkpoint(str(tmp_path / "ckpt"), state2)
    assert state2.epoch == 1
    assert state2.best_metric == pytest.approx(0.123)
    np.testing.assert_allclose(
        np.asarray(state2.params["user_embedding"]),
        np.asarray(state.params["user_embedding"]),
        rtol=1e-6,
    )
    # resumed training continues
    state2, loss, _ = trainer.train_epoch(state2)
    assert np.isfinite(loss) and state2.epoch == 2


def test_runner_checkpoint_resume(small_cfg, tiny_inter, tmp_path):
    """`train.checkpoint=true` saves on improving evals; `train.resume=true`
    restores and continues from the recorded epoch (reference `--load 1`)."""
    from serendipity_tpu.config import apply_overrides
    from serendipity_tpu.train.runner import run_training

    cfg = apply_overrides(
        small_cfg,
        [f"out_dir={tmp_path}", "data.name=tiny", "train.checkpoint=true",
         "train.epochs=4", "train.eval_every=1", "train.patience=100"],
    )
    out1 = run_training(cfg, inter=tiny_inter, log_fn=lambda s: None)
    assert (tmp_path / "tiny" / "ckpt").is_dir()

    logs = []
    cfg2 = apply_overrides(cfg, ["train.resume=true", "train.epochs=6"])
    out2 = run_training(cfg2, inter=tiny_inter, log_fn=logs.append)
    assert any("resumed from" in ln for ln in logs)
    # resumed run continues past the first run's final epoch, never restarts at 0
    epochs = [h["epoch"] for h in out2["history"]]
    assert epochs and min(epochs) > 1
    assert out2["state"].best_metric >= out1["state"].best_metric - 1e-9


def test_eval_protocol_validated(small_cfg):
    """A typo'd eval.protocol must raise, not silently run foldout (ADVICE r4)."""
    from serendipity_tpu.config import apply_overrides

    with pytest.raises(ValueError, match="protocol"):
        apply_overrides(small_cfg, ["eval.protocol=LOO"])
    cfg = apply_overrides(small_cfg, ["eval.protocol=loo"])
    assert cfg.eval.protocol == "loo"


def test_multi_cutoff_eval(small_cfg, tiny_inter):
    """Cumulative metric vectors serve several cutoffs from one pass."""
    from serendipity_tpu.config import apply_overrides

    cfg = apply_overrides(small_cfg, ["eval.topks=(5, 10, 20)"])
    data = build_device_data(tiny_inter)
    model = build_model(cfg, tiny_inter.n_users, tiny_inter.n_items)
    trainer = BPRTrainer(cfg, model, data)
    ev = Evaluator(model, data, tiny_inter, cfg.eval)
    m = ev.evaluate(trainer.init_state().params)
    for k in (5, 10, 20):
        assert f"recall@{k}" in m and f"ndcg@{k}" in m
    # recall is monotone in k
    assert m["recall@5"] <= m["recall@10"] <= m["recall@20"]


def test_bitmap_budget_fallback(tiny_inter):
    """A train bitmap over the budget falls back to the bisection sampler
    (None bitmap) instead of allocating GBs of HBM."""
    from serendipity_tpu.train.device import build_device_data

    data = build_device_data(tiny_inter, bitmap_budget_bytes=1)
    assert data.train_bitmap is None
    data2 = build_device_data(tiny_inter)
    assert data2.train_bitmap is not None
