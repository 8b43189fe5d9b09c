"""Gowalla-scale study refresh on the round-4 stack (train + full study)."""
import time
import numpy as np
import jax

from serendipity_tpu.config import ExperimentConfig, apply_overrides
from serendipity_tpu.data.datasets import synthesize_item_metadata
from serendipity_tpu.data.synthetic import synthetic_interactions
from serendipity_tpu.parallel.mesh import make_mesh
from serendipity_tpu.pipeline import run_study
from serendipity_tpu.train.bpr import BPRTrainer
from serendipity_tpu.train.device import build_device_data
from serendipity_tpu.train.runner import build_model

print(jax.devices(), flush=True)
inter = synthetic_interactions(29858, 40981, avg_degree=40, seed=0, n_clusters=32)
print(f"graph {inter.n_users}x{inter.n_items}, {inter.n_train} train", flush=True)
cfg = apply_overrides(
    ExperimentConfig(), ["model.n_layers=3", "train.batch_size=2048", "rec.seeds=777"]
)
data = build_device_data(inter, spmm_mode=cfg.model.spmm,
                         compute_dtype=cfg.model.compute_dtype)
model = build_model(cfg, inter.n_users, inter.n_items)
trainer = BPRTrainer(cfg, model, data)
state = trainer.init_state()
t0 = time.time()
for ep in range(20):
    state, loss, _ = trainer.train_epoch(state)
print(f"20 epochs in {time.time()-t0:.1f}s (loss {loss:.4f})", flush=True)
from serendipity_tpu.train.device import propagate_fn
eu, ei = propagate_fn(model, data)(state.params)
eu = np.asarray(eu, np.float32)[: inter.n_users]
ei = np.asarray(ei, np.float32)[: inter.n_items]
synthesize_item_metadata(inter, seed=0)

t0 = time.time()
out = run_study(
    inter, eu, ei, cfg, out_dir="/root/repo/runs/synth_gowalla_study_r4",
    fusion_specs=[(("acc", "nov"), (0.5, 0.5)), (("acc", "div"), (0.5, 0.5))],
    mesh=make_mesh(1, 1),
)
print(f"STUDY WALL {time.time()-t0:.1f}s", flush=True)
print(np.round(out["mean"], 3), flush=True)
print("ALL DONE", flush=True)
