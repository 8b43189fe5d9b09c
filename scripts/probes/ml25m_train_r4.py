"""ML-25M-scale training step timing with the round-4 stack (tail width 4)."""
import time
import numpy as np
import jax

from serendipity_tpu.config import ExperimentConfig, apply_overrides
from serendipity_tpu.data.synthetic import synthetic_interactions
from serendipity_tpu.train.bpr import BPRTrainer
from serendipity_tpu.train.device import build_device_data
from serendipity_tpu.train.runner import build_model

print(jax.devices(), flush=True)
inter = synthetic_interactions(162541, 59047, avg_degree=150, seed=0)
print(f"graph {inter.n_users}x{inter.n_items}, {inter.n_train} train", flush=True)
cfg = apply_overrides(
    ExperimentConfig(),
    ["model.n_layers=3", "train.batch_size=8192", "train.lr=0.001"],
)
t0 = time.time()
data = build_device_data(inter, spmm_mode=cfg.model.spmm,
                         compute_dtype=cfg.model.compute_dtype)
print(f"device data {time.time()-t0:.1f}s", flush=True)
model = build_model(cfg, inter.n_users, inter.n_items)
trainer = BPRTrainer(cfg, model, data)
state = trainer.init_state()
consts = trainer.step_consts
params, opt, key = state.params, state.opt_state, state.key
t0 = time.time()
params, opt, key, loss, _ = trainer._chunk_fn(params, opt, key, consts)
float(loss)
print(f"compile+first chunk {time.time()-t0:.1f}s", flush=True)
best = np.inf
for _ in range(3):
    t0 = time.perf_counter()
    for _ in range(4):
        params, opt, key, loss, _ = trainer._chunk_fn(params, opt, key, consts)
    float(loss)
    best = min(best, time.perf_counter() - t0)
step_s = best / (trainer.chunk * 4)
spe = step_s * -(-inter.n_train // cfg.train.batch_size)
print(f"step {step_s*1e3:.2f} ms -> {spe:.1f} s/epoch "
      f"(round 3: 107.3 s/epoch; reference cannot run this scale)", flush=True)
print("DONE", flush=True)
