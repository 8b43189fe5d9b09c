"""head_k sweep for the ML-25M training step."""
import time
import numpy as np
import jax

import serendipity_tpu.ops.spmm_hybrid as H
from serendipity_tpu.config import ExperimentConfig, apply_overrides
from serendipity_tpu.data.synthetic import synthetic_interactions
from serendipity_tpu.train.bpr import BPRTrainer
from serendipity_tpu.train.device import build_device_data
from serendipity_tpu.train.runner import build_model

print(jax.devices(), flush=True)
inter = synthetic_interactions(162541, 59047, avg_degree=150, seed=0)
cfg = apply_overrides(
    ExperimentConfig(),
    ["model.n_layers=3", "train.batch_size=8192", "train.lr=0.001"],
)
orig = H.choose_head_k
for K in (4096, 2048, 16384):
    H.choose_head_k = lambda *a, **k: K
    data = build_device_data(inter, spmm_mode="hybrid",
                             compute_dtype=cfg.model.compute_dtype)
    model = build_model(cfg, inter.n_users, inter.n_items)
    trainer = BPRTrainer(cfg, model, data)
    state = trainer.init_state()
    consts = trainer.step_consts
    params, opt, key = state.params, state.opt_state, state.key
    params, opt, key, loss, _ = trainer._chunk_fn(params, opt, key, consts)
    float(loss)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(3):
            params, opt, key, loss, _ = trainer._chunk_fn(params, opt, key, consts)
        float(loss)
        best = min(best, time.perf_counter() - t0)
    step_s = best / (trainer.chunk * 3)
    spe = step_s * -(-inter.n_train // cfg.train.batch_size)
    print(f"K={K}: {step_s*1e3:.2f} ms/step -> {spe:.1f} s/epoch", flush=True)
    del data, trainer, state, params, opt
H.choose_head_k = orig
print("DONE", flush=True)
