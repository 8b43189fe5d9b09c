"""Round-4 train-step timing at yelp2018 and amazon-book scales."""
import time
import numpy as np
import jax

from serendipity_tpu.config import ExperimentConfig, apply_overrides
from serendipity_tpu.data.synthetic import synthetic_interactions
from serendipity_tpu.train.bpr import BPRTrainer
from serendipity_tpu.train.device import build_device_data
from serendipity_tpu.train.runner import build_model

print(jax.devices(), flush=True)

def measure(name, n_u, n_i, avg, batch):
    inter = synthetic_interactions(n_u, n_i, avg_degree=avg, seed=0)
    cfg = apply_overrides(
        ExperimentConfig(),
        ["model.n_layers=3", f"train.batch_size={batch}", "train.lr=0.001"],
    )
    data = build_device_data(inter, spmm_mode=cfg.model.spmm,
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
        for _ in range(4):
            params, opt, key, loss, _ = trainer._chunk_fn(params, opt, key, consts)
        float(loss)
        best = min(best, time.perf_counter() - t0)
    step_s = best / (trainer.chunk * 4)
    spe = step_s * -(-inter.n_train // batch)
    print(f"{name}: {inter.n_train} train edges, {step_s*1e3:.2f} ms/step -> "
          f"{spe:.2f} s/epoch", flush=True)

measure("yelp2018-scale (31668x38048, batch 2048)", 31668, 38048, 49, 2048)
measure("amazon-book-scale (52643x91599, batch 8192)", 52643, 91599, 55, 8192)
print("DONE", flush=True)
