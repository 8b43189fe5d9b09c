"""Fused masked full-catalog eval at ML-25M scale (162,541 users x 59,047 items)."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from serendipity_tpu.config import ExperimentConfig, apply_overrides
from serendipity_tpu.data.synthetic import synthetic_interactions
from serendipity_tpu.train.device import build_device_data
from serendipity_tpu.train.evaluator import Evaluator
from serendipity_tpu.train.runner import build_model

print(jax.devices(), flush=True)
inter = synthetic_interactions(162541, 59047, avg_degree=150, seed=0)
print(f"graph {inter.n_users}x{inter.n_items}, {inter.n_train} train", flush=True)

rng = np.random.default_rng(0)
emb = (jnp.asarray(rng.standard_normal((inter.n_users, 64)), jnp.bfloat16),
       jnp.asarray(rng.standard_normal((inter.n_items, 64)), jnp.bfloat16))

for fused in (False, True):
    cfg = apply_overrides(
        ExperimentConfig(), [f"eval.fused={'true' if fused else 'false'}"]
    )
    t0 = time.time()
    data = build_device_data(
        inter, spmm_mode="edges",
        sampler="bitmap" if fused else "bisect",
    )
    model = build_model(cfg, inter.n_users, inter.n_items)
    ev = Evaluator(model, data, inter, cfg.eval)
    print(f"fused={fused}: setup {time.time()-t0:.1f}s "
          f"(bitmap={'yes' if ev._bitmap is not None else 'no'})", flush=True)
    t0 = time.time()
    m = ev.evaluate(None, all_emb=emb)
    t_cold = time.time() - t0
    t0 = time.time()
    m2 = ev.evaluate(None, all_emb=emb)
    t_warm = time.time() - t0
    n_eval = int(np.sum(np.diff(inter.test_indptr) > 0))
    print(f"fused={fused}: cold {t_cold:.1f}s, warm {t_warm:.1f}s "
          f"({n_eval} users -> {n_eval/t_warm:.0f} users/s warm) "
          f"recall@20={m['recall@20']:.5f}", flush=True)
print("DONE", flush=True)
