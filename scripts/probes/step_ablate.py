"""Train-step roofline decomposition at gowalla scale (VERDICT r3 #6).

Times, each as a scan-chunked jit matching the trainer's dispatch pattern:
  full     the real BPR step (sample + propagate + loss + bwd + adam)
  nosamp   fixed batch ids (removes the sampler)
  mf       arch=mf step (removes propagation entirely; keeps sampler+adam)
  fwd      propagation-only forward (3-layer SpMM + pool), per call
  fwdbwd   propagation forward+backward, per call
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

from serendipity_tpu.config import ExperimentConfig, apply_overrides
from serendipity_tpu.data.synthetic import synthetic_interactions
from serendipity_tpu.train.bpr import BPRTrainer
from serendipity_tpu.train.device import build_device_data, propagate_fn
from serendipity_tpu.train.runner import build_model

print(jax.devices(), flush=True)
inter = synthetic_interactions(29858, 40981, avg_degree=35, seed=0)


def timeit(fn, n=6):
    fn()
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_cfg(overrides):
    cfg = apply_overrides(
        ExperimentConfig(),
        ["model.n_layers=3", "train.batch_size=2048", "train.lr=0.001"] + overrides,
    )
    data = build_device_data(
        inter, spmm_mode=cfg.model.spmm, compute_dtype=cfg.model.compute_dtype
    )
    model = build_model(cfg, inter.n_users, inter.n_items)
    trainer = BPRTrainer(cfg, model, data)
    state = trainer.init_state()
    consts = trainer.step_consts
    params, opt, key = state.params, state.opt_state, state.key

    holder = {"p": params, "o": opt, "k": key}

    def run():
        p, o, k, loss, _ = trainer._chunk_fn(holder["p"], holder["o"], holder["k"], consts)
        holder.update(p=p, o=o, k=k)
        float(loss)

    t = timeit(run)
    return t / trainer.chunk * 1e3, (cfg, data, model, trainer)


full_ms, (cfg, data, model, trainer) = bench_cfg([])
print(f"full step: {full_ms:.3f} ms", flush=True)

mf_ms, _ = bench_cfg(["model.arch=mf"])
print(f"mf step (no propagation): {mf_ms:.3f} ms", flush=True)

bisect_ms, _ = bench_cfg(["train.sampler=bisect"])
print(f"full step, bisect sampler: {bisect_ms:.3f} ms", flush=True)

# propagation-only fwd / fwd+bwd (single dispatch, amortized over 8 passes)
prop = propagate_fn(model, data)
state = trainer.init_state()
params = state.params
consts = trainer.step_consts


def make_loop(grad):
    split = data.spmm_split

    def one(p, c):
        ops = split.bind(c)

        def f(pp):
            u, i = model.propagate(pp, data.adj, spmm_ops=ops)
            return (u.astype(jnp.float32).sum() + i.astype(jnp.float32).sum())

        if grad:
            _, g = jax.value_and_grad(f)(p)
            return g["user_embedding"].astype(jnp.float32).sum()
        return f(p)

    @jax.jit
    def loop(p, c):
        def body(t, acc):
            p2 = {k: v + acc * 1e-20 for k, v in p.items()}
            return acc + one(p2, c)

        return jax.lax.fori_loop(0, 8, body, jnp.float32(0.0))

    return lambda: float(loop(params, consts[0]))


fwd_fn = make_loop(False)
t = timeit(fwd_fn)
print(f"propagation fwd: {t/8*1e3:.3f} ms", flush=True)
fb_fn = make_loop(True)
t = timeit(fb_fn)
print(f"propagation fwd+bwd: {t/8*1e3:.3f} ms", flush=True)
print("DONE", flush=True)
