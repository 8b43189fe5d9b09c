"""Train-step roofline decomposition at ML-25M shape (VERDICT r4 #1).

The gowalla-shape treatment (`step_ablate.py`) never ran at the flagship scale,
leaving the 71.5 ms step unattributed against its ~43 ms modeled stream bound.
Treatments (each timed as the trainer's own scan-chunked dispatch or an
8-pass amortized jit):

  full       the real BPR step (sample + propagate + loss + bwd + adam)
  mf         arch=mf (no propagation; isolates sampler + loss + adam)
  fwd        propagation-only forward (3 layers x 2 directions)
  fwdbwd     propagation forward + backward
  head-only  fwd with the tail-ELL pass dropped (dense streams alone)
  tail-only  fwd with the dense blocks zero-sized K=128 stub (ELL dominates)
  headk swp  full step at head_k in {2048, 4096, 8192(model), 16384}

plus the modeled per-component bytes from the ACTUAL bound layout
(`bench._train_bytes_model`) so achieved GB/s is comparable to BENCH fields.
Reference semantics being timed: the K-layer propagation hot loop
`lightGCN/LightGCN-PyTorch-master/code/model.py:163-171`.
"""
import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

ap = argparse.ArgumentParser()
ap.add_argument("--skip-sweep", action="store_true")
args = ap.parse_args()

from serendipity_tpu.config import ExperimentConfig, apply_overrides
from serendipity_tpu.data.synthetic import synthetic_interactions
from serendipity_tpu.train.bpr import BPRTrainer
from serendipity_tpu.train.device import build_device_data, propagate_fn
from serendipity_tpu.train.runner import build_model

print(jax.devices(), flush=True)
inter = synthetic_interactions(162541, 59047, avg_degree=150, seed=0)
print(f"graph {inter.n_users}x{inter.n_items}, {inter.n_train} train", flush=True)


def timeit(fn, n=5):
    fn()
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def bench_cfg(overrides, head_k=None):
    cfg = apply_overrides(
        ExperimentConfig(),
        ["model.n_layers=3", "train.batch_size=8192", "train.lr=0.001"] + overrides,
    )
    data = build_device_data(
        inter, spmm_mode=cfg.model.spmm, compute_dtype=cfg.model.compute_dtype,
        head_k=head_k,
    )
    model = build_model(cfg, inter.n_users, inter.n_items)
    trainer = BPRTrainer(cfg, model, data)
    state = trainer.init_state()
    consts = trainer.step_consts
    holder = {"p": state.params, "o": state.opt_state, "k": state.key}

    def run():
        p, o, k, loss, _ = trainer._chunk_fn(
            holder["p"], holder["o"], holder["k"], consts
        )
        holder.update(p=p, o=o, k=k)
        float(loss)

    t = timeit(run)
    return t / trainer.chunk * 1e3, (cfg, data, model, trainer)


full_ms, (cfg, data, model, trainer) = bench_cfg([])
if data.spmm_split is not None and "d_ui" in data.spmm_split.consts:
    c = data.spmm_split.consts
    k_head, u = c["d_ui"].shape
    tail_slots = sum(
        int(c[k][0].size) for k in ("t_ui", "t_iu") if c[k] is not None
    )
    print(f"layout: head_k={k_head}, dense [K,U] bf16 = "
          f"{k_head*u*2/2**30:.2f} GiB/block, tail slots={tail_slots}", flush=True)
import sys
sys.path.insert(0, "/root/repo")
from bench import _train_bytes_model

bytes_model = _train_bytes_model(data, cfg, inter.n_users, inter.n_items)
print(f"full step: {full_ms:.2f} ms; modeled bytes/step "
      f"{bytes_model/2**30:.2f} GiB -> achieved {bytes_model/full_ms/1e6:.0f} GB/s",
      flush=True)

mf_ms, _ = bench_cfg(["model.arch=mf"])
print(f"mf step (no propagation): {mf_ms:.2f} ms", flush=True)


def make_loop(grad, consts_override=None, d=None):
    d = d or data
    split = d.spmm_split
    cc = consts_override if consts_override is not None else trainer.step_consts[0]

    def one(p, c):
        ops = split.bind(c)

        def f(pp):
            u, i = model.propagate(pp, d.adj, spmm_ops=ops)
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

    params = trainer.init_state().params
    return lambda: float(loop(params, cc))


t = timeit(make_loop(False))
print(f"propagation fwd: {t/8*1e3:.2f} ms", flush=True)
t = timeit(make_loop(True))
print(f"propagation fwd+bwd: {t/8*1e3:.2f} ms", flush=True)

# head-only: drop the tail-ELL pass from the bound consts (timing probe —
# results are numerically wrong, traffic is the dense streams alone)
consts0 = trainer.step_consts[0]
if "t_ui" in consts0:
    head_only = dict(consts0)
    for k in ("t_ui", "t_iu", "t_ui_t", "t_iu_t"):
        head_only[k] = None
    t = timeit(make_loop(False, consts_override=head_only))
    print(f"propagation fwd, head-only (no tail ELL): {t/8*1e3:.2f} ms", flush=True)
    t = timeit(make_loop(True, consts_override=head_only))
    print(f"propagation fwd+bwd, head-only: {t/8*1e3:.2f} ms", flush=True)

if not args.skip_sweep:
    for hk in (2048, 4096, 16384):
        try:
            ms, _ = bench_cfg([], head_k=hk)
            print(f"full step @ head_k={hk}: {ms:.2f} ms", flush=True)
        except Exception as e:
            print(f"head_k={hk} failed: {e}", flush=True)
print("DONE", flush=True)
