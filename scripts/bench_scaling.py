"""Scaling-efficiency harness: sharded BPR train-step throughput vs mesh size.

Runs the FULL sharded training step (row-sharded tables, data-parallel batch) on
1..N-device meshes and reports examples/sec and scaling efficiency.  On real
multi-chip hardware this measures ICI scaling; on a single host it can be run with
virtual CPU devices (JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8)
to validate the collective paths — CPU numbers are NOT performance claims.

    python scripts/bench_scaling.py [n_users] [n_items] [batch]
"""

import sys
import time

import numpy as np


def main():
    import os

    import jax

    # The site preload initializes jax with its own platform choice before this
    # script runs, so the JAX_PLATFORMS env var alone is ignored; re-assert it
    # through the config (same trick as tests/conftest.py).
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    sys.path.insert(0, ".")
    from serendipity_tpu.config import ExperimentConfig, apply_overrides
    from serendipity_tpu.data.synthetic import synthetic_interactions
    from serendipity_tpu.parallel.mesh import make_mesh
    from serendipity_tpu.parallel.sharded import build_sharded_train_setup

    n_users = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    n_items = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 4096

    inter = synthetic_interactions(n_users, n_items, avg_degree=30, seed=0)
    cfg = apply_overrides(
        ExperimentConfig(),
        [f"train.batch_size={batch}", "model.embed_dim=64", "model.n_layers=3"],
    )

    n_dev = len(jax.devices())

    def bench(n_data, n_model):
        s = n_data * n_model
        mesh = make_mesh(n_data=n_data, n_model=n_model, devices=jax.devices()[:s])
        setup = build_sharded_train_setup(cfg, inter, mesh)
        key = jax.random.PRNGKey(0)
        params, opt, key, loss = setup.step_fn(setup.params, setup.opt_state, key)
        l0 = float(loss)  # sync; also a step-correctness signal per layout
        best = np.inf
        for _ in range(5):
            t0 = time.perf_counter()
            params, opt, key, loss = setup.step_fn(params, opt, key)
            float(loss)
            best = min(best, time.perf_counter() - t0)
        return batch / best, best, l0

    # width scaling: all-data meshes 1..N
    base = None
    for s in [x for x in (1, 2, 4, 8, 16, 32) if x <= n_dev]:
        ex_s, best, l0 = bench(s, 1)
        if base is None:
            base = ex_s
        print(
            f"devices={s}x1: {ex_s:,.0f} examples/s  "
            f"step={best*1e3:.2f}ms  scaling_eff={ex_s / (base * s):.2f}"
        )

    # factorization grid at full width: every (data, model) split of N devices
    full = []
    d = n_dev
    while d >= 1:
        full.append((d, n_dev // d))
        d //= 2
    print(f"\n(data, model) factorizations of {n_dev} devices:")
    losses = {}
    for n_data, n_model in full:
        ex_s, best, l0 = bench(n_data, n_model)
        losses[(n_data, n_model)] = l0
        print(
            f"mesh={n_data}x{n_model}: {ex_s:,.0f} examples/s  "
            f"step={best*1e3:.2f}ms  step1_loss={l0:.5f}"
        )
    l_vals = list(losses.values())
    spread = max(l_vals) - min(l_vals)
    print(f"step-1 loss spread across factorizations: {spread:.2e} "
          f"({'OK' if spread < 1e-2 else 'MISMATCH'})")


if __name__ == "__main__":
    main()
