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
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n_dev]
    base = None
    for s in sizes:
        mesh = make_mesh(n_data=s, n_model=1, devices=jax.devices()[:s])
        setup = build_sharded_train_setup(cfg, inter, mesh)
        key = jax.random.PRNGKey(0)
        params, opt, key, loss = setup.step_fn(setup.params, setup.opt_state, key)
        float(loss)  # sync
        best = np.inf
        for _ in range(5):
            t0 = time.perf_counter()
            params, opt, key, loss = setup.step_fn(params, opt, key)
            float(loss)
            best = min(best, time.perf_counter() - t0)
        ex_s = batch / best
        if base is None:
            base = ex_s
        eff = ex_s / (base * s)
        print(
            f"devices={s}: {ex_s:,.0f} examples/s  "
            f"step={best*1e3:.2f}ms  scaling_eff={eff:.2f}"
        )


if __name__ == "__main__":
    main()
