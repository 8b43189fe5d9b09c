"""Memory-sharded embedding tables, demonstrated at a scale ONE device cannot hold.

BASELINE config #5's north star: row-sharded user/item tables across devices with
all-to-all lookup, for models whose tables (+ Adam state) exceed a single device's
memory.  Real multi-chip hardware is not available in this environment, so the
demonstration runs on the 8-virtual-device CPU mesh with the SAME code path the
TPU mesh uses (`parallel/sharded.build_sharded_train_setup`, GSPMD row-sharded
tables; `parallel/evaluator.ShardedEvaluator`; `parallel/retrieval.sharded_retrieve`
with the explicit `all_to_all` lookup) and records, from the runtime shardings,
that the FULL model state exceeds a v5e-class 16 GB HBM budget while every
per-device shard fits comfortably.

Run:  python scripts/memshard_demo.py [out_dir]   (~6 GB host RAM, ~10 min CPU)
"""

import json
import os
import sys
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from serendipity_tpu.config import ExperimentConfig, apply_overrides  # noqa: E402
from serendipity_tpu.data.synthetic import synthetic_interactions  # noqa: E402
from serendipity_tpu.parallel.evaluator import ShardedEvaluator  # noqa: E402
from serendipity_tpu.parallel.mesh import make_mesh  # noqa: E402
from serendipity_tpu.parallel.retrieval import sharded_retrieve  # noqa: E402
from serendipity_tpu.parallel.sharded import build_sharded_train_setup  # noqa: E402

DEVICE_BUDGET_BYTES = 16 << 30          # v5e-class HBM
N_USERS = 9_000_000
N_ITEMS = 3_000_000
DIM = 128
N_STEPS = 30
EVAL_USERS = 1024


def leaf_bytes(tree):
    """(total_bytes, max_per_device_bytes) over all array leaves, from the
    RUNTIME shardings (shard_shape), not a paper calculation."""
    total, per_dev = 0, 0
    for leaf in jax.tree.leaves(tree):
        if not hasattr(leaf, "sharding"):
            continue
        total += leaf.nbytes
        shard_elems = int(np.prod(leaf.sharding.shard_shape(leaf.shape)))
        per_dev += shard_elems * leaf.dtype.itemsize
    return total, per_dev


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "runs/memshard_demo"
    os.makedirs(out_dir, exist_ok=True)
    assert len(jax.devices()) == 8, jax.devices()

    t0 = time.time()
    inter = synthetic_interactions(
        N_USERS, N_ITEMS, avg_degree=4.0, seed=0, n_clusters=64
    )
    print(f"graph {inter.n_users}x{inter.n_items}, {inter.n_train} train "
          f"({time.time()-t0:.0f}s)", flush=True)

    cfg = apply_overrides(
        ExperimentConfig(),
        [
            "model.arch=mf",                 # PureMF family (`model.py:41-84`):
            f"model.embed_dim={DIM}",        # pure table model — the memory story
            "model.compute_dtype=float32",   # is the tables, not propagation
            "train.batch_size=8192",
            "train.lr=0.01",
        ],
    )
    mesh = make_mesh(n_data=1, n_model=8)
    t0 = time.time()
    setup = build_sharded_train_setup(cfg, inter, mesh)
    print(f"setup {time.time()-t0:.0f}s "
          f"(padded {setup.n_users_padded}+{setup.n_items_padded} rows)", flush=True)

    model_total, model_dev = leaf_bytes(setup.params)
    opt_total, opt_dev = leaf_bytes(setup.opt_state)
    full = model_total + opt_total
    per_dev = model_dev + opt_dev
    print(f"model+Adam state: {full/2**30:.2f} GiB total, "
          f"{per_dev/2**30:.2f} GiB/device", flush=True)
    assert full > DEVICE_BUDGET_BYTES, "demo must exceed the single-device budget"
    assert per_dev < DEVICE_BUDGET_BYTES / 4, "shards must fit with headroom"

    params, opt_state = setup.params, setup.opt_state
    key = jax.random.PRNGKey(0)
    losses = []
    t0 = time.time()
    for step in range(N_STEPS):
        params, opt_state, key, loss = setup.step_fn(params, opt_state, key)
        if step % 5 == 0 or step == N_STEPS - 1:
            losses.append((step, float(loss)))
            print(f"step {step}: loss={float(loss):.5f}", flush=True)
    train_s = time.time() - t0
    first, last = losses[0][1], losses[-1][1]
    assert last < first, "loss must decrease"

    # sharded full-catalog ranking eval on a user subset (full 9M users x 3M
    # items is a TPU-pod-scale workload; the subset exercises the identical
    # sharded scoring + merge path)
    rng = np.random.default_rng(1)
    test_users = np.nonzero(np.diff(inter.test_indptr) > 0)[0]
    subset = rng.choice(test_users, size=EVAL_USERS, replace=False)
    t0 = time.time()
    ev = ShardedEvaluator(
        setup.model, setup.data, inter, cfg.eval, mesh=mesh,
        n_items_padded=setup.n_items_padded, user_subset=subset,
    )
    metrics = ev.evaluate(params)
    eval_s = time.time() - t0
    print(f"sharded eval ({EVAL_USERS} users): {metrics} ({eval_s:.0f}s)", flush=True)

    # serving retrieval with BOTH tables sharded: explicit all-to-all user-row
    # lookup (`parallel/lookup.py`) + distributed top-k merge
    t0 = time.time()
    ids = jnp.asarray(subset[:256].astype(np.int32))
    pad_valid = jnp.arange(setup.n_items_padded) < inter.n_items
    v, idx = sharded_retrieve(
        mesh, params["user_embedding"], params["item_embedding"], ids, 20,
        item_valid=pad_valid,
    )
    serve_s = time.time() - t0
    assert np.asarray(idx).max() < inter.n_items
    print(f"sharded_retrieve 256 users: top-20 ok ({serve_s:.0f}s)", flush=True)

    report = {
        "n_users": N_USERS, "n_items": N_ITEMS, "dim": DIM,
        "n_train": int(inter.n_train),
        "state_bytes_total": int(full),
        "state_bytes_per_device": int(per_dev),
        "device_budget_bytes": DEVICE_BUDGET_BYTES,
        "exceeds_single_device": full > DEVICE_BUDGET_BYTES,
        "n_devices": 8,
        "losses": losses,
        "train_steps": N_STEPS,
        "train_s": round(train_s, 1),
        "eval_users": EVAL_USERS,
        "metrics": metrics,
        "eval_s": round(eval_s, 1),
        "serve_retrieve_s": round(serve_s, 1),
    }
    with open(os.path.join(out_dir, "report.json"), "w") as f:
        json.dump(report, f, indent=2)
    print("ALL DONE", flush=True)


if __name__ == "__main__":
    main()
