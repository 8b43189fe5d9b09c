"""Sharded ProNE at ML-25M scale (VERDICT r4 #5): the mesh path at the node
count that motivated it (162,541 users + 59,047 items = 221,588 nodes, ~12M
edges), not just the tiny-graph parity test.

  --platform cpu   8-virtual-device CPU mesh: proves the GSPMD row-sharding of
                   the [N, dim+oversample] iterates executes at scale and
                   reports the per-device shard footprint of the sharded
                   features.
  --platform tpu   one real chip: cold + warm wall for the full pipeline, and
                   saves emb_user/item_proNE.npy for the warm-start training
                   quality run (reference `proNE.py:86-120` / `--pretrain`).
"""
import argparse
import os
import time

import numpy as np

ap = argparse.ArgumentParser()
ap.add_argument("--platform", choices=["cpu", "tpu"], default="cpu")
ap.add_argument("--users", type=int, default=162541)
ap.add_argument("--items", type=int, default=59047)
ap.add_argument("--avg-degree", type=float, default=150)
ap.add_argument("--dim", type=int, default=64)
ap.add_argument("--out", default=None, help="dir to save emb_*_proNE.npy")
args = ap.parse_args()

if args.platform == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if args.platform == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from serendipity_tpu.config import ProNEConfig
from serendipity_tpu.data.synthetic import synthetic_interactions
from serendipity_tpu.graph.adjacency import build_normalized_adjacency
from serendipity_tpu.models.prone import (
    _build_f_operator, _edge_weights_prefactorization, _prefactor_jit,
    prone_embeddings,
)

print("devices:", jax.devices(), flush=True)
t0 = time.time()
inter = synthetic_interactions(
    args.users, args.items, avg_degree=args.avg_degree, seed=0
)
print(f"graph {inter.n_users}x{inter.n_items} nnz={inter.n_train} "
      f"({time.time()-t0:.1f}s)", flush=True)
cfg = ProNEConfig(dim=args.dim)

if args.platform == "cpu":
    from serendipity_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8, 1)
    # footprint proof: run the pre-factorization jit directly and inspect the
    # sharding of the [N, dim] features it returns
    adj = build_normalized_adjacency(inter)
    f_u, f_i = _edge_weights_prefactorization(adj)
    from jax.sharding import NamedSharding, PartitionSpec as P

    shard = NamedSharding(mesh, P(tuple(mesh.axis_names), None))
    consts_f, bind_f = _build_f_operator(inter, adj, f_u, f_i)
    t0 = time.time()
    feats = _prefactor_jit(
        jax.random.PRNGKey(0), consts_f, bind=bind_f,
        n_u=adj.n_users, n_i=adj.n_items, dim=cfg.dim,
        n_iter=cfg.svd_iters, oversample=cfg.svd_oversample, shard=shard,
    )
    feats.block_until_ready()
    t_pre = time.time() - t0
    shards = feats.addressable_shards
    print(f"prefactor wall {t_pre:.1f}s; features {feats.shape} "
          f"{feats.dtype}, sharding={feats.sharding}", flush=True)
    print(f"per-device feature shards: {len(shards)} x "
          f"{shards[0].data.shape} = {shards[0].data.nbytes/2**20:.2f} MiB/device "
          f"(total {feats.nbytes/2**20:.1f} MiB)", flush=True)
    assert len(set(s.device for s in shards)) == 8
    t0 = time.time()
    eu, ei = prone_embeddings(inter, cfg, seed=0, adj=adj, mesh=mesh)
    print(f"full mesh pipeline wall {time.time()-t0+t_pre:.1f}s "
          f"(incl. prefactor above)", flush=True)
else:
    t0 = time.time()
    eu, ei = prone_embeddings(inter, cfg, seed=0)
    t_cold = time.time() - t0
    t0 = time.time()
    eu, ei = prone_embeddings(inter, cfg, seed=0)
    t_warm = time.time() - t0
    print(f"single-chip wall: cold {t_cold:.1f}s, warm {t_warm:.1f}s", flush=True)

assert np.isfinite(eu).all() and np.isfinite(ei).all()
norms = np.linalg.norm(ei, axis=1)
print(f"emb_user {eu.shape}, emb_item {ei.shape}; item row norms "
      f"[{norms.min():.3f}, {norms.max():.3f}]", flush=True)
if args.out:
    os.makedirs(args.out, exist_ok=True)
    np.save(os.path.join(args.out, "emb_user_proNE.npy"), eu)
    np.save(os.path.join(args.out, "emb_item_proNE.npy"), ei)
    print(f"saved to {args.out}", flush=True)
print("DONE", flush=True)
