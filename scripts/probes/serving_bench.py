"""Serving-latency benchmark: RetrievalService end-to-end request latency +
sustained pipelined throughput at gowalla scale on one chip."""
import time
import numpy as np
import jax

from serendipity_tpu.data.synthetic import synthetic_interactions
from serendipity_tpu.rec.service import RetrievalService

print(jax.devices(), flush=True)
inter = synthetic_interactions(29858, 40981, avg_degree=35, seed=0)
from serendipity_tpu.data.datasets import synthesize_item_metadata
synthesize_item_metadata(inter, seed=0)
rng = np.random.default_rng(0)
eu = rng.standard_normal((inter.n_users, 64)).astype(np.float32)
ei = rng.standard_normal((inter.n_items, 64)).astype(np.float32)
svc = RetrievalService(inter, eu, ei)

for batch in (1, 16, 128, 1024):
    uids = rng.integers(0, inter.n_users, size=batch)
    svc.recommend(uids, k=20)                          # compile
    lats = []
    for t in range(20):
        uids = rng.integers(0, inter.n_users, size=batch)
        t0 = time.perf_counter()
        v, idx = svc.recommend(uids, k=20)
        lats.append((time.perf_counter() - t0) * 1e3)
    lats = np.sort(lats)
    print(f"batch {batch:5d}: p50 {lats[10]:.1f} ms  p90 {lats[18]:.1f} ms "
          f"(end-to-end incl. ~77 ms tunnel RPC + host mask build)", flush=True)

# blended-factor request (acc + novelty + quality weights)
uids = rng.integers(0, inter.n_users, size=128)
w = {"acc": 0.6, "nov": 0.2, "qua": 0.2}
svc.recommend(uids, k=20, weights=w)
lats = []
for t in range(20):
    uids = rng.integers(0, inter.n_users, size=128)
    t0 = time.perf_counter()
    svc.recommend(uids, k=20, weights=w)
    lats.append((time.perf_counter() - t0) * 1e3)
lats = np.sort(lats)
print(f"batch   128 blended: p50 {lats[10]:.1f} ms  p90 {lats[18]:.1f} ms", flush=True)
print("DONE", flush=True)
