"""Masked fused-eval kernel: compile-time attribution + persistent-cache probe.

usage: maskcache_probe.py <n_items> [cache_dir]
"""
import sys
import time

import jax

n_items = int(sys.argv[1])
cache_dir = sys.argv[2] if len(sys.argv) > 2 else None
if cache_dir:
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp

from serendipity_tpu.ops.pallas_score import fused_score_topk_masked, pack_mask_bitmap

u, d = 128, 64
rng = np.random.default_rng(0)
eu = jnp.asarray(rng.standard_normal((u, d)), jnp.float32)
ei = jnp.asarray(rng.standard_normal((n_items, d)), jnp.float32)
deg = 30
indices = np.sort(
    rng.integers(0, n_items, size=(u, deg)), axis=1
).astype(np.int64).reshape(-1)
indptr = np.arange(u + 1, dtype=np.int64) * deg
bm = pack_mask_bitmap(indptr, indices, u, n_items)

t0 = time.time()
v, i = fused_score_topk_masked(eu, ei, jnp.asarray(bm), k=20)
s = float(jnp.sum(v))
print(f"n_items={n_items} cache={'on' if cache_dir else 'off'} "
      f"first-call wall {time.time()-t0:.1f}s (checksum {s:.1f})", flush=True)
t0 = time.time()
v, i = fused_score_topk_masked(eu + jnp.float32(1e-6), ei, jnp.asarray(bm), k=20)
float(jnp.sum(v))
print(f"second-call wall {time.time()-t0:.2f}s", flush=True)
