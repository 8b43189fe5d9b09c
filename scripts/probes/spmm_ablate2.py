"""Decompose the 2.5 ms hybrid op: dense-only vs tail-only vs full."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from serendipity_tpu.data.synthetic import synthetic_interactions
from serendipity_tpu.graph.adjacency import build_normalized_adjacency
from serendipity_tpu.ops.spmm_hybrid import (
    _apply_to_users, _apply_to_items, hybrid_consts, build_hybrid,
)

print(jax.devices(), flush=True)
inter = synthetic_interactions(29858, 40981, avg_degree=35, seed=0)
adj = build_normalized_adjacency(inter)
e = adj.n_edges
layout = build_hybrid(inter, adj.u_w[:e], adj.i_w[:e])
consts = hybrid_consts(layout)
n_u, n_i, d = inter.n_users, inter.n_items, 64
tail_edges = int(consts["t_ui"][0].size) if consts["t_ui"] is not None else 0
print(f"K={layout.head_idx.shape[0]} tail_seg_elems={tail_edges}", flush=True)

rng = np.random.default_rng(0)
xi = jnp.asarray(rng.standard_normal((n_i, d)), jnp.bfloat16)


def timed(name, fn):
    @jax.jit
    def loop(x, c):
        def body(t, acc):
            y = fn(x + acc.astype(x.dtype) * 1e-20, c)
            return acc + y.astype(jnp.float32).sum()

        return jax.lax.fori_loop(0, 16, body, jnp.float32(0.0))

    float(loop(xi, consts))
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        float(loop(xi, consts))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best/16*1e3:.3f} ms", flush=True)


timed("ui full       ", lambda x, c: _apply_to_users(x, c["hi"], c["d_ui"], c["t_ui"], n_u))
timed("ui dense-only ", lambda x, c: _apply_to_users(x, c["hi"], c["d_ui"], None, n_u))

from serendipity_tpu.ops.spmm_ell import _ell_apply


def tail_only(x, c):
    return _ell_apply(x, *c["t_ui"], n_u)


timed("ui tail-only  ", tail_only)


def dense_mm_only(x, c):
    head_x = x[c["hi"]]
    return jnp.einsum(
        "ku,kd->ud", c["d_ui"].astype(x.dtype), head_x,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


timed("ui matmul-only", dense_mm_only)
print("DONE", flush=True)
