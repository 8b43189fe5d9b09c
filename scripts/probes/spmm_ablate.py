"""Per-op SpMM timing: ui / iu / ui_t / iu_t at f32 vs bf16 operands."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from serendipity_tpu.data.synthetic import synthetic_interactions
from serendipity_tpu.graph.adjacency import build_normalized_adjacency
from serendipity_tpu.ops.spmm_hybrid import (
    bind_hybrid, bind_hybrid_transposed, hybrid_consts, build_hybrid,
)

print(jax.devices(), flush=True)
inter = synthetic_interactions(29858, 40981, avg_degree=35, seed=0)
adj = build_normalized_adjacency(inter)
e = adj.n_edges
layout = build_hybrid(inter, adj.u_w[:e], adj.i_w[:e])
consts = hybrid_consts(layout)
print("head K:", layout.head_idx.shape, "dense dtype:", layout.dense_ui.dtype, flush=True)
n_u, n_i, d = inter.n_users, inter.n_items, 64

rng = np.random.default_rng(0)


def timed(name, op, x):
    @jax.jit
    def loop(x, c):
        ui, iu = bind_hybrid(c, n_u, n_i)
        ui_t, iu_t = bind_hybrid_transposed(c, n_u, n_i)
        f = {"ui": ui, "iu": iu, "ui_t": ui_t, "iu_t": iu_t}[op]

        def body(t, acc):
            y = f(x + acc.astype(x.dtype) * 1e-20)
            return acc + y.astype(jnp.float32).sum()

        return jax.lax.fori_loop(0, 16, body, jnp.float32(0.0))

    float(loop(x, consts))
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        float(loop(x, consts))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best/16*1e3:.3f} ms", flush=True)


for dt, tag in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
    xi = jnp.asarray(rng.standard_normal((n_i, d)), dt)
    xu = jnp.asarray(rng.standard_normal((n_u, d)), dt)
    timed(f"ui   ({tag})", "ui", xi)
    timed(f"iu   ({tag})", "iu", xu)
    timed(f"ui_t ({tag})", "ui_t", xu)
    timed(f"iu_t ({tag})", "iu_t", xi)
print("DONE", flush=True)
