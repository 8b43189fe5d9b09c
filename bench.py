"""Headline benchmark: per-chip candidate-scoring throughput.

Task: score every user against the full item catalog and take top-20 — the hot path
of the reference's candidate generation + accuracy strategy (`recommend.py:375`
`np.dot(emb_user, emb_item.T)` + `sub_argpartition`), at gowalla scale
(29,858 users x 40,960 items x 64 dims).

Metric: scores/sec/chip (U * I / wall time), fused score+top-k on device, steady
state (compile excluded, best of several trials).

vs_baseline: ratio to the reference implementation's throughput for the identical
task — numpy fp16 `np.dot` + `np.argpartition` (the reference does this on host CPU;
measured on this machine: 2.88e6 scores/sec).  BASELINE.json targets >= 5x.

Prints ONE JSON line.
"""

import json
import time

import numpy as np

# numpy reference path measured on this host (see docstring); scores/sec
REFERENCE_CPU_SCORES_PER_SEC = 2.88e6

N_USERS = 29_856          # gowalla-scale, rounded to a multiple of the block
N_ITEMS = 40_960
DIM = 64
TOP_K = 20
USER_BLOCK = 4_976        # N_USERS / 6 blocks


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    eu = rng.standard_normal((N_USERS, DIM), dtype=np.float32)
    ei = rng.standard_normal((N_ITEMS, DIM), dtype=np.float32)
    eu_d = jax.device_put(jnp.asarray(eu, dtype=jnp.bfloat16))
    ei_d = jax.device_put(jnp.asarray(ei, dtype=jnp.bfloat16))

    n_blocks = N_USERS // USER_BLOCK

    @jax.jit
    def score_all(eu_d, ei_d):
        def block(carry, ub):
            scores = jax.lax.dot_general(
                ub, ei_d, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            v, idx = jax.lax.top_k(scores, TOP_K)
            return carry, (v, idx)

        blocks = eu_d.reshape(n_blocks, USER_BLOCK, DIM)
        _, (vals, idxs) = jax.lax.scan(block, 0, blocks)
        return vals.reshape(N_USERS, TOP_K), idxs.reshape(N_USERS, TOP_K)

    # warmup / compile
    v, i = score_all(eu_d, ei_d)
    v.block_until_ready()

    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        v, i = score_all(eu_d, ei_d)
        v.block_until_ready()
        best = min(best, time.perf_counter() - t0)

    scores_per_sec = N_USERS * N_ITEMS / best
    print(
        json.dumps(
            {
                "metric": "candidate_scoring_throughput",
                "value": round(scores_per_sec / 1e9, 4),
                "unit": "Gscores/s/chip",
                "vs_baseline": round(scores_per_sec / REFERENCE_CPU_SCORES_PER_SEC, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
