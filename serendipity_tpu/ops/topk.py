"""Top-k selection primitives tuned for TPU.

XLA's `lax.top_k` lowers to a full per-row sort — measured ~120 ms for a
[30k, 41k] score matrix on v5e, ~10x the cost of producing the scores on the MXU.
Two alternatives:

  * `topk_exact_2stage`: exact top-k via chunked reduction — per-row chunks of
    `chunk` columns are top-k'd locally (cheap short sorts), then the k * n_chunks
    survivors are top-k'd again.  Exact for any input, ~an order of magnitude
    faster at retrieval shapes.
  * `jax.lax.approx_max_k`: the TPU-native PartialReduce op (recall ~0.95 by
    default) — fastest, used for approximate retrieval serving paths.

Parity-sensitive evaluation paths use the exact variant.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k", "chunk"))
def topk_exact_2stage(
    scores: jnp.ndarray, k: int, chunk: int = 128
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact (values, indices) top-k along the last axis of a 2-D array."""
    b, n = scores.shape
    if n <= max(2 * chunk, 2 * k):
        return jax.lax.top_k(scores, k)
    pad = (-n) % chunk
    if pad:
        scores_p = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=-jnp.inf)
    else:
        scores_p = scores
    n_chunks = scores_p.shape[1] // chunk
    kc = min(k, chunk)
    chunked = scores_p.reshape(b, n_chunks, chunk)
    v1, i1 = jax.lax.top_k(chunked, kc)                     # [b, n_chunks, kc]
    base = (jnp.arange(n_chunks, dtype=jnp.int32) * chunk)[None, :, None]
    gidx = i1.astype(jnp.int32) + base
    v1 = v1.reshape(b, n_chunks * kc)
    gidx = gidx.reshape(b, n_chunks * kc)
    v2, sel = jax.lax.top_k(v1, k)
    return v2, jnp.take_along_axis(gidx, sel, axis=1)
