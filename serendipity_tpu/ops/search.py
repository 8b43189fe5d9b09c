"""Vectorized bounded binary search over flat CSR index arrays.

The reference tests membership with Python `set`s and C++ `std::set`
(`sampling.cpp:27-56`, `evaluate_foldout.h:16-112`).  On TPU the equivalent is a
branch-free binary search over each row's sorted segment of the flat CSR `indices`
array: for a query (row r, value v) we search in indices[lo[r]:hi[r]].  The loop runs
a fixed ceil(log2(max_row_len)) + 1 iterations (static shape, `lax.fori_loop`), fully
vectorized over the query batch — O(B log d) gathers instead of host sets.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def searchsorted_in_rows(
    flat_vals: jnp.ndarray,
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    queries: jnp.ndarray,
    n_iters: int = 32,
) -> jnp.ndarray:
    """Left insertion index of `queries[b]` within flat_vals[lo[b]:hi[b]].

    Each row segment must be sorted ascending.  Returns int32 absolute indices into
    `flat_vals` (in [lo[b], hi[b]]).
    """
    lo = lo.astype(jnp.int32)
    hi = hi.astype(jnp.int32)
    queries = queries.astype(flat_vals.dtype)

    def body(_, state):
        lo_c, hi_c = state
        mid = (lo_c + hi_c) >> 1
        mid_val = flat_vals[jnp.clip(mid, 0, flat_vals.shape[0] - 1)]
        go_right = (mid_val < queries) & (lo_c < hi_c)
        lo_n = jnp.where(go_right, mid + 1, lo_c)
        hi_n = jnp.where(go_right | (lo_c >= hi_c), hi_c, mid)
        return lo_n, hi_n

    lo_f, _ = jax.lax.fori_loop(0, n_iters, body, (lo, hi))
    return lo_f


def contains_in_rows(
    flat_vals: jnp.ndarray,
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    queries: jnp.ndarray,
    n_iters: int = 32,
) -> jnp.ndarray:
    """Boolean membership of queries[b] in the sorted segment flat_vals[lo[b]:hi[b]]."""
    pos = searchsorted_in_rows(flat_vals, lo, hi, queries, n_iters)
    in_range = pos < hi
    val = flat_vals[jnp.clip(pos, 0, flat_vals.shape[0] - 1)]
    return in_range & (val == queries.astype(flat_vals.dtype))
