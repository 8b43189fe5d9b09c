"""Sharded full-catalog retrieval: dot-product scoring + distributed top-k merge.

TPU-native replacement for the reference retrieval paths — `torch.topk` over a
[B, N_items] matrix on one GPU (`Procedure.py:129-135`) and the C++
`c_top_k_array_index` thread pool (`tools.h:13-33`).  Items are row-sharded over the
`model` mesh axis; each shard scores its slice on the MXU and takes a local top-k,
then the (k per shard) candidates are all-gathered over ICI and re-top-k'd — merge
traffic is O(n_model * k), independent of catalog size.  Users are sharded over the
`data` axis.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from serendipity_tpu.ops.topk import topk_exact_2stage


def _fused_local_topk(u, it, k):
    """Shard-local fused Pallas scoring+top-k (ops/pallas_score) when the local
    shapes allow it; None if they don't (caller falls back to the XLA path).

    The kernel keeps the [b, n_local] score tile in VMEM (no HBM
    materialization) and is bit-identical to `lax.top_k` — the serving-shape
    fast path (53 Gscores/s/chip at gowalla shape vs ~6 for the exact
    2-stage).  Requires an item count divisible by a 128-multiple tile; runs
    in interpret mode off-TPU so the shard_map path stays testable on the CPU
    mesh."""
    from serendipity_tpu.ops.pallas_score import fused_score_topk

    n = it.shape[0]
    tile = next((t for t in (2048, 1024, 512, 256, 128) if n % t == 0), None)
    if tile is None or k > 64:
        return None
    interpret = jax.default_backend() != "tpu"
    return fused_score_topk(
        u.astype(it.dtype), it, k=k, item_tile=tile, interpret=interpret
    )


def sharded_retrieve(
    mesh: Mesh,
    user_table: jnp.ndarray,     # [U_pad, D] row-sharded table (need not fit one device)
    item_table: jnp.ndarray,     # [N_pad, D] row-sharded over 'model'
    user_ids: jnp.ndarray,       # [B] int32 global user ids, sharded over 'data'
    k: int,
    item_valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Serving retrieval when BOTH tables are memory-sharded: user rows are
    fetched with the explicit all-to-all lookup (`parallel/lookup.py` — the
    query vectors cannot come from a local table copy when the table doesn't
    fit one device), then scored against the row-sharded item table with the
    distributed top-k merge.  This is the consuming path for the lookup data
    plane (BASELINE config #5's serving side)."""
    from serendipity_tpu.parallel.lookup import sharded_embedding_lookup

    user_vecs = sharded_embedding_lookup(mesh, user_table, user_ids)
    return sharded_score_topk(mesh, user_vecs, item_table, k, item_valid=item_valid)


def sharded_score_topk(
    mesh: Mesh,
    user_vecs: jnp.ndarray,      # [B, D] queries, sharded over 'data'
    item_table: jnp.ndarray,     # [N_pad, D] items, row-sharded over 'model'
    k: int,
    mask_value: float = -jnp.inf,
    item_valid: Optional[jnp.ndarray] = None,  # [N_pad] bool; False rows never win
    fused: bool = False,         # Pallas fused scoring+top-k per shard (needs
                                 # item_valid=None: the kernel has no mask input)
    user_item_mask: Optional[jnp.ndarray] = None,  # [B, N_pad] bool; True cells
                                 # never win (per-user train-item exclusion,
                                 # sharded (data, model))
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (top_scores [B,k], top_item_ids [B,k]) with global item ids."""

    def local(u, it, valid, umask):
        fused_out = (
            _fused_local_topk(u, it, k)
            if fused and valid is None and umask is None else None
        )
        if fused_out is not None:
            v, idx = fused_out
        else:
            scores = jax.lax.dot_general(
                u, it, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )  # [b_local, n_local]
            if valid is not None:
                scores = jnp.where(valid[None, :], scores, mask_value)
            if umask is not None:
                scores = jnp.where(umask, mask_value, scores)
            # exact chunked top-k: same values/tie-order as lax.top_k, ~10x
            # cheaper than the full per-row sort at catalog widths (ops/topk.py)
            v, idx = topk_exact_2stage(scores, k)
        offset = jax.lax.axis_index("model") * it.shape[0]
        idx = idx + offset
        v_all = jax.lax.all_gather(v, "model", axis=1, tiled=True)    # [b, s*k]
        i_all = jax.lax.all_gather(idx, "model", axis=1, tiled=True)
        v2, sel = jax.lax.top_k(v_all, k)
        return v2, jnp.take_along_axis(i_all, sel, axis=1)

    in_specs = (
        P("data", None),
        P("model", None),
        P("model") if item_valid is not None else None,
        P("data", "model") if user_item_mask is not None else None,
    )
    fn = jax.shard_map(
        partial(local),
        mesh=mesh,
        in_specs=in_specs,
        out_specs=(P("data", None), P("data", None)),
        check_vma=False,
    )
    return fn(user_vecs, item_table, item_valid, user_item_mask)
