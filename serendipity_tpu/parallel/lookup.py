"""Explicit all-to-all sharded embedding lookup.

For tables too large for one chip/host, rows live sharded over the `model` axis and
lookups route over ICI with `all_to_all` (the green-field subsystem SURVEY.md §2
calls for; the reference is single-device).  The GSPMD training step
(`parallel/sharded.py`) lets XLA derive equivalent collectives from annotations;
this module is the hand-written data plane for serving-style lookups where the
routing pattern should be explicit and capacity-bounded.

Protocol (per device, inside `shard_map` over ('data', 'model')):
  1. owner shard of each local query id = id // rows_per_shard,
  2. queries are binned into a fixed-capacity [n_shards, capacity] send buffer
     (capacity = local batch, the worst case; overflow impossible),
  3. `all_to_all` ships bins to their owners, which gather their local rows,
  4. a second `all_to_all` ships row data back; results scatter to request order.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def sharded_embedding_lookup(
    mesh: Mesh,
    table: jnp.ndarray,       # [R_total, D], row-sharded over 'model'
    ids: jnp.ndarray,         # [B_total] int32 global row ids, sharded over 'data'
) -> jnp.ndarray:
    """Returns [B_total, D] embeddings, sharded over 'data'."""
    n_model = mesh.shape["model"]
    r_total, d = table.shape
    assert r_total % n_model == 0
    r_loc = r_total // n_model

    def local(t_shard, q):
        b_loc = q.shape[0]
        owner = q // r_loc                                     # [b]
        # stable order by owner; inverse permutation restores request order
        order = jnp.argsort(owner)
        q_sorted = q[order]
        owner_sorted = owner[order]
        # position of each sorted query within its owner bin
        one_hot = jax.nn.one_hot(owner_sorted, n_model, dtype=jnp.int32)
        pos_in_bin = jnp.cumsum(one_hot, axis=0)[jnp.arange(b_loc), owner_sorted] - 1
        send_ids = jnp.zeros((n_model, b_loc), jnp.int32)
        send_ids = send_ids.at[owner_sorted, pos_in_bin].set(q_sorted)
        valid = jnp.zeros((n_model, b_loc), jnp.bool_)
        valid = valid.at[owner_sorted, pos_in_bin].set(True)

        # ship bins to owners: axis 0 is the shard dimension
        recv_ids = jax.lax.all_to_all(
            send_ids, "model", split_axis=0, concat_axis=0, tiled=True
        )                                                      # [n_model*?]... -> [n_model, b]
        recv_valid = jax.lax.all_to_all(
            valid, "model", split_axis=0, concat_axis=0, tiled=True
        )
        local_rows = jnp.where(recv_valid, recv_ids % r_loc, 0)
        served = t_shard[local_rows]                           # [n_model, b, d]
        served = jnp.where(recv_valid[..., None], served, 0)

        back = jax.lax.all_to_all(
            served, "model", split_axis=0, concat_axis=0, tiled=True
        )                                                      # [n_model, b, d]
        # gather each sorted query's row from its owner's returned bin
        out_sorted = back[owner_sorted, pos_in_bin]            # [b, d]
        inv = jnp.argsort(order)
        return out_sorted[inv]

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P("model", None), P("data")),
        out_specs=P("data", None),
        check_vma=False,
    )
    return fn(table, ids)
