"""Sharded training setup: row-sharded embedding tables + data-parallel BPR step.

The full training step — on-device sampling, K-layer propagation over the bipartite
adjacency, BPR loss, Adam — is jitted over a `data` x `model` mesh with GSPMD
sharding annotations:

  * embedding tables (params, Adam moments):  PartitionSpec('model', None)
  * sampled batch (users/pos/neg):            PartitionSpec('data')
  * adjacency edge arrays:                    replicated (int32 edge lists are small
                                              relative to tables; dst-sharded edges
                                              are a planned optimization)

XLA inserts the collectives (all-gathers for table lookups/propagation, psum for
gradient reduction) from the annotations — the scaling-book recipe; there is no
hand-written NCCL analog to port (reference is single-device, SURVEY.md §2).

Row counts are padded to multiples of the `model` axis size; pad rows have no edges,
are never sampled, and receive zero gradient.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from serendipity_tpu.config import ExperimentConfig
from serendipity_tpu.data.datasets import Interactions
from serendipity_tpu.graph.adjacency import build_normalized_adjacency
from serendipity_tpu.models.lightgcn import EmbeddingModel, init_params
from serendipity_tpu.ops.sampling import sample_bpr_batch


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@dataclass
class ShardedTrainSetup:
    mesh: Mesh
    model: EmbeddingModel
    params: Dict[str, jnp.ndarray]
    opt_state: Any
    adj: Dict[str, jnp.ndarray]
    step_fn: Callable
    n_users_padded: int
    n_items_padded: int


def build_sharded_train_setup(
    cfg: ExperimentConfig, inter: Interactions, mesh: Mesh
) -> ShardedTrainSetup:
    n_model = mesh.shape["model"]
    n_data = mesh.shape["data"]
    up = _round_up(inter.n_users, n_model)
    ip = _round_up(inter.n_items, n_model)

    adj_host = build_normalized_adjacency(inter)
    # repoint edge padding at the padded row counts so segment_sum drops it
    u_dst = np.where(adj_host.u_dst == inter.n_users, up, adj_host.u_dst)
    i_dst = np.where(adj_host.i_dst == inter.n_items, ip, adj_host.i_dst)

    repl = NamedSharding(mesh, P())
    rows = NamedSharding(mesh, P("model", None))
    batch_sh = NamedSharding(mesh, P("data"))

    adj = {
        "u_dst": jax.device_put(u_dst, repl),
        "u_src": jax.device_put(adj_host.u_src, repl),
        "u_w": jax.device_put(adj_host.u_w, repl),
        "i_dst": jax.device_put(i_dst, repl),
        "i_src": jax.device_put(adj_host.i_src, repl),
        "i_w": jax.device_put(adj_host.i_w, repl),
    }
    train_indptr = jax.device_put(
        inter.train_indptr.astype(np.int32), repl
    )
    train_indices = jax.device_put(inter.train_indices.astype(np.int32), repl)
    valid_users = jax.device_put(
        np.nonzero(np.diff(inter.train_indptr) > 0)[0].astype(np.int32), repl
    )

    model = EmbeddingModel(
        arch=cfg.model.arch,
        n_users=up,
        n_items=ip,
        embed_dim=cfg.model.embed_dim,
        n_layers=cfg.model.n_layers,
        edge_dropout=cfg.model.edge_dropout,
        compute_dtype=jnp.dtype(cfg.model.compute_dtype),
    )

    key = jax.random.PRNGKey(cfg.train.seed)
    params = init_params(jax.random.fold_in(key, 0), cfg.model, up, ip)
    params = {
        k: jax.device_put(v, rows if v.ndim == 2 and k.endswith("embedding") else repl)
        for k, v in params.items()
    }
    optimizer = optax.adam(cfg.train.lr)
    # Adam moments inherit the table shardings from their parameter leaves.
    opt_state = optimizer.init(params)

    tcfg = cfg.train
    batch = _round_up(tcfg.batch_size, n_data)

    def step_fn(params, opt_state, key):
        k_sample, k_drop, k_next = jax.random.split(key, 3)
        users, pos, neg = sample_bpr_batch(
            k_sample, valid_users, train_indptr, train_indices,
            inter.n_items, batch, tcfg.neg_resample_rounds,
        )
        users = jax.lax.with_sharding_constraint(users, batch_sh)
        pos = jax.lax.with_sharding_constraint(pos, batch_sh)
        neg = jax.lax.with_sharding_constraint(neg, batch_sh)

        def loss_fn(p):
            return model.bpr_loss(
                p, adj, users, pos, neg, tcfg.l2_decay,
                dropout_key=k_drop if model.edge_dropout > 0 else None,
            )

        (loss, _aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, k_next, loss

    emb_sharding = {
        k: (rows if k.endswith("embedding") else repl) for k in params
    }
    jitted = jax.jit(
        step_fn,
        out_shardings=(emb_sharding, None, None, None),
        donate_argnums=(0, 1),
    )
    return ShardedTrainSetup(
        mesh=mesh,
        model=model,
        params=params,
        opt_state=opt_state,
        adj=adj,
        step_fn=jitted,
        n_users_padded=up,
        n_items_padded=ip,
    )
