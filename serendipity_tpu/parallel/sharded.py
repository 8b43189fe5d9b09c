"""Sharded training setup: row-sharded embedding tables + dst-sharded propagation.

Multi-chip analog of `train/device.build_device_data` + the reference trainer state
(`LightGCN-tf/LightGCN.py:431-731`, `code/main.py`).  Placement plan over a
`data` x `model` mesh:

  * embedding tables (params, Adam moments):  P(('data','model'), None) — rows
    sharded in contiguous blocks over ALL devices (FSDP-style), so table + optimizer
    memory is ~rows/n_devices per chip;
  * adjacency:  dst-sharded segmented-ELL chunks (`ops/spmm_ell_sharded.py`) —
    per-chip adjacency memory is ~nnz/n_devices, replacing the reference's
    memory fold-split (`LightGCN.py:201-213`);
  * sampled batch (users/pos/neg):  P('data');
  * CSR sampling arrays, self-loop diagonals: replicated (small).

The propagation collectives (one all-gather of activations per SpMM) are explicit
in the shard_map kernel; everything else (batch gathers, gradient reduce-scatter)
is inserted by XLA from the GSPMD annotations — the scaling-book recipe.  Row
counts are padded to multiples of the device count; pad rows have no edges, are
never sampled, and receive zero gradient (Adam leaves them at init).

The weighted variants (ngcf/gcn/gcmc) and edge-dropout runs fall back to the
edge-list SpMM with replicated edge arrays — correct, memory-bounded by
O(nnz) int32s per chip rather than O(nnz/n_devices).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional, Tuple

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
from serendipity_tpu.ops.spmm_ell_sharded import (
    MESH_AXES,
    split_sharded_bipartite_spmm,
)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def mesh_size(mesh: Mesh) -> int:
    return int(np.prod([mesh.shape[a] for a in MESH_AXES]))


@dataclass
class ShardedTrainSetup:
    mesh: Mesh
    model: EmbeddingModel
    params: Dict[str, jnp.ndarray]
    opt_state: Any
    data: "DeviceData"                  # sharded-op DeviceData (real counts)
    step_fn: Callable
    n_users_padded: int
    n_items_padded: int
    batch_sharding: NamedSharding
    param_shardings: Dict[str, NamedSharding]
    batch_size: int


def build_sharded_device_data(
    cfg: ExperimentConfig, inter: Interactions, mesh: Mesh,
    pad_multiple: Optional[int] = None,
) -> Tuple["DeviceData", EmbeddingModel, int, int]:
    """(DeviceData, padded model, n_users_padded, n_items_padded) for a mesh.

    The DeviceData's `spmm_ops` are the dst-sharded ELL closures when the arch
    supports them; its counts stay the REAL dataset sizes (sampling bounds), while
    the model and parameter tables use the padded sizes.
    """
    from serendipity_tpu.train.device import DeviceData

    n_shards = mesh_size(mesh)
    mult = pad_multiple or n_shards
    assert mult % n_shards == 0, "pad multiple must divide evenly over the mesh"
    up = _round_up(inter.n_users, mult)
    ip = _round_up(inter.n_items, mult)

    adj_host = build_normalized_adjacency(inter, adj_type=cfg.model.adj_type)
    repl = NamedSharding(mesh, P())

    use_ell = cfg.model.arch == "lightgcn" and cfg.model.edge_dropout == 0.0
    spmm_split = None
    adj: Dict[str, jnp.ndarray] = {}
    if use_ell:
        e = adj_host.n_edges
        spmm_split = split_sharded_bipartite_spmm(
            mesh, inter, adj_host.u_w[:e], adj_host.i_w[:e], up, ip
        )
    elif cfg.model.arch != "mf":
        # replicated edge lists; repoint edge padding at the padded row counts so
        # segment_sum drops it
        u_dst = np.where(adj_host.u_dst == inter.n_users, up, adj_host.u_dst)
        i_dst = np.where(adj_host.i_dst == inter.n_items, ip, adj_host.i_dst)
        adj = {
            "u_dst": jax.device_put(u_dst, repl),
            "u_src": jax.device_put(adj_host.u_src, repl),
            "u_w": jax.device_put(adj_host.u_w, repl),
            "i_dst": jax.device_put(i_dst, repl),
            "i_src": jax.device_put(adj_host.i_src, repl),
            "i_w": jax.device_put(adj_host.i_w, repl),
        }
    if adj_host.self_w_u is not None:
        adj["self_u"] = jax.device_put(
            np.pad(adj_host.self_w_u, (0, up - inter.n_users)), repl
        )
        adj["self_i"] = jax.device_put(
            np.pad(adj_host.self_w_i, (0, ip - inter.n_items)), repl
        )

    from serendipity_tpu.train.device import _search_iters

    valid = np.nonzero(np.diff(inter.train_indptr) > 0)[0].astype(np.int32)
    data = DeviceData(
        n_users=inter.n_users,
        n_items=inter.n_items,
        n_train=inter.n_train,
        adj=adj,
        train_indptr=jax.device_put(inter.train_indptr.astype(np.int32), repl),
        train_indices=jax.device_put(inter.train_indices.astype(np.int32), repl),
        valid_users=jax.device_put(valid, repl),
        test_indptr=jax.device_put(inter.test_indptr.astype(np.int32), repl),
        test_indices=jax.device_put(inter.test_indices.astype(np.int32), repl),
        spmm_ops=spmm_split.ops() if spmm_split is not None else None,
        spmm_split=spmm_split,
        search_iters=_search_iters(inter),
    )
    model = EmbeddingModel(
        arch=cfg.model.arch,
        n_users=up,
        n_items=ip,
        embed_dim=cfg.model.embed_dim,
        n_layers=cfg.model.n_layers,
        edge_dropout=cfg.model.edge_dropout,
        mess_dropout=cfg.model.mess_dropout,
        compute_dtype=jnp.dtype(cfg.model.compute_dtype),
    )
    return data, model, up, ip


def table_shardings(mesh: Mesh) -> Dict[str, NamedSharding]:
    """Param-name -> sharding map: embedding-table rows sharded over the whole
    mesh, everything else replicated.  Key-lazy so callers don't need the params
    dict up front (arch determines the weight-matrix key set)."""
    rows = NamedSharding(mesh, P(MESH_AXES, None))
    repl = NamedSharding(mesh, P())

    class _TableShardings(dict):
        def __missing__(self, key):
            val = rows if key.endswith("embedding") else repl
            self[key] = val
            return val

    return _TableShardings()


def build_sharded_train_setup(
    cfg: ExperimentConfig, inter: Interactions, mesh: Mesh,
    pad_multiple: Optional[int] = None,
) -> ShardedTrainSetup:
    """Standalone jitted sharded step (used by the dryrun and step-level tests);
    the end-to-end path drives the same pieces through `BPRTrainer`
    (`train/runner.run_training` with mesh axes > 1)."""
    n_data = mesh.shape["data"]
    data, model, up, ip = build_sharded_device_data(cfg, inter, mesh, pad_multiple)

    key = jax.random.PRNGKey(cfg.train.seed)
    params = init_params(jax.random.fold_in(key, 0), cfg.model, up, ip)
    shardings = table_shardings(mesh)
    # via host numpy: a committed process-local array cannot be device_put onto a
    # sharding spanning other processes, but an (identical) host value can — this
    # is what lets the same setup run under multi-controller jax.distributed
    # (tests/test_distributed.py)
    params = {
        k: jax.device_put(np.asarray(v), shardings[k]) for k, v in params.items()
    }
    optimizer = optax.adam(cfg.train.lr)
    opt_state = optimizer.init(params)

    tcfg = cfg.train
    batch = _round_up(tcfg.batch_size, n_data)
    batch_sh = NamedSharding(mesh, P("data"))

    def step_fn(params, opt_state, key, spmm_consts):
        # SpMM layout arrays enter as arguments and are bound at trace time —
        # mandatory for multi-controller runs (closed-over global arrays cannot
        # be constant-folded) and keeps the HLO small (`ops/spmm_common`)
        spmm_ops = (
            data.spmm_split.bind(spmm_consts)
            if data.spmm_split is not None else data.spmm_ops
        )
        k_sample, k_drop, k_next = jax.random.split(key, 3)
        users, pos, neg = sample_bpr_batch(
            k_sample, data.valid_users, data.train_indptr, data.train_indices,
            data.n_items, batch, tcfg.neg_resample_rounds,
            search_iters=data.search_iters,
        )
        users = jax.lax.with_sharding_constraint(users, batch_sh)
        pos = jax.lax.with_sharding_constraint(pos, batch_sh)
        neg = jax.lax.with_sharding_constraint(neg, batch_sh)

        def loss_fn(p):
            return model.bpr_loss(
                p, data.adj, users, pos, neg, tcfg.l2_decay,
                dropout_key=k_drop if model.edge_dropout > 0 else None,
                spmm_ops=spmm_ops,
            )

        (loss, _aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = {
            k: jax.lax.with_sharding_constraint(v, shardings[k])
            for k, v in params.items()
        }
        return params, opt_state, k_next, loss

    inner = jax.jit(step_fn, donate_argnums=(0, 1))
    consts = data.spmm_split.consts if data.spmm_split is not None else None

    def jitted(params, opt_state, key):
        return inner(params, opt_state, key, consts)
    return ShardedTrainSetup(
        mesh=mesh,
        model=model,
        params=params,
        opt_state=opt_state,
        data=data,
        step_fn=jitted,
        n_users_padded=up,
        n_items_padded=ip,
        batch_sharding=batch_sh,
        param_shardings=shardings,
        batch_size=batch,
    )
