"""Host -> device staging of the interaction graph for training and evaluation.

One explicit transfer point: everything the jitted train/eval steps need lives in this
container as device arrays with static shapes.  This replaces the reference's
per-epoch host sampling + `.to(device)` copies (`Procedure.py:32-39`) — after staging,
an entire training epoch runs as a single device computation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import jax.numpy as jnp
import numpy as np

from serendipity_tpu.data.datasets import Interactions
from serendipity_tpu.graph.adjacency import BipartiteAdjacency, build_normalized_adjacency


@dataclass
class DeviceData:
    n_users: int
    n_items: int
    n_train: int
    adj: Dict[str, jnp.ndarray]          # edge lists for propagation
    train_indptr: jnp.ndarray            # [n_users+1]
    train_indices: jnp.ndarray           # [nnz] sorted per row
    valid_users: jnp.ndarray             # users with >=1 train item
    test_indptr: jnp.ndarray
    test_indices: jnp.ndarray
    spmm_ops: object = None              # eagerly-bound op closures (outside-jit use)
    # consts-as-arguments form of the same operators (`ops/spmm_common.SplitSpmm`):
    # jitted training passes .consts as step arguments and binds inside the trace,
    # keeping multi-MB layouts out of the compiled HLO (and enabling
    # multi-controller runs, where closed-over global arrays are unfetchable)
    spmm_split: object = None
    # bisection steps that certainly resolve membership in any user's sorted
    # train row: ceil(log2(max degree)) + 1 (static, from host data)
    search_iters: int = 32
    # plane-packed train-membership bitmap ([n_users, pad1024(n_items)//8]
    # uint8, `ops/pallas_score.pack_mask_bitmap` layout), shared by the
    # bitmap negative sampler (1 byte gather per draw instead of a bisection
    # chain) and the fused masked evaluator.  Passed into jitted steps as an
    # ARGUMENT (multi-controller-safe), never a closure constant.
    train_bitmap: jnp.ndarray | None = None


def build_device_data(
    inter: Interactions,
    adj: BipartiteAdjacency | None = None,
    use_ell: bool = True,
    ell_width: int = 16,
    # hybrid TAIL rows are low-degree by construction (only edges of
    # below-head-cutoff items), so a narrow ELL wins: width 4 measured
    # 9.99 ms/step vs 12.06 at 16 at gowalla scale (round-4 sweep; width 2
    # regresses on segment fixed costs).  Pure-ELL modes keep ell_width=16
    # (tuned round 3 for full-degree distributions).
    tail_ell_width: int = 4,
    adj_type: str = "pre",
    joint: bool = False,
    spmm_mode: str = "auto",
    compute_dtype: str = "float32",
    sampler: str = "bitmap",
    bitmap_budget_bytes: int = 2 << 30,
    head_k: int | None = None,          # override the hybrid cost model's head
                                        # size (probes/sweeps; None = model)
) -> DeviceData:
    """`spmm_mode` selects the propagation kernel family:

      auto    hybrid dense-head/ELL-tail when the cost model favors it
              (`ops/spmm_hybrid.choose_head_k`), else segmented ELL
      hybrid  force the hybrid layout (auto head size)
      ell     segmented ELL pair (`ops/spmm_ell.make_bipartite_spmm`)
      joint   one stacked (U+I) ELL op per layer (`make_joint_spmm`)
      edges   no prebuilt ops — model falls back to gather+segment-sum

    Legacy kwargs map in: `use_ell=False` -> edges, `joint=True` -> joint.
    `compute_dtype` sets the dense head block's storage dtype (it streams from
    HBM every SpMM, so storing at compute precision halves its bandwidth cost
    under bf16 training)."""
    if adj is None:
        adj = build_normalized_adjacency(inter, adj_type=adj_type)
    adj_dev = {
        "u_dst": jnp.asarray(adj.u_dst),
        "u_src": jnp.asarray(adj.u_src),
        "u_w": jnp.asarray(adj.u_w),
        "i_dst": jnp.asarray(adj.i_dst),
        "i_src": jnp.asarray(adj.i_src),
        "i_w": jnp.asarray(adj.i_w),
    }
    if adj.self_w_u is not None:
        adj_dev["self_u"] = jnp.asarray(adj.self_w_u)
        adj_dev["self_i"] = jnp.asarray(adj.self_w_i)
    valid = np.nonzero(np.diff(inter.train_indptr) > 0)[0].astype(np.int32)
    if not use_ell:
        spmm_mode = "edges"
    elif joint:
        spmm_mode = "joint"
    spmm_split = None
    e = adj.n_edges
    if spmm_mode in ("auto", "hybrid"):
        from serendipity_tpu.ops.spmm_hybrid import split_bipartite_hybrid_spmm

        kw = dict(dense_dtype=jnp.dtype(compute_dtype), ell_width=tail_ell_width,
                  head_k=head_k)
        spmm_split = split_bipartite_hybrid_spmm(inter, adj.u_w[:e], adj.i_w[:e], **kw)
        if spmm_split is None:
            if spmm_mode == "hybrid":
                spmm_split = split_bipartite_hybrid_spmm(
                    inter, adj.u_w[:e], adj.i_w[:e], head_k=256, **kw
                )
            else:
                spmm_mode = "ell"
    if spmm_mode == "joint":
        from serendipity_tpu.ops.spmm_ell import split_joint_spmm

        spmm_split = split_joint_spmm(inter, adj.u_w[:e], adj.i_w[:e], width=ell_width)
    elif spmm_mode == "ell":
        from serendipity_tpu.ops.spmm_ell import split_bipartite_spmm

        spmm_split = split_bipartite_spmm(inter, adj.u_w[:e], adj.i_w[:e], width=ell_width)
    return DeviceData(
        n_users=inter.n_users,
        n_items=inter.n_items,
        n_train=inter.n_train,
        adj=adj_dev,
        train_indptr=jnp.asarray(inter.train_indptr, dtype=jnp.int32),
        train_indices=jnp.asarray(inter.train_indices, dtype=jnp.int32),
        valid_users=jnp.asarray(valid),
        test_indptr=jnp.asarray(inter.test_indptr, dtype=jnp.int32),
        test_indices=jnp.asarray(inter.test_indices, dtype=jnp.int32),
        spmm_ops=spmm_split.ops() if spmm_split is not None else None,
        spmm_split=spmm_split,
        search_iters=_search_iters(inter),
        train_bitmap=(
            _train_bitmap(inter, budget_bytes=bitmap_budget_bytes)
            if sampler == "bitmap" else None
        ),
    )


def _train_bitmap(inter: Interactions, budget_bytes: int | None = None):
    from serendipity_tpu.ops.pallas_score import pack_mask_bitmap

    n_pad = -(-inter.n_items // 1024) * 1024
    if budget_bytes is not None and inter.n_users * (n_pad // 8) > budget_bytes:
        import logging

        # WARNING, not INFO: an explicit sampler="bitmap" request silently
        # changing training behavior must be visible at the default log level
        logging.getLogger(__name__).warning(
            "train bitmap would be %.1f GB (> %.1f GB budget); "
            "falling back to the bisection sampler (pass a larger "
            "bitmap_budget_bytes to keep the bitmap)",
            inter.n_users * (n_pad // 8) / 2**30, budget_bytes / 2**30,
        )
        return None
    bm = pack_mask_bitmap(
        inter.train_indptr, inter.train_indices, inter.n_users, n_pad
    )
    if n_pad > inter.n_items:
        # mark the pad item range for every row: sampler draws never reach it
        # (cands < n_items) and the fused evaluator needs padded table rows
        # masked — one bitmap serves both
        pad_ptr = np.arange(2, dtype=np.int64) * (n_pad - inter.n_items)
        pad_bm = pack_mask_bitmap(
            pad_ptr, np.arange(inter.n_items, n_pad, dtype=np.int64), 1, n_pad
        )
        bm |= pad_bm
    return jnp.asarray(bm)


def _search_iters(inter: Interactions) -> int:
    import math

    max_deg = int(np.diff(inter.train_indptr).max(initial=1))
    return int(math.ceil(math.log2(max(max_deg, 2)))) + 1


def propagate_fn(model, data: DeviceData):
    """Jitted full-graph propagation with SpMM layouts passed as ARGUMENTS.

    Closing a jit over `data.spmm_ops` embeds the bound layout arrays (hybrid
    dense head blocks: hundreds of MB at amazon-book scale) into the compiled
    HLO — which a remote-compile service rejects outright (HTTP 413) and
    multi-controller runs cannot fetch.  This binds `data.spmm_split.consts`
    inside the trace instead, like the training chunk does.
    """
    import jax

    def fn(p, spmm_consts):
        ops = (
            data.spmm_split.bind(spmm_consts)
            if data.spmm_split is not None else data.spmm_ops
        )
        return model.propagate(p, data.adj, spmm_ops=ops)

    jitted = jax.jit(fn)
    consts = data.spmm_split.consts if data.spmm_split is not None else None
    return lambda p: jitted(p, consts)
