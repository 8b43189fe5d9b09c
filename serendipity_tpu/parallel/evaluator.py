"""Distributed full-catalog evaluation over a genuinely row-sharded item table.

Multi-chip form of `train/evaluator.Evaluator` (the reference eval contract,
`LightGCN-tf/utility/batch_test.py:25-84` + `evaluate_foldout.h:16-195`): the item
table never exists whole on any chip.  Each device scores the user batch against its
own item-row block on the MXU, applies its slice of the train-item mask, takes a
LOCAL exact top-k, and the (k per shard) candidates are all-gathered over ICI and
re-top-k'd — merge traffic O(n_shards * k), independent of catalog size.  The
cumulative metric vectors run replicated on the merged [B, K] lists (tiny).

Tie semantics match the single-chip evaluator: within a shard `topk_exact_2stage`
breaks ties toward the lower local index, and the shard-major all-gather layout
makes the final `top_k` break residual ties toward the lower GLOBAL item id.

Train-item masking follows `batch_test.py:62-64`: the per-batch padded (row, item)
scatter pairs are pre-partitioned on the host by item-owner shard, with shard-LOCAL
item ids (dummy slots point at the appended dummy row).  Padded item rows (table
rows beyond the real catalog) are masked by an `item_valid` shard mask.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from serendipity_tpu.config import EvalConfig
from serendipity_tpu.data.datasets import Interactions
from serendipity_tpu.models.lightgcn import EmbeddingModel, Params
from serendipity_tpu.ops.metrics import hit_matrix, ranking_metrics_cumulative  # noqa: F401
from serendipity_tpu.train.evaluator import _per_user_metrics
from serendipity_tpu.ops.spmm_ell_sharded import MESH_AXES
from serendipity_tpu.ops.topk import topk_exact_2stage
from serendipity_tpu.train.device import DeviceData
from serendipity_tpu.train.evaluator import Evaluator, _auc_batch


def _partition_mask_pairs(
    users_pad: np.ndarray,     # [P] padded user ids (batched row-major)
    valid: np.ndarray,         # [P] bool
    ptr: np.ndarray,
    idx: np.ndarray,
    b: int,
    n_shards: int,
    items_per_shard: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-(batch, item-shard) padded scatter lists with shard-local item ids.

    Returns (rows [n_batches, n_shards, m], items_local [n_batches, n_shards, m]);
    dummy slots carry row = b (the appended dummy score row) and item 0.
    """
    pad_n = len(users_pad)
    n_batches = pad_n // b
    deg = np.diff(ptr)
    deg_sel = np.where(valid, deg[users_pad], 0).astype(np.int64)
    total = int(deg_sel.sum())
    starts = ptr[users_pad]
    csum = np.zeros(pad_n + 1, np.int64)
    np.cumsum(deg_sel, out=csum[1:])
    pos = (
        np.repeat(starts, deg_sel)
        + np.arange(total, dtype=np.int64)
        - np.repeat(csum[:-1], deg_sel)
    )
    items_flat = idx[pos].astype(np.int64)
    rows_flat = np.repeat((np.arange(pad_n, dtype=np.int64) % b), deg_sel)
    batch_of = np.repeat(np.arange(pad_n, dtype=np.int64) // b, deg_sel)
    shard_of = items_flat // items_per_shard
    group = batch_of * n_shards + shard_of
    order = np.argsort(group, kind="stable")
    group_sorted = group[order]
    counts = np.bincount(group_sorted, minlength=n_batches * n_shards)
    m = max(int(counts.max(initial=0)), 1)
    rows = np.full((n_batches * n_shards, m), b, dtype=np.int32)
    items = np.zeros((n_batches * n_shards, m), dtype=np.int32)
    gstart = np.zeros(n_batches * n_shards + 1, np.int64)
    np.cumsum(counts, out=gstart[1:])
    within = np.arange(total, dtype=np.int64) - gstart[group_sorted]
    rows[group_sorted, within] = rows_flat[order]
    items[group_sorted, within] = (items_flat - shard_of * items_per_shard)[order]
    return (
        rows.reshape(n_batches, n_shards, m),
        items.reshape(n_batches, n_shards, m),
    )


class ShardedEvaluator(Evaluator):
    """Evaluator whose scoring/top-k runs sharded over the mesh.

    Reuses the host-side batching/metric plumbing of the base class; only the
    per-batch device function changes.  AUC falls back to replicated scoring
    (it needs dense [B, N] masks) with padded rows excluded.
    """

    def __init__(
        self,
        model: EmbeddingModel,
        data: DeviceData,
        inter: Interactions,
        cfg: EvalConfig,
        mesh: Mesh,
        n_items_padded: int,
        user_subset: Optional[np.ndarray] = None,
    ):
        super().__init__(model, data, inter, cfg, user_subset=user_subset)
        self.mesh = mesh
        n_shards = int(np.prod([mesh.shape[a] for a in MESH_AXES]))
        self.n_shards = n_shards
        assert n_items_padded % n_shards == 0
        self.items_per_shard = n_items_padded // n_shards

        users_flat = self.users_batched.reshape(-1)
        valid_flat = self.valid_batched.reshape(-1)
        b = self.users_batched.shape[1]
        rows, items = _partition_mask_pairs(
            users_flat, valid_flat, inter.train_indptr, inter.train_indices,
            b, n_shards, self.items_per_shard,
        )
        sh = NamedSharding(mesh, P(MESH_AXES, None))
        self._mask_rows_sh: List[jnp.ndarray] = [
            jax.device_put(rows[bi], sh) for bi in range(rows.shape[0])
        ]
        self._mask_items_sh: List[jnp.ndarray] = [
            jax.device_put(items[bi], sh) for bi in range(items.shape[0])
        ]
        item_valid = np.arange(n_items_padded) < inter.n_items
        self._item_valid = jax.device_put(item_valid, NamedSharding(mesh, P(MESH_AXES)))
        self._item_valid_repl = jax.device_put(
            item_valid, NamedSharding(mesh, P())
        )
        self._eval_fn = self._build_eval_fn()

    def _build_eval_fn(self):
        mesh, max_k = self.mesh, self.max_k
        n_model = mesh.shape["model"]
        # local top-k width: exact even when a shard holds fewer than k items
        # (then the whole shard survives to the merge)
        k_local = min(max_k, self.items_per_shard)
        if self.n_shards * k_local < max_k:
            raise ValueError(
                f"catalog too small to rank top-{max_k} over {self.n_shards} shards"
            )

        def eval_batch(all_u, all_i, users, valid, mrows, mitems, item_valid,
                       test_indptr, test_indices):
            b = users.shape[0]
            ub = all_u[users].astype(jnp.float32)     # [b, D]; XLA gathers/all-gathers

            def local(u, it_blk, mr, mi, iv):
                scores = jax.lax.dot_general(
                    u, it_blk.astype(jnp.float32), (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )                                      # [b, items_per_shard]
                scores = jnp.where(iv[None, :], scores, -jnp.inf)
                scores = jnp.concatenate(
                    [scores, jnp.zeros((1, scores.shape[1]), scores.dtype)], axis=0
                )
                scores = scores.at[mr[0], mi[0]].set(-jnp.inf)[:b]
                v, idx = topk_exact_2stage(scores, k_local)
                shard = (
                    jax.lax.axis_index("data") * n_model
                    + jax.lax.axis_index("model")
                )
                idx = idx + shard * it_blk.shape[0]
                v_all = jax.lax.all_gather(v, MESH_AXES, axis=1, tiled=True)
                i_all = jax.lax.all_gather(idx, MESH_AXES, axis=1, tiled=True)
                v2, sel = jax.lax.top_k(v_all, max_k)
                return v2, jnp.take_along_axis(i_all, sel, axis=1)

            _, top_items = jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(
                    P(None, None), P(MESH_AXES, None),
                    P(MESH_AXES, None), P(MESH_AXES, None), P(MESH_AXES),
                ),
                out_specs=(P(None, None), P(None, None)),
                check_vma=False,
            )(ub, all_i, mrows, mitems, item_valid)

            per_user = _per_user_metrics(
                top_items, users, test_indptr, test_indices,
                getattr(self.cfg, "protocol", "foldout"),
            )
            w = valid.astype(jnp.float32)[:, None]
            sums = {k: jnp.sum(v * w, axis=0) for k, v in per_user.items()}
            return sums, jnp.sum(w)

        return jax.jit(eval_batch)

    def evaluate(
        self, params: Params, all_emb: Optional[tuple] = None
    ) -> Dict[str, float]:
        if all_emb is None:
            all_u, all_i = self._propagate(params)
        else:
            all_u, all_i = all_emb
        totals: Dict[str, np.ndarray] = {}
        n = 0.0
        for bi in range(self.users_dev.shape[0]):
            sums, cnt = self._eval_fn(
                all_u, all_i,
                self.users_dev[bi], self.valid_dev[bi],
                self._mask_rows_sh[bi], self._mask_items_sh[bi],
                self._item_valid,
                self.data.test_indptr, self.data.test_indices,
            )
            n += float(cnt)
            for k, v in sums.items():
                acc = totals.setdefault(k, np.zeros(self.max_k))
                acc += np.asarray(v)
        out: Dict[str, float] = {}
        metrics = (
            ("hr", "ndcg", "mrr")
            if getattr(self.cfg, "protocol", "foldout") == "loo"
            else self.cfg.metrics
        )
        for metric in metrics:
            for k in self.cfg.topks:
                out[f"{metric}@{k}"] = float(totals[metric][k - 1] / max(n, 1.0))
        return out

    def evaluate_auc(
        self, params: Params, all_emb: Optional[tuple] = None
    ) -> float:
        if all_emb is None:
            all_u, all_i = self._propagate(params)
        else:
            all_u, all_i = all_emb
        tot, n = 0.0, 0.0
        for bi in range(self.users_dev.shape[0]):
            s, cnt = _auc_batch(
                all_u, all_i,
                self.users_dev[bi], self.valid_dev[bi],
                self.mask_rows[bi], self.mask_items[bi],
                self.pos_rows[bi], self.pos_items[bi],
                item_valid=self._item_valid_repl,
            )
            tot += float(s)
            n += float(cnt)
        return tot / max(n, 1.0)
