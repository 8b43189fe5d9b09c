"""Full-catalog ranking evaluation, entirely on device.

Replaces the reference eval path — batch scoring on device, then top-k + metrics on
the host through a C++ thread pool (`batch_test.py:25-84` -> `tools.h:13-33` ->
`evaluate_foldout.h:115-195`) or `torch.topk` + numpy (`Procedure.py:96-174`).  Here
scoring (MXU matmul), train-item masking, `lax.top_k`, membership tests, and the
cumulative metric vectors all run in one jitted function per user batch; only the
final scalar sums come back to the host.

Train-item masking follows `batch_test.py:62-64` / `Procedure.py:129-134`: positions
of a user's train items get -inf before top-k.  The scatter uses per-batch padded
(row, item) pairs with a dummy row, precomputed once on the host, so shapes stay
static under jit.

Also covers the reference's per-user ROC AUC (`code/utils.py:265-274`) and the
sparsity-level performance report (`LightGCN-tf/LightGCN.py:526-560`,
`load_data.py:274-323`): `evaluate_auc` and `sparsity_report` below.

The batch functions are module-level jits so Evaluator instances with the same batch
shape (e.g. one per sparsity level) share a single compiled executable.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from serendipity_tpu.config import EvalConfig
from serendipity_tpu.data.datasets import Interactions, sparsity_split
from serendipity_tpu.models.lightgcn import EmbeddingModel, Params
from serendipity_tpu.ops.metrics import (
    auc_rows,
    hit_matrix,
    loo_metrics_cumulative,
    ranking_metrics_cumulative,
)
from serendipity_tpu.train.device import DeviceData


def _padded_scatter(
    users_pad: np.ndarray,   # [P] padded user ids
    valid: np.ndarray,       # [P] bool — padded slots contribute nothing
    ptr: np.ndarray,
    idx: np.ndarray,
    b: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-batch padded (row, item) scatter lists from a CSR, dummy row index = b.

    Fully vectorized (a python per-user loop costs minutes at 162k users).  Returns
    (rows [n_batches, m], items [n_batches, m]).
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
    items_flat = idx[pos].astype(np.int32)
    rows_flat = np.repeat((np.arange(pad_n, dtype=np.int32) % b), deg_sel)
    batch_of = np.repeat(np.arange(pad_n, dtype=np.int64) // b, deg_sel)
    batch_nnz = np.bincount(batch_of, minlength=n_batches)
    m = max(int(batch_nnz.max(initial=0)), 1)
    rows = np.full((n_batches, m), b, dtype=np.int32)
    items = np.zeros((n_batches, m), dtype=np.int32)
    bstart = np.zeros(n_batches + 1, np.int64)
    np.cumsum(batch_nnz, out=bstart[1:])
    within = np.arange(total, dtype=np.int64) - bstart[batch_of]
    rows[batch_of, within] = rows_flat
    items[batch_of, within] = items_flat
    return rows, items


def _masked_scores(all_u, all_i, users, mask_rows, mask_items, b):
    scores = all_u[users] @ all_i.T                           # [b, n_items] (MXU)
    scores = jnp.concatenate(
        [scores, jnp.zeros((1, scores.shape[1]), scores.dtype)], axis=0
    )
    return scores.at[mask_rows, mask_items].set(-jnp.inf)[:b]


def _per_user_metrics(top_items, users, test_indptr, test_indices, protocol):
    """Per-user metric vectors under either protocol.

    foldout: cumulative precision/recall/AP/NDCG/MRR over the user's full test
    set (`evaluate_foldout.h:16-112`).  loo: HR/NDCG/MRR step vectors for a
    single held-out ground-truth item — the FIRST test item of the user
    (`evaluate_loo.py:13-64`; leave-one-out splits hold out exactly one)."""
    lo = test_indptr[users]
    hi = test_indptr[users + 1]
    if protocol == "loo":
        truth = test_indices[lo]
        return loo_metrics_cumulative(top_items, truth)
    hits = hit_matrix(top_items, lo, hi, test_indices)
    truth_len = (hi - lo).astype(jnp.float32)
    return ranking_metrics_cumulative(hits, truth_len)


@partial(jax.jit, static_argnames=("max_k", "protocol"))
def _eval_batch(
    all_u, all_i, users, valid, mask_rows, mask_items, test_indptr, test_indices,
    *, max_k: int, protocol: str = "foldout",
):
    b = users.shape[0]
    scores = _masked_scores(all_u, all_i, users, mask_rows, mask_items, b)
    # exact two-stage top-k: ~10x cheaper than lax.top_k's full sort at
    # catalog widths (see ops/topk.py)
    from serendipity_tpu.ops.topk import topk_exact_2stage

    _, top_items = topk_exact_2stage(scores, max_k)           # [b, K]

    per_user = _per_user_metrics(
        top_items, users, test_indptr, test_indices, protocol
    )
    w = valid.astype(jnp.float32)[:, None]
    sums = {k: jnp.sum(v * w, axis=0) for k, v in per_user.items()}
    return sums, jnp.sum(w)


@partial(jax.jit, static_argnames=("max_k", "interpret", "protocol"))
def _eval_batch_fused(
    all_u, all_i_pad, users, valid, bitmap_all, test_indptr, test_indices,
    *, max_k: int, interpret: bool = False, protocol: str = "foldout",
):
    """`_eval_batch` with scoring+masking+top-k fused in the Pallas masked
    kernel (`ops/pallas_score.fused_score_topk_masked`) — the [b, N] score
    matrix never reaches HBM.  Bit-identical to the XLA path for f32
    embeddings (same -inf masking, same lax.top_k tie order; pinned in
    tests/test_eval_extras.py).  For bf16 embeddings the two paths can differ
    on near-ties: the XLA path's `@` emits bf16-ROUNDED scores while the
    kernel ranks by f32-accumulated ones — the kernel is the more faithful to
    the reference's f32 scoring (`Procedure.py:129-134`)."""
    from serendipity_tpu.ops.pallas_score import fused_score_topk_masked

    eu_b = all_u[users]
    bm_b = bitmap_all[users]
    _, top_items = fused_score_topk_masked(
        eu_b, all_i_pad, bm_b, k=max_k, interpret=interpret
    )
    per_user = _per_user_metrics(
        top_items, users, test_indptr, test_indices, protocol
    )
    w = valid.astype(jnp.float32)[:, None]
    sums = {k: jnp.sum(v * w, axis=0) for k, v in per_user.items()}
    return sums, jnp.sum(w)


@jax.jit
def _auc_batch(
    all_u, all_i, users, valid, mask_rows, mask_items, pos_rows, pos_items,
    item_valid=None,
):
    """Sum of per-user AUC over the batch (reference `code/utils.py:265-274`:
    candidates = all items minus the user's train items, labels = test items).
    `item_valid` (optional [N] bool) drops padded table rows on the sharded path."""
    b = users.shape[0]
    n = all_i.shape[0]
    scores = all_u[users] @ all_i.T
    valid_m = jnp.ones((b + 1, n), bool).at[mask_rows, mask_items].set(False)[:b]
    if item_valid is not None:
        valid_m = valid_m & item_valid[None, :]
    pos_m = jnp.zeros((b + 1, n), bool).at[pos_rows, pos_items].set(True)[:b]
    auc = auc_rows(scores, pos_m, valid_m)
    w = valid.astype(jnp.float32)
    return jnp.sum(auc * w), jnp.sum(w)


class Evaluator:
    def __init__(
        self,
        model: EmbeddingModel,
        data: DeviceData,
        inter: Interactions,
        cfg: EvalConfig,
        user_subset: Optional[np.ndarray] = None,
    ):
        self.model = model
        self.data = data
        self.cfg = cfg
        self.max_k = max(cfg.topks)

        # test users = users with >=1 test item (`batch_test.py:34-36` evaluates
        # users_to_test = test_set keys); user_subset restricts to a sparsity level
        test_deg = np.diff(inter.test_indptr)
        if user_subset is None:
            test_users = np.nonzero(test_deg > 0)[0].astype(np.int32)
        else:
            test_users = np.asarray(user_subset, dtype=np.int32)
            test_users = test_users[test_deg[test_users] > 0]
        b = cfg.user_batch
        n_batches = max(1, -(-len(test_users) // b))
        pad_n = n_batches * b
        users_pad = np.zeros(pad_n, dtype=np.int32)
        users_pad[: len(test_users)] = test_users
        valid = np.zeros(pad_n, dtype=bool)
        valid[: len(test_users)] = True
        self.users_batched = users_pad.reshape(n_batches, b)
        self.valid_batched = valid.reshape(n_batches, b)

        rows, items = _padded_scatter(
            users_pad, valid, inter.train_indptr, inter.train_indices, b
        )
        self.mask_rows = jnp.asarray(rows)
        self.mask_items = jnp.asarray(items)
        prow, pitem = _padded_scatter(
            users_pad, valid, inter.test_indptr, inter.test_indices, b
        )
        self.pos_rows = jnp.asarray(prow)
        self.pos_items = jnp.asarray(pitem)
        self.users_dev = jnp.asarray(self.users_batched)
        self.valid_dev = jnp.asarray(self.valid_batched)

        # fused masked-retrieval path (`eval.fused`): per-user train masks as a
        # bit-plane bitmap (ops/pallas_score.pack_mask_bitmap) so scoring +
        # masking + exact top-k run in one Pallas kernel without materializing
        # the [B, N] matrix.  Requires a 128-divisible user batch and k <= 64.
        self._bitmap = None
        self._n_pad = 0
        if getattr(cfg, "fused", False):
            n = data.n_items
            n_pad = -(-n // 1024) * 1024
            if b % 128 == 0 and self.max_k <= 64 and n_pad // 128 >= self.max_k:
                if (data.train_bitmap is not None
                        and data.train_bitmap.shape == (inter.n_users, n_pad // 8)):
                    # the bitmap sampler's bitmap already carries the pad-item
                    # bits (train/device.py:_train_bitmap) — share it
                    self._bitmap = data.train_bitmap
                else:
                    from serendipity_tpu.ops.pallas_score import pack_mask_bitmap

                    bm = pack_mask_bitmap(
                        inter.train_indptr, inter.train_indices,
                        inter.n_users, n_pad,
                    )
                    if n_pad > n:  # padded table rows never win, for any user
                        pad_ptr = np.arange(2, dtype=np.int64) * (n_pad - n)
                        pad_bm = pack_mask_bitmap(
                            pad_ptr, np.arange(n, n_pad, dtype=np.int64), 1, n_pad
                        )
                        bm |= pad_bm
                    self._bitmap = jnp.asarray(bm)
                self._n_pad = n_pad

        from serendipity_tpu.train.device import propagate_fn

        self._propagate = propagate_fn(model, data)

    def evaluate(
        self, params: Params, all_emb: Optional[tuple] = None
    ) -> Dict[str, float]:
        """Mean metrics over test users at each configured cutoff."""
        if all_emb is None:
            all_u, all_i = self._propagate(params)
        else:
            all_u, all_i = all_emb
        totals: Dict[str, jnp.ndarray] = {}
        n = None
        if self._bitmap is not None:
            import jax as _jax

            pad = self._n_pad - all_i.shape[0]
            all_i_pad = (
                jnp.concatenate(
                    [all_i, jnp.zeros((pad, all_i.shape[1]), all_i.dtype)], 0
                ) if pad else all_i
            )
            interp = _jax.default_backend() != "tpu"
        protocol = getattr(self.cfg, "protocol", "foldout")
        for bi in range(self.users_dev.shape[0]):
            if self._bitmap is not None:
                sums, cnt = _eval_batch_fused(
                    all_u, all_i_pad,
                    self.users_dev[bi], self.valid_dev[bi],
                    self._bitmap,
                    self.data.test_indptr, self.data.test_indices,
                    max_k=self.max_k, interpret=interp, protocol=protocol,
                )
            else:
                sums, cnt = _eval_batch(
                    all_u, all_i,
                    self.users_dev[bi], self.valid_dev[bi],
                    self.mask_rows[bi], self.mask_items[bi],
                    self.data.test_indptr, self.data.test_indices,
                    max_k=self.max_k, protocol=protocol,
                )
            # accumulate ON DEVICE: forcing each batch to the host (np.asarray)
            # serializes one full tunnel RPC per batch (~77 ms x n_batches,
            # dominating eval wall time); keeping the adds as device values
            # lets the per-batch dispatches pipeline, with one sync at the end
            n = cnt if n is None else n + cnt
            for k, v in sums.items():
                totals[k] = v if k not in totals else totals[k] + v
        n = max(float(n), 1.0)
        out: Dict[str, float] = {}
        metrics = (
            ("hr", "ndcg", "mrr") if protocol == "loo" else self.cfg.metrics
        )
        for metric in metrics:
            host = np.asarray(totals[metric])
            for k in self.cfg.topks:
                out[f"{metric}@{k}"] = float(host[k - 1] / n)
        return out

    def evaluate_auc(
        self, params: Params, all_emb: Optional[tuple] = None
    ) -> float:
        """Mean per-user ROC AUC over test users (`code/utils.py:265-274`)."""
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
            )
            tot += float(s)
            n += float(cnt)
        return tot / max(n, 1.0)


def sparsity_report(
    model: EmbeddingModel,
    data: DeviceData,
    inter: Interactions,
    cfg: EvalConfig,
    params: Optional[Params] = None,
    all_emb: Optional[tuple] = None,
    evaluator_factory=None,
) -> List[Tuple[str, Dict[str, float]]]:
    """Per-sparsity-level metrics, the contract of the reference `--report` path
    (`LightGCN-tf/LightGCN.py:526-560`): split test users into rating-volume
    quartiles and evaluate each group independently.  `evaluator_factory`
    (uids -> Evaluator) lets the mesh path substitute a ShardedEvaluator."""
    groups, states = sparsity_split(inter)
    if all_emb is None:
        from serendipity_tpu.train.device import propagate_fn

        all_emb = propagate_fn(model, data)(params)
    factory = evaluator_factory or (
        lambda uids: Evaluator(model, data, inter, cfg, user_subset=uids)
    )
    out = []
    for uids, state in zip(groups, states):
        ev = factory(uids)
        out.append((state, ev.evaluate(params, all_emb=all_emb)))
    return out
