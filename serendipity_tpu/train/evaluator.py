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
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from serendipity_tpu.config import EvalConfig
from serendipity_tpu.data.datasets import Interactions
from serendipity_tpu.models.lightgcn import EmbeddingModel, Params
from serendipity_tpu.ops.metrics import hit_matrix, ranking_metrics_cumulative
from serendipity_tpu.train.device import DeviceData


class Evaluator:
    def __init__(
        self,
        model: EmbeddingModel,
        data: DeviceData,
        inter: Interactions,
        cfg: EvalConfig,
    ):
        self.model = model
        self.data = data
        self.cfg = cfg
        self.max_k = max(cfg.topks)

        # test users = users with >=1 test item (`batch_test.py:34-36` evaluates
        # users_to_test = test_set keys)
        test_deg = np.diff(inter.test_indptr)
        test_users = np.nonzero(test_deg > 0)[0].astype(np.int32)
        b = cfg.user_batch
        n_batches = max(1, -(-len(test_users) // b))
        pad_n = n_batches * b
        users_pad = np.zeros(pad_n, dtype=np.int32)
        users_pad[: len(test_users)] = test_users
        valid = np.zeros(pad_n, dtype=bool)
        valid[: len(test_users)] = True
        self.users_batched = users_pad.reshape(n_batches, b)
        self.valid_batched = valid.reshape(n_batches, b)

        # padded per-batch train-item scatter lists (dummy row index = b), built
        # fully vectorized (the python per-user loop cost minutes at 162k users)
        tr_ptr, tr_idx = inter.train_indptr, inter.train_indices
        deg = np.diff(tr_ptr)
        deg_sel = np.where(valid, deg[users_pad], 0).astype(np.int64)
        total = int(deg_sel.sum())
        # flat positions into tr_idx for every (padded user, own-item) pair
        starts = tr_ptr[users_pad]
        csum = np.zeros(pad_n + 1, np.int64)
        np.cumsum(deg_sel, out=csum[1:])
        pos = (
            np.repeat(starts, deg_sel)
            + np.arange(total, dtype=np.int64)
            - np.repeat(csum[:-1], deg_sel)
        )
        items_flat = tr_idx[pos].astype(np.int32)
        rows_flat = np.repeat(
            (np.arange(pad_n, dtype=np.int32) % b), deg_sel
        )
        batch_of = np.repeat(np.arange(pad_n, dtype=np.int64) // b, deg_sel)
        batch_nnz = np.bincount(batch_of, minlength=n_batches)
        m = max(int(batch_nnz.max()), 1)
        rows = np.full((n_batches, m), b, dtype=np.int32)
        items = np.zeros((n_batches, m), dtype=np.int32)
        bstart = np.zeros(n_batches + 1, np.int64)
        np.cumsum(batch_nnz, out=bstart[1:])
        within = np.arange(total, dtype=np.int64) - bstart[batch_of]
        rows[batch_of, within] = rows_flat
        items[batch_of, within] = items_flat
        self.mask_rows = jnp.asarray(rows)
        self.mask_items = jnp.asarray(items)
        self.users_dev = jnp.asarray(self.users_batched)
        self.valid_dev = jnp.asarray(self.valid_batched)

        self._propagate = jax.jit(
            lambda p: model.propagate(p, data.adj, spmm_ops=data.spmm_ops)
        )
        self._batch_fn = jax.jit(self._build_batch_fn())

    def _build_batch_fn(self):
        data, max_k = self.data, self.max_k
        b = self.cfg.user_batch

        def batch_fn(all_u, all_i, users, valid, mask_rows, mask_items):
            scores = all_u[users] @ all_i.T                       # [b, n_items] (MXU)
            scores = jnp.concatenate(
                [scores, jnp.zeros((1, scores.shape[1]), scores.dtype)], axis=0
            )
            scores = scores.at[mask_rows, mask_items].set(-jnp.inf)[:b]
            # exact two-stage top-k: ~10x cheaper than lax.top_k's full sort at
            # catalog widths (see ops/topk.py)
            from serendipity_tpu.ops.topk import topk_exact_2stage

            _, top_items = topk_exact_2stage(scores, max_k)       # [b, K]

            lo = data.test_indptr[users]
            hi = data.test_indptr[users + 1]
            hits = hit_matrix(top_items, lo, hi, data.test_indices)
            truth_len = (hi - lo).astype(jnp.float32)
            per_user = ranking_metrics_cumulative(hits, truth_len)
            w = valid.astype(jnp.float32)[:, None]
            sums = {k: jnp.sum(v * w, axis=0) for k, v in per_user.items()}
            return sums, jnp.sum(w)

        return batch_fn

    def evaluate(
        self, params: Params, all_emb: Optional[tuple] = None
    ) -> Dict[str, float]:
        """Mean metrics over test users at each configured cutoff."""
        if all_emb is None:
            all_u, all_i = self._propagate(params)
        else:
            all_u, all_i = all_emb
        totals: Dict[str, np.ndarray] = {}
        n = 0.0
        for bi in range(self.users_dev.shape[0]):
            sums, cnt = self._batch_fn(
                all_u, all_i,
                self.users_dev[bi], self.valid_dev[bi],
                self.mask_rows[bi], self.mask_items[bi],
            )
            n += float(cnt)
            for k, v in sums.items():
                acc = totals.setdefault(k, np.zeros(self.max_k))
                acc += np.asarray(v)
        out: Dict[str, float] = {}
        for metric in self.cfg.metrics:
            for k in self.cfg.topks:
                out[f"{metric}@{k}"] = float(totals[metric][k - 1] / max(n, 1.0))
        return out
