"""Serendipity and factor metrics + disentanglement, on device.

Capability match for `utils.py` (P12): the two serendipity metrics (ser1, ser2), the
label-based HR_ser / NDCG_ser, the four factor metrics (novelty / unpopularity /
quality / diversity), the IQR outlier-excluded cross-method max normalization of
`evaluate()` (`utils.py:482-697`, mem_enough path), and the pairwise strategy
disentanglement matrices (`utils.py:344-470`).

Result row layout matches the reference res matrix (`utils.py:546`, `main.py:77`):
    [nov, unpop, qua, acc, dif, div, ser1, ser2]
(the reference's live loop fills only columns 3/4/6/7; we fill all eight).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from functools import partial

from serendipity_tpu.data.datasets import Interactions
from serendipity_tpu.ops.search import contains_in_rows
from serendipity_tpu.utils.aot import aot_call
from serendipity_tpu.rec.strategies import (
    item_item_minmax,
    loop_user_blocks,
    max_sim_chunked,
    padded_rows_device,
)


def exclude_outliers(data: np.ndarray) -> np.ndarray:
    """IQR filter (`utils.py:471-481`)."""
    q1, q3 = np.percentile(data, 25), np.percentile(data, 75)
    iqr = q3 - q1
    lo, hi = q1 - 1.5 * iqr, q3 + 1.5 * iqr
    return data[(data >= lo) & (data <= hi)]


@jax.jit
def _membership_sorted_rows(queries: jnp.ndarray, sorted_rows: jnp.ndarray) -> jnp.ndarray:
    """queries [B, K] membership in sorted_rows [B, M] (each row sorted asc)."""
    b, m = sorted_rows.shape
    k = queries.shape[1]
    flat = sorted_rows.reshape(-1)
    base = (jnp.arange(b) * m)[:, None]
    lo = jnp.broadcast_to(base, (b, k)).reshape(-1)
    hi = jnp.broadcast_to(base + m, (b, k)).reshape(-1)
    return contains_in_rows(flat, lo, hi, queries.reshape(-1)).reshape(b, k)


@partial(jax.jit, static_argnames=("n_items", "h_te", "h_tr", "block"))
def _acc_dif_device(
    mat_rec: jnp.ndarray,       # [U, K] int32
    ei_pad: jnp.ndarray,        # [N+1, D]
    te_ptr: jnp.ndarray, te_idx: jnp.ndarray,
    tr_ptr: jnp.ndarray, tr_idx: jnp.ndarray,
    n_items: int, h_te: int, h_tr: int, block: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One dispatch for all users: (max-sim of rec items to TEST items,
    max-sim to TRAIN items), each [U_pad, K]."""

    def blk(rows):
        rec_emb = ei_pad[mat_rec[rows]]
        te = padded_rows_device(te_ptr, te_idx, rows, h_te, n_items)
        tr = padded_rows_device(tr_ptr, tr_idx, rows, h_tr, n_items)
        return (
            max_sim_chunked(rec_emb, te, ei_pad, n_items),
            max_sim_chunked(rec_emb, tr, ei_pad, n_items),
        )

    return loop_user_blocks(blk, mat_rec.shape[0], block=block)


@partial(jax.jit, static_argnames=("n_items", "h_te", "h_tr", "block"))
def _acc_dif_subset(
    rec_s: jnp.ndarray,         # [B_sub, K] gathered rec rows
    ei_pad: jnp.ndarray,
    te_start: jnp.ndarray, te_deg: jnp.ndarray, te_idx: jnp.ndarray,
    tr_start: jnp.ndarray, tr_deg: jnp.ndarray, tr_idx: jnp.ndarray,
    n_items: int, h_te: int, h_tr: int, block: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """`_acc_dif_device` over a degree bucket (pre-gathered user subset) —
    padded-history widths sized to the bucket, not the global max."""
    from serendipity_tpu.rec.strategies import padded_rows_start_deg

    def blk(rows):
        rec_emb = ei_pad[rec_s[rows]]
        te = padded_rows_start_deg(te_start[rows], te_deg[rows], te_idx, h_te, n_items)
        tr = padded_rows_start_deg(tr_start[rows], tr_deg[rows], tr_idx, h_tr, n_items)
        return (
            max_sim_chunked(rec_emb, te, ei_pad, n_items),
            max_sim_chunked(rec_emb, tr, ei_pad, n_items),
        )

    return loop_user_blocks(blk, rec_s.shape[0], block=min(block, rec_s.shape[0]))


@partial(jax.jit, static_argnames=("n_items", "h_tr", "block"))
def _ser2_device(
    mat_rec: jnp.ndarray,       # [U, K] int32
    pm_sorted: jnp.ndarray,     # [U, M] int32, rows sorted asc
    ei_pad: jnp.ndarray,
    tr_ptr: jnp.ndarray, tr_idx: jnp.ndarray,
    ii_min: jnp.ndarray,        # scalar f32
    n_items: int, h_tr: int, block: int,
) -> jnp.ndarray:
    """One dispatch for all users: per-user mean train-max-sim over rec items NOT
    in the pm baseline, ii_min when all slots are in pm -> [U_pad]."""

    def blk(rows):
        rec = mat_rec[rows]
        keep = ~_membership_sorted_rows(rec, pm_sorted[rows])
        rec_emb = ei_pad[rec]
        tr = padded_rows_device(tr_ptr, tr_idx, rows, h_tr, n_items)
        ms = max_sim_chunked(rec_emb, tr, ei_pad, n_items)
        cnt = keep.sum(axis=1)
        summed = (ms * keep).sum(axis=1)
        return (jnp.where(cnt > 0, summed / jnp.maximum(cnt, 1), ii_min),)

    return loop_user_blocks(blk, mat_rec.shape[0], block=block)[0]


@partial(jax.jit, static_argnames=("half",))
def _pm_halves_dev(cand: jnp.ndarray, qua_feat: jnp.ndarray,
                   pop_feat: jnp.ndarray, half: int) -> jnp.ndarray:
    """Device form of `create_pm`'s two top-half selections: [U, 2*half] ids =
    top `half` candidates by quality feature ++ top `half` by popularity."""
    from serendipity_tpu.ops.topk import topk_exact_2stage

    _, qi = topk_exact_2stage(qua_feat[cand], half)
    _, pi = topk_exact_2stage(pop_feat[cand], half)
    return jnp.concatenate(
        [jnp.take_along_axis(cand, qi, axis=1),
         jnp.take_along_axis(cand, pi, axis=1)], axis=1
    ).astype(jnp.int32)


@jax.jit
def _mean_pairwise_dots(rec: jnp.ndarray, ei_dev: jnp.ndarray) -> jnp.ndarray:
    """Per-user mean pairwise dot of the rec items' embeddings.  The embedding
    gather lives INSIDE the jit: a first-use EAGER gather at [162k, 20, 64]
    costs a ~44 s relay compile every process (round-5 probe), and eager ops
    bypass the AOT executable cache."""
    rec_emb = ei_dev[rec]
    g = jnp.einsum(
        "ukd,ujd->ukj", rec_emb, rec_emb, preferred_element_type=jnp.float32
    )
    return jnp.mean(g, axis=(1, 2))


@jax.jit
def _chamfer_pair(
    ra: jnp.ndarray, rb: jnp.ndarray, en_dev: jnp.ndarray,
    cos_min: jnp.ndarray, cos_max: jnp.ndarray, eps: jnp.ndarray,
) -> jnp.ndarray:
    cos = jnp.einsum(
        "ukd,ujd->ukj", en_dev[ra], en_dev[rb], preferred_element_type=jnp.float32
    )
    dist = (1.0 - cos) / 2.0
    dist = jnp.where(jnp.abs(dist) <= eps, 0.0, dist)
    dist = (dist - cos_min) / jnp.maximum(cos_max - cos_min, 1e-12)
    ab = jnp.mean(jnp.min(dist, axis=2), axis=1)
    ba = jnp.mean(jnp.min(dist, axis=1), axis=1)
    return jnp.stack([ab, ba], axis=1)


@partial(jax.jit, static_argnames=("k",))
def _ideal_avg_linkage_batch(recs, en_items, f_mn, rng_inv, k):
    """[B] best mean total linkage (`utils.py:355-363`): linkage is affine in the
    item embedding, so the whole normalizer is one matmul + exact top-k."""
    from serendipity_tpu.ops.topk import topk_exact_2stage

    rec_sum = jnp.sum(en_items[recs], axis=1)                 # [B, D]
    lin = (k - rec_sum @ en_items.T) * 0.5                    # sum of raw distances
    lin_n = (lin - k * f_mn) * rng_inv                        # sum of normalized
    top, _ = topk_exact_2stage(lin_n, k)
    return jnp.sum(top, axis=1) / k


@partial(jax.jit, static_argnames=("k", "block", "n_real"))
def _ideal_min_cos_diff_batch(recs, en_items, f_mn, rng_inv, k, block, n_real):
    """[B] `find_max_min_cosDiff` DP (`utils.py:365-382`) vmapped over users.

    State per user: dp [k+1] best sums-of-minima, md [k+1, krec] running minima.
    Items advance sequentially (fori over blocks, fori within a block, matmul per
    block on the MXU); the j-transitions are unrolled (k is small).  The
    reference's `j <= i+1` cap (can't pick j items from fewer than j seen) is a
    traced gate, and catalog padding is gated by `n_real`."""
    bu, krec = recs.shape
    n_pad, d = en_items.shape
    en_rec = en_items[recs]                                   # [B, krec, D]
    dp0 = jnp.zeros((bu, k + 1), jnp.float32)
    md0 = jnp.full((bu, k + 1, krec), 1e6, jnp.float32)

    def blk_body(bi, st):
        dp, md = st
        eb = jax.lax.dynamic_slice(en_items, (bi * block, 0), (block, d))
        dblk = jnp.einsum(
            "ukd,bd->ukb", en_rec, eb, preferred_element_type=jnp.float32
        )
        dblk = ((1.0 - dblk) * 0.5 - f_mn) * rng_inv          # normalized distance

        def item_body(t, st2):
            dp, md = st2
            gi = bi * block + t                               # global item index
            d_i = jax.lax.dynamic_index_in_dim(dblk, t, axis=2, keepdims=False)
            live = gi < n_real
            for j in range(k, 0, -1):
                cand = jnp.minimum(md[:, j - 1], d_i)
                s = jnp.sum(cand, axis=1)
                upd = (s > dp[:, j]) & (j <= gi + 1) & live
                dp = dp.at[:, j].set(jnp.where(upd, s, dp[:, j]))
                md = md.at[:, j].set(jnp.where(upd[:, None], cand, md[:, j]))
            return dp, md

        return jax.lax.fori_loop(0, block, item_body, (dp, md))

    dp, _ = jax.lax.fori_loop(0, n_pad // block, blk_body, (dp0, md0))
    return dp[:, k] / k


@jax.jit
def _mean_dist_pair(
    ra: jnp.ndarray, rb: jnp.ndarray, en_dev: jnp.ndarray,
    f_mn: jnp.ndarray, f_mx: jnp.ndarray,
) -> jnp.ndarray:
    cos = jnp.einsum(
        "ukd,ujd->ukj", en_dev[ra], en_dev[rb], preferred_element_type=jnp.float32
    )
    d = ((1.0 - cos) / 2.0 - f_mn) / jnp.maximum(f_mx - f_mn, 1e-12)
    return jnp.mean(d, axis=(1, 2))


class SerendipityEvaluator:
    def __init__(
        self,
        inter: Interactions,
        emb_item: np.ndarray,
        user_block: int = 8192,
        mesh=None,                  # jax Mesh: shard the user axis over devices
    ):
        self.inter = inter
        self.emb_item = np.asarray(emb_item, np.float32)
        self.user_block = user_block
        self.mesh = mesh
        self.n_users, self.n_items = inter.n_users, inter.n_items
        self.ei_dev = jnp.asarray(self.emb_item)
        self.ei_pad = jnp.concatenate(
            [self.ei_dev, jnp.zeros((1, self.emb_item.shape[1]))], axis=0
        )
        # global I.I^T min/max (`utils.py:487-529`)
        self.ii_min, self.ii_max = item_item_minmax(self.emb_item)
        # ser1 (acc vs test, dif vs train) is defined only for users with nonempty
        # test and train sets.  The reference's datasets guarantee both
        # (`generateSerData` temporal split); general graphs (e.g. synthetic) may
        # not, so those users are excluded from the per-user means instead of
        # poisoning them with -inf max-over-empty similarities.
        self.has_test = np.diff(inter.test_indptr) > 0
        self.has_train = np.diff(inter.train_indptr) > 0
        self.ser1_valid = self.has_test & self.has_train
        # device CSR copies + static padded-history widths (multiples of the
        # max-sim chunk so the chunked reduction divides evenly)
        self._te_ptr = jnp.asarray(inter.test_indptr, jnp.int32)
        self._te_idx = jnp.asarray(inter.test_indices, jnp.int32)
        self._tr_ptr = jnp.asarray(inter.train_indptr, jnp.int32)
        self._tr_idx = jnp.asarray(inter.train_indices, jnp.int32)

        def _width(ptr):
            d = int(np.diff(ptr).max()) if len(ptr) > 1 else 1
            return ((max(d, 1) + 127) // 128) * 128

        self._h_te = _width(inter.test_indptr)
        self._h_tr = _width(inter.train_indptr)
        self._en_dev = None   # unit-normalized item table, built on first chamfer

    # ---- ser1 ---------------------------------------------------------------

    def acc_dif_arrays(
        self, mat_rec: np.ndarray, return_raw_tr: bool = False
    ):
        """Per-(user, rec-slot) acc and dif (`utils.py:23-38`):
        acc = norm(max-sim of rec item to TEST items),
        dif = 1 - norm(max-sim of rec item to TRAIN items)."""
        u, k = mat_rec.shape
        denom = max(self.ii_max - self.ii_min, 1e-12)
        if self.mesh is not None:
            from serendipity_tpu.parallel.study import (
                acc_dif_sharded, csr_start_deg, mesh_devices,
            )
            from serendipity_tpu.rec.strategies import degree_buckets

            nd = mesh_devices(self.mesh)
            te_s, te_d = csr_start_deg(self.inter.test_indptr)
            tr_s, tr_d = csr_start_deg(self.inter.train_indptr)
            tr_deg_all = np.diff(self.inter.train_indptr)
            te_deg_all = np.diff(self.inter.test_indptr)
            rec32 = mat_rec.astype(np.int32)
            ms_te = np.empty((u, k), np.float32)
            ms_tr = np.empty((u, k), np.float32)
            # degree-bucketed like the single-chip path, nd-padded per bucket
            for users_b, h_tr_b in degree_buckets(tr_deg_all):
                h_te_b = ((max(int(te_deg_all[users_b].max(initial=1)), 1)
                           + 127) // 128) * 128
                nb = len(users_b)
                pad = (-nb) % nd
                sub = users_b[np.minimum(np.arange(nb + pad), nb - 1)]
                a_b, d_b = acc_dif_sharded(
                    self.mesh,
                    jnp.asarray(rec32[sub]), self.ei_pad,
                    jnp.asarray(te_s[sub]), jnp.asarray(te_d[sub]),
                    self._te_idx,
                    jnp.asarray(tr_s[sub]), jnp.asarray(tr_d[sub]),
                    self._tr_idx,
                    n_items=self.n_items, h_te=h_te_b, h_tr=h_tr_b,
                    block=self.user_block,
                )
                ms_te[users_b] = np.asarray(a_b[:nb])
                ms_tr[users_b] = np.asarray(d_b[:nb])
        else:
            # degree-bucketed (see strategies.degree_buckets): whale users get
            # the true max history width, everyone else the P95 width
            from serendipity_tpu.rec.strategies import degree_buckets

            tr_deg_all = np.diff(self.inter.train_indptr)
            te_deg_all = np.diff(self.inter.test_indptr)
            tr_starts = self.inter.train_indptr[:-1].astype(np.int32)
            te_starts = self.inter.test_indptr[:-1].astype(np.int32)
            ms_te = np.empty((u, k), np.float32)
            ms_tr = np.empty((u, k), np.float32)
            for users_b, h_tr_b in degree_buckets(tr_deg_all):
                h_te_b = ((max(int(te_deg_all[users_b].max(initial=1)), 1)
                           + 127) // 128) * 128

                a_b, d_b = aot_call(
                    _acc_dif_subset,
                    (jnp.asarray(mat_rec[users_b], jnp.int32), self.ei_pad,
                     jnp.asarray(te_starts[users_b]),
                     jnp.asarray(te_deg_all[users_b].astype(np.int32)),
                     self._te_idx,
                     jnp.asarray(tr_starts[users_b]),
                     jnp.asarray(tr_deg_all[users_b].astype(np.int32)),
                     self._tr_idx),
                    static=dict(n_items=self.n_items, h_te=h_te_b, h_tr=h_tr_b,
                                block=self.user_block),
                )
                ms_te[users_b] = np.asarray(a_b[: len(users_b)])
                ms_tr[users_b] = np.asarray(d_b[: len(users_b)])
            denom = max(self.ii_max - self.ii_min, 1e-12)
            acc = (ms_te - self.ii_min) / denom
            dif = 1.0 - (ms_tr - self.ii_min) / denom
            if return_raw_tr:
                return acc.astype(np.float32), dif.astype(np.float32), ms_tr
            return acc.astype(np.float32), dif.astype(np.float32)
        ms_te = np.asarray(ms_te[:u])
        ms_tr = np.asarray(ms_tr[:u])
        acc = (ms_te - self.ii_min) / denom
        dif = 1.0 - (ms_tr - self.ii_min) / denom
        if return_raw_tr:
            # raw train max-sims feed ser2 for free (`ser2_from_ms`) — computing
            # them again in `_ser2_device` doubled the evaluate-stage wall
            return acc.astype(np.float32), dif.astype(np.float32), ms_tr
        return acc.astype(np.float32), dif.astype(np.float32)

    @staticmethod
    def ser1_from_acc_dif(acc: np.ndarray, dif: np.ndarray) -> float:
        """Harmonic mean (`utils.py:36`)."""
        return float(np.mean(2 * acc * dif / np.maximum(acc + dif, 1e-12)))

    # ---- pm baseline + ser2 -------------------------------------------------

    def create_pm(
        self, candidates: np.ndarray, k: int = 200, cand_dev=None
    ) -> np.ndarray:
        """Pseudo-baseline: top k/2 by quality + top k/2 by popularity from each
        user's candidates (`utils.py:70-114`).

        With a device-resident candidate matrix (`cand_dev`) the two top-half
        selections run on device and only [U, k] ids come back — the host
        argsorts over [162k, 1000] cost ~31 s of the evaluate stage at ML-25M
        scale (round-5 eval_pm tape).  Selection among TIED feature values is
        deterministic on device (`lax.top_k`: lowest candidate index) where the
        host path's unstable argpartition-order was arbitrary."""
        from serendipity_tpu.data.datasets import derive_item_metadata

        if self.inter.item_counts is None or self.inter.item_mean_ratings is None:
            derive_item_metadata(self.inter)
        # datasets without rating columns (adjacency-list format) have no mean
        # ratings even after derivation; quality degenerates to a constant
        mean_rating = np.asarray(
            self.inter.item_mean_ratings
            if self.inter.item_mean_ratings is not None
            else np.zeros(self.n_items),
            np.float32,
        )
        counts = np.asarray(self.inter.item_counts, np.float32)
        # numpy's [:, :half] silently clips to the candidate width; match it
        half = min(k // 2, candidates.shape[1])
        if cand_dev is not None:

            pm = aot_call(
                _pm_halves_dev,
                (cand_dev, jnp.asarray(mean_rating), jnp.asarray(counts)),
                static=dict(half=half),
            )
            if self.n_items <= np.iinfo(np.uint16).max:
                return np.asarray(pm.astype(jnp.uint16)).astype(np.int32)
            return np.asarray(pm)
        qua_vals = mean_rating[candidates]
        pop_vals = counts[candidates]
        qua_idx = np.argsort(-qua_vals, axis=1)[:, :half]
        pop_idx = np.argsort(-pop_vals, axis=1)[:, :half]
        return np.concatenate(
            [
                np.take_along_axis(candidates, qua_idx, axis=1),
                np.take_along_axis(candidates, pop_idx, axis=1),
            ],
            axis=1,
        ).astype(np.int32)

    def ser2_from_ms(
        self, mat_rec: np.ndarray, pm_sorted_keys: np.ndarray, ms_tr: np.ndarray
    ) -> float:
        """`ser2` from already-computed raw train max-sims (`acc_dif_arrays`
    return_raw_tr) — only the pm-membership test remains, done on the host with
    one searchsorted over row-offset keys.  Identical value to `ser2`."""
        u = mat_rec.shape[0]
        big = self.n_items + 1
        q = (np.arange(u, dtype=np.int64)[:, None] * big + mat_rec).ravel()
        pos = np.searchsorted(pm_sorted_keys, q)
        pos_c = np.minimum(pos, len(pm_sorted_keys) - 1)
        keep = ~(pm_sorted_keys[pos_c] == q).reshape(u, -1)
        cnt = keep.sum(axis=1)
        summed = (ms_tr * keep).sum(axis=1)
        vals = np.where(cnt > 0, summed / np.maximum(cnt, 1), self.ii_min)
        vals = vals[self.has_train]
        return float(
            (vals.mean() - self.ii_min) / max(self.ii_max - self.ii_min, 1e-12)
        )

    @staticmethod
    def pm_row_keys(pm: np.ndarray, n_items: int) -> np.ndarray:
        """Globally sorted row-offset keys of the pm baseline for `ser2_from_ms`."""
        u = pm.shape[0]
        big = n_items + 1
        keys = (np.arange(u, dtype=np.int64)[:, None] * big + np.sort(pm, axis=1)).ravel()
        return keys

    def ser2(self, mat_rec: np.ndarray, pm: np.ndarray) -> float:
        """Unexpectedness vs the popularity/quality baseline (`utils.py:117-142`):
        per user, mean over rec items NOT in pm of (max-sim to train), min_dis when
        empty; final value min-max normalized by the global I.I^T range."""
        u, k = mat_rec.shape
        if self.mesh is not None:
            from serendipity_tpu.parallel.study import (
                csr_start_deg, mesh_devices, pad_users, ser2_sharded,
            )

            nd = mesh_devices(self.mesh)
            tr_s, tr_d = csr_start_deg(self.inter.train_indptr)
            dev_vals = ser2_sharded(
                self.mesh,
                jnp.asarray(pad_users(mat_rec.astype(np.int32), nd)),
                jnp.asarray(pad_users(np.sort(pm, axis=1).astype(np.int32), nd)),
                self.ei_pad,
                jnp.asarray(pad_users(tr_s, nd)), jnp.asarray(pad_users(tr_d, nd)),
                self._tr_idx, jnp.float32(self.ii_min),
                n_items=self.n_items, h_tr=self._h_tr, block=self.user_block,
            )
        else:

            dev_vals = aot_call(
                _ser2_device,
                (jnp.asarray(mat_rec, jnp.int32),
                 jnp.asarray(np.sort(pm, axis=1), jnp.int32),
                 self.ei_pad, self._tr_ptr, self._tr_idx,
                 jnp.float32(self.ii_min)),
                static=dict(n_items=self.n_items, h_tr=self._h_tr,
                            block=self.user_block),
            )
        vals = np.asarray(dev_vals[:u])
        # users with no train history have no max-sim; exclude (see ser1_valid note)
        vals = vals[self.has_train]
        return float(
            (vals.mean() - self.ii_min) / max(self.ii_max - self.ii_min, 1e-12)
        )

    # ---- label-based metrics ------------------------------------------------

    def _test_labels(self) -> np.ndarray:
        if self.inter.test_ser_labels is not None:
            return np.asarray(self.inter.test_ser_labels, np.float64)
        return np.ones(self.inter.n_test)  # unlabeled data: every test item positive

    def _rec_relevance(
        self, mat_rec: np.ndarray, glb_ser_score: float, only_pos: bool
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Per-(user, rec-slot) graded relevance from serLabels via on-device CSR
        membership search: 1 for a positively-labeled test hit, glb for a
        negative-label hit (0 if only_pos), 0 for a miss.  Returns (rel [U, K],
        has_test [U])."""
        labels = self._test_labels().astype(np.float32)
        ptr = self.inter.test_indptr
        idx = jnp.asarray(self.inter.test_indices, jnp.int32)
        lab = jnp.asarray(labels)
        u, k = mat_rec.shape
        lo = jnp.repeat(jnp.asarray(ptr[:-1], jnp.int32), k)
        hi = jnp.repeat(jnp.asarray(ptr[1:], jnp.int32), k)
        q = jnp.asarray(mat_rec.reshape(-1), jnp.int32)
        from serendipity_tpu.ops.search import searchsorted_in_rows

        pos = searchsorted_in_rows(idx, lo, hi, q)
        found = (pos < hi) & (idx[jnp.clip(pos, 0, idx.shape[0] - 1)] == q)
        lab_hit = lab[jnp.clip(pos, 0, lab.shape[0] - 1)]
        if only_pos:
            # `only_pos_ser` treats every test item as a positive
            # (`utils.py:199-200,213-215`: membership only, labels ignored)
            rel = jnp.where(found, 1.0, 0.0).reshape(u, k)
        else:
            rel = jnp.where(
                found, jnp.where(lab_hit > 0.9999, 1.0, glb_ser_score), 0.0
            ).reshape(u, k)
        has_test = np.diff(ptr) > 0
        return np.asarray(rel), has_test

    def hr_ser(
        self, mat_rec: np.ndarray, glb_ser_score: float = 0.0, only_pos: bool = False
    ) -> float:
        """`HR_ser` (`utils.py:144-176`): 1 if any positively-labeled test item is in
        the rec list; soft glb_ser_score if only negative-label test items hit."""
        rel, has_test = self._rec_relevance(mat_rec, glb_ser_score, only_pos)
        pos_hit = (rel >= 1.0 - 1e-9).any(axis=1)
        any_hit = (rel > 0).any(axis=1) if not only_pos else pos_hit
        per_user = np.where(pos_hit, 1.0, np.where(any_hit, glb_ser_score, 0.0))
        return float(per_user[has_test].mean()) if has_test.any() else 0.0

    def ndcg_ser(
        self, mat_rec: np.ndarray, glb_ser_score: float = 0.0, only_pos: bool = False
    ) -> float:
        """`NDCG_ser` (`utils.py:180-243`): graded relevance (1 / glb / 0) per rec
        position, gain 2^rel - 1, iDCG from the sorted relevance of the same list."""
        rel, has_test = self._rec_relevance(mat_rec, glb_ser_score, only_pos)
        k = mat_rec.shape[1]
        disc = 1.0 / np.log2(np.arange(2, k + 2))
        gains = 2.0 ** rel - 1.0
        dcg = (gains * disc).sum(axis=1)
        ideal = np.sort(gains, axis=1)[:, ::-1]
        idcg = (ideal * disc).sum(axis=1)
        per_user = np.where(idcg > 0, dcg / np.maximum(idcg, 1e-12), 0.0)
        return float(per_user[has_test].mean()) if has_test.any() else 0.0

    # ---- factor metrics -----------------------------------------------------

    def factor_metrics(self, mat_rec: np.ndarray) -> Dict[str, float]:
        """novelty/unpopularity/quality (`utils.py:245-262`) + diversity
        (`utils.py:265-287`)."""
        from serendipity_tpu.data.datasets import derive_item_metadata

        if self.inter.item_counts is None:
            derive_item_metadata(self.inter)
        out: Dict[str, float] = {}
        flat = mat_rec.reshape(-1)

        def norm_feat(f):
            f = np.asarray(f, np.float64)
            return (f - f.min()) / max(f.max() - f.min(), 1e-12)

        dates = self.inter.item_dates
        out["nov"] = float(norm_feat(dates)[flat].mean()) if dates is not None else 0.0
        out["unpop"] = float((1.0 - norm_feat(self.inter.item_counts))[flat].mean())
        mr = self.inter.item_mean_ratings
        out["qua"] = float(norm_feat(mr)[flat].mean()) if mr is not None else 0.0

        # diversity: 1 - norm(mean pairwise dot of rec embeddings), per user

        mp = np.asarray(
            aot_call(
                _mean_pairwise_dots,
                (jnp.asarray(mat_rec, jnp.int32), self.ei_dev),
            )
        )
        out["div"] = float(
            np.mean(1.0 - (mp - self.ii_min) / max(self.ii_max - self.ii_min, 1e-12))
        )
        return out

    # ---- cross-method evaluation (`utils.py:482-697`, mem_enough path) ------

    def evaluate_methods(
        self,
        recs: Dict[str, np.ndarray],
        candidates: Optional[np.ndarray] = None,
        pm: Optional[np.ndarray] = None,
        cand_dev=None,                      # device candidates: pm on device
    ) -> Dict[str, Dict[str, float]]:
        """Returns per-method metric dicts with the outlier-excluded cross-method max
        normalization of acc/dif (`utils.py:657-671`)."""
        from serendipity_tpu.utils.timing import timer

        if pm is None:
            if candidates is None:
                raise ValueError("need candidates or pm for ser2")
            with timer("eval_pm"):
                pm = self.create_pm(candidates, cand_dev=cand_dev)

        valid = self.ser1_valid
        pm_keys = self.pm_row_keys(pm, self.n_items)
        accs, difs, ser2s = {}, {}, {}
        for m, rec in recs.items():
            with timer("eval_acc_dif"):
                a, d, ms_tr = self.acc_dif_arrays(rec, return_raw_tr=True)
            accs[m], difs[m] = a[valid], d[valid]
            with timer("eval_ser2"):
                ser2s[m] = self.ser2_from_ms(rec, pm_keys, ms_tr)
        acc_max = max(
            float(np.max(exclude_outliers(a.reshape(-1)))) for a in accs.values()
        )
        dif_max = max(
            float(np.max(exclude_outliers(d.reshape(-1)))) for d in difs.values()
        )

        labeled = self.inter.test_ser_labels is not None
        results: Dict[str, Dict[str, float]] = {}
        for m, rec in recs.items():
            a = accs[m] / max(acc_max, 1e-12)
            d = difs[m] / max(dif_max, 1e-12)
            with timer("eval_factor"):
                row = self.factor_metrics(rec)
            row["acc"] = float(a.mean())
            row["dif"] = float(d.mean())
            row["ser1"] = self.ser1_from_acc_dif(a, d)
            row["ser2"] = ser2s[m]
            if labeled:
                # label-based serendipity columns (`utils.py:144-243`), with the
                # reference's soft-negative (glb_ser_score=0.5) and only_pos
                # variants surfaced alongside the hard-label defaults
                row["hr_ser"] = self.hr_ser(rec)
                row["ndcg_ser"] = self.ndcg_ser(rec)
                row["hr_ser_glb"] = self.hr_ser(rec, glb_ser_score=0.5)
                row["ndcg_ser_glb"] = self.ndcg_ser(rec, glb_ser_score=0.5)
                row["hr_ser_onlypos"] = self.hr_ser(rec, only_pos=True)
                row["ndcg_ser_onlypos"] = self.ndcg_ser(rec, only_pos=True)
            results[m] = row
        return results

    @staticmethod
    def result_matrix(results: Dict[str, Dict[str, float]], methods: Sequence[str]) -> np.ndarray:
        """[n_methods, 8] in the reference column order."""
        cols = ("nov", "unpop", "qua", "acc", "dif", "div", "ser1", "ser2")
        return np.array(
            [[results[m][c] for c in cols] for m in methods], dtype=np.float64
        )

    # ---- disentanglement ----------------------------------------------------

    def _norm_cos_minmax(self) -> Tuple[float, float]:
        """Global min/max of the normalized cosine-distance matrix
        (1 - cos)/2 over all item pairs (`utils.py:496-498`); blocked + cached."""
        if getattr(self, "_cos_minmax", None) is None:
            ei = self.emb_item
            norms = np.linalg.norm(ei, axis=1)
            en = ei / np.maximum(norms, 1e-12)[:, None]
            mn, mx = item_item_minmax(en)   # min/max of cosine similarity
            self._cos_minmax = ((1.0 - mx) / 2.0, (1.0 - mn) / 2.0)
        return self._cos_minmax

    def disentanglement_pair(
        self,
        rec_a: np.ndarray,
        rec_b: np.ndarray,
        cos_min: float,
        cos_max: float,
        eps: float = 1e-4,
    ) -> np.ndarray:
        """cosDis_diff with userMaxDistNorm (`utils.py:438-448`): per user, the
        normalized min-cosine-distance chamfer terms [U, 2] = (A->B, B->A)."""
        if self._en_dev is None:
            ei = self.emb_item
            en = ei / np.maximum(np.linalg.norm(ei, axis=1, keepdims=True), 1e-12)
            self._en_dev = jnp.asarray(en.astype(np.float32))
        return np.asarray(
            _chamfer_pair(
                jnp.asarray(rec_a), jnp.asarray(rec_b), self._en_dev,
                jnp.float32(cos_min), jnp.float32(cos_max), jnp.float32(eps),
            )
        )

    def disentanglement_matrix(
        self, recs: Dict[str, np.ndarray], methods: Sequence[str]
    ) -> np.ndarray:
        """Aggregated [M, M] matrix (`utils.py:569-597`): per-user chamfer terms,
        normalized by each row's per-user max, symmetrized, averaged over users."""
        cos_min, cos_max = self._norm_cos_minmax()
        m = len(methods)
        n_u = next(iter(recs.values())).shape[0]
        d = np.zeros((m, m, n_u))
        for i in range(m):
            for j in range(i, m):
                pair = self.disentanglement_pair(
                    recs[methods[i]], recs[methods[j]], cos_min, cos_max
                )
                d[i, j] = pair[:, 0]
                d[j, i] = pair[:, 1]
        max_iu = np.max(d, axis=1)                       # [M, U]
        tmp = d / np.maximum(max_iu[:, None, :], 1e-12) / 2.0
        res = tmp.sum(axis=2) + tmp.transpose(1, 0, 2).sum(axis=2)
        return res / n_u

    # ---- ideal-max normalizers (`utils.py:349-382`) -------------------------
    #
    # Two tiers: the host `max_average_linkage` / `max_min_cos_diff` static
    # methods are direct transliterations of the reference DP (kept as the
    # differential oracle for tests), and the `ideal_*_all` methods below are the
    # production path — device-batched over ALL users, never materializing the
    # N x N item-distance matrix (33 GB at amazon-book scale on the host).

    def ideal_avg_linkage_all(self, recs: np.ndarray, batch: int = 2048) -> np.ndarray:
        """[U] best-possible mean total linkage per rec list, on device.

        linkage(i) = sum_{a in rec} dist_n(a, i) is affine in en_i:
        ((k - sum_a en_a . en_i)/2 - k*mn) / rng — one [B, D] @ [D, N] matmul per
        user batch + an exact top-k, instead of a host N x N materialization.
        """
        f_mn, f_mx = self._norm_cos_minmax()
        en = self._normed_items()
        k = recs.shape[1]
        out = np.empty(recs.shape[0], np.float32)
        for s in range(0, recs.shape[0], batch):
            r = jnp.asarray(recs[s:s + batch])

            out[s:s + batch] = np.asarray(
                aot_call(
                    _ideal_avg_linkage_batch,
                    (r, en, jnp.float32(f_mn),
                     jnp.float32(1.0 / max(f_mx - f_mn, 1e-12))),
                    static=dict(k=k),
                )
            )
        return out

    def ideal_min_cos_diff_all(
        self, recs: np.ndarray, batch: int = 8192, item_block: int = 512
    ) -> np.ndarray:
        """[U] `find_max_min_cosDiff` (`utils.py:365-382`) for every rec list at
        once: the sequential greedy DP runs as a `lax.fori_loop` over catalog
        blocks with the per-user DP state vmapped across the batch dimension —
        the catalog axis stays sequential (the recurrence demands it) but all
        users advance in lockstep on the VPU."""
        f_mn, f_mx = self._norm_cos_minmax()
        en = self._normed_items()
        n = en.shape[0]
        pad = (-n) % item_block
        if pad:
            # padded items sit at distance ((1-0)/2 - mn)/rng from everything;
            # gate them out with the true item count inside the kernel
            en_p = jnp.concatenate([en, jnp.zeros((pad, en.shape[1]), en.dtype)])
        else:
            en_p = en
        k = recs.shape[1]
        out = np.empty(recs.shape[0], np.float32)
        for s in range(0, recs.shape[0], batch):
            r = jnp.asarray(recs[s:s + batch])

            out[s:s + batch] = np.asarray(
                aot_call(
                    _ideal_min_cos_diff_batch,
                    (r, en_p, jnp.float32(f_mn),
                     jnp.float32(1.0 / max(f_mx - f_mn, 1e-12))),
                    static=dict(k=k, block=item_block, n_real=n),
                )
            )
        return out

    def _normed_items(self) -> jnp.ndarray:
        if self._en_dev is None:
            ei = self.emb_item
            en = ei / np.maximum(np.linalg.norm(ei, axis=1, keepdims=True), 1e-12)
            self._en_dev = jnp.asarray(en.astype(np.float32))
        return self._en_dev

    @staticmethod
    def max_average_linkage(rec: np.ndarray, pair_dist: np.ndarray, k: int) -> float:
        """`find_max_average_linkage` (`utils.py:355-363`): the best-possible mean
        total linkage of k catalog items to the set `rec`.  The DP reduces to a
        top-k selection because item contributions are independent:
        linkage(i) = sum_{a in rec} dist[a, i]."""
        linkage = pair_dist[rec].sum(axis=0)              # [N]
        top = np.partition(linkage, -k)[-k:]
        return float(top.sum() / k)

    @staticmethod
    def max_min_cos_diff(rec: np.ndarray, pair_dist: np.ndarray, k: int) -> float:
        """`find_max_min_cosDiff` (`utils.py:365-382`): sequential DP over catalog
        items; state = per-rec-item running minima, transition keeps whichever of
        {skip, take} yields the larger sum of minima.  Vectorized transliteration
        of the reference recurrence (which is itself a greedy approximation)."""
        n = pair_dist.shape[0]
        kk = min(k, n)
        dp = np.zeros(kk + 1)
        min_diff = np.full((kk + 1, len(rec)), 1e6)
        for i in range(n):
            d_i = pair_dist[rec, i]                       # [|rec|]
            for j in range(min(i + 1, kk), 0, -1):
                cand = np.minimum(min_diff[j - 1], d_i)
                s = cand.sum()
                if s > dp[j]:
                    dp[j] = s
                    min_diff[j] = cand
        return float(dp[kk] / k)

    def _ideal_norms(self, rec: np.ndarray, metric: str) -> np.ndarray:
        """Per-list ideal normalizers, cached by rec-list content (the same list
        recurs across every pair of a disentanglement matrix)."""
        import hashlib

        key = (metric, hashlib.sha1(np.ascontiguousarray(rec)).hexdigest())
        cache = getattr(self, "_ideal_cache", None)
        if cache is None:
            cache = self._ideal_cache = {}
        if key not in cache:
            if metric.endswith("diff"):
                cache[key] = self.ideal_min_cos_diff_all(rec)
            else:
                cache[key] = self.ideal_avg_linkage_all(rec)
        return cache[key]

    def disentanglement_pair_ideal(
        self,
        rec_a: np.ndarray,
        rec_b: np.ndarray,
        metric: str = "cosDis_diff",
        eps: float = 1e-4,
    ) -> float:
        """`idealMaxDistNorm` variants (`utils.py:417-437, 452-468`): per-user
        chamfer (diff) or mean (avgLink) distances normalized by each list's
        ideal-maximum achievable value over the whole catalog.  Fully blocked /
        on-device — no N x N host matrix — so it runs at gowalla+ scales."""
        f_mn, f_mx = self._norm_cos_minmax()
        if metric.endswith("diff"):
            pair = self.disentanglement_pair(rec_a, rec_b, f_mn, f_mx, eps=eps)
            ab, ba = pair[:, 0], pair[:, 1]
        else:  # avgLink
            en_dev = self._normed_items()
            ab = np.asarray(
                _mean_dist_pair(
                    jnp.asarray(rec_a), jnp.asarray(rec_b), en_dev,
                    jnp.float32(f_mn), jnp.float32(f_mx),
                )
            )
            ba = ab
        ideal_a = self._ideal_norms(rec_a, metric)
        ideal_b = self._ideal_norms(rec_b, metric)
        vals = (
            ab / np.maximum(ideal_a, 1e-12) + ba / np.maximum(ideal_b, 1e-12)
        ) / 2.0
        return float(vals.mean())

    @staticmethod
    def jaccard_matrix(recs: Dict[str, np.ndarray], methods: Sequence[str]) -> np.ndarray:
        """Mean per-user Jaccard distance between rec lists (`utils.py:344-348`),
        vectorized: rows are disambiguated with a per-row id offset, per-row SET
        sizes come from sorted-run counts, and the intersection is a sorted
        membership test (`np.isin`) on the first occurrence of each value —
        exact set semantics without per-user Python sets."""
        m = len(methods)
        out = np.zeros((m, m))
        mats = [np.asarray(recs[meth], dtype=np.int64) for meth in methods]
        big = max(int(a.max(initial=0)) for a in mats) + 1
        offs = [
            a + np.arange(a.shape[0], dtype=np.int64)[:, None] * big for a in mats
        ]
        sorts = [np.sort(a, axis=1) for a in offs]
        firsts = [
            np.concatenate(
                [np.ones((s.shape[0], 1), bool), np.diff(s, axis=1) != 0], axis=1
            )
            for s in sorts
        ]
        sizes = [f.sum(axis=1) for f in firsts]
        for i in range(m):
            for j in range(i, m):
                inter = (np.isin(sorts[i], offs[j]) & firsts[i]).sum(axis=1)
                union = sizes[i] + sizes[j] - inter
                out[i, j] = out[j, i] = np.mean(1.0 - inter / union)
        return out
