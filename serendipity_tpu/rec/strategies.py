"""The eight factor-based recommendation strategies, fused and vectorized.

Score-matrix form (the `recommend_combination.py` P11 components): every strategy
produces a min-max-normalized [n_users, C] score matrix over each user's candidate
list.  Top-k form (`recommend.py` P10) is `argsort(-scores)[:K]` over the same
scores — one fused scorer serves both, replacing eight multiprocessing pools.

Strategies and their reference semantics:
  rand (`recommend_combination.py:32-48`)  uniform random scores
  nov  (`:55-79`)   item release date (min train timestamp), per-user min-max
  pop  (`:81-106`)  -interaction count, per-user min-max  ("unpopularity")
  qua  (`:109-129`) mean item rating over rating.csv, per-user min-max
  acc  (`:188-210`) user . item dot product, per-user min-max
  ela  (`:132-185`) -(|norm(sim)+ela_u - alpha*mean_factor|), per-user min-max;
                    mean_factor is the GLOBAL mean of norm(sim)+ela_u over all
                    user x candidate cells; norm uses global U.I^T min/max
  dif  (`:282-305`) 1 - (max_{t in train(u)} <e_c, e_t> - min_ii)/(max_ii - min_ii)
                    with min/max over the full I.I^T matrix  (NOT re-normalized)
  div  —            DPP re-ranking (see `serendipity_tpu.rec.dpp`), selection-form only

All matmuls ride the MXU in user blocks; per-user train histories enter as padded
index lists with -inf masking for the max-sim reductions.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from serendipity_tpu.data.datasets import Interactions


@jax.jit
def _acc_block(ue, cand_emb):
    return jnp.einsum("bd,bcd->bc", ue, cand_emb, preferred_element_type=jnp.float32)


def minmax_rows(x: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    mn = jnp.min(x, axis=-1, keepdims=True)
    mx = jnp.max(x, axis=-1, keepdims=True)
    return (x - mn) / jnp.maximum(mx - mn, 1e-12)


def padded_rows(
    indptr: np.ndarray, indices: np.ndarray, rows: np.ndarray, pad_val: int
) -> np.ndarray:
    """[len(rows), T_max] padded index lists for the given CSR rows."""
    deg = np.diff(indptr)
    t = int(deg[rows].max()) if len(rows) else 1
    t = max(t, 1)
    out = np.full((len(rows), t), pad_val, dtype=np.int32)
    for r, u in enumerate(rows):
        seg = indices[indptr[u]:indptr[u + 1]]
        out[r, : len(seg)] = seg
    return out


@partial(jax.jit, static_argnames=())
def max_sim_to_history(
    cand_emb: jnp.ndarray,      # [B, C, D]
    hist_idx: jnp.ndarray,      # [B, T] padded item ids (pad = n_items)
    item_emb_padded: jnp.ndarray,  # [N+1, D] with zero pad row
    n_items: int,
) -> jnp.ndarray:
    """max over history items of <candidate, history> per candidate: [B, C].

    The max-sim kernel shared by `dif` scores (`recommend.py:287-312`), ser1's
    acc/dif (`utils.py:23-38`), and ser2 (`utils.py:117-142`).
    """
    hist_emb = item_emb_padded[hist_idx]                      # [B, T, D]
    dots = jnp.einsum(
        "bcd,btd->bct", cand_emb, hist_emb,
        preferred_element_type=jnp.float32,
    )
    valid = (hist_idx < n_items)[:, None, :]
    dots = jnp.where(valid, dots, -jnp.inf)
    return jnp.max(dots, axis=-1)


def item_item_minmax(
    emb_item: np.ndarray, block: int = 2048
) -> Tuple[float, float]:
    """Global min/max of I @ I^T, blocked (`utils.py:487-529` mem-poor path)."""
    ei = jnp.asarray(emb_item, dtype=jnp.float32)

    @jax.jit
    def bm(rows):
        s = rows @ ei.T
        return jnp.min(s), jnp.max(s)

    mn, mx = np.inf, -np.inf
    for s in range(0, emb_item.shape[0], block):
        a, b = bm(ei[s:s + block])
        mn = min(mn, float(a))
        mx = max(mx, float(b))
    return mn, mx


class StrategyScorer:
    """Computes all score-form strategies for a candidate matrix."""

    def __init__(
        self,
        inter: Interactions,
        emb_user: np.ndarray,
        emb_item: np.ndarray,
        candidates: np.ndarray,      # [U, C] int32
        user_block: int = 128,
    ):
        self.inter = inter
        self.emb_user = np.asarray(emb_user, np.float32)
        self.emb_item = np.asarray(emb_item, np.float32)
        self.candidates = candidates
        self.user_block = user_block
        self.n_users, self.n_items = inter.n_users, inter.n_items

        self.ei_dev = jnp.asarray(self.emb_item)
        self.ei_pad = jnp.concatenate(
            [self.ei_dev, jnp.zeros((1, self.emb_item.shape[1]))], axis=0
        )
        # global U.I^T min/max (`recommend_combination.py:150-151`)
        from serendipity_tpu.rec.candidates import global_score_minmax

        self.ui_min, self.ui_max = global_score_minmax(
            jnp.asarray(self.emb_user), self.ei_dev, fp16=False
        )
        # global I.I^T min/max (`recommend_combination.py:288-289`)
        self.ii_min, self.ii_max = item_item_minmax(self.emb_item)

        # item-level features (item.csv contract)
        if inter.item_dates is None or inter.item_counts is None:
            from serendipity_tpu.data.datasets import derive_item_metadata

            derive_item_metadata(inter)
        self.dates = np.asarray(
            inter.item_dates
            if inter.item_dates is not None
            else np.zeros(self.n_items),
            np.float32,
        )
        self.counts = np.asarray(inter.item_counts, np.float32)
        self.mean_ratings = np.asarray(
            inter.item_mean_ratings
            if inter.item_mean_ratings is not None
            else np.zeros(self.n_items),
            np.float32,
        )
        # user elasticity = min-max normalized train degree (`:160-163`)
        deg = np.diff(inter.train_indptr).astype(np.float32)
        dmin, dmax = deg.min(), deg.max()
        self.elasticity = (deg - dmin) / max(dmax - dmin, 1e-12)

    # ---- per-block device kernels ------------------------------------------

    def _blocks(self):
        for s in range(0, self.n_users, self.user_block):
            yield s, min(s + self.user_block, self.n_users)

    def _cand_emb(self, s, e):
        return self.ei_dev[jnp.asarray(self.candidates[s:e])]

    # ---- public scorers -----------------------------------------------------

    def rand(self, seed: int) -> np.ndarray:
        rng = np.random.default_rng(seed)
        return rng.random(self.candidates.shape).astype(np.float32)

    def _feature_scores(self, feat: np.ndarray, negate: bool = False) -> np.ndarray:
        vals = feat[self.candidates]
        if negate:
            vals = -vals
        mn = vals.min(axis=1, keepdims=True)
        mx = vals.max(axis=1, keepdims=True)
        return ((vals - mn) / np.maximum(mx - mn, 1e-12)).astype(np.float32)

    def nov(self) -> np.ndarray:
        return self._feature_scores(self.dates)

    def pop(self) -> np.ndarray:
        return self._feature_scores(self.counts, negate=True)

    def qua(self) -> np.ndarray:
        return self._feature_scores(self.mean_ratings)

    def acc_raw(self) -> np.ndarray:
        """Raw u.cand dot products [U, C] (used by ela and acc)."""
        out = np.zeros(self.candidates.shape, np.float32)
        for s, e in self._blocks():
            ue = jnp.asarray(self.emb_user[s:e])
            out[s:e] = np.asarray(_acc_block(ue, self._cand_emb(s, e)))
        return out

    def acc(self, raw: Optional[np.ndarray] = None) -> np.ndarray:
        raw = self.acc_raw() if raw is None else raw
        mn = raw.min(axis=1, keepdims=True)
        mx = raw.max(axis=1, keepdims=True)
        return (raw - mn) / np.maximum(mx - mn, 1e-12)

    def ela(self, alpha: float = 1.0, raw: Optional[np.ndarray] = None) -> np.ndarray:
        raw = self.acc_raw() if raw is None else raw
        factor = (raw - self.ui_min) / max(self.ui_max - self.ui_min, 1e-12)
        factor = factor + self.elasticity[:, None]
        mean_factor = factor.mean()                       # global (`:165-171`)
        scores = -np.abs(factor - alpha * mean_factor)
        mn = scores.min(axis=1, keepdims=True)
        mx = scores.max(axis=1, keepdims=True)
        return (scores - mn) / np.maximum(mx - mn, 1e-12)

    def dif(self) -> np.ndarray:
        """1 - normalized max-sim to train history; NOT per-user re-normalized
        (`recommend_combination.py:282-305` returns dif directly)."""
        out = np.zeros(self.candidates.shape, np.float32)
        tr_ptr, tr_idx = self.inter.train_indptr, self.inter.train_indices
        for s, e in self._blocks():
            rows = np.arange(s, e)
            hist = padded_rows(tr_ptr, tr_idx, rows, self.n_items)
            ms = max_sim_to_history(
                self._cand_emb(s, e), jnp.asarray(hist), self.ei_pad, self.n_items
            )
            out[s:e] = np.asarray(
                1.0 - (ms - self.ii_min) / max(self.ii_max - self.ii_min, 1e-12)
            )
        return out

    def all_scores(self, seed: int, alpha: float = 1.0) -> Dict[str, np.ndarray]:
        raw = self.acc_raw()
        return {
            "rand": self.rand(seed),
            "nov": self.nov(),
            "pop": self.pop(),
            "qua": self.qua(),
            "acc": self.acc(raw),
            "ela": self.ela(alpha, raw),
            "dif": self.dif(),
        }


def topk_from_scores(
    scores: np.ndarray, candidates: np.ndarray, k: int
) -> np.ndarray:
    """Selection form: top-k candidate ids by score, descending ([U, k] int32)."""
    order = np.argsort(-scores, axis=1)[:, :k]
    return np.take_along_axis(candidates, order, axis=1).astype(np.int32)
