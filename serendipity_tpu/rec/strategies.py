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
from serendipity_tpu.utils.aot import aot_call, gather_rows, scatter_rows


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


def padded_rows_device(
    indptr: jnp.ndarray,        # [U+1] int32 CSR row pointers (device)
    indices: jnp.ndarray,       # [nnz] int32 column ids (device)
    rows: jnp.ndarray,          # [B] int32 row ids
    h_max: int,                 # static width >= max row degree
    pad_val: int,
) -> jnp.ndarray:
    """[B, h_max] padded CSR rows, built on device — the traced replacement for the
    host `padded_rows` loop, so whole stages can run as one dispatch (the per-block
    host round-trip costs ~77 ms each on tunneled TPU backends)."""
    starts = indptr[rows]
    deg = indptr[rows + 1] - starts
    pos = starts[:, None] + jnp.arange(h_max, dtype=jnp.int32)[None, :]
    ids = indices[jnp.clip(pos, 0, indices.shape[0] - 1)]
    return jnp.where(jnp.arange(h_max)[None, :] < deg[:, None], ids, pad_val)


def padded_rows_start_deg(
    starts: jnp.ndarray,        # [B] int32 CSR row starts (already gathered)
    degs: jnp.ndarray,          # [B] int32 row degrees
    indices: jnp.ndarray,       # [nnz] int32 (replicated)
    h_max: int,
    pad_val: int,
) -> jnp.ndarray:
    """`padded_rows_device` on pre-gathered (start, deg) pairs — the form the
    sharded study stages use, where per-user CSR offsets shard with the user
    axis and only the flat `indices` stays replicated (`parallel/study.py`)."""
    pos = starts[:, None] + jnp.arange(h_max, dtype=jnp.int32)[None, :]
    ids = indices[jnp.clip(pos, 0, indices.shape[0] - 1)]
    return jnp.where(jnp.arange(h_max)[None, :] < degs[:, None], ids, pad_val)


def max_sim_chunked(
    cand_emb: jnp.ndarray,      # [B, C, D]
    hist_idx: jnp.ndarray,      # [B, T] padded (pad = n_items), T % h_chunk == 0
    item_emb_padded: jnp.ndarray,
    n_items: int,
    h_chunk: int = 128,
) -> jnp.ndarray:
    """`max_sim_to_history` with a running max over fixed-width history chunks:
    peak memory O(B*C*h_chunk) instead of O(B*C*T).  Traced (call under jit)."""
    b, c, _ = cand_emb.shape
    t = hist_idx.shape[1]
    if t <= h_chunk:
        return max_sim_to_history(cand_emb, hist_idx, item_emb_padded, n_items)
    assert t % h_chunk == 0, "pad history width to a multiple of h_chunk"

    def body(i, run):
        sl = jax.lax.dynamic_slice_in_dim(hist_idx, i * h_chunk, h_chunk, axis=1)
        hist_emb = item_emb_padded[sl]
        dots = jnp.einsum(
            "bcd,btd->bct", cand_emb, hist_emb,
            preferred_element_type=jnp.float32,
        )
        dots = jnp.where((sl < n_items)[:, None, :], dots, -jnp.inf)
        return jnp.maximum(run, jnp.max(dots, axis=-1))

    init = jnp.full((b, c), -jnp.inf, jnp.float32)
    return jax.lax.fori_loop(0, t // h_chunk, body, init)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def degree_buckets(deg: np.ndarray, q: float = 0.95, align: int = 128):
    """[(user_ids, h)] partition for degree-bucketed max-sim passes.

    Padded-history kernels cost O(U * h_max): one whale user inflates every
    row's padded width (ML-25M-scale synth: max degree ~2k vs mean 74 — 26x
    wasted FLOPs).  Two buckets — 'normal' users at the P95 width and the heavy
    tail at the true max — recover most of it with only one extra compiled
    shape.  Per-user results are identical (pad slots are masked to -inf)."""
    deg = np.asarray(deg)
    h_hi = _round_up(max(int(deg.max(initial=1)), 1), align)
    h_lo = _round_up(max(int(np.quantile(deg, q)), 1), align)
    if h_lo >= h_hi:
        return [(np.arange(len(deg)), h_hi)]
    lo = np.nonzero(deg <= h_lo)[0]
    hi = np.nonzero(deg > h_lo)[0]
    return [(lo, h_lo), (hi, h_hi)]


def loop_user_blocks(fn, n_users: int, block: int = 1024, block_align: int = 8):
    """TRACED helper (call inside a jit you cache): run `fn(rows [block]) -> pytree
    of [block, ...]` over all users with a `fori_loop` writing into preallocated
    [n_users_padded, ...] buffers.  One dispatch for the whole stage, and — unlike
    `lax.scan` — compile time is independent of the trip count (remote-compile
    time grows ~5 s per scan step on tunneled toolchains).  Caller slices
    [:n_users]; out-of-range rows are clamped to the last user and overwritten
    or discarded by that slice."""
    block = _round_up(min(block, max(n_users, 1)), block_align)
    n_steps = max(1, -(-n_users // block))
    u_pad = block * n_steps
    rows0 = jnp.arange(block, dtype=jnp.int32)
    shapes = jax.eval_shape(fn, rows0)
    bufs = jax.tree.map(
        lambda s: jnp.zeros((u_pad,) + s.shape[1:], s.dtype), shapes
    )

    def body(i, bufs):
        rows = jnp.minimum(i * block + rows0, n_users - 1)
        out = fn(rows)
        return jax.tree.map(
            lambda b, o: jax.lax.dynamic_update_slice(
                b, o, (i * block,) + (0,) * (b.ndim - 1)
            ),
            bufs,
            out,
        )

    return jax.lax.fori_loop(0, n_steps, body, bufs)


def item_item_minmax(
    emb_item: np.ndarray, block: int = 2048
) -> Tuple[float, float]:
    """Global min/max of I @ I^T, blocked (`utils.py:487-529` mem-poor path);
    one dispatch, device-side accumulation (`rec/candidates._minmax_all`),
    AOT-cached (this is the evaluator-init compile that measured 4.9-186 s
    through the remote service's cache lottery)."""
    from serendipity_tpu.rec.candidates import _minmax_all

    ei = jnp.asarray(emb_item, dtype=jnp.float32)
    mn, mx = aot_call(_minmax_all, (ei, ei), static=dict(fp16=False, block=block))
    return float(mn), float(mx)


@partial(jax.jit, static_argnames=("n_items", "h_max"))
def _raw_and_maxsim_all(
    eu: jnp.ndarray,            # [U, D]
    ei_pad: jnp.ndarray,        # [N+1, D]
    cand: jnp.ndarray,          # [U, C] int32
    tr_ptr: jnp.ndarray,        # [U+1] int32
    tr_idx: jnp.ndarray,        # [nnz] int32
    n_items: int,
    h_max: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One dispatch for every user: (raw u.cand dots [U_pad, C], max-sim of each
    candidate to the user's train history [U_pad, C])."""
    n_users = eu.shape[0]

    def blk(rows):
        ce = ei_pad[cand[rows]]                               # [B, C, D]
        raw = jnp.einsum(
            "bd,bcd->bc", eu[rows], ce, preferred_element_type=jnp.float32
        )
        hist = padded_rows_device(tr_ptr, tr_idx, rows, h_max, n_items)
        ms = max_sim_chunked(ce, hist, ei_pad, n_items)
        return raw, ms

    return loop_user_blocks(blk, n_users)


@partial(jax.jit, static_argnames=("n_items", "h_max", "block"))
def _raw_and_maxsim_subset(
    eu_s: jnp.ndarray,          # [B_sub, D] gathered user rows
    ei_pad: jnp.ndarray,
    cand_s: jnp.ndarray,        # [B_sub, C]
    tr_start: jnp.ndarray,      # [B_sub] gathered CSR starts
    tr_deg: jnp.ndarray,        # [B_sub]
    tr_idx: jnp.ndarray,
    n_items: int,
    h_max: int,
    block: int = 1024,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """`_raw_and_maxsim_all` over a degree bucket (pre-gathered user subset)."""
    n_sub = eu_s.shape[0]

    def blk(rows):
        ce = ei_pad[cand_s[rows]]
        raw = jnp.einsum(
            "bd,bcd->bc", eu_s[rows], ce, preferred_element_type=jnp.float32
        )
        hist = padded_rows_start_deg(
            tr_start[rows], tr_deg[rows], tr_idx, h_max, n_items
        )
        ms = max_sim_chunked(ce, hist, ei_pad, n_items)
        return raw, ms

    return loop_user_blocks(blk, n_sub, block=min(block, n_sub))


class StrategyScorer:
    """Computes all score-form strategies for a candidate matrix."""

    def __init__(
        self,
        inter: Interactions,
        emb_user: np.ndarray,
        emb_item: np.ndarray,
        candidates: np.ndarray,      # [U, C] int32
        user_block: int = 128,
        mesh=None,                   # jax Mesh: shard the user axis over devices
        candidates_dev=None,         # optional device-resident copy: skips the
                                     # [U, C] re-upload (a 650 MB matrix costs
                                     # ~13 s up the tunnel at ML-25M scale)
    ):
        self.inter = inter
        self.emb_user = np.asarray(emb_user, np.float32)
        self.emb_item = np.asarray(emb_item, np.float32)
        self.candidates = candidates
        self.candidates_dev = candidates_dev
        self.user_block = user_block
        self.mesh = mesh
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
        self._raw_ms: Optional[Tuple[np.ndarray, np.ndarray]] = None
        self._rm_dev: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None

    # ---- fused device pass ---------------------------------------------------

    def _cand_dev(self) -> jnp.ndarray:
        if self.candidates_dev is None:
            self.candidates_dev = jnp.asarray(self.candidates, jnp.int32)
        return self.candidates_dev

    def _raw_and_maxsim(self) -> Tuple[np.ndarray, np.ndarray]:
        """Host copies of the raw dots + train max-sim (legacy score-form API;
        at ML-25M scale each is a ~650 MB download through a ~20 MB/s tunnel —
        the study pipeline stays on `_raw_and_maxsim_dev` and never pays it)."""
        if self._raw_ms is None:
            r, m = self._raw_and_maxsim_dev()
            self._raw_ms = (np.asarray(r), np.asarray(m))
        return self._raw_ms

    def _raw_and_maxsim_dev(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """DEVICE-RESIDENT raw dots + train max-sim [U, C] pair, cached.

        With a mesh, the user axis fans out over all devices
        (`parallel/study.raw_and_maxsim_sharded`) — the TPU analog of the
        reference's per-user process pools.  Chunk results are scattered into
        HBM-resident buffers (round 5): the [U, C] matrices never cross the
        tunnel, downstream scoring/top-k consumes them in place."""
        if self._rm_dev is None:
            h_max = _round_up(
                max(1, int(np.diff(self.inter.train_indptr).max())), 128
            )
            if self.mesh is not None:
                from serendipity_tpu.parallel.study import (
                    csr_start_deg,
                    mesh_devices,
                    raw_and_maxsim_sharded,
                )
                from serendipity_tpu.rec.candidates import (
                    USERS_PER_DISPATCH, _chunk_rows,
                )

                nd = mesh_devices(self.mesh)
                tr_s, tr_d = csr_start_deg(self.inter.train_indptr)
                tr_idx = jnp.asarray(self.inter.train_indices, jnp.int32)
                c = self.candidates.shape[1]
                raw = jnp.zeros((self.n_users, c), jnp.float32)
                ms = jnp.zeros((self.n_users, c), jnp.float32)
                deg = np.diff(self.inter.train_indptr)
                # degree-bucketed + host-chunked fan-out (clamp-padded to one
                # nd-divisible shape per bucket)
                for users_b, h in degree_buckets(deg):
                    nb = len(users_b)
                    chunk = min(
                        -(-min(USERS_PER_DISPATCH, nb) // nd) * nd,
                        -(-nb // nd) * nd,
                    )
                    for s, cc in _chunk_rows(nb, chunk):
                        sub = users_b[np.minimum(np.arange(s, s + chunk), nb - 1)]

                        r_b, m_b = raw_and_maxsim_sharded(
                            self.mesh,
                            jnp.asarray(self.emb_user[sub]),
                            self.ei_pad,
                            gather_rows(self._cand_dev(), sub),
                            jnp.asarray(tr_s[sub]),
                            jnp.asarray(tr_d[sub]),
                            tr_idx,
                            n_items=self.n_items,
                            h_max=h,
                        )
                        rows = users_b[s:s + cc]
                        raw = scatter_rows(raw, rows, r_b[:cc])
                        ms = scatter_rows(ms, rows, m_b[:cc])
            else:
                # degree-bucketed: normal users at the P95 history width, the
                # heavy tail at the true max — identical results, up to ~10x
                # fewer padded-history FLOPs on skewed graphs
                from serendipity_tpu.rec.candidates import (
                    USERS_PER_DISPATCH, _chunk_rows,
                )

                deg = np.diff(self.inter.train_indptr)
                tr_idx = jnp.asarray(self.inter.train_indices, jnp.int32)
                starts = self.inter.train_indptr[:-1].astype(np.int32)
                c = self.candidates.shape[1]
                raw = jnp.zeros((self.n_users, c), jnp.float32)
                ms = jnp.zeros((self.n_users, c), jnp.float32)
                for users_b, h in degree_buckets(deg):
                    # host-chunked dispatches (clamp-padded to one shape per
                    # bucket): multi-minute single executions crash tunneled
                    # workers, and chunks pipeline asynchronously anyway
                    chunk = min(USERS_PER_DISPATCH, len(users_b))
                    for s, cc, in _chunk_rows(len(users_b), chunk):
                        sub = users_b[
                            np.minimum(np.arange(s, s + chunk), len(users_b) - 1)
                        ]

                        r_b, m_b = aot_call(
                            _raw_and_maxsim_subset,
                            (jnp.asarray(self.emb_user[sub]),
                             self.ei_pad,
                             gather_rows(self._cand_dev(), sub),
                             jnp.asarray(starts[sub]),
                             jnp.asarray(deg[sub].astype(np.int32)),
                             tr_idx),
                            static=dict(n_items=self.n_items, h_max=h),
                        )
                        rows = users_b[s:s + cc]
                        raw = scatter_rows(raw, rows, r_b[:cc])
                        ms = scatter_rows(ms, rows, m_b[:cc])
            # force the scatter chains here so this pass's wall lands in the
            # caller's (strategy_scores) timer — async dispatch otherwise defers
            # it to whichever top-k download forces first (round-5 r5a/b tapes
            # attributed ~60 s of max-sim compute to the top-k stage)
            float(raw[0, 0] + ms[0, 0])
            self._rm_dev = (raw, ms)
        return self._rm_dev

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
        return self._raw_and_maxsim()[0]

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
        ms = self._raw_and_maxsim()[1]
        return (
            1.0 - (ms - self.ii_min) / max(self.ii_max - self.ii_min, 1e-12)
        ).astype(np.float32)

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

    # ---- device-resident study path (round 5) --------------------------------

    def score_dev(self, name: str, seed: int = 0, alpha: float = 1.0) -> jnp.ndarray:
        """DEVICE [U, C] score matrix for one strategy.

        Same formulas as the host scorers above, computed from the HBM-resident
        raw/max-sim pair + [N]-sized feature vectors, so nothing [U, C]-shaped
        crosses the host link.  Not cached: each matrix is a few ms of
        elementwise work, and caching 7 of them is GBs of HBM at ML-25M scale.
        Deviation: `rand` draws from the jax PRNG (keyed on `seed`) instead of
        numpy's — same uniform distribution, different stream.

        Every jit routes through the AOT executable cache (`utils/aot.py`):
        these are trivial elementwise programs, but on a remote-compile relay
        each fresh-process jit costs a 10-25 s service round-trip — measured
        r5d: ~109 s of the top-k stage was six deferred score-jit compiles, vs
        0.1 s of actual top-k compute (topk_probe)."""

        cand = self._cand_dev()
        if name == "rand":
            return aot_call(
                _rand_scores_dev, (jax.random.PRNGKey(seed),),
                static=dict(shape=tuple(cand.shape)),
            )
        if name == "nov":
            return aot_call(
                _feature_scores_dev,
                (jnp.asarray(self.dates), cand, jnp.float32(1.0)),
            )
        if name == "pop":
            return aot_call(
                _feature_scores_dev,
                (jnp.asarray(self.counts), cand, jnp.float32(-1.0)),
            )
        if name == "qua":
            return aot_call(
                _feature_scores_dev,
                (jnp.asarray(self.mean_ratings), cand, jnp.float32(1.0)),
            )
        raw, ms = self._raw_and_maxsim_dev()
        if name == "acc":
            return aot_call(_acc_scores_dev, (raw,))
        if name == "ela":
            return aot_call(
                _ela_scores_dev,
                (raw, jnp.asarray(self.elasticity),
                 jnp.float32(self.ui_min), jnp.float32(self.ui_max),
                 jnp.float32(alpha)),
            )
        if name == "dif":
            return aot_call(
                _dif_scores_dev,
                (ms, jnp.float32(self.ii_min), jnp.float32(self.ii_max)),
            )
        raise ValueError(f"unknown score-form strategy {name!r}")

    def topk_ids(self, scores_dev: jnp.ndarray, k: int) -> np.ndarray:
        """Device top-k over a device score matrix -> host [U, k] int32 item ids
        (the ONLY [U, *] download of the selection path; ~13 MB at ML-25M scale
        vs the 650 MB score matrix)."""

        k = min(k, int(scores_dev.shape[1]))
        return np.asarray(
            aot_call(_topk_ids_dev, (scores_dev, self._cand_dev()),
                     static=dict(k=k))
        )


# ---- device-resident scoring + selection (round 5) ---------------------------
#
# The study pipeline keeps every [U, C] score matrix in HBM: scores are computed
# FROM the device-resident raw/max-sim pair + [N]-sized feature vectors, top-k
# runs on device, and only [U, k] int32 ids ever cross the link (at ML-25M scale
# this deletes 2 x 650 MB matrix downloads at ~20 MB/s plus a 32 s host
# argpartition from the study wall; `recommend.py:468-495` materializes all of
# it on the host).  All jits are module-level (closure identity would recompile
# per call) and take big arrays as arguments (captured constants blow the
# remote-compile request limit).


@jax.jit
def _feature_scores_dev(feat_pad: jnp.ndarray, cand: jnp.ndarray, sign: jnp.ndarray):
    """Row-minmax of sign * feat[cand] — device form of `_feature_scores`."""
    return minmax_rows(sign * feat_pad[cand])


@jax.jit
def _acc_scores_dev(raw: jnp.ndarray):
    return minmax_rows(raw)


@jax.jit
def _ela_scores_dev(
    raw: jnp.ndarray, elasticity: jnp.ndarray,
    ui_min: jnp.ndarray, ui_max: jnp.ndarray, alpha: jnp.ndarray,
):
    """Device form of `ela` (`recommend_combination.py:132-185`): globally
    normalized similarity + per-user elasticity, distance to alpha * GLOBAL mean."""
    factor = (raw - ui_min) / jnp.maximum(ui_max - ui_min, 1e-12)
    factor = factor + elasticity[:, None]
    mean_factor = jnp.mean(factor)
    return minmax_rows(-jnp.abs(factor - alpha * mean_factor))


@jax.jit
def _dif_scores_dev(ms: jnp.ndarray, ii_min: jnp.ndarray, ii_max: jnp.ndarray):
    return 1.0 - (ms - ii_min) / jnp.maximum(ii_max - ii_min, 1e-12)


@partial(jax.jit, static_argnames=("shape",))
def _rand_scores_dev(key: jax.Array, shape: Tuple[int, int]):
    return jax.random.uniform(key, shape, dtype=jnp.float32)


@partial(jax.jit, static_argnames=("k",))
def _topk_ids_dev(scores: jnp.ndarray, cand: jnp.ndarray, k: int):
    """Top-k candidate ids by score, descending — `lax.top_k` tie order (lowest
    candidate INDEX wins), identical to the host `topk_from_scores`.  Uses the
    chunked exact 2-stage reduction: plain `lax.top_k` lowers to a full per-row
    sort on TPU (`ops/topk.py` header measurement)."""
    from serendipity_tpu.ops.topk import topk_exact_2stage

    _, idx = topk_exact_2stage(scores, k)
    return jnp.take_along_axis(cand, idx, axis=1).astype(jnp.int32)


def topk_from_scores(
    scores: np.ndarray, candidates: np.ndarray, k: int
) -> np.ndarray:
    """Selection form: top-k candidate ids by score, descending ([U, k] int32).

    Legacy host-side path (the study pipeline selects on DEVICE via
    `StrategyScorer.topk_ids` since round 5 and never downloads a score
    matrix).  Stable full argsort, NOT argpartition: partitioning is unstable
    among tied scores (which subset of ties crosses the k boundary is
    arbitrary), whereas a stable sort of -scores reproduces `lax.top_k`'s
    documented tie order (lowest candidate index wins) exactly — tie-heavy
    strategies like `pop` (integer interaction counts) hit this constantly."""
    scores = np.asarray(scores, np.float32)
    k = min(k, scores.shape[1])
    top = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(candidates, top, axis=1).astype(np.int32)
