"""Kernel museum: retired Pallas top-k retrieval variants (negative results).

Archive of the round-2/3 design-space exploration for the fused score+top-k
retrieval kernel (throughput task of `/root/reference/recommend.py:375`).
NOTHING here is on a live code path or under test coverage — the winning bodies
(twopass4, twopass4m, insert) live in `ops/pallas_score.py`; this module keeps
the measured-and-rejected designs executable (`fused_score_topk(...,
variant=...)` lazily dispatches here for museum variant names, used only by
probe scripts).  Code may rot as the live module evolves; it is a record, not a
dependency.

Round-3 design-space results (all exact; gowalla shape 29856 x 40960 x 64 on
v5e, same-session numbers have ~±4% run-to-run variance through the tunnel):

  | variant | Gscores/s | lesson |
  |---|---|---|
  | twopass (r2 baseline)   | 45.7-49.9 | 2 serially-dependent wide reductions per candidate |
  | twopass4 (r3+ DEFAULT, live module) | 51.9-54.2 | counted trips kill the death-discovery iteration |
  | twopass3 (key-encoded)  | 50.3-52.6 | fewer wide passes barely matter -> not throughput-bound |
  | twopass3c2 (2-chained)  | 51.9      | chained extractions amortize carry, stay serial |
  | unroll2/4/8             | 51.7/49.5/39.1 | over-unrolling wastes tail extractions |
  | blockwise (8 narrow loops) | 22.8   | narrow (128-lane) ops cost ~as much as 1024-wide ones |
  | parblock (8 parallel chains/trip) | 5.8 | Mosaic does NOT overlap "independent" reduction chains |
  | collect (+XLA postlude) | 22.7      | XLA row-gather runs at ~3% HBM peak (the SpMM lesson) |
  | twopass5 (pipelined val lag-1) | compile crash | remote Mosaic helper dies; also at item_tile>=2048 with chains |
  | insert (live module: small-catalog path) | 23.4 | dynamic while_loop extraction |
  | subtile                 | < insert  | scalar gating + any() costs more than skipped vector work |
  | extract (fixed k passes)| baseline  | k serial (max, argmax, mask) trips per item tile |

Cost model these pin down (see DESIGN.md §3): pass A + tau = 6.7 ms of ~23 ms;
pass-B extraction is bound by ~2 cross-lane reduction LATENCIES per extracted
candidate, with mean candidates/row ~= 20.6 ~= k (tau admits only ~3% excess)
times a ~1.5-2x coupled max-over-rows trip inflation that no tested decoupling
beats.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_kernel(eu_ref, ei_ref, topv_ref, topi_ref, *, k: int, item_tile: int):
    bu = eu_ref.shape[0]
    n_items = ei_ref.shape[0]
    n_tiles = n_items // item_tile

    def tile_body(t, carry):
        v_run, i_run = carry                       # [bu, k] each
        tile = ei_ref[pl.ds(t * item_tile, item_tile), :]          # [ti, d]
        s = jax.lax.dot_general(
            eu_ref[:], tile,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                           # [bu, ti]
        ids = jax.lax.broadcasted_iota(jnp.int32, (bu, item_tile), 1) + t * item_tile
        work_v = jnp.concatenate([v_run, s], axis=1)                # [bu, k+ti]
        work_i = jnp.concatenate([i_run, ids], axis=1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (bu, k + item_tile), 1)

        big = jnp.int32(k + item_tile + 1)

        def extract(j, st):
            wv, out_v, out_i = st
            m = jnp.max(wv, axis=1)                                 # [bu]
            # first-occurrence argmax and its global id via masked reductions only
            # (portable to Mosaic: no argmax / per-row dynamic gather)
            is_m = wv >= m[:, None]
            am = jnp.min(jnp.where(is_m, cols, big), axis=1)        # [bu]
            sel = cols == am[:, None]
            gid = jnp.max(jnp.where(sel, work_i, -1), axis=1)
            slot = jax.lax.broadcasted_iota(jnp.int32, (bu, k), 1) == j
            out_v = jnp.where(slot, m[:, None], out_v)
            out_i = jnp.where(slot, gid[:, None], out_i)
            wv = jnp.where(sel, -jnp.inf, wv)
            return wv, out_v, out_i

        init = (
            work_v,
            jnp.full((bu, k), -jnp.inf, jnp.float32),
            jnp.zeros((bu, k), jnp.int32),
        )
        _, v_new, i_new = jax.lax.fori_loop(0, k, extract, init)
        return v_new, i_new

    v0 = jnp.full((bu, k), -jnp.inf, jnp.float32)
    i0 = jnp.zeros((bu, k), jnp.int32)
    v_fin, i_fin = jax.lax.fori_loop(0, n_tiles, tile_body, (v0, i0))
    topv_ref[:] = v_fin
    topi_ref[:] = i_fin



def _fused_kernel_twopass(
    eu_ref, ei_ref, topv_ref, topi_ref, spill_ref, bm_scr,
    *, k: int, item_tile: int, cbuf: int, block: int = 128,
):
    """Two-pass exact top-k: threshold first, then collect only real candidates.

    The streaming "insert" variant pays ~k*ln(N/k) prefix-update extractions per
    row (each ~6 full-width VPU passes) because its admission threshold warms up
    from -inf.  Here the threshold is computed BEFORE any extraction:

      pass A: per row, maxima of every `block`-wide column block (one reduction
              pass over the scores).  tau = k-th largest block max — a valid
              admission bound, since >= k elements (the k block maxima) are >= tau
              and every element >= tau lives in one of those k blocks, so the true
              k-th score s_(k) >= tau.
      pass B: re-score (MXU matmuls are ~2% of the budget) and collect every
              entry >= tau into a [bu, cbuf] buffer — expected k + O(k) entries
              per row, extracted in column order (2-3 passes per trip, no sorted
              insert), with a per-row saturation flag.
      merge:  exact top-k over the narrow buffer with (value desc, id asc)
              ordering — identical tie semantics to `lax.top_k`.

    Saturation (pathological tie mass, e.g. constant rows) sets `spill_ref`; the
    wrapper falls back to the XLA exact path for the whole batch in that case, so
    the kernel is exact on arbitrary inputs.
    """
    bu = eu_ref.shape[0]
    n_items = ei_ref.shape[0]
    n_tiles = n_items // item_tile
    nb_tile = item_tile // block
    cols = jax.lax.broadcasted_iota(jnp.int32, (bu, item_tile), 1)
    colsc = jax.lax.broadcasted_iota(jnp.int32, (bu, cbuf), 1)
    big = jnp.int32(item_tile + 1)
    big_id = jnp.int32(2 ** 30)

    @pl.when(pl.program_id(0) == 0)
    def _():
        spill_ref[0, 0] = 0

    def score_tile(t):
        tile = ei_ref[pl.ds(t * item_tile, item_tile), :]
        return jax.lax.dot_general(
            eu_ref[:], tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # ---- pass A: all block maxima -> tau -------------------------------------
    # The tile loop is UNROLLED in Python so the per-tile block-maxima stores hit
    # the scratch at STATIC lane offsets (Mosaic requires provable multiples of
    # 128 for dynamic lane stores); a tile's nb_tile maxima land as one
    # [bu, nb_pad]-column chunk.  One k-pass extraction then yields tau = the
    # k-th largest block max per row.
    nb_total = n_tiles * nb_tile
    nb_pad = bm_scr.shape[1]
    bm_scr[:] = jnp.full((bu, nb_pad), -jnp.inf, jnp.float32)
    for t in range(n_tiles):                                    # static unroll
        s = score_tile(t)
        bm = jnp.stack(
            [jnp.max(s[:, b * block:(b + 1) * block], axis=1)
             for b in range(nb_tile)],
            axis=1,
        )                                                       # [bu, nb_tile]
        bm_scr[:, t * nb_tile:(t + 1) * nb_tile] = bm

    colsw = jax.lax.broadcasted_iota(jnp.int32, (bu, nb_pad), 1)

    def tau_extract(j, st):
        w, _ = st
        m = jnp.max(w, axis=1)
        am = jnp.min(
            jnp.where(w >= m[:, None], colsw, jnp.int32(nb_pad + 1)), axis=1
        )
        w = jnp.where(colsw == am[:, None], -jnp.inf, w)
        return w, m

    _, tau = jax.lax.fori_loop(
        0, k, tau_extract, (bm_scr[:], jnp.zeros((bu,), jnp.float32))
    )

    # ---- pass B: collect all entries >= tau, in column order ----------------
    # Round-2b redesign: a per-row COLUMN CURSOR (`lastc`) replaces the mutated
    # masked-score workspace.  Candidates are `(s >= tau) & (cols > lastc)`, so
    #   * the score tile is never mutated (no full-width writeback per trip),
    #   * the global id is the argmin column itself (no id reduction),
    #   * loop liveness is a carried scalar (no full-width cond max),
    # leaving TWO full-width reductions per extracted candidate (min for its
    # column, one-hot sum for its value) instead of the previous four plus a
    # [bu, ti] carry.  (Earlier negative result, superseded by this body:
    # 2-per-trip unroll of the old body regressed 34.7 -> 25.7 Gscores/s.)
    def pass_b(t, st):
        c_u, lost, bv, bi = st
        s = score_tile(t)
        base = t * item_tile

        def trip_cond(st2):
            return st2[2] > 0

        def trip(st2):
            c_u, lost, _, lastc, bv, bi = st2
            mask = (s >= tau[:, None]) & (cols > lastc[:, None])
            am = jnp.min(jnp.where(mask, cols, big), axis=1)    # [bu]
            has = am < big
            val = jnp.sum(jnp.where(cols == am[:, None], s, 0.0), axis=1)
            ok = has & (c_u < cbuf)
            put = ok[:, None] & (colsc == c_u[:, None])
            bv = jnp.where(put, val[:, None], bv)
            bi = jnp.where(put, (am + base)[:, None], bi)
            c_u = c_u + ok.astype(jnp.int32)
            lost = lost + jnp.sum((has & ~ok).astype(jnp.int32))
            live = jnp.sum(has.astype(jnp.int32))
            # a row with no candidate past its cursor gets lastc = big and is
            # permanently dead; live rows advance their cursor to am
            return c_u, lost, live, am, bv, bi

        c_u, lost, _, _, bv, bi = jax.lax.while_loop(
            trip_cond, trip,
            (c_u, lost, jnp.int32(1), jnp.full((bu,), -1, jnp.int32), bv, bi),
        )
        return c_u, lost, bv, bi

    _, lost, bv_fin, bi_fin = jax.lax.fori_loop(
        0, n_tiles, pass_b,
        (
            jnp.zeros((bu,), jnp.int32),
            jnp.int32(0),
            jnp.full((bu, cbuf), -jnp.inf, jnp.float32),
            jnp.full((bu, cbuf), big_id, jnp.int32),
        ),
    )
    spill_ref[0, 0] = spill_ref[0, 0] + lost

    # ---- merge: exact top-k over the buffer, ties -> lower global id --------
    slots = jax.lax.broadcasted_iota(jnp.int32, (bu, k), 1)

    def merge(j, st):
        bv, bi, out_v, out_i = st
        m = jnp.max(bv, axis=1)
        is_m = bv >= m[:, None]
        gid = jnp.min(jnp.where(is_m, bi, big_id), axis=1)
        sel = bi == gid[:, None]                                # gids unique
        out_v = jnp.where(slots == j, m[:, None], out_v)
        out_i = jnp.where(slots == j, gid[:, None], out_i)
        bv = jnp.where(sel, -jnp.inf, bv)
        return bv, bi, out_v, out_i

    init = (
        bv_fin, bi_fin,
        jnp.full((bu, k), -jnp.inf, jnp.float32),
        jnp.zeros((bu, k), jnp.int32),
    )
    _, _, v_fin, i_fin = jax.lax.fori_loop(0, k, merge, init)
    topv_ref[:] = v_fin
    topi_ref[:] = i_fin



def _fused_kernel_twopass_unroll(
    eu_ref, ei_ref, topv_ref, topi_ref, spill_ref, bm_scr,
    *, k: int, item_tile: int, cbuf: int, block: int = 128, unroll: int = 4,
):
    """Twopass with UNROLLED cursor extraction: `unroll` candidates per trip.

    Measured motivation: while-loop iterations carry a large fixed cost on this
    Mosaic toolchain (scalarized cond + branch) — the 128-lane-sliced
    "blockwise" variant, with 4x the iterations at 1/8 the vector width each,
    runs 2.2x SLOWER than twopass, i.e. cost is roughly linear in iteration
    count, not vector work.  So go the other way: chain `unroll` cursor
    extractions inside one trip body.  Unlike the round-2 negative result
    (2-per-trip unroll of the pre-cursor body regressed — wasted second
    extractions mutated a full-width workspace), a chained CURSOR extraction
    costs only its own reductions and appends nothing when its row is
    exhausted (`ok` flag), so over-unrolling wastes just the tail reductions
    of the final trip.  `ge = s >= tau` is additionally hoisted out of the
    trip loop (trip-invariant).
    """
    bu = eu_ref.shape[0]
    n_items = ei_ref.shape[0]
    n_tiles = n_items // item_tile
    nb_tile = item_tile // block
    cols = jax.lax.broadcasted_iota(jnp.int32, (bu, item_tile), 1)
    colsc = jax.lax.broadcasted_iota(jnp.int32, (bu, cbuf), 1)
    big = jnp.int32(item_tile + 1)
    big_id = jnp.int32(2 ** 30)

    @pl.when(pl.program_id(0) == 0)
    def _():
        spill_ref[0, 0] = 0

    def score_tile(t):
        tile = ei_ref[pl.ds(t * item_tile, item_tile), :]
        return jax.lax.dot_general(
            eu_ref[:], tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # ---- pass A: identical to twopass ---------------------------------------
    nb_pad = bm_scr.shape[1]
    bm_scr[:] = jnp.full((bu, nb_pad), -jnp.inf, jnp.float32)
    for t in range(n_tiles):                                    # static unroll
        s = score_tile(t)
        bm = jnp.stack(
            [jnp.max(s[:, b * block:(b + 1) * block], axis=1)
             for b in range(nb_tile)],
            axis=1,
        )
        bm_scr[:, t * nb_tile:(t + 1) * nb_tile] = bm

    colsw = jax.lax.broadcasted_iota(jnp.int32, (bu, nb_pad), 1)

    def tau_extract(j, st):
        w, _ = st
        m = jnp.max(w, axis=1)
        am = jnp.min(
            jnp.where(w >= m[:, None], colsw, jnp.int32(nb_pad + 1)), axis=1
        )
        w = jnp.where(colsw == am[:, None], -jnp.inf, w)
        return w, m

    _, tau = jax.lax.fori_loop(
        0, k, tau_extract, (bm_scr[:], jnp.zeros((bu,), jnp.float32))
    )

    # ---- pass B: cursor extraction, `unroll` candidates per trip ------------
    def pass_b(t, st):
        c_u, lost, bv, bi = st
        s = score_tile(t)
        ge = s >= tau[:, None]                                  # trip-invariant
        base = t * item_tile

        def trip_cond(st2):
            return st2[2] > 0

        def trip(st2):
            c_u, lost, _, cursor, bv, bi = st2
            live = jnp.int32(0)
            for _ in range(unroll):                             # static chain
                mask = ge & (cols > cursor[:, None])
                am = jnp.min(jnp.where(mask, cols, big), axis=1)
                has = am < big
                val = jnp.sum(jnp.where(cols == am[:, None], s, 0.0), axis=1)
                ok = has & (c_u < cbuf)
                put = ok[:, None] & (colsc == c_u[:, None])
                bv = jnp.where(put, val[:, None], bv)
                bi = jnp.where(put, (am + base)[:, None], bi)
                c_u = c_u + ok.astype(jnp.int32)
                lost = lost + jnp.sum((has & ~ok).astype(jnp.int32))
                cursor = am           # exhausted rows: am == big -> dead
                live = jnp.sum(has.astype(jnp.int32))   # from the LAST round
            return c_u, lost, live, cursor, bv, bi

        c_u, lost, _, _, bv, bi = jax.lax.while_loop(
            trip_cond, trip,
            (c_u, lost, jnp.int32(1), jnp.full((bu,), -1, jnp.int32), bv, bi),
        )
        return c_u, lost, bv, bi

    _, lost, bv_fin, bi_fin = jax.lax.fori_loop(
        0, n_tiles, pass_b,
        (
            jnp.zeros((bu,), jnp.int32),
            jnp.int32(0),
            jnp.full((bu, cbuf), -jnp.inf, jnp.float32),
            jnp.full((bu, cbuf), big_id, jnp.int32),
        ),
    )
    spill_ref[0, 0] = spill_ref[0, 0] + lost

    # ---- merge: identical to twopass ----------------------------------------
    slots = jax.lax.broadcasted_iota(jnp.int32, (bu, k), 1)

    def merge(j, st):
        bv, bi, out_v, out_i = st
        m = jnp.max(bv, axis=1)
        is_m = bv >= m[:, None]
        gid = jnp.min(jnp.where(is_m, bi, big_id), axis=1)
        sel = bi == gid[:, None]
        out_v = jnp.where(slots == j, m[:, None], out_v)
        out_i = jnp.where(slots == j, gid[:, None], out_i)
        bv = jnp.where(sel, -jnp.inf, bv)
        return bv, bi, out_v, out_i

    init = (
        bv_fin, bi_fin,
        jnp.full((bu, k), -jnp.inf, jnp.float32),
        jnp.zeros((bu, k), jnp.int32),
    )
    _, _, v_fin, i_fin = jax.lax.fori_loop(0, k, merge, init)
    topv_ref[:] = v_fin
    topi_ref[:] = i_fin



def _fused_kernel_twopass3(
    eu_ref, ei_ref, topv_ref, topi_ref, spill_ref, bm_scr,
    *, k: int, item_tile: int, cbuf: int, block: int = 128, chain: int = 1,
):
    """Twopass pass-B with KEY-ENCODED cursor extraction (fewest wide passes).

    Round-3 finding: pass-B extraction is VPU-throughput-bound at ~8 wide
    vector passes per extracted candidate (mask: 3, col-min: 2, value: 3); all
    structural alternatives (narrow per-block loops, parallel block chains,
    id-only collection with an XLA gather postlude) measured worse because
    narrow ops cost as much as wide ones and XLA row gathers run at ~3% of HBM
    peak.  This body instead precomputes ONCE per tile
        key = where(s >= tau, cols, big)
    so each extraction is  am = min(where(key > cursor, key, big))  [3 passes]
    and its value  sum(where(key == am, s, 0))  [3 passes] — 6 wide passes per
    candidate, admission compare and column iota folded into the key.  `chain`
    extracts several candidates per trip to amortize the while-loop carry.
    Tie semantics unchanged: cursor order is ascending column, merge orders by
    (value desc, id asc) — bit-identical to `lax.top_k`.
    """
    bu = eu_ref.shape[0]
    n_items = ei_ref.shape[0]
    n_tiles = n_items // item_tile
    nb_tile = item_tile // block
    cols = jax.lax.broadcasted_iota(jnp.int32, (bu, item_tile), 1)
    colsc = jax.lax.broadcasted_iota(jnp.int32, (bu, cbuf), 1)
    big = jnp.int32(item_tile + 1)
    big_id = jnp.int32(2 ** 30)

    @pl.when(pl.program_id(0) == 0)
    def _():
        spill_ref[0, 0] = 0

    def score_tile(t):
        tile = ei_ref[pl.ds(t * item_tile, item_tile), :]
        return jax.lax.dot_general(
            eu_ref[:], tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # ---- pass A: identical to twopass ---------------------------------------
    nb_pad = bm_scr.shape[1]
    bm_scr[:] = jnp.full((bu, nb_pad), -jnp.inf, jnp.float32)
    for t in range(n_tiles):                                    # static unroll
        s = score_tile(t)
        bm = jnp.stack(
            [jnp.max(s[:, b * block:(b + 1) * block], axis=1)
             for b in range(nb_tile)],
            axis=1,
        )
        bm_scr[:, t * nb_tile:(t + 1) * nb_tile] = bm

    colsw = jax.lax.broadcasted_iota(jnp.int32, (bu, nb_pad), 1)

    def tau_extract(j, st):
        w, _ = st
        m = jnp.max(w, axis=1)
        am = jnp.min(
            jnp.where(w >= m[:, None], colsw, jnp.int32(nb_pad + 1)), axis=1
        )
        w = jnp.where(colsw == am[:, None], -jnp.inf, w)
        return w, m

    _, tau = jax.lax.fori_loop(
        0, k, tau_extract, (bm_scr[:], jnp.zeros((bu,), jnp.float32))
    )

    # ---- pass B: key-encoded cursor extraction ------------------------------
    def pass_b(t, st):
        c_u, lost, bv, bi = st
        s = score_tile(t)
        key = jnp.where(s >= tau[:, None], cols, big)           # trip-invariant
        base = t * item_tile

        def trip_cond(st2):
            return st2[2] > 0

        def trip(st2):
            c_u, lost, _, cursor, bv, bi = st2
            live = jnp.int32(0)
            for _ in range(chain):                              # static chain
                am = jnp.min(
                    jnp.where(key > cursor[:, None], key, big), axis=1
                )
                has = am < big
                val = jnp.sum(jnp.where(key == am[:, None], s, 0.0), axis=1)
                ok = has & (c_u < cbuf)
                put = ok[:, None] & (colsc == c_u[:, None])
                bv = jnp.where(put, val[:, None], bv)
                bi = jnp.where(put, (am + base)[:, None], bi)
                c_u = c_u + ok.astype(jnp.int32)
                lost = lost + jnp.sum((has & ~ok).astype(jnp.int32))
                cursor = am
                live = jnp.sum(has.astype(jnp.int32))           # LAST round
            return c_u, lost, live, cursor, bv, bi

        c_u, lost, _, _, bv, bi = jax.lax.while_loop(
            trip_cond, trip,
            (c_u, lost, jnp.int32(1), jnp.full((bu,), -1, jnp.int32), bv, bi),
        )
        return c_u, lost, bv, bi

    _, lost, bv_fin, bi_fin = jax.lax.fori_loop(
        0, n_tiles, pass_b,
        (
            jnp.zeros((bu,), jnp.int32),
            jnp.int32(0),
            jnp.full((bu, cbuf), -jnp.inf, jnp.float32),
            jnp.full((bu, cbuf), big_id, jnp.int32),
        ),
    )
    spill_ref[0, 0] = spill_ref[0, 0] + lost

    # ---- merge: identical to twopass ----------------------------------------
    slots = jax.lax.broadcasted_iota(jnp.int32, (bu, k), 1)

    def merge(j, st):
        bv, bi, out_v, out_i = st
        m = jnp.max(bv, axis=1)
        is_m = bv >= m[:, None]
        gid = jnp.min(jnp.where(is_m, bi, big_id), axis=1)
        sel = bi == gid[:, None]
        out_v = jnp.where(slots == j, m[:, None], out_v)
        out_i = jnp.where(slots == j, gid[:, None], out_i)
        bv = jnp.where(sel, -jnp.inf, bv)
        return bv, bi, out_v, out_i

    init = (
        bv_fin, bi_fin,
        jnp.full((bu, k), -jnp.inf, jnp.float32),
        jnp.zeros((bu, k), jnp.int32),
    )
    _, _, v_fin, i_fin = jax.lax.fori_loop(0, k, merge, init)
    topv_ref[:] = v_fin
    topi_ref[:] = i_fin



def _fused_kernel_twopass5(
    eu_ref, ei_ref, topv_ref, topi_ref, spill_ref, bm_scr,
    *, k: int, item_tile: int, cbuf: int, block: int = 128,
):
    """twopass4 + PIPELINED extraction: col-min(i) runs beside value(i-1).

    The cursor trip's two wide reductions are serially dependent (the value
    one-hot needs the freshly-extracted column), so each trip costs two
    cross-lane reduction latencies.  Pipelining by one trip makes them
    independent: iteration i computes `am_i` (depends only on `cursor_{i-1}`)
    and the VALUE of `am_{i-1}` — Mosaic can issue both reduction trees
    concurrently, halving the serial depth per trip.  Trip count is the
    counted bound of twopass4 plus one drain iteration.  Appends happen one
    trip late but still in ascending-column cursor order, so tie semantics are
    unchanged.
    """
    bu = eu_ref.shape[0]
    n_items = ei_ref.shape[0]
    n_tiles = n_items // item_tile
    nb_tile = item_tile // block
    cols = jax.lax.broadcasted_iota(jnp.int32, (bu, item_tile), 1)
    colsc = jax.lax.broadcasted_iota(jnp.int32, (bu, cbuf), 1)
    big = jnp.int32(item_tile + 1)
    big_id = jnp.int32(2 ** 30)

    @pl.when(pl.program_id(0) == 0)
    def _():
        spill_ref[0, 0] = 0

    def score_tile(t):
        tile = ei_ref[pl.ds(t * item_tile, item_tile), :]
        return jax.lax.dot_general(
            eu_ref[:], tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # ---- pass A: identical to twopass4 --------------------------------------
    nb_pad = bm_scr.shape[1]
    bm_scr[:] = jnp.full((bu, nb_pad), -jnp.inf, jnp.float32)
    for t in range(n_tiles):                                    # static unroll
        s = score_tile(t)
        bm = jnp.stack(
            [jnp.max(s[:, b * block:(b + 1) * block], axis=1)
             for b in range(nb_tile)],
            axis=1,
        )
        bm_scr[:, t * nb_tile:(t + 1) * nb_tile] = bm

    colsw = jax.lax.broadcasted_iota(jnp.int32, (bu, nb_pad), 1)

    def tau_extract(j, st):
        w, _ = st
        m = jnp.max(w, axis=1)
        am = jnp.min(
            jnp.where(w >= m[:, None], colsw, jnp.int32(nb_pad + 1)), axis=1
        )
        w = jnp.where(colsw == am[:, None], -jnp.inf, w)
        return w, m

    _, tau = jax.lax.fori_loop(
        0, k, tau_extract, (bm_scr[:], jnp.zeros((bu,), jnp.float32))
    )

    # ---- pass B: pipelined key-encoded extraction, counted trips ------------
    def pass_b(t, st):
        c_u, lost, bv, bi = st
        s = score_tile(t)
        key = jnp.where(s >= tau[:, None], cols, big)           # trip-invariant
        cnt = jnp.sum((key < big).astype(jnp.int32), axis=1)    # [bu]
        n_trips = jnp.max(cnt) + 1                              # +1 drain
        base = t * item_tile

        def trip(_, st2):
            c_u, lost, cursor, bv, bi = st2
            # independent reductions: new col-min || value of PREVIOUS col
            am = jnp.min(jnp.where(key > cursor[:, None], key, big), axis=1)
            val_p = jnp.sum(jnp.where(key == cursor[:, None], s, 0.0), axis=1)
            has_p = (cursor >= 0) & (cursor < big)
            ok = has_p & (c_u < cbuf)
            put = ok[:, None] & (colsc == c_u[:, None])
            bv = jnp.where(put, val_p[:, None], bv)
            bi = jnp.where(put, (cursor + base)[:, None], bi)
            c_u = c_u + ok.astype(jnp.int32)
            lost = lost + jnp.sum((has_p & ~ok).astype(jnp.int32))
            return c_u, lost, am, bv, bi

        c_u, lost, _, bv, bi = jax.lax.fori_loop(
            0, n_trips, trip,
            (c_u, lost, jnp.full((bu,), -1, jnp.int32), bv, bi),
        )
        return c_u, lost, bv, bi

    _, lost, bv_fin, bi_fin = jax.lax.fori_loop(
        0, n_tiles, pass_b,
        (
            jnp.zeros((bu,), jnp.int32),
            jnp.int32(0),
            jnp.full((bu, cbuf), -jnp.inf, jnp.float32),
            jnp.full((bu, cbuf), big_id, jnp.int32),
        ),
    )
    spill_ref[0, 0] = spill_ref[0, 0] + lost

    # ---- merge: identical to twopass ----------------------------------------
    slots = jax.lax.broadcasted_iota(jnp.int32, (bu, k), 1)

    def merge(j, st):
        bv, bi, out_v, out_i = st
        m = jnp.max(bv, axis=1)
        is_m = bv >= m[:, None]
        gid = jnp.min(jnp.where(is_m, bi, big_id), axis=1)
        sel = bi == gid[:, None]
        out_v = jnp.where(slots == j, m[:, None], out_v)
        out_i = jnp.where(slots == j, gid[:, None], out_i)
        bv = jnp.where(sel, -jnp.inf, bv)
        return bv, bi, out_v, out_i

    init = (
        bv_fin, bi_fin,
        jnp.full((bu, k), -jnp.inf, jnp.float32),
        jnp.zeros((bu, k), jnp.int32),
    )
    _, _, v_fin, i_fin = jax.lax.fori_loop(0, k, merge, init)
    topv_ref[:] = v_fin
    topi_ref[:] = i_fin



def _fused_kernel_collect(
    eu_ref, ei_ref, topi_ref, spill_ref, bm_scr,
    *, k: int, item_tile: int, cbuf: int, block: int = 128, chain: int = 1,
):
    """Twopass pass-B that collects candidate IDS ONLY — one reduction per trip.

    Round-3 measurement: kernel wall time is ~linear in the NUMBER of reduction
    ops, nearly independent of their vector width (narrow per-block loops ran
    2.2x slower at 1/8 the width; a 9x-reduction-count variant ran 8.5x
    slower).  The cursor trip pays 2 wide reductions per candidate (col-min +
    value one-hot sum) only because the in-kernel merge needs values.  Dropping
    the value extraction halves the per-candidate cost: the kernel emits just
    the admitted ids [u, cbuf] in ascending-id (cursor) order, and the wrapper
    recomputes their exact f32 scores OUTSIDE pallas with a batched matvec over
    the gathered item rows (d-length contraction on the MXU, same bf16xbf16
    -> f32 product/accumulation as the tile matmul) + `lax.top_k` — whose
    first-occurrence tie rule over the ascending-id buffer reproduces
    (value desc, id asc) exactly.  `chain > 1` additionally extracts several
    candidates per trip (dependent col-min chains) to amortize the while-loop
    carry overhead.
    """
    bu = eu_ref.shape[0]
    n_items = ei_ref.shape[0]
    n_tiles = n_items // item_tile
    nb_tile = item_tile // block
    cols = jax.lax.broadcasted_iota(jnp.int32, (bu, item_tile), 1)
    colsc = jax.lax.broadcasted_iota(jnp.int32, (bu, cbuf), 1)
    big = jnp.int32(item_tile + 1)
    big_id = jnp.int32(2 ** 30)

    @pl.when(pl.program_id(0) == 0)
    def _():
        spill_ref[0, 0] = 0

    def score_tile(t):
        tile = ei_ref[pl.ds(t * item_tile, item_tile), :]
        return jax.lax.dot_general(
            eu_ref[:], tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # ---- pass A: identical to twopass ---------------------------------------
    nb_pad = bm_scr.shape[1]
    bm_scr[:] = jnp.full((bu, nb_pad), -jnp.inf, jnp.float32)
    for t in range(n_tiles):                                    # static unroll
        s = score_tile(t)
        bm = jnp.stack(
            [jnp.max(s[:, b * block:(b + 1) * block], axis=1)
             for b in range(nb_tile)],
            axis=1,
        )
        bm_scr[:, t * nb_tile:(t + 1) * nb_tile] = bm

    colsw = jax.lax.broadcasted_iota(jnp.int32, (bu, nb_pad), 1)

    def tau_extract(j, st):
        w, _ = st
        m = jnp.max(w, axis=1)
        am = jnp.min(
            jnp.where(w >= m[:, None], colsw, jnp.int32(nb_pad + 1)), axis=1
        )
        w = jnp.where(colsw == am[:, None], -jnp.inf, w)
        return w, m

    _, tau = jax.lax.fori_loop(
        0, k, tau_extract, (bm_scr[:], jnp.zeros((bu,), jnp.float32))
    )

    # ---- pass B: id-only cursor collection ----------------------------------
    def pass_b(t, st):
        c_u, lost, bi = st
        s = score_tile(t)
        ge = s >= tau[:, None]                                  # trip-invariant
        base = t * item_tile

        def trip_cond(st2):
            return st2[2] > 0

        def trip(st2):
            c_u, lost, _, cursor, bi = st2
            live = jnp.int32(0)
            for _ in range(chain):                              # static chain
                mask = ge & (cols > cursor[:, None])
                am = jnp.min(jnp.where(mask, cols, big), axis=1)   # THE reduction
                has = am < big
                ok = has & (c_u < cbuf)
                put = ok[:, None] & (colsc == c_u[:, None])
                bi = jnp.where(put, (am + base)[:, None], bi)
                c_u = c_u + ok.astype(jnp.int32)
                lost = lost + jnp.sum((has & ~ok).astype(jnp.int32))
                cursor = am
                live = jnp.sum(has.astype(jnp.int32))           # from LAST round
            return c_u, lost, live, cursor, bi

        c_u, lost, _, _, bi = jax.lax.while_loop(
            trip_cond, trip,
            (c_u, lost, jnp.int32(1), jnp.full((bu,), -1, jnp.int32), bi),
        )
        return c_u, lost, bi

    _, lost, bi_fin = jax.lax.fori_loop(
        0, n_tiles, pass_b,
        (
            jnp.zeros((bu,), jnp.int32),
            jnp.int32(0),
            jnp.full((bu, cbuf), big_id, jnp.int32),
        ),
    )
    spill_ref[0, 0] = spill_ref[0, 0] + lost
    topi_ref[:] = bi_fin



def _collect_call(eu, ei, k, user_tile, item_tile, interpret, block=128,
                  cbuf=64, chain=1):
    """pallas_call wrapper for the id-collect kernel + XLA value postlude."""
    u, d = eu.shape
    n, _ = ei.shape
    nb = n // block
    assert n % block == 0 and nb >= k and k <= cbuf
    grid = (u // user_tile,)
    kernel = functools.partial(
        _fused_kernel_collect,
        k=k, item_tile=item_tile, cbuf=cbuf, block=block, chain=chain,
    )
    bi, spill = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((user_tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((user_tile, cbuf), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((u, cbuf), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((user_tile, ((n // block + 127) // 128) * 128), jnp.float32),
        ],
        interpret=interpret,
    )(eu, ei)

    # XLA postlude: exact f32 scores for the <= cbuf admitted ids per row via a
    # batched d-contraction (bf16 x bf16 -> f32, one MXU pass — same product/
    # accumulation structure as the in-kernel tile matmul), then top-k.  The
    # buffer is in ascending-id cursor order, so lax.top_k's first-occurrence
    # tie rule == (value desc, id asc).
    valid = bi < jnp.int32(2 ** 30)
    safe = jnp.where(valid, bi, 0)
    ei_g = jnp.take(ei, safe, axis=0)                           # [u, cbuf, d]
    vals = jax.lax.dot_general(
        ei_g, eu, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                           # [u, cbuf]
    vals = jnp.where(valid, vals, -jnp.inf)
    topv, pos = jax.lax.top_k(vals, k)
    topi = jnp.take_along_axis(bi, pos, axis=1)

    def fallback(_):
        from serendipity_tpu.ops.topk import topk_exact_2stage

        scores = jax.lax.dot_general(
            eu, ei, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        return topk_exact_2stage(scores, k)

    return jax.lax.cond(
        jnp.max(spill) > 0, fallback, lambda _: (topv, topi), None
    )



def _fused_kernel_parblock(
    eu_ref, ei_ref, topv_ref, topi_ref, spill_ref, bm_scr,
    *, k: int, item_tile: int, cbuf: int, block: int = 128,
):
    """Twopass with PARALLEL per-128-block extraction chains in one trip body.

    Measured motivation (round 3): extraction is latency-bound on DEPENDENT
    reduction chains — narrowing the window with separate per-block while loops
    ("blockwise") ran 2.2x slower despite 8x less vector work, and chaining
    extra cursor extractions in one trip ("unrollN") was flat-to-worse because
    the chains are serially dependent.  Here one trip body extracts one
    candidate from EVERY 128-wide block of the tile as 8 INDEPENDENT
    (col-min, value) chains with per-block cursors — Mosaic can schedule the
    independent reductions concurrently, so trip latency stays ~one chain while
    trip count drops from max-per-tile to max-per-block candidate counts.
    Buffer appends serialize only through a tiny [bu, nb] running-position
    prefix.  Buffer entry order is NOT column order (interleaved by block), but
    the merge orders by (value desc, id asc), so outputs remain bit-identical
    to `lax.top_k`.
    """
    bu = eu_ref.shape[0]
    n_items = ei_ref.shape[0]
    n_tiles = n_items // item_tile
    nb_tile = item_tile // block
    colsb = jax.lax.broadcasted_iota(jnp.int32, (bu, block), 1)
    colsc = jax.lax.broadcasted_iota(jnp.int32, (bu, cbuf), 1)
    big = jnp.int32(block + 1)
    big_id = jnp.int32(2 ** 30)

    @pl.when(pl.program_id(0) == 0)
    def _():
        spill_ref[0, 0] = 0

    def score_tile(t):
        tile = ei_ref[pl.ds(t * item_tile, item_tile), :]
        return jax.lax.dot_general(
            eu_ref[:], tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # ---- pass A: identical to twopass ---------------------------------------
    nb_pad = bm_scr.shape[1]
    bm_scr[:] = jnp.full((bu, nb_pad), -jnp.inf, jnp.float32)
    for t in range(n_tiles):                                    # static unroll
        s = score_tile(t)
        bm = jnp.stack(
            [jnp.max(s[:, b * block:(b + 1) * block], axis=1)
             for b in range(nb_tile)],
            axis=1,
        )
        bm_scr[:, t * nb_tile:(t + 1) * nb_tile] = bm

    colsw = jax.lax.broadcasted_iota(jnp.int32, (bu, nb_pad), 1)

    def tau_extract(j, st):
        w, _ = st
        m = jnp.max(w, axis=1)
        am = jnp.min(
            jnp.where(w >= m[:, None], colsw, jnp.int32(nb_pad + 1)), axis=1
        )
        w = jnp.where(colsw == am[:, None], -jnp.inf, w)
        return w, m

    _, tau = jax.lax.fori_loop(
        0, k, tau_extract, (bm_scr[:], jnp.zeros((bu,), jnp.float32))
    )

    # ---- pass B: 8 independent per-block extraction chains per trip ---------
    def pass_b(t, st):
        c_u, lost, bv, bi = st
        s = score_tile(t)
        base = t * item_tile
        sbs = [s[:, b * block:(b + 1) * block] for b in range(nb_tile)]
        ges = [sb >= tau[:, None] for sb in sbs]                # trip-invariant

        def trip_cond(st2):
            return st2[2] > 0

        def trip(st2):
            c_u, lost, _, cursors, bv, bi = st2                 # cursors [bu, nb]
            # independent chains: one (col, val) extraction per block
            ams, vals = [], []
            for b in range(nb_tile):
                mask = ges[b] & (colsb > cursors[:, b][:, None])
                am = jnp.min(jnp.where(mask, colsb, big), axis=1)
                val = jnp.sum(
                    jnp.where(colsb == am[:, None], sbs[b], 0.0), axis=1
                )
                ams.append(am)
                vals.append(val)
            am_nb = jnp.stack(ams, axis=1)                      # [bu, nb]
            has_nb = am_nb < big
            # running buffer positions: exclusive prefix of has over the (few,
            # static) blocks — manual unroll, Mosaic has no cumsum lowering
            live = jnp.int32(0)
            for b in range(nb_tile):                            # narrow appends
                has = has_nb[:, b]
                ok = has & (c_u < cbuf)
                put = ok[:, None] & (colsc == c_u[:, None])
                bv = jnp.where(put, vals[b][:, None], bv)
                bi = jnp.where(put, (ams[b] + base + b * block)[:, None], bi)
                c_u = c_u + ok.astype(jnp.int32)
                lost = lost + jnp.sum((has & ~ok).astype(jnp.int32))
                live = live + jnp.sum(has.astype(jnp.int32))
            return c_u, lost, live, am_nb, bv, bi

        c_u, lost, _, _, bv, bi = jax.lax.while_loop(
            trip_cond, trip,
            (
                c_u, lost, jnp.int32(1),
                jnp.full((bu, nb_tile), -1, jnp.int32), bv, bi,
            ),
        )
        return c_u, lost, bv, bi

    _, lost, bv_fin, bi_fin = jax.lax.fori_loop(
        0, n_tiles, pass_b,
        (
            jnp.zeros((bu,), jnp.int32),
            jnp.int32(0),
            jnp.full((bu, cbuf), -jnp.inf, jnp.float32),
            jnp.full((bu, cbuf), big_id, jnp.int32),
        ),
    )
    spill_ref[0, 0] = spill_ref[0, 0] + lost

    # ---- merge: identical to twopass ----------------------------------------
    slots = jax.lax.broadcasted_iota(jnp.int32, (bu, k), 1)

    def merge(j, st):
        bv, bi, out_v, out_i = st
        m = jnp.max(bv, axis=1)
        is_m = bv >= m[:, None]
        gid = jnp.min(jnp.where(is_m, bi, big_id), axis=1)
        sel = bi == gid[:, None]
        out_v = jnp.where(slots == j, m[:, None], out_v)
        out_i = jnp.where(slots == j, gid[:, None], out_i)
        bv = jnp.where(sel, -jnp.inf, bv)
        return bv, bi, out_v, out_i

    init = (
        bv_fin, bi_fin,
        jnp.full((bu, k), -jnp.inf, jnp.float32),
        jnp.zeros((bu, k), jnp.int32),
    )
    _, _, v_fin, i_fin = jax.lax.fori_loop(0, k, merge, init)
    topv_ref[:] = v_fin
    topi_ref[:] = i_fin



def _fused_kernel_blockwise(
    eu_ref, ei_ref, topv_ref, topi_ref, spill_ref, bm_scr,
    *, k: int, item_tile: int, cbuf: int, block: int = 128,
):
    """Two-pass top-k with 128-lane-sliced pass-B extraction.

    Same pass A / tau / merge as `_fused_kernel_twopass`; pass B differs: the
    cursor extraction runs per STATIC 128-wide column slice instead of over the
    full item tile.  Rationale: a while_loop's trip count is max-over-rows of
    the per-row candidate count inside its window (all rows are coupled through
    one cond), and for ~Poisson-thin candidates the max is several times the
    mean — so narrowing the window from `item_tile` to 128 cuts the wasted
    full-width passes roughly by the ratio of the two coupled maxima, while the
    admission compare (`s >= tau`) is hoisted out of the trip loop entirely
    (computed once per slice).  The MXU matmul stays tile-wide.  Bit-identical
    to the other variants: slices are processed in ascending column order and
    the merge orders by (value desc, id asc), so tie semantics match
    `lax.top_k`.
    """
    bu = eu_ref.shape[0]
    n_items = ei_ref.shape[0]
    n_tiles = n_items // item_tile
    nb_tile = item_tile // block
    colsb = jax.lax.broadcasted_iota(jnp.int32, (bu, block), 1)
    colsc = jax.lax.broadcasted_iota(jnp.int32, (bu, cbuf), 1)
    big = jnp.int32(block + 1)
    big_id = jnp.int32(2 ** 30)

    @pl.when(pl.program_id(0) == 0)
    def _():
        spill_ref[0, 0] = 0

    def score_tile(t):
        tile = ei_ref[pl.ds(t * item_tile, item_tile), :]
        return jax.lax.dot_general(
            eu_ref[:], tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # ---- pass A: identical to twopass (see _fused_kernel_twopass) -----------
    nb_pad = bm_scr.shape[1]
    bm_scr[:] = jnp.full((bu, nb_pad), -jnp.inf, jnp.float32)
    for t in range(n_tiles):                                    # static unroll
        s = score_tile(t)
        bm = jnp.stack(
            [jnp.max(s[:, b * block:(b + 1) * block], axis=1)
             for b in range(nb_tile)],
            axis=1,
        )
        bm_scr[:, t * nb_tile:(t + 1) * nb_tile] = bm

    colsw = jax.lax.broadcasted_iota(jnp.int32, (bu, nb_pad), 1)

    def tau_extract(j, st):
        w, _ = st
        m = jnp.max(w, axis=1)
        am = jnp.min(
            jnp.where(w >= m[:, None], colsw, jnp.int32(nb_pad + 1)), axis=1
        )
        w = jnp.where(colsw == am[:, None], -jnp.inf, w)
        return w, m

    _, tau = jax.lax.fori_loop(
        0, k, tau_extract, (bm_scr[:], jnp.zeros((bu,), jnp.float32))
    )

    # ---- pass B: per-128-slice cursor extraction ----------------------------
    def pass_b(t, st):
        c_u, lost, bv, bi = st
        s = score_tile(t)
        base = t * item_tile

        for b in range(nb_tile):                                # static unroll
            sb = s[:, b * block:(b + 1) * block]                # [bu, 128]
            ge = sb >= tau[:, None]                             # trip-invariant

            def trip_cond(st2):
                return st2[2] > 0

            def trip(st2, sb=sb, ge=ge, off=base + b * block):
                c_u, lost, _, lastc, bv, bi = st2
                mask = ge & (colsb > lastc[:, None])
                am = jnp.min(jnp.where(mask, colsb, big), axis=1)
                has = am < big
                val = jnp.sum(jnp.where(colsb == am[:, None], sb, 0.0), axis=1)
                ok = has & (c_u < cbuf)
                put = ok[:, None] & (colsc == c_u[:, None])
                bv = jnp.where(put, val[:, None], bv)
                bi = jnp.where(put, (am + off)[:, None], bi)
                c_u = c_u + ok.astype(jnp.int32)
                lost = lost + jnp.sum((has & ~ok).astype(jnp.int32))
                live = jnp.sum(has.astype(jnp.int32))
                return c_u, lost, live, am, bv, bi

            c_u, lost, _, _, bv, bi = jax.lax.while_loop(
                trip_cond, trip,
                (c_u, lost, jnp.int32(1), jnp.full((bu,), -1, jnp.int32), bv, bi),
            )
        return c_u, lost, bv, bi

    _, lost, bv_fin, bi_fin = jax.lax.fori_loop(
        0, n_tiles, pass_b,
        (
            jnp.zeros((bu,), jnp.int32),
            jnp.int32(0),
            jnp.full((bu, cbuf), -jnp.inf, jnp.float32),
            jnp.full((bu, cbuf), big_id, jnp.int32),
        ),
    )
    spill_ref[0, 0] = spill_ref[0, 0] + lost

    # ---- merge: identical to twopass ----------------------------------------
    slots = jax.lax.broadcasted_iota(jnp.int32, (bu, k), 1)

    def merge(j, st):
        bv, bi, out_v, out_i = st
        m = jnp.max(bv, axis=1)
        is_m = bv >= m[:, None]
        gid = jnp.min(jnp.where(is_m, bi, big_id), axis=1)
        sel = bi == gid[:, None]
        out_v = jnp.where(slots == j, m[:, None], out_v)
        out_i = jnp.where(slots == j, gid[:, None], out_i)
        bv = jnp.where(sel, -jnp.inf, bv)
        return bv, bi, out_v, out_i

    init = (
        bv_fin, bi_fin,
        jnp.full((bu, k), -jnp.inf, jnp.float32),
        jnp.zeros((bu, k), jnp.int32),
    )
    _, _, v_fin, i_fin = jax.lax.fori_loop(0, k, merge, init)
    topv_ref[:] = v_fin
    topi_ref[:] = i_fin



def _fused_kernel_subtile(
    eu_ref, ei_ref, topv_ref, topi_ref, v_scr, i_scr,
    *, k: int, item_tile: int, sub: int,
):
    """Sub-block-gated variant: decouple extraction from the full tile width.

    The "insert" variant's while_loop couples all rows through one global max, so
    every trip pays ~6 full-width [bu, item_tile] VPU passes.  Here the MXU matmul
    stays wide (item_tile), but selection runs per SUB-block of width `sub`: one
    cheap block-max pass computes, per sub-block, whether ANY row still admits a
    candidate (`pl.when` on a scalar), and only admitting sub-blocks run the
    sorted-insert while_loop — at 1/(item_tile/sub) of the width.  After the first
    tile raises the per-row thresholds, expected admitting sub-blocks per tile
    ~= expected candidates (k*item_tile/N per row), so steady-state cost is the
    matmul + ~2 full-width passes, independent of k.

    The running top-k lives in VMEM scratch (mutated inside `pl.when`), which is
    what allows predicated in-place updates instead of functional carries.
    Admission uses strict `>` against each row's k-th value and sub-blocks are
    processed in ascending item order, so tie order (first occurrence wins) is
    bit-identical to `lax.top_k` and the other variants.
    """
    bu = eu_ref.shape[0]
    n_items = ei_ref.shape[0]
    n_tiles = n_items // item_tile
    nb = item_tile // sub
    cols = jax.lax.broadcasted_iota(jnp.int32, (bu, sub), 1)
    slots = jax.lax.broadcasted_iota(jnp.int32, (bu, k), 1)
    big = jnp.int32(sub + 1)

    v_scr[:] = jnp.full((bu, k), -jnp.inf, jnp.float32)
    i_scr[:] = jnp.zeros((bu, k), jnp.int32)

    def tile_body(t, carry):
        tile = ei_ref[pl.ds(t * item_tile, item_tile), :]
        s = jax.lax.dot_general(
            eu_ref[:], tile,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                                           # [bu, item_tile]
        for b in range(nb):
            sb = s[:, b * sub:(b + 1) * sub]                        # static slice
            bm = jnp.max(sb, axis=1)                                # [bu]
            # stale-threshold check is conservative: thresholds only rise, so a
            # sub-block skipped against the current scratch stays skippable
            @pl.when(jnp.any(bm > v_scr[:, k - 1]))
            def _(b=b, sb=sb, bm=bm, t=t):
                ids = cols + (t * item_tile + b * sub)

                def cond(st):
                    _, vv, _, m = st
                    return jnp.any(m > vv[:, k - 1])

                def body(st):
                    wv, vv, ii, m = st
                    is_m = wv >= m[:, None]
                    am = jnp.min(jnp.where(is_m, cols, big), axis=1)
                    sel = cols == am[:, None]
                    gid = jnp.max(jnp.where(sel, ids, -1), axis=1)
                    wv = jnp.where(sel, -jnp.inf, wv)
                    do = (m > vv[:, k - 1])[:, None]
                    pos = jnp.sum((vv >= m[:, None]).astype(jnp.int32), axis=1)[:, None]
                    v_sh = jnp.concatenate([vv[:, :1], vv[:, :-1]], axis=1)
                    i_sh = jnp.concatenate([ii[:, :1], ii[:, :-1]], axis=1)
                    v_new = jnp.where(
                        slots == pos, m[:, None], jnp.where(slots > pos, v_sh, vv)
                    )
                    i_new = jnp.where(
                        slots == pos, gid[:, None], jnp.where(slots > pos, i_sh, ii)
                    )
                    vv = jnp.where(do, v_new, vv)
                    ii = jnp.where(do, i_new, ii)
                    return wv, vv, ii, jnp.max(wv, axis=1)

                st = (sb, v_scr[:], i_scr[:], bm)
                _, vv, ii, _ = jax.lax.while_loop(cond, body, st)
                v_scr[:] = vv
                i_scr[:] = ii
        return carry

    jax.lax.fori_loop(0, n_tiles, tile_body, 0)
    topv_ref[:] = v_scr[:]
    topi_ref[:] = i_scr[:]




def dispatch(
    eu, ei, k, user_tile, item_tile, sub_tile, interpret, variant
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Route a museum variant name to its retired body (exact semantics of the
    pre-round-5 `fused_score_topk` dispatch).  Callers guarantee the threshold
    guard (n % 128 == 0, n // 128 >= k, k <= 64) for the twopass-family names."""
    from serendipity_tpu.ops.pallas_score import _twopass_call

    u, d = eu.shape
    n, _ = ei.shape
    grid = (u // user_tile,)
    if variant.startswith("twopass5"):
        block = int(variant[9:]) if len(variant) > 9 else 128
        if n % block != 0 or n // block < k:
            block = 128
        return _twopass_call(
            eu, ei, k, user_tile, min(item_tile, 1024), interpret,
            body=_fused_kernel_twopass5, block=block,
        )
    if variant.startswith("twopass3"):
        chain = int(variant[9:]) if len(variant) > 9 else 1
        body = functools.partial(_fused_kernel_twopass3, chain=chain)
        # wider score tiles are FEASIBLE for this body (no full-width workspace
        # carry) and cut pass-B trip count via max-over-rows candidate stats
        return _twopass_call(
            eu, ei, k, user_tile, min(item_tile, 4096), interpret, body=body
        )
    if variant.startswith("collect"):
        chain = int(variant[7:]) if len(variant) > 7 else 1
        return _collect_call(
            eu, ei, k, user_tile, min(item_tile, 1024), interpret, chain=chain
        )
    if variant == "twopass" or variant.startswith("unroll") or variant in (
        "blockwise", "parblock"
    ):
        body = {
            "twopass": _fused_kernel_twopass,
            "blockwise": _fused_kernel_blockwise,
            "parblock": _fused_kernel_parblock,
        }.get(variant) or functools.partial(
            _fused_kernel_twopass_unroll, unroll=int(variant[6:])
        )
        return _twopass_call(
            eu, ei, k, user_tile, min(item_tile, 1024), interpret, body=body
        )
    scratch = []
    if variant == "subtile":
        sub_tile = min(sub_tile, item_tile)
        assert item_tile % sub_tile == 0
        kernel = functools.partial(
            _fused_kernel_subtile, k=k, item_tile=item_tile, sub=sub_tile
        )
        scratch = [
            pltpu.VMEM((user_tile, k), jnp.float32),
            pltpu.VMEM((user_tile, k), jnp.int32),
        ]
    elif variant == "extract":
        kernel = functools.partial(_fused_kernel, k=k, item_tile=item_tile)
    else:
        raise ValueError(f"unknown kernel variant {variant!r}")
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((user_tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((user_tile, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((user_tile, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((u, k), jnp.float32),
            jax.ShapeDtypeStruct((u, k), jnp.int32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
    )(eu, ei)
