"""Pin the fused-kernel extraction ceiling (VERDICT r4 #4).

The twopass4 cost model claims pass-B extraction is bound by ~2 serially
dependent cross-lane reduction LATENCIES per extracted candidate — asserted
from fits over variant timings, never measured directly.  This probe:

  1. microbenchmarks the EXACT trip body (min-reduction over the key tile with
     a serial cursor dependency + the masked sum that extracts the value) in
     isolation, sweeping the trip count -> latency per trip;
  2. counts the true coupled max-over-rows trip total for the bench inputs on
     the host (same RNG as bench.py);
  3. predicts pass-B extraction = trips_total x trip_latency / grid-pipelining
     and compares against the measured kernel wall minus the known pass-A/tau
     and matmul costs.

Within ~15% = ceiling proven; a gap = headroom for the compaction family.
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

print(jax.devices(), flush=True)
BU, IT = 256, 1024          # user tile x item tile (bench geometry)
N_USERS, N_ITEMS, DIM, K = 29696, 40960, 64, 20


def lat_kernel(x_ref, o_ref, *, trips, with_val):
    s = x_ref[...]
    cols = jax.lax.broadcasted_iota(jnp.int32, (BU, IT), 1)
    key = jnp.where(s > 0.0, cols, jnp.int32(IT + 1))
    big = jnp.int32(2 ** 30)

    def trip(_, st):
        cursor, acc = st
        am = jnp.min(jnp.where(key > cursor[:, None], key, big), axis=1)
        if with_val:
            val = jnp.sum(jnp.where(key == am[:, None], s, 0.0), axis=1)
            acc = acc + val
        return am, acc

    am, acc = jax.lax.fori_loop(
        0, trips, trip, (jnp.full((BU,), -1, jnp.int32), jnp.zeros((BU,), jnp.float32))
    )
    o_ref[...] = (acc + am.astype(jnp.float32))[:, None]


@partial(jax.jit, static_argnames=("trips", "with_val"))
def run_lat(x, trips, with_val):
    return pl.pallas_call(
        partial(lat_kernel, trips=trips, with_val=with_val),
        grid=(1,),
        in_specs=[pl.BlockSpec((BU, IT), lambda i: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((BU, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BU, 1), jnp.float32),
    )(x)


def timeit(fn, n=6):
    fn()
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter(); fn(); best = min(best, time.perf_counter() - t0)
    return best


rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((BU, IT)), jnp.float32)
print("trip-latency sweep (one [256,1024] VMEM tile, serial cursor chain):", flush=True)
results = {}
for with_val in (False, True):
    walls = []
    # big trip counts: the dispatch RPC floor is ~25-30 ms, so the
    # kernel must dominate for a measurable slope
    for trips in (16384, 131072, 524288):
        t = timeit(lambda trips=trips: float(run_lat(x, trips, with_val).sum()))
        walls.append((trips, t))
        print(f"  with_val={with_val} trips={trips}: {t*1e3:.2f} ms", flush=True)
    (t1, w1), (t2, w2) = walls[0], walls[-1]
    lat = (w2 - w1) / (t2 - t1)
    results[with_val] = lat
    print(f"  -> latency/trip (with_val={with_val}): {lat*1e9:.1f} ns", flush=True)

# ---- true trip totals for the bench inputs -----------------------------------
eu = rng.standard_normal((N_USERS, DIM)).astype(np.float32)
ei = rng.standard_normal((N_ITEMS, DIM)).astype(np.float32)
# NOTE: bench.py perturbs inputs per pass; trip statistics are insensitive
eub = eu.astype(np.float32)
total_trips = 0
n_tiles = N_ITEMS // IT
for u0 in range(0, N_USERS, BU):
    s = eub[u0:u0 + BU] @ ei.T                       # [BU, N]
    # tau = k-th largest 128-block max per row
    bm = s.reshape(BU, N_ITEMS // 128, 128).max(axis=2)
    tau = np.sort(bm, axis=1)[:, -K]
    adm = s >= tau[:, None]
    cnt = adm.reshape(BU, n_tiles, IT).sum(axis=2)   # [BU, n_tiles]
    total_trips += cnt.max(axis=0).sum()             # coupled max-over-rows
grid = N_USERS // BU
print(f"coupled trip total over the whole grid: {total_trips} "
      f"({total_trips / (N_USERS * K / (N_USERS / BU)):.2f}x the per-grid-step k)", flush=True)

lat = results[True]
pred_ms = total_trips * lat * 1e3
print(f"PREDICTED extraction wall: {total_trips} trips x {lat*1e9:.1f} ns "
      f"= {pred_ms:.2f} ms", flush=True)

# ---- measured kernel wall at bench shape -------------------------------------
from serendipity_tpu.ops.pallas_score import fused_score_topk
eud = jnp.asarray(eu, jnp.bfloat16)
eid = jnp.asarray(ei, jnp.bfloat16)
t = timeit(lambda: float(fused_score_topk(eud, eid, k=K)[0].sum()))
gsc = N_USERS * N_ITEMS / t / 1e9
print(f"measured twopass4 kernel: {t*1e3:.2f} ms ({gsc:.1f} Gscores/s one-pass "
      f"dispatch, incl ~77 ms RPC -> use bench.py for throughput)", flush=True)
print("DONE", flush=True)
