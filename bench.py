"""Headline benchmark: per-chip candidate-scoring throughput.

Task: score every user against the full item catalog and take EXACT top-20 — the hot
path of the reference's candidate generation + accuracy strategy (`recommend.py:375`
`np.dot(emb_user, emb_item.T)` + `sub_argpartition`), at gowalla scale
(29,856 users x 40,960 items x 64 dims).

Implementation: the Pallas fused kernel (`serendipity_tpu.ops.pallas_score`,
"twopass4" default in round 3: per-row exact admission threshold from block
maxima, then counted-trip key-encoded cursor extraction of the ~k true
candidates) — bf16 MXU matmuls with the score tile kept in VMEM; bit-identical
to `lax.top_k` (tie-spill fallback for pathological inputs).  Round-3 session
measurement ~52 Gscores/s (+14% over the round-2 "twopass" body in a
same-dispatch comparison; driver BENCH_r02 recorded 49.2 for twopass, up from
23.4 round-1 "insert" and ~6 for the XLA exact-2-stage path).  The rest of the
round-3 design space (9 variants incl. narrow/parallel/pipelined extraction and
an id-collect + XLA-postlude split) measured WORSE — see the module docstring
table in ops/pallas_score.py for the map and the cost model (pass-B extraction
is bound by ~2 serial cross-lane reduction latencies per candidate; tau already
admits only ~3% excess).

Timing: sustained throughput — PASSES=8 full scoring passes per dispatch (inputs
perturbed per pass so XLA cannot CSE them), one host round-trip + scalar fetch per
dispatch, best of several trials.  Per-pass dispatch would charge this tunnel's
~77 ms RPC round-trip against every pass; amortizing it measures the device, which
is what multi-batch production serving sees.

Metric: scores/sec/chip = U * I / wall time.
vs_baseline: ratio to the reference implementation's throughput for the identical
task — numpy fp16 `np.dot` + `np.argpartition` on host CPU (the reference's actual
implementation; measured on this machine: 2.88e6 scores/sec).  BASELINE.json targets
>= 5x.

Secondary fields (same JSON line): BPR TRAINING-step throughput at gowalla scale
(29,858 x 40,981 synthetic, batch 2048, 3 layers, bf16, hybrid SpMM) — the other
headline workload, where the reference GPU trainers report 27-36 s/epoch
(`LightGCN-tf/README.md:30-48`, `lightGCN/.../README.md:95-110`):
  train_step_ms           mean ms per optimizer step (fresh sampled batches each
                          step inside a jitted scan; params advance every step, so
                          nothing is loop-hoisted)
  train_interactions_per_s  batch_size / step time
  train_epoch_s           step time x ceil(n_train / batch) — directly comparable
                          to the reference's per-epoch numbers

Prints ONE JSON line.
"""

import json
import os
import sys
import time

import numpy as np

REFERENCE_CPU_SCORES_PER_SEC = 2.88e6

N_USERS = 29_696          # gowalla-scale, multiple of the 256-row user tile
N_ITEMS = 40_960
DIM = 64
TOP_K = 20
PASSES = 8                # scoring passes per dispatch (RPC amortization)


def main():
    import jax
    import jax.numpy as jnp

    from serendipity_tpu.ops.pallas_score import fused_score_topk

    rng = np.random.default_rng(0)
    eu = jnp.asarray(rng.standard_normal((N_USERS, DIM)), dtype=jnp.bfloat16)
    ei = jnp.asarray(rng.standard_normal((N_ITEMS, DIM)), dtype=jnp.bfloat16)

    def make_bench(score_fn):
        @jax.jit
        def run(eu, ei, c):
            def body(t, acc):
                ct = c + t.astype(jnp.bfloat16) * jnp.bfloat16(1e-6)
                v, idx = score_fn(eu + ct, ei)
                # checksum forces the full result each pass
                return acc + v.sum() + idx.sum()

            return jax.lax.fori_loop(0, PASSES, body, jnp.float32(0.0))

        return run

    # warmup / compile; fall back to the pure-XLA exact path if Mosaic balks on
    # this toolchain so the benchmark always records a number
    score_topk = make_bench(lambda u, i: fused_score_topk(u, i, k=TOP_K))
    try:
        float(score_topk(eu, ei, jnp.bfloat16(0.0)))
    except Exception:
        from serendipity_tpu.ops.topk import topk_exact_2stage

        def xla_exact(u, i):
            scores = jax.lax.dot_general(
                u, i, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return topk_exact_2stage(scores, TOP_K)

        score_topk = make_bench(xla_exact)
        float(score_topk(eu, ei, jnp.bfloat16(0.0)))

    best = np.inf
    for t in range(8):
        t0 = time.perf_counter()
        float(score_topk(eu, ei, jnp.bfloat16(t * 1e-6)))
        best = min(best, time.perf_counter() - t0)

    scores_per_sec = N_USERS * N_ITEMS * PASSES / best
    rec = {
        "metric": "candidate_scoring_throughput",
        "value": round(scores_per_sec / 1e9, 3),
        "unit": "Gscores/s/chip",
        "vs_baseline": round(scores_per_sec / REFERENCE_CPU_SCORES_PER_SEC, 1),
    }
    # STPU_BENCH_SCALE: "both" (default) = gowalla + ML-25M train fields,
    # "gowalla" / "ml25m" = one scale only.  The flagship ML-25M scale is
    # driver-visible by default since round 5 (VERDICT r4 #1).
    scale = os.environ.get("STPU_BENCH_SCALE", "both")
    if scale not in ("both", "gowalla", "ml25m"):
        rec["train_bench_error"] = f"unknown STPU_BENCH_SCALE={scale!r}"
        scale = "both"
    if scale in ("both", "gowalla"):
        try:
            rec.update(bench_train_step())
        except Exception as e:  # train bench must never cost the headline metric
            rec["train_bench_error"] = f"{type(e).__name__}: {e}"[:200]
    if scale in ("both", "ml25m"):
        try:
            rec.update(bench_train_step(scale="ml25m"))
        except Exception as e:
            rec["train_bench_error_ml25m"] = f"{type(e).__name__}: {e}"[:200]
    # Fused masked-eval bench: ON by default since round 4 (STPU_BENCH_EVAL=0
    # to skip).  The masked Pallas kernel's heavy Mosaic compile is served from
    # the remote-compile service's persistent executable cache after its first
    # ever build at a shape — measured round 4: first call 23.7 s at this exact
    # shape, whole eval bench ~2 min inside the full bench run (DESIGN.md §7c);
    # the round-3 ~10-min figure was the one-time first-ever build.
    if os.environ.get("STPU_BENCH_EVAL", "1") != "0":
        # safety copy to STDERR (keeps the record if eval dies mid-dispatch);
        # stdout carries exactly ONE JSON line either way
        print(json.dumps(rec), file=sys.stderr, flush=True)
        try:
            rec.update(bench_eval())
        except Exception as e:
            rec["eval_bench_error"] = f"{type(e).__name__}: {e}"[:200]
    print(json.dumps(rec))


def bench_eval():
    """Full-catalog masked ranking-eval throughput at gowalla scale.

    The reference evaluates by materializing masked [B, N] score matrices and
    running top-k per batch (C++ thread pool / torch.topk); here the fused
    masked Pallas kernel (`eval.fused`) scores, masks, and selects in VMEM.
    Reports users/s over the whole catalog (all test users, train-item
    masking, cumulative metrics at k=20)."""
    import time as _time

    import jax
    import jax.numpy as jnp

    from serendipity_tpu.config import ExperimentConfig, apply_overrides
    from serendipity_tpu.data.synthetic import synthetic_interactions
    from serendipity_tpu.train.device import build_device_data
    from serendipity_tpu.train.evaluator import Evaluator
    from serendipity_tpu.train.runner import build_model

    cfg = apply_overrides(ExperimentConfig(), ["eval.fused=true"])
    inter = synthetic_interactions(29858, 40981, avg_degree=35, seed=0)
    data = build_device_data(inter, spmm_mode="edges")
    model = build_model(cfg, inter.n_users, inter.n_items)
    rng = np.random.default_rng(0)
    emb = (jnp.asarray(rng.standard_normal((inter.n_users, 64)), jnp.bfloat16),
           jnp.asarray(rng.standard_normal((inter.n_items, 64)), jnp.bfloat16))
    ev = Evaluator(model, data, inter, cfg.eval)
    n_users_eval = int(np.sum(np.diff(inter.test_indptr) > 0))
    ev.evaluate(None, all_emb=emb)                     # compile
    best = np.inf
    for _ in range(3):
        t0 = _time.perf_counter()
        ev.evaluate(None, all_emb=emb)
        best = min(best, _time.perf_counter() - t0)
    return {
        "eval_users_per_s": round(n_users_eval / best),
        "eval_full_catalog_s": round(best, 3),
        "eval_fused": ev._bitmap is not None,
    }


def _train_bytes_model(data, cfg, n_users, n_items):
    """Modeled HBM bytes per optimizer step, from the ACTUAL bound layout.

    Fwd propagation per layer: both hybrid dense blocks stream once
    (2*K*U*dense_bytes), tail-ELL edges move ~2 embedding rows + indices each,
    and each SpMM reads its input table and writes its output
    (2*(U+I)*D*act).  Backward applies the transpose operators — same traffic.
    Mean-pool reads all L+1 layer activations; Adam reads+writes params and
    both moments in f32.  This is a LOWER bound (no re-materialization, no
    padding waste), so achieved/modeled <= 1 gauges how far the step is from
    its own layout's streaming bound."""
    d = cfg.model.embed_dim
    act = 2 if cfg.model.compute_dtype == "bfloat16" else 4
    l_layers = cfg.model.n_layers
    rows = n_users + n_items
    consts = data.spmm_split.consts if data.spmm_split is not None else None
    if consts is not None and "d_ui" in consts:
        k_head, u = consts["d_ui"].shape
        dense_bytes = consts["d_ui"].dtype.itemsize
        tail = 0
        for key in ("t_ui", "t_iu"):
            if consts[key] is not None:
                tail += int(consts[key][0].size)
        spmm_layer = (
            2 * k_head * u * dense_bytes
            + tail * (2 * d * act + 8)
            + 2 * rows * d * act
        )
    else:  # edge-list fallback: every edge gathers + scatters a row
        spmm_layer = data.n_train * 2 * (2 * d * act + 8) + 2 * rows * d * act
    fwd = l_layers * spmm_layer
    pool = 2 * (l_layers + 1) * rows * d * act
    adam = 6 * rows * d * 4
    return 2 * fwd + pool + adam


def bench_train_step(scale: str = "gowalla"):
    """Training-step throughput (see module docstring).

    scale="gowalla": 29,858 x 40,981, batch 2048 — the tuned headline shape.
    scale="ml25m": 162,541 x 59,047 (ML-25M), batch 8192 — the flagship scale
    the reference cannot represent at all (its candidate stage materializes the
    dense U·Iᵀ in numpy, 38 GB fp16); fields get an `_ml25m` suffix."""
    import jax
    import jax.numpy as jnp

    from serendipity_tpu.config import ExperimentConfig, apply_overrides
    from serendipity_tpu.data.synthetic import synthetic_interactions
    from serendipity_tpu.train.bpr import BPRTrainer
    from serendipity_tpu.train.device import build_device_data
    from serendipity_tpu.train.runner import build_model

    batch_size = 2048 if scale == "gowalla" else 8192
    cfg = apply_overrides(
        ExperimentConfig(),
        ["model.n_layers=3", f"train.batch_size={batch_size}", "train.lr=0.001"],
    )
    if scale == "gowalla":
        inter = synthetic_interactions(29858, 40981, avg_degree=35, seed=0)
    else:
        inter = synthetic_interactions(162541, 59047, avg_degree=150, seed=0)
    data = build_device_data(
        inter, spmm_mode=cfg.model.spmm, compute_dtype=cfg.model.compute_dtype
    )
    model = build_model(cfg, inter.n_users, inter.n_items)
    trainer = BPRTrainer(cfg, model, data)
    state = trainer.init_state()

    # warmup/compile one chunk, then time whole chunks (scan of fresh sampled
    # steps; params/opt-state advance every step — nothing hoistable)
    consts = trainer.step_consts
    params, opt, key = state.params, state.opt_state, state.key
    params, opt, key, loss, _ = trainer._chunk_fn(params, opt, key, consts)
    float(loss)
    steps = trainer.chunk
    # pipeline CHUNKS_PER_SYNC chunk dispatches per forced sync: dispatch is
    # async, so the ~77 ms tunnel RPC overlaps device compute and only the
    # final scalar fetch blocks — measuring sustained training throughput the
    # way a real multi-chunk epoch runs (a per-chunk sync would charge one
    # full RPC round-trip to every 32-step chunk, ~2.4 ms/step of pure relay
    # overhead that the device never sees)
    chunks_per_sync = 4
    best = np.inf
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(chunks_per_sync):
            params, opt, key, loss, _ = trainer._chunk_fn(params, opt, key, consts)
        float(loss)
        best = min(best, time.perf_counter() - t0)
    step_s = best / (steps * chunks_per_sync)
    batch = cfg.train.batch_size
    steps_per_epoch = -(-data.n_train // batch)
    # bandwidth roofline visibility (VERDICT r3 #6): modeled bytes from the
    # bound layout vs achieved stream rate vs the MEASURED achievable peak on
    # this chip (369 GB/s read-reduce, round-4 probe — the 820 GB/s spec number
    # round 3 assumed is not reachable here; DESIGN.md §8)
    bytes_model = _train_bytes_model(data, cfg, inter.n_users, inter.n_items)
    hbm_peak = 3.69e11
    sfx = "" if scale == "gowalla" else f"_{scale}"
    return {
        f"train_step_ms{sfx}": round(step_s * 1e3, 3),
        f"train_interactions_per_s{sfx}": round(batch / step_s),
        f"train_epoch_s{sfx}": round(step_s * steps_per_epoch, 3),
        f"train_model_bytes_per_step{sfx}": int(bytes_model),
        f"train_achieved_gbps{sfx}": round(bytes_model / step_s / 1e9, 1),
        f"train_hbm_frac{sfx}": round(bytes_model / step_s / hbm_peak, 3),
    }


if __name__ == "__main__":
    main()
