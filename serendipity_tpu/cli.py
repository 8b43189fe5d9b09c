"""Command-line interface.

    python -m serendipity_tpu.cli train data.path=... model.n_layers=4
    python -m serendipity_tpu.cli prone data.path=...
    python -m serendipity_tpu.cli pipeline data.path=... [--embeddings DIR]
    python -m serendipity_tpu.cli preprocess --input raw.csv --output DIR ...
    python -m serendipity_tpu.cli eval data.path=... --embeddings DIR
    python -m serendipity_tpu.cli seren data.path=... [--embeddings DIR]
                                        [--unexpectedness]

One config tree + dotted overrides everywhere (replaces the reference's three
argparse parsers and hand-edited driver lists, SURVEY.md §5 config).
"""

from __future__ import annotations

import argparse
import os
from typing import List

import numpy as np

from serendipity_tpu.config import ExperimentConfig, apply_overrides


def _cfg(overrides: List[str]) -> ExperimentConfig:
    return apply_overrides(ExperimentConfig(), overrides)


def expand_fusion_specs(fuse, fuse_sweep):
    """--fuse "acc:0.5,nov:0.5" specs + --fuse-sweep "acc,div" 9-point weight grids
    (the reference's merge-weight sweep, `main.py:63-75`)."""
    specs = []
    for spec in fuse or []:
        names, weights = [], []
        for part in spec.split(","):
            n, w = part.split(":")
            names.append(n)
            weights.append(float(w))
        specs.append((names, weights))
    for spec in fuse_sweep or []:
        a, b = spec.split(",")
        for w10 in range(1, 10):
            w = w10 / 10.0
            specs.append(([a, b], [round(w, 1), round(1 - w, 1)]))
    return specs or None


def _load_embedding_pair(path: str):
    """Load (emb_user, emb_item) from a run directory.

    Accepts both the trainer's `emb_user.npy`/`emb_item.npy` and the ProNE
    export names `emb_user_proNE.npy`/`emb_item_proNE.npy` (the reference's
    filenames, `proNE.py:177-178`), so `train --pretrained` / `eval
    --embeddings` can point straight at a `prone` output directory.
    """
    for suffix in ("", "_proNE"):
        fu = os.path.join(path, f"emb_user{suffix}.npy")
        fi = os.path.join(path, f"emb_item{suffix}.npy")
        if os.path.exists(fu) and os.path.exists(fi):
            return np.load(fu), np.load(fi)
    raise FileNotFoundError(f"no emb_user/emb_item .npy pair under {path}")


def cmd_train(args) -> None:
    from serendipity_tpu.train.runner import run_training

    cfg = _cfg(args.overrides)
    pretrained = _load_embedding_pair(args.pretrained) if args.pretrained else None
    run_training(cfg, pretrained=pretrained)


def cmd_prone(args) -> None:
    from serendipity_tpu.models.prone import prone_embeddings
    from serendipity_tpu.train.runner import load_dataset

    cfg = _cfg(args.overrides)
    inter = load_dataset(cfg)
    mesh = None
    if cfg.mesh.data_axis * cfg.mesh.model_axis not in (0, 1):
        from serendipity_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(n_data=cfg.mesh.data_axis, n_model=cfg.mesh.model_axis)
    emb_u, emb_i = prone_embeddings(inter, cfg.prone, seed=cfg.train.seed, mesh=mesh)
    out = os.path.join(cfg.out_dir, cfg.data.name)
    os.makedirs(out, exist_ok=True)
    np.save(os.path.join(out, "emb_user_proNE.npy"), emb_u)
    np.save(os.path.join(out, "emb_item_proNE.npy"), emb_i)
    print(f"saved ProNE embeddings to {out} ({emb_u.shape}, {emb_i.shape})")


def cmd_pipeline(args) -> None:
    from serendipity_tpu.pipeline import run_study
    from serendipity_tpu.train.runner import load_dataset, run_training

    cfg = _cfg(args.overrides)
    inter = load_dataset(cfg)
    if getattr(args, "synth_metadata", False):
        from serendipity_tpu.data.datasets import synthesize_item_metadata

        synthesize_item_metadata(inter, seed=cfg.train.seed)
    if args.embeddings:
        emb_u, emb_i = _load_embedding_pair(args.embeddings)
    else:
        res = run_training(cfg, inter=inter)
        emb_u, emb_i = res["emb_user"], res["emb_item"]
    fusion_specs = expand_fusion_specs(args.fuse, args.fuse_sweep)
    out_dir = os.path.join(cfg.out_dir, cfg.data.name)
    mesh = None
    if cfg.mesh.data_axis > 1 or cfg.mesh.model_axis > 1:
        from serendipity_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(cfg.mesh.data_axis, cfg.mesh.model_axis)
    run_study(
        inter, emb_u, emb_i, cfg, out_dir=out_dir, fusion_specs=fusion_specs,
        compute_disentanglement=args.disentanglement, mesh=mesh,
    )
    print(f"study results under {out_dir}/res")


def cmd_preprocess(args) -> None:
    from serendipity_tpu.data.preprocess import (
        RawInteractions, build_interactions,
        export_adjacency_lists, export_prone_graph, export_serendipity_csvs,
    )
    from serendipity_tpu.utils.native import parse_rating_csv

    cfg = _cfg(args.overrides)
    cols = parse_rating_csv(args.input)
    if cols is None:
        raw_arr = np.genfromtxt(
            args.input, delimiter=",", names=True, dtype=None, encoding="utf-8"
        )
        cols = {n: np.atleast_1d(raw_arr[n]) for n in raw_arr.dtype.names}
    raw = RawInteractions(
        users=cols["userInd"],
        items=cols["itemInd"],
        ratings=cols.get("rating", np.zeros(len(cols["userInd"]))),
        timestamps=cols.get("timestamp", np.arange(len(cols["userInd"]))),
        ser_labels=cols.get("serLabel"),
    )
    inter, uvocab, ivocab = build_interactions(
        raw, k_user=cfg.data.k_core, k_item=cfg.data.k_core,
        train_ratio=cfg.data.train_ratio, use_ser_labels=args.ser_split,
    )
    export_adjacency_lists(inter, args.output)
    export_serendipity_csvs(inter, args.output, uvocab, ivocab)
    export_prone_graph(inter, os.path.join(args.output, "proNE_ui_graph.txt"))
    # dataset statistics line (role of `stat_dataset`, rating_data_process.py:76-91)
    density = (inter.n_train + inter.n_test) / (inter.n_users * inter.n_items)
    print(
        f"{args.output}: {inter.n_users} users, {inter.n_items} items, "
        f"{inter.n_train} train / {inter.n_test} test interactions, "
        f"density {density:.6f}"
    )


def cmd_eval(args) -> None:
    from serendipity_tpu.train.device import build_device_data
    from serendipity_tpu.train.evaluator import Evaluator
    from serendipity_tpu.train.runner import build_model, load_dataset

    cfg = _cfg(args.overrides)
    inter = load_dataset(cfg)
    emb_u, emb_i = _load_embedding_pair(args.embeddings)
    # eval never samples negatives, so only build the (potentially GB-scale)
    # train bitmap when the fused masked evaluator actually consumes it
    data = build_device_data(
        inter, adj_type=cfg.model.adj_type, spmm_mode=cfg.model.spmm,
        compute_dtype=cfg.model.compute_dtype,
        sampler="bitmap" if cfg.eval.fused else "bisect",
    )
    model = build_model(cfg, inter.n_users, inter.n_items)
    import jax.numpy as jnp

    all_emb = (jnp.asarray(emb_u), jnp.asarray(emb_i))
    ev = Evaluator(model, data, inter, cfg.eval)
    metrics = ev.evaluate(None, all_emb=all_emb)
    for k, v in metrics.items():
        print(f"{k} = {v:.5f}")
    if cfg.eval.auc:
        print(f"auc = {ev.evaluate_auc(None, all_emb=all_emb):.5f}")
    if cfg.eval.report:
        from serendipity_tpu.train.evaluator import sparsity_report

        for state, m in sparsity_report(model, data, inter, cfg.eval, all_emb=all_emb):
            print(state)
            print("  " + "  ".join(f"{k}={v:.5f}" for k, v in m.items()))


def cmd_seren(args) -> None:
    """SerenEnhance transformer re-ranker, end to end (the reference's
    documented two-step run, `SerenEnhance/README.md:20-30`: generate
    unexpected-recommendation training data, then train the model):
    assemble history/candidate tensors from the dataset + an item-embedding
    table, optionally generate unexpectedness training pairs (P15), train the
    3-tower transformer, and report HR/NDCG on the 1-truth + negatives
    protocol (`SerenEnhance.py:303-320`)."""
    import json

    import jax
    import jax.numpy as jnp

    from serendipity_tpu.models.seren_transformer import (
        SerenTrainer, SerenTransformer,
    )
    from serendipity_tpu.rec.seren_data import (
        build_seren_test_batch, build_seren_training_batches,
    )
    from serendipity_tpu.train.runner import load_dataset

    cfg = _cfg(args.overrides)
    inter = load_dataset(cfg)
    seed = cfg.train.seed
    if args.embeddings:
        emb_u, emb_i = _load_embedding_pair(args.embeddings)
    else:
        # the reference consumes pre-encoded item embeddings; without a trained
        # table, ProNE gives a structure-aware one in seconds
        from serendipity_tpu.models.prone import prone_embeddings

        emb_u, emb_i = prone_embeddings(inter, cfg.prone, seed=seed)
    emb_u = np.asarray(emb_u, np.float32)
    emb_i = np.asarray(emb_i, np.float32)
    dim = emb_i.shape[1]
    n_reviews, n_pos, n_cand = args.n_reviews, args.n_pos, args.n_cand

    unexp_pairs = None
    if args.unexpectedness:
        from serendipity_tpu.rec.candidates import create_candidates
        from serendipity_tpu.rec.unexpectedness import (
            cooccurrence_dense, cooccurrence_topk,
            sample_unexpectedness_pairs, unexpectedness_scores,
        )

        cand = create_candidates(inter, emb_u, emb_i, cfg.rec, seed=seed)
        # dense I x I co-occurrence up to ~2 GB, truncated top-T lists beyond
        cooc = (
            cooccurrence_dense(inter)
            if inter.n_items * inter.n_items * 4 <= 2 << 30
            else cooccurrence_topk(inter)
        )
        unexp = unexpectedness_scores(inter, cand, cooc)
        unexp_pairs = sample_unexpectedness_pairs(cand, unexp, n_pos=n_pos, seed=seed)
        print(f"unexpectedness pairs: {unexp_pairs[0].shape} from "
              f"{cand.shape[1]} candidates/user")

    batch = build_seren_training_batches(
        inter, emb_i, n_reviews=n_reviews, n_pos=n_pos,
        unexp_pairs=unexp_pairs, seed=seed,
    )
    test_b = build_seren_test_batch(
        inter, emb_i, n_reviews=n_reviews, n_cand=n_cand, seed=seed + 1
    )

    trainer = SerenTrainer(
        model=SerenTransformer(embed_dim=dim, n_reviews=n_reviews),
        lr=args.lr, n_pos=n_pos,
    )
    params, opt_state = trainer.init(
        jax.random.PRNGKey(seed), n_reviews, n_cand, dim
    )
    step = trainer.make_train_step()
    key = jax.random.PRNGKey(seed + 1)
    bs = min(args.batch_size, inter.n_users)
    for i in range(args.steps):
        s = (i * bs) % max(inter.n_users - bs, 1)
        jb = {k: jnp.asarray(v[s:s + bs]) for k, v in batch.items()}
        params, opt_state, key, loss = step(params, opt_state, jb, key)
        if i % max(args.steps // 5, 1) == 0 or i == args.steps - 1:
            print(f"step {i}: loss={float(loss):.4f}")

    # eval in clamp-padded chunks (one compiled shape)
    ev = trainer.make_eval_step()
    n_ev = len(test_b["users"])
    chunk = min(512, n_ev)
    scores = np.empty((n_ev, n_cand), np.float32)
    for s in range(0, n_ev, chunk):
        rows = np.minimum(np.arange(s, s + chunk), n_ev - 1)
        scores[s:s + chunk] = np.asarray(
            ev(params, jnp.asarray(test_b["history"][rows]),
               jnp.asarray(test_b["y_cand"][rows]))
        )[: n_ev - s]
    metrics = SerenTrainer.ranking_metrics(scores)
    for k, v in metrics.items():
        print(f"{k} = {v:.5f}")

    out = os.path.join(cfg.out_dir, cfg.data.name)
    os.makedirs(out, exist_ok=True)
    import flax.serialization

    with open(os.path.join(out, "seren_params.msgpack"), "wb") as f:
        f.write(flax.serialization.to_bytes(params))
    with open(os.path.join(out, "seren_metrics.json"), "w") as f:
        json.dump(
            {"metrics": metrics, "steps": args.steps, "n_eval_users": n_ev,
             "unexpectedness": bool(args.unexpectedness)}, f, indent=1,
        )
    print(f"saved SerenEnhance params + metrics under {out}")


def _enable_compilation_cache() -> None:
    """Opt-in persistent XLA compilation cache (SERENDIPITY_TPU_CACHE=<dir>).

    Opt-in because on remote-compile TPU tunnels the executable serialization the
    cache requires can cost far more than the compile it saves."""
    cache_dir = os.environ.get("SERENDIPITY_TPU_CACHE")
    if not cache_dir:
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main(argv=None) -> None:
    _enable_compilation_cache()
    p = argparse.ArgumentParser(prog="serendipity_tpu")
    p.add_argument(
        "--aot", metavar="DIR",
        help="AOT executable cache dir (SERENDIPITY_TPU_AOT): removes the "
             "per-process jit trace/lower/compile-request overhead on "
             "remote-compile backends (utils/aot.py, DESIGN.md §7e)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("train", help="train an embedding model (BPR)")
    sp.add_argument("--pretrained", help="dir with emb_user.npy/emb_item.npy init")
    sp.add_argument("overrides", nargs="*", help="dotted key=value config overrides")
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("prone", help="compute ProNE spectral embeddings")
    sp.add_argument("overrides", nargs="*")
    sp.set_defaults(fn=cmd_prone)

    sp = sub.add_parser("pipeline", help="full serendipity study")
    sp.add_argument("--embeddings", help="dir with trained emb_user/item.npy")
    sp.add_argument("--fuse", action="append", help='fusion spec "acc:0.5,nov:0.5"')
    sp.add_argument(
        "--fuse-sweep", action="append", dest="fuse_sweep",
        help='two-factor weight sweep "acc,div" -> w/(1-w) for w in 0.1..0.9',
    )
    sp.add_argument("--disentanglement", action="store_true")
    sp.add_argument(
        "--synth-metadata", action="store_true", dest="synth_metadata",
        help="fill missing item dates/ratings with seeded synthetic values "
             "(metadata-less fixtures like the bundled mlls)",
    )
    sp.add_argument("overrides", nargs="*")
    sp.set_defaults(fn=cmd_pipeline)

    sp = sub.add_parser("preprocess", help="k-core filter + split + export a raw CSV")
    sp.add_argument("--input", required=True)
    sp.add_argument("--output", required=True)
    sp.add_argument("--ser-split", action="store_true", dest="ser_split")
    sp.add_argument("overrides", nargs="*")
    sp.set_defaults(fn=cmd_preprocess)

    sp = sub.add_parser("eval", help="rank-metric evaluation of stored embeddings")
    sp.add_argument("--embeddings", required=True)
    sp.add_argument("overrides", nargs="*")
    sp.set_defaults(fn=cmd_eval)

    sp = sub.add_parser(
        "seren", help="train + evaluate the SerenEnhance transformer re-ranker"
    )
    sp.add_argument("--embeddings", help="dir with emb_user/item.npy (else ProNE)")
    sp.add_argument(
        "--unexpectedness", action="store_true",
        help="generate unexpectedness training pairs from co-occurrence "
             "(the reference's unexpected-recommendation data step)",
    )
    sp.add_argument("--steps", type=int, default=200)
    sp.add_argument("--batch-size", type=int, default=512, dest="batch_size")
    sp.add_argument("--lr", type=float, default=1e-3)
    sp.add_argument("--n-reviews", type=int, default=20, dest="n_reviews")
    sp.add_argument("--n-pos", type=int, default=50, dest="n_pos")
    sp.add_argument("--n-cand", type=int, default=100, dest="n_cand")
    sp.add_argument("overrides", nargs="*")
    sp.set_defaults(fn=cmd_seren)

    # argparse can't interleave `key=value` positionals with optionals; collect
    # any leftover overrides from parse_known_args instead of erroring
    args, extra = p.parse_known_args(argv)
    bad = [e for e in extra if "=" not in e]
    if bad:
        p.error(f"unrecognized arguments: {' '.join(bad)}")
    args.overrides = list(getattr(args, "overrides", [])) + extra
    if args.aot:
        os.environ["SERENDIPITY_TPU_AOT"] = os.path.abspath(args.aot)
    args.fn(args)


if __name__ == "__main__":
    main()
