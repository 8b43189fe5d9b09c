"""Reproducible synthetic-scale serendipity study driver.

Examples (one v5e chip):
  # amazon-book scale, full 5-seed reference protocol
  PYTHONPATH=. python scripts/synth_study.py --users 52643 --items 91599 \
      --avg-degree 55 --seeds 777,7777,77777,73,79 \
      --embeddings runs/synth_amazon_study_sharded --out runs/my_amazon_study

  # ML-25M scale, one seed
  PYTHONPATH=. python scripts/synth_study.py --users 162541 --items 59047 \
      --avg-degree 150 --embeddings runs/synth_ml25m_r3 --out runs/my_ml25m

Round-4 reference walls: amazon scale 241 s cold / ~123 s per warm seed;
ML-25M scale 545 s (runs/synth_amazon_study_r4*, runs/synth_ml25m_study_r4).
"""

import argparse
import os
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--users", type=int, required=True)
    ap.add_argument("--items", type=int, required=True)
    ap.add_argument("--avg-degree", type=float, default=40.0)
    ap.add_argument("--graph-seed", type=int, default=0)
    ap.add_argument("--seeds", default="777")
    ap.add_argument("--embeddings", required=True,
                    help="dir with emb_user.npy / emb_item.npy")
    ap.add_argument("--out", required=True)
    ap.add_argument("--fuse", action="append", default=None,
                    help='fusion spec "acc:0.5,nov:0.5" (default: the round-4 pair)')
    ap.add_argument("--disentanglement", action="store_true")
    ap.add_argument("--mesh", default="1,1", help="data,model axes")
    args = ap.parse_args()

    # client-side AOT executable cache: cold runs deserialize stored
    # executables instead of gambling on the remote service's inconsistent
    # compile cache (4.7 s vs 186 s for the SAME HLO across r5b/r5c).
    # SERENDIPITY_TPU_AOT="" disables.
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.environ.setdefault(
        "SERENDIPITY_TPU_AOT", os.path.join(repo_root, "runs", "aot_cache")
    )

    import jax

    from serendipity_tpu.config import ExperimentConfig, apply_overrides
    from serendipity_tpu.data.datasets import synthesize_item_metadata
    from serendipity_tpu.data.synthetic import synthetic_interactions
    from serendipity_tpu.parallel.mesh import make_mesh
    from serendipity_tpu.pipeline import run_study

    print("devices:", jax.devices(), flush=True)
    inter = synthetic_interactions(
        args.users, args.items, avg_degree=args.avg_degree, seed=args.graph_seed
    )
    print(f"graph: {inter.n_users}x{inter.n_items}, "
          f"{inter.n_train} train, {inter.n_test} test", flush=True)
    eu = np.load(os.path.join(args.embeddings, "emb_user.npy"))
    ei = np.load(os.path.join(args.embeddings, "emb_item.npy"))
    assert eu.shape[0] == inter.n_users and ei.shape[0] == inter.n_items
    synthesize_item_metadata(inter, seed=args.graph_seed)

    cfg = apply_overrides(ExperimentConfig(), [f"rec.seeds={args.seeds}"])
    nd, nm = (int(x) for x in args.mesh.split(","))
    # a trivial 1x1 mesh would route every stage through the shard_map
    # wrappers (identical results, but off the AOT-cached single-chip jits);
    # match cli.cmd_pipeline: only build a mesh when it actually fans out
    mesh = make_mesh(nd, nm) if nd * nm > 1 else None
    if args.fuse:
        fusions = []
        for spec in args.fuse:
            names, weights = [], []
            for part in spec.split(","):
                n, w = part.split(":")
                names.append(n)
                weights.append(float(w))
            fusions.append((tuple(names), tuple(weights)))
    else:
        fusions = [(("acc", "nov"), (0.5, 0.5)), (("acc", "div"), (0.5, 0.5))]

    t0 = time.time()
    out = run_study(
        inter, eu, ei, cfg, out_dir=args.out, fusion_specs=fusions,
        compute_disentanglement=args.disentanglement, mesh=mesh,
    )
    print(f"STUDY WALL {time.time()-t0:.1f}s", flush=True)
    print("methods", out["methods"], flush=True)
    print(np.round(out["mean"], 4), flush=True)


if __name__ == "__main__":
    main()
