"""ProNE warm-start quality at ML-25M scale (VERDICT r4 #5, quality leg):
train LightGCN for a few epochs from the ProNE init vs random init on the
ML-25M synthetic graph and compare ranking metrics (the reference's
`--pretrain` path, `LightGCN.py:168-180` / `proNE.py:177-178`)."""
import argparse
import json
import time

import numpy as np
import jax

ap = argparse.ArgumentParser()
ap.add_argument("--prone-dir", default="runs/prone_ml25m")
ap.add_argument("--epochs", type=int, default=3)
args = ap.parse_args()

from serendipity_tpu.config import ExperimentConfig, apply_overrides
from serendipity_tpu.data.synthetic import synthetic_interactions
from serendipity_tpu.train.runner import run_training

print(jax.devices(), flush=True)
inter = synthetic_interactions(162541, 59047, avg_degree=150, seed=0)
print(f"graph {inter.n_users}x{inter.n_items}, {inter.n_train} train", flush=True)

cfg = apply_overrides(
    ExperimentConfig(),
    ["model.n_layers=3", "train.batch_size=8192", "train.lr=0.001",
     f"train.epochs={args.epochs}", "train.eval_every=0",
     "data.name=ml25m_ft", "out_dir=/tmp/ml25m_ft"],
)

results = {}
for tag, pre in (("random", None), ("prone", "load")):
    pretrained = None
    if pre:
        eu = np.load(f"{args.prone_dir}/emb_user_proNE.npy")
        ei = np.load(f"{args.prone_dir}/emb_item_proNE.npy")
        pretrained = (eu.astype(np.float32), ei.astype(np.float32))
        print(f"loaded ProNE init {eu.shape}/{ei.shape}", flush=True)
    t0 = time.time()
    out = run_training(cfg, inter=inter, pretrained=pretrained)
    m = {k: v for k, v in out["record"].items() if "@" in k}
    results[tag] = m
    print(f"[{tag}] {args.epochs} epochs in {time.time()-t0:.1f}s: "
          + " ".join(f"{k}={v:.5f}" for k, v in m.items()), flush=True)

r0 = results["random"].get("recall@20", 0.0)
r1 = results["prone"].get("recall@20", 0.0)
print(json.dumps({"random": results["random"], "prone": results["prone"]}),
      flush=True)
print(f"recall@20 after {args.epochs} epochs: prone {r1:.5f} vs random {r0:.5f} "
      f"({'+' if r1 >= r0 else ''}{(r1 - r0):.5f})", flush=True)
print("DONE", flush=True)
