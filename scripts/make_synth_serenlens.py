"""Synthetic SerenLens-like labeled dataset (ratings + ground-truth serLabel).

The real SerenLens corpus (the reference's labeled-serendipity source,
`rating_data_process.py:440-504` dataset blocks) is not fetchable in this
environment (zero egress), so this generates a dataset with the same schema and
the structural property that makes serendipity labels meaningful: users consume
mostly within their preference clusters, and a few highly-rated OUT-of-cluster
items are the serendipitous interactions (serLabel=1).

Writes `userInd,itemInd,rating,timestamp,serLabel` CSV for
`serendipity_tpu.cli preprocess [--ser-split]` (`generateSerData` schema,
`rating_data_process.py:293-389`).

    python scripts/make_synth_serenlens.py out.csv [n_users] [n_items] [seed]
"""

import sys

import numpy as np


def generate(n_users=1200, n_items=2400, n_clusters=12, seed=7):
    rng = np.random.default_rng(seed)
    item_cluster = rng.integers(0, n_clusters, n_items)
    rows = []
    t = 0
    for u in range(n_users):
        # 1-2 home clusters, popularity-skewed item choice within them
        home = rng.choice(n_clusters, size=rng.integers(1, 3), replace=False)
        n_rate = int(rng.integers(25, 60))
        in_cluster = np.flatnonzero(np.isin(item_cluster, home))
        w = 1.0 / (1.0 + np.arange(len(in_cluster)))
        w = w[rng.permutation(len(in_cluster))]
        picks = rng.choice(
            in_cluster, size=min(n_rate, len(in_cluster)), replace=False,
            p=w / w.sum(),
        )
        for it in picks:
            rating = float(np.clip(rng.normal(3.8, 0.9), 1, 5))
            rows.append((u, it, round(rating, 1), t, 0))
            t += 1
        # 2-4 serendipitous finds: OUTSIDE the home clusters but structurally
        # learnable — each cluster has a fixed "adjacent" cluster users drift
        # into (real serendipity is surprising to the user yet statistically
        # predictable from co-consumption, which is what lets HR_ser separate
        # methods; a uniformly random far cluster would be unlearnable noise)
        adj = (home[0] + 1) % n_clusters
        far = np.flatnonzero(item_cluster == adj)
        ser = rng.choice(far, size=int(rng.integers(2, 5)), replace=False)
        for it in ser:
            rating = float(np.clip(rng.normal(4.6, 0.3), 3.5, 5))
            rows.append((u, it, round(rating, 1), t, 1))
            t += 1
    return rows


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "synth_serenlens.csv"
    n_users = int(sys.argv[2]) if len(sys.argv) > 2 else 1200
    n_items = int(sys.argv[3]) if len(sys.argv) > 3 else 2400
    seed = int(sys.argv[4]) if len(sys.argv) > 4 else 7
    rows = generate(n_users, n_items, seed=seed)
    with open(out, "w") as f:
        f.write("userInd,itemInd,rating,timestamp,serLabel\n")
        for r in rows:
            f.write(f"{r[0]},{r[1]},{r[2]},{r[3]},{r[4]}\n")
    print(f"{out}: {len(rows)} interactions, {n_users} users, {n_items} items")


if __name__ == "__main__":
    main()
