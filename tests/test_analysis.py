"""Analysis-module tests: blocked similarity stats vs dense numpy, long-tail stats,
factor ranks, top-k sensitivity curves, plot smoke tests."""

import numpy as np

from serendipity_tpu.analysis.stats import (
    embedding_similarity_stats,
    factor_impact_ranks,
    interaction_frequency_stats,
    topk_sensitivity,
)


def test_embedding_similarity_stats(tiny_inter):
    rng = np.random.default_rng(0)
    eu = rng.standard_normal((tiny_inter.n_users, 8)).astype(np.float32)
    ei = rng.standard_normal((tiny_inter.n_items, 8)).astype(np.float32)
    stats = embedding_similarity_stats(tiny_inter, eu, ei)
    full = eu @ ei.T
    np.testing.assert_allclose(stats["ui_all"]["mean"], full.mean(), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(stats["ui_all"]["std"], full.std(), rtol=1e-3)
    np.testing.assert_allclose(stats["ui_all"]["max"], full.max(), rtol=1e-4)
    users, items = tiny_inter.train_user_item_pairs()
    rated = np.einsum("nd,nd->n", eu[users], ei[items])
    np.testing.assert_allclose(stats["ui_rated"]["mean"], rated.mean(), rtol=1e-4)
    assert "ui_test" in stats and "ii_all" in stats

    cos = embedding_similarity_stats(tiny_inter, eu, ei, cosine=True)
    assert -1.0 - 1e-5 <= cos["ui_all"]["min"] <= cos["ui_all"]["max"] <= 1.0 + 1e-5


def test_interaction_frequency_stats(tiny_inter):
    st = interaction_frequency_stats(tiny_inter, n_buckets=10)
    assert st["item_degree_hist"].sum() == tiny_inter.n_items
    assert st["coverage"][-1] == 1.0
    assert (np.diff(st["coverage"]) >= -1e-12).all()


def test_factor_impact_ranks():
    mats = {
        "ds1": np.array([[0] * 6 + [0.9, 0], [0] * 6 + [0.1, 0], [0] * 6 + [0.5, 0]]),
        "ds2": np.array([[0] * 6 + [0.2, 0], [0] * 6 + [0.8, 0], [0] * 6 + [0.5, 0]]),
    }
    ranks = factor_impact_ranks(mats, ["a", "b", "c"])
    assert list(ranks["ds1"]) == [1, 3, 2]
    assert list(ranks["ds2"]) == [3, 1, 2]


def test_topk_sensitivity(tiny_inter):
    from serendipity_tpu.rec.serendipity import SerendipityEvaluator

    rng = np.random.default_rng(2)
    ei = rng.standard_normal((tiny_inter.n_items, 8)).astype(np.float32)
    tiny_inter.item_counts = np.diff(tiny_inter.train_indptr_by_item).astype(float)
    tiny_inter.item_mean_ratings = rng.uniform(1, 5, tiny_inter.n_items)
    ev = SerendipityEvaluator(tiny_inter, ei, user_block=32)
    cand = np.stack([
        rng.choice(tiny_inter.n_items, 20, replace=False)
        for _ in range(tiny_inter.n_users)
    ]).astype(np.int32)
    recs = {"a": cand[:, :10], "b": cand[:, 5:15]}
    curves = topk_sensitivity(ev, recs, cand, ks=[5, 10])
    assert curves["a"].shape == (2,)
    assert np.isfinite(curves["a"]).all()


def test_plots_smoke(tmp_path):
    from serendipity_tpu.analysis.plots import (
        plot_disent_mat,
        plot_interaction_frequency,
        plot_res_mat,
        plot_topk_sensitivity,
    )

    mean = np.random.default_rng(0).random((3, 8))
    fig = plot_res_mat(mean, ["a", "b", "c"],
                       ["nov", "unpop", "qua", "acc", "dif", "div", "ser1", "ser2"],
                       out_path=str(tmp_path / "res.png"))
    d = np.random.default_rng(1).random((3, 3))
    plot_disent_mat(d, ["a", "b", "c"], out_path=str(tmp_path / "d.png"))
    plot_topk_sensitivity({"a": np.array([0.1, 0.2])}, [5, 10],
                          out_path=str(tmp_path / "k.png"))
    stats = {
        "item_degree_hist": np.array([5, 3]),
        "item_degree_edges": np.array([0.0, 1.0, 2.0]),
        "top_fraction": np.array([0.5, 1.0]),
        "coverage": np.array([0.7, 1.0]),
    }
    plot_interaction_frequency(stats, out_path=str(tmp_path / "f.png"))
    if fig is not None:
        assert (tmp_path / "res.png").exists()
