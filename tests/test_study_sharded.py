"""Mesh-sharded serendipity-study stages (`parallel/study.py`) vs the single-chip
path on the 8-device virtual CPU mesh: every stage must agree to float tolerance
(same kernels, same block schedule, different devices) and the full `run_seed`
metric matrix must match."""

import jax
import numpy as np
import pytest

from serendipity_tpu.data.datasets import synthesize_item_metadata
from serendipity_tpu.data.synthetic import synthetic_interactions
from serendipity_tpu.parallel.mesh import make_mesh
from serendipity_tpu.rec.dpp import dpp_rerank
from serendipity_tpu.rec.serendipity import SerendipityEvaluator
from serendipity_tpu.rec.strategies import StrategyScorer


@pytest.fixture(scope="module")
def setup():
    inter = synthetic_interactions(140, 210, avg_degree=12, seed=9)
    synthesize_item_metadata(inter, seed=0)
    rng = np.random.default_rng(1)
    eu = rng.standard_normal((inter.n_users, 16)).astype(np.float32)
    ei = rng.standard_normal((inter.n_items, 16)).astype(np.float32)
    cand = np.stack(
        [rng.choice(inter.n_items, size=60, replace=False) for _ in range(inter.n_users)]
    ).astype(np.int32)
    mesh = make_mesh(4, 2)
    return inter, eu, ei, cand, mesh


def test_raw_and_maxsim_parity(setup):
    inter, eu, ei, cand, mesh = setup
    a = StrategyScorer(inter, eu, ei, cand)
    b = StrategyScorer(inter, eu, ei, cand, mesh=mesh)
    ra, ma = a._raw_and_maxsim()
    rb, mb = b._raw_and_maxsim()
    np.testing.assert_allclose(ra, rb, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ma, mb, rtol=1e-5, atol=1e-5)


def test_acc_dif_and_ser2_parity(setup):
    inter, eu, ei, cand, mesh = setup
    rng = np.random.default_rng(2)
    rec = np.stack(
        [rng.choice(inter.n_items, size=10, replace=False) for _ in range(inter.n_users)]
    ).astype(np.int32)
    a = SerendipityEvaluator(inter, ei)
    b = SerendipityEvaluator(inter, ei, mesh=mesh)
    acc_a, dif_a = a.acc_dif_arrays(rec)
    acc_b, dif_b = b.acc_dif_arrays(rec)
    np.testing.assert_allclose(acc_a, acc_b, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(dif_a, dif_b, rtol=1e-5, atol=1e-5)
    pm = a.create_pm(cand, k=20)
    assert abs(a.ser2(rec, pm) - b.ser2(rec, pm)) < 1e-5


def test_dpp_parity(setup):
    inter, eu, ei, cand, mesh = setup
    a = dpp_rerank(cand, ei, 8, user_block=32)
    b = dpp_rerank(cand, ei, 8, user_block=32, mesh=mesh)
    np.testing.assert_array_equal(a, b)
    rng = np.random.default_rng(3)
    rel = rng.random(cand.shape).astype(np.float32)
    ar = dpp_rerank(cand, ei, 8, rel_scores=rel, user_block=32)
    br = dpp_rerank(cand, ei, 8, rel_scores=rel, user_block=32, mesh=mesh)
    np.testing.assert_array_equal(ar, br)


def test_candidates_parity(setup):
    """Sharded candidate generation must equal the single-chip draw exactly, and
    the draw must be independent of the user-block partitioning (priorities are
    keyed per user id, not per block)."""
    from serendipity_tpu.config import RecConfig
    from serendipity_tpu.rec.candidates import create_candidates

    inter, eu, ei, cand, mesh = setup
    cfg = RecConfig(n_candidates=60, top_k=8)
    a = create_candidates(inter, eu, ei, cfg, seed=5)
    b = create_candidates(inter, eu, ei, cfg, seed=5, mesh=mesh)
    np.testing.assert_array_equal(a, b)
    c = create_candidates(inter, eu, ei, cfg, seed=5, user_block=32)
    np.testing.assert_array_equal(a, c)


def test_run_seed_parity(setup):
    """Full study seed, sharded vs single-chip: identical metric matrix."""
    from serendipity_tpu.config import ExperimentConfig, apply_overrides
    from serendipity_tpu.pipeline import run_seed

    inter, eu, ei, cand, mesh = setup
    cfg = apply_overrides(
        ExperimentConfig(), ["rec.n_candidates=60", "rec.top_k=8"]
    )
    res_a = run_seed(inter, eu, ei, cfg, seed=7, resume=False)
    res_b = run_seed(inter, eu, ei, cfg, seed=7, resume=False, mesh=mesh)
    assert res_a["methods"] == res_b["methods"]
    np.testing.assert_allclose(
        res_a["matrix"], res_b["matrix"], rtol=1e-4, atol=1e-5
    )
    for m in res_a["recs"]:
        np.testing.assert_array_equal(res_a["recs"][m], res_b["recs"][m])
