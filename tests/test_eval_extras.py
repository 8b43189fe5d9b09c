"""Sparsity-level report, per-user AUC evaluation, and the LastFM loader.

Parity targets: `LightGCN-tf/utility/load_data.py:274-323` (create_sparsity_split),
`LightGCN-tf/LightGCN.py:526-560` (--report path), `code/utils.py:265-274` (AUC),
`code/dataloader.py:72-112` (LastFM table format).
"""

import numpy as np
import pytest

from serendipity_tpu.config import ExperimentConfig, apply_overrides
from serendipity_tpu.data.datasets import load_lastfm, sparsity_split
from serendipity_tpu.train.device import build_device_data
from serendipity_tpu.train.evaluator import Evaluator, sparsity_report
from serendipity_tpu.train.runner import build_model


@pytest.fixture(scope="module")
def small_cfg():
    cfg = ExperimentConfig()
    return apply_overrides(
        cfg,
        ["model.embed_dim=16", "model.n_layers=2", "eval.user_batch=32"],
    )


def _reference_sparsity_split(inter, n_folds=4):
    """Numpy transliteration of `create_sparsity_split` (load_data.py:274-323)."""
    test_deg = np.diff(inter.test_indptr)
    test_users = np.nonzero(test_deg > 0)[0]
    user_n_iid = {}
    for uid in test_users:
        n_iids = int(np.diff(inter.train_indptr)[uid] + test_deg[uid])
        user_n_iid.setdefault(n_iids, []).append(uid)
    total = inter.n_train + inter.n_test
    split_uids, split_state, temp, n_rates = [], [], [], 0
    keys = sorted(user_n_iid)
    for idx, n_iids in enumerate(keys):
        temp += user_n_iid[n_iids]
        n_rates += n_iids * len(user_n_iid[n_iids])
        closed = False
        if n_rates >= 0.25 * total:
            split_uids.append(list(temp))
            split_state.append(
                "#inter per user<=[%d], #users=[%d], #all rates=[%d]"
                % (n_iids, len(temp), n_rates)
            )
            temp, n_rates = [], 0
            closed = True
        if idx == len(keys) - 1 and not closed:
            split_uids.append(list(temp))
            split_state.append(
                "#inter per user<=[%d], #users=[%d], #all rates=[%d]"
                % (n_iids, len(temp), n_rates)
            )
    return split_uids, split_state


def test_sparsity_split_vs_transliteration(tiny_inter):
    got_uids, got_state = sparsity_split(tiny_inter)
    want_uids, want_state = _reference_sparsity_split(tiny_inter)
    assert got_state == want_state
    assert len(got_uids) == len(want_uids)
    for g, w in zip(got_uids, want_uids):
        assert sorted(g.tolist()) == sorted(w)
    # groups partition the test-user set
    test_users = np.nonzero(np.diff(tiny_inter.test_indptr) > 0)[0]
    allu = np.concatenate(got_uids)
    assert len(allu) == len(test_users)
    assert set(allu.tolist()) == set(test_users.tolist())


def test_sparsity_report_consistent_with_global(small_cfg, tiny_inter):
    import jax

    from serendipity_tpu.models.lightgcn import init_params

    data = build_device_data(tiny_inter)
    model = build_model(small_cfg, tiny_inter.n_users, tiny_inter.n_items)
    params = init_params(
        jax.random.PRNGKey(0), small_cfg.model, tiny_inter.n_users, tiny_inter.n_items
    )
    report = sparsity_report(model, data, tiny_inter, small_cfg.eval, params)
    assert len(report) >= 2
    # user-weighted mean of group recalls == global recall
    glob = Evaluator(model, data, tiny_inter, small_cfg.eval).evaluate(params)
    groups, _ = sparsity_split(tiny_inter)
    sizes = np.array([len(g) for g in groups], dtype=float)
    recs = np.array([m["recall@20"] for _, m in report])
    assert np.average(recs, weights=sizes) == pytest.approx(glob["recall@20"], abs=1e-5)


def test_evaluate_auc_vs_sklearn(small_cfg, tiny_inter):
    import jax

    from sklearn.metrics import roc_auc_score

    from serendipity_tpu.models.lightgcn import init_params

    data = build_device_data(tiny_inter)
    model = build_model(small_cfg, tiny_inter.n_users, tiny_inter.n_items)
    params = init_params(
        jax.random.PRNGKey(1), small_cfg.model, tiny_inter.n_users, tiny_inter.n_items
    )
    got = Evaluator(model, data, tiny_inter, small_cfg.eval).evaluate_auc(params)

    all_u, all_i = jax.jit(
        lambda p: model.propagate(p, data.adj, spmm_ops=data.spmm_ops)
    )(params)
    all_u, all_i = np.asarray(all_u, np.float64), np.asarray(all_i, np.float64)
    aucs = []
    for u in range(tiny_inter.n_users):
        test = tiny_inter.test_items_of(u)
        if len(test) == 0:
            continue
        train = tiny_inter.train_items_of(u)
        s = all_u[u] @ all_i.T
        labels = np.zeros(tiny_inter.n_items)
        labels[test] = 1
        keep = np.ones(tiny_inter.n_items, bool)
        keep[train] = False
        aucs.append(roc_auc_score(labels[keep], s[keep]))
    assert got == pytest.approx(float(np.mean(aucs)), abs=2e-4)


def _reference_loo_vectors(ranking, ground_truth):
    """Transliteration of `evaluate_loo.py:13-44` (hit/ndcg/mrr step vectors)."""
    import sys

    last_idx = sys.maxsize
    for idx, item in enumerate(ranking):
        if item == ground_truth:
            last_idx = idx
            break
    hit = np.zeros(len(ranking), np.float32)
    ndcg = np.zeros(len(ranking), np.float32)
    mrr = np.zeros(len(ranking), np.float32)
    hit[last_idx:] = 1.0
    ndcg[last_idx:] = 1.0 / np.log2(last_idx + 2)
    mrr[last_idx:] = 1.0 / (last_idx + 1)
    return hit, ndcg, mrr


def test_loo_metrics_vs_transliteration():
    import jax.numpy as jnp

    from serendipity_tpu.ops.metrics import loo_metrics_cumulative

    rng = np.random.default_rng(0)
    b, k, n = 40, 15, 60
    ranked = np.stack([rng.choice(n, size=k, replace=False) for _ in range(b)])
    truth = rng.integers(0, n, size=b)          # sometimes absent from the list
    got = loo_metrics_cumulative(jnp.asarray(ranked), jnp.asarray(truth))
    for r in range(b):
        hit, ndcg, mrr = _reference_loo_vectors(ranked[r].tolist(), truth[r])
        np.testing.assert_allclose(np.asarray(got["hr"])[r], hit, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got["ndcg"])[r], ndcg, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got["mrr"])[r], mrr, atol=1e-6)


def test_evaluator_loo_protocol(small_cfg, tiny_inter):
    """eval.protocol=loo: evaluator metrics equal a brute-force numpy LOO eval
    on the first held-out test item per user."""
    import jax

    from serendipity_tpu.config import apply_overrides
    from serendipity_tpu.models.lightgcn import init_params

    cfg = apply_overrides(small_cfg, ["eval.protocol=loo"])
    data = build_device_data(tiny_inter)
    model = build_model(cfg, tiny_inter.n_users, tiny_inter.n_items)
    params = init_params(
        jax.random.PRNGKey(2), cfg.model, tiny_inter.n_users, tiny_inter.n_items
    )
    got = Evaluator(model, data, tiny_inter, cfg.eval).evaluate(params)

    all_u, all_i = jax.jit(
        lambda p: model.propagate(p, data.adj, spmm_ops=data.spmm_ops)
    )(params)
    all_u, all_i = np.asarray(all_u), np.asarray(all_i)
    k = max(cfg.eval.topks)
    hrs, ndcgs, mrrs = [], [], []
    for u in range(tiny_inter.n_users):
        test = tiny_inter.test_items_of(u)
        if len(test) == 0:
            continue
        s = all_u[u] @ all_i.T
        s[tiny_inter.train_items_of(u)] = -np.inf
        ranking = np.argsort(-s, kind="stable")[:k]
        hit, ndcg, mrr = _reference_loo_vectors(ranking.tolist(), test[0])
        hrs.append(hit[k - 1]); ndcgs.append(ndcg[k - 1]); mrrs.append(mrr[k - 1])
    assert got[f"hr@{k}"] == pytest.approx(float(np.mean(hrs)), abs=1e-5)
    assert got[f"ndcg@{k}"] == pytest.approx(float(np.mean(ndcgs)), abs=1e-5)
    assert got[f"mrr@{k}"] == pytest.approx(float(np.mean(mrrs)), abs=1e-5)


def test_load_lastfm(tmp_path):
    # 1-indexed tab-separated tables, the LastFM on-disk format
    (tmp_path / "data1.txt").write_text("1\t1\n1\t2\n2\t3\n3\t1\n3\t4\n")
    (tmp_path / "test1.txt").write_text("1\t3\n2\t1\n3\t2\n")
    (tmp_path / "trustnetwork.txt").write_text("1\t2\n2\t3\n")
    inter, trust = load_lastfm(str(tmp_path))
    assert inter.n_users == 3 and inter.n_items == 4
    assert inter.train_items_of(0).tolist() == [0, 1]
    assert inter.test_items_of(1).tolist() == [0]
    assert trust.tolist() == [[0, 1], [1, 2]]
    assert inter.n_train == 5 and inter.n_test == 3


def test_timer_tape():
    """Named timer tape, the contract of `code/utils.py:154-213`."""
    import time as _t

    from serendipity_tpu.utils.timing import timer

    timer.zero()
    with timer("a"):
        _t.sleep(0.01)
    with timer("a"):
        _t.sleep(0.01)
    with timer("b"):
        pass
    assert timer.NAMED_TAPE["a"] >= 0.02
    assert timer.COUNTS["a"] == 2
    rep = timer.dict(["a", "b"])
    assert rep.startswith("|a:") and "|b:" in rep
    timer.zero(["a"])
    assert timer.NAMED_TAPE["a"] == 0.0 and timer.COUNTS["b"] == 1


def test_fused_eval_matches_xla_path():
    """`eval.fused=true` (Pallas masked retrieval) must produce identical
    metrics to the XLA masked-matrix path — same -inf masking, same top-k tie
    order, same cumulative metric formulas."""
    import jax.numpy as jnp
    import numpy as np

    from serendipity_tpu.config import ExperimentConfig, apply_overrides
    from serendipity_tpu.data.synthetic import synthetic_interactions
    from serendipity_tpu.train.device import build_device_data
    from serendipity_tpu.train.evaluator import Evaluator
    from serendipity_tpu.train.runner import build_model

    inter = synthetic_interactions(300, 1500, avg_degree=12, seed=11)
    cfg = apply_overrides(ExperimentConfig(), [
        "eval.user_batch=256", "eval.topks=(10,)",
    ])
    data = build_device_data(inter, spmm_mode="edges")
    model = build_model(cfg, inter.n_users, inter.n_items)
    rng = np.random.default_rng(0)
    emb = (jnp.asarray(rng.standard_normal((inter.n_users, 64)), jnp.float32),
           jnp.asarray(rng.standard_normal((inter.n_items, 64)), jnp.float32))
    m0 = Evaluator(model, data, inter, cfg.eval).evaluate(None, all_emb=emb)
    cfg2 = apply_overrides(cfg, ["eval.fused=true"])
    ev = Evaluator(model, data, inter, cfg2.eval)
    assert ev._bitmap is not None
    m1 = ev.evaluate(None, all_emb=emb)
    assert m0.keys() == m1.keys()
    for k in m0:
        assert m0[k] == m1[k], (k, m0[k], m1[k])
