"""Tests for candidate generation, the eight strategies, DPP, fusion, and the
serendipity metrics — all against brute-force numpy implementations of the reference
semantics."""

import numpy as np
import pytest

from serendipity_tpu.config import RecConfig
from serendipity_tpu.data.datasets import derive_item_metadata
from serendipity_tpu.rec.candidates import create_candidates, global_score_minmax
from serendipity_tpu.rec.dpp import dpp_rerank
from serendipity_tpu.rec.fusion import fuse_scores, recommend_fused
from serendipity_tpu.rec.serendipity import SerendipityEvaluator, exclude_outliers
from serendipity_tpu.rec.strategies import StrategyScorer, topk_from_scores

import jax.numpy as jnp


@pytest.fixture(scope="module")
def setup(request):
    tiny = request.getfixturevalue("tiny_inter")
    rng = np.random.default_rng(7)
    eu = rng.standard_normal((tiny.n_users, 16)).astype(np.float32)
    ei = rng.standard_normal((tiny.n_items, 16)).astype(np.float32)
    # synthetic item metadata
    tiny.item_dates = rng.uniform(0, 1000, tiny.n_items)
    tiny.item_counts = np.diff(tiny.train_indptr_by_item).astype(np.float64)
    tiny.item_mean_ratings = rng.uniform(1, 5, tiny.n_items)
    cfg = RecConfig(n_candidates=40, top_k=10)
    cand = create_candidates(tiny, eu, ei, cfg, seed=0, user_block=32)
    return tiny, eu, ei, cfg, cand


def test_candidates_contract(setup):
    tiny, eu, ei, cfg, cand = setup
    k_c = cfg.n_candidates
    assert cand.shape == (tiny.n_users, k_c)
    assert cand.min() >= 0 and cand.max() < tiny.n_items
    for u in range(tiny.n_users):
        test_items = tiny.test_items_of(u)
        n_t = len(test_items)
        # tail slots are exactly the test items (`recommend.py:444-451`)
        if n_t:
            np.testing.assert_array_equal(cand[u, k_c - n_t:], test_items)
        # sampled slots exclude train items
        train = set(tiny.train_items_of(u).tolist())
        sampled = cand[u, : k_c - n_t]
        assert not (set(sampled.tolist()) & train)
        # sampled slots are distinct (our deviation: no duplicates)
        assert len(set(sampled.tolist())) == k_c - n_t


def test_score_dev_matches_host_scorers(setup):
    """Round-5 device-resident scoring: every strategy's device score matrix
    and device top-k selection must match the host score-form API exactly
    (same formulas, and `lax.top_k` tie order on both paths)."""
    tiny, eu, ei, cfg, cand = setup
    sc = StrategyScorer(tiny, eu, ei, cand, user_block=32)
    host = sc.all_scores(seed=3)
    for m in ("nov", "pop", "qua", "acc", "ela", "dif"):
        dev = np.asarray(sc.score_dev(m, seed=3))
        np.testing.assert_allclose(dev, host[m], rtol=1e-5, atol=1e-5, err_msg=m)
        np.testing.assert_array_equal(
            sc.topk_ids(sc.score_dev(m, seed=3), cfg.top_k),
            topk_from_scores(host[m], cand, cfg.top_k),
            err_msg=m,
        )
    # device rand: right shape/range, deterministic in seed (different stream
    # from numpy's — documented deviation)
    r1 = np.asarray(sc.score_dev("rand", seed=3))
    r2 = np.asarray(sc.score_dev("rand", seed=3))
    assert r1.shape == cand.shape and (0 <= r1).all() and (r1 < 1).all()
    np.testing.assert_array_equal(r1, r2)


def test_recommend_fused_dev_matches_host(setup):
    """Device-accumulated fusion == host recommend_fused for plain and
    DPP-conditioned specs (rand excluded: device PRNG differs by design)."""
    from serendipity_tpu.rec.fusion import recommend_fused, recommend_fused_dev

    tiny, eu, ei, cfg, cand = setup
    sc = StrategyScorer(tiny, eu, ei, cand, user_block=32)
    host = sc.all_scores(seed=0)
    for names, weights in ([("acc", "nov"), (0.5, 0.5)],
                           [("acc", "div"), (0.6, 0.4)]):
        n1, r1 = recommend_fused(cand, host, names, weights, ei, k=cfg.top_k)
        n2, r2 = recommend_fused_dev(
            cand, sc, names, weights, ei, k=cfg.top_k, seed=0
        )
        assert n1 == n2
        np.testing.assert_array_equal(r1, r2, err_msg=n1)


def test_candidates_underfilled_user_repeats_first_candidate():
    """A user with fewer eligible items than n_keep gets the shortfall filled by
    repeating their FIRST sampled candidate, never the clamped id n_items-1
    (which could be a train item) — ADVICE r4 low, `rec/candidates.py`."""
    from serendipity_tpu.data import interactions_from_arrays

    # 8 items; user 0 trains on items 0..5 -> only 2 eligible, n_keep up to 6
    train = {0: [0, 1, 2, 3, 4, 5], 1: [0], 2: [1], 3: [2]}
    test = {0: [6], 1: [3], 2: [4], 3: [5]}
    tr_u = np.concatenate([[u] * len(v) for u, v in train.items()])
    tr_i = np.concatenate([v for v in train.values()])
    te_u = np.array(list(test.keys()))
    te_i = np.array([v[0] for v in test.values()])
    inter = interactions_from_arrays(
        tr_u, tr_i, te_u, te_i, n_users=4, n_items=8
    )
    rng = np.random.default_rng(0)
    eu = rng.standard_normal((4, 8)).astype(np.float32)
    ei = rng.standard_normal((8, 8)).astype(np.float32)
    cfg = RecConfig(n_candidates=7, top_k=2)
    cand = create_candidates(inter, eu, ei, cfg, seed=1, user_block=4)
    # user 0: n_keep = 6 but only items {6, 7} eligible (6 is also the test item)
    samp = cand[0, :6]
    train = {0, 1, 2, 3, 4, 5}
    assert not (set(samp.tolist()) & train), samp
    # shortfall columns repeat the first sampled candidate
    uniq = set(samp.tolist())
    assert uniq <= {6, 7}
    assert (samp == samp[0]).sum() >= 4  # 2 eligible + 4 repeats


def test_create_pm_device_matches_host(setup):
    """The device create_pm path (top-half quality + top-half popularity
    selections on device) must equal the host numpy transliteration of
    `utils.py:70-114`.  Features are made DISTINCT per item first: among tied
    values the host path's unstable argsort is arbitrary while the device path
    follows lax.top_k order — equality is only defined tie-free."""
    from serendipity_tpu.rec.serendipity import SerendipityEvaluator

    tiny, eu, ei, cfg, cand = setup
    rng = np.random.default_rng(11)
    old_counts = tiny.item_counts
    tiny.item_counts = rng.permutation(tiny.n_items).astype(np.float64)
    try:
        ev = SerendipityEvaluator(tiny, ei)
        pm_host = ev.create_pm(cand, k=16)
        pm_dev = ev.create_pm(cand, k=16, cand_dev=jnp.asarray(cand))
        np.testing.assert_array_equal(pm_host, pm_dev)
    finally:
        tiny.item_counts = old_counts


def test_candidates_wide_catalog_int32_path():
    """Catalogs past the uint16 range take the int32 transfer branch, whose
    host copy must be writable for the test-tail overwrite (regression: a
    read-only np view of the device array crashed at amazon scale)."""
    from serendipity_tpu.data import interactions_from_arrays

    n_items = 70_000
    tr_u = np.repeat(np.arange(4), 5)
    tr_i = (np.arange(20) * 3001) % n_items
    te_u = np.arange(4)
    te_i = np.array([65_900, 66_000, 69_999, 68_123])
    inter = interactions_from_arrays(
        tr_u, tr_i, te_u, te_i, n_users=4, n_items=n_items
    )
    rng = np.random.default_rng(0)
    eu = rng.standard_normal((4, 8)).astype(np.float32)
    ei = rng.standard_normal((n_items, 8)).astype(np.float32)
    cand, cand_dev = create_candidates(
        inter, eu, ei, RecConfig(n_candidates=12, top_k=4), seed=0,
        user_block=4, return_device=True,
    )
    assert cand.dtype == np.int32
    for u in range(4):
        assert cand[u, -1] == te_i[u]          # tail overwrite landed
    np.testing.assert_array_equal(np.asarray(cand_dev), cand)


def test_candidates_stratification_proportional(setup):
    """Bin shares among sampled candidates approximate the eligible-bin shares."""
    tiny, eu, ei, cfg, cand = setup
    mn, mx = global_score_minmax(jnp.asarray(eu), jnp.asarray(ei))
    mx += cfg.bin_epsilon
    inter_w = (mx - mn) / cfg.n_score_bins
    scores = (eu @ ei.T).astype(np.float16).astype(np.float32)
    labels = np.clip(np.floor((scores - mn) / inter_w), 0, cfg.n_score_bins - 1)
    u = 0
    n_t = len(tiny.test_items_of(u))
    samp = cand[u, : cfg.n_candidates - n_t]
    elig = np.setdiff1d(np.arange(tiny.n_items), tiny.train_items_of(u))
    elig_share = np.bincount(labels[u, elig].astype(int), minlength=10) / len(elig)
    samp_share = np.bincount(labels[u, samp].astype(int), minlength=10) / len(samp)
    assert np.abs(elig_share - samp_share).max() < 0.15


def test_feature_strategies_match_numpy(setup):
    tiny, eu, ei, cfg, cand = setup
    sc = StrategyScorer(tiny, eu, ei, cand, user_block=32)

    def ref_minmax(vals):
        mn = vals.min(1, keepdims=True)
        mx = vals.max(1, keepdims=True)
        return (vals - mn) / np.maximum(mx - mn, 1e-12)

    np.testing.assert_allclose(
        sc.nov(), ref_minmax(tiny.item_dates[cand]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        sc.pop(), ref_minmax(-tiny.item_counts[cand]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        sc.qua(), ref_minmax(tiny.item_mean_ratings[cand]), rtol=1e-5, atol=1e-6
    )
    raw_ref = np.einsum("ud,ucd->uc", eu, ei[cand])
    np.testing.assert_allclose(sc.acc_raw(), raw_ref, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(sc.acc(), ref_minmax(raw_ref), rtol=1e-4, atol=1e-4)


def test_ela_matches_reference_formula(setup):
    tiny, eu, ei, cfg, cand = setup
    sc = StrategyScorer(tiny, eu, ei, cand, user_block=32)
    raw = np.einsum("ud,ucd->uc", eu, ei[cand])
    ui = eu @ ei.T
    mn, mx = ui.min(), ui.max()
    deg = np.diff(tiny.train_indptr).astype(np.float64)
    ela_u = (deg - deg.min()) / (deg.max() - deg.min())
    factor = (raw - mn) / (mx - mn) + ela_u[:, None]
    mean_f = factor.mean()
    scores = -np.abs(factor - mean_f)
    smn, smx = scores.min(1, keepdims=True), scores.max(1, keepdims=True)
    ref = (scores - smn) / np.maximum(smx - smn, 1e-12)
    np.testing.assert_allclose(sc.ela(), ref, rtol=1e-3, atol=1e-4)


def test_dif_matches_bruteforce(setup):
    tiny, eu, ei, cfg, cand = setup
    sc = StrategyScorer(tiny, eu, ei, cand, user_block=32)
    got = sc.dif()
    ii = ei @ ei.T
    mn, mx = ii.min(), ii.max()
    for u in (0, 5, 17):
        tr = tiny.train_items_of(u)
        ms = (ei[cand[u]] @ ei[tr].T).max(axis=1)
        ref = 1 - (ms - mn) / (mx - mn)
        np.testing.assert_allclose(got[u], ref, rtol=1e-4, atol=1e-4)


def _greedy_dpp_numpy(kernel, k, epsilon=1e-10):
    """Numpy transliteration of the fast greedy MAP loop (`recommend.py:226-258`,
    matrix-kernel semantics)."""
    c = kernel.shape[0]
    cis = np.zeros((k, c))
    di2s = np.diag(kernel).copy()
    sel = [int(np.argmax(di2s))]
    di2s_work = di2s.copy()
    while len(sel) < k:
        j = len(sel) - 1
        s = sel[-1]
        di_opt = np.sqrt(max(di2s_work[s], epsilon))
        eis = (kernel[s] - cis[:j].T @ cis[:j, s]) / di_opt
        cis[j] = eis
        di2s_work -= eis ** 2
        di2s_work[s] = -np.inf
        sel.append(int(np.argmax(di2s_work)))
    return sel


def test_dpp_matches_numpy():
    """Greedy MAP selection parity on explicit PSD kernels with well-separated
    diagonals (ties in the all-ones cosine diagonal would make the comparison
    ULP-chaotic, so we test the selector on decisive kernels)."""
    from serendipity_tpu.rec.dpp import dpp_select_kernels

    rng = np.random.default_rng(5)
    b, c, k = 3, 30, 8
    kernels = []
    for _ in range(b):
        f = rng.standard_normal((c, 12))
        f *= rng.uniform(0.5, 2.0, (c, 1))       # distinct diagonal magnitudes
        kernels.append(f @ f.T / 12)
    kernels = np.stack(kernels).astype(np.float32)
    got = np.asarray(dpp_select_kernels(jnp.asarray(kernels), k))
    for u in range(b):
        sel = _greedy_dpp_numpy(kernels[u].astype(np.float64), k)
        np.testing.assert_array_equal(got[u], sel)


def test_dpp_rerank_valid(setup):
    """End-to-end rerank: distinct selections drawn from the candidate list."""
    tiny, eu, ei, cfg, cand = setup
    k = 8
    got = dpp_rerank(cand[:4], ei, k, user_block=4)
    for u in range(4):
        assert len(set(got[u].tolist())) == k
        assert set(got[u].tolist()) <= set(cand[u].tolist())


def test_fusion_and_topk(setup):
    tiny, eu, ei, cfg, cand = setup
    sc = StrategyScorer(tiny, eu, ei, cand, user_block=32)
    scores = sc.all_scores(seed=1)
    fused = fuse_scores(scores, ["acc", "nov"], [0.7, 0.3])
    np.testing.assert_allclose(
        fused, 0.7 * scores["acc"] + 0.3 * scores["nov"], rtol=1e-6
    )
    name, rec = recommend_fused(cand, scores, ["acc", "nov"], [0.7, 0.3], ei, k=10)
    assert name == "0.7acc_0.3nov"
    ref = topk_from_scores(fused, cand, 10)
    np.testing.assert_array_equal(rec, ref)
    # every user's top-1 really is the argmax of fused score
    top1 = cand[np.arange(len(cand)), np.argmax(fused, axis=1)]
    np.testing.assert_array_equal(rec[:, 0], top1)


def test_ser1_acc_dif_bruteforce(setup):
    tiny, eu, ei, cfg, cand = setup
    ev = SerendipityEvaluator(tiny, ei, user_block=32)
    rec = cand[:, :10]
    acc, dif = ev.acc_dif_arrays(rec)
    ii = ei @ ei.T
    mn, mx = ii.min(), ii.max()
    for u in (0, 3, 11):
        te = tiny.test_items_of(u)
        tr = tiny.train_items_of(u)
        acc_ref = ((ei[rec[u]] @ ei[te].T).max(1) - mn) / (mx - mn)
        dif_ref = 1 - ((ei[rec[u]] @ ei[tr].T).max(1) - mn) / (mx - mn)
        np.testing.assert_allclose(acc[u], acc_ref, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(dif[u], dif_ref, rtol=1e-4, atol=1e-4)


def test_ser2_bruteforce(setup):
    tiny, eu, ei, cfg, cand = setup
    ev = SerendipityEvaluator(tiny, ei, user_block=32)
    rec = cand[:, :10]
    pm = ev.create_pm(cand, k=20)
    got = ev.ser2(rec, pm)
    ii = ei @ ei.T
    mn, mx = ii.min(), ii.max()
    vals = []
    for u in range(tiny.n_users):
        keep = [it for it in rec[u] if it not in set(pm[u].tolist())]
        tr = tiny.train_items_of(u)
        if keep:
            vals.append((ei[keep] @ ei[tr].T).max(1).mean())
        else:
            vals.append(mn)
    ref = (np.mean(vals) - mn) / (mx - mn)
    assert got == pytest.approx(ref, rel=1e-4)

    # fused path (evaluate_methods): ser2 reconstructed from the acc_dif raw
    # train max-sims must equal the standalone device pass
    _, _, ms_tr = ev.acc_dif_arrays(rec, return_raw_tr=True)
    got2 = ev.ser2_from_ms(rec, ev.pm_row_keys(pm, tiny.n_items), ms_tr)
    assert got2 == pytest.approx(got, rel=1e-5)


def test_hr_ndcg_ser(setup):
    tiny, eu, ei, cfg, cand = setup
    ev = SerendipityEvaluator(tiny, ei)
    # craft a rec matrix: user 0 gets their first test item in slot 0
    rec = np.full((tiny.n_users, 5), tiny.n_items - 1, dtype=np.int32)
    rec[0, 0] = tiny.test_items_of(0)[0]
    hr = ev.hr_ser(rec)
    users_with_test = (np.diff(tiny.test_indptr) > 0).sum()
    # at least user 0 hits; others hit only if n_items-1 is one of their test items
    assert hr >= 1.0 / users_with_test - 1e-9
    nd = ev.ndcg_ser(rec)
    assert 0.0 <= nd <= 1.0


def test_evaluate_methods_and_disentanglement(setup):
    tiny, eu, ei, cfg, cand = setup
    ev = SerendipityEvaluator(tiny, ei, user_block=32)
    sc = StrategyScorer(tiny, eu, ei, cand, user_block=32)
    scores = sc.all_scores(seed=3)
    recs = {
        "acc": topk_from_scores(scores["acc"], cand, 10),
        "nov": topk_from_scores(scores["nov"], cand, 10),
    }
    res = ev.evaluate_methods(recs, candidates=cand)
    mat = ev.result_matrix(res, ["acc", "nov"])
    assert mat.shape == (2, 8)
    assert np.isfinite(mat).all()
    # normalized acc/dif means live in (0, 1]
    for m in ("acc", "nov"):
        assert 0.0 < res[m]["acc"] <= 1.0
        assert 0.0 < res[m]["dif"] <= 1.0
        assert 0.0 < res[m]["ser1"] <= 1.0

    d = ev.disentanglement_matrix(recs, ["acc", "nov"])
    assert d.shape == (2, 2)
    # self-disentanglement (identical lists) is ~0; cross should exceed it
    assert d[0, 1] > d[0, 0] - 1e-9

    j = ev.jaccard_matrix(recs, ["acc", "nov"])
    assert j[0, 0] == 0.0 and 0.0 <= j[0, 1] <= 1.0


def test_exclude_outliers():
    data = np.array([1.0, 1.1, 0.9, 1.05, 50.0, -40.0])
    kept = exclude_outliers(data)
    assert 50.0 not in kept and -40.0 not in kept and len(kept) == 4


def test_retrieval_service(setup):
    from serendipity_tpu.rec.service import RetrievalService

    tiny, eu, ei, cfg, cand = setup
    svc = RetrievalService(tiny, eu, ei)
    uids = np.arange(8)
    v, idx = svc.recommend(uids, k=10)
    assert v.shape == idx.shape == (8, 10)
    scores = eu[uids] @ ei.T
    for r, u in enumerate(uids):
        train = set(tiny.train_items_of(u).tolist())
        assert not (set(idx[r].tolist()) & train)
        # pure-acc blend is per-row min-max of dot scores -> same ordering
        s = scores[r].copy()
        s[list(train)] = -np.inf
        ref = np.argsort(-s)[:10]
        np.testing.assert_allclose(
            np.sort(s[idx[r]]), np.sort(s[ref]), rtol=1e-5
        )
    # blended weights shift rankings toward high-quality items
    v2, idx2 = svc.recommend(uids, k=10, weights={"acc": 0.0, "qua": 1.0})
    mq = tiny.item_mean_ratings
    assert mq[idx2].mean() >= mq[idx].mean() - 1e-9


def test_hr_ndcg_ser_vs_naive(setup):
    """Vectorized HR_ser/NDCG_ser vs a naive per-user transliteration of
    `utils.py:144-243` with crafted serendipity labels."""
    tiny, eu, ei, cfg, cand = setup
    rng = np.random.default_rng(11)
    tiny.test_ser_labels = (rng.random(tiny.n_test) > 0.5).astype(float)
    ev = SerendipityEvaluator(tiny, ei)
    rec = np.stack([
        rng.choice(tiny.n_items, 6, replace=False) for _ in range(tiny.n_users)
    ]).astype(np.int32)
    # plant some hits
    for u in range(0, tiny.n_users, 3):
        t = tiny.test_items_of(u)
        if len(t):
            rec[u, 0] = t[0]

    glb = 0.3
    hr_naive, ndcg_naive = [], []
    disc = 1.0 / np.log2(np.arange(2, rec.shape[1] + 2))
    ptr, idx = tiny.test_indptr, tiny.test_indices
    labels = tiny.test_ser_labels
    for u in range(tiny.n_users):
        if ptr[u + 1] == ptr[u]:
            continue
        lab_of = {int(i): l for i, l in zip(idx[ptr[u]:ptr[u+1]], labels[ptr[u]:ptr[u+1]])}
        res = 0.0
        for it in lab_of:
            if it in rec[u]:
                if lab_of[it] > 0.9999:
                    res = 1.0
                    break
                res = glb
        hr_naive.append(res)
        rel = np.array([
            (1.0 if lab_of[int(it)] > 0.9999 else glb) if int(it) in lab_of else 0.0
            for it in rec[u]
        ])
        gains = 2.0 ** rel - 1
        dcg = (gains * disc).sum()
        idcg = (np.sort(gains)[::-1] * disc).sum()
        ndcg_naive.append(dcg / idcg if idcg > 0 else 0.0)

    assert ev.hr_ser(rec, glb_ser_score=glb) == pytest.approx(np.mean(hr_naive), rel=1e-5)
    assert ev.ndcg_ser(rec, glb_ser_score=glb) == pytest.approx(np.mean(ndcg_naive), rel=1e-5)
    # only_pos: membership only
    hr_op = ev.hr_ser(rec, only_pos=True)
    naive_op = np.mean([
        float(any(int(i) in rec[u] for i in idx[ptr[u]:ptr[u+1]]))
        for u in range(tiny.n_users) if ptr[u+1] > ptr[u]
    ])
    assert hr_op == pytest.approx(naive_op, rel=1e-6)
    tiny.test_ser_labels = None


def test_ideal_max_normalizers(setup):
    tiny, eu, ei, cfg, cand = setup
    ev = SerendipityEvaluator(tiny, ei, user_block=32)
    rng = np.random.default_rng(13)
    n = 12
    dist = rng.random((n, n))
    dist = (dist + dist.T) / 2
    rec = np.array([0, 3, 5])
    k = 4
    # max_average_linkage == brute-force best k-subset mean total linkage
    # (contributions independent -> top-k)
    linkage = dist[rec].sum(axis=0)
    expect = np.sort(linkage)[-k:].sum() / k
    assert ev.max_average_linkage(rec, dist, k) == pytest.approx(expect)
    # max_min_cos_diff: bounded by the best possible sum/k and >= 0
    got = ev.max_min_cos_diff(rec, dist, k)
    assert 0.0 <= got <= dist[rec].max(axis=1).sum() / k + 1e-9


def test_disentanglement_ideal_variants(setup):
    tiny, eu, ei, cfg, cand = setup
    ev = SerendipityEvaluator(tiny, ei, user_block=32)
    rec_a = cand[:6, :5]
    rec_b = cand[:6, 5:10]
    for metric in ("cosDis_diff", "cosDis_avgLink"):
        v = ev.disentanglement_pair_ideal(rec_a, rec_b, metric=metric)
        assert np.isfinite(v) and v >= 0.0
    # identical lists under the diff metric give ~0 disentanglement
    v_same = ev.disentanglement_pair_ideal(rec_a, rec_a, metric="cosDis_diff")
    v_diff = ev.disentanglement_pair_ideal(rec_a, rec_b, metric="cosDis_diff")
    assert v_same <= v_diff + 1e-9


def test_evaluate_methods_with_empty_test_users():
    """Users with no test (or train) rows must not poison the means with -inf
    (exposed at synthetic-graph scale; the reference's datasets never contain such
    users, so they are excluded rather than given a defined value)."""
    from serendipity_tpu.data.datasets import interactions_from_arrays

    rng = np.random.default_rng(11)
    n_u, n_i = 20, 30
    tr_u = np.repeat(np.arange(n_u), 3)
    tr_i = rng.integers(0, n_i, len(tr_u))
    # only half the users get test rows
    te_u = np.arange(0, n_u, 2)
    te_i = rng.integers(0, n_i, len(te_u))
    inter = interactions_from_arrays(tr_u, tr_i, te_u, te_i, n_users=n_u, n_items=n_i)
    ei = rng.standard_normal((n_i, 8)).astype(np.float32)

    ev = SerendipityEvaluator(inter, ei, user_block=8)
    recs = {
        "a": rng.integers(0, n_i, (n_u, 5)).astype(np.int32),
        "b": rng.integers(0, n_i, (n_u, 5)).astype(np.int32),
    }
    pm = rng.integers(0, n_i, (n_u, 10)).astype(np.int32)
    res = ev.evaluate_methods(recs, pm=pm)
    for m, row in res.items():
        for k, v in row.items():
            assert np.isfinite(v), (m, k, v)
    # valid-user acc agrees with a brute-force mean over test-having users only
    assert ev.ser1_valid.sum() == n_u // 2


def test_div_fusion_relevance_conditioning_effective():
    """With rel_factor=1.0 the fused-DPP selection must depend on relevance; with the
    reference's factor=1e6 it must reproduce the pure-DPP order (the reference's
    measured no-op behavior, `recommend_combination.py:265,274`)."""
    rng = np.random.default_rng(5)
    n_i, c, k = 60, 24, 6
    ei = rng.standard_normal((n_i, 8)).astype(np.float32)
    cand = np.stack([rng.permutation(n_i)[:c] for _ in range(8)]).astype(np.int32)
    rel = rng.random((8, c)).astype(np.float32) * 5.0

    pure = dpp_rerank(cand, ei, k)
    cond = dpp_rerank(cand, ei, k, rel_scores=rel, div_weight=0.5, rel_factor=1.0)
    assert not np.array_equal(cond, pure)           # intended behavior is effective
    # reference behavior (rel_factor=1e6): the relevance term perturbs the kernel
    # by only ~alpha*rel/1e6 in log space — a no-op up to near-ties (measured
    # identical recs on every user at gowalla scale)
    q = np.exp(0.5 * rel / 1e6)
    assert np.abs(q - 1.0).max() < 1e-5
    # strongly relevance-dominated (but exp-safe): top-1 = max-relevance candidate
    heavy = dpp_rerank(cand, ei, k, rel_scores=rel * 10, div_weight=0.5, rel_factor=1.0)
    top1_pos = np.array([np.where(cand[r] == heavy[r, 0])[0][0] for r in range(8)])
    np.testing.assert_array_equal(top1_pos, rel.argmax(1))


def test_ideal_normalizers_device_vs_host(setup):
    """Device-batched ideal normalizers must match the host DP transliteration
    (the differential oracle) on the full N x N matrix path."""
    tiny, eu, ei, cfg, cand = setup
    ev = SerendipityEvaluator(tiny, ei, user_block=32)
    en = ei / np.maximum(np.linalg.norm(ei, axis=1, keepdims=True), 1e-12)
    full = (1.0 - en @ en.T) / 2.0
    f_mn, f_mx = ev._norm_cos_minmax()
    full_n = (full - f_mn) / max(f_mx - f_mn, 1e-12)
    recs = cand[:8, :5].astype(np.int32)
    k = recs.shape[1]
    host_avg = np.array([ev.max_average_linkage(r, full_n, k) for r in recs])
    host_dp = np.array([ev.max_min_cos_diff(r, full_n, k) for r in recs])
    dev_avg = ev.ideal_avg_linkage_all(recs)
    dev_dp = ev.ideal_min_cos_diff_all(recs, item_block=128)
    np.testing.assert_allclose(dev_avg, host_avg, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(dev_dp, host_dp, rtol=1e-4, atol=1e-5)


def test_jaccard_matrix_vs_sets(setup):
    """Vectorized Jaccard must equal the per-user set formula, incl. duplicates."""
    tiny, eu, ei, cfg, cand = setup
    rng = np.random.default_rng(5)
    a = rng.integers(0, 50, (16, 8))
    b = rng.integers(0, 50, (16, 8))
    a[3, :4] = 7  # force duplicates inside a row
    recs = {"x": a, "y": b}
    got = SerendipityEvaluator.jaccard_matrix(recs, ["x", "y"])
    exp = np.zeros((2, 2))
    mats = [a, b]
    for i in range(2):
        for j in range(2):
            ds = [
                1.0 - len(set(ra) & set(rb)) / len(set(ra) | set(rb))
                for ra, rb in zip(mats[i].tolist(), mats[j].tolist())
            ]
            exp[i, j] = np.mean(ds)
    np.testing.assert_allclose(got, exp, rtol=1e-12)


def test_degree_bucketed_maxsim_parity():
    """Two-bucket degree partition must reproduce the single-width pass exactly
    (pads are masked; only wasted FLOPs differ).  Uses a skewed graph with
    whale users above the 128-aligned bucket boundary."""
    import jax.numpy as jnp

    from serendipity_tpu.data.synthetic import synthetic_interactions
    from serendipity_tpu.rec.strategies import (
        _raw_and_maxsim_all,
        _round_up,
        degree_buckets,
    )

    inter = synthetic_interactions(240, 400, avg_degree=110, seed=4)
    deg = np.diff(inter.train_indptr)
    buckets = degree_buckets(deg)
    assert len(buckets) == 2, f"want a split, max deg {deg.max()}"
    rng = np.random.default_rng(0)
    eu = rng.standard_normal((inter.n_users, 16)).astype(np.float32)
    ei = rng.standard_normal((inter.n_items, 16)).astype(np.float32)
    cand = np.stack(
        [rng.choice(inter.n_items, size=30, replace=False)
         for _ in range(inter.n_users)]
    ).astype(np.int32)
    inter.item_counts = np.diff(inter.train_indptr_by_item).astype(np.float64)
    sc = StrategyScorer(inter, eu, ei, cand, user_block=32)
    raw_b, ms_b = sc._raw_and_maxsim()          # bucketed path (mesh=None)
    h = _round_up(int(deg.max()), 128)
    raw_a, ms_a = _raw_and_maxsim_all(
        jnp.asarray(eu), sc.ei_pad, jnp.asarray(cand, jnp.int32),
        jnp.asarray(inter.train_indptr, jnp.int32),
        jnp.asarray(inter.train_indices, jnp.int32),
        n_items=inter.n_items, h_max=h,
    )
    np.testing.assert_allclose(raw_b, np.asarray(raw_a)[: inter.n_users], atol=1e-5)
    np.testing.assert_allclose(ms_b, np.asarray(ms_a)[: inter.n_users], atol=1e-5)

    # acc/dif bucketed path parity too
    ev = SerendipityEvaluator(inter, ei, user_block=32)
    rec = cand[:, :10]
    acc, dif = ev.acc_dif_arrays(rec)
    ii = ei @ ei.T
    mn, mx = ii.min(), ii.max()
    for u in (int(np.argmax(deg)), 0, 7):
        te = inter.test_items_of(u)
        tr = inter.train_items_of(u)
        if len(te) == 0 or len(tr) == 0:
            continue
        acc_ref = ((ei[rec[u]] @ ei[te].T).max(1) - mn) / (mx - mn)
        dif_ref = 1 - ((ei[rec[u]] @ ei[tr].T).max(1) - mn) / (mx - mn)
        np.testing.assert_allclose(acc[u], acc_ref, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(dif[u], dif_ref, rtol=1e-4, atol=1e-4)


def test_dispatch_chunking_invariance(setup, monkeypatch):
    """Host-chunking the heavy dispatches must not change any result: candidate
    draws are per-user keyed and DPP is per-user independent."""
    import serendipity_tpu.rec.candidates as cand_mod

    tiny, eu, ei, cfg, cand = setup
    base = create_candidates(tiny, eu, ei, cfg, seed=11)
    monkeypatch.setattr(cand_mod, "USERS_PER_DISPATCH", 16)
    chunked = create_candidates(tiny, eu, ei, cfg, seed=11)
    np.testing.assert_array_equal(base, chunked)

    rec_base = dpp_rerank(cand, ei, 6, user_block=8)
    rec_chunk = dpp_rerank(cand, ei, 6, user_block=8)  # chunk = 32 users now
    np.testing.assert_array_equal(rec_base, rec_chunk)


def test_create_candidates_device_copy_matches_host(setup):
    tiny, eu, ei, cfg, _ = setup
    host, dev = create_candidates(tiny, eu, ei, cfg, seed=3, return_device=True)
    np.testing.assert_array_equal(host, np.asarray(dev))
