"""Differential tests: native C++ runtime vs the pure-Python/numpy paths."""

import os

import numpy as np
import pytest

from serendipity_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no toolchain)")
    return lib


def test_parse_adjacency_matches_python(lib, tmp_path):
    p = tmp_path / "train.txt"
    p.write_text("0 5 3 9\n1 2\n3 7 7 1\n\n4\n")
    res = native.parse_adjacency(str(p))
    assert res is not None
    users, items, mu, mi = res
    np.testing.assert_array_equal(users, [0, 0, 0, 1, 3, 3, 3])
    np.testing.assert_array_equal(items, [5, 3, 9, 2, 7, 7, 1])
    assert (mu, mi) == (4, 9)


def test_parse_mlls_matches_python(lib):
    path = "/root/reference/LightGCN-tf/Data/mlls/train.txt"
    if not os.path.exists(path):
        pytest.skip("mlls fixture unavailable")
    from serendipity_tpu.data.datasets import _parse_adjacency_file

    pu, pi, pmu, pmi = _parse_adjacency_file(path)
    nu, ni, nmu, nmi = native.parse_adjacency(path)
    np.testing.assert_array_equal(nu, pu)
    np.testing.assert_array_equal(ni, pi)
    assert (nmu, nmi) == (pmu, pmi)


def test_k_core_matches_numpy(lib):
    rng = np.random.default_rng(0)
    n_u, n_i, n_e = 60, 80, 500
    users = rng.integers(0, n_u, n_e).astype(np.int32)
    items = rng.integers(0, n_i, n_e).astype(np.int32)
    got = native.k_core_filter(users, items, n_u, n_i, 3, 3)

    # numpy fixed-point peeling (order-independent result)
    keep = np.ones(n_e, bool)
    while True:
        du = np.bincount(users[keep], minlength=n_u)
        di = np.bincount(items[keep], minlength=n_i)
        bad = keep & ((du[users] < 3) | (di[items] < 3))
        if not bad.any():
            break
        keep &= ~bad
    np.testing.assert_array_equal(got, keep)
    # every surviving user/item really has degree >= k
    if keep.any():
        assert np.bincount(users[keep], minlength=n_u)[users[keep]].min() >= 3
        assert np.bincount(items[keep], minlength=n_i)[items[keep]].min() >= 3


def test_build_csr_matches_numpy(lib):
    rng = np.random.default_rng(1)
    rows = rng.integers(0, 40, 300).astype(np.int32)
    cols = rng.integers(0, 70, 300).astype(np.int32)
    indptr, indices = native.build_csr(rows, cols, 40)
    from serendipity_tpu.data.datasets import _csr_from_pairs

    ref_ptr, ref_idx, _ = _csr_from_pairs(rows.astype(np.int64), cols.astype(np.int64), 40)
    np.testing.assert_array_equal(indptr, ref_ptr)
    np.testing.assert_array_equal(indices, ref_idx)


def test_host_negative_sampler(lib, tiny_inter):
    users = np.repeat(
        np.nonzero(np.diff(tiny_inter.train_indptr) > 0)[0], 5
    ).astype(np.int32)
    negs = native.sample_negatives_host(
        tiny_inter.train_indptr, tiny_inter.train_indices, users,
        tiny_inter.n_items, seed=42,
    )
    assert negs is not None
    for u, n in zip(users, negs):
        assert 0 <= n < tiny_inter.n_items
        assert n not in set(tiny_inter.train_items_of(u).tolist())


def test_parse_rating_csv(lib, tmp_path):
    p = tmp_path / "rating_train.csv"
    p.write_text(
        "userInd,itemInd,rating,timestamp,userId,itemId,serLabel\n"
        "0,3,4.5,100.0,u0,i3,1.0\n"
        "1,2,3.0,200.5,u1,i2,0.0\n"
    )
    cols = native.parse_rating_csv(str(p))
    assert cols is not None
    np.testing.assert_array_equal(cols["userInd"], [0, 1])
    np.testing.assert_array_equal(cols["itemInd"], [3, 2])
    np.testing.assert_allclose(cols["rating"], [4.5, 3.0])
    np.testing.assert_allclose(cols["timestamp"], [100.0, 200.5])
    np.testing.assert_allclose(cols["serLabel"], [1.0, 0.0])
