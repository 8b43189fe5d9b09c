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


def test_parse_raw_csv_native_matches_python(lib, tmp_path):
    """Native RFC4180 raw-CSV parser vs the pure-Python csv.reader path: quoted
    commas, doubled quotes, embedded newlines, header, short rows, first-
    appearance string ids — arrays must be identical (values bit-for-bit)."""
    from serendipity_tpu.data.preprocess import parse_raw_csv_python
    from serendipity_tpu.utils.native import parse_raw_csv_native

    p = tmp_path / "raw.csv"
    p.write_text(
        "user_id,item_id,timestamp,review,rating,label\n"
        'u1,i1,100,"nice, really ""great""",4.5,1\n'
        'u2,i2,200.25,"multi\nline review",3.0,0\n'
        "u1,i3,1.5e9,plain,2.25,1\n"
        "short,row\n"
        'u3,i1,400,"",5,0\n'
    )
    cols = ("user_id", "item_id", "timestamp", "review", "rating", "label")
    py = parse_raw_csv_python(str(p), cols, has_header=True)
    nat = parse_raw_csv_native(str(p), cols, True)
    assert nat is not None
    users, items, ratings, ts, labels = nat
    np.testing.assert_array_equal(users, py.users)
    np.testing.assert_array_equal(items, py.items)
    np.testing.assert_array_equal(ratings, py.ratings)
    np.testing.assert_array_equal(ts, py.timestamps)
    np.testing.assert_array_equal(labels, py.ser_labels)


def test_parse_raw_csv_native_column_orders(lib, tmp_path):
    """Amazon-style numeric-id layouts, no header, no label column."""
    from serendipity_tpu.data.preprocess import parse_raw_csv_python
    from serendipity_tpu.utils.native import parse_raw_csv_native

    p = tmp_path / "amz.csv"
    p.write_text("I9,U3,5.0,900\nI2,U3,1.0,901\nI9,U4,3.5,902\n")
    cols = ("item_id", "user_id", "rating", "timestamp")
    py = parse_raw_csv_python(str(p), cols, has_header=False)
    nat = parse_raw_csv_native(str(p), cols, False)
    assert nat is not None
    np.testing.assert_array_equal(nat[0], py.users)
    np.testing.assert_array_equal(nat[1], py.items)
    np.testing.assert_array_equal(nat[2], py.ratings)
    np.testing.assert_array_equal(nat[3], py.timestamps)
    assert nat[4] is None and py.ser_labels is None
