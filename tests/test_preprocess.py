"""Preprocessing pipeline tests: k-core, splits, exports round-trip."""

import numpy as np
import pytest

from serendipity_tpu.data.datasets import load_adjacency_list, load_serendipity_csv
from serendipity_tpu.data.preprocess import (
    RawInteractions,
    build_interactions,
    export_adjacency_lists,
    export_prone_graph,
    export_serendipity_csvs,
    ser_label_split,
    temporal_split,
)


@pytest.fixture()
def raw():
    rng = np.random.default_rng(0)
    n = 3000
    return RawInteractions(
        users=rng.integers(100, 160, n),
        items=rng.integers(1000, 1120, n),
        ratings=rng.uniform(1, 5, n),
        timestamps=rng.uniform(0, 1e6, n),
        ser_labels=(rng.random(n) > 0.7).astype(float),
    )


def test_build_interactions_kcore_and_split(raw):
    inter, uvocab, ivocab = build_interactions(raw, k_user=5, k_item=5)
    assert inter.n_users == len(uvocab) and inter.n_items == len(ivocab)
    deg_u = np.diff(inter.train_indptr) + np.diff(inter.test_indptr)
    assert deg_u[deg_u > 0].min() >= 5
    # per-user ~0.8 split with at least 1 train row
    tr_deg = np.diff(inter.train_indptr)
    te_deg = np.diff(inter.test_indptr)
    active = (tr_deg + te_deg) > 0
    assert (tr_deg[active] >= 1).all()
    ratio = tr_deg[active] / (tr_deg + te_deg)[active]
    assert abs(ratio.mean() - 0.8) < 0.05


def test_temporal_split_ordering(raw):
    tr, te = temporal_split(raw, 0.8)
    assert (tr | te).all() and not (tr & te).any()
    # within each user, every train timestamp <= min test timestamp is not required
    # (ties), but the count contract is: n_train = max(1, int(n * 0.8))
    for u in np.unique(raw.users)[:10]:
        m = raw.users == u
        n = m.sum()
        assert tr[m].sum() == max(1, int(n * 0.8))
        # max train ts <= min test ts given distinct timestamps
        if te[m].any():
            assert raw.timestamps[m & tr].max() <= raw.timestamps[m & te].min()


def test_ser_label_split(raw):
    tr, te = ser_label_split(raw)
    for u in np.unique(raw.users)[:10]:
        m = np.nonzero(raw.users == u)[0]
        pos = m[raw.ser_labels[m] > 0.99]
        if len(pos):
            order = pos[np.argsort(raw.timestamps[pos], kind="stable")]
            assert te[order[-1]]
            assert te[m].sum() == 1


def test_export_roundtrip(raw, tmp_path):
    inter, uvocab, ivocab = build_interactions(raw, k_user=5, k_item=5)
    export_adjacency_lists(inter, str(tmp_path))
    back = load_adjacency_list(str(tmp_path))
    assert back.n_users == inter.n_users
    np.testing.assert_array_equal(back.train_indices, inter.train_indices)
    np.testing.assert_array_equal(back.test_indptr, inter.test_indptr)

    export_serendipity_csvs(inter, str(tmp_path), uvocab, ivocab)
    back2 = load_serendipity_csv(str(tmp_path))
    np.testing.assert_array_equal(back2.train_indices, inter.train_indices)
    np.testing.assert_array_equal(back2.test_indices, inter.test_indices)
    np.testing.assert_allclose(back2.item_counts, inter.item_counts)

    export_prone_graph(inter, str(tmp_path / "proNE_ui_graph.txt"))
    edges = np.loadtxt(tmp_path / "proNE_ui_graph.txt", dtype=np.int64)
    assert len(edges) == inter.n_train
    assert edges[:, 1].min() >= inter.n_users


def test_parse_amazon_reviews(tmp_path):
    from serendipity_tpu.data.preprocess import parse_amazon_reviews

    p = tmp_path / "reviews.txt"
    p.write_text(
        "product/productId: B00A1\n"
        "review/userId: U1\n"
        "review/score: 4.0\n"
        "review/time: 1000\n"
        "\n"
        "product/productId: B00A2\n"
        "review/userId: U2\n"
        "review/score: 2.5\n"
        "review/time: 2000\n"
        "\n"
        "malformed block without colon separator\n"
        "\n"
    )
    raw = parse_amazon_reviews(str(p))
    assert list(raw.users) == ["U1", "U2"]
    assert list(raw.items) == ["B00A1", "B00A2"]
    np.testing.assert_allclose(raw.ratings, [4.0, 2.5])
    np.testing.assert_allclose(raw.timestamps, [1000, 2000])


def test_parse_raw_csv(tmp_path):
    from serendipity_tpu.data.preprocess import parse_raw_csv

    p = tmp_path / "ratings.csv"
    p.write_text("u1,i1,5.0,100\nu2,i2,3.0,200\n")
    raw = parse_raw_csv(str(p))
    # the native fast path returns the encoded (codes + vocab) representation;
    # user_ids resolves either form to the raw strings
    assert list(raw.user_ids) == ["u1", "u2"]
    np.testing.assert_allclose(raw.ratings, [5.0, 3.0])

    # SerenLens layout with header + label column
    p2 = tmp_path / "seren.csv"
    p2.write_text(
        "user_id,item_id,timestamp,review,rating,label\n"
        "u1,i1,100,text,5.0,1\n"
        "u2,i2,200,text,3.0,0\n"
    )
    raw2 = parse_raw_csv(
        str(p2),
        columns=("user_id", "item_id", "timestamp", "review", "rating", "label"),
        has_header=True,
    )
    np.testing.assert_allclose(raw2.ser_labels, [1.0, 0.0])
    np.testing.assert_allclose(raw2.timestamps, [100.0, 200.0])


def test_encoded_and_string_pipelines_identical(tmp_path):
    """build_interactions from the native encoded representation must be
    bit-identical to the pure-Python string path (same remap, same splits)."""
    from serendipity_tpu.data.preprocess import (
        RawInteractions, build_interactions, parse_raw_csv_python,
    )
    from serendipity_tpu.utils.native import parse_raw_csv_native

    rng = np.random.default_rng(4)
    lines = ["user_id,item_id,rating,timestamp"]
    for k in range(3000):
        u, i = rng.integers(0, 60), rng.integers(0, 90)
        lines.append(f"U{u},I{i},{rng.integers(1, 6)}.0,{1000 + k}")
    p = tmp_path / "enc.csv"
    p.write_text("\n".join(lines) + "\n")
    cols = ("user_id", "item_id", "rating", "timestamp")

    py_raw = parse_raw_csv_python(str(p), cols, has_header=True)
    nat = parse_raw_csv_native(str(p), cols, True, decode_strings=False)
    if nat is None:
        import pytest

        pytest.skip("native lib unavailable")
    uc, ic, r, t, lab, uvoc, ivoc = nat
    enc_raw = RawInteractions(
        users=uc, items=ic, ratings=r, timestamps=t,
        user_vocab=uvoc, item_vocab=ivoc,
    )
    a, ua, ia = build_interactions(py_raw, k_user=3, k_item=3)
    b, ub, ib = build_interactions(enc_raw, k_user=3, k_item=3)
    np.testing.assert_array_equal(ua, ub)
    np.testing.assert_array_equal(ia, ib)
    for attr in ("train_indptr", "train_indices", "test_indptr", "test_indices",
                 "train_ratings", "train_timestamps"):
        np.testing.assert_array_equal(
            getattr(a, attr), getattr(b, attr), err_msg=attr
        )
