"""Dataset containers and loaders for both reference on-disk formats.

Two input formats are supported, matching the reference loaders:

  1. the `train.txt` / `test.txt` adjacency-list format (`uid i1 i2 ...` per line),
     parsed the way `LightGCN-tf/utility/load_data.py:30-85` and
     `lightGCN/.../code/dataloader.py:230-297` do (n_users / n_items are max-id+1 over
     BOTH files; empty test lines are skipped);
  2. the serendipity CSV schema written by `rating_data_process.generateSerData`
     (`rating_data_process.py:293-389`): `rating{,_train,_test}.csv` with columns
     `userInd,itemInd,rating,timestamp,...[,serLabel]` and `item.csv` with
     `itemInd,date,count,itemId`.

Everything is normalized into one `Interactions` container holding CSR-by-user and
CSR-by-item index arrays (int32 numpy, host side).  Device-side padded/sorted variants
are built by `serendipity_tpu.train` / `serendipity_tpu.rec` as needed.

A native C++ parser (`serendipity_tpu.utils.native`) accelerates the text parsing when
the shared library is built; the numpy path below is the always-available fallback and
the differential cross-check.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclass
class Interactions:
    """A bipartite interaction dataset in CSR form (host, numpy, int32).

    `by_user_*` arrays describe the train set sorted by (user, item); `test_*` the held
    out set.  Item ids in each user's row segment are sorted ascending so device code
    can binary-search membership.
    """

    n_users: int
    n_items: int
    # train CSR by user: items of user u = indices[indptr[u]:indptr[u+1]], sorted asc
    train_indptr: np.ndarray
    train_indices: np.ndarray
    # train CSR by item: users of item i (sorted asc within row)
    train_indptr_by_item: np.ndarray
    train_indices_by_item: np.ndarray
    # test CSR by user
    test_indptr: np.ndarray
    test_indices: np.ndarray
    # optional per-interaction metadata (aligned with the CSR-by-user train order)
    train_ratings: Optional[np.ndarray] = None
    train_timestamps: Optional[np.ndarray] = None
    test_ser_labels: Optional[np.ndarray] = None     # serLabel column, if present
    # optional per-item metadata (item.csv contract: date = min train timestamp,
    # count = #train interactions, missing items get max date / count 0)
    item_dates: Optional[np.ndarray] = None
    item_counts: Optional[np.ndarray] = None
    item_mean_ratings: Optional[np.ndarray] = None

    @property
    def n_train(self) -> int:
        return int(self.train_indices.shape[0])

    @property
    def n_test(self) -> int:
        return int(self.test_indices.shape[0])

    def train_degrees(self) -> np.ndarray:
        return np.diff(self.train_indptr)

    def test_degrees(self) -> np.ndarray:
        return np.diff(self.test_indptr)

    def train_items_of(self, u: int) -> np.ndarray:
        return self.train_indices[self.train_indptr[u]:self.train_indptr[u + 1]]

    def test_items_of(self, u: int) -> np.ndarray:
        return self.test_indices[self.test_indptr[u]:self.test_indptr[u + 1]]

    def train_user_item_pairs(self) -> Tuple[np.ndarray, np.ndarray]:
        """Flat (user, item) arrays in CSR-by-user order."""
        users = np.repeat(
            np.arange(self.n_users, dtype=np.int32), self.train_degrees()
        )
        return users, self.train_indices


def _csr_from_pairs(
    rows: np.ndarray, cols: np.ndarray, n_rows: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Build a CSR (indptr, indices) with ascending column ids per row.

    Returns (indptr, indices, perm) where perm maps CSR order back to input order so
    aligned metadata can be permuted identically.
    """
    order = np.lexsort((cols, rows))
    rows_s, cols_s = rows[order], cols[order]
    counts = np.bincount(rows_s, minlength=n_rows)
    indptr = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    return indptr.astype(np.int64), cols_s.astype(np.int32), order


def interactions_from_arrays(
    train_users: np.ndarray,
    train_items: np.ndarray,
    test_users: np.ndarray,
    test_items: np.ndarray,
    n_users: Optional[int] = None,
    n_items: Optional[int] = None,
    train_ratings: Optional[np.ndarray] = None,
    train_timestamps: Optional[np.ndarray] = None,
    test_ser_labels: Optional[np.ndarray] = None,
) -> Interactions:
    if n_users is None:
        n_users = int(max(train_users.max(initial=-1), test_users.max(initial=-1))) + 1
    if n_items is None:
        n_items = int(max(train_items.max(initial=-1), test_items.max(initial=-1))) + 1

    tr_ptr, tr_idx, perm = _csr_from_pairs(
        np.asarray(train_users, dtype=np.int64), np.asarray(train_items, dtype=np.int64), n_users
    )
    ti_ptr, ti_idx, _ = _csr_from_pairs(
        np.asarray(train_items, dtype=np.int64), np.asarray(train_users, dtype=np.int64), n_items
    )
    te_ptr, te_idx, te_perm = _csr_from_pairs(
        np.asarray(test_users, dtype=np.int64), np.asarray(test_items, dtype=np.int64), n_users
    )
    return Interactions(
        n_users=n_users,
        n_items=n_items,
        train_indptr=tr_ptr,
        train_indices=tr_idx,
        train_indptr_by_item=ti_ptr,
        train_indices_by_item=ti_idx,
        test_indptr=te_ptr,
        test_indices=te_idx,
        train_ratings=None if train_ratings is None else np.asarray(train_ratings)[perm],
        train_timestamps=None
        if train_timestamps is None
        else np.asarray(train_timestamps)[perm],
        test_ser_labels=None
        if test_ser_labels is None
        else np.asarray(test_ser_labels)[te_perm],
    )


def _parse_adjacency_file(path: str) -> Tuple[List[int], List[int], int, int]:
    """Parse one `uid i1 i2 ...` file into flat (users, items) lists."""
    users: List[int] = []
    items: List[int] = []
    max_u, max_i = -1, -1
    with open(path) as f:
        for line in f:
            parts = line.strip("\n").split(" ")
            if len(parts) == 0 or parts[0] == "":
                continue
            try:
                ids = [int(p) for p in parts if p != ""]
            except ValueError:
                continue
            uid, its = ids[0], ids[1:]
            max_u = max(max_u, uid)
            if not its:
                continue
            users.extend([uid] * len(its))
            items.extend(its)
            max_i = max(max_i, max(its))
    return users, items, max_u, max_i


def load_adjacency_list(path: str) -> Interactions:
    """Load `<path>/train.txt` + `<path>/test.txt` (reference adjacency-list format)."""
    tr_u, tr_i, tr_mu, tr_mi = _parse_adjacency_file(os.path.join(path, "train.txt"))
    te_u, te_i, te_mu, te_mi = _parse_adjacency_file(os.path.join(path, "test.txt"))
    n_users = max(tr_mu, te_mu) + 1
    n_items = max(tr_mi, te_mi) + 1
    return interactions_from_arrays(
        np.asarray(tr_u, dtype=np.int64),
        np.asarray(tr_i, dtype=np.int64),
        np.asarray(te_u, dtype=np.int64),
        np.asarray(te_i, dtype=np.int64),
        n_users=n_users,
        n_items=n_items,
    )


def load_serendipity_csv(path: str) -> Interactions:
    """Load the `rating_train.csv` / `rating_test.csv` / `item.csv` schema.

    Column semantics per `rating_data_process.generateSerData`
    (`rating_data_process.py:293-389`).  Pure-numpy CSV parsing (no pandas dependency
    in the core path).
    """
    def read_csv(fname: str) -> Dict[str, np.ndarray]:
        fpath = os.path.join(path, fname)
        with open(fpath) as f:
            header = f.readline().strip("\n").split(",")
        raw = np.genfromtxt(
            fpath, delimiter=",", skip_header=1, dtype=None, encoding="utf-8",
            names=header, deletechars="",
        )
        return {name: np.atleast_1d(raw[name]) for name in raw.dtype.names or []}

    train = read_csv("rating_train.csv")
    test = read_csv("rating_test.csv")

    inter = interactions_from_arrays(
        train["userInd"].astype(np.int64),
        train["itemInd"].astype(np.int64),
        test["userInd"].astype(np.int64),
        test["itemInd"].astype(np.int64),
        train_ratings=train.get("rating"),
        train_timestamps=train.get("timestamp"),
        test_ser_labels=test.get("serLabel"),
    )

    item_csv = os.path.join(path, "item.csv")
    if os.path.exists(item_csv):
        item = read_csv("item.csv")
        dates = np.zeros(inter.n_items, dtype=np.float64)
        counts = np.zeros(inter.n_items, dtype=np.float64)
        idx = item["itemInd"].astype(np.int64)
        dates[idx] = item["date"].astype(np.float64)
        counts[idx] = item["count"].astype(np.float64)
        inter.item_dates = dates
        inter.item_counts = counts

    # mean rating per item over the FULL rating.csv (contract of `recommend.py:122-124`:
    # high_quality groups rating.csv by itemInd); fall back to train if absent.
    full_csv = os.path.join(path, "rating.csv")
    src = read_csv("rating.csv") if os.path.exists(full_csv) else train
    if "rating" in src:
        iidx = src["itemInd"].astype(np.int64)
        r = src["rating"].astype(np.float64)
        sums = np.bincount(iidx, weights=r, minlength=inter.n_items)
        cnts = np.bincount(iidx, minlength=inter.n_items)
        with np.errstate(invalid="ignore", divide="ignore"):
            inter.item_mean_ratings = np.where(cnts > 0, sums / np.maximum(cnts, 1), 0.0)
    return inter


def synthesize_item_metadata(inter: Interactions, seed: int = 0) -> None:
    """Fill MISSING item metadata (dates, mean ratings) with seeded synthetic
    values; counts always derive from real train degrees.

    The reference's serendipity studies run on datasets whose `item.csv` carries
    release dates and rating averages (`generateSerData`); the bundled `mlls`
    adjacency lists carry neither, which would zero the nov/qua factor columns.
    This makes the full 8-column study exercisable on metadata-less fixtures —
    clearly synthetic, deterministic, and opt-in (`pipeline --synth-metadata`).
    """
    rng = np.random.default_rng(seed)
    counts = np.diff(inter.train_indptr_by_item).astype(np.float64)
    if inter.item_counts is None:
        inter.item_counts = counts
    if inter.item_dates is None:
        inter.item_dates = rng.uniform(0.0, 1.0, inter.n_items)
    if inter.item_mean_ratings is None:
        inter.item_mean_ratings = np.clip(
            rng.normal(3.5, 0.6, inter.n_items), 1.0, 5.0
        )


def sparsity_split(
    inter: Interactions, n_folds: int = 4
) -> Tuple[List[np.ndarray], List[str]]:
    """Group test users into sparsity levels, the contract of
    `LightGCN-tf/utility/load_data.py:274-323` (`create_sparsity_split`).

    Test users are bucketed by total interaction count (train + test degree); buckets
    are swept in ascending order and a fold closes whenever its accumulated rating
    volume reaches 1/n_folds of the global total.  Returns (uid arrays, state strings)
    with the reference's state-string format.  Deviation: a trailing empty fold (which
    the reference can append when the last bucket closes a fold exactly) is dropped.
    """
    test_deg = np.diff(inter.test_indptr)
    test_users = np.nonzero(test_deg > 0)[0]
    n_iids = np.diff(inter.train_indptr)[test_users] + test_deg[test_users]
    total = inter.n_train + inter.n_test

    split_uids: List[np.ndarray] = []
    split_state: List[str] = []
    order = np.argsort(n_iids, kind="stable")
    uids_sorted, deg_sorted = test_users[order], n_iids[order]
    temp: List[np.ndarray] = []
    n_rates = 0
    for d in np.unique(deg_sorted):
        bucket = uids_sorted[deg_sorted == d]
        temp.append(bucket)
        n_rates += int(d) * len(bucket)
        if n_rates >= total / n_folds or d == deg_sorted[-1]:
            uids = np.concatenate(temp)
            split_uids.append(uids.astype(np.int32))
            split_state.append(
                "#inter per user<=[%d], #users=[%d], #all rates=[%d]"
                % (int(d), len(uids), n_rates)
            )
            temp, n_rates = [], 0
    return split_uids, split_state


def load_lastfm(
    path: str,
) -> Tuple[Interactions, np.ndarray]:
    """Load the LastFM table format of `code/dataloader.py:72-112` (`LastFM`).

    `data1.txt` / `test1.txt` are tab-separated 1-indexed (user, item, ...) tables;
    `trustnetwork.txt` is a 1-indexed user-user social edge list.  Returns the
    bipartite `Interactions` plus the 0-indexed social edge array [E, 2] (the social
    net is carried but, as in the reference LightGCN, not used in propagation).
    """
    def read_table(fname: str) -> np.ndarray:
        arr = np.loadtxt(os.path.join(path, fname), dtype=np.int64, ndmin=2)
        return arr - 1  # 1-indexed on disk (`dataloader.py:91-93`)

    train = read_table("data1.txt")
    test = read_table("test1.txt")
    trust_file = os.path.join(path, "trustnetwork.txt")
    trust = (
        np.loadtxt(trust_file, dtype=np.int64, ndmin=2) - 1
        if os.path.exists(trust_file)
        else np.zeros((0, 2), dtype=np.int64)
    )
    n_users = int(max(train[:, 0].max(), test[:, 0].max(), trust.max(initial=-1))) + 1
    n_items = int(max(train[:, 1].max(), test[:, 1].max())) + 1
    inter = interactions_from_arrays(
        train[:, 0], train[:, 1], test[:, 0], test[:, 1],
        n_users=n_users, n_items=n_items,
    )
    return inter, trust[:, :2]


def derive_item_metadata(inter: Interactions) -> None:
    """Fill item_dates/counts/mean_ratings from train interactions when no item.csv.

    Follows `generateSerData`: date = min train timestamp of the item (global max for
    unseen items), count = #train interactions (0 for unseen).
    """
    counts = np.diff(inter.train_indptr_by_item).astype(np.float64)
    inter.item_counts = counts
    if inter.train_timestamps is not None:
        users, _ = inter.train_user_item_pairs()
        ts = inter.train_timestamps.astype(np.float64)
        dates = np.full(inter.n_items, np.inf)
        np.minimum.at(dates, inter.train_indices, ts)
        max_date = ts.max() if ts.size else 0.0
        dates[np.isinf(dates)] = max_date
        inter.item_dates = dates
    if inter.train_ratings is not None:
        sums = np.zeros(inter.n_items)
        np.add.at(sums, inter.train_indices, inter.train_ratings.astype(np.float64))
        inter.item_mean_ratings = np.where(counts > 0, sums / np.maximum(counts, 1), 0.0)
