"""Raw-interaction preprocessing: k-core filtering, id remapping, splits, exports.

Capability match for `rating_data_process.py` (P2): from raw (user, item, rating,
timestamp[, serendipity-label]) interaction arrays produce the framework's datasets
and every on-disk format the reference pipeline consumes:

  * iterative k-core filtering (`filter_k_core_precise`, :22-65; the fast 2-pass
    variant `filter_k_core_fast`, :11-21, is `iterations=1`)
  * dense id remapping over sorted unique raw ids
  * per-user temporal 0.8/0.2 split with >=1 train row (`generateSerData:321-324`:
    split_index = max(1, int(len * ratio)))
  * leave-last-serendipitous-out split when labels are present (`:328-338`)
  * exports: train.txt/test.txt adjacency lists (`generateLightgcn`, :177-291),
    rating{,_train,_test}.csv + item.csv + user.csv (`generateSerData`, :293-389),
    and the ProNE edge list with item ids offset by n_users (`serData2proNE`, :97-109)

The hot loops (k-core peeling, CSR building, text parsing) run in the native C++
runtime when available (`serendipity_tpu.utils.native`), numpy otherwise.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, Optional, Tuple

import numpy as np

from serendipity_tpu.data.datasets import Interactions, interactions_from_arrays
from serendipity_tpu.utils import native


@dataclass
class RawInteractions:
    users: np.ndarray         # raw user ids (any integer/str-hashed dtype)
    items: np.ndarray
    ratings: np.ndarray
    timestamps: np.ndarray
    ser_labels: Optional[np.ndarray] = None
    # When set, `users`/`items` are int CODES into these first-appearance-order
    # vocabularies (the native parser's encoding, `utils/native.parse_raw_csv_
    # encoded`) — multi-GB dumps then never materialize per-row string arrays.
    # `k_core` and `remap_ids` handle both representations and produce
    # bit-identical outputs (tests/test_preprocess.py).
    user_vocab: Optional[np.ndarray] = None
    item_vocab: Optional[np.ndarray] = None

    @property
    def user_ids(self) -> np.ndarray:
        """Raw (string) user ids regardless of representation."""
        return self.users if self.user_vocab is None else self.user_vocab[self.users]

    @property
    def item_ids(self) -> np.ndarray:
        return self.items if self.item_vocab is None else self.item_vocab[self.items]


def k_core(
    raw: RawInteractions, k_user: int, k_item: int
) -> RawInteractions:
    """Iterative degree peeling until every user and item has >= k interactions."""
    if raw.user_vocab is not None:
        uinv, ulen = raw.users, len(raw.user_vocab)
        iinv, ilen = raw.items, len(raw.item_vocab)
    else:
        uu, uinv = np.unique(raw.users, return_inverse=True)
        ii, iinv = np.unique(raw.items, return_inverse=True)
        ulen, ilen = len(uu), len(ii)
    keep = native.k_core_filter(
        uinv.astype(np.int32), iinv.astype(np.int32), ulen, ilen,
        k_user, k_item,
    )
    return RawInteractions(
        users=raw.users[keep],
        items=raw.items[keep],
        ratings=raw.ratings[keep],
        timestamps=raw.timestamps[keep],
        ser_labels=None if raw.ser_labels is None else raw.ser_labels[keep],
        user_vocab=raw.user_vocab,
        item_vocab=raw.item_vocab,
    )


def _remap_column(col, vocab):
    """(dense ids, sorted unique raw ids) for one column — np.unique semantics.

    For encoded columns the lexicographic order is recovered from the (small)
    vocabulary instead of sorting the full string column: np.unique(strings,
    return_inverse=True) == (vocab[present][order], rank[searchsorted]) exactly.
    """
    if vocab is None:
        uu, inv = np.unique(col, return_inverse=True)
        return inv.astype(np.int64), uu
    present = np.unique(col)                     # code values that survived
    strs = vocab[present]
    order = np.argsort(strs, kind="stable")      # lexicographic (ids unique)
    rank = np.empty(len(present), np.int64)
    rank[order] = np.arange(len(present))
    return rank[np.searchsorted(present, col)], strs[order]


def remap_ids(raw: RawInteractions) -> Tuple[RawInteractions, np.ndarray, np.ndarray]:
    """Dense remap over sorted unique ids -> (remapped, user_vocab, item_vocab)."""
    uinv, uu = _remap_column(raw.users, raw.user_vocab)
    iinv, ii = _remap_column(raw.items, raw.item_vocab)
    return (
        RawInteractions(
            users=uinv.astype(np.int64),
            items=iinv.astype(np.int64),
            ratings=raw.ratings,
            timestamps=raw.timestamps,
            ser_labels=raw.ser_labels,
        ),
        uu,
        ii,
    )


def temporal_split(
    raw: RawInteractions, train_ratio: float = 0.8
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-user temporal split -> (train_mask, test_mask).

    Rows are ordered by (user, timestamp, original order); the first
    max(1, int(n * ratio)) go to train.  Users whose interactions all fall in
    train (n == 1) contribute no test rows (the reference exits on such users;
    we keep them trainable and testless).
    """
    n = len(raw.users)
    order = np.lexsort((np.arange(n), raw.timestamps, raw.users))
    users_sorted = raw.users[order]
    # vectorized per-group prefix take: row r (within its user's sorted run)
    # trains iff r < max(1, int(cnt * ratio)) — no per-user Python loop (2M-user
    # raw dumps made the loop the ingest bottleneck)
    starts = np.searchsorted(users_sorted, np.unique(users_sorted), side="left")
    ends = np.append(starts[1:], n)
    counts = ends - starts
    k = np.maximum(1, (counts * train_ratio).astype(np.int64))
    group = np.repeat(np.arange(len(starts)), counts)
    pos_in_group = np.arange(n) - np.repeat(starts, counts)
    train_mask = np.zeros(n, bool)
    train_mask[order] = pos_in_group < k[group]
    return train_mask, ~train_mask


def ser_label_split(raw: RawInteractions) -> Tuple[np.ndarray, np.ndarray]:
    """Leave-last-serendipitous-out (`generateSerData:328-338`): per user the LAST
    row with serLabel > 0.99 becomes the single test row; everything else trains."""
    if raw.ser_labels is None:
        raise ValueError("ser_label_split needs ser_labels")
    n = len(raw.users)
    order = np.lexsort((np.arange(n), raw.timestamps, raw.users))
    users_sorted = raw.users[order]
    starts = np.searchsorted(users_sorted, np.unique(users_sorted), side="left")
    ends = np.append(starts[1:], n)
    counts = ends - starts
    # vectorized last-positive-per-group: maximum sorted position among positive
    # rows of each user (-1 when none), then scatter that row into the mask
    pos_sorted = np.where(
        raw.ser_labels[order] > 0.99, np.arange(n), -1
    )
    last_pos = np.maximum.reduceat(pos_sorted, starts)
    last_pos = np.where(counts > 0, last_pos, -1)
    test_mask = np.zeros(n, bool)
    hit = last_pos[last_pos >= 0]
    test_mask[order[hit]] = True
    return ~test_mask, test_mask


def build_interactions(
    raw: RawInteractions,
    k_user: int = 10,
    k_item: int = 10,
    train_ratio: float = 0.8,
    use_ser_labels: bool = False,
) -> Tuple[Interactions, np.ndarray, np.ndarray]:
    """Full pipeline: k-core -> remap -> split -> Interactions (+ vocabularies)."""
    filtered = k_core(raw, k_user, k_item)
    remapped, uvocab, ivocab = remap_ids(filtered)
    if use_ser_labels:
        tr, te = ser_label_split(remapped)
    else:
        tr, te = temporal_split(remapped, train_ratio)
    inter = interactions_from_arrays(
        remapped.users[tr], remapped.items[tr],
        remapped.users[te], remapped.items[te],
        n_users=len(uvocab), n_items=len(ivocab),
        train_ratings=remapped.ratings[tr],
        train_timestamps=remapped.timestamps[tr],
        test_ser_labels=None
        if remapped.ser_labels is None
        else remapped.ser_labels[te],
    )
    from serendipity_tpu.data.datasets import derive_item_metadata

    derive_item_metadata(inter)
    return inter, uvocab, ivocab


# ---------------------------------------------------------------------------
# Raw-source parsers

def parse_amazon_reviews(path: str) -> RawInteractions:
    """Amazon-2013 review dump parser (capability of `parse_dataset` +
    `convert_to_dataframe`, `rating_data_process.py:391-436`): blank-line-separated
    blocks of `prefix/key: value` lines; extracts productId / userId / score / time.
    Malformed blocks are skipped (counted), matching the reference's errNum path."""
    users, items, ratings, times = [], [], [], []
    n_err = 0
    entry: Dict[str, str] = {}

    def flush():
        nonlocal n_err
        if not entry:
            return
        try:
            items.append(entry["productId"])
            users.append(entry["userId"])
            ratings.append(float(entry["score"]))
            times.append(int(entry["time"]))
        except (KeyError, ValueError):
            n_err += 1

    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line.strip():
                flush()
                entry = {}
                continue
            key, sep, value = line.partition(": ")
            if not sep or "/" not in key:
                n_err += 1
                continue
            entry[key.split("/", 1)[1]] = value
    flush()
    if n_err:
        print(f"parse_amazon_reviews: skipped {n_err} malformed fields/blocks")
    return RawInteractions(
        users=np.asarray(users),
        items=np.asarray(items),
        ratings=np.asarray(ratings),
        timestamps=np.asarray(times, dtype=np.float64),
    )


def parse_raw_csv(
    path: str,
    columns: Tuple[str, ...] = ("user_id", "item_id", "rating", "timestamp"),
    has_header: bool = False,
) -> RawInteractions:
    """Generic raw ratings CSV with a configurable column order — covers the
    reference's per-dataset layouts (`rating_data_process.py:444-504`: SerenLens
    `user,item,timestamp,review,rating,label`; Amazon `user,item,rating,timestamp`
    and `item,user,rating,timestamp` variants).

    Fast path: the native RFC4180 parser (`native/graphio.cpp
    stpu_parse_raw_csv`, vocabulary-encoded string ids) — the reference
    preprocesses multi-GB dumps, where row-by-row `csv.reader` is the
    bottleneck.  The Python reader below stays as the fallback and the
    differential cross-check (tests/test_native.py)."""
    from serendipity_tpu.utils.native import parse_raw_csv_native

    native = parse_raw_csv_native(path, columns, has_header, decode_strings=False)
    if native is not None:
        ucodes, icodes, ratings, times, labels, uvocab, ivocab = native
        return RawInteractions(
            users=ucodes, items=icodes, ratings=ratings, timestamps=times,
            ser_labels=labels, user_vocab=uvocab, item_vocab=ivocab,
        )
    return parse_raw_csv_python(path, columns, has_header)


def parse_raw_csv_python(
    path: str,
    columns: Tuple[str, ...] = ("user_id", "item_id", "rating", "timestamp"),
    has_header: bool = False,
) -> RawInteractions:
    """Pure-Python `csv.reader` implementation (fallback + differential check)."""
    import csv

    idx = {name: i for i, name in enumerate(columns)}
    users, items, ratings, times, labels = [], [], [], [], []
    has_label = "label" in idx
    with open(path, newline="") as f:
        reader = csv.reader(f)
        if has_header:
            next(reader, None)
        for row in reader:
            if len(row) < len(columns):
                continue
            users.append(row[idx["user_id"]])
            items.append(row[idx["item_id"]])
            ratings.append(float(row[idx["rating"]]) if "rating" in idx else 0.0)
            times.append(float(row[idx["timestamp"]]) if "timestamp" in idx else 0.0)
            if has_label:
                labels.append(float(row[idx["label"]]))
    return RawInteractions(
        users=np.asarray(users),
        items=np.asarray(items),
        ratings=np.asarray(ratings),
        timestamps=np.asarray(times),
        ser_labels=np.asarray(labels) if has_label else None,
    )


# ---------------------------------------------------------------------------
# Exports (the reference's on-disk formats)

def export_adjacency_lists(inter: Interactions, path: str) -> None:
    """train.txt / test.txt in the `uid i1 i2 ...` format."""
    os.makedirs(path, exist_ok=True)
    for fname, ptr, idx in (
        ("train.txt", inter.train_indptr, inter.train_indices),
        ("test.txt", inter.test_indptr, inter.test_indices),
    ):
        with open(os.path.join(path, fname), "w") as f:
            for u in range(inter.n_users):
                row = idx[ptr[u]:ptr[u + 1]]
                if len(row) == 0 and fname == "test.txt":
                    continue
                f.write(" ".join([str(u)] + [str(int(i)) for i in row]) + "\n")


def export_serendipity_csvs(
    inter: Interactions,
    path: str,
    uvocab: Optional[np.ndarray] = None,
    ivocab: Optional[np.ndarray] = None,
) -> None:
    """rating_train.csv / rating_test.csv / rating.csv / item.csv / user.csv with the
    `generateSerData` schema."""
    os.makedirs(path, exist_ok=True)
    has_ser = inter.test_ser_labels is not None

    def rows_of(ptr, idx, ratings, timestamps, labels):
        users = np.repeat(np.arange(inter.n_users), np.diff(ptr))
        r = ratings if ratings is not None else np.zeros(len(idx))
        t = timestamps if timestamps is not None else np.zeros(len(idx))
        out = [users, idx, r, t]
        if has_ser:
            out.append(labels if labels is not None else np.ones(len(idx)))
        return out

    header = "userInd,itemInd,rating,timestamp" + (",serLabel" if has_ser else "")

    def write(fname, cols):
        with open(os.path.join(path, fname), "w") as f:
            f.write(header + "\n")
            for row in zip(*cols):
                f.write(",".join(str(x) for x in row) + "\n")

    tr_cols = rows_of(
        inter.train_indptr, inter.train_indices,
        inter.train_ratings, inter.train_timestamps, None,
    )
    te_cols = rows_of(
        inter.test_indptr, inter.test_indices, None, None, inter.test_ser_labels
    )
    write("rating_train.csv", tr_cols)
    write("rating_test.csv", te_cols)
    write("rating.csv", [np.concatenate([a, b]) for a, b in zip(tr_cols, te_cols)])

    from serendipity_tpu.data.datasets import derive_item_metadata

    if inter.item_counts is None:
        derive_item_metadata(inter)
    with open(os.path.join(path, "item.csv"), "w") as f:
        f.write("itemInd,date,count,itemId\n")
        for i in range(inter.n_items):
            date = inter.item_dates[i] if inter.item_dates is not None else 0.0
            raw_id = ivocab[i] if ivocab is not None else i
            f.write(f"{i},{date},{inter.item_counts[i]},{raw_id}\n")
    with open(os.path.join(path, "user.csv"), "w") as f:
        f.write("num_item\n")
        for d in np.diff(inter.train_indptr):
            f.write(f"{d}\n")


def export_prone_graph(inter: Interactions, path: str) -> None:
    """ProNE edge list: `userInd itemInd+n_users` per train interaction
    (`serData2proNE`, `rating_data_process.py:97-109`)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    users, items = inter.train_user_item_pairs()
    with open(path, "w") as f:
        for u, i in zip(users, items):
            f.write(f"{u} {i + inter.n_users}\n")
