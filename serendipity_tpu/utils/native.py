"""ctypes bindings for the native host runtime (`native/graphio.cpp`).

Builds the shared library on demand with g++ (no pybind11 in this image); every
entry point has a numpy fallback so the framework works without a toolchain.  The
native/Python pairs double as differential tests, mirroring the reference's dual
sampler/evaluator implementations (`code/utils.py:21-31`, `evaluator/__init__.py:2-7`).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libserendipity_native.so")
_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True,
            capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _load_failed = True
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    u8p = ctypes.POINTER(ctypes.c_uint8)

    lib.stpu_free.argtypes = [ctypes.c_void_p]
    lib.stpu_parse_adjacency.restype = ctypes.c_int64
    lib.stpu_parse_adjacency.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(i32p), ctypes.POINTER(i32p), i32p, i32p,
    ]
    lib.stpu_k_core.restype = ctypes.c_int64
    lib.stpu_k_core.argtypes = [
        i32p, i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, u8p,
    ]
    lib.stpu_build_csr.argtypes = [
        i32p, i32p, ctypes.c_int64, ctypes.c_int32, i64p, i32p,
    ]
    lib.stpu_sample_negatives.argtypes = [
        i64p, i32p, i32p, ctypes.c_int64, ctypes.c_int32, ctypes.c_uint64, i32p,
    ]
    lib.stpu_parse_rating_csv.restype = ctypes.c_int64
    lib.stpu_parse_rating_csv.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(i32p), ctypes.POINTER(i32p),
        ctypes.POINTER(f32p), ctypes.POINTER(f64p), ctypes.POINTER(f32p), i32p,
    ]
    cp = ctypes.POINTER(ctypes.c_char)
    lib.stpu_parse_raw_csv.restype = ctypes.c_int64
    lib.stpu_parse_raw_csv.argtypes = (
        [ctypes.c_char_p] + [ctypes.c_int32] * 7
        + [ctypes.POINTER(i32p), ctypes.POINTER(i32p),
           ctypes.POINTER(f64p), ctypes.POINTER(f64p), ctypes.POINTER(f64p)]
        + [ctypes.POINTER(cp), ctypes.POINTER(i64p), i64p] * 2
    )
    _lib = lib
    return _lib


def _as_np(ptr, n, dtype):
    arr = np.ctypeslib.as_array(ptr, shape=(n,)).copy()
    return arr.astype(dtype, copy=False)


def parse_adjacency(path: str) -> Optional[Tuple[np.ndarray, np.ndarray, int, int]]:
    """Native adjacency-list parse -> (users, items, max_user, max_item) or None."""
    lib = get_lib()
    if lib is None:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    up, ip = i32p(), i32p()
    mu, mi = ctypes.c_int32(), ctypes.c_int32()
    n = lib.stpu_parse_adjacency(
        path.encode(), ctypes.byref(up), ctypes.byref(ip),
        ctypes.byref(mu), ctypes.byref(mi),
    )
    if n < 0:
        return None
    users = _as_np(up, n, np.int32)
    items = _as_np(ip, n, np.int32)
    lib.stpu_free(up)
    lib.stpu_free(ip)
    return users, items, int(mu.value), int(mi.value)


def k_core_filter(
    users: np.ndarray, items: np.ndarray, n_users: int, n_items: int,
    k_user: int, k_item: int,
) -> np.ndarray:
    """Surviving-edge mask after iterative k-core peeling.  Native when available,
    numpy peeling otherwise (identical fixed point — order-independent)."""
    users = np.ascontiguousarray(users, np.int32)
    items = np.ascontiguousarray(items, np.int32)
    lib = get_lib()
    if lib is not None:
        keep = np.zeros(len(users), np.uint8)
        lib.stpu_k_core(
            users.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            items.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(users), n_users, n_items, k_user, k_item,
            keep.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return keep.astype(bool)
    keep = np.ones(len(users), bool)
    while True:
        du = np.bincount(users[keep], minlength=n_users)
        di = np.bincount(items[keep], minlength=n_items)
        bad = keep & ((du[users] < k_user) | (di[items] < k_item))
        if not bad.any():
            return keep
        keep &= ~bad


def sample_negatives_host(
    indptr: np.ndarray, indices: np.ndarray, users: np.ndarray,
    n_items: int, seed: int,
) -> Optional[np.ndarray]:
    """Exact rejection sampling on the host (cross-check for the device sampler)."""
    lib = get_lib()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    users = np.ascontiguousarray(users, np.int32)
    out = np.zeros(len(users), np.int32)
    lib.stpu_sample_negatives(
        indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        users.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(users), n_items, seed,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out


def build_csr(
    rows: np.ndarray, cols: np.ndarray, n_rows: int
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    lib = get_lib()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    indptr = np.zeros(n_rows + 1, np.int64)
    indices = np.zeros(len(rows), np.int32)
    lib.stpu_build_csr(
        rows.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cols.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(rows), n_rows,
        indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return indptr, indices


def parse_raw_csv_native(path: str, columns, has_header: bool,
                         decode_strings: bool = True):
    """Native generic raw-CSV parse (string ids, RFC4180 quoting) or None.

    Returns (users, items, ratings, timestamps, labels_or_None) with users/items
    as numpy unicode arrays — the exact column contents `csv.reader` would
    produce, reconstructed as vocab[codes] (first-appearance-order vocabulary
    built in C).  Differential cross-check: `data/preprocess.parse_raw_csv`'s
    pure-Python reader (tests/test_native.py).

    `decode_strings=False` skips the per-row string reconstruction and returns
    (user_codes i64, item_codes i64, ratings, timestamps, labels, user_vocab,
    item_vocab) — the form multi-GB ingestion should use
    (`data/preprocess.RawInteractions` encoded representation)."""
    lib = get_lib()
    if lib is None:
        return None
    idx = {name: i for i, name in enumerate(columns)}
    if "user_id" not in idx or "item_id" not in idx:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f64p = ctypes.POINTER(ctypes.c_double)
    cp = ctypes.POINTER(ctypes.c_char)
    uc, ic = i32p(), i32p()
    rp, tp, lp = f64p(), f64p(), f64p()
    ub, ib = cp(), cp()
    uo, io_ = i64p(), i64p()
    nu, ni = ctypes.c_int64(), ctypes.c_int64()
    n = lib.stpu_parse_raw_csv(
        path.encode(), 1 if has_header else 0, len(columns),
        idx["user_id"], idx["item_id"],
        idx.get("rating", -1), idx.get("timestamp", -1), idx.get("label", -1),
        ctypes.byref(uc), ctypes.byref(ic),
        ctypes.byref(rp), ctypes.byref(tp), ctypes.byref(lp),
        ctypes.byref(ub), ctypes.byref(uo), ctypes.byref(nu),
        ctypes.byref(ib), ctypes.byref(io_), ctypes.byref(ni),
    )
    if n < 0:
        return None

    def vocab(buf_p, off_p, count):
        offs = np.ctypeslib.as_array(off_p, shape=(count + 1,))
        total = int(offs[count])
        raw = ctypes.string_at(buf_p, total)
        # '<U' array directly: fancy-indexing it below then yields the final
        # unicode column as one memcpy pass (np.asarray(list-of-str) dtype,
        # matching the Python reader's arrays)
        return np.asarray(
            [raw[offs[i]:offs[i + 1]].decode("utf-8", "surrogateescape")
             for i in range(count)]
        )

    ucodes = _as_np(uc, n, np.int64)
    icodes = _as_np(ic, n, np.int64)
    uvocab = vocab(ub, uo, int(nu.value))
    ivocab = vocab(ib, io_, int(ni.value))
    ratings = _as_np(rp, n, np.float64)
    ts = _as_np(tp, n, np.float64)
    labels = _as_np(lp, n, np.float64) if "label" in idx else None
    for p in (uc, ic, rp, tp, lp, ub, uo, ib, io_):
        lib.stpu_free(p)
    if not decode_strings:
        return ucodes, icodes, ratings, ts, labels, uvocab, ivocab
    users = uvocab[ucodes] if n else np.asarray([], dtype=str)
    items = ivocab[icodes] if n else np.asarray([], dtype=str)
    return users, items, ratings, ts, labels


def parse_rating_csv(path: str):
    """Native CSV parse -> dict of columns or None."""
    lib = get_lib()
    if lib is None:
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    up, ip = i32p(), i32p()
    rp, sp = f32p(), f32p()
    tp = f64p()
    has_ser = ctypes.c_int32()
    n = lib.stpu_parse_rating_csv(
        path.encode(), ctypes.byref(up), ctypes.byref(ip), ctypes.byref(rp),
        ctypes.byref(tp), ctypes.byref(sp), ctypes.byref(has_ser),
    )
    if n < 0:
        return None
    out = {
        "userInd": _as_np(up, n, np.int64),
        "itemInd": _as_np(ip, n, np.int64),
        "rating": _as_np(rp, n, np.float64),
        "timestamp": _as_np(tp, n, np.float64),
    }
    if has_ser.value:
        out["serLabel"] = _as_np(sp, n, np.float64)
    for p in (up, ip, rp, tp, sp):
        lib.stpu_free(p)
    return out
