"""ctypes bindings for the native C++ helpers, with pure-Python fallbacks.

``edit_distance(a, b)`` computes Levenshtein distance between two token
sequences (lists of hashable items). Dispatches to the C++ library built by
``python -m p4fr_tpu.native.build`` when present; otherwise a NumPy DP
fallback keeps everything functional (just slower).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Sequence

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_HERE, "libp4fr_editdistance.so")

_lib = None
_lib_checked = False


def _get_lib():
    """Lazily load the shared library (it may be built after import)."""
    global _lib, _lib_checked
    if _lib is None and not _lib_checked and os.path.exists(_LIB_PATH):
        _lib_checked = True
        try:
            lib = ctypes.CDLL(_LIB_PATH)
            lib.p4fr_edit_distance.restype = ctypes.c_int64
            lib.p4fr_edit_distance.argtypes = [
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
            ]
            lib.p4fr_edit_distance_batch.restype = None
            lib.p4fr_edit_distance_batch.argtypes = [
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int64),
                ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64),
            ]
            _lib = lib
        except OSError:
            _lib = None
    return _lib


def native_available() -> bool:
    return _get_lib() is not None


def _intern_ids(*seqs: Sequence) -> List[np.ndarray]:
    """Map arbitrary hashable tokens to int64 ids shared across sequences."""
    table = {}
    out = []
    for seq in seqs:
        ids = np.empty(len(seq), dtype=np.int64)
        for i, tok in enumerate(seq):
            ids[i] = table.setdefault(tok, len(table))
        out.append(ids)
    return out


def _edit_distance_py(a: np.ndarray, b: np.ndarray) -> int:
    """Vectorized NumPy DP fallback (row-at-a-time Levenshtein).

    Deletion/substitution are computed elementwise; the insertion chain
    row[j] = min(row[j-1]+1, tmp[j]) is resolved in closed form as
    row[j] = j + min(i, min_{k<=j}(tmp[k]-k)) via minimum.accumulate.
    """
    n, m = len(a), len(b)
    if n == 0:
        return m
    if m == 0:
        return n
    ar = np.arange(m + 1, dtype=np.int64)
    prev = ar.copy()
    for i in range(1, n + 1):
        tmp = np.minimum(prev[1:] + 1, prev[:-1] + (b != a[i - 1]))
        c = np.minimum.accumulate(np.concatenate(([np.int64(i)], tmp - ar[1:])))
        prev = c + ar
    return int(prev[m])


def edit_distance(a: Sequence, b: Sequence) -> int:
    """Levenshtein distance between two token sequences."""
    ids_a, ids_b = _intern_ids(a, b)
    _lib = _get_lib()
    if _lib is not None:
        pa = ids_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        pb = ids_b.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))
        return int(_lib.p4fr_edit_distance(pa, len(ids_a), pb, len(ids_b)))
    return _edit_distance_py(ids_a, ids_b)


def edit_distance_batch(pairs: Sequence) -> np.ndarray:
    """Distances for a batch of (seq_a, seq_b) pairs as an int64 array."""
    _lib = _get_lib()
    if _lib is None or not pairs:
        return np.array([edit_distance(a, b) for a, b in pairs], dtype=np.int64)
    a_ids, b_ids = [], []
    for a, b in pairs:
        ia, ib = _intern_ids(a, b)
        a_ids.append(ia)
        b_ids.append(ib)
    a_flat = np.concatenate(a_ids) if a_ids else np.empty(0, np.int64)
    b_flat = np.concatenate(b_ids) if b_ids else np.empty(0, np.int64)
    a_lens = np.array([len(x) for x in a_ids], dtype=np.int64)
    b_lens = np.array([len(x) for x in b_ids], dtype=np.int64)
    out = np.empty(len(pairs), dtype=np.int64)
    as_p = lambda arr: arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))  # noqa: E731
    _lib.p4fr_edit_distance_batch(
        as_p(a_flat), as_p(a_lens), as_p(b_flat), as_p(b_lens), len(pairs), as_p(out)
    )
    return out
