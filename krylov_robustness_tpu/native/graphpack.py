"""ctypes bindings for the native graph-packing runtime (graphpack.cpp).

Builds the shared library on first use with g++ (cached next to the source);
every entry point has a NumPy fallback so the framework works without a
toolchain. Use :func:`available` to check which path is active.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "graphpack.cpp"
_SO = _HERE / "libgraphpack.so"  # lib- prefix: must not shadow this module at import
_LIB = None
_TRIED = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             str(_SRC), "-o", str(_SO)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    i64 = ctypes.c_int64
    p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C")
    p_i32 = np.ctypeslib.ndpointer(np.int32, flags="C")
    p_f64 = np.ctypeslib.ndpointer(np.float64, flags="C")
    lib.pack_ell.restype = i64
    lib.pack_ell.argtypes = [p_i64, p_i32, p_f64, i64, i64, i64, p_i32, p_f64]
    lib.pack_banded.restype = i64
    lib.pack_banded.argtypes = [
        p_i64, p_i32, p_f64, i64, i64, i64, i64, i64,
        p_i32, p_i32, p_f64, p_i64, p_i64,
    ]
    lib.symmetrize_binarize.restype = i64
    lib.symmetrize_binarize.argtypes = [p_i32, p_i32, i64, i64, p_i32, p_i32, i64]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def pack_ell(A_csr, n_pad: int, K: int):
    """CSR -> (cols (n_pad, K) int32, vals (n_pad, K) f64)."""
    import scipy.sparse as sp

    A = sp.csr_matrix(A_csr)
    A.sort_indices()
    n = A.shape[0]
    cols = np.zeros((n_pad, K), np.int32)
    vals = np.zeros((n_pad, K), np.float64)
    lib = _load()
    if lib is not None:
        r = lib.pack_ell(
            A.indptr.astype(np.int64), A.indices.astype(np.int32),
            A.data.astype(np.float64), n, n_pad, K,
            cols.reshape(-1), vals.reshape(-1),
        )
        if r >= 0:
            return cols, vals
    # NumPy fallback
    deg = np.diff(A.indptr)
    if deg.max(initial=0) > K:
        raise ValueError("K smaller than max degree")
    C = sp.coo_matrix(A)
    order = np.lexsort((C.col, C.row))
    rows = C.row[order]
    ks = np.arange(A.nnz) - A.indptr[rows]
    cols[rows, ks] = C.col[order].astype(np.int32)
    vals[rows, ks] = C.data[order]
    return cols, vals


def pack_banded(A_csr, n_lanes: int, K: int, Wv: int, num_windows: int):
    """CSR -> banded-ELL tables (rel, win, val slot-major (K, n_lanes)) plus
    per-entry (slot, row) positions. Raises if an entry's window is out of
    range (bandwidth inconsistent with Wv)."""
    import scipy.sparse as sp

    A = sp.csr_matrix(A_csr)
    A.sort_indices()
    n = A.shape[0]
    rel = np.tile((np.arange(n_lanes) % 128).astype(np.int32), (K, 1))
    win = np.full((K, n_lanes), Wv, np.int32)
    val = np.zeros((K, n_lanes), np.float64)
    entry_slot = np.zeros(A.nnz, np.int64)
    entry_row = np.zeros(A.nnz, np.int64)
    lib = _load()
    if lib is not None:
        r = lib.pack_banded(
            A.indptr.astype(np.int64), A.indices.astype(np.int32),
            A.data.astype(np.float64), n, n_lanes, K, Wv, num_windows,
            rel.reshape(-1), win.reshape(-1), val.reshape(-1),
            entry_slot, entry_row,
        )
        if r < 0:
            raise ValueError("window id out of range (bandwidth vs Wv)")
        return rel, win, val, entry_slot, entry_row
    # NumPy fallback
    C = sp.coo_matrix(A)
    order = np.lexsort((C.col, C.row))
    rows = C.row[order]
    cols = C.col[order]
    data = C.data[order]
    ks = np.arange(A.nnz) - A.indptr[rows]
    ws = (cols // 128 - rows // 128 + Wv).astype(np.int64)
    if A.nnz and (ws.min() < 0 or ws.max() >= num_windows):
        raise ValueError("window id out of range (bandwidth vs Wv)")
    rel[ks, rows] = (cols % 128).astype(np.int32)
    win[ks, rows] = ws.astype(np.int32)
    val[ks, rows] = data
    return rel, win, val, ks.astype(np.int64), rows.astype(np.int64)


def symmetrize_binarize_coo(rows: np.ndarray, cols: np.ndarray, n: int):
    """Union of (r,c),(c,r) with r != c, deduplicated, value 1 — the native
    path behind graphs.preprocess.symmetrize_binarize."""
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    lib = _load()
    if lib is not None:
        cap = 2 * len(rows)
        out_r = np.zeros(cap, np.int32)
        out_c = np.zeros(cap, np.int32)
        m = lib.symmetrize_binarize(rows, cols, len(rows), n, out_r, out_c, cap)
        if m >= 0:
            return out_r[:m], out_c[:m]
    r2 = np.concatenate([rows, cols])
    c2 = np.concatenate([cols, rows])
    keep = r2 != c2
    pairs = np.unique(
        np.stack([r2[keep], c2[keep]], axis=1), axis=0
    )
    return pairs[:, 0].astype(np.int32), pairs[:, 1].astype(np.int32)
