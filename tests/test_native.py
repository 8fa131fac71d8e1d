"""Native graph-packing runtime vs NumPy fallback."""

import numpy as np
import scipy.sparse as sp

from helpers import random_graph
from krylov_robustness_tpu.native import graphpack


def test_native_builds():
    # g++ is baked into the image; the native path should be active
    assert graphpack.available()


def test_pack_ell_matches_fallback():
    A = random_graph(200, 0.05, seed=1, weighted=True)
    K = int(np.diff(A.indptr).max())
    cols_n, vals_n = graphpack.pack_ell(A, 208, K)
    # force fallback
    lib = graphpack._LIB
    graphpack._LIB = None
    graphpack._TRIED = True
    try:
        cols_f, vals_f = graphpack.pack_ell(A, 208, K)
    finally:
        graphpack._LIB = lib
    np.testing.assert_array_equal(cols_n, cols_f)
    np.testing.assert_array_equal(vals_n, vals_f)


def test_pack_banded_matches_fallback():
    n = 400
    rng = np.random.default_rng(2)
    i = np.arange(n - 1)
    src = np.concatenate([i, rng.integers(0, n - 60, 150)])
    dst = np.concatenate([i + 1, 0 * np.arange(150)])
    dst[n - 1:] = src[n - 1:] + rng.integers(1, 59, 150)
    A = sp.coo_matrix((rng.uniform(0.5, 2, len(src)), (src, dst)), shape=(n, n))
    A = sp.csr_matrix(A + A.T)
    K = int(np.diff(A.indptr).max())
    n_lanes = 512
    Wv = 2
    nw = 2 * Wv + 1
    out_n = graphpack.pack_banded(A, n_lanes, K, Wv, nw)
    lib = graphpack._LIB
    graphpack._LIB = None
    try:
        out_f = graphpack.pack_banded(A, n_lanes, K, Wv, nw)
    finally:
        graphpack._LIB = lib
    for a, b in zip(out_n, out_f):
        np.testing.assert_array_equal(a, b)


def test_symmetrize_matches_fallback():
    rng = np.random.default_rng(3)
    rows = rng.integers(0, 100, 500).astype(np.int32)
    cols = rng.integers(0, 100, 500).astype(np.int32)
    r_n, c_n = graphpack.symmetrize_binarize_coo(rows, cols, 100)
    lib = graphpack._LIB
    graphpack._LIB = None
    try:
        r_f, c_f = graphpack.symmetrize_binarize_coo(rows, cols, 100)
    finally:
        graphpack._LIB = lib
    np.testing.assert_array_equal(r_n, r_f)
    np.testing.assert_array_equal(c_n, c_f)
    assert np.all(r_n != c_n)
