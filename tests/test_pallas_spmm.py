"""Banded-ELL Pallas kernel logic via interpret mode (CPU-runnable).

The compiled-on-TPU path is exercised by bench.py; these tests pin the
layout/packing/gather logic against scipy on CPU.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from krylov_robustness_tpu.ops.pallas_spmm import (
    BandedEllOperator,
    make_operator,
    rcm_bandwidth,
    rcm_permutation,
)


def banded_graph(n=700, seed=0, max_off=150, extra=300, weighted=True):
    rng = np.random.default_rng(seed)
    i = np.arange(n - 2)
    src = np.concatenate([i, rng.integers(0, n - max_off - 1, extra)])
    dst = np.concatenate(
        [i + 1, 0 * np.arange(extra)]
    )
    dst[n - 2:] = src[n - 2:] + rng.integers(1, max_off, extra)
    w = rng.uniform(0.5, 2.0, len(src)) if weighted else np.ones(len(src))
    A = sp.coo_matrix((w, (src, dst)), shape=(n, n))
    A = A + A.T
    A.setdiag(0)
    A = sp.csr_matrix(A)
    A.eliminate_zeros()
    return A


def test_banded_operator_matches_scipy_interpret():
    A = banded_graph()
    op = BandedEllOperator(A, dtype=jnp.float64, interpret=True)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((A.shape[0], 5))
    got = np.asarray(op @ jnp.asarray(x))
    np.testing.assert_allclose(got, A @ x, rtol=1e-12, atol=1e-12)


def test_banded_operator_spmv_vector():
    A = banded_graph(n=300, max_off=60, extra=100)
    op = BandedEllOperator(A, dtype=jnp.float64, interpret=True)
    x = np.random.default_rng(2).standard_normal(300)
    got = np.asarray(op @ jnp.asarray(x))
    np.testing.assert_allclose(got, A @ x, rtol=1e-12, atol=1e-12)
    assert got.shape == (300,)


def test_update_entry_values():
    A = banded_graph(n=256, max_off=40, extra=50)
    op = BandedEllOperator(A, dtype=jnp.float64, interpret=True)
    # zero the first two CSR entries (symmetric pair not required here)
    C = sp.coo_matrix(A)
    order = np.lexsort((C.col, C.row))
    e0, e1 = 0, 1
    op.update_entry_values(np.array([e0, e1]), np.array([0.0, 0.0]))
    A2 = A.copy().tolil()
    A2[C.row[order][e0], C.col[order][e0]] = 0.0
    A2[C.row[order][e1], C.col[order][e1]] = 0.0
    x = np.random.default_rng(3).standard_normal((256, 3))
    got = np.asarray(op @ jnp.asarray(x))
    np.testing.assert_allclose(got, sp.csr_matrix(A2) @ x, rtol=1e-12, atol=1e-12)


def test_make_operator_dispatch():
    # wide-bandwidth (random) graph must fall back to COO on any backend
    from helpers import random_graph

    A = random_graph(400, 0.05, seed=4)
    op, perm = make_operator(A, max_windows=3)
    from krylov_robustness_tpu.ops.sparse import CooMatrix

    assert isinstance(op, CooMatrix)
    np.testing.assert_array_equal(perm, np.arange(400))


def test_rcm_bandwidth_helper():
    A = banded_graph(n=500, max_off=80, extra=100)
    perm = rcm_permutation(A)
    bw = rcm_bandwidth(A, perm)
    assert 0 < bw <= rcm_bandwidth(A)
