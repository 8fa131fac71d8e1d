"""Sparse container + SpMM golden tests vs scipy."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax.numpy as jnp

from krylov_robustness_tpu.ops.sparse import CooMatrix, EllMatrix


from helpers import random_graph


@pytest.mark.parametrize("layout", ["coo", "ell"])
@pytest.mark.parametrize("n,density", [(50, 0.1), (200, 0.02), (333, 0.05)])
def test_spmm_matches_scipy(layout, n, density):
    A = random_graph(n, density, seed=n, weighted=True)
    M = (
        CooMatrix.from_scipy(A)
        if layout == "coo"
        else EllMatrix.from_scipy(A)
    )
    rng = np.random.default_rng(1)
    X = rng.standard_normal((n, 7))
    got = np.asarray(M @ jnp.asarray(X))
    want = A @ X
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_spmv_vector_shape():
    A = random_graph(64, 0.1, seed=3)
    M = CooMatrix.from_scipy(A)
    x = np.ones(64)
    y = np.asarray(M @ jnp.asarray(x))
    np.testing.assert_allclose(y, A @ x, rtol=1e-12)
    assert y.shape == (64,)


def test_dense_roundtrip():
    A = random_graph(40, 0.15, seed=7, weighted=True)
    M = CooMatrix.from_scipy(A)
    np.testing.assert_allclose(np.asarray(M.todense()), A.toarray(), rtol=1e-12)
    back = M.to_scipy()
    assert (back != A).nnz == 0


def test_ell_padding_efficiency():
    A = random_graph(100, 0.05, seed=11)
    M = EllMatrix.from_scipy(A)
    assert 0 < M.padding_efficiency <= 1.0
    assert M.nnz == A.nnz
