"""BSR 128x128 MXU kernel logic via interpret mode (CPU-runnable).

The compiled-on-TPU path is exercised by bench.py; these tests pin the
block packing / scalar-prefetch index-map / accumulation logic against scipy.
"""

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

from helpers import random_graph
from krylov_robustness_tpu.ops.pallas_bsr import (
    BsrOperator,
    bsr_block_count,
    make_bsr_operator,
    pack_bsr,
)
from test_pallas_spmm import banded_graph


def test_bsr_matches_scipy_interpret():
    A = banded_graph()
    op = BsrOperator(A, dtype=jnp.float64, interpret=True)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((A.shape[0], 5))
    got = np.asarray(op @ jnp.asarray(x))
    np.testing.assert_allclose(got, A @ x, rtol=1e-12, atol=1e-12)


def test_bsr_spmv_vector_and_nonmultiple_n():
    A = banded_graph(n=333, max_off=60, extra=100)  # n % 128 != 0
    op = BsrOperator(A, dtype=jnp.float64, interpret=True)
    x = np.random.default_rng(2).standard_normal(333)
    got = np.asarray(op @ jnp.asarray(x))
    np.testing.assert_allclose(got, A @ x, rtol=1e-12, atol=1e-12)
    assert got.shape == (333,)


def test_bsr_update_entry_values():
    A = banded_graph(n=256, max_off=40, extra=50)
    op = BsrOperator(A, dtype=jnp.float64, interpret=True)
    C = sp.coo_matrix(sp.csr_matrix(A))
    order = np.lexsort((C.col, C.row))
    e0, e1 = 0, 5
    op.update_entry_values(np.array([e0, e1]), np.array([0.0, 7.5]))
    A2 = A.copy().tolil()
    A2[C.row[order][e0], C.col[order][e0]] = 0.0
    A2[C.row[order][e1], C.col[order][e1]] = 7.5
    x = np.random.default_rng(3).standard_normal((256, 3))
    got = np.asarray(op @ jnp.asarray(x))
    np.testing.assert_allclose(got, sp.csr_matrix(A2) @ x, rtol=1e-12,
                               atol=1e-12)


def test_bsr_set_edge_symmetric():
    A = banded_graph(n=256, max_off=40, extra=50, weighted=False)
    op = BsrOperator(A, dtype=jnp.float64, interpret=True)
    C = sp.coo_matrix(sp.tril(A, -1))
    i, j = int(C.row[0]), int(C.col[0])
    op.set_edge(i, j, 0.0)
    A2 = A.copy().tolil()
    A2[i, j] = A2[j, i] = 0.0
    x = np.random.default_rng(4).standard_normal((256, 2))
    got = np.asarray(op @ jnp.asarray(x))
    np.testing.assert_allclose(got, sp.csr_matrix(A2) @ x, rtol=1e-12,
                               atol=1e-12)


def test_pack_covers_every_row_block():
    n = 260  # n_pad = 384 → row blocks {0, 1, 2}; block 2 is all padding
    A = banded_graph(n=n, max_off=30, extra=40)
    ablocks, cb, rb, first, eb, eo = pack_bsr(sp.csr_matrix(A))
    assert set(rb.tolist()) == {0, 1, 2}  # zero diag block inserted for 2
    assert int(first.sum()) == 3  # exactly one first-of-row flag per block row


def test_block_count_and_dispatch():
    A = random_graph(400, 0.05, seed=4)
    nblk = bsr_block_count(A)
    assert nblk >= 1
    # tiny budget forces the COO fallback
    op, perm = make_bsr_operator(A, max_storage_bytes=1)
    from krylov_robustness_tpu.ops.sparse import CooMatrix

    assert isinstance(op, CooMatrix)
    # generous budget gives the BSR operator and a real permutation
    op2, perm2 = make_bsr_operator(A, interpret=True)
    assert isinstance(op2, BsrOperator)
    x = np.random.default_rng(5).standard_normal((400, 3))
    Ap = sp.csr_matrix(A)[perm2, :].tocsc()[:, perm2].tocsr()
    np.testing.assert_allclose(
        np.asarray(op2 @ jnp.asarray(x)), Ap @ x, rtol=1e-5, atol=1e-5
    )
