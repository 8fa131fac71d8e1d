"""Norm estimators for sparse operators.

Replaces the reference's ``normAm`` (``functions/normAm.m``) and MATLAB's
``normest`` 2-norm power iteration. All run on device with static-shape
iteration (``lax.while_loop``), returning scalars.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def norm1(A) -> jax.Array:
    """Exact 1-norm (max abs column sum) of a sparse matrix."""
    colsum = jax.ops.segment_sum(jnp.abs(A.vals), A.cols, num_segments=A.n)
    return jnp.max(colsum)


def norm_inf_rowsum(x: jax.Array) -> jax.Array:
    """MATLAB ``norm(B, inf)`` for a block vector: max row sum of abs."""
    if x.ndim == 1:
        return jnp.max(jnp.abs(x))
    return jnp.max(jnp.sum(jnp.abs(x), axis=1))


def normAm_nonneg(A, m: int) -> jax.Array:
    """‖A^m‖₁ — exact for elementwise-nonnegative A via m chained transposed
    products on the ones vector (``functions/normAm.m:17-23``). For general A
    call with |A| to obtain an upper bound (conservative for Taylor-degree
    selection, hence still correct).
    """
    e = jnp.ones((A.n,), A.dtype)

    def body(_, e):
        # A is symmetric in all our uses; A^T e == A e. For generality the
        # caller should pass A^T when asymmetric.
        return A @ e

    e = jax.lax.fori_loop(0, m, body, e)
    return jnp.max(e)


def normest2(A, tol: float = 1e-2, max_iter: int = 100) -> jax.Array:
    """2-norm estimate via power iteration on the symmetric operator —
    device-side replacement for MATLAB ``normest(A, tol)`` used by the test
    drivers (``Tests/test_unweighted_break.m:56``) and the continuous
    objective (``functions/fun_and_grad_krylov_exp.m:27``).
    """
    # MATLAB normest starts from the column-sum vector x = sum(abs(A))'.
    x = jax.ops.segment_sum(jnp.abs(A.vals), A.cols, num_segments=A.n)

    def cond(carry):
        it, e, e0, x = carry
        return jnp.logical_and(it < max_iter, jnp.abs(e - e0) > tol * e)

    def body(carry):
        it, e, e0, x = carry
        e0 = e
        Ax = A @ x
        nrm = jnp.linalg.norm(Ax)
        x = jnp.where(nrm > 0, Ax / nrm, Ax)
        e = jnp.linalg.norm(A @ x) / jnp.maximum(jnp.linalg.norm(x), 1e-300)
        return (it + 1, e, e0, x)

    e = jnp.linalg.norm(x)
    nx = jnp.maximum(e, 1e-300)
    x = x / nx
    it, e, _, _ = jax.lax.while_loop(cond, body, (0, e, jnp.zeros_like(e), x))
    return e


def normest2_host(A_scipy, tol: float = 1e-2) -> float:
    """Host-side 2-norm estimate (scipy eigsh) — MATLAB normest counterpart
    for TPU sessions where a device program is not worth the compile."""
    import numpy as np
    import scipy.sparse.linalg as spla

    import scipy.sparse as sp

    A = sp.csr_matrix(A_scipy).astype(np.float64)
    w = spla.eigsh(A, k=1, which="LM", return_eigenvectors=False,
                   tol=max(tol * 1e-2, 1e-10))
    return float(abs(w[0]))
