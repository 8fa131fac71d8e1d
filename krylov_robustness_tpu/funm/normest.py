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


def normest1_power(matvec, n: int, m: int = 1, t: int = 2,
                   itmax: int = 5, seed: int = 0) -> float:
    """Block 1-norm estimate of ‖B^m‖₁ for the operator ``matvec: X → B X``
    (Higham & Tisseur 2000) — the general-matrix branch of the reference's
    ``functions/normAm.m:25-51`` (MATLAB ``normest1`` with the ``afun_power``
    callback). Used when B has mixed signs, where the |B|-product bound of
    :func:`normAm_nonneg` would inflate the Taylor degree.

    B must be real symmetric (all operators in this codebase are), so the
    transposed products of the reference callback reuse ``matvec``. Host-side
    numpy: degree planning is a host-side activity (see ``funm/expmv.py``)
    and the iteration count is tiny (≤ itmax block products of width t).
    """
    import numpy as np

    def power(X):
        for _ in range(m):
            X = matvec(X)
        return X

    rng = np.random.default_rng(seed)
    X = np.ones((n, t), dtype=np.float64)
    if t > 1:
        X[:, 1:] = rng.choice([-1.0, 1.0], size=(n, t - 1))
        # deduplicate parallel sign columns
        for j in range(1, t):
            while any(
                abs(X[:, j] @ X[:, i]) == n for i in range(j)
            ):
                X[:, j] = rng.choice([-1.0, 1.0], size=n)
    X /= n

    est_old = 0.0
    ind_best = 0
    ind_hist: set[int] = set()
    S = np.zeros((n, t))
    est = 0.0
    # unit-vector index behind each current X column; None on the first
    # iteration, whose start block is the averaged ones/sign columns
    # (MATLAB normest1's k=1 special case)
    col_src: "np.ndarray | None" = None
    for k in range(1, itmax + 1):
        Y = power(X)
        sums = np.sum(np.abs(Y), axis=0)
        j = int(np.argmax(sums))
        est = float(sums[j])
        if est > est_old or k == 2:
            ind_best = j if col_src is None else int(col_src[j])
        if k >= 2 and est <= est_old:
            est = est_old
            break
        est_old = est
        S_old = S
        S = np.sign(Y)
        S[S == 0] = 1.0
        if t > 1:
            # every column of S parallel to one of S_old → converged
            if np.all(np.any(np.abs(S_old.T @ S) == n, axis=0)):
                break
            # replace columns parallel to earlier/new ones by random signs
            for j2 in range(t):
                while any(
                    abs(S[:, j2] @ S[:, i]) == n for i in range(j2)
                ) or np.any(np.abs(S_old.T @ S[:, j2]) == n):
                    S[:, j2] = rng.choice([-1.0, 1.0], size=n)
        Z = power(S)  # B symmetric: Bᵀ S = B S
        h = np.max(np.abs(Z), axis=1)
        if k >= 2 and float(np.max(h)) == float(h[ind_best]):
            break
        ind = np.argsort(-h, kind="stable")
        if t > 1:
            if set(map(int, ind[:t])) <= ind_hist:
                break
            fresh = [int(i) for i in ind if int(i) not in ind_hist][:t]
            ind = np.asarray(fresh + [int(i) for i in ind[:t]], dtype=int)[:t]
        else:
            ind = ind[:t]
        X = np.zeros((n, t))
        for j2, i in enumerate(ind[:t]):
            X[int(i), j2] = 1.0
        col_src = np.asarray(ind[:t], dtype=int)
        ind_hist.update(int(i) for i in ind[:t])
    return est


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
