"""Node centralities (reference ``functions/compute_centrality.m``).

'eig' (the only one the paper drivers use, ``Tests/test_unweighted_break.m:63``)
runs as device-side power iteration; the others mirror the reference options.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def eig_centrality(A, tol: float = 1e-10, max_iter: int = 2000) -> jax.Array:
    """|dominant eigenvector| via power iteration (``compute_centrality.m:15-17``)."""
    n = A.n

    def cond(carry):
        it, x, lam, lam0 = carry
        return jnp.logical_and(it < max_iter, jnp.abs(lam - lam0) > tol * jnp.abs(lam))

    def body(carry):
        it, x, lam, lam0 = carry
        y = A @ x
        lam_new = jnp.linalg.norm(y)
        y = y / jnp.maximum(lam_new, 1e-300)
        return (it + 1, y, lam_new, lam)

    x0 = jnp.ones((n,), A.dtype) / jnp.sqrt(n)
    _, x, lam, _ = jax.lax.while_loop(
        cond, body, (0, x0, jnp.asarray(1.0, A.dtype), jnp.asarray(0.0, A.dtype))
    )
    return jnp.abs(x)


def degree_centrality(A) -> jax.Array:
    """Row sums (``compute_centrality.m:18-19``)."""
    return jax.ops.segment_sum(A.vals, A.rows, num_segments=A.n)


def pagerank_centrality(A, alpha: float = 0.85, tol: float = 1e-12,
                        max_iter: int = 1000) -> jax.Array:
    """PageRank dominant eigenvector (``compute_centrality.m:20-26``)."""
    n = A.n
    deg = degree_centrality(A)
    inv_deg = jnp.where(deg > 0, 1.0 / deg, 0.0)

    def op(x):
        return alpha * (A @ (inv_deg * x)) + (1 - alpha) * jnp.sum(x) / n

    def cond(carry):
        it, x, diff = carry
        return jnp.logical_and(it < max_iter, diff > tol)

    def body(carry):
        it, x, _ = carry
        y = op(x)
        y = y / jnp.linalg.norm(y)
        return (it + 1, y, jnp.linalg.norm(y - x))

    x0 = jnp.ones((n,), A.dtype) / n
    _, x, _ = jax.lax.while_loop(cond, body, (0, x0, jnp.asarray(jnp.inf, A.dtype)))
    return jnp.abs(x)


def exp_centrality_dense(A_dense: jax.Array) -> jax.Array:
    """diag(expm(A)) via eigh — small-n path (``compute_centrality.m:10``)."""
    w, V = jnp.linalg.eigh((A_dense + A_dense.T) / 2)
    return jnp.einsum("ij,j,ij->i", V, jnp.exp(w), V)


def resolvent_centrality(A, tol: float = 1e-10, max_iter: int = 500) -> jax.Array:
    """Katz resolvent (I − αA)⁻¹·1 with α = 1/(2ρ) — the reference variant
    has a latent bug (undefined n, ``compute_centrality.m:11-14``); here it is
    implemented correctly via the Neumann/CG-free fixed-point x = 1 + αA x."""
    rho = eig_spectral_radius(A)
    alpha = 1.0 / (2.0 * rho)
    ones = jnp.ones((A.n,), A.dtype)

    def cond(carry):
        it, x, diff = carry
        return jnp.logical_and(it < max_iter, diff > tol)

    def body(carry):
        it, x, _ = carry
        y = ones + alpha * (A @ x)
        return (it + 1, y, jnp.linalg.norm(y - x) / jnp.linalg.norm(y))

    _, x, _ = jax.lax.while_loop(cond, body, (0, ones, jnp.asarray(jnp.inf, A.dtype)))
    return x


def eig_spectral_radius(A, tol: float = 1e-8, max_iter: int = 2000) -> jax.Array:
    n = A.n

    def cond(carry):
        it, x, lam, lam0 = carry
        return jnp.logical_and(it < max_iter, jnp.abs(lam - lam0) > tol * jnp.abs(lam))

    def body(carry):
        it, x, lam, lam0 = carry
        y = A @ x
        lam_new = jnp.linalg.norm(y)
        return (it + 1, y / jnp.maximum(lam_new, 1e-300), lam_new, lam)

    x0 = jnp.ones((n,), A.dtype) / jnp.sqrt(n)
    _, _, lam, _ = jax.lax.while_loop(
        cond, body, (0, x0, jnp.asarray(1.0, A.dtype), jnp.asarray(0.0, A.dtype))
    )
    return lam


def compute_centrality(A, kind: str = "eig") -> np.ndarray:
    """Dispatcher matching ``compute_centrality.m``; returns host array for
    the host-side candidate selection."""
    if kind == "eig":
        c = eig_centrality(A)
    elif kind == "deg":
        c = degree_centrality(A)
    elif kind == "pr":
        c = pagerank_centrality(A)
    elif kind == "res":
        c = resolvent_centrality(A)
    elif kind == "exp":
        c = exp_centrality_dense(A.todense())
    else:
        c = eig_centrality(A)
    return np.asarray(c)


def compute_centrality_host(A_scipy, kind: str = "eig") -> np.ndarray:
    """Host-side (scipy) centralities — same semantics as
    :func:`compute_centrality`, used on TPU where tiny eigen-iterations are
    not worth a device program (remote-compile latency dominates)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    A = sp.csr_matrix(A_scipy).astype(np.float64)
    n = A.shape[0]
    if kind in ("eig", ""):
        w, v = spla.eigsh(A, k=1, which="LA")
        return np.abs(v[:, 0])
    if kind == "deg":
        return np.asarray(A.sum(axis=1)).ravel()
    if kind == "pr":
        alpha = 0.85
        deg = np.asarray(A.sum(axis=1)).ravel()
        inv = np.where(deg > 0, 1.0 / deg, 0.0)
        x = np.full(n, 1.0 / n)
        for _ in range(1000):
            y = alpha * (A @ (inv * x)) + (1 - alpha) * x.sum() / n
            y /= np.linalg.norm(y)
            if np.linalg.norm(y - x) < 1e-12:
                x = y
                break
            x = y
        return np.abs(x)
    if kind == "res":
        rho = np.abs(spla.eigsh(A, k=1, return_eigenvectors=False))[0]
        alpha = 1.0 / (2 * rho)
        x = np.ones(n)
        for _ in range(500):
            y = 1.0 + alpha * (A @ x)
            if np.linalg.norm(y - x) / np.linalg.norm(y) < 1e-10:
                x = y
                break
            x = y
        return x
    if kind == "exp":
        import scipy.linalg

        return np.diag(scipy.linalg.expm(A.toarray()))
    w, v = spla.eigsh(A, k=1, which="LA")
    return np.abs(v[:, 0])
