"""Block Lanczos recurrence vs dense Krylov oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from helpers import random_graph
from krylov_robustness_tpu.krylov.lanczos import (
    assemble_tridiag,
    lanczos_continue,
    lanczos_run,
    lanczos_start,
)
from krylov_robustness_tpu.ops.sparse import CooMatrix


def dense_lanczos_tridiag(A, U, m):
    """Naive full-orthogonalization reference: returns the m·bs square
    projection Vᵀ A V for the block Krylov space of A on U."""
    n, bs = U.shape
    V, _ = np.linalg.qr(U)
    basis = [V]
    for _ in range(m):
        w = A @ basis[-1]
        for Vb in basis:
            w = w - Vb @ (Vb.T @ w)
        for Vb in basis:
            w = w - Vb @ (Vb.T @ w)
        Q, _ = np.linalg.qr(w)
        basis.append(Q)
    Vfull = np.concatenate(basis[:-1], axis=1)
    return Vfull.T @ A @ Vfull, Vfull


@pytest.mark.parametrize("bs", [1, 2])
def test_tridiag_matches_dense_projection(bs):
    n, m = 150, 8
    A = random_graph(n, 0.05, seed=42, weighted=True)
    M = CooMatrix.from_scipy(A)
    rng = np.random.default_rng(0)
    U = rng.standard_normal((n, bs))
    blocks, R0, state = lanczos_run(M, jnp.asarray(U)[None], m)
    G = np.asarray(assemble_tridiag(blocks, bs=bs, m=m))[0]
    G_ref, Vfull = dense_lanczos_tridiag(A.toarray(), U, m)
    # Projections agree up to per-block sign conventions of the QR; the
    # eigenvalues are invariant to those signs.
    np.testing.assert_allclose(
        np.sort(np.linalg.eigvalsh((G + G.T) / 2)),
        np.sort(np.linalg.eigvalsh((G_ref + G_ref.T) / 2)),
        rtol=1e-9,
        atol=1e-9,
    )


def test_batched_independent_spaces():
    """Batch members must not interact: a batch of two identical start
    blocks gives identical projections."""
    n, m, bs = 80, 6, 2
    A = random_graph(n, 0.08, seed=1, weighted=True)
    M = CooMatrix.from_scipy(A)
    rng = np.random.default_rng(2)
    U = rng.standard_normal((n, bs))
    batch = jnp.stack([jnp.asarray(U), jnp.asarray(U)])
    blocks, R0, _ = lanczos_run(M, batch, m)
    G = np.asarray(assemble_tridiag(blocks, bs=bs, m=m))
    np.testing.assert_allclose(G[0], G[1], rtol=1e-12, atol=1e-13)


def test_resume_equals_straight_run():
    """Incremental extension (run 4 then continue 4) must equal one 8-step
    run — the reference's incremental API contract
    (lanczos_krylov.m:60-67)."""
    n, bs = 100, 2
    A = random_graph(n, 0.06, seed=5, weighted=True)
    M = CooMatrix.from_scipy(A)
    rng = np.random.default_rng(3)
    U = jnp.asarray(rng.standard_normal((n, bs)))[None]
    blocks8, R0, _ = lanczos_run(M, U, 8)
    state, R0b = lanczos_start(M, U)
    b1, state = lanczos_continue(M, state, 4)
    b2, state = lanczos_continue(M, state, 4)
    h = jnp.concatenate([b1.h, b2.h], axis=0)
    beta = jnp.concatenate([b1.beta, b2.beta], axis=0)
    np.testing.assert_allclose(np.asarray(blocks8.h), np.asarray(h), rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(blocks8.beta), np.asarray(beta), rtol=1e-12, atol=1e-14)
    np.testing.assert_allclose(np.asarray(R0), np.asarray(R0b), rtol=1e-12)


def test_lucky_breakdown_flagged():
    """Operator with tiny invariant subspace triggers breakdown; blocks
    beyond it are zero."""
    # A block-diagonal matrix with a 3-dim invariant subspace reachable from U
    n = 64
    D = np.zeros((n, n))
    D[:3, :3] = np.array([[2.0, 1.0, 0.0], [1.0, 3.0, 0.5], [0.0, 0.5, 1.0]])
    D[3:, 3:] = np.diag(np.arange(1, n - 2, dtype=float))
    import scipy.sparse as sp

    M = CooMatrix.from_scipy(sp.csr_matrix(D))
    U = np.zeros((n, 1))
    U[0, 0] = 1.0
    blocks, R0, state = lanczos_run(M, jnp.asarray(U)[None], 6)
    lucky = int(blocks.lucky_step[0])
    assert lucky <= 3
    assert not bool(state.alive[0])
    # post-breakdown blocks are zeroed
    assert np.allclose(np.asarray(blocks.beta)[lucky:, 0], 0.0)
