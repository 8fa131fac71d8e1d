"""Sturm-bisection banded eigensolver vs LAPACK (ops/banded_eig.py) — the
TPU-native spectra kernel of the fused greedy scorer."""

import numpy as np
import pytest

import jax.numpy as jnp

from krylov_robustness_tpu.ops.banded_eig import eigvalsh_banded


def _random_banded(batch, M, w, seed, zero_tail=True):
    rng = np.random.default_rng(seed)
    G = np.zeros((batch, M, M))
    for b in range(batch):
        m_used = M if (not zero_tail or b % 2) else M // 2
        for d in range(w + 1):
            v = rng.standard_normal(m_used - d) * (50 if d == 0 else 10)
            G[b, np.arange(m_used - d) + d, np.arange(m_used - d)] = v
            G[b, np.arange(m_used - d), np.arange(m_used - d) + d] = v
    return G


@pytest.mark.parametrize("dtype,rtol", [(jnp.float64, 1e-10),
                                        (jnp.float32, 2e-4)])
@pytest.mark.parametrize("M", [24, 60])
def test_matches_lapack(dtype, rtol, M):
    """Full-spectrum agreement with numpy eigvalsh on random banded
    matrices, including fused-style zero-padded tails (decoupled zero
    eigenvalues)."""
    w = 3
    G = _random_banded(32, M, w, seed=M)
    got = np.asarray(eigvalsh_banded(jnp.asarray(G, dtype), w=w))
    ref = np.sort(np.linalg.eigvalsh(G), axis=-1)
    assert np.abs(got - ref).max() / np.abs(ref).max() < rtol


def test_clustered_and_multiple_eigenvalues():
    """Bisection must count multiplicities: block-diagonal matrix with a
    repeated eigenvalue and a tight cluster."""
    d = np.array([3.0, 3.0, 3.0, 1.0, 1.0 + 1e-9, -2.0, 0.0, 0.0])
    G = np.zeros((1, 8, 8))
    G[0] = np.diag(d)
    got = np.asarray(eigvalsh_banded(jnp.asarray(G, jnp.float64), w=3))[0]
    np.testing.assert_allclose(got, np.sort(d), atol=1e-10)


def test_interior_zero_blocks_f32():
    """Regression for the pivot-cascade undercount: dead-candidate
    projections carry INTERIOR exact-zero rows/cols plus a large zero
    cluster from the fixed-size pad; near-singular leading submatrices hit
    the pivot clamp repeatedly, and a safmin-sized clamp let the Schur
    window overflow to inf/NaN so NEGATIVE eigenvalues were silently
    reported as 0 (observed on DC greedy scoring, round 5). The eps-scale
    clamp + window saturation must keep the full f32 spectrum correct."""
    rng = np.random.default_rng(11)
    w = 3
    M = 60
    G = np.zeros((16, M, M))
    for b in range(16):
        # indefinite banded block of m_used rows with zero rows interleaved
        m_used = 24
        T = np.zeros((M, M))
        for d in range(w + 1):
            v = rng.standard_normal(m_used - d) * (4 if d == 0 else 2)
            T[np.arange(m_used - d) + d, np.arange(m_used - d)] = v
            T[np.arange(m_used - d), np.arange(m_used - d) + d] = v
        # kill a few interior rows/cols exactly (lucky-breakdown structure)
        for z in (7, 8, 15):
            T[z, :] = 0.0
            T[:, z] = 0.0
        G[b] = T
    got = np.sort(np.asarray(
        eigvalsh_banded(jnp.asarray(G, jnp.float32), w=w)), axis=-1)
    ref = np.sort(np.linalg.eigvalsh(G), axis=-1)
    assert np.abs(got - ref).max() < 5e-5 * np.abs(ref).max()
    # the negative half of the spectrum must be present (the bug zeroed it)
    assert (got < -0.5).sum() == (ref < -0.5).sum()


def test_tridiagonal_bandwidth_one():
    """w=1 (plain tridiagonal) against LAPACK."""
    rng = np.random.default_rng(7)
    M = 40
    d = rng.standard_normal((8, M)) * 20
    e = rng.standard_normal((8, M - 1)) * 5
    G = np.zeros((8, M, M))
    for b in range(8):
        G[b] = np.diag(d[b]) + np.diag(e[b], 1) + np.diag(e[b], -1)
    got = np.asarray(eigvalsh_banded(jnp.asarray(G, jnp.float64), w=1))
    ref = np.sort(np.linalg.eigvalsh(G), axis=-1)
    np.testing.assert_allclose(got, ref, atol=1e-10 * np.abs(ref).max())
