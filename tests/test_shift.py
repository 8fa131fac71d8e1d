"""Spectral-shift scoring (σ): trace(f(A−σI)) paths must be exactly
e^{-σ}-scaled versions of the unshifted ones (f=exp), and the f32 pipeline
must stay finite on hub graphs where exp(λmax) or its squared norms
overflow float32 (the as_735 / ca-AstroPh / soc-Epinions1 failure mode).
"""

import numpy as np
import scipy.linalg
import scipy.sparse as sp

import jax.numpy as jnp

from helpers import random_graph
from krylov_robustness_tpu.funm.expmv import expmv
from krylov_robustness_tpu.funm.trace import trace_exp
from krylov_robustness_tpu.ops.sparse import CooMatrix
from krylov_robustness_tpu.updates.trace_update import trace_fun_update_edges


def test_expmv_sigma_scales_exactly():
    A = random_graph(80, 0.08, seed=0)
    M = CooMatrix.from_scipy(A)
    b = np.random.default_rng(1).standard_normal((80, 3))
    base = np.asarray(expmv(M, jnp.asarray(b)))
    sig = 3.7
    got = np.asarray(expmv(M, jnp.asarray(b), sigma=sig))
    np.testing.assert_allclose(got, base * np.exp(-sig), rtol=1e-12)
    # and it equals the dense oracle of exp(A - σI)
    want = scipy.linalg.expm(A.toarray() - sig * np.eye(80)) @ b
    np.testing.assert_allclose(got, want, rtol=1e-9,
                               atol=1e-9 * np.abs(want).max())


def test_trace_update_shift_invariant_ratio():
    A = random_graph(200, 0.05, seed=2)  # n>130: Krylov path
    M = CooMatrix.from_scipy(A)
    C = sp.coo_matrix(sp.tril(A, -1))
    E = np.stack([C.row[:6], C.col[:6]], axis=1)
    base = np.asarray(trace_fun_update_edges(M, E, sign=-1.0, tol=1e-10).delta)
    sig = 2.5
    got = np.asarray(
        trace_fun_update_edges(M, E, sign=-1.0, tol=1e-10 * np.exp(-sig),
                               shift=sig).delta
    )
    np.testing.assert_allclose(got, base * np.exp(-sig), rtol=1e-6)


def test_trace_update_shift_dense_path():
    A = random_graph(60, 0.2, seed=3)  # n≤130: dense fast path
    M = CooMatrix.from_scipy(A)
    C = sp.coo_matrix(sp.tril(A, -1))
    E = np.stack([C.row[:4], C.col[:4]], axis=1)
    base = np.asarray(trace_fun_update_edges(M, E, sign=-1.0).delta)
    got = np.asarray(trace_fun_update_edges(M, E, sign=-1.0, shift=1.3).delta)
    np.testing.assert_allclose(got, base * np.exp(-1.3), rtol=1e-10)


def test_trace_exp_sigma():
    A = random_graph(120, 0.1, seed=4)
    M = CooMatrix.from_scipy(A)
    sig = 4.0
    dense = float(np.sum(np.exp(np.linalg.eigvalsh(A.toarray()) - sig)))
    got = float(trace_exp(M, tol=1e-6, sigma=sig))
    assert abs(got - dense) / dense < 1e-4


def _hub_graph(n=3600):
    """Star graph: λmax = sqrt(n-1) ≈ 60 → exp(λmax) ≈ 1e26, whose squared
    norms overflow f32 (the as_735 failure mode at λmax=46)."""
    rows = np.zeros(n - 1, dtype=np.int64)
    cols = np.arange(1, n)
    A = sp.coo_matrix((np.ones(n - 1), (rows, cols)), shape=(n, n))
    A = (A + A.T).tocsr()
    # a few extra edges so candidate deltas differ
    A = A.tolil()
    for k in range(1, 40):
        A[k, k + 40] = A[k + 40, k] = 1.0
    return sp.csr_matrix(A)


def test_f32_hub_graph_finite_and_matches_f64():
    A = _hub_graph()
    lmax = float(
        sp.linalg.eigsh(A.astype(np.float64), k=1,
                        return_eigenvectors=False)[0]
    )
    assert lmax > 55  # exp(λmax)² overflows f32
    # structurally distinct candidates: hub spokes (large delta) vs the
    # peripheral extra edges (small delta) — a meaningful ranking
    E = np.array([[1, 0], [100, 0], [1, 41], [5, 45], [20, 60], [2000, 0]])
    # f64 SHIFTED reference (same units as the f32 run; f64 shifted equals
    # f64 unshifted × e^{-σ} exactly — covered by the invariance tests)
    M64 = CooMatrix.from_scipy(A, dtype=jnp.float64)
    d64 = np.asarray(trace_fun_update_edges(M64, E, sign=-1.0, tol=1e-10,
                                            shift=lmax).delta)
    # f32 shifted
    M32 = CooMatrix.from_scipy(A, dtype=jnp.float32)
    d32 = np.asarray(trace_fun_update_edges(M32, E, sign=-1.0, tol=1e-8,
                                            shift=lmax).delta)
    assert np.all(np.isfinite(d32))
    # dominant (decision-relevant) candidates agree tightly; tiny deltas sit
    # at the f32 Lanczos-ghost noise floor (~2e-4 absolute in shifted units)
    # — greedy ranks by the dominant ones, so that floor is the contract
    big = np.abs(d64) > 1e-3
    np.testing.assert_allclose(d32[big], d64[big], rtol=5e-3)
    assert np.abs(d32 - d64).max() < 5e-4
    assert np.all(np.sign(d32) == np.sign(d64))
    # the greedy pick (most negative delta) must agree across dtypes
    assert int(np.argmin(d32)) == int(np.argmin(d64))
    # shifted trace_exp stays finite in f32 too
    tr32 = float(trace_exp(M32, tol=1e-3, sigma=lmax))
    assert np.isfinite(tr32) and tr32 > 0


def test_mc_trace_f32_rank_deficient_operator_regression():
    """Round-2/3 defect regression (VERDICT r3 item 3): an f32 mc_trace on a
    numerically low-rank PSD operator (the shifted hub-graph spectrum: one
    eigenvalue ~1, the rest ~0) must NOT run away. Pre-fix, once deflation
    spanned the numerical range the residual-QR noise blocks passed the
    per-block-relative rank guard, contaminated Qacc, broke the projector
    and the exact-trace accumulator double-counted mass every iteration
    (5,856 vs 1.0 on the as_735 surrogate; ~13,070 on ca-CondMat in the
    committed round-2 rows)."""
    import jax

    from krylov_robustness_tpu.funm.trace import mc_trace

    n, k = 2000, 40
    rng = np.random.default_rng(7)
    V, _ = np.linalg.qr(rng.standard_normal((n, k)))
    # shifted hub spectrum: e^{λ1−σ}=1 dominant, the rest decades below
    coef = np.concatenate([[1.0], np.exp(-np.linspace(4, 30, k - 1))])
    exact = coef.sum()
    V32 = jnp.asarray(V, jnp.float32)
    c32 = jnp.asarray(coef, jnp.float32)

    def op(x):
        return V32 @ (c32[:, None] * (V32.T @ x))

    tr, res, it = mc_trace(op, n, tol=1e-4, maxit=1000, m_probe=10,
                           dtype=jnp.float32)
    assert abs(tr - exact) < 5e-2 * exact, (tr, exact)

    # f64 stays exact
    V64 = jnp.asarray(V)
    c64 = jnp.asarray(coef)

    def op64(x):
        return V64 @ (c64[:, None] * (V64.T @ x))

    tr64, _, _ = mc_trace(op64, n, tol=1e-4, maxit=1000, m_probe=10,
                          dtype=jnp.float64)
    assert abs(tr64 - exact) < 1e-3 * exact


def test_trace_exp_f32_shifted_hub_graph_cross_lane():
    """Cross-lane consistency (the test that would have caught the round-2
    defect): the device-lane f32 trace_exp on a σ=λmax-shifted hub graph
    must agree with the certified f64 host lane to stochastic tolerance."""
    from krylov_robustness_tpu.funm.trace import trace_exp, trace_exp_host

    n = 320
    rng = np.random.default_rng(3)
    # star hub + sparse background: λmax ≈ sqrt(n-1) ≈ 17.9 dominates
    src = np.concatenate([np.zeros(n - 1, np.int64),
                          rng.integers(1, n, 200)])
    dst = np.concatenate([np.arange(1, n),
                          rng.integers(1, n, 200)])
    keep = src != dst
    A = sp.coo_matrix((np.ones(keep.sum()), (src[keep], dst[keep])),
                      shape=(n, n))
    A = ((A + A.T) > 0).astype(np.float64)
    A.setdiag(0)
    A = sp.csr_matrix(A)
    A.eliminate_zeros()
    lam = np.linalg.eigvalsh(A.toarray())
    sigma = float(lam[-1])
    exact = float(np.sum(np.exp(lam - sigma)))
    host = trace_exp_host(A, sigma=sigma)
    M32 = CooMatrix.from_scipy(A, dtype=jnp.float32)
    dev32 = trace_exp(M32, sigma=sigma)
    assert abs(host - exact) < 2e-2 * exact, (host, exact)
    assert abs(dev32 - exact) < 5e-2 * exact, (dev32, exact)
