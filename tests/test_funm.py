"""expmv / norm estimation / stochastic trace vs dense oracles."""

import numpy as np
import pytest
import scipy.linalg
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from krylov_robustness_tpu.funm.dense import (
    frechet_offdiag,
    fun_sym,
    trace_fun_update_dense,
)
from krylov_robustness_tpu.funm.expmv import expmv, select_taylor_degree
from krylov_robustness_tpu.funm.normest import norm1, normest2
from krylov_robustness_tpu.funm.trace import mc_trace, trace_exp
from krylov_robustness_tpu.ops.sparse import CooMatrix

from helpers import random_graph


def test_norm1_exact():
    A = random_graph(120, 0.05, seed=5, weighted=True)
    M = CooMatrix.from_scipy(A)
    want = sp.linalg.norm(A, 1)
    np.testing.assert_allclose(float(norm1(M)), want, rtol=1e-12)


def test_normest2_close_to_spectral_norm():
    A = random_graph(150, 0.05, seed=9)
    M = CooMatrix.from_scipy(A)
    lam = np.abs(
        sp.linalg.eigsh(A.astype(float), k=1, return_eigenvectors=False)
    )[0]
    est = float(normest2(M, tol=1e-4, max_iter=500))
    assert abs(est - lam) / lam < 0.05


def test_normest1_power_exact_on_mixed_sign():
    # ‖B^m‖₁ via the block estimator vs dense truth on mixed-sign symmetric B
    from krylov_robustness_tpu.funm.normest import normest1_power

    rng = np.random.default_rng(3)
    for m in (1, 2, 3, 5):
        B = rng.standard_normal((60, 60))
        B = (B + B.T) / 2
        want = np.linalg.norm(np.linalg.matrix_power(B, m), 1)
        est = normest1_power(lambda X: B @ X, 60, m=m, t=2)
        # normest1 is a lower bound that is almost always exact or within a
        # few percent (Higham & Tisseur 2000)
        assert est <= want * (1 + 1e-10)
        assert est >= 0.5 * want


def test_normest1_power_multi_iteration_t2():
    # Force the t>1, k>=3 path (the ind_best bookkeeping that maps the best
    # column of Y back to the unit-vector index behind it): symmetrized
    # inverse of a unit-upper-triangular perturbation takes 3 estimator
    # iterations (found by search over seeds) and still lands exactly on
    # the true 1-norm. Guards the col_src refactor of funm/normest.py.
    from krylov_robustness_tpu.funm.normest import normest1_power

    rng = np.random.default_rng(61)
    n = 40
    T = np.triu(rng.standard_normal((n, n))) + np.eye(n) * 2
    B = np.linalg.inv(T)
    B = (B + B.T) / 2
    calls = [0]

    def mv(X):
        calls[0] += 1
        return B @ X

    est = normest1_power(mv, n, m=1, t=2, itmax=8, seed=1)
    want = np.linalg.norm(B, 1)
    iters = (calls[0] + 1) // 2  # power() runs twice per iteration (Y, Z)
    assert iters >= 3, f"construction no longer multi-iterates ({iters})"
    assert est <= want * (1 + 1e-10)
    assert est >= 0.9 * want


def test_select_taylor_degree_mixed_sign_not_worse_than_abs_bound():
    # a shifted/weighted operator with negative entries: the normest1 branch
    # must not pick a costlier (m, s) than the |A|-product upper bound
    rng = np.random.default_rng(7)
    A = random_graph(80, 0.1, seed=11, weighted=True).toarray()
    A = A - 0.5 * (A > 0) * A.mean()  # keep symmetric, mix signs
    A[A != 0] -= 0.03
    A = (A + A.T) / 2
    S = sp.csr_matrix(A * 4.0)
    M = CooMatrix.from_scipy(S)
    plan = select_taylor_degree(M, t=1.0, b_cols=1, force_estm=True)
    # dense truth: cost of the chosen plan must cover the true norm demand
    import scipy.linalg as sla

    want = sla.expm(S.toarray())
    b = rng.standard_normal((80, 2))
    got = np.asarray(expmv(M, jnp.asarray(b), t=1.0, plan=plan))
    np.testing.assert_allclose(
        got, want @ b, rtol=1e-8, atol=1e-8 * np.abs(want @ b).max()
    )


@pytest.mark.parametrize("t", [1.0, 0.5, -0.3])
def test_expmv_matches_dense(t):
    A = random_graph(90, 0.08, seed=2)
    M = CooMatrix.from_scipy(A)
    rng = np.random.default_rng(0)
    b = rng.standard_normal((90, 4))
    want = scipy.linalg.expm(t * A.toarray()) @ b
    got = np.asarray(expmv(M, jnp.asarray(b), t=t))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9 * np.abs(want).max())


def test_expmv_plan_reuse():
    A = random_graph(60, 0.1, seed=4)
    M = CooMatrix.from_scipy(A)
    plan = select_taylor_degree(M, t=1.0, b_cols=10)
    assert plan.m >= 1 and plan.s >= 1
    b = np.eye(60)[:, :10]
    want = scipy.linalg.expm(A.toarray())[:, :10]
    got = np.asarray(expmv(M, jnp.asarray(b), t=1.0, plan=plan))
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-10 * np.abs(want).max())


def test_mc_trace_exact_operator():
    n = 80
    A = random_graph(n, 0.1, seed=8)
    D = scipy.linalg.expm(A.toarray())
    Dj = jnp.asarray(D)

    tr, res, it = mc_trace(lambda x: Dj @ x, n, tol=1e-6, maxit=1000)
    want = np.trace(D)
    assert abs(tr - want) / want < 1e-3


def test_trace_exp_small_graph():
    n = 120
    A = random_graph(n, 0.06, seed=13)
    M = CooMatrix.from_scipy(A)
    want = np.trace(scipy.linalg.expm(A.toarray()))
    got = trace_exp(M, tol=1e-6)
    assert abs(got - want) / want < 1e-3


def test_fun_sym_matches_expm():
    rng = np.random.default_rng(3)
    S = rng.standard_normal((30, 30))
    S = (S + S.T) / 2
    want = scipy.linalg.expm(S)
    got = np.asarray(fun_sym(jnp.asarray(S), "exp"))
    # eigh-based f(M) carries O(eps * ||f(M)||) error; scale atol accordingly
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9 * np.abs(want).max())


def test_trace_fun_update_dense_oracle():
    n = 40
    A = random_graph(n, 0.15, seed=21)
    U = np.zeros((n, 2))
    U[3, 0] = 1.0
    U[17, 1] = 1.0
    B = -np.array([[0.0, 1.0], [1.0, 0.0]])
    got = float(
        trace_fun_update_dense(
            jnp.asarray(A.toarray()), jnp.asarray(U), jnp.asarray(B), "exp"
        )
    )
    At = A.toarray() + U @ B @ U.T
    want = np.trace(scipy.linalg.expm(At)) - np.trace(scipy.linalg.expm(A.toarray()))
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("fname", ["exp", "sinh", "cosh"])
def test_frechet_offdiag_block_triangular(fname):
    """Daleckii–Krein form vs dense f of the block-triangular matrix
    (the reference's trick at multiple_frechet_eval.m:150-159)."""
    rng = np.random.default_rng(5)
    m, p = 12, 9
    M1 = rng.standard_normal((m, m))
    M1 = (M1 + M1.T) / 2
    M2 = rng.standard_normal((p, p))
    M2 = (M2 + M2.T) / 2
    C = rng.standard_normal((m, p))
    big = np.zeros((m + p, m + p))
    big[:m, :m] = M1
    big[:m, m:] = C
    big[m:, m:] = M2
    f_np = {"exp": scipy.linalg.expm,
            "sinh": lambda X: (scipy.linalg.expm(X) - scipy.linalg.expm(-X)) / 2,
            "cosh": lambda X: (scipy.linalg.expm(X) + scipy.linalg.expm(-X)) / 2}[fname]
    want = f_np(big)[:m, m:]
    got = np.asarray(
        frechet_offdiag(jnp.asarray(M1), jnp.asarray(M2), jnp.asarray(C), fname)
    )
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-8)


def test_entries_of_f_expmv_matches_dense():
    """Fused expmv-action entry evaluator (exp family) vs dense expm."""
    import scipy.linalg

    from helpers import random_graph
    from krylov_robustness_tpu.ops.sparse import CooMatrix
    from krylov_robustness_tpu.updates.entries import entries_of_f_expmv

    A = random_graph(300, 0.03, seed=3)
    M = CooMatrix.from_scipy(A)
    Ad = A.toarray()
    iu, ju = np.nonzero(np.tril(Ad, -1))
    omega = np.stack([iu[:25], ju[:25]], 1)
    eP = scipy.linalg.expm(Ad)
    eM = scipy.linalg.expm(-Ad)
    for fn, ref in [("exp", eP), ("sinh", (eP - eM) / 2),
                    ("cosh", (eP + eM) / 2)]:
        vals, _ = entries_of_f_expmv(M, omega, fun=fn)
        want = ref[omega[:, 0], omega[:, 1]]
        np.testing.assert_allclose(np.asarray(vals), want, rtol=1e-6,
                                   atol=1e-9 * np.abs(ref).max())


def test_expmv_plan_t_mismatch_raises():
    import pytest

    from helpers import random_graph
    from krylov_robustness_tpu.funm.expmv import expmv, select_taylor_degree
    from krylov_robustness_tpu.ops.sparse import CooMatrix

    A = random_graph(60, 0.1, seed=4)
    M = CooMatrix.from_scipy(A)
    plan = select_taylor_degree(M, t=1.0, b_cols=2)
    x = jnp.ones((60, 2))
    with pytest.raises(ValueError):
        expmv(M, x, t=-1.0, plan=plan)


def test_expmv_debug_numerics_clean_path():
    A = random_graph(70, 0.08, seed=4)
    M = CooMatrix.from_scipy(A)
    b = np.random.default_rng(1).standard_normal((70, 3))
    want = scipy.linalg.expm(A.toarray()) @ b
    got = np.asarray(expmv(M, jnp.asarray(b), debug_numerics=True))
    np.testing.assert_allclose(got, want, rtol=1e-9,
                               atol=1e-9 * np.abs(want).max())


def test_greedy_guard_warns_on_nonfinite_scores():
    from krylov_robustness_tpu.optimize.greedy import _guard_scores

    scores = np.array([1.0, np.nan, 2.0])
    with pytest.warns(RuntimeWarning, match="non-finite"):
        ok = _guard_scores(scores, 0, "toy")
    assert not ok
    assert _guard_scores(np.array([1.0, 2.0]), 1, "toy")


def test_trace_exp_host_certified_eigsh_lane_and_fallback():
    # sigma-shifted hub regime (sigma ≈ λmax > 20): the top-k eigsh partial
    # sum must be used when the tail bound (n−k)e^{λk−σ} certifies, and the
    # stochastic lane must take over when it does not
    import scipy.sparse as sp

    from krylov_robustness_tpu.funm.trace import trace_exp_host

    # certified: decaying spectrum, k=n−2 covers all but a tail of weight
    # ~e^{λmin−λmax} — the lane is deterministic, so agreement with the
    # dense oracle is near machine precision
    A = random_graph(100, 0.06, seed=7)
    lam = np.linalg.eigvalsh(A.toarray())
    A = A * (25.0 / lam[-1])
    lam = lam * (25.0 / lam[-1])
    sig = float(lam[-1])
    dense = float(np.sum(np.exp(lam - sig)))
    est = trace_exp_host(A, sigma=sig)
    assert abs(est - dense) / dense < 1e-8

    # not certified: near-flat spectrum (diagonal, values within 1 of sigma)
    # → tail bound ~e^{-1}·(n−k) is O(1%) of the trace → stochastic
    # fallback on the shifted operator (exact for diagonal operators once
    # the Hutchinson remainder sees the identity-like complement)
    d = 25.0 - np.linspace(0.0, 1.0, 60)
    D = sp.diags(d).tocsr()
    dense_d = float(np.sum(np.exp(d - 25.0)))
    est_d = trace_exp_host(D, sigma=25.0, tol=1e-6)
    assert abs(est_d - dense_d) / dense_d < 1e-3


def test_trace_exp_host_matches_dense_and_shift_invariance():
    # host f64 lane (TPU sessions' normalizer): same protocol, scipy-backed
    # expmv action; check vs dense oracle and sigma consistency
    from krylov_robustness_tpu.funm.trace import trace_exp_host

    A = random_graph(220, 0.04, seed=21)
    dense = float(np.sum(np.exp(np.linalg.eigvalsh(A.toarray()))))
    est = trace_exp_host(A, tol=1e-6)
    assert abs(est - dense) / dense < 1e-5
    sig = 2.5
    est_s = trace_exp_host(A, tol=1e-6, sigma=sig)
    dense_s = dense * np.exp(-sig)
    assert abs(est_s - dense_s) / dense_s < 1e-5


def test_trace_lanes_extreme_hub_spectrum_unshifted():
    """Journals-class regression (round-4 find): on a numerically-rank-1
    operator relative to f64 (complete graph: λmax=n-1, λ2=-1, ratio
    e^{n}), BOTH stochastic lanes used to run away by ~1e4x once deflation
    exhausted the numerical range — same mechanism as the f32 hub defect
    (NOTES_f32_mc_trace.md), surfacing even in f64 at σ=0. Post-fix both
    match the dense oracle."""
    import scipy.sparse as sp

    from krylov_robustness_tpu.funm.trace import trace_exp, trace_exp_host

    n = 60  # λmax = 59: e^59 ≈ 4e25, representable, utterly dominant
    A = sp.csr_matrix(np.ones((n, n)) - np.eye(n))
    dense = float(np.sum(np.exp(np.linalg.eigvalsh(A.toarray()))))
    est_dev = trace_exp(CooMatrix.from_scipy(A), tol=1e-4)
    est_host = trace_exp_host(A)
    assert abs(est_dev - dense) < 1e-6 * dense, (est_dev, dense)
    assert abs(est_host - dense) < 1e-6 * dense, (est_host, dense)
