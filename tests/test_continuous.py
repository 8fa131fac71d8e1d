"""Continuous path: fun_update / entries / frechet / gradient / hessian vs
dense oracles (the reference's debug checks promoted to tests)."""

import numpy as np
import pytest
import scipy.linalg
import scipy.sparse as sp

import jax.numpy as jnp

from helpers import random_graph
from krylov_robustness_tpu.ops.sparse import CooMatrix
from krylov_robustness_tpu.optimize.continuous import (
    build_problem,
    fun_and_grad,
    hessian,
    optimize_weights,
)
from krylov_robustness_tpu.updates.entries import function_multiple_entries
from krylov_robustness_tpu.updates.frechet import multiple_frechet_eval
from krylov_robustness_tpu.updates.fun_update import fun_update
from krylov_robustness_tpu.updates.low_rank import weights_to_low_rank


def weighted_graph(n, density, seed):
    A = random_graph(n, density, seed=seed, weighted=True)
    A = A / np.abs(A).max()
    return A


def test_fun_update_low_rank_matches_dense():
    n = 300
    A = weighted_graph(n, 0.03, seed=2)
    M = CooMatrix.from_scipy(A)
    rng = np.random.default_rng(0)
    Omega = np.array([[5, 9], [40, 3], [100, 57]])
    X = rng.uniform(0.1, 1.0, size=3)
    U, B, _ = weights_to_low_rank(Omega, X, n)
    upd = fun_update(M, jnp.asarray(U)[None], jnp.asarray(B)[None], tol=1e-10)
    got = np.asarray(upd.Um[0] @ upd.Xm[0] @ upd.Um[0].T)
    Ad = A.toarray()
    want = scipy.linalg.expm(Ad + U @ B @ U.T) - scipy.linalg.expm(Ad)
    assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-7


def test_fun_update_dense_fallback_small_n():
    n = 60
    A = weighted_graph(n, 0.1, seed=3)
    M = CooMatrix.from_scipy(A)
    U = np.zeros((n, 2))
    U[3, 0] = 1.0
    U[8, 1] = 1.0
    B = 0.3 * np.array([[0.0, 1.0], [1.0, 0.0]])
    upd = fun_update(M, jnp.asarray(U)[None], jnp.asarray(B)[None], tol=1e-10)
    assert upd.is_dense
    Ad = A.toarray()
    want = scipy.linalg.expm(Ad + U @ B @ U.T) - scipy.linalg.expm(Ad)
    np.testing.assert_allclose(np.asarray(upd.Xm[0]), want, atol=1e-9)
    # entries accessor consistent with the dense matrix
    e = np.asarray(upd.entries(np.array([3, 8]), np.array([8, 3]))[0])
    np.testing.assert_allclose(e, [want[3, 8], want[8, 3]], atol=1e-10)


def test_function_multiple_entries_vs_dense():
    n = 300
    A = weighted_graph(n, 0.03, seed=5)
    M = CooMatrix.from_scipy(A)
    rng = np.random.default_rng(1)
    omega = np.stack(
        [rng.integers(0, n, size=8), rng.integers(0, n, size=8)], axis=1
    )
    vals, iters = function_multiple_entries(M, omega, fun="exp", tol=1e-10)
    F = scipy.linalg.expm(A.toarray())
    want = F[omega[:, 0], omega[:, 1]]
    np.testing.assert_allclose(np.asarray(vals), want, rtol=1e-6, atol=1e-10)


def test_multiple_frechet_eval_vs_dense():
    """Oracle: Df(A)(E_ij) = top-right of expm([[A, E_ij],[0, A]])
    (multiple_frechet_eval.m:176-183)."""
    n = 150
    A = weighted_graph(n, 0.05, seed=7)
    M = CooMatrix.from_scipy(A)
    omega = np.array([[3, 11], [40, 3], [7, 7]])
    fb = multiple_frechet_eval(M, omega, fun="exp", tol=1e-10)
    Ad = A.toarray()
    for h, (i, j) in enumerate(omega):
        C = np.zeros((n, n))
        C[i, j] = 1.0
        big = np.block([[Ad, C], [np.zeros((n, n)), Ad]])
        want = scipy.linalg.expm(big)[:n, n:]
        ri = fb.node_index[int(i)]
        ci = fb.node_index[int(j)]
        got = np.asarray(
            fb.bases[ri] @ fb.X[h] @ fb.bases[ci].T
        )
        assert np.linalg.norm(got - want) / np.linalg.norm(want) < 1e-6


def test_gradient_matches_block_frechet_identity():
    """The reference's gradient debug oracle
    (fun_and_grad_krylov_exp.m:89-112)."""
    n = 200
    A = weighted_graph(n, 0.04, seed=9)
    M = CooMatrix.from_scipy(A)
    Omega = np.array([[10, 4], [50, 23], [150, 80]])
    Ad = A.toarray()
    F = scipy.linalg.expm(Ad)
    dfA = F[Omega[:, 0], Omega[:, 1]]
    rng = np.random.default_rng(2)
    X = rng.uniform(0.05, 0.5, size=3)

    f_val, gr = fun_and_grad(X, M, Omega, dfA, fun="exp", tol=1e-10)

    # oracle
    U, B, _ = weights_to_low_rank(Omega, X, n)
    At = Ad + U @ B @ U.T
    f_want = -(np.trace(scipy.linalg.expm(At)) - np.trace(F))
    gr_want = np.zeros(3)
    for k, (i, j) in enumerate(Omega):
        C = np.zeros((n, n))
        C[i, j] = 1.0
        big = np.block([[At, C], [np.zeros((n, n)), At]])
        gr_want[k] = -2.0 * np.trace(scipy.linalg.expm(big)[:n, n:])
    np.testing.assert_allclose(f_val, f_want, rtol=1e-6)
    np.testing.assert_allclose(gr, gr_want, rtol=1e-5)


def test_gradient_zero_weights_shortcut():
    n = 80
    A = weighted_graph(n, 0.08, seed=11)
    M = CooMatrix.from_scipy(A)
    Omega = np.array([[5, 2], [30, 8]])
    dfA = np.array([0.5, 0.7])
    f_val, gr = fun_and_grad(np.zeros(2), M, Omega, dfA)
    assert f_val == 0.0
    np.testing.assert_allclose(gr, -2 * dfA)


def test_hessian_matches_finite_differences():
    n = 120
    A = weighted_graph(n, 0.06, seed=13)
    M = CooMatrix.from_scipy(A)
    Omega = np.array([[10, 4], [50, 23]])
    Ad = A.toarray()
    F = scipy.linalg.expm(Ad)
    dfA = F[Omega[:, 0], Omega[:, 1]]
    x0 = np.array([0.2, 0.1])
    H = hessian(x0, A, Omega, fun="exp", tol=1e-10)
    # finite differences of the gradient
    eps = 1e-5
    Hfd = np.zeros((2, 2))
    for k in range(2):
        xp = x0.copy()
        xp[k] += eps
        xm = x0.copy()
        xm[k] -= eps
        _, gp = fun_and_grad(xp, M, Omega, dfA, tol=1e-11)
        _, gm = fun_and_grad(xm, M, Omega, dfA, tol=1e-11)
        Hfd[:, k] = (gp - gm) / (2 * eps)
    np.testing.assert_allclose(H, Hfd, rtol=1e-3, atol=1e-6 * np.abs(Hfd).max())
    np.testing.assert_allclose(H, H.T, atol=1e-10)


@pytest.mark.parametrize("method", ["tuning", "rewire", "add"])
def test_optimize_weights_improves(method):
    n = 90
    A = weighted_graph(n, 0.08, seed=17)
    M = CooMatrix.from_scipy(A)
    from krylov_robustness_tpu.graphs.centrality import compute_centrality

    c = compute_centrality(M, "eig")
    prob = build_problem(
        A, M, c, method, search_space=20, modifiable_edges=6, total_weight=3.0
    )
    res = optimize_weights(A, M, prob, tol=1e-8, maxiter=50)
    assert res.fval < 0  # robustness increased (we minimize −Δtrace)
    assert np.all(res.x >= prob.lb - 1e-8) and np.all(res.x <= prob.ub + 1e-8)
    assert np.sum(res.x) <= prob.budget + 1e-6
    # verify the claimed objective against a dense evaluation
    U, B, _ = weights_to_low_rank(prob.Omega, res.x, n)
    Ad = A.toarray()
    d = np.trace(scipy.linalg.expm(Ad + U @ B @ U.T)) - np.trace(
        scipy.linalg.expm(Ad)
    )
    np.testing.assert_allclose(-res.fval, d, rtol=1e-5)
