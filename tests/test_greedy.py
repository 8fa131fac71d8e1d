"""Greedy break/make vs brute-force dense greedy oracle."""

import numpy as np
import pytest
import scipy.linalg
import scipy.sparse as sp

from helpers import random_graph
from krylov_robustness_tpu.baselines.eigenv import eigenv_edges
from krylov_robustness_tpu.baselines.miobi import (
    miobi_break,
    miobi_make,
    robustness_score,
)
from krylov_robustness_tpu.graphs.centrality import compute_centrality
from krylov_robustness_tpu.graphs.top_edges import (
    find_top_edges,
    find_top_missing_edges,
)
from krylov_robustness_tpu.ops.sparse import CooMatrix
from krylov_robustness_tpu.optimize.greedy import greedy_krylov, krylov_miobi


def connected_random_graph(n, density, seed):
    A = random_graph(n, density, seed=seed)
    # add a path to guarantee connectivity
    lil = A.tolil()
    for i in range(n - 1):
        lil[i, i + 1] = 1.0
        lil[i + 1, i] = 1.0
    return sp.csr_matrix(lil)


def brute_force_greedy(Ad, k, mode):
    """Exact greedy with dense recomputation of trace(exp(.))."""
    A = Ad.copy()
    n = A.shape[0]
    chosen = []
    total = 0.0
    for _ in range(k):
        base = np.sum(np.exp(np.linalg.eigvalsh(A)))
        best = None
        if mode == "break":
            I, J = np.nonzero(np.tril(A, -1))
        else:
            I, J = np.nonzero(np.tril(1 - A - np.eye(n), -1))
        for i, j in zip(I, J):
            At = A.copy()
            At[i, j] += -1 if mode == "break" else 1
            At[j, i] += -1 if mode == "break" else 1
            d = np.sum(np.exp(np.linalg.eigvalsh(At))) - base
            if best is None or (mode == "break" and d < best[0]) or (
                mode == "make" and d > best[0]
            ):
                best = (d, i, j)
        d, i, j = best
        A[i, j] += -1 if mode == "break" else 1
        A[j, i] += -1 if mode == "break" else 1
        chosen.append((i, j))
        total += d
    return np.array(chosen), total, A


@pytest.mark.parametrize("mode", ["break", "make"])
def test_krylov_miobi_matches_bruteforce(mode):
    n, k = 60, 3
    A = connected_random_graph(n, 0.08, seed=17)
    Ad = A.toarray()
    if mode == "make":
        # candidate set = all missing edges (the reference's default E is
        # the existing edges even for 'make'; the drivers pass missing ones)
        I, J = np.nonzero(np.tril(1 - Ad - np.eye(n), -1))
        E = np.stack([I, J], axis=1)
    else:
        E = None
    res = krylov_miobi(A, k, E=E, mode=mode, tol=1e-8)
    edges_bf, total_bf, _ = brute_force_greedy(Ad, k, mode)
    # Δtrace totals must agree; edge identity may differ only on exact ties
    np.testing.assert_allclose(res.rob_variation, total_bf, rtol=1e-5)


def test_greedy_krylov_break_improves_and_is_consistent():
    n, k, Q = 80, 5, 30
    A = connected_random_graph(n, 0.06, seed=23)
    M = CooMatrix.from_scipy(A)
    c = compute_centrality(M, "eig")
    res = greedy_krylov(A, k, Q, c, order="min", tol=1e-8, mode="break")
    assert res.rob_variation < 0
    assert len(res.edges) == k
    # applying the chosen edges reproduces A_new
    B = A.tolil()
    for i, j in res.edges:
        B[i, j] = 0
        B[j, i] = 0
    assert (sp.csr_matrix(B) != res.A_new).nnz == 0
    # cumulative delta matches a dense evaluation of the full edit
    d_exact = float(
        np.sum(np.exp(np.linalg.eigvalsh(res.A_new.toarray())))
        - np.sum(np.exp(np.linalg.eigvalsh(A.toarray())))
    )
    # greedy accumulates per-step deltas; these match the exact total
    np.testing.assert_allclose(res.rob_variation, d_exact, rtol=1e-5)


def test_greedy_krylov_make():
    n, k, Q = 70, 4, 20
    A = connected_random_graph(n, 0.05, seed=31)
    M = CooMatrix.from_scipy(A)
    c = compute_centrality(M, "eig")
    res = greedy_krylov(A, k, Q, c, order="min", tol=1e-8, mode="make")
    assert res.rob_variation > 0
    d_exact = float(
        np.sum(np.exp(np.linalg.eigvalsh(res.A_new.toarray())))
        - np.sum(np.exp(np.linalg.eigvalsh(A.toarray())))
    )
    np.testing.assert_allclose(res.rob_variation, d_exact, rtol=1e-5)


def test_top_edges_orders():
    A = connected_random_graph(40, 0.1, seed=3)
    M = CooMatrix.from_scipy(A)
    c = compute_centrality(M, "eig")
    E1 = find_top_edges(A, c, 10, "mult")
    E2 = find_top_edges(A, c, 10, "min")
    assert E1.shape == (10, 2) and E2.shape == (10, 2)
    # 'mult' order: scores non-increasing
    s = c[E1[:, 0]] * c[E1[:, 1]]
    assert np.all(np.diff(s) <= 1e-12)
    # all returned pairs are existing edges with i > j
    Ad = A.toarray()
    assert np.all(Ad[E1[:, 0], E1[:, 1]] == 1)
    assert np.all(E1[:, 0] > E1[:, 1])


def test_top_missing_edges():
    A = connected_random_graph(40, 0.1, seed=5)
    M = CooMatrix.from_scipy(A)
    c = compute_centrality(M, "eig")
    E = find_top_missing_edges(A, c, 15, "min")
    Ad = A.toarray()
    assert E.shape == (15, 2)
    assert np.all(Ad[E[:, 0], E[:, 1]] == 0)
    assert np.all(E[:, 0] != E[:, 1])
    E2 = find_top_missing_edges(A, c, 15, "mult")
    assert np.all(Ad[E2[:, 0], E2[:, 1]] == 0)


def test_miobi_break_decreases_robustness():
    A = connected_random_graph(60, 0.08, seed=41)
    res = miobi_break(A, k=5, topT=10)
    assert res.rob_score_pct > 0  # robustness decreased
    assert res.A_new.nnz == A.nnz - 10
    assert len(res.edges) == 5


def test_miobi_make_increases_robustness():
    A = connected_random_graph(60, 0.06, seed=43)
    res = miobi_make(A, k=5, topT=10, t_pert=10)
    assert res.rob_score_pct < 0  # robustness increased
    assert res.A_new.nnz == A.nnz + 10


def test_eigenv_baseline_selects_valid_edges():
    A = connected_random_graph(100, 0.06, seed=51)
    M = CooMatrix.from_scipy(A)
    c = compute_centrality(M, "eig")
    E = eigenv_edges(A, c, k=8, mode="break")
    Ad = A.toarray()
    assert E.shape == (8, 2)
    assert np.all(Ad[E[:, 0], E[:, 1]] == 1)


def test_greedy_banded_backend_matches_coo():
    """backend='banded' (interpret mode on CPU) must reproduce the COO path."""
    import scipy.sparse as sp

    n = 120
    rng = np.random.default_rng(8)
    i = np.arange(n - 1)
    src = np.concatenate([i, rng.integers(0, n - 21, 60)])
    dst = np.concatenate([i + 1, 0 * np.arange(60)])
    dst[n - 1:] = src[n - 1:] + rng.integers(1, 20, 60)
    A = sp.coo_matrix((np.ones(len(src)), (src, dst)), shape=(n, n))
    A = ((A + A.T) > 0).astype(np.float64)
    A.setdiag(0)
    A = sp.csr_matrix(A)
    A.eliminate_zeros()
    M = CooMatrix.from_scipy(A)
    c = compute_centrality(M, "eig")
    r_coo = greedy_krylov(A, 3, 12, c, order="min", tol=1e-8, mode="break",
                          backend="coo")
    r_band = greedy_krylov(A, 3, 12, c, order="min", tol=1e-8, mode="break",
                           backend="banded")
    np.testing.assert_array_equal(r_coo.edges, r_band.edges)
    np.testing.assert_allclose(r_coo.rob_variation, r_band.rob_variation,
                               rtol=1e-10)
    assert (r_coo.A_new != r_band.A_new).nnz == 0
    r_bsr = greedy_krylov(A, 3, 12, c, order="min", tol=1e-8, mode="break",
                          backend="bsr")
    np.testing.assert_array_equal(r_coo.edges, r_bsr.edges)
    np.testing.assert_allclose(r_coo.rob_variation, r_bsr.rob_variation,
                               rtol=1e-10)
    assert (r_coo.A_new != r_bsr.A_new).nnz == 0


def test_greedy_make_bsr_backend_matches_coo():
    """make-mode BSR: candidate additions are pre-allocated explicit-zero
    tile slots; picks and totals must reproduce the COO path."""
    import scipy.sparse as sp

    n = 150
    rng = np.random.default_rng(12)
    i = np.arange(n - 1)
    src = np.concatenate([i, rng.integers(0, n - 21, 50)])
    dst = np.concatenate([i + 1, np.zeros(50, np.int64)])
    dst[n - 1:] = src[n - 1:] + rng.integers(1, 20, 50)
    A = sp.coo_matrix((np.ones(len(src)), (src, dst)), shape=(n, n))
    A = ((A + A.T) > 0).astype(np.float64)
    A.setdiag(0)
    A = sp.csr_matrix(A)
    A.eliminate_zeros()
    M = CooMatrix.from_scipy(A)
    c = compute_centrality(M, "eig")
    r_coo = greedy_krylov(A, 3, 10, c, order="min", tol=1e-8, mode="make",
                          backend="coo")
    r_bsr = greedy_krylov(A, 3, 10, c, order="min", tol=1e-8, mode="make",
                          backend="bsr")
    np.testing.assert_array_equal(r_coo.edges, r_bsr.edges)
    np.testing.assert_allclose(r_coo.rob_variation, r_bsr.rob_variation,
                               rtol=1e-10)
    assert (r_coo.A_new != r_bsr.A_new).nnz == 0


def test_greedy_sharded_backend_matches_single_device():
    """backend='sharded' (row-partitioned operator + candidate-sharded batch
    on the 8-device virtual mesh) must reproduce the single-device COO path
    edge-for-edge over a full k=5 break sweep (VERDICT r3 item 5)."""
    import jax
    import scipy.sparse as sp

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    n = 150
    rng = np.random.default_rng(5)
    i = np.arange(n - 1)
    src = np.concatenate([i, rng.integers(0, n - 21, 60)])
    dst = np.concatenate([i + 1, np.zeros(60, np.int64)])
    dst[n - 1:] = src[n - 1:] + rng.integers(1, 20, 60)
    A = sp.coo_matrix((np.ones(len(src)), (src, dst)), shape=(n, n))
    A = ((A + A.T) > 0).astype(np.float64)
    A.setdiag(0)
    A = sp.csr_matrix(A)
    A.eliminate_zeros()
    M = CooMatrix.from_scipy(A)
    c = compute_centrality(M, "eig")
    # odd Q exercises the candidate-batch padding to the 'cands' axis size
    r_coo = greedy_krylov(A, 5, 13, c, order="min", tol=1e-8, mode="break",
                          backend="coo")
    r_sh = greedy_krylov(A, 5, 13, c, order="min", tol=1e-8, mode="break",
                         backend="sharded")
    np.testing.assert_array_equal(r_coo.edges, r_sh.edges)
    np.testing.assert_allclose(r_coo.rob_variation, r_sh.rob_variation,
                               rtol=1e-10)
    assert (r_coo.A_new != r_sh.A_new).nnz == 0


def test_greedy_sharded_backend_make_matches_single_device():
    """make mode on the sharded backend: pre-allocated explicit-zero
    addition slots survive the row-partitioned packing."""
    import jax
    import scipy.sparse as sp

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    n = 150
    rng = np.random.default_rng(12)
    i = np.arange(n - 1)
    src = np.concatenate([i, rng.integers(0, n - 21, 50)])
    dst = np.concatenate([i + 1, np.zeros(50, np.int64)])
    dst[n - 1:] = src[n - 1:] + rng.integers(1, 20, 50)
    A = sp.coo_matrix((np.ones(len(src)), (src, dst)), shape=(n, n))
    A = ((A + A.T) > 0).astype(np.float64)
    A.setdiag(0)
    A = sp.csr_matrix(A)
    A.eliminate_zeros()
    M = CooMatrix.from_scipy(A)
    c = compute_centrality(M, "eig")
    r_coo = greedy_krylov(A, 3, 10, c, order="min", tol=1e-8, mode="make",
                          backend="coo")
    r_sh = greedy_krylov(A, 3, 10, c, order="min", tol=1e-8, mode="make",
                         backend="sharded")
    np.testing.assert_array_equal(r_coo.edges, r_sh.edges)
    np.testing.assert_allclose(r_coo.rob_variation, r_sh.rob_variation,
                               rtol=1e-10)
    assert (r_coo.A_new != r_sh.A_new).nnz == 0


@pytest.mark.parametrize("mode", ["break", "make"])
def test_greedy_score_reuse_identical_picks(mode):
    """rescore_every>1 (per-step candidate-score reuse, VERDICT r3 item 6)
    must commit the same edges as the full-rescore protocol: every winner
    carries a fresh score and drift is bounded by the periodic full
    rescore + incident-neighborhood refresh."""
    n = 150
    rng = np.random.default_rng(23)
    i = np.arange(n - 1)
    src = np.concatenate([i, rng.integers(0, n - 21, 80)])
    dst = np.concatenate([i + 1, np.zeros(80, np.int64)])
    dst[n - 1:] = src[n - 1:] + rng.integers(1, 20, 80)
    A = sp.coo_matrix((np.ones(len(src)), (src, dst)), shape=(n, n))
    A = ((A + A.T) > 0).astype(np.float64)
    A.setdiag(0)
    A = sp.csr_matrix(A)
    A.eliminate_zeros()
    M = CooMatrix.from_scipy(A)
    c = compute_centrality(M, "eig")
    r_full = greedy_krylov(A, 8, 30, c, order="min", tol=1e-8, mode=mode,
                           backend="coo")
    r_reuse = greedy_krylov(A, 8, 30, c, order="min", tol=1e-8, mode=mode,
                            backend="coo", rescore_every=4,
                            rescore_frac=0.2)
    np.testing.assert_array_equal(r_full.edges, r_reuse.edges)
    np.testing.assert_allclose(r_full.rob_variation, r_reuse.rob_variation,
                               rtol=1e-10)
    assert (r_full.A_new != r_reuse.A_new).nnz == 0


@pytest.mark.parametrize("backend", ["sharded", "bsr"])
@pytest.mark.parametrize("mode", ["break", "make"])
def test_greedy_score_reuse_other_backends(mode, backend):
    """Score-reuse × {sharded, bsr} composition (VERDICT r4 item 4a): the
    reuse bookkeeping lives in the shared ``_greedy_loop``, but the
    fixed-shape fresh-subset batches must survive each backend's padding."""
    import jax

    if backend == "sharded" and len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    n = 150
    rng = np.random.default_rng(23)
    i = np.arange(n - 1)
    src = np.concatenate([i, rng.integers(0, n - 21, 80)])
    dst = np.concatenate([i + 1, np.zeros(80, np.int64)])
    dst[n - 1:] = src[n - 1:] + rng.integers(1, 20, 80)
    A = sp.coo_matrix((np.ones(len(src)), (src, dst)), shape=(n, n))
    A = ((A + A.T) > 0).astype(np.float64)
    A.setdiag(0)
    A = sp.csr_matrix(A)
    A.eliminate_zeros()
    M = CooMatrix.from_scipy(A)
    c = compute_centrality(M, "eig")
    r_full = greedy_krylov(A, 6, 30, c, order="min", tol=1e-8, mode=mode,
                           backend="coo")
    r_reuse = greedy_krylov(A, 6, 30, c, order="min", tol=1e-8, mode=mode,
                            backend=backend, rescore_every=3,
                            rescore_frac=0.2)
    np.testing.assert_array_equal(r_full.edges, r_reuse.edges)
    np.testing.assert_allclose(r_full.rob_variation, r_reuse.rob_variation,
                               rtol=1e-10)
    assert (r_full.A_new != r_reuse.A_new).nnz == 0


@pytest.mark.parametrize("mode", ["break", "make"])
def test_greedy_fused_identical_picks(mode):
    """fused_steps>1 (R budget steps per device dispatch, optimize/fused.py)
    must commit the same edge sequence as the per-step loop on both modes.
    k=7 with R=4 also exercises the truncated final block (want=3 < R), whose
    device state is reconstructed from the accepted winners only."""
    n = 150
    rng = np.random.default_rng(23)
    i = np.arange(n - 1)
    src = np.concatenate([i, rng.integers(0, n - 21, 80)])
    dst = np.concatenate([i + 1, np.zeros(80, np.int64)])
    dst[n - 1:] = src[n - 1:] + rng.integers(1, 20, 80)
    A = sp.coo_matrix((np.ones(len(src)), (src, dst)), shape=(n, n))
    A = ((A + A.T) > 0).astype(np.float64)
    A.setdiag(0)
    A = sp.csr_matrix(A)
    A.eliminate_zeros()
    M = CooMatrix.from_scipy(A)
    c = compute_centrality(M, "eig")
    r_step = greedy_krylov(A, 7, 30, c, order="min", tol=1e-8, mode=mode,
                           backend="coo")
    r_fused = greedy_krylov(A, 7, 30, c, order="min", tol=1e-8, mode=mode,
                            backend="coo", fused_steps=4)
    np.testing.assert_array_equal(r_step.edges, r_fused.edges)
    np.testing.assert_allclose(r_step.rob_variation, r_fused.rob_variation,
                               rtol=1e-9)
    assert (r_step.A_new != r_fused.A_new).nnz == 0
    assert len(r_fused.per_step_time) == 7


@pytest.mark.parametrize("backend", ["sharded", "bsr"])
def test_greedy_fused_other_backends(backend):
    """Fused blocks over the sharded (row-partitioned + cands-sharded) and
    BSR (super-tile value-scatter) operators match the per-step COO loop."""
    import jax

    if backend == "sharded" and len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    n = 150
    rng = np.random.default_rng(5)
    i = np.arange(n - 1)
    src = np.concatenate([i, rng.integers(0, n - 21, 60)])
    dst = np.concatenate([i + 1, np.zeros(60, np.int64)])
    dst[n - 1:] = src[n - 1:] + rng.integers(1, 20, 60)
    A = sp.coo_matrix((np.ones(len(src)), (src, dst)), shape=(n, n))
    A = ((A + A.T) > 0).astype(np.float64)
    A.setdiag(0)
    A = sp.csr_matrix(A)
    A.eliminate_zeros()
    M = CooMatrix.from_scipy(A)
    c = compute_centrality(M, "eig")
    for mode in ("break", "make"):
        r_coo = greedy_krylov(A, 5, 13, c, order="min", tol=1e-8, mode=mode,
                              backend="coo")
        r_f = greedy_krylov(A, 5, 13, c, order="min", tol=1e-8, mode=mode,
                            backend=backend, fused_steps=3)
        np.testing.assert_array_equal(r_coo.edges, r_f.edges)
        np.testing.assert_allclose(r_coo.rob_variation, r_f.rob_variation,
                                   rtol=1e-9)
        assert (r_coo.A_new != r_f.A_new).nnz == 0


def test_greedy_sharded_bsr_backend_matches_coo():
    """backend='sharded_bsr' — the super-tile Pallas kernel as the LOCAL
    SpMM of the row-partitioned operator (VERDICT r4 item 2), globally
    RCM-permuted, interpret mode on the 8-device virtual mesh — must
    reproduce the per-step COO loop edge-for-edge on both modes, per-step
    and fused."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs a multi-device mesh")
    n = 150
    rng = np.random.default_rng(5)
    i = np.arange(n - 1)
    src = np.concatenate([i, rng.integers(0, n - 21, 60)])
    dst = np.concatenate([i + 1, np.zeros(60, np.int64)])
    dst[n - 1:] = src[n - 1:] + rng.integers(1, 20, 60)
    A = sp.coo_matrix((np.ones(len(src)), (src, dst)), shape=(n, n))
    A = ((A + A.T) > 0).astype(np.float64)
    A.setdiag(0)
    A = sp.csr_matrix(A)
    A.eliminate_zeros()
    M = CooMatrix.from_scipy(A)
    c = compute_centrality(M, "eig")
    for mode in ("break", "make"):
        r_coo = greedy_krylov(A, 4, 13, c, order="min", tol=1e-8, mode=mode,
                              backend="coo")
        r_sb = greedy_krylov(A, 4, 13, c, order="min", tol=1e-8, mode=mode,
                             backend="sharded_bsr")
        np.testing.assert_array_equal(r_coo.edges, r_sb.edges)
        np.testing.assert_allclose(r_coo.rob_variation, r_sb.rob_variation,
                                   rtol=1e-9)
        assert (r_coo.A_new != r_sb.A_new).nnz == 0
        r_sf = greedy_krylov(A, 4, 13, c, order="min", tol=1e-8, mode=mode,
                             backend="sharded_bsr", fused_steps=3)
        np.testing.assert_array_equal(r_coo.edges, r_sf.edges)
        assert (r_coo.A_new != r_sf.A_new).nnz == 0


def test_greedy_fused_sinh_and_f32_floor():
    """Fused lane with a non-exp matrix function (sinh) in f64, and the
    f32 Sturm + gnorm-scaled floor path (the TPU configuration) — both
    must reproduce the per-step loop's picks."""
    import jax.numpy as jnp

    n = 150
    rng = np.random.default_rng(23)
    i = np.arange(n - 1)
    src = np.concatenate([i, rng.integers(0, n - 21, 80)])
    dst = np.concatenate([i + 1, np.zeros(80, np.int64)])
    dst[n - 1:] = src[n - 1:] + rng.integers(1, 20, 80)
    A = sp.coo_matrix((np.ones(len(src)), (src, dst)), shape=(n, n))
    A = ((A + A.T) > 0).astype(np.float64)
    A.setdiag(0)
    A = sp.csr_matrix(A)
    A.eliminate_zeros()
    M = CooMatrix.from_scipy(A)
    c = compute_centrality(M, "eig")
    r1 = greedy_krylov(A, 5, 20, c, order="min", tol=1e-8, mode="break",
                       backend="coo", fun="sinh")
    r2 = greedy_krylov(A, 5, 20, c, order="min", tol=1e-8, mode="break",
                       backend="coo", fun="sinh", fused_steps=3)
    np.testing.assert_array_equal(r1.edges, r2.edges)
    # f32 + Sturm + floor (the production TPU dtype) on the same graph
    lam = float(np.max(np.linalg.eigvalsh(A.toarray())))
    tol32 = 1e-6 * float(np.exp(lam))
    r3 = greedy_krylov(A, 5, 20, c, order="min", tol=tol32, mode="break",
                       backend="coo", dtype=jnp.float32)
    r4 = greedy_krylov(A, 5, 20, c, order="min", tol=tol32, mode="break",
                       backend="coo", dtype=jnp.float32, fused_steps=3)
    np.testing.assert_array_equal(r3.edges, r4.edges)


@pytest.mark.parametrize("mode", ["break", "make"])
def test_greedy_fused_straggler_fallback(mode):
    """A fused budget too small for convergence (rounds=1 × round_len=3)
    must route EVERY step through the accurate per-step fallback and still
    reproduce the per-step loop exactly — the convergence guarantee survives
    fusing."""
    import jax.numpy as jnp

    from krylov_robustness_tpu.optimize.greedy import (
        _FrozenStructureMatrix,
        _greedy_loop_fused,
    )

    n = 150
    rng = np.random.default_rng(23)
    i = np.arange(n - 1)
    src = np.concatenate([i, rng.integers(0, n - 21, 80)])
    dst = np.concatenate([i + 1, np.zeros(80, np.int64)])
    dst[n - 1:] = src[n - 1:] + rng.integers(1, 20, 80)
    A = sp.coo_matrix((np.ones(len(src)), (src, dst)), shape=(n, n))
    A = ((A + A.T) > 0).astype(np.float64)
    A.setdiag(0)
    A = sp.csr_matrix(A)
    A.eliminate_zeros()
    M = CooMatrix.from_scipy(A)
    c = compute_centrality(M, "eig")
    r_step = greedy_krylov(A, 4, 20, c, order="min", tol=1e-10, mode=mode,
                           backend="coo")
    if mode == "make":
        top = find_top_missing_edges(A, c, 20 + 4, "min")
    else:
        top = find_top_edges(A, c, 20 + 4, "min")
    F = _FrozenStructureMatrix(
        A, extra_edges=top if mode == "make" else None, dtype=jnp.float64)
    r_f = _greedy_loop_fused(
        F, top, 20, 4, mode, -1.0 if mode == "break" else 1.0, "exp",
        1e-10, 1.0, (6, 6, 8, 12, 20, 28, 20), 0.0, None, "",
        R=3, rounds=1, round_len=3)
    np.testing.assert_array_equal(r_step.edges, r_f.edges)
    np.testing.assert_allclose(r_step.rob_variation, r_f.rob_variation,
                               rtol=1e-10)
    assert (r_step.A_new != r_f.A_new).nnz == 0
