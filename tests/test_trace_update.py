"""Batched trace_fun_update vs dense oracle (the reference's debug==3 check,
trace_fun_update.m:91-102, promoted to a unit test)."""

import numpy as np
import pytest
import scipy.linalg

import jax.numpy as jnp

from helpers import random_graph
from krylov_robustness_tpu.funm.dense import trace_fun_update_dense
from krylov_robustness_tpu.ops.sparse import CooMatrix
from krylov_robustness_tpu.updates.trace_update import (
    edge_B,
    edge_start_blocks,
    trace_fun_update_batched,
    trace_fun_update_edges,
)


def dense_delta(A, i, j, sign, fun=np.exp):
    At = A.copy()
    At[i, j] += sign
    At[j, i] += sign
    w1 = np.linalg.eigvalsh((At + At.T) / 2)
    w2 = np.linalg.eigvalsh((A + A.T) / 2)
    return np.sum(fun(w1)) - np.sum(fun(w2))


@pytest.mark.parametrize("sign", [-1.0, 1.0])
def test_edges_match_dense(sign):
    n = 200
    A = random_graph(n, 0.04, seed=10)
    M = CooMatrix.from_scipy(A)
    Ad = A.toarray()
    rng = np.random.default_rng(4)
    if sign < 0:
        iu, ju = np.nonzero(np.tril(Ad, -1))
    else:
        iu, ju = np.nonzero(np.tril(1 - Ad, -1))
    pick = rng.choice(len(iu), size=12, replace=False)
    edges = np.stack([iu[pick], ju[pick]], axis=1)
    # reference tolerance semantics: absolute, scaled by exp(||A||)
    res = trace_fun_update_edges(M, edges, sign=sign, tol=1e-2)
    got = np.asarray(res.delta)
    want = np.array([dense_delta(Ad, i, j, sign) for i, j in edges])
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8 * np.abs(want).max())
    assert bool(np.all(np.asarray(res.converged)))


def test_edges_chunked_matches_unchunked(monkeypatch):
    """Full-candidate-set scoring chunks the batch when batch·n would blow
    HBM (Birmingham/Sydney full-E OOM); chunked == unchunked, including the
    padded final chunk."""
    import krylov_robustness_tpu.updates.trace_update as tu

    n = 150
    A = random_graph(n, 0.06, seed=11)
    M = CooMatrix.from_scipy(A)
    iu, ju = np.nonzero(np.tril(A.toarray(), -1))
    edges = np.stack([iu, ju], axis=1)[:700]  # 700 candidates

    full = trace_fun_update_edges(M, edges, sign=-1.0, tol=1e-2)
    # chunk = max(256, ...) -> 256 per chunk: 2 full chunks + padded tail
    monkeypatch.setattr(tu, "MAX_SCORE_CELLS", 256 * n)
    chunked = trace_fun_update_edges(M, edges, sign=-1.0, tol=1e-2)
    np.testing.assert_allclose(np.asarray(chunked.delta),
                               np.asarray(full.delta), rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(chunked.converged),
                                  np.asarray(full.converged))
    assert chunked.delta.shape == (700,)


def test_edges_chunked_sharded_matches_single_device(monkeypatch):
    """HBM chunking × 'cands'-axis padding composition (VERDICT r4 item 4b):
    a full-E-sized batch on the candidate-sharded 8-device operator must
    reproduce single-device scores through the interacting pads at
    updates/trace_update.py (chunk rounded to the cands multiple, final
    chunk padded with a repeated edge)."""
    import jax

    import krylov_robustness_tpu.updates.trace_update as tu
    from krylov_robustness_tpu.parallel.mesh import make_mesh_2d
    from krylov_robustness_tpu.parallel.spmm_sharded import RowShardedMatrix

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    n = 150
    A = random_graph(n, 0.06, seed=11)
    M = CooMatrix.from_scipy(A)
    iu, ju = np.nonzero(np.tril(A.toarray(), -1))
    edges = np.stack([iu, ju], axis=1)[:655]  # odd batch: tail pad needed

    # tol is ABSOLUTE (the drivers pass 1e-6·exp(‖A‖)); deltas here are
    # O(1e6), so 1e-2 matches the protocol's relative tightness
    full = trace_fun_update_edges(M, edges, sign=-1.0, tol=1e-2)
    mesh = make_mesh_2d(4, 2)  # ('cands', 4) x ('rows', 2)
    S = RowShardedMatrix.from_scipy(A, mesh, batch_axis="cands")
    # chunk floor: 64-candidate chunks, each padded/rounded to the cands
    # multiple -> many chunk boundaries interact with the axis padding
    monkeypatch.setattr(tu, "MAX_SCORE_CELLS", 64 * n)
    sh = trace_fun_update_edges(S, edges, sign=-1.0, tol=1e-2)
    np.testing.assert_allclose(np.asarray(sh.delta),
                               np.asarray(full.delta), rtol=1e-10)
    # flags compare as sets of converged candidates, not bitwise: a
    # borderline candidate's lag error can cross tol under the sharded
    # summation order — deltas above pin the values themselves
    assert bool(np.asarray(sh.converged).all())
    assert bool(np.asarray(full.converged).all())
    assert sh.delta.shape == (655,)


@pytest.mark.parametrize("fname,f_np", [
    ("sinh", np.sinh),
    ("cosh", np.cosh),
])
def test_other_functions(fname, f_np):
    n = 120
    A = random_graph(n, 0.06, seed=11)
    M = CooMatrix.from_scipy(A)
    Ad = A.toarray()
    iu, ju = np.nonzero(np.tril(Ad, -1))
    edges = np.stack([iu[:6], ju[:6]], axis=1)
    res = trace_fun_update_edges(M, edges, sign=-1.0, fun=fname, tol=1e-4)
    want = np.array([dense_delta(Ad, i, j, -1.0, f_np) for i, j in edges])
    np.testing.assert_allclose(
        np.asarray(res.delta), want, rtol=1e-6, atol=1e-8 * np.abs(want).max()
    )


def test_general_low_rank_update():
    """Arbitrary (U, B) rank-3 correction, as used by the edge2low_rank
    re-scoring path (test_unweighted_break.m:93-95)."""
    n = 150
    A = random_graph(n, 0.05, seed=12)
    M = CooMatrix.from_scipy(A)
    rng = np.random.default_rng(6)
    U = rng.standard_normal((n, 3))
    B = rng.standard_normal((3, 3))
    B = (B + B.T) / 2
    res = trace_fun_update_batched(
        M, jnp.asarray(U)[None], jnp.asarray(B)[None], tol=1e-4
    )
    want = float(
        trace_fun_update_dense(jnp.asarray(A.toarray()), jnp.asarray(U), jnp.asarray(B), "exp")
    )
    np.testing.assert_allclose(float(res.delta[0]), want, rtol=1e-6)


def test_twin_nodes_deflation():
    """Twin nodes (identical adjacency rows) make the block A·[e_i, e_j]
    rank-deficient after one step. That must deflate and keep iterating —
    NOT freeze as a lucky breakdown (the bug class found on Journals: the
    reference's MATLAB qr continues with a completed basis,
    ``lanczos_krylov.m:90``)."""
    n = 180
    A = random_graph(n, 0.05, seed=20).toarray()
    # make nodes 0/1 adjacent twins and 2/3 non-adjacent twins
    A[1, :] = A[0, :]
    A[:, 1] = A[:, 0]
    A[0, 1] = A[1, 0] = 1.0
    A[3, :] = A[2, :]
    A[:, 3] = A[:, 2]
    A[2, 3] = A[3, 2] = 0.0
    np.fill_diagonal(A, 0.0)
    import scipy.sparse as sp

    M = CooMatrix.from_scipy(sp.csr_matrix(A))
    iu, ju = np.nonzero(np.tril(A, -1))
    twin_edges = np.array([[1, 0]] + [[i, j] for i, j in zip(iu, ju)
                                      if {i, j} & {0, 1, 2, 3}][:5])
    res = trace_fun_update_edges(M, twin_edges, sign=-1.0, tol=1e-8)
    want = np.array([dense_delta(A, i, j, -1.0) for i, j in twin_edges])
    np.testing.assert_allclose(
        np.asarray(res.delta), want, rtol=1e-6, atol=1e-8 * np.abs(want).max()
    )


def test_dense_fast_path_small_n():
    """n ≤ 130 must take the exact dense path unconditionally
    (``trace_fun_update.m:37-51``) — including joint high-rank updates that
    saturate the Krylov space (cross-method rescoring on small graphs)."""
    n = 124
    A = random_graph(n, 0.5, seed=21)  # dense-ish, Journals-like
    M = CooMatrix.from_scipy(A)
    Ad = A.toarray()
    iu, ju = np.nonzero(np.tril(Ad, -1))
    edges = np.stack([iu[:50], ju[:50]], axis=1)
    from krylov_robustness_tpu.updates.low_rank import edge2low_rank

    U, B, _ = edge2low_rank(edges, n, sign=-1.0)
    res = trace_fun_update_batched(
        M, jnp.asarray(U)[None], jnp.asarray(B)[None], tol=1e-6
    )
    assert int(res.iters[0]) == 0  # dense path, no Krylov steps
    At = Ad.copy()
    for i, j in edges:
        At[i, j] = At[j, i] = 0.0
    want = float(np.sum(np.exp(np.linalg.eigvalsh(At)))
                 - np.sum(np.exp(np.linalg.eigvalsh(Ad))))
    np.testing.assert_allclose(float(res.delta[0]), want, rtol=1e-10)


def test_host_eigh_path_matches_device_path():
    """The TPU-session split (device recurrence + host projected eigh) must
    agree with the all-device phase path."""
    n = 200
    A = random_graph(n, 0.04, seed=10)
    M = CooMatrix.from_scipy(A)
    Ad = A.toarray()
    iu, ju = np.nonzero(np.tril(Ad, -1))
    edges = np.stack([iu[:10], ju[:10]], axis=1)
    r_dev = trace_fun_update_edges(M, edges, sign=-1.0, tol=1e-6)
    from krylov_robustness_tpu.updates.trace_update import (
        edge_B as _eB, edge_start_blocks as _esb,
    )

    U0 = _esb(n, jnp.asarray(edges), M.dtype)
    B = _eB(jnp.asarray(edges), -1.0, 1.0, M.dtype)
    r_host = trace_fun_update_batched(M, U0, B, tol=1e-6, host_eigh=True)
    np.testing.assert_allclose(
        np.asarray(r_host.delta), np.asarray(r_dev.delta), rtol=1e-8
    )
    assert bool(np.all(np.asarray(r_host.converged)))


def test_rescale():
    n = 100
    A = random_graph(n, 0.08, seed=13)
    M = CooMatrix.from_scipy(A)
    Ad = A.toarray()
    iu, ju = np.nonzero(np.tril(Ad, -1))
    edges = np.stack([iu[:4], ju[:4]], axis=1)
    res = trace_fun_update_edges(M, edges, sign=-1.0, rescale=2.0, tol=1e-4)
    want = np.array([dense_delta(Ad, i, j, -0.5) for i, j in edges])
    np.testing.assert_allclose(np.asarray(res.delta), want, rtol=1e-6)


def test_host_banded_eigh_matches_jit_path():
    """The TPU-session host path (banded LAPACK spectra of the
    block-tridiagonal projections) must match the jitted dense-eigh path."""
    import jax.numpy as jnp
    import scipy.sparse as sp

    from krylov_robustness_tpu.updates.trace_update import (
        edge_B,
        edge_start_blocks,
        trace_fun_update_batched,
    )

    A = random_graph(300, 0.04, seed=11)
    M = CooMatrix.from_scipy(A)
    C = sp.coo_matrix(sp.tril(A, -1))
    E = np.stack([C.row[:12], C.col[:12]], axis=1)
    U0 = edge_start_blocks(M.n, jnp.asarray(E), M.dtype)
    B = edge_B(jnp.asarray(E), -1.0, 1.0, M.dtype)
    r_jit = trace_fun_update_batched(M, U0, B, tol=1e-9, host_eigh=False)
    r_host = trace_fun_update_batched(M, U0, B, tol=1e-9, host_eigh=True)
    np.testing.assert_allclose(np.asarray(r_host.delta),
                               np.asarray(r_jit.delta), rtol=1e-9)


def test_band_from_blocks_matches_dense_assembly():
    # The banded storage built directly from recurrence blocks must equal
    # the lower band of the dense symmetrized projection the old host path
    # assembled (contrib blocks [coup; alpha; beta] per column block).
    from krylov_robustness_tpu.updates.trace_update import _band_from_blocks

    rng = np.random.default_rng(12)
    for bs in (1, 2, 3):
        m, batch = 7, 4
        h = rng.standard_normal((m, batch, 2 * bs, bs))
        beta = rng.standard_normal((m, batch, bs, bs))
        Cm = rng.standard_normal((batch, bs, bs))
        M = m * bs
        # dense reference (the pre-round-3 construction)
        G = np.zeros((batch, M + 2 * bs, M))
        for j in range(m):
            contrib = np.concatenate([h[j], beta[j]], axis=1)
            G[:, j * bs:(j + 3) * bs, j * bs:(j + 1) * bs] = contrib
        G = G[:, bs:bs + M, :]
        G = (G + np.swapaxes(G, -1, -2)) / 2
        tG = G.copy()
        tG[:, :bs, :bs] += (Cm + np.swapaxes(Cm, -1, -2)) / 2
        band_t, band_g = _band_from_blocks(h, beta, Cm, m, bs)
        nb = band_g.shape[1]
        for mat, band in ((tG, band_t), (G, band_g)):
            for d in range(nb):
                want = np.diagonal(mat, -d, axis1=1, axis2=2)
                np.testing.assert_allclose(band[:, d, :M - d], want,
                                           atol=1e-14)
            # nothing below the stored band
            assert np.max(np.abs(np.tril(mat, -nb))) == 0.0


def test_band_truncation_equals_principal_submatrix():
    # lag tests slice the SAME band arrays: the slice must equal the band
    # of the leading principal submatrix
    from krylov_robustness_tpu.updates.trace_update import _band_from_blocks

    rng = np.random.default_rng(13)
    bs, m, batch = 2, 9, 3
    h = rng.standard_normal((m, batch, 2 * bs, bs))
    beta = rng.standard_normal((m, batch, bs, bs))
    Cm = rng.standard_normal((batch, bs, bs))
    from krylov_robustness_tpu.updates.trace_update import (
        _eigvals_banded_batch,
    )

    band_t_full, band_g_full = _band_from_blocks(h, beta, Cm, m, bs)
    mp = 5
    band_t_trunc, band_g_trunc = _band_from_blocks(h, beta, Cm, mp, bs)
    Mp = mp * bs
    # raw arrays may differ in the LAPACK-unreferenced tail positions
    # (col+d >= Mp); the contract is that the sliced full band yields the
    # principal submatrix's spectrum
    for full, trunc in ((band_t_full, band_t_trunc),
                        (band_g_full, band_g_trunc)):
        np.testing.assert_allclose(
            _eigvals_banded_batch(np.ascontiguousarray(full[:, :, :Mp])),
            _eigvals_banded_batch(trunc),
            atol=1e-12,
        )


def test_host_lane_incremental_extension_bit_identical():
    """Forcing convergence past the speculated prefix (tol=0 runs the whole
    budget), the incremental-extension path must produce bit-identical
    deltas to a full-budget speculation (scan continuation == one long
    scan)."""
    from krylov_robustness_tpu.updates.trace_update import (
        _trace_update_host_eigh,
        edge_B,
        edge_start_blocks,
    )
    from krylov_robustness_tpu.funm.scalar import get_fun

    import scipy.sparse as sp

    A = random_graph(200, 0.05, seed=11)
    M = CooMatrix.from_scipy(A)
    C = sp.coo_matrix(sp.tril(A, -1))
    E = jnp.asarray(np.stack([C.row[:8], C.col[:8]], axis=1))
    U0 = edge_start_blocks(200, E, M.dtype)
    B = edge_B(E, -1.0, 1.0, M.dtype)
    sched = (6, 6, 8, 12)
    full = _trace_update_host_eigh(M, U0, B, get_fun("exp"), 0.0, sched,
                                   lag=2, spec_rounds=None)
    inc = _trace_update_host_eigh(M, U0, B, get_fun("exp"), 0.0, sched,
                                  lag=2, spec_rounds=1)
    np.testing.assert_array_equal(np.asarray(full.delta),
                                  np.asarray(inc.delta))
    np.testing.assert_array_equal(np.asarray(full.iters),
                                  np.asarray(inc.iters))
