"""Row-sharded SpMM over the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from helpers import random_graph
from krylov_robustness_tpu.parallel.mesh import make_mesh
from krylov_robustness_tpu.parallel.spmm_sharded import RowShardedMatrix


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


def test_sharded_spmm_matches_scipy(mesh):
    n = 333  # deliberately not divisible by 8
    A = random_graph(n, 0.05, seed=1, weighted=True)
    M = RowShardedMatrix.from_scipy(A, mesh)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((n, 5))
    got = np.asarray(M @ jnp.asarray(x))
    np.testing.assert_allclose(got, A @ x, rtol=1e-12, atol=1e-12)


def test_sharded_spmm_sharded_io(mesh):
    n = 512
    A = random_graph(n, 0.04, seed=2, weighted=True)
    M = RowShardedMatrix.from_scipy(A, mesh)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((n, 3))
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("rows", None)))
    y = M.spmm_sharded(xs)
    # output is row-sharded
    assert y.sharding.spec == P("rows", None)
    np.testing.assert_allclose(np.asarray(y), A @ x, rtol=1e-12, atol=1e-12)


def test_sharded_spmm_2d_mesh_batch_axis():
    """2-D mesh: rows × candidate batch ('cands') — the column dimension is
    data-parallel over the second axis (SURVEY.md §2.5 DP ∘ row sharding)."""
    from krylov_robustness_tpu.parallel.mesh import make_mesh_2d

    mesh2 = make_mesh_2d(4, 2)
    n, b = 256, 6
    A = random_graph(n, 0.05, seed=3, weighted=True)
    M = RowShardedMatrix.from_scipy(A, mesh2, batch_axis="cands")
    rng = np.random.default_rng(2)
    x = rng.standard_normal((n, b))
    xs = jax.device_put(jnp.asarray(x),
                        NamedSharding(mesh2, P("rows", "cands")))
    y = M.spmm_sharded(xs)
    assert y.sharding.spec == P("rows", "cands")
    np.testing.assert_allclose(np.asarray(y), A @ x, rtol=1e-12, atol=1e-12)
    # replicated convenience API also works on the 2-D-bound operator
    np.testing.assert_allclose(np.asarray(M @ jnp.asarray(x)), A @ x,
                               rtol=1e-12, atol=1e-12)


def test_krylov_on_sharded_operator(mesh):
    """The single-chip Krylov layers run unchanged on the sharded operator."""
    from krylov_robustness_tpu.updates.trace_update import (
        trace_fun_update_edges,
    )
    import scipy.linalg

    n = 200
    A = random_graph(n, 0.04, seed=10)
    M = RowShardedMatrix.from_scipy(A, mesh)
    Ad = A.toarray()
    iu, ju = np.nonzero(np.tril(Ad, -1))
    edges = np.stack([iu[:6], ju[:6]], axis=1)

    # RowShardedMatrix is a pytree: the Krylov layers consume it directly
    # (blocks are built at the padded size M.n; extra rows stay zero)
    res = trace_fun_update_edges(M, edges, sign=-1.0, tol=1e-4)

    def dense_delta(i, j):
        At = Ad.copy()
        At[i, j] -= 1
        At[j, i] -= 1
        return np.sum(np.exp(np.linalg.eigvalsh(At))) - np.sum(
            np.exp(np.linalg.eigvalsh(Ad))
        )

    want = np.array([dense_delta(i, j) for i, j in edges])
    np.testing.assert_allclose(np.asarray(res.delta), want, rtol=1e-6)




def test_taylor_plan_and_entries_on_sharded_operator(mesh):
    """Plan builders and the fused expmv entry evaluator accept the sharded
    operator: the .rows global-id view makes select_taylor_degree see the
    same COO triple (padding slots carry val 0), so the plan — and the
    f(A)_ij entries built from it — match the single-device CooMatrix path."""
    import scipy.linalg

    from krylov_robustness_tpu.funm.expmv import select_taylor_degree
    from krylov_robustness_tpu.ops.sparse import CooMatrix
    from krylov_robustness_tpu.updates.entries import entries_of_f_expmv

    n = 96
    A = random_graph(n, 0.06, seed=3)
    M1 = CooMatrix.from_scipy(A)
    M8 = RowShardedMatrix.from_scipy(A, mesh)

    p1 = select_taylor_degree(M1, t=1.0, b_cols=4)
    p8 = select_taylor_degree(M8, t=1.0, b_cols=4)
    assert (p1.m, p1.s, p1.mu) == (p8.m, p8.s, p8.mu)

    Ad = A.toarray()
    iu, ju = np.nonzero(np.tril(Ad, -1))
    omega = np.stack([iu[:5], ju[:5]], axis=1)
    want = scipy.linalg.expm(Ad)[omega[:, 0], omega[:, 1]]
    got, _ = entries_of_f_expmv(M8, omega, fun="exp")
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-8, atol=1e-12)


def test_row_sharded_ell_layout_matches_scipy():
    """ELL local blocks (native pack_ell) reproduce the COO-layout SpMM."""
    import numpy as np
    import scipy.sparse as sp
    import jax.numpy as jnp

    from helpers import random_graph
    from krylov_robustness_tpu.parallel.mesh import make_mesh
    from krylov_robustness_tpu.parallel.spmm_sharded import RowShardedMatrix

    A = random_graph(150, 0.05, seed=9)
    mesh = make_mesh(4)
    M = RowShardedMatrix.from_scipy(A, mesh, dtype=jnp.float64, layout="ell")
    assert M.layout == "ell" and M.cols.ndim == 2
    x = np.random.default_rng(3).standard_normal((150, 5))
    got = np.asarray(M @ jnp.asarray(x))
    np.testing.assert_allclose(got, A @ x, rtol=1e-12, atol=1e-12)


def test_bsr_row_sharded_matches_scipy():
    """BsrRowShardedMatrix (super-tile Pallas local SpMM under shard_map,
    interpret mode): replicated matmul and value edits reproduce scipy on
    1-D and 2-D ('cands') meshes with an odd n (row padding exercised)."""
    import scipy.sparse as sp

    from krylov_robustness_tpu.parallel.mesh import make_mesh_2d
    from krylov_robustness_tpu.parallel.spmm_sharded import BsrRowShardedMatrix

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    rng = np.random.default_rng(3)
    n = 301
    A = sp.random(n, n, density=0.03, random_state=7, format="csr")
    A = ((A + A.T) > 0).astype(np.float64)
    A.setdiag(0)
    A.eliminate_zeros()
    A = sp.csr_matrix(A)
    for mesh, ba in [(make_mesh(8), None), (make_mesh_2d(4, 2), "cands")]:
        S = BsrRowShardedMatrix.from_scipy(
            A, mesh, dtype=jnp.float64, batch_axis=ba, tile=(128, 128),
            interpret=True)
        x = rng.standard_normal((n, 8))
        got = np.asarray(S @ jnp.asarray(x))
        np.testing.assert_allclose(got, A @ x, rtol=1e-12, atol=1e-12)
    # frozen-structure value edit: zero a symmetric pair
    S = BsrRowShardedMatrix.from_scipy(A, make_mesh(8), dtype=jnp.float64,
                                       tile=(128, 128), interpret=True)
    rc = S.entry_rc()
    pos = S.entry_positions()
    i, j = rc[5]
    sel = (((rc[:, 0] == i) & (rc[:, 1] == j))
           | ((rc[:, 0] == j) & (rc[:, 1] == i)))
    S.set_flat(pos[sel], 0.0)
    A2 = A.copy()
    A2[i, j] = 0
    A2[j, i] = 0
    A2.eliminate_zeros()
    x = rng.standard_normal((n, 4))
    np.testing.assert_allclose(np.asarray(S @ jnp.asarray(x)), A2 @ x,
                               rtol=1e-12, atol=1e-12)


def test_bsr_row_sharded_overlap_split_matches_single_pass():
    """The gather/compute overlap split (diag tiles on local x + off tiles
    on gathered x, SURVEY §7) must reproduce the single-pass product, and
    the diag set must actually be populated."""
    import scipy.sparse as sp

    from krylov_robustness_tpu.parallel.spmm_sharded import BsrRowShardedMatrix

    if len(jax.devices()) < 4:
        pytest.skip("needs a multi-device mesh")
    rng = np.random.default_rng(4)
    n = 700
    A = sp.random(n, n, density=0.02, random_state=3, format="csr")
    A = ((A + A.T) > 0).astype(np.float64)
    A.setdiag(0)
    A.eliminate_zeros()
    A = sp.csr_matrix(A)
    mesh = make_mesh(4)
    S1 = BsrRowShardedMatrix.from_scipy(A, mesh, dtype=jnp.float64,
                                        tile=(128, 128), interpret=True,
                                        overlap=True)
    S0 = BsrRowShardedMatrix.from_scipy(A, mesh, dtype=jnp.float64,
                                        tile=(128, 128), interpret=True,
                                        overlap=False)
    assert S1.n_diag > 0 and S0.n_diag == 0
    x = rng.standard_normal((n, 8))
    y1 = np.asarray(S1 @ jnp.asarray(x))
    y0 = np.asarray(S0 @ jnp.asarray(x))
    np.testing.assert_allclose(y1, A @ x, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(y0, A @ x, rtol=1e-12, atol=1e-12)
    # value edits address the concatenated (diag+off) tile storage
    rc = S1.entry_rc()
    pos = S1.entry_positions()
    i, j = rc[3]
    sel = (((rc[:, 0] == i) & (rc[:, 1] == j))
           | ((rc[:, 0] == j) & (rc[:, 1] == i)))
    S1.set_flat(pos[sel], 0.0)
    A2 = A.copy()
    A2[i, j] = 0
    A2[j, i] = 0
    A2.eliminate_zeros()
    np.testing.assert_allclose(np.asarray(S1 @ jnp.asarray(x)), A2 @ x,
                               rtol=1e-12, atol=1e-12)


def test_bsr_row_sharded_super_visits_contiguous():
    """Kernel invariant: within each tile segment (diag pass, off pass),
    the super-row output index must be NON-DECREASING — the Pallas grid
    flushes an output block when the index changes, and revisiting an
    already-flushed block on compiled TPU reads a stale accumulator. Pad
    tiles must therefore continue the LAST super-row, never revisit 0
    (regression for the round-5 review finding)."""
    import scipy.sparse as sp

    from krylov_robustness_tpu.parallel.spmm_sharded import BsrRowShardedMatrix

    if len(jax.devices()) < 4:
        pytest.skip("needs a multi-device mesh")
    # highly unbalanced shards: shard 0 dense-ish rows, later shards sparse
    rng = np.random.default_rng(0)
    n = 600
    rows = np.concatenate([rng.integers(0, 80, 900),
                           rng.integers(80, n, 60)])
    cols = rng.integers(0, n, len(rows))
    A = sp.coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n))
    A = ((A + A.T) > 0).astype(np.float64)
    A.setdiag(0)
    A = sp.csr_matrix(A)
    A.eliminate_zeros()
    mesh = make_mesh(4)
    for overlap in (False, True):
        S = BsrRowShardedMatrix.from_scipy(A, mesh, dtype=jnp.float64,
                                           tile=(128, 128), interpret=True,
                                           overlap=overlap)
        sup = np.asarray(S.sup)
        nd = S.n_diag or sup.shape[1]
        for d in range(sup.shape[0]):
            assert (np.diff(sup[d, :nd]) >= 0).all(), (overlap, d)
            if S.n_diag:
                assert (np.diff(sup[d, nd:]) >= 0).all(), (overlap, d)
        # and the product still matches scipy
        x = rng.standard_normal((n, 4))
        np.testing.assert_allclose(np.asarray(S @ jnp.asarray(x)), A @ x,
                                   rtol=1e-12, atol=1e-12)
