"""Super-row BSR MXU kernel logic via interpret mode (CPU-runnable).

Pins the super-row packing / slab index-map / scratch accumulation / bf16
split logic of ops/pallas_bsr_super.py against scipy. The compiled-on-TPU
path is exercised by bench.py and scripts/probe_bsr_precision.py.
"""

import numpy as np
import scipy.sparse as sp

import jax.numpy as jnp

from krylov_robustness_tpu.ops.pallas_bsr_super import (
    SuperBsrOperator,
    pack_bsr_super,
)
from test_pallas_spmm import banded_graph


def test_super_bsr_matches_scipy_f32():
    A = banded_graph()
    op = SuperBsrOperator(A, dtype=jnp.float64, interpret=True, mode="f32")
    rng = np.random.default_rng(1)
    x = rng.standard_normal((A.shape[0], 5))
    got = np.asarray(op @ jnp.asarray(x))
    np.testing.assert_allclose(got, A @ x, rtol=1e-12, atol=1e-12)


def test_super_bsr_bf16_split_modes():
    A = banded_graph(n=700, max_off=50, extra=120, weighted=False)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((700, 9))
    ref = A @ x
    scale = np.abs(ref).max()
    op2 = SuperBsrOperator(A, dtype=jnp.float32, interpret=True, mode="bf16x2")
    err2 = np.abs(np.asarray(op2 @ jnp.asarray(x, jnp.float32)) - ref).max()
    assert err2 / scale < 3e-5  # two bf16 terms ≈ 2^-18
    op3 = SuperBsrOperator(A, dtype=jnp.float32, interpret=True, mode="bf16x3")
    err3 = np.abs(np.asarray(op3 @ jnp.asarray(x, jnp.float32)) - ref).max()
    assert err3 / scale < 3e-7  # three terms recover f32 accuracy
    # auto picks the bf16 path only for bf16-exact values
    assert SuperBsrOperator(A, dtype=jnp.float32, interpret=True).mode == "bf16x2"
    Aw = A.copy().astype(np.float64)
    Aw.data *= 1 + 1e-4 * np.arange(len(Aw.data))  # not bf16-exact
    assert SuperBsrOperator(Aw, dtype=jnp.float32, interpret=True).mode == "f32"


def test_super_bsr_wide_batch_chunking():
    """Batches wider than MAX_B run as column chunks (the Q=1000 greedy
    scoring width 2·Q would otherwise exceed the 16 MB scoped-vmem limit
    in the widened bf16 pass); values must match the unchunked product."""
    A = banded_graph(n=300, max_off=30, extra=60, weighted=False)
    rng = np.random.default_rng(4)
    op = SuperBsrOperator(A, dtype=jnp.float32, interpret=True, mode="bf16x3")
    old = SuperBsrOperator.MAX_B
    try:
        SuperBsrOperator.MAX_B = 256  # force 3 chunks at b=700
        x = rng.standard_normal((300, 700)).astype(np.float32)
        got = np.asarray(op @ jnp.asarray(x))
        ref = A @ x
        assert got.shape == ref.shape
        assert np.abs(got - ref).max() / np.abs(ref).max() < 3e-7
    finally:
        SuperBsrOperator.MAX_B = old


def test_super_bsr_nonmultiple_n_and_vector():
    A = banded_graph(n=333, max_off=60, extra=100)  # n_pad rounds to 512
    op = SuperBsrOperator(A, dtype=jnp.float64, interpret=True, mode="f32")
    x = np.random.default_rng(3).standard_normal(333)
    got = np.asarray(op @ jnp.asarray(x))
    np.testing.assert_allclose(got, A @ x, rtol=1e-12, atol=1e-12)
    assert got.shape == (333,)


def test_super_bsr_set_edge_symmetric():
    A = banded_graph(n=600, max_off=40, extra=50, weighted=False)
    op = SuperBsrOperator(A, dtype=jnp.float32, interpret=True, mode="bf16x3")
    C = sp.coo_matrix(sp.tril(A, -1))
    i, j = int(C.row[0]), int(C.col[0])
    op.set_edge(i, j, 0.0)
    A2 = A.copy().tolil()
    A2[i, j] = A2[j, i] = 0.0
    x = np.random.default_rng(4).standard_normal((600, 2))
    got = np.asarray(op @ jnp.asarray(x, jnp.float32))
    ref = sp.csr_matrix(A2) @ x
    assert np.abs(got - ref).max() / np.abs(ref).max() < 3e-7


def test_super_pack_flags_consistent():
    from krylov_robustness_tpu.ops.pallas_bsr_super import TILE_R

    A = banded_graph(n=1200, max_off=90, extra=200)
    atiles, meta, et, eo, n_pad = pack_bsr_super(sp.csr_matrix(A))
    slab, sup, start = meta
    # supers are contiguous and non-decreasing; one start flag per run
    assert np.all(np.diff(sup) >= 0)
    runs = np.unique(sup)
    assert start.sum() == len(runs)
    firsts = np.unique(sup, return_index=True)[1]
    assert np.all(start[firsts] == 1)
    # every super-row of the padded range is covered (y fully written)
    assert set(runs.tolist()) == set(range(n_pad // TILE_R))
    # values round-trip through the entry mapping
    coo = sp.csr_matrix(A)
    coo.sort_indices()
    coo = coo.tocoo()
    flat = atiles.reshape(len(atiles), -1)
    np.testing.assert_array_equal(flat[et, eo], coo.data)
