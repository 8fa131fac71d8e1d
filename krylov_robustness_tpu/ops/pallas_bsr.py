"""Pallas TPU block-sparse (BSR 128x128) MXU SpMM.

Motivation (measured on v5e, Vermont 95,672 nodes / 209k nnz, RCM-ordered):
the banded lane-gather kernel (:mod:`.pallas_spmm`) wins at narrow batch but
is VPU-op bound — it spends K·(2Wv+1) vector gathers per 128-lane chunk
regardless of which (slot, window) pairs are active (~4% utilization), so at
the batch widths the greedy scorer actually uses (2·Q ≈ 500 Lanczos columns)
it falls behind XLA's COO segment-sum (18.8 ms vs 6.9 ms per SpMM at b=512).

This kernel instead stores every nonzero 128x128 block of the RCM-permuted
matrix DENSELY and rides the MXU:

    y[rb] += A_block[t] @ x[cb[t]]        (one 128x128xb matmul per block)

Fill inside a block is ~4% for road networks, but the MXU makes 128x128
matmuls effectively free relative to the DMA: the SpMM cost is the stream of
block tables (nblk · 64 KB) + x window reads, independent of batch width
until b is large. Block metadata (cb, rb, first-of-row flags) rides scalar
prefetch so the x/y BlockSpec index maps can follow the sparsity pattern
(guide: PrefetchScalarGridSpec). Output revisiting is sequential because
blocks are sorted by row block — the y tile stays resident in VMEM across
the row's blocks and is zero-initialized at the first one.

Graphs whose block count would blow past the storage budget (hub-dominated
Misc graphs with no band structure) are dispatched to the XLA COO path by
:func:`make_bsr_operator`.

Replaces MATLAB's built-in sparse ``A*w`` (``lanczos_krylov.m:81``) for the
TPU hot path, like the banded kernel it supersedes at wide batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _bsr_kernel(cb_ref, rb_ref, first_ref, ablk_ref, x_ref, y_ref, *,
                precision):
    t = pl.program_id(0)

    @pl.when(first_ref[t] != 0)
    def _():
        y_ref[:] = jnp.zeros_like(y_ref)

    # Default HIGHEST: full-f32 MXU passes — plain bf16 (DEFAULT) loses
    # ~2e-3 relative accuracy per SpMM, far too lossy for 1e-6 Krylov
    # tolerances. HIGH (bf16_3x) is the measured speed/accuracy middle
    # ground; adjacency values (0/±1) are bf16-exact so only x rounds.
    y_ref[:] += jnp.dot(
        ablk_ref[0], x_ref[:], preferred_element_type=y_ref.dtype,
        precision=precision,
    )


@functools.partial(jax.jit, static_argnames=("interpret", "precision"))
def _bsr_spmm(cb, rb, first, ablocks, x_pad, interpret: bool = False,
              precision=jax.lax.Precision.HIGHEST):
    """x_pad: (n_pad, b) with n_pad a multiple of 128. Returns (n_pad, b)."""
    nblk = ablocks.shape[0]
    n_pad, b = x_pad.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # cb, rb, first
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, BLK, BLK), lambda t, cb, rb, first: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, b), lambda t, cb, rb, first: (cb[t], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLK, b), lambda t, cb, rb, first: (rb[t], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_bsr_kernel, precision=precision),
        out_shape=jax.ShapeDtypeStruct((n_pad, b), x_pad.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(cb, rb, first, ablocks, x_pad)


def pack_bsr(A_scipy):
    """Pack a (RCM-permuted) scipy matrix into sorted dense 128x128 blocks.

    Returns (ablocks (nblk,128,128) f64, cb, rb, first, entry_block,
    entry_offset) — the last two map CSR-order nnz index → (block id,
    flat offset inside the block) for frozen-structure value updates.
    Every row block is guaranteed at least one block (zero diagonal block
    inserted if needed) so all output tiles are initialized.
    """
    import scipy.sparse as sp

    A = sp.csr_matrix(A_scipy)
    A.sort_indices()
    n = A.shape[0]
    n_pad = _round_up(max(n, BLK), BLK)
    coo = A.tocoo()
    rb_e = coo.row // BLK
    cb_e = coo.col // BLK
    key = rb_e.astype(np.int64) * (n_pad // BLK) + cb_e
    uniq = np.unique(key)
    # ensure every row block appears (pad row blocks too: they have no rows,
    # but their y tiles must still be initialized — give them a zero diag
    # block)
    have_rb = np.unique(uniq // (n_pad // BLK))
    missing = np.setdiff1d(np.arange(n_pad // BLK), have_rb)
    if len(missing):
        extra = missing.astype(np.int64) * (n_pad // BLK) + missing
        uniq = np.sort(np.concatenate([uniq, extra]))
    key_pos = np.searchsorted(uniq, key)
    nblk = len(uniq)
    rb = (uniq // (n_pad // BLK)).astype(np.int32)
    cb = (uniq % (n_pad // BLK)).astype(np.int32)
    first = np.zeros(nblk, dtype=np.int32)
    first[np.unique(rb, return_index=True)[1]] = 1
    ablocks = np.zeros((nblk, BLK, BLK), dtype=np.float64)
    ri = coo.row % BLK
    ci = coo.col % BLK
    ablocks[key_pos, ri, ci] = coo.data
    # CSR-order entry mapping: coo from csr iterates in CSR order
    entry_block = key_pos.astype(np.int64)
    entry_offset = (ri * BLK + ci).astype(np.int64)
    return ablocks, cb, rb, first, entry_block, entry_offset


class _HostMeta:
    """Hashable-by-identity holder for host-side metadata (jit aux data)."""

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


@jax.tree_util.register_pytree_node_class
class BsrOperator:
    """Block-sparse MXU SpMM operator over a fixed sparsity structure.

    Same greedy-facing surface as ``BandedEllOperator``: ``__matmul__`` on
    (n, b) blocks, ``update_entry_values``/``set_edge`` for frozen-structure
    edits, pytree registration so value updates don't retrace. Works in
    whatever node ordering the input matrix has (pair with RCM via
    :func:`make_bsr_operator` to keep the block count low).
    """

    def tree_flatten(self):
        return (self.ablocks, self.cb, self.rb, self.first), (
            self.n, self.nnz, self.dtype, self.interpret, self.n_pad,
            self._meta, self.precision,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.ablocks, obj.cb, obj.rb, obj.first) = children
        (obj.n, obj.nnz, obj.dtype, obj.interpret, obj.n_pad,
         obj._meta, obj.precision) = aux
        obj._entry_block = obj._meta.entry_block
        obj._entry_offset = obj._meta.entry_offset
        obj._entry_rc = obj._meta.entry_rc
        return obj

    def __init__(self, A_scipy, dtype=jnp.float32, interpret: bool = False,
                 precision=jax.lax.Precision.HIGHEST):
        import scipy.sparse as sp

        self.precision = precision

        A = sp.csr_matrix(A_scipy)
        self.n = A.shape[0]
        self.nnz = int(A.nnz)
        self.dtype = dtype
        self.interpret = interpret
        self.n_pad = _round_up(max(self.n, BLK), BLK)
        ablocks, cb, rb, first, eb, eo = pack_bsr(A)
        self.ablocks = jnp.asarray(ablocks, dtype=dtype)
        self.cb = jnp.asarray(cb)
        self.rb = jnp.asarray(rb)
        self.first = jnp.asarray(first)
        self._entry_block = eb
        self._entry_offset = eo
        A.sort_indices()
        coo = A.tocoo()
        self._entry_rc = (coo.row.astype(np.int64), coo.col.astype(np.int64))
        self._meta = _HostMeta(entry_block=eb, entry_offset=eo,
                               entry_rc=self._entry_rc)

    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def nblocks(self) -> int:
        return int(self.ablocks.shape[0])

    def storage_bytes(self) -> int:
        return self.nblocks * BLK * BLK * jnp.dtype(self.dtype).itemsize

    # -- frozen-structure value edits ---------------------------------------
    def update_entry_values(self, entry_indices: np.ndarray, values) -> None:
        """Set values of specific nnz entries (CSR order) on device."""
        blk = self._entry_block[entry_indices]
        off = self._entry_offset[entry_indices]
        flat = self.ablocks.reshape(self.ablocks.shape[0], BLK * BLK)
        flat = flat.at[jnp.asarray(blk), jnp.asarray(off)].set(
            jnp.asarray(values, dtype=self.dtype)
        )
        self.ablocks = flat.reshape(self.ablocks.shape)

    def entry_index(self, i: int, j: int) -> int:
        if not hasattr(self, "_entry_lookup"):
            rows, cols = self._entry_rc
            self._entry_lookup = {
                (int(r), int(c)): e
                for e, (r, c) in enumerate(zip(rows.tolist(), cols.tolist()))
            }
        return self._entry_lookup[(i, j)]

    def set_edge(self, i: int, j: int, value: float) -> None:
        idx = [self.entry_index(i, j)]
        if i != j:
            idx.append(self.entry_index(j, i))
        self.update_entry_values(np.asarray(idx), np.full(len(idx), value))

    def entry_values(self) -> np.ndarray:
        """Current values of all nnz entries in CSR order (device read)."""
        flat = self.ablocks.reshape(self.ablocks.shape[0], BLK * BLK)
        return np.asarray(
            flat[jnp.asarray(self._entry_block), jnp.asarray(self._entry_offset)]
        )

    # -- linear algebra ------------------------------------------------------
    def matmul(self, x: jax.Array) -> jax.Array:
        squeeze = x.ndim == 1
        if squeeze:
            x = x[:, None]
        n, b = x.shape
        b_pad = _round_up(b, 8)
        x_pad = jnp.zeros((self.n_pad, b_pad), self.dtype)
        x_pad = x_pad.at[:n, :b].set(x.astype(self.dtype))
        y = _bsr_spmm(self.cb, self.rb, self.first, self.ablocks, x_pad,
                      interpret=self.interpret, precision=self.precision)
        y = y[:n, :b].astype(x.dtype)
        return y[:, 0] if squeeze else y

    def __matmul__(self, x):
        return self.matmul(x)


def bsr_block_count(A_scipy, perm: np.ndarray | None = None) -> int:
    """Number of nonzero 128x128 blocks (including row-block fill-ins)."""
    import scipy.sparse as sp

    C = sp.coo_matrix(A_scipy)
    row, col = C.row, C.col
    if perm is not None:
        pinv = np.empty_like(perm)
        pinv[perm] = np.arange(len(perm))
        row, col = pinv[row], pinv[col]
    n_pad = _round_up(max(A_scipy.shape[0], BLK), BLK)
    key = (row // BLK).astype(np.int64) * (n_pad // BLK) + col // BLK
    return len(np.unique(key))


def make_bsr_operator(A_scipy, dtype=jnp.float32,
                      max_storage_bytes: int = 768 * 1024 * 1024,
                      interpret: bool = False):
    """RCM-reorder and build the BSR MXU operator when its block storage fits
    the budget; fall back to the XLA COO path otherwise (hub graphs whose
    block structure doesn't compress).

    Returns (operator, perm) like ``pallas_spmm.make_operator``.
    """
    import scipy.sparse as sp

    from .pallas_spmm import rcm_permutation
    from .sparse import CooMatrix

    A = sp.csr_matrix(A_scipy)
    perm = rcm_permutation(A)
    nblk = bsr_block_count(A, perm)
    if nblk * BLK * BLK * jnp.dtype(dtype).itemsize <= max_storage_bytes:
        Ap = A[perm, :].tocsc()[:, perm].tocsr()
        return BsrOperator(Ap, dtype=dtype, interpret=interpret), perm
    return CooMatrix.from_scipy(A, dtype=dtype), np.arange(A.shape[0])
