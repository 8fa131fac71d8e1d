"""Pallas TPU super-row block-sparse SpMM (BSR 128x128, shared x slabs).

Roofline successor to :mod:`.pallas_bsr`. The flat BSR kernel streams one
(128, b) x tile per nonzero block; on RCM-ordered road networks consecutive
row blocks touch nearly identical column windows, so at b=512 the x-tile
stream (~963 MB for Vermont) dominates the A-block stream (~237 MB) and the
measured SpMM sits ~9x above its own bytes bound.

This kernel amortizes x traffic two ways:

1. **Super-rows.** S=4 consecutive row blocks form a super-row sharing one
   f32 accumulator scratch (S·128, b) in VMEM. Blocks are sorted by
   (super, x-slab, row), x is loaded in (G·128, b) slabs (G=4), and the slab
   BlockSpec index only changes on slab switches — a handful per super-row
   instead of once per block. y is written once per super-tile (sequential,
   no output revisiting).
2. **bf16x2 split (optional).** Unweighted adjacency values (0/±1) are
   bf16-exact, so A blocks are stored bf16 (half the A stream). x is split
   x = hi + lo with hi = bf16(x): two native bf16 MXU passes reproduce the
   f32 product to ~2^-24 relative — versus six passes for
   ``precision=HIGHEST`` on f32 operands.

Replaces MATLAB's built-in sparse ``A*w`` (``lanczos_krylov.m:81``) on the
TPU hot path (greedy candidate scoring at batch 2·Q, ``krylov_miobi.m:76-125``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128
SUP = 4  # row blocks per super-row
SLAB = 4  # column blocks per x slab


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel_f32(slab_ref, sup_ref, rowoff_ref, cboff_ref, start_ref, end_ref,
                ablk_ref, x_ref, y_ref, acc_ref, *, precision):
    t = pl.program_id(0)

    @pl.when(start_ref[t] == 1)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xs = x_ref[pl.ds(cboff_ref[t] * BLK, BLK), :]
    ro = rowoff_ref[t] * BLK
    acc_ref[pl.ds(ro, BLK), :] += jnp.dot(
        ablk_ref[0], xs, preferred_element_type=acc_ref.dtype,
        precision=precision,
    )

    @pl.when(end_ref[t] == 1)
    def _():
        y_ref[:] = acc_ref[:]


def _kernel_bf16(slab_ref, sup_ref, rowoff_ref, cboff_ref, start_ref,
                 end_ref, ablk_ref, xcat_ref, y_ref, acc_ref, *, terms, b):
    t = pl.program_id(0)

    @pl.when(start_ref[t] == 1)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    co = cboff_ref[t] * BLK
    # one MXU pass over the concatenated split terms [hi | lo | ...] of
    # width terms·b, then fold the term slices into the f32 accumulator
    p = jnp.dot(ablk_ref[0], xcat_ref[pl.ds(co, BLK), :],
                preferred_element_type=jnp.float32)
    s = p[:, :b]
    for k in range(1, terms):
        s = s + p[:, k * b:(k + 1) * b]
    acc_ref[pl.ds(rowoff_ref[t] * BLK, BLK), :] += s

    @pl.when(end_ref[t] == 1)
    def _():
        y_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("interpret", "precision",
                                             "n_pad_y"))
def _super_spmm_f32(meta, ablocks, x_pad, n_pad_y: int,
                    interpret: bool = False,
                    precision=jax.lax.Precision.HIGHEST):
    slab, sup, rowoff, cboff, start, end = meta
    nblk = ablocks.shape[0]
    b = x_pad.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, BLK, BLK), lambda t, s, u, r, c, st, en: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SLAB * BLK, b),
                         lambda t, s, u, r, c, st, en: (s[t], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SUP * BLK, b),
                               lambda t, s, u, r, c, st, en: (u[t], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((SUP * BLK, b), x_pad.dtype)],
    )
    return pl.pallas_call(
        functools.partial(_kernel_f32, precision=precision),
        out_shape=jax.ShapeDtypeStruct((n_pad_y, b), x_pad.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(slab, sup, rowoff, cboff, start, end, ablocks, x_pad)


@functools.partial(jax.jit, static_argnames=("interpret", "n_pad_y", "terms"))
def _super_spmm_bf16(meta, ablocks, x_pad, n_pad_y: int, terms: int = 2,
                     interpret: bool = False):
    slab, sup, rowoff, cboff, start, end = meta
    nblk = ablocks.shape[0]
    b = x_pad.shape[1]
    parts = []
    r = x_pad
    for _ in range(terms):
        h = r.astype(jnp.bfloat16)
        parts.append(h)
        r = r - h.astype(jnp.float32)
    xcat = jnp.concatenate(parts, axis=1)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(nblk,),
        in_specs=[
            pl.BlockSpec((1, BLK, BLK), lambda t, s, u, r, c, st, en: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SLAB * BLK, terms * b),
                         lambda t, s, u, r, c, st, en: (s[t], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SUP * BLK, b),
                               lambda t, s, u, r, c, st, en: (u[t], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((SUP * BLK, b), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_kernel_bf16, terms=terms, b=b),
        out_shape=jax.ShapeDtypeStruct((n_pad_y, b), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(slab, sup, rowoff, cboff, start, end, ablocks, xcat)


def pack_bsr_super(A_scipy):
    """Pack a (RCM-permuted) scipy matrix into super-row-sorted dense
    128x128 blocks.

    Returns (ablocks (nblk,128,128) f64, meta, entry_block, entry_offset)
    where meta = (slab, sup, rowoff, cboff, start, end) int32 prefetch
    arrays and the entry arrays map CSR-order nnz index -> (block id, flat
    offset) for frozen-structure value updates. Every row block gets at
    least one (zero diagonal) block so every super-tile is written.
    """
    import scipy.sparse as sp

    A = sp.csr_matrix(A_scipy)
    A.sort_indices()
    n = A.shape[0]
    lcm = SUP * BLK if SUP == SLAB else np.lcm(SUP, SLAB) * BLK
    n_pad = _round_up(max(n, lcm), lcm)
    nrb = n_pad // BLK
    coo = A.tocoo()
    rb_e = (coo.row // BLK).astype(np.int64)
    cb_e = (coo.col // BLK).astype(np.int64)
    key = rb_e * nrb + cb_e
    uniq = np.unique(key)
    have_rb = np.unique(uniq // nrb)
    missing = np.setdiff1d(np.arange(nrb), have_rb)
    if len(missing):
        extra = missing.astype(np.int64) * nrb + missing
        uniq = np.unique(np.concatenate([uniq, extra]))
    rb = (uniq // nrb).astype(np.int64)
    cb = (uniq % nrb).astype(np.int64)
    # sort blocks by (super, x slab, row, col) so the x slab index changes
    # as rarely as possible inside each super-row
    sup = rb // SUP
    slab = cb // SLAB
    order = np.lexsort((cb, rb, slab, sup))
    rb, cb, sup, slab, uniq = rb[order], cb[order], sup[order], slab[order], uniq[order]
    nblk = len(uniq)
    start = np.zeros(nblk, dtype=np.int32)
    start[np.unique(sup, return_index=True)[1]] = 1
    # last block of each super-row = position right before the next start
    end = np.roll(start, -1).astype(np.int32)
    end[-1] = 1
    meta = (
        slab.astype(np.int32),
        sup.astype(np.int32),
        (rb % SUP).astype(np.int32),
        (cb % SLAB).astype(np.int32),
        start,
        end,
    )
    # scatter values: map each nnz to its (sorted) block position
    blk_pos = {int(k): t for t, k in enumerate(uniq.tolist())}
    key_pos = np.fromiter((blk_pos[int(k)] for k in key), dtype=np.int64,
                          count=len(key))
    ablocks = np.zeros((nblk, BLK, BLK), dtype=np.float64)
    ri = coo.row % BLK
    ci = coo.col % BLK
    ablocks[key_pos, ri, ci] = coo.data
    entry_block = key_pos
    entry_offset = (ri * BLK + ci).astype(np.int64)
    return ablocks, meta, entry_block, entry_offset, n_pad


class _HostMeta:
    """Hashable-by-identity holder for host-side metadata (jit aux data)."""

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


@jax.tree_util.register_pytree_node_class
class SuperBsrOperator:
    """Super-row block-sparse MXU SpMM operator (fixed sparsity structure).

    Drop-in for :class:`.pallas_bsr.BsrOperator`: ``__matmul__`` on (n, b)
    blocks, ``update_entry_values``/``set_edge`` frozen-structure edits,
    pytree registration so value edits don't retrace.

    mode='f32' uses full-precision MXU passes (6 bf16 passes under
    precision=HIGHEST); mode='bf16xN' (N=2,3) stores A in bfloat16 (requires
    bf16-exact values, e.g. 0/±1 adjacency) and splits x into N bf16 terms
    folded through one widened MXU pass — ~2^-18 (N=2) / ~2^-27 (N=3)
    relative error at a third/half the MXU work of HIGHEST.
    """

    def tree_flatten(self):
        return (self.ablocks, self.meta), (
            self.n, self.nnz, self.dtype, self.interpret, self.n_pad,
            self._hm, self.precision, self.mode,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.ablocks, obj.meta) = children
        (obj.n, obj.nnz, obj.dtype, obj.interpret, obj.n_pad,
         obj._hm, obj.precision, obj.mode) = aux
        obj._entry_block = obj._hm.entry_block
        obj._entry_offset = obj._hm.entry_offset
        obj._entry_rc = obj._hm.entry_rc
        return obj

    def __init__(self, A_scipy, dtype=jnp.float32, interpret: bool = False,
                 precision=jax.lax.Precision.HIGHEST, mode: str = "auto"):
        import scipy.sparse as sp

        A = sp.csr_matrix(A_scipy)
        self.n = A.shape[0]
        self.nnz = int(A.nnz)
        self.dtype = dtype
        self.interpret = interpret
        self.precision = precision
        ablocks, meta, eb, eo, n_pad = pack_bsr_super(A)
        self.n_pad = n_pad
        if mode == "auto":
            bf16_exact = bool(
                np.all(ablocks.astype(jnp.bfloat16).astype(np.float64)
                       == ablocks)
            )
            mode = "bf16x3" if (bf16_exact and dtype == jnp.float32) else "f32"
        self.mode = mode
        store = jnp.bfloat16 if mode.startswith("bf16x") else dtype
        self.ablocks = jnp.asarray(ablocks, dtype=store)
        self.meta = tuple(jnp.asarray(m) for m in meta)
        self._entry_block = eb
        self._entry_offset = eo
        A.sort_indices()
        coo = A.tocoo()
        self._entry_rc = (coo.row.astype(np.int64), coo.col.astype(np.int64))
        self._hm = _HostMeta(entry_block=eb, entry_offset=eo,
                             entry_rc=self._entry_rc)

    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def nblocks(self) -> int:
        return int(self.ablocks.shape[0])

    def storage_bytes(self) -> int:
        return self.nblocks * BLK * BLK * jnp.dtype(self.ablocks.dtype).itemsize

    # -- frozen-structure value edits ---------------------------------------
    def update_entry_values(self, entry_indices: np.ndarray, values) -> None:
        blk = self._entry_block[entry_indices]
        off = self._entry_offset[entry_indices]
        flat = self.ablocks.reshape(self.ablocks.shape[0], BLK * BLK)
        flat = flat.at[jnp.asarray(blk), jnp.asarray(off)].set(
            jnp.asarray(values, dtype=self.ablocks.dtype)
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
        flat = self.ablocks.reshape(self.ablocks.shape[0], BLK * BLK)
        return np.asarray(
            flat[jnp.asarray(self._entry_block),
                 jnp.asarray(self._entry_offset)].astype(jnp.float32)
        )

    # -- linear algebra ------------------------------------------------------
    def matmul(self, x: jax.Array) -> jax.Array:
        squeeze = x.ndim == 1
        if squeeze:
            x = x[:, None]
        n, b = x.shape
        b_pad = _round_up(b, 8)
        compute = jnp.float32 if self.mode.startswith("bf16x") else self.dtype
        x_pad = jnp.zeros((self.n_pad, b_pad), compute)
        x_pad = x_pad.at[:n, :b].set(x.astype(compute))
        if self.mode.startswith("bf16x"):
            y = _super_spmm_bf16(self.meta, self.ablocks, x_pad,
                                 n_pad_y=self.n_pad,
                                 terms=int(self.mode[-1]),
                                 interpret=self.interpret)
        else:
            y = _super_spmm_f32(self.meta, self.ablocks, x_pad,
                                n_pad_y=self.n_pad,
                                interpret=self.interpret,
                                precision=self.precision)
        y = y[:n, :b].astype(x.dtype)
        return y[:, 0] if squeeze else y

    def __matmul__(self, x):
        return self.matmul(x)
