"""Pallas TPU tiled block-sparse SpMM (dense 512x512 super-tiles).

Roofline successor to :mod:`.pallas_bsr`. Probing the flat 128x128 BSR
kernel on v5e (Vermont, b=512) showed it is NOT HBM-bound: its byte stream
supports 1.7 ms but it runs at 4.2 ms, and widening/narrowing the per-step
data movement moves the needle while cutting HBM bytes does not — the cost
driver is per-grid-step VMEM/VPU work (tile copies, read-modify-write
accumulation) at ~1 µs/step across ~3,700 steps.

So this kernel minimizes GRID STEPS, not just bytes:

* The (RCM-permuted) matrix is packed into dense (SUP·128)x(SLAB·128)
  super-tiles — one tile per (super-row, column-slab) pair that contains any
  nonzero. Road networks after RCM have a narrow band, so a 512-row
  super-row touches ~2 column slabs: Vermont collapses from ~3,700 blocks to
  ~400 tiles.
* One MXU dot per tile, accumulated directly into the resident y tile
  (blocks sorted by super-row ⇒ y revisits are consecutive; no scratch, no
  dynamic slices, no per-step VPU copies).
* Optional bf16 split (mode='bf16xN'): adjacency values (0/±1) are
  bf16-exact, so A tiles store as bf16 (half the A stream) and x is split
  into N bf16 terms concatenated along the batch axis — one widened MXU pass
  replaces the 6 passes of ``precision=HIGHEST``. The split uses
  ``lax.reduce_precision`` (NOT an astype round-trip, which XLA's
  excess-precision simplifier elides on TPU, silently collapsing hi+lo
  back to plain bf16).

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
SUP = 4  # default 128-row blocks per super-row (tile height 512)
SLAB = 2  # default 128-col blocks per x slab (tile width 256)
TILE_R = SUP * BLK  # default tile height (see SuperBsrOperator(tile=...))
TILE_C = SLAB * BLK  # default tile width
# clean-chip shape sweep on Vermont b=512 (scripts/probe_kernel_clean.py,
# memoization-proof protocol): 512x256 bf16x2 3.69 ms vs 512x512 4.06 /
# 512x128 3.86 / 1024x128 4.50 / flat-128x128-f32 4.38 / XLA COO 7.03.
#
# Why not faster (the speed-of-light argument, BASELINE.md): two manually
# pipelined variants (double-buffered HBM DMAs per tile; per-super x windows
# cutting DMA count ~3x) measured 3.55 / 4.05 ms — pipelining and DMA issue
# overhead are NOT the wall. The wall is ZERO FILL: Vermont's 512x256 tiles
# are ~0.2% dense, so the MXU executes ~500x more MACs than the nnz·b useful
# work; at the measured ~50% MXU efficiency on these shapes the dense-tile
# family caps near ~3.5 ms (≈30 Gnnz·b/s). The fill-free alternative
# (gather + segment_sum) is VPU-bound at 15.4 Gnnz·b/s (XLA COO, same
# graph/batch), and sub-128-row tiles waste the MXU's 128-lane rows.
# 29 Gnnz·b/s ≈ 1.9x the best XLA path is the practical ceiling for
# TPU SpMM at this sparsity; the experiments live in git history
# (ops/pallas_bsr_super.py @ 174170a).
#
# Round-3 closure of the ORDERING question (the last untried fill lever):
# clustered orderings were hypothesized to beat RCM's band at the
# rectangular tile-cover objective. Measured super-tile counts
# (scripts/ordering_experiment.py): Vermont — RCM 805, recursive spectral
# bisection 2,968, label-propagation communities 12,567; ca-AstroPh — RCM
# 1,731, spectral 2,432, label-prop 2,232. RCM wins on both graph families
# by 1.3–15x: a contiguous band IS the near-optimal 512x256 cover for
# near-planar road networks, and even on the hub-dominated citation graph
# the cluster diagonal blocks stay ~0.2% dense, so clustering only
# scatters the off-diagonal mass across more slabs. The zero-fill wall
# stands; further SpMM gains need fewer products (Krylov schedule /
# candidate pruning), not faster or denser tiles.


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel_f32(slab_ref, sup_ref, start_ref, atile_ref, x_ref, y_ref, *,
                precision):
    t = pl.program_id(0)
    p = jnp.dot(atile_ref[0], x_ref[:], preferred_element_type=y_ref.dtype,
                precision=precision)

    @pl.when(start_ref[t] == 1)
    def _():
        y_ref[:] = p

    @pl.when(start_ref[t] == 0)
    def _():
        y_ref[:] += p


def _kernel_bf16(slab_ref, sup_ref, start_ref, atile_ref, xcat_ref, y_ref, *,
                 terms, b):
    t = pl.program_id(0)
    # one widened MXU pass over the concatenated split terms [hi | lo | ...],
    # folded term-wise into the f32 product (all slices static)
    p = jnp.dot(atile_ref[0], xcat_ref[:], preferred_element_type=jnp.float32)
    s = p[:, :b]
    for k in range(1, terms):
        s = s + p[:, k * b:(k + 1) * b]

    @pl.when(start_ref[t] == 1)
    def _():
        y_ref[:] = s

    @pl.when(start_ref[t] == 0)
    def _():
        y_ref[:] += s


@functools.partial(jax.jit, static_argnames=("interpret", "precision",
                                             "n_pad_y"))
def _tile_spmm_f32(meta, atiles, x_pad, n_pad_y: int, interpret: bool = False,
                   precision=jax.lax.Precision.HIGHEST):
    slab, sup, start = meta
    ntile, tile_r, tile_c = atiles.shape
    b = x_pad.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ntile,),
        in_specs=[
            pl.BlockSpec((1, tile_r, tile_c), lambda t, s, u, st: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, b), lambda t, s, u, st: (s[t], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, b), lambda t, s, u, st: (u[t], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_kernel_f32, precision=precision),
        out_shape=jax.ShapeDtypeStruct((n_pad_y, b), x_pad.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(slab, sup, start, atiles, x_pad)


def bf16_split(x: jax.Array, terms: int) -> jax.Array:
    """x (f32) → [hi | lo | ...] bf16 concatenated along axis 1.

    ``lax.reduce_precision`` forces the rounding to happen: a plain
    ``astype(bf16).astype(f32)`` round-trip is elided by XLA's
    excess-precision simplifier on TPU, which would silently zero every
    term after the first (measured: 2.35e-3 error, i.e. plain bf16).
    """
    parts = []
    r = x
    for _ in range(terms):
        h = jax.lax.reduce_precision(r, exponent_bits=8, mantissa_bits=7)
        parts.append(h.astype(jnp.bfloat16))
        r = r - h
    return jnp.concatenate(parts, axis=1)


@functools.partial(jax.jit, static_argnames=("interpret", "n_pad_y", "terms"))
def _tile_spmm_bf16(meta, atiles, x_pad, n_pad_y: int, terms: int = 3,
                    interpret: bool = False):
    slab, sup, start = meta
    ntile, tile_r, tile_c = atiles.shape
    b = x_pad.shape[1]
    xcat = bf16_split(x_pad, terms)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(ntile,),
        in_specs=[
            pl.BlockSpec((1, tile_r, tile_c), lambda t, s, u, st: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, terms * b), lambda t, s, u, st: (s[t], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_r, b), lambda t, s, u, st: (u[t], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_kernel_bf16, terms=terms, b=b),
        out_shape=jax.ShapeDtypeStruct((n_pad_y, b), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(slab, sup, start, atiles, xcat)


def pack_bsr_super(A_scipy, tile_r: int = TILE_R, tile_c: int = TILE_C):
    """Pack a (RCM-permuted) scipy matrix into super-tiles.

    Returns (atiles (ntile, 512, 512) f64, meta, entry_tile, entry_offset,
    n_pad) where meta = (slab, sup, start) int32 prefetch arrays sorted by
    (super, slab), and the entry arrays map CSR-order nnz index →
    (tile id, flat offset) for frozen-structure value updates. Every
    super-row gets at least one (possibly all-zero diagonal) tile so every
    y tile is written.
    """
    import scipy.sparse as sp

    A = sp.csr_matrix(A_scipy)
    A.sort_indices()
    n = A.shape[0]
    n_pad = _round_up(max(n, tile_r), tile_r if tile_r == tile_c
                      else int(np.lcm(tile_r, tile_c)))
    nslab = n_pad // tile_c
    coo = A.tocoo()
    sup_e = (coo.row // tile_r).astype(np.int64)
    slab_e = (coo.col // tile_c).astype(np.int64)
    key = sup_e * nslab + slab_e
    uniq = np.unique(key)
    # every super-row needs ≥1 tile so its y tile is initialized
    have = np.unique(uniq // nslab)
    nsup = n_pad // tile_r
    missing = np.setdiff1d(np.arange(nsup), have)
    if len(missing):
        extra = missing.astype(np.int64) * nslab + np.minimum(missing,
                                                              nslab - 1)
        uniq = np.unique(np.concatenate([uniq, extra]))
    ntile = len(uniq)
    sup = (uniq // nslab).astype(np.int32)
    slab = (uniq % nslab).astype(np.int32)
    start = np.zeros(ntile, dtype=np.int32)
    start[np.unique(sup, return_index=True)[1]] = 1
    meta = (slab, sup, start)
    key_pos = np.searchsorted(uniq, key)
    atiles = np.zeros((ntile, tile_r, tile_c), dtype=np.float64)
    ri = coo.row % tile_r
    ci = coo.col % tile_c
    atiles[key_pos, ri, ci] = coo.data
    entry_tile = key_pos.astype(np.int64)
    entry_offset = (ri.astype(np.int64) * tile_c + ci).astype(np.int64)
    return atiles, meta, entry_tile, entry_offset, n_pad


def pack_bsr_super_block(A_block, tile_r: int = TILE_R, tile_c: int = TILE_C):
    """Rectangular variant of :func:`pack_bsr_super` for a row BLOCK of a
    row-partitioned matrix (rows = local shard rows, cols = all global
    columns): rows and columns pad independently, so a (rps, n) shard block
    packs without squaring. Returns (atiles, meta, entry_tile, entry_offset,
    (m_pad, n_pad)); meta/entry semantics as in :func:`pack_bsr_super`.
    Feeds the sharded Pallas local SpMM (parallel/spmm_sharded.py) —
    the multi-device replacement of MATLAB's ``A*w``
    (``lanczos_krylov.m:81``) over the distributed lane."""
    import scipy.sparse as sp

    A = sp.csr_matrix(A_block)
    A.sort_indices()
    m, n = A.shape
    m_pad = _round_up(max(m, tile_r), tile_r)
    n_pad = _round_up(max(n, tile_c), tile_c)
    nslab = n_pad // tile_c
    nsup = m_pad // tile_r
    coo = A.tocoo()
    sup_e = (coo.row // tile_r).astype(np.int64)
    slab_e = (coo.col // tile_c).astype(np.int64)
    key = sup_e * nslab + slab_e
    uniq = np.unique(key)
    have = np.unique(uniq // nslab)
    missing = np.setdiff1d(np.arange(nsup), have)
    if len(missing):
        extra = missing.astype(np.int64) * nslab + np.minimum(missing,
                                                              nslab - 1)
        uniq = np.unique(np.concatenate([uniq, extra]))
    ntile = len(uniq)
    sup = (uniq // nslab).astype(np.int32)
    slab = (uniq % nslab).astype(np.int32)
    start = np.zeros(ntile, dtype=np.int32)
    start[np.unique(sup, return_index=True)[1]] = 1
    meta = (slab, sup, start)
    key_pos = np.searchsorted(uniq, key)
    atiles = np.zeros((ntile, tile_r, tile_c), dtype=np.float64)
    ri = coo.row % tile_r
    ci = coo.col % tile_c
    atiles[key_pos, ri, ci] = coo.data
    entry_tile = key_pos.astype(np.int64)
    entry_offset = (ri.astype(np.int64) * tile_c + ci).astype(np.int64)
    return atiles, meta, entry_tile, entry_offset, (m_pad, n_pad)


def super_tile_count(A_scipy, perm: np.ndarray | None = None,
                     tile_r: int = TILE_R, tile_c: int = TILE_C) -> int:
    """Number of super-tiles (incl. per-super fill-ins) under ``perm``."""
    import scipy.sparse as sp

    C = sp.coo_matrix(A_scipy)
    row, col = C.row, C.col
    if perm is not None:
        pinv = np.empty_like(perm)
        pinv[perm] = np.arange(len(perm))
        row, col = pinv[row], pinv[col]
    n_pad = _round_up(max(A_scipy.shape[0], tile_r),
                      tile_r if tile_r == tile_c
                      else int(np.lcm(tile_r, tile_c)))
    nslab = n_pad // tile_c
    key = (row // tile_r).astype(np.int64) * nslab + col // tile_c
    uniq = np.unique(key)
    nsup_missing = len(np.setdiff1d(np.arange(n_pad // tile_r),
                                    np.unique(uniq // nslab)))
    return len(uniq) + nsup_missing


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
    """Super-tile block-sparse MXU SpMM operator (fixed sparsity structure).

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
        return (self.atiles, self.meta), (
            self.n, self.nnz, self.dtype, self.interpret, self.n_pad,
            self._hm, self.precision, self.mode,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.atiles, obj.meta) = children
        (obj.n, obj.nnz, obj.dtype, obj.interpret, obj.n_pad,
         obj._hm, obj.precision, obj.mode) = aux
        obj._entry_tile = obj._hm.entry_tile
        obj._entry_offset = obj._hm.entry_offset
        obj._entry_rc = obj._hm.entry_rc
        return obj

    def __init__(self, A_scipy, dtype=jnp.float32, interpret: bool = False,
                 precision=jax.lax.Precision.HIGHEST, mode: str = "auto",
                 tile: tuple[int, int] = (TILE_R, TILE_C)):
        import scipy.sparse as sp

        A = sp.csr_matrix(A_scipy)
        self.n = A.shape[0]
        self.nnz = int(A.nnz)
        self.dtype = dtype
        self.interpret = interpret
        self.precision = precision
        atiles, meta, et, eo, n_pad = pack_bsr_super(A, tile[0], tile[1])
        self.n_pad = n_pad
        if mode == "auto":
            # bf16x2's ~2^-18 error equals the f32 trace-update convergence
            # floor (32·eps_f32, updates/trace_update.py), so for bf16-exact
            # adjacency values it is accuracy-consistent with the f32 path
            # at ~1.5x the speed of HIGHEST; use bf16x3 (~f32-exact) when a
            # tighter product is needed.
            bf16_exact = bool(
                np.all(atiles.astype(jnp.bfloat16).astype(np.float64)
                       == atiles)
            )
            mode = "bf16x2" if (bf16_exact and dtype == jnp.float32) else "f32"
        self.mode = mode
        store = jnp.bfloat16 if mode.startswith("bf16x") else dtype
        self.atiles = jnp.asarray(atiles, dtype=store)
        self.meta = tuple(jnp.asarray(m) for m in meta)
        self._entry_tile = et
        self._entry_offset = eo
        A.sort_indices()
        coo = A.tocoo()
        self._entry_rc = (coo.row.astype(np.int64), coo.col.astype(np.int64))
        self._hm = _HostMeta(entry_tile=et, entry_offset=eo,
                             entry_rc=self._entry_rc)

    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def ntiles(self) -> int:
        return int(self.atiles.shape[0])

    def storage_bytes(self) -> int:
        return int(np.prod(self.atiles.shape)) * jnp.dtype(self.atiles.dtype).itemsize

    # -- frozen-structure value edits ---------------------------------------
    def update_entry_values(self, entry_indices: np.ndarray, values) -> None:
        """Set values of specific nnz entries (CSR order) on device."""
        til = self._entry_tile[entry_indices]
        off = self._entry_offset[entry_indices]
        flat = self.atiles.reshape(self.atiles.shape[0], -1)
        flat = flat.at[jnp.asarray(til), jnp.asarray(off)].set(
            jnp.asarray(values, dtype=self.atiles.dtype)
        )
        self.atiles = flat.reshape(self.atiles.shape)

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
        flat = self.atiles.reshape(self.atiles.shape[0], -1)
        return np.asarray(
            flat[jnp.asarray(self._entry_tile),
                 jnp.asarray(self._entry_offset)].astype(jnp.float32)
        )

    # scoped-VMEM ceiling: the widened bf16 pass materializes an f32
    # (tile_r, terms·b) product per grid step, which at b=2048/terms=2 is
    # ~18 MB against the 16 MB scoped-vmem limit (observed: Q=1000 greedy
    # scoring, batch 2·Q → compile-time vmem OOM by 80 KB). Batches wider
    # than MAX_B run as independent column chunks — same MXU work, one
    # extra A-tile DMA stream per chunk (negligible at these densities).
    MAX_B = 1024

    # -- linear algebra ------------------------------------------------------
    def matmul(self, x: jax.Array) -> jax.Array:
        squeeze = x.ndim == 1
        if squeeze:
            x = x[:, None]
        if x.shape[1] > self.MAX_B:
            return jnp.concatenate(
                [self.matmul(x[:, s:s + self.MAX_B])
                 for s in range(0, x.shape[1], self.MAX_B)], axis=1)
        n, b = x.shape
        b_pad = _round_up(b, BLK)
        compute = jnp.float32 if self.mode.startswith("bf16x") else self.dtype
        x_pad = jnp.zeros((self.n_pad, b_pad), compute)
        x_pad = x_pad.at[:n, :b].set(x.astype(compute))
        if self.mode.startswith("bf16x"):
            y = _tile_spmm_bf16(self.meta, self.atiles, x_pad,
                                n_pad_y=self.n_pad, terms=int(self.mode[-1]),
                                interpret=self.interpret)
        else:
            y = _tile_spmm_f32(self.meta, self.atiles, x_pad,
                               n_pad_y=self.n_pad, interpret=self.interpret,
                               precision=self.precision)
        y = y[:n, :b].astype(x.dtype)
        return y[:, 0] if squeeze else y

    def __matmul__(self, x):
        return self.matmul(x)
