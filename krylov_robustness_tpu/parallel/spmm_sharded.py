"""Row-partitioned sparse operator over a device mesh.

Scheme (SURVEY.md §2.5 / §5.8): the matrix is split into row blocks, one per
device along the ``rows`` mesh axis; each device stores its block's entries
as (local_row, global_col, val) padded to a uniform nnz (layout='coo'), or
as a padded-ELL block (layout='ell': K global-column slots per local row,
packed by the native C++ packer ``native/graphpack.cpp::pack_ell``) whose
local SpMM is K vectorized gathers with no segment_sum. The SpMM is a
``shard_map``:

    x sharded by rows → all_gather over ICI → local gather+segment_sum
    → y naturally row-sharded (no reduction needed for row partitioning)

Dot products / norms inside distributed Krylov reduce with psum. The outer
``__matmul__`` API accepts and returns *replicated* (n, b) blocks so the
single-chip Krylov/funm layers work unchanged on top; the sharded-in /
sharded-out kernel is exposed separately for fused distributed loops.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class RowShardedMatrix:
    """Row-block-partitioned COO matrix bound to a mesh. Registered pytree
    (index/value arrays are leaves) so it passes through jit."""

    def tree_flatten(self):
        return (self.rows_local, self.cols, self.vals), (
            self.mesh, self.n, self.n_orig, self.nnz, self.axis,
            self.batch_axis, self.layout,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        rows_local, cols, vals = children
        mesh, n, n_orig, nnz, axis, batch_axis, layout = aux
        return cls(mesh=mesh, rows_local=rows_local, cols=cols, vals=vals,
                   n=n, n_orig=n_orig, nnz=nnz, axis=axis,
                   batch_axis=batch_axis, layout=layout)

    mesh: Mesh
    rows_local: jax.Array  # (D * nnz_shard,) row-sharded: local row ids
    cols: jax.Array  # (D * nnz_shard,) global column ids
    vals: jax.Array  # (D * nnz_shard,)
    n: int  # global rows (padded to multiple of D)
    n_orig: int
    nnz: int
    axis: str = "rows"
    # optional second mesh axis sharding the SpMM *column* (candidate/probe
    # batch) dimension — the DP analog of SURVEY.md §2.5 item 1 composed
    # with the row partitioning (TP/SP analog). None = 1-D mesh behavior.
    batch_axis: str | None = None
    # 'coo': flat (local_row, global_col, val) + segment_sum; 'ell': padded
    # (rps, K) column-slot blocks + K vectorized gathers (no segment_sum)
    layout: str = "coo"

    @property
    def dtype(self):
        return self.vals.dtype

    @property
    def rows_per_shard(self) -> int:
        return self.n // self.mesh.shape[self.axis]

    @property
    def rows(self) -> jax.Array:
        """Global row ids — the CooMatrix-compatible view consumed by the
        host-side plan builders (``funm.expmv.select_taylor_degree``); slots
        padding each shard carry val 0 so sum-style consumers are unaffected."""
        D = self.mesh.shape[self.axis]
        nnz_shard = self.rows_local.shape[0] // D
        offs = jnp.repeat(
            jnp.arange(D, dtype=self.rows_local.dtype) * self.rows_per_shard,
            nnz_shard,
        )
        return self.rows_local + offs

    @staticmethod
    def from_scipy(A, mesh: Mesh, dtype=jnp.float64, axis: str = "rows",
                   batch_axis: str | None = None, layout: str = "coo"):
        import scipy.sparse as sp

        A = sp.csr_matrix(A)
        n_orig = A.shape[0]
        D = mesh.shape[axis]
        n = _round_up(n_orig, D)
        rps = n // D
        if layout == "ell":
            from ..native.graphpack import pack_ell

            K = max(int(np.diff(A.indptr).max()), 1)
            cols = np.zeros((n, K), np.int32)
            vals = np.zeros((n, K), np.float64)
            for s_i in range(D):
                blk = A[s_i * rps:min((s_i + 1) * rps, n_orig), :]
                c_b, v_b = pack_ell(blk, rps, K)
                cols[s_i * rps:(s_i + 1) * rps] = c_b
                vals[s_i * rps:(s_i + 1) * rps] = v_b
            sh = NamedSharding(mesh, P(axis))
            return RowShardedMatrix(
                mesh=mesh,
                rows_local=jax.device_put(
                    jnp.zeros((D,), jnp.int32), sh),  # unused in ELL layout
                cols=jax.device_put(jnp.asarray(cols), sh),
                vals=jax.device_put(jnp.asarray(vals, dtype=dtype), sh),
                n=n, n_orig=n_orig, nnz=int(A.nnz), axis=axis,
                batch_axis=batch_axis, layout="ell",
            )
        C = sp.coo_matrix(A)
        order = np.argsort(C.row, kind="stable")
        rows, cols, vals = C.row[order], C.col[order], C.data[order]
        shard_of = rows // rps
        counts = np.bincount(shard_of, minlength=D)
        nnz_shard = max(int(counts.max()), 1)
        r_l = np.zeros((D, nnz_shard), np.int32)
        c_l = np.zeros((D, nnz_shard), np.int32)
        v_l = np.zeros((D, nnz_shard), np.float64)
        # vectorized fill: entries are row-sorted, so each shard's entries
        # are contiguous; slot = position within the shard's run
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        slot = np.arange(len(rows)) - starts[shard_of]
        r_l[shard_of, slot] = rows - shard_of * rps
        c_l[shard_of, slot] = cols
        v_l[shard_of, slot] = vals
        sh = NamedSharding(mesh, P(axis))
        return RowShardedMatrix(
            mesh=mesh,
            rows_local=jax.device_put(jnp.asarray(r_l.reshape(-1)), sh),
            cols=jax.device_put(jnp.asarray(c_l.reshape(-1)), sh),
            vals=jax.device_put(jnp.asarray(v_l.reshape(-1), dtype=dtype), sh),
            n=n,
            n_orig=n_orig,
            nnz=int(A.nnz),
            axis=axis,
            batch_axis=batch_axis,
        )

    # ---- sharded-in / sharded-out kernel ---------------------------------
    def spmm_sharded(self, x_sharded: jax.Array) -> jax.Array:
        """x (n, b) row-sharded → y (n, b) row-sharded.

        Communication/compute overlap (SURVEY.md §7 "hard parts"): the
        diagonal-block contributions only need the *local* x rows, so they
        are computed while the ``all_gather`` for the off-block columns is
        in flight — the gather is issued first and nothing on the
        diagonal-block path depends on it, letting XLA's latency-hiding
        scheduler run the ICI transfer behind the local gather/segment-sum.
        After RCM reordering the matrix is banded, so most entries sit in
        the diagonal block and the gather has the whole local pass to hide.
        """
        axis = self.axis
        rps = self.rows_per_shard

        if self.layout == "ell":
            K = self.cols.shape[1]

            def kern_ell(cols, vals, x_l):
                lo = jax.lax.axis_index(axis).astype(cols.dtype) * rps
                is_local = (cols >= lo) & (cols < lo + rps)
                x_full = jax.lax.all_gather(x_l, axis, axis=0, tiled=True)
                y = jnp.zeros((rps, x_l.shape[1]), x_l.dtype)
                # diagonal-block slots first: they read only local x, so the
                # whole pass runs while the all_gather is in flight (same
                # latency-hiding structure as the COO path)
                for k in range(K):
                    ck, vk, loc = cols[:, k], vals[:, k], is_local[:, k]
                    y = y + jnp.where(loc, vk, 0)[:, None] * x_l[
                        jnp.clip(ck - lo, 0, rps - 1)]
                for k in range(K):
                    ck, vk, loc = cols[:, k], vals[:, k], is_local[:, k]
                    y = y + jnp.where(loc, 0, vk)[:, None] * x_full[ck]
                return y

            return shard_map(
                kern_ell,
                mesh=self.mesh,
                in_specs=(P(axis), P(axis), P(axis, self.batch_axis)),
                out_specs=P(axis, self.batch_axis),
            )(self.cols, self.vals, x_sharded)

        def kern(rows_l, cols, vals, x_l):
            lo = jax.lax.axis_index(axis).astype(cols.dtype) * rps
            is_local = (cols >= lo) & (cols < lo + rps)
            # issue the collective first; the diag pass is independent of it
            x_full = jax.lax.all_gather(x_l, axis, axis=0, tiled=True)
            cols_l = jnp.clip(cols - lo, 0, rps - 1)
            diag = jnp.where(is_local, vals, 0)[:, None] * x_l[cols_l]
            y = jax.ops.segment_sum(diag, rows_l, num_segments=rps)
            off = jnp.where(is_local, 0, vals)[:, None] * x_full[cols]
            return y + jax.ops.segment_sum(off, rows_l, num_segments=rps)

        f = shard_map(
            kern,
            mesh=self.mesh,
            in_specs=(P(axis), P(axis), P(axis),
                      P(axis, self.batch_axis)),
            out_specs=P(axis, self.batch_axis),
        )
        return f(self.rows_local, self.cols, self.vals, x_sharded)

    def todense(self) -> jax.Array:
        """Replicated dense (n, n) view — enables the exact dense fast path
        of ``updates.trace_update`` (reference ``trace_fun_update.m:37``)
        below the n≤130 cutoff, so ``backend='sharded'`` matches the COO
        backend edge-for-edge on small graphs too (ADVICE r4). Per-shard pad
        slots carry val 0 at (local row 0, col 0) and scatter-add harmlessly.
        Not supported for the ELL layout (no per-entry row ids)."""
        if self.layout != "coo":
            raise NotImplementedError("todense() requires the COO layout")
        out = jnp.zeros((self.n, self.n), self.vals.dtype)
        return out.at[self.rows, self.cols].add(self.vals)

    # ---- replicated convenience API (drop-in for CooMatrix) --------------
    def matmul(self, x: jax.Array) -> jax.Array:
        squeeze = x.ndim == 1
        if squeeze:
            x = x[:, None]
        n_in, b = x.shape
        if n_in != self.n:
            x = jnp.pad(x, ((0, self.n - n_in), (0, 0)))
        y = self.spmm_sharded(x)
        y = y[: n_in]
        return y[:, 0] if squeeze else y

    def __matmul__(self, x):
        return self.matmul(x)


def psum_dot(a: jax.Array, b: jax.Array, axis: str = "rows") -> jax.Array:
    """Inner product of row-sharded blocks (call inside shard_map)."""
    return jax.lax.psum(jnp.sum(a * b), axis)


class _HostMeta:
    """Hashable-by-identity holder for host-side metadata (jit aux data)."""

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BsrRowShardedMatrix:
    """Row-partitioned operator whose LOCAL SpMM is the super-tile MXU
    Pallas kernel (``ops/pallas_bsr_super.py``) instead of XLA
    gather/segment-sum — the single-chip kernel that wins ~1.9× over the
    XLA COO path, lifted into the distributed lane (SURVEY.md §5.8, §7
    step 7; replaces MATLAB ``A*w``, ``lanczos_krylov.m:81``).

    Each shard's (rps × n) row block is packed into dense super-tiles at
    build time (:func:`..ops.pallas_bsr_super.pack_bsr_super_block`); tile
    counts are padded to the max across shards with all-zero tiles
    (accumulate-only, assigned to super-row 0) so the per-shard Pallas grid
    is uniform. SpMM: all_gather(x) over ICI → local Pallas tile pass →
    y naturally row-sharded. Frozen-structure value edits scatter into the
    flat tile storage (same contract as :class:`.SuperBsrOperator`)."""

    def tree_flatten(self):
        return (self.atiles, self.slab, self.sup, self.start), (
            self.mesh, self.n, self.n_orig, self.nnz, self.m_pad,
            self.n_pad, self.axis, self.batch_axis, self.mode, self.dtype,
            self.interpret, self._hm, self.n_diag,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        atiles, slab, sup, start = children
        (mesh, n, n_orig, nnz, m_pad, n_pad, axis, batch_axis, mode, dtype,
         interpret, hm, n_diag) = aux
        return cls(mesh=mesh, atiles=atiles, slab=slab, sup=sup, start=start,
                   n=n, n_orig=n_orig, nnz=nnz, m_pad=m_pad, n_pad=n_pad,
                   axis=axis, batch_axis=batch_axis, mode=mode, dtype=dtype,
                   interpret=interpret, _hm=hm, n_diag=n_diag)

    mesh: Mesh
    atiles: jax.Array  # (D, ntile_u, tile_r, tile_c) row-sharded
    slab: jax.Array  # (D, ntile_u) int32 column-slab index per tile
    sup: jax.Array  # (D, ntile_u) int32 super-row index per tile
    start: jax.Array  # (D, ntile_u) int32 1 = first tile of its super-row
    n: int  # global rows (padded to multiple of D)
    n_orig: int
    nnz: int
    m_pad: int  # per-shard padded rows (multiple of tile_r)
    n_pad: int  # padded gathered-x rows (multiple of tile_c)
    axis: str = "rows"
    batch_axis: str | None = None
    mode: str = "f32"  # 'f32' | 'bf16x2' | 'bf16x3' (storage/MXU strategy)
    dtype: object = jnp.float32  # compute dtype of the SpMM
    interpret: bool = False
    _hm: object = None  # _HostMeta: entry_flat/entry_rc for value edits
    # gather/compute overlap (SURVEY §7 "hard parts"): tiles [0, n_diag)
    # read only the shard's OWN column window (rows padded to a multiple of
    # D·tile_c so slabs align with shards — their slab index is stored
    # window-RELATIVE) and run on local x while the all_gather for the
    # off-shard tiles [n_diag, ntile_u) is in flight. n_diag = 0 disables
    # the split (single full-x pass).
    n_diag: int = 0

    @property
    def rows_per_shard(self) -> int:
        return self.n // self.mesh.shape[self.axis]

    @property
    def shape(self):
        return (self.n_orig, self.n_orig)

    @staticmethod
    def from_scipy(A, mesh: Mesh, dtype=jnp.float32, axis: str = "rows",
                   batch_axis: str | None = None, tile=(512, 256),
                   mode: str = "auto", interpret: bool = False,
                   overlap: bool = True):
        import scipy.sparse as sp

        from ..ops.pallas_bsr_super import pack_bsr_super_block

        A = sp.csr_matrix(A)
        A.sort_indices()
        n_orig = A.shape[0]
        D = mesh.shape[axis]
        tr, tc = tile
        overlap = bool(overlap) and D > 1
        # overlap mode pads rows to a multiple of D·tile_c so column slabs
        # align exactly with shards: every slab is wholly local to one
        # shard, and the diag tile set reads only local x
        n = _round_up(n_orig, D * tc if overlap else D)
        rps = n // D
        # pad to (n, n) so every shard block is exactly (rps, n)
        pad = n - n_orig
        Ap = sp.csr_matrix(
            (A.data, A.indices,
             np.concatenate([A.indptr, np.full(pad, A.indptr[-1])])),
            shape=(n, n))

        def split_block(d):
            """Shard d's row block, split into (diag, off) by column
            locality; diag columns are window-RELATIVE."""
            blk = sp.coo_matrix(Ap[d * rps:(d + 1) * rps, :])
            lo, hi = d * rps, (d + 1) * rps
            is_loc = (blk.col >= lo) & (blk.col < hi)
            diag = sp.coo_matrix(
                (blk.data[is_loc],
                 (blk.row[is_loc], blk.col[is_loc] - lo)),
                shape=(rps, rps))
            off = sp.coo_matrix(
                (blk.data[~is_loc], (blk.row[~is_loc], blk.col[~is_loc])),
                shape=(rps, n))
            return diag, off

        packs_d, packs_o, rcs = [], [], []
        for d in range(D):
            if overlap:
                diag, off = split_block(d)
                pd = pack_bsr_super_block(diag, tr, tc)
                po = pack_bsr_super_block(off, tr, tc)
                lo = d * rps
                rc_d = np.stack([sp.coo_matrix(diag).row + lo,
                                 sp.coo_matrix(diag).col + lo], axis=1)
                rc_o = np.stack([sp.coo_matrix(off).row + lo,
                                 sp.coo_matrix(off).col], axis=1)
            else:
                blk = Ap[d * rps:(d + 1) * rps, :]
                pd = pack_bsr_super_block(blk, tr, tc)
                po = None
                C = sp.coo_matrix(blk)
                rc_d = np.stack([C.row + d * rps, C.col], axis=1)
                rc_o = np.zeros((0, 2), np.int64)
            packs_d.append(pd)
            packs_o.append(po)
            rcs.append((rc_d, rc_o))
        ntd_u = max(p[0].shape[0] for p in packs_d)
        nto_u = max((p[0].shape[0] for p in packs_o if p is not None),
                    default=0)
        ntile_u = ntd_u + nto_u
        m_pad = packs_d[0][4][0]
        n_pad = packs_o[0][4][1] if overlap else packs_d[0][4][1]
        atiles = np.zeros((D, ntile_u, tr, tc), np.float64)
        slab = np.zeros((D, ntile_u), np.int32)
        # pad tiles (all-zero, start=0) must continue the LAST real
        # super-row, not revisit super 0: the Pallas grid flushes an output
        # block when the out index changes, and revisiting an
        # already-flushed block on compiled TPU reads a stale accumulator —
        # contiguous super visits are a kernel invariant
        last_sup = m_pad // tr - 1
        sup = np.full((D, ntile_u), last_sup, np.int32)
        start = np.zeros((D, ntile_u), np.int32)
        entry_flat_parts = []
        entry_rc_parts = []
        for d in range(D):
            at, (sl, su, st), et, eo, _ = packs_d[d]
            k = at.shape[0]
            atiles[d, :k] = at
            slab[d, :k] = sl
            sup[d, :k] = su
            start[d, :k] = st
            # (segment positions beyond the real tiles stay all-zero with
            # sup=last_sup/start=0 from the initialization above —
            # continuing the final super-row so visits never revisit an
            # already-flushed output block)
            entry_flat_parts.append((d * ntile_u + et) * (tr * tc) + eo)
            entry_rc_parts.append(rcs[d][0])
            if packs_o[d] is not None:
                at, (sl, su, st), et, eo, _ = packs_o[d]
                k = at.shape[0]
                atiles[d, ntd_u:ntd_u + k] = at
                slab[d, ntd_u:ntd_u + k] = sl
                sup[d, ntd_u:ntd_u + k] = su
                start[d, ntd_u:ntd_u + k] = st
                entry_flat_parts.append(
                    (d * ntile_u + ntd_u + et) * (tr * tc) + eo)
                entry_rc_parts.append(rcs[d][1])
        entry_flat = np.concatenate(entry_flat_parts)
        entry_rc = np.concatenate(entry_rc_parts, axis=0)
        if mode == "auto":
            bf16_exact = bool(
                np.all(atiles.astype(jnp.bfloat16).astype(np.float64)
                       == atiles))
            mode = ("bf16x2" if (bf16_exact and dtype == jnp.float32)
                    else "f32")
        store = jnp.bfloat16 if mode.startswith("bf16x") else dtype
        sh = NamedSharding(mesh, P(axis))
        hm = _HostMeta(entry_flat=entry_flat, entry_rc=entry_rc)
        return BsrRowShardedMatrix(
            mesh=mesh,
            atiles=jax.device_put(jnp.asarray(atiles, dtype=store), sh),
            slab=jax.device_put(jnp.asarray(slab), sh),
            sup=jax.device_put(jnp.asarray(sup), sh),
            start=jax.device_put(jnp.asarray(start), sh),
            n=n, n_orig=n_orig, nnz=int(A.nnz), m_pad=m_pad, n_pad=n_pad,
            axis=axis, batch_axis=batch_axis, mode=mode, dtype=dtype,
            interpret=interpret, _hm=hm,
            n_diag=ntd_u if overlap else 0)

    # -- frozen-structure value edits ---------------------------------------
    def entry_positions(self) -> np.ndarray:
        """Flat tile-storage position per nnz entry (entries ordered shard-
        major, row-sorted within shard; rows/cols via entry_rc)."""
        return self._hm.entry_flat

    def entry_rc(self) -> np.ndarray:
        return self._hm.entry_rc

    def set_flat(self, positions: np.ndarray, value: float):
        flat = self.atiles.reshape(-1)
        flat = flat.at[jnp.asarray(positions)].set(
            jnp.asarray(value, self.atiles.dtype))
        self.atiles = flat.reshape(self.atiles.shape)

    def entry_values(self) -> np.ndarray:
        flat = self.atiles.reshape(-1)
        # cast to the COMPUTE dtype, not f32: the f64 lane's weighted edge
        # values must round-trip at full precision (bf16/f32 storage modes
        # upcast losslessly)
        return np.asarray(
            flat[jnp.asarray(self._hm.entry_flat)].astype(self.dtype))

    # -- sharded-in / sharded-out kernel ------------------------------------
    def spmm_sharded(self, x_sharded: jax.Array) -> jax.Array:
        from ..ops.pallas_bsr_super import (
            BLK,
            _tile_spmm_bf16,
            _tile_spmm_f32,
        )

        axis = self.axis
        rps = self.rows_per_shard
        compute = (jnp.float32 if self.mode.startswith("bf16x")
                   else self.dtype)
        mode = self.mode
        interpret = self.interpret
        m_pad, n_pad = self.m_pad, self.n_pad
        nd = self.n_diag

        def one_pass(meta, tiles, xp):
            if mode.startswith("bf16x"):
                return _tile_spmm_bf16(meta, tiles, xp, n_pad_y=m_pad,
                                       terms=int(mode[-1]),
                                       interpret=interpret)
            return _tile_spmm_f32(meta, tiles, xp, n_pad_y=m_pad,
                                  interpret=interpret)

        def kern(slab, sup, start, atiles, x_l):
            b_l = x_l.shape[1]
            b_p = _round_up(b_l, BLK)
            # issue the collective first; everything on the diag path is
            # independent of it, so the local pass runs while the ICI
            # transfer is in flight (SURVEY §7 overlap)
            x_full = jax.lax.all_gather(x_l, axis, axis=0, tiled=True)
            if nd:
                xd = jnp.zeros((rps, b_p), compute)
                xd = xd.at[:, :b_l].set(x_l.astype(compute))
                y = one_pass((slab[0, :nd], sup[0, :nd], start[0, :nd]),
                             atiles[0, :nd], xd)
                xo = jnp.zeros((n_pad, b_p), compute)
                xo = xo.at[:x_full.shape[0], :b_l].set(
                    x_full.astype(compute))
                y = y + one_pass(
                    (slab[0, nd:], sup[0, nd:], start[0, nd:]),
                    atiles[0, nd:], xo)
            else:
                xp = jnp.zeros((n_pad, b_p), compute)
                xp = xp.at[:x_full.shape[0], :b_l].set(
                    x_full.astype(compute))
                y = one_pass((slab[0], sup[0], start[0]), atiles[0], xp)
            return y[:rps, :b_l].astype(x_l.dtype)

        # jax.shard_map (not the deprecated experimental alias): pallas_call's
        # out ShapeDtypeStruct carries no varying-mesh-axes annotation, so
        # the vma check must be off for this kernel
        return jax.shard_map(
            kern,
            mesh=self.mesh,
            in_specs=(P(axis), P(axis), P(axis), P(axis),
                      P(axis, self.batch_axis)),
            out_specs=P(axis, self.batch_axis),
            check_vma=False,
        )(self.slab, self.sup, self.start, self.atiles, x_sharded)

    # -- replicated convenience API (drop-in for RowShardedMatrix) ----------
    def matmul(self, x: jax.Array) -> jax.Array:
        squeeze = x.ndim == 1
        if squeeze:
            x = x[:, None]
        n_in, b = x.shape
        if n_in != self.n:
            x = jnp.pad(x, ((0, self.n - n_in), (0, 0)))
        y = self.spmm_sharded(x)
        y = y[: n_in]
        return y[:, 0] if squeeze else y

    def __matmul__(self, x):
        return self.matmul(x)
