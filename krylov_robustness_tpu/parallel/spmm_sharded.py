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
