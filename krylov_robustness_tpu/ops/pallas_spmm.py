"""Pallas TPU SpMM kernel: banded-ELL lane-gather design.

Motivation (measured on v5e): XLA's gather+scatter SpMM costs ~6 ms on a
500k-nnz graph regardless of batch width — per-element overhead, ~20× off
the roofline. This kernel replaces it for the graphs that dominate the
paper's workload (road networks).

Hardware constraint that shapes the design: Mosaic's only vector gather,
``tpu.dynamic_gather`` (via ``jnp.take_along_axis``), cannot cross vector
registers along the gather dimension — the source window is at most 128
lanes. An arbitrary-column gather is therefore impossible in one op; but
after RCM reordering, road networks have bandwidth 200–350 (§measured:
Vermont 336, Hawaii 202), i.e. every source column of an output chunk lies
within a handful of 128-lane windows.

Layout ("banded ELL", node dimension in LANES):
  * x transposed: xt (b_tile, n_pad) with zero halo of Wv·128 lanes on both
    sides, batch in sublanes;
  * per node r and ELL slot k: relative column ``rel[k, r] = col % 128``,
    window id ``win[k, r] = col//128 + Wv − r//128`` ∈ [0, 2Wv], value
    ``val[k, r]`` (0 for padding slots).

Kernel, per output chunk c (128 lanes) and batch tile: for each slot k and
window w: one (b_tile, 128) lane-gather from the window vreg + masked FMA:

    acc += where(win[k] == w, val[k], 0) · src_w[:, rel[k]]

Cost: n/128 · K · (2Wv+1) vreg gathers — for Vermont ≈ 40k vector ops per
SpMM ≈ tens of μs, vs 6 ms for XLA. Graphs whose RCM bandwidth is too wide
(hub-dominated Misc graphs) are dispatched to the XLA COO path instead; see
:func:`make_operator`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .sparse import CooMatrix


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _banded_kernel(relT_ref, winT_ref, valT_ref, *window_refs_and_out,
                   num_windows: int, K: int):
    """Per (slot k, window w): one (b_tile, 128) lane-gather + masked FMA
    into a register accumulator. (A scalar-prefetch bitmap skip of inactive
    pairs was measured SLOWER — per-pair VMEM read-modify-write on the
    output loses to straight-line register accumulation.)"""
    window_refs = window_refs_and_out[:-1]
    yt_ref = window_refs_and_out[-1]
    b_tile = yt_ref.shape[0]
    acc = jnp.zeros(yt_ref.shape, yt_ref.dtype)
    for k in range(K):
        idx = relT_ref[k, :][None, :]
        idxb = jnp.broadcast_to(idx, (b_tile, 128)).astype(jnp.int32)
        val = valT_ref[k, :][None, :]
        win = winT_ref[k, :][None, :]
        for w in range(num_windows):
            g = jnp.take_along_axis(window_refs[w][:], idxb, axis=1,
                                    mode="promise_in_bounds")
            acc = acc + jnp.where(win == w, val, 0.0) * g
    yt_ref[:] = acc


@functools.partial(
    jax.jit, static_argnames=("num_windows", "K", "b_tile", "interpret")
)
def _banded_spmm(relT, winT, valT, xt_pad, num_windows: int, K: int,
                 b_tile: int, interpret: bool = False):
    """Each of the ``num_windows`` shifted views of xt_pad is passed as its
    own input whose 128-lane block index tracks the chunk — Pallas pipelines
    4 KB window DMAs instead of re-fetching the whole x per chunk."""
    b_pad, n_halo = xt_pad.shape
    n_lanes = relT.shape[1]
    n_chunks = n_lanes // 128
    kernel = functools.partial(
        _banded_kernel, num_windows=num_windows, K=K
    )

    def win_spec(w):
        return pl.BlockSpec((b_tile, 128), lambda c, i, w=w: (i, c + w),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad, n_lanes), xt_pad.dtype),
        grid=(n_chunks, b_pad // b_tile),
        in_specs=[
            pl.BlockSpec((K, 128), lambda c, i: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 128), lambda c, i: (0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 128), lambda c, i: (0, c),
                         memory_space=pltpu.VMEM),
        ] + [win_spec(w) for w in range(num_windows)],
        out_specs=pl.BlockSpec((b_tile, 128), lambda c, i: (i, c),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(relT, winT, valT, *([xt_pad] * num_windows))


class _HostMeta:
    """Hashable-by-identity holder for host-side packing metadata, so the
    operator can sit in jit aux data without hashing numpy arrays. One
    operator instance per sweep → stable compile cache."""

    def __init__(self, **kw):
        self.__dict__.update(kw)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


@jax.tree_util.register_pytree_node_class
class BandedEllOperator:
    """RCM-banded Pallas SpMM operator over a fixed sparsity structure.

    Works in *permuted* node space: build with the already-RCM-permuted
    matrix (see :func:`make_operator` which handles the reordering and
    bandwidth check). Exposes ``__matmul__`` on (n, b) blocks like the XLA
    containers, plus ``update_entry_values``/``set_edge`` for the greedy
    frozen-structure path. Registered as a pytree (tables are leaves) so it
    passes through jit; value updates don't retrace.
    """

    def tree_flatten(self):
        return (self.relT, self.winT, self.valT), (
            self.n, self.nnz, self.dtype, self.b_tile, self.interpret,
            self.num_windows, self.Wv, self.K, self.n_lanes, self._meta,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.relT, obj.winT, obj.valT) = children
        (obj.n, obj.nnz, obj.dtype, obj.b_tile, obj.interpret,
         obj.num_windows, obj.Wv, obj.K, obj.n_lanes, obj._meta) = aux
        obj._entry_pos = obj._meta.entry_pos
        obj._entry_cols = obj._meta.entry_cols
        return obj

    def __init__(self, A_scipy, dtype=jnp.float32, b_tile: int = 8,
                 interpret: bool = False):
        import scipy.sparse as sp

        self.interpret = interpret

        A = sp.csr_matrix(A_scipy)
        n = A.shape[0]
        self.n = n
        self.nnz = int(A.nnz)
        self.dtype = dtype
        self.b_tile = b_tile
        n_lanes = _round_up(max(n, 128), 128)
        deg = np.diff(A.indptr)
        K = max(int(deg.max()), 1)
        C = sp.coo_matrix(A)
        bw = int(np.abs(C.row - C.col).max()) if C.nnz else 0
        Wv = max((bw + 127) // 128, 1) + 1  # +1 covers cross-chunk straddle
        self.num_windows = 2 * Wv - 1
        self.Wv = Wv - 1

        # native C++ packing runtime (numpy fallback inside)
        from ..native.graphpack import pack_banded

        rel, win, val, ks, rows = pack_banded(
            A, n_lanes, K, self.Wv, self.num_windows
        )
        A.sort_indices()
        cols = A.indices.astype(np.int64)

        self.K = K
        self.n_lanes = n_lanes
        self._entry_pos = (ks, rows)  # for update_entry_values
        self._entry_cols = cols
        self._meta = _HostMeta(entry_pos=self._entry_pos, entry_cols=cols)
        self.relT = jnp.asarray(rel)
        self.winT = jnp.asarray(win)
        self.valT = jnp.asarray(val, dtype=dtype)

    @property
    def shape(self):
        return (self.n, self.n)

    def update_entry_values(self, entry_indices: np.ndarray, values) -> None:
        """Set values of specific nnz entries (CSR order) on device."""
        ks, rows = self._entry_pos
        ks = ks[entry_indices]
        rows = rows[entry_indices]
        self.valT = self.valT.at[
            jnp.asarray(ks), jnp.asarray(rows)
        ].set(jnp.asarray(values, dtype=self.dtype))

    def entry_index(self, i: int, j: int) -> int:
        """CSR-order entry index of (i, j); builds the lookup lazily."""
        if not hasattr(self, "_entry_lookup"):
            ks, rows = self._entry_pos
            cols = self._entry_cols
            self._entry_lookup = {
                (int(r), int(c)): e
                for e, (r, c) in enumerate(zip(rows.tolist(), cols.tolist()))
            }
        return self._entry_lookup[(i, j)]

    def set_edge(self, i: int, j: int, value: float) -> None:
        """Symmetric edge edit in place (frozen structure)."""
        idx = [self.entry_index(i, j)]
        if i != j:
            idx.append(self.entry_index(j, i))
        self.update_entry_values(np.asarray(idx), np.full(len(idx), value))

    def matmul(self, x: jax.Array) -> jax.Array:
        squeeze = x.ndim == 1
        if squeeze:
            x = x[:, None]
        n, b = x.shape
        b_pad = _round_up(b, self.b_tile)
        halo = self.Wv * 128
        xt = jnp.zeros((b_pad, self.n_lanes + 2 * halo), self.dtype)
        xt = xt.at[:b, halo:halo + n].set(x.T.astype(self.dtype))
        yt = _banded_spmm(
            self.relT, self.winT, self.valT, xt,
            self.num_windows, self.K, self.b_tile,
            interpret=self.interpret,
        )
        y = yt[:b, :n].T.astype(x.dtype)
        return y[:, 0] if squeeze else y

    def __matmul__(self, x):
        return self.matmul(x)


def rcm_permutation(A_scipy) -> np.ndarray:
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    return np.asarray(reverse_cuthill_mckee(A_scipy, symmetric_mode=True))


def rcm_bandwidth(A_scipy, perm: np.ndarray | None = None) -> int:
    import scipy.sparse as sp

    C = sp.coo_matrix(A_scipy)
    if perm is not None:
        pinv = np.empty_like(perm)
        pinv[perm] = np.arange(len(perm))
        return int(np.abs(pinv[C.row] - pinv[C.col]).max()) if C.nnz else 0
    return int(np.abs(C.row - C.col).max()) if C.nnz else 0


def make_operator(A_scipy, dtype=jnp.float32, b_tile: int = 8,
                  max_windows: int = 17):
    """Build the best SpMM operator for a graph: RCM + banded Pallas kernel
    when the bandwidth is TPU-friendly, XLA COO otherwise.

    Returns (operator, perm): ``perm`` is the node relabeling applied
    (identity for the XLA path); edge indices must be mapped through it.
    """
    import scipy.sparse as sp

    A = sp.csr_matrix(A_scipy)
    perm = rcm_permutation(A)
    bw = rcm_bandwidth(A, perm)
    Wv = (bw + 127) // 128 + 1
    if jax.default_backend() == "tpu" and 2 * Wv - 1 <= max_windows:
        Ap = A[perm, :].tocsc()[:, perm].tocsr()
        return BandedEllOperator(Ap, dtype=dtype, b_tile=b_tile), perm
    return CooMatrix.from_scipy(A, dtype=dtype), np.arange(A.shape[0])
