"""Sparse matrix containers and SpMM kernels (XLA reference path).

TPU-first design notes
----------------------
The reference framework leans on MATLAB's built-in sparse mat-vec ``A*w``
(see reference ``functions/lanczos_krylov.m:81``, ``functions/expmv.m:78``).
Here the same substrate is provided as JAX-native containers with two layouts:

* ``CooMatrix`` — nnz-sorted COO; SpMM = gather + ``segment_sum``. Robust for
  arbitrary degree distributions (hub-heavy graphs such as soc-Epinions1).
* ``EllMatrix`` — padded ELL (row-major, fixed slots/row); SpMM = K slot
  gathers + fused multiply-accumulate. Regular layout, the shape the Pallas
  kernel consumes; ideal for bounded-degree graphs (road networks).

Everything is batched-first: the natural unit is SpMM on a block of
right-hand sides (Krylov block vectors, Hutchinson probes, per-candidate-edge
blocks), because batch width is what restores arithmetic intensity on TPU.

Matrices are registered pytrees so they can be closed over / passed through
``jit``, ``vmap``, ``shard_map`` freely. Static metadata (n, padded sizes)
lives in the aux data so shapes stay compile-time constants.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class CooMatrix:
    """Square sparse matrix in row-sorted COO layout.

    Padding entries (beyond ``nnz``) carry ``val == 0`` and point at row/col 0
    so they contribute nothing to products.
    """

    rows: jax.Array  # (nnz_pad,) int32, sorted ascending
    cols: jax.Array  # (nnz_pad,) int32
    vals: jax.Array  # (nnz_pad,) float
    n: int
    nnz: int

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return (self.rows, self.cols, self.vals), (self.n, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        rows, cols, vals = children
        n, nnz = aux
        return cls(rows=rows, cols=cols, vals=vals, n=n, nnz=nnz)

    # -- properties --------------------------------------------------------
    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def dtype(self):
        return self.vals.dtype

    def astype(self, dtype) -> "CooMatrix":
        return dataclasses.replace(self, vals=self.vals.astype(dtype))

    # -- constructors ------------------------------------------------------
    @staticmethod
    def from_scipy(A, dtype=jnp.float64, pad_to: int = 8) -> "CooMatrix":
        import scipy.sparse as sp

        A = sp.coo_matrix(A)
        n = A.shape[0]
        if A.shape[0] != A.shape[1]:
            raise ValueError("matrix must be square")
        order = np.lexsort((A.col, A.row))
        rows = A.row[order].astype(np.int32)
        cols = A.col[order].astype(np.int32)
        vals = A.data[order]
        nnz = len(vals)
        nnz_pad = max(_round_up(nnz, pad_to), pad_to)
        rows = np.pad(rows, (0, nnz_pad - nnz))
        cols = np.pad(cols, (0, nnz_pad - nnz))
        vals = np.pad(vals, (0, nnz_pad - nnz))
        return CooMatrix(
            rows=jnp.asarray(rows),
            cols=jnp.asarray(cols),
            vals=jnp.asarray(vals, dtype=dtype),
            n=n,
            nnz=nnz,
        )

    @staticmethod
    def from_edges(
        edges: np.ndarray,
        n: int,
        weights: np.ndarray | None = None,
        symmetrize: bool = True,
        dtype=jnp.float64,
    ) -> "CooMatrix":
        """Build from an (e, 2) edge array (no self-loop handling here)."""
        import scipy.sparse as sp

        e = np.asarray(edges)
        w = np.ones(len(e)) if weights is None else np.asarray(weights)
        A = sp.coo_matrix((w, (e[:, 0], e[:, 1])), shape=(n, n))
        if symmetrize:
            A = A + A.T
        return CooMatrix.from_scipy(A.tocsr(), dtype=dtype)

    def to_scipy(self):
        import scipy.sparse as sp

        rows = np.asarray(self.rows)[: self.nnz]
        cols = np.asarray(self.cols)[: self.nnz]
        vals = np.asarray(self.vals)[: self.nnz]
        return sp.csr_matrix((vals, (rows, cols)), shape=self.shape)

    def todense(self) -> jax.Array:
        out = jnp.zeros((self.n, self.n), self.dtype)
        return out.at[self.rows, self.cols].add(self.vals)

    # -- linear algebra ----------------------------------------------------
    def matmul(self, x: jax.Array) -> jax.Array:
        return coo_spmm(self, x)

    def __matmul__(self, x: jax.Array) -> jax.Array:
        return coo_spmm(self, x)

    def transpose(self) -> "CooMatrix":
        # Symmetric in almost all uses; provided for generality. Re-sorts on
        # host only if called on concrete values — avoid inside jit.
        raise NotImplementedError(
            "transpose on traced CooMatrix unsupported; build A^T on host"
        )


def coo_spmm(A: CooMatrix, x: jax.Array) -> jax.Array:
    """y = A @ x for x of shape (n, b) or (n,); XLA gather + segment-sum.

    Replaces the reference's MATLAB built-in sparse product (the L1 substrate
    of SURVEY.md). ``indices_are_sorted`` lets XLA lower the scatter-add
    efficiently.
    """
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    gathered = x[A.cols]  # (nnz_pad, b)
    contrib = A.vals[:, None].astype(x.dtype) * gathered
    y = jax.ops.segment_sum(
        contrib,
        A.rows,
        num_segments=A.n,
        indices_are_sorted=True,
    )
    return y[:, 0] if squeeze else y


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class EllMatrix:
    """Padded-ELL layout: ``K`` column slots per row.

    ``cols[i, k]`` is the column index of the k-th stored entry of row i
    (0 for padding), ``vals[i, k]`` the value (0 for padding). Rows are padded
    to ``n_pad`` (multiple of the TPU sublane tile) so the Pallas kernel sees
    aligned static shapes.
    """

    cols: jax.Array  # (n_pad, K) int32
    vals: jax.Array  # (n_pad, K) float
    n: int
    nnz: int

    def tree_flatten(self):
        return (self.cols, self.vals), (self.n, self.nnz)

    @classmethod
    def tree_unflatten(cls, aux, children):
        cols, vals = children
        n, nnz = aux
        return cls(cols=cols, vals=vals, n=n, nnz=nnz)

    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def n_pad(self):
        return self.cols.shape[0]

    @property
    def slots(self):
        return self.cols.shape[1]

    @property
    def dtype(self):
        return self.vals.dtype

    @staticmethod
    def from_scipy(A, dtype=jnp.float64, row_pad: int = 8) -> "EllMatrix":
        import scipy.sparse as sp

        A = sp.csr_matrix(A)
        n = A.shape[0]
        deg = np.diff(A.indptr)
        K = max(int(deg.max()) if n else 1, 1)
        n_pad = max(_round_up(n, row_pad), row_pad)
        cols = np.zeros((n_pad, K), dtype=np.int32)
        vals = np.zeros((n_pad, K), dtype=np.float64)
        for i in range(n):
            lo, hi = A.indptr[i], A.indptr[i + 1]
            cols[i, : hi - lo] = A.indices[lo:hi]
            vals[i, : hi - lo] = A.data[lo:hi]
        return EllMatrix(
            cols=jnp.asarray(cols),
            vals=jnp.asarray(vals, dtype=dtype),
            n=n,
            nnz=int(A.nnz),
        )

    @property
    def padding_efficiency(self) -> float:
        """nnz / (n_pad*K): fraction of slots doing useful work."""
        return self.nnz / float(self.cols.shape[0] * self.cols.shape[1])

    def matmul(self, x: jax.Array) -> jax.Array:
        return ell_spmm(self, x)

    def __matmul__(self, x: jax.Array) -> jax.Array:
        return ell_spmm(self, x)


def ell_spmm(A: EllMatrix, x: jax.Array) -> jax.Array:
    """y = A @ x with ELL layout; x (n, b) → y (n, b)."""
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    n, b = x.shape
    if A.n_pad != n:
        x = jnp.pad(x, ((0, A.n_pad - n), (0, 0)))
    gathered = x[A.cols]  # (n_pad, K, b)
    y = jnp.einsum("nk,nkb->nb", A.vals.astype(x.dtype), gathered)
    y = y[: A.n]
    return y[:, 0] if squeeze else y


SparseMatrix = Any  # CooMatrix | EllMatrix duck type


def spmm(A: SparseMatrix, x: jax.Array) -> jax.Array:
    """Layout-dispatching SpMM."""
    return A.matmul(x)
