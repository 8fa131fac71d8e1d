"""Greedy break/make robustness optimization.

Re-design of the reference's two-level greedy
(``functions/greedy_krylov.m`` driving ``functions/krylov_miobi.m``):

* The **outer loop** (k budget steps, candidate bookkeeping, edge application)
  stays host-side Python, exactly as the reference keeps it in MATLAB.
* The **inner candidate loop** — |E| independent rank-2 Krylov trace updates
  per step (``krylov_miobi.m:76-125``) — collapses into one batched device
  call (:func:`..updates.trace_update.trace_fun_update_edges`).
* The sparsity structure is FROZEN for the whole sweep: deletions zero the
  value slots, additions flip pre-allocated candidate slots from 0 to the
  edge weight. The scored operator therefore never changes shape and the
  compiled scoring program is reused across all k greedy steps — no retraces.

Default parameters mirror ``krylov_miobi.m:29-64`` / ``greedy_krylov.m:30-56``.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Sequence

import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..graphs.top_edges import find_top_edges, find_top_missing_edges
from ..ops.sparse import CooMatrix
from ..updates.trace_update import (
    DEFAULT_SCHEDULE,
    trace_fun_update_edges,
)
from ..utils.guards import check_finite


def _guard_scores(scores: np.ndarray, step: int, dataset: str = ""):
    """Numerical-health gate on the per-step candidate scores (SURVEY.md
    §5.2): a NaN/Inf score would silently win/lose the argmin, corrupting
    the whole sweep — surface it as a warning with the offending count
    (the reference's analog is its non-convergence warning,
    ``trace_fun_update.m:128-130``)."""
    report = check_finite(scores, name=f"greedy scores step {step} {dataset}")
    if not report.finite:
        import warnings

        bad = int(np.sum(~np.isfinite(scores)))
        warnings.warn(
            f"{report.name}: {bad}/{scores.size} candidate scores are "
            f"non-finite (max |x| = {report.max_abs:.3e}); they are "
            "excluded from the argmin",
            RuntimeWarning,
        )
    return report.finite


@dataclasses.dataclass
class GreedyResult:
    edges: np.ndarray  # (k, 2) chosen edges
    rob_variation: float  # cumulative Δtrace
    A_new: sp.csr_matrix  # updated adjacency
    per_step_delta: np.ndarray  # (k,) chosen Δtrace per step
    per_step_iters: np.ndarray  # (k,) Krylov steps used for the chosen edge
    per_step_time: np.ndarray | None = None  # (k,) wall seconds per step


class _FrozenStructureMatrix:
    """COO matrix with a fixed sparsity pattern and O(1)-per-edit device value
    updates (symmetric edits)."""

    def __init__(self, A: sp.spmatrix, extra_edges: np.ndarray | None,
                 dtype=jnp.float64):
        A = sp.csr_matrix(A, copy=True)
        n = A.shape[0]
        if extra_edges is not None and len(extra_edges):
            # pre-allocate explicit zero slots for candidate additions
            e = np.asarray(extra_edges)
            pattern = sp.coo_matrix(
                (np.full(2 * len(e), 1e-300),
                 (np.concatenate([e[:, 0], e[:, 1]]),
                  np.concatenate([e[:, 1], e[:, 0]]))),
                shape=(n, n),
            )
            A = (A + pattern.tocsr()).tocsr()
        self.mat = CooMatrix.from_scipy(A, dtype=dtype)
        rows = np.asarray(self.mat.rows)
        cols = np.asarray(self.mat.cols)
        self._pos = {}
        for p, (i, j) in enumerate(zip(rows.tolist(), cols.tolist())):
            if p >= self.mat.nnz:
                break
            self._pos[(i, j)] = p
        if extra_edges is not None and len(extra_edges):
            # zero the placeholder values on device
            idx = self._edge_positions(np.asarray(extra_edges))
            self.mat = dataclasses.replace(
                self.mat, vals=self.mat.vals.at[idx].set(0.0)
            )

    def _edge_positions(self, edges: np.ndarray) -> np.ndarray:
        pos = []
        for i, j in edges:
            pos.append(self._pos[(int(i), int(j))])
            if i != j:
                pos.append(self._pos[(int(j), int(i))])
        return np.asarray(pos, dtype=np.int64)

    def set_edge(self, i: int, j: int, value: float):
        idx = self._edge_positions(np.array([[i, j]]))
        self.mat = dataclasses.replace(
            self.mat, vals=self.mat.vals.at[jnp.asarray(idx)].set(value)
        )

    def to_scipy(self) -> sp.csr_matrix:
        out = self.mat.to_scipy()
        out.eliminate_zeros()
        return out

    @property
    def operator(self):
        return self.mat

    def map_edges(self, E: np.ndarray) -> np.ndarray:
        return E

    # -- fused multi-step hooks (optimize/fused.py) -------------------------
    def fused_state(self):
        return self.mat, self.mat.vals

    @staticmethod
    def fused_rebuild(op, vals):
        from .fused import coo_rebuild

        return coo_rebuild(op, vals)

    def fused_slots(self, E: np.ndarray) -> np.ndarray:
        out = np.empty((len(E), 2), np.int64)
        for r, (i, j) in enumerate(E):
            out[r, 0] = self._pos[(int(i), int(j))]
            out[r, 1] = (self._pos[(int(j), int(i))] if i != j
                         else out[r, 0])
        return out

    def set_fused_vals(self, vals):
        self.mat = dataclasses.replace(self.mat, vals=vals)


class _ShardedFrozenMatrix:
    """Frozen-structure adapter over :class:`..parallel.spmm_sharded.
    RowShardedMatrix` — the multi-device production backend (SURVEY.md §5.8,
    §7 step 7). Same contract as :class:`_FrozenStructureMatrix`: fixed
    sparsity (additions pre-allocated as explicit-zero slots), O(1) value
    edits, so one compiled sharded scoring program serves all k greedy
    steps. The operator row-partitions A over the mesh's 'rows' axis and
    (on ≥4-device meshes) shards the candidate batch over 'cands'."""

    def __init__(self, A: sp.spmatrix, extra_edges: np.ndarray | None,
                 dtype=jnp.float64, mesh=None):
        import jax

        from ..parallel.mesh import make_mesh, make_mesh_2d
        from ..parallel.spmm_sharded import RowShardedMatrix

        if mesh is None:
            nd = len(jax.devices())
            if nd >= 4 and nd % 2 == 0:
                # candidate axis first (round-3 ICI-model conclusion:
                # nnz≈n graphs are gather-bound under row sharding)
                mesh = make_mesh_2d(2, nd // 2)
            else:
                mesh = make_mesh(nd)
        A = sp.csr_matrix(A, copy=True)
        n = A.shape[0]
        if extra_edges is not None and len(extra_edges):
            e = np.asarray(extra_edges)
            pattern = sp.coo_matrix(
                (np.full(2 * len(e), 1e-300),
                 (np.concatenate([e[:, 0], e[:, 1]]),
                  np.concatenate([e[:, 1], e[:, 0]]))),
                shape=(n, n),
            )
            A = (A + pattern.tocsr()).tocsr()
        self.mat = RowShardedMatrix.from_scipy(
            A, mesh, dtype=dtype,
            batch_axis="cands" if "cands" in mesh.shape else None,
        )
        # (i, j) -> flat slot position, mirroring from_scipy's per-shard
        # packing: entries row-sorted, contiguous runs per shard, slot =
        # offset within the run, flat = shard·nnz_shard + slot.
        C = sp.coo_matrix(A)
        order = np.argsort(C.row, kind="stable")
        rows, cols = C.row[order], C.col[order]
        D = self.mat.mesh.shape[self.mat.axis]
        rps = self.mat.rows_per_shard
        shard_of = rows // rps
        counts = np.bincount(shard_of, minlength=D)
        nnz_shard = self.mat.rows_local.shape[0] // D
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        flat = shard_of * nnz_shard + (np.arange(len(rows)) - starts[shard_of])
        self._pos = {
            (int(i), int(j)): int(p) for i, j, p in zip(rows, cols, flat)
        }
        if extra_edges is not None and len(extra_edges):
            idx = self._edge_positions(np.asarray(extra_edges))
            self.mat = dataclasses.replace(
                self.mat, vals=self.mat.vals.at[jnp.asarray(idx)].set(0.0)
            )

    _edge_positions = _FrozenStructureMatrix._edge_positions
    set_edge = _FrozenStructureMatrix.set_edge
    fused_state = _FrozenStructureMatrix.fused_state
    fused_rebuild = staticmethod(_FrozenStructureMatrix.fused_rebuild)
    fused_slots = _FrozenStructureMatrix.fused_slots
    set_fused_vals = _FrozenStructureMatrix.set_fused_vals

    @property
    def operator(self):
        return self.mat

    def map_edges(self, E: np.ndarray) -> np.ndarray:
        return E

    def to_scipy(self) -> sp.csr_matrix:
        rows = np.asarray(self.mat.rows)
        cols = np.asarray(self.mat.cols)
        vals = np.asarray(self.mat.vals)
        n = self.mat.n_orig
        # per-shard pad slots carry val 0 and are dropped with the zeros
        out = sp.coo_matrix(
            (vals, (rows, cols)), shape=(self.mat.n, self.mat.n)
        ).tocsr()[:n, :n]
        out.eliminate_zeros()
        return out


class _ShardedBsrFrozenMatrix:
    """Frozen-structure adapter over :class:`..parallel.spmm_sharded.
    BsrRowShardedMatrix` — the multi-device operator whose LOCAL SpMM is
    the super-tile MXU Pallas kernel (VERDICT r4 item 2; SURVEY.md §7 step
    7). Globally RCM-permuted at build time so each shard's row block is
    banded (few column slabs per super-row); candidate selection and
    reported edges stay in the original labeling via the pinv mapping,
    exactly like :class:`_BsrAdapter` on one chip."""

    def __init__(self, A: sp.spmatrix, extra_edges: np.ndarray | None,
                 dtype=jnp.float64, mesh=None, tile=(512, 256),
                 interpret: bool | None = None):
        import jax

        from ..ops.pallas_spmm import rcm_permutation
        from ..parallel.mesh import make_mesh, make_mesh_2d
        from ..parallel.spmm_sharded import BsrRowShardedMatrix

        if mesh is None:
            nd = len(jax.devices())
            if nd >= 4 and nd % 2 == 0:
                mesh = make_mesh_2d(2, nd // 2)
            else:
                mesh = make_mesh(nd)
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        A = sp.csr_matrix(A, copy=True)
        n = A.shape[0]
        if extra_edges is not None and len(extra_edges):
            e = np.asarray(extra_edges)
            pattern = sp.coo_matrix(
                (np.full(2 * len(e), 1e-300),
                 (np.concatenate([e[:, 0], e[:, 1]]),
                  np.concatenate([e[:, 1], e[:, 0]]))),
                shape=(n, n),
            )
            A = (A + pattern.tocsr()).tocsr()
        perm = rcm_permutation(A)
        self.pinv = np.empty_like(perm)
        self.pinv[perm] = np.arange(len(perm))
        # permute in COO space (scipy fancy indexing would drop the
        # explicit-zero addition slots)
        C1 = sp.coo_matrix(A)
        Ap = sp.coo_matrix(
            (C1.data, (self.pinv[C1.row], self.pinv[C1.col])), shape=A.shape
        ).tocsr()
        self.op = BsrRowShardedMatrix.from_scipy(
            Ap, mesh, dtype=dtype,
            batch_axis="cands" if "cands" in mesh.shape else None,
            tile=tile, interpret=interpret)
        rc = self.op.entry_rc()
        flat = self.op.entry_positions()
        self._pos = {(int(i), int(j)): int(p)
                     for (i, j), p in zip(rc, flat)}
        if extra_edges is not None and len(extra_edges):
            idx = self._edge_positions(self.pinv[np.asarray(extra_edges)])
            self.op.set_flat(idx, 0.0)

    _edge_positions = _FrozenStructureMatrix._edge_positions

    @property
    def operator(self):
        return self.op

    def map_edges(self, E: np.ndarray) -> np.ndarray:
        return self.pinv[np.asarray(E)]

    def set_edge(self, i: int, j: int, value: float):
        pi, pj = int(self.pinv[i]), int(self.pinv[j])
        self.op.set_flat(self._edge_positions(np.array([[pi, pj]])), value)

    def to_scipy(self) -> sp.csr_matrix:
        rc = self.op.entry_rc()
        vals = self.op.entry_values().astype(np.float64)
        perm = np.empty_like(self.pinv)
        perm[self.pinv] = np.arange(len(self.pinv))
        n = self.op.n_orig
        keep = (rc[:, 0] < len(perm)) & (rc[:, 1] < len(perm))
        out = sp.coo_matrix(
            (vals[keep], (perm[rc[keep, 0]], perm[rc[keep, 1]])),
            shape=(n, n),
        ).tocsr()
        out.eliminate_zeros()
        return out

    # -- fused multi-step hooks: fused_state/set_fused_vals are shared with
    # the single-chip BSR adapter (assigned after _BsrAdapter below — flat
    # tile-storage view over self.op), fused_slots with the COO lookup;
    # only the rebuild differs (dataclass replace vs tree_unflatten)
    fused_slots = _FrozenStructureMatrix.fused_slots

    @staticmethod
    def fused_rebuild(op, flat_vals):
        from .fused import sharded_bsr_rebuild

        return sharded_bsr_rebuild(op, flat_vals)


class _BandedAdapter:
    """Greedy-facing adapter over the RCM-permuted Pallas operator: maps
    original node ids through the permutation for scoring and edits."""

    def __init__(self, op, pinv: np.ndarray):
        self.op = op
        self.pinv = pinv

    @property
    def operator(self):
        return self.op

    def map_edges(self, E: np.ndarray) -> np.ndarray:
        return self.pinv[np.asarray(E)]

    def set_edge(self, i: int, j: int, value: float):
        self.op.set_edge(int(self.pinv[i]), int(self.pinv[j]), value)

    def to_scipy(self) -> sp.csr_matrix:
        ks, rows = self.op._entry_pos
        cols = self.op._entry_cols
        vals = np.asarray(self.op.valT)[ks, rows]
        perm = np.empty_like(self.pinv)
        perm[self.pinv] = np.arange(len(self.pinv))
        out = sp.coo_matrix(
            (vals, (perm[rows], perm[cols])),
            shape=(self.op.n, self.op.n),
        ).tocsr()
        out.eliminate_zeros()
        return out


class _BsrAdapter(_BandedAdapter):
    """Same permutation-mapping adapter over the BSR MXU operator."""

    # -- fused multi-step hooks: flat view over the tile storage ------------
    def fused_state(self):
        return self.op, self.op.atiles.reshape(-1)

    @staticmethod
    def fused_rebuild(op, flat_vals):
        from .fused import bsr_rebuild

        return bsr_rebuild(op, flat_vals)

    def fused_slots(self, E: np.ndarray) -> np.ndarray:
        tc = self.op.atiles.shape[1] * self.op.atiles.shape[2]
        out = np.empty((len(E), 2), np.int64)
        for r, (i, j) in enumerate(E):
            e1 = self.op.entry_index(int(i), int(j))
            out[r, 0] = (self.op._entry_tile[e1] * tc
                         + self.op._entry_offset[e1])
            if i != j:
                e2 = self.op.entry_index(int(j), int(i))
                out[r, 1] = (self.op._entry_tile[e2] * tc
                             + self.op._entry_offset[e2])
            else:
                out[r, 1] = out[r, 0]
        return out

    def set_fused_vals(self, flat_vals):
        self.op.atiles = flat_vals.reshape(self.op.atiles.shape)

    def to_scipy(self) -> sp.csr_matrix:
        rows, cols = self.op._entry_rc
        vals = self.op.entry_values()
        perm = np.empty_like(self.pinv)
        perm[self.pinv] = np.arange(len(self.pinv))
        out = sp.coo_matrix(
            (vals, (perm[rows], perm[cols])),
            shape=(self.op.n, self.op.n),
        ).tocsr()
        out.eliminate_zeros()
        return out


# shared flat-tile-storage hooks (both wrap an operator at self.op whose
# frozen-structure values live in op.atiles)
_ShardedBsrFrozenMatrix.fused_state = _BsrAdapter.fused_state
_ShardedBsrFrozenMatrix.set_fused_vals = _BsrAdapter.set_fused_vals


def krylov_miobi(
    A: sp.spmatrix,
    k: int,
    E: np.ndarray | None = None,
    tol: float = 1e-12,
    schedule: Sequence[int] = DEFAULT_SCHEDULE,
    mode: str = "break",
    rescale: float = 1.0,
    fun="exp",
    dtype=jnp.float64,
    batch_size: int | None = None,
    shift: float = 0.0,
) -> GreedyResult:
    """Greedy selection of k edges from candidate set E scored by batched
    Krylov trace updates (``functions/krylov_miobi.m``).

    mode='break' removes the arg-min Δtrace edge per step; 'make' adds the
    arg-max. E defaults to all existing edges (``krylov_miobi.m:43-52``).
    """
    A = sp.csr_matrix(A)
    if (abs(A - A.T) > 1e-12).nnz:
        raise ValueError("adjacency matrix must be symmetric")
    if E is None:
        C = sp.coo_matrix(sp.tril(A))
        E = np.stack([C.row, C.col], axis=1)
    E = np.asarray(E, dtype=np.int64)
    if mode == "break" and A.nnz < 2 * k:
        raise ValueError("edges to be removed exceed edges in the network")
    sign = -1.0 if mode == "break" else +1.0

    F = _FrozenStructureMatrix(A, extra_edges=E if mode == "make" else None,
                               dtype=dtype)

    chosen = []
    deltas = []
    iters = []
    times = []
    rob = 0.0
    k_eff = min(k, len(E))
    # fixed-size candidate array + alive mask: the compiled batched scorer is
    # reused across all k steps (no per-step shape changes)
    alive = np.ones(len(E), dtype=bool)
    for _ in range(k_eff):
        t_step = time.perf_counter()
        res = trace_fun_update_edges(
            F.operator, F.map_edges(E), sign=sign, fun=fun, tol=tol,
            rescale=rescale, schedule=schedule, shift=shift,
        )
        scores = np.asarray(res.delta).copy()
        if not _guard_scores(scores[alive], len(chosen)):
            scores[~np.isfinite(scores)] = np.inf if mode == "break" else -np.inf
        scores[~alive] = np.inf if mode == "break" else -np.inf
        h = int(np.argmin(scores) if mode == "break" else np.argmax(scores))
        i, j = int(E[h, 0]), int(E[h, 1])
        chosen.append((i, j))
        deltas.append(float(scores[h]))
        iters.append(int(np.asarray(res.iters)[h]))
        rob += float(scores[h])
        F.set_edge(i, j, 0.0 if mode == "break" else 1.0 / rescale)
        alive[h] = False
        times.append(time.perf_counter() - t_step)
    return GreedyResult(
        edges=np.asarray(chosen, dtype=np.int64).reshape(-1, 2),
        rob_variation=rob,
        A_new=F.to_scipy(),
        per_step_delta=np.asarray(deltas),
        per_step_iters=np.asarray(iters),
        per_step_time=np.asarray(times),
    )


def greedy_krylov(
    A: sp.spmatrix,
    k: int,
    Q: int | None,
    centrality: np.ndarray,
    order: str = "mult",
    tol: float = 1e-12,
    schedule: Sequence[int] = DEFAULT_SCHEDULE,
    mode: str = "break",
    rescale: float = 1.0,
    fun="exp",
    dtype=jnp.float64,
    checkpoint=None,
    dataset: str = "",
    backend: str = "auto",
    shift: float = 0.0,
    mesh=None,
    rescore_every: int = 1,
    rescore_frac: float = 0.2,
    fused_steps: int = 0,
) -> GreedyResult:
    """Adaptive-search-space greedy (``functions/greedy_krylov.m``): select the
    top Q+k candidates by centrality once, then per budget step re-score the
    surviving Q candidates and commit the best edge.

    The candidate list is computed on the ORIGINAL graph at step 1 and only
    shrinks by the chosen edge afterwards (``greedy_krylov.m:64-93``).

    ``backend``: 'coo' (XLA gather/segment-sum), 'banded' (RCM + Pallas lane
    gather, break mode on TPU), 'sharded' (row-partitioned multi-device
    operator with the candidate batch sharded over a 'cands' mesh axis —
    SURVEY.md §5.8; pass ``mesh`` or one is built over all local devices),
    'sharded_bsr' (same row partitioning but the LOCAL SpMM is the
    super-tile MXU Pallas kernel over globally-RCM-permuted row blocks —
    the single-chip kernel lifted into the distributed lane), or 'auto'.
    The banded/BSR operators work in a relabeled node space; candidate
    selection and reported edges stay in the original labeling.

    ``fused_steps`` > 1 runs that many budget steps per device dispatch
    (optimize/fused.py): on-device argmin + frozen-structure commit, with
    automatic per-step fallback to the accurate path when convergence
    stragglers outlive the fused Krylov budget. Mutually exclusive with
    ``rescore_every`` > 1; unsupported on the banded backend.
    """
    import jax

    A = sp.csr_matrix(A, copy=True)
    if Q is None or Q == 0:
        Q = int(A.sum(axis=0).max())
    if mode == "break" and A.nnz < 2 * k:
        raise ValueError("edges to be removed exceed edges in the network")

    if mode == "make":
        top = find_top_missing_edges(A, centrality, Q + k, order)
    else:
        top = find_top_edges(A, centrality, Q + k, order)

    sign = -1.0 if mode == "break" else +1.0

    # Pallas backend selection. Break edits zero existing slots; make edits
    # write pre-allocated explicit-zero slots at the candidate (missing)
    # edges, so both modes run on the frozen-structure super-tile kernel.
    # Measured on v5e (Vermont): the super-tile MXU kernel wins at the wide
    # batches the paper protocol uses (2·Q ≈ 500 Lanczos columns), the
    # banded lane-gather kernel at narrow ones (break only — arbitrary
    # additions fall outside its RCM band); XLA COO is the fallback for
    # graphs with no block/band structure.
    use_banded = use_bsr = False
    A_aug = None
    def run_loop(F):
        # below the dense cutoff the per-step loop scores through the EXACT
        # dense path (trace_fun_update.m:37); keep that guarantee. Above
        # the HBM cell ceiling the fused block cannot run (it scores the
        # whole window in ONE program — only the per-step lane chunks the
        # candidate batch), so large-Q windows take the per-step loop.
        from ..updates.trace_update import DENSE_N_CUTOFF, MAX_SCORE_CELLS

        # margin on the ceiling: the block's actual window is padded to the
        # mesh multiple (up to +64) and the operator's rows carry RCM/tile
        # padding, both unknown here — 3/4 of the ceiling keeps boundary
        # configurations on the chunked per-step lane instead of risking
        # the calibrated HBM limit
        if (fused_steps > 1 and rescore_every <= 1
                and A.shape[0] > DENSE_N_CUTOFF
                and (Q + fused_steps + 64) * A.shape[0]
                <= (3 * MAX_SCORE_CELLS) // 4
                and hasattr(F, "fused_state")):
            return _greedy_loop_fused(F, top, Q, k, mode, sign, fun, tol,
                                      rescale, schedule, shift, checkpoint,
                                      dataset, R=fused_steps)
        return _greedy_loop(F, top, Q, k, mode, sign, fun, tol, rescale,
                            schedule, shift, checkpoint, dataset,
                            rescore_every=rescore_every,
                            rescore_frac=rescore_frac)

    if backend == "sharded":
        F = _ShardedFrozenMatrix(
            A, extra_edges=top if mode == "make" else None, dtype=dtype,
            mesh=mesh,
        )
        return run_loop(F)
    if backend == "sharded_bsr":
        F = _ShardedBsrFrozenMatrix(
            A, extra_edges=top if mode == "make" else None, dtype=dtype,
            mesh=mesh,
        )
        return run_loop(F)
    want_pallas = backend in ("auto", "banded", "bsr")
    if want_pallas and (backend != "auto" or jax.default_backend() == "tpu"):
        from ..ops.pallas_bsr_super import (
            TILE_C,
            TILE_R,
            super_tile_count,
        )
        from ..ops.pallas_spmm import rcm_bandwidth, rcm_permutation

        perm = rcm_permutation(A)
        wide_batch = 2 * Q >= 256
        if backend == "bsr" or (backend == "auto" and wide_batch):
            A_aug = A
            if mode == "make":
                # pre-allocate candidate slots as explicit zeros (both
                # triangles) so greedy additions are pure value updates
                C0 = sp.coo_matrix(A)
                r = np.concatenate([C0.row, top[:, 0], top[:, 1]])
                c = np.concatenate([C0.col, top[:, 1], top[:, 0]])
                v = np.concatenate(
                    [C0.data, np.zeros(2 * len(top), C0.data.dtype)]
                )
                A_aug = sp.coo_matrix((v, (r, c)), shape=A.shape).tocsr()
            ntile = super_tile_count(A_aug, perm)
            # bf16 tile storage (mode auto picks bf16x2 for 0/±1 adjacency)
            use_bsr = ntile * TILE_R * TILE_C * 2 <= 768 * 1024 * 1024
        if not use_bsr and mode == "break":
            bw = rcm_bandwidth(A, perm)
            use_banded = 2 * ((bw + 127) // 128 + 1) - 1 <= 17

    if use_bsr or use_banded:
        pinv = np.empty_like(perm)
        pinv[perm] = np.arange(len(perm))
        interpret = jax.default_backend() != "tpu"
        if use_bsr:
            from ..ops.pallas_bsr_super import SuperBsrOperator

            # permute in COO space: scipy's fancy-indexing permutation
            # routes through matrix products that drop the explicit-zero
            # slots make mode depends on
            C1 = sp.coo_matrix(A_aug)
            Ap = sp.coo_matrix(
                (C1.data, (pinv[C1.row], pinv[C1.col])), shape=A.shape
            ).tocsr()
            F = _BsrAdapter(
                SuperBsrOperator(Ap, dtype=dtype, interpret=interpret), pinv
            )
        else:
            from ..ops.pallas_spmm import BandedEllOperator

            Ap = A[perm, :].tocsc()[:, perm].tocsr()
            F = _BandedAdapter(
                BandedEllOperator(Ap, dtype=dtype, interpret=interpret), pinv
            )
    else:
        # freeze structure once for the sweep (additions pre-allocated)
        F = _FrozenStructureMatrix(
            A, extra_edges=top if mode == "make" else None, dtype=dtype
        )
    return run_loop(F)


def _replay_checkpoint(F, top, mode, rescale, checkpoint, dataset):
    """Resume bookkeeping shared by the per-step and fused loops: re-apply
    recorded edits, shrink the search space, restore the running tallies."""
    chosen: list = []
    deltas: list = []
    iters: list = []
    times: list = []
    rob = 0.0
    start_step = 0
    if checkpoint is not None:
        state = checkpoint.load(dataset)
        if state is not None:
            for i, j in state["edges"]:
                F.set_edge(int(i), int(j),
                           0.0 if mode == "break" else 1.0 / rescale)
                keep = ~((top[:, 0] == i) & (top[:, 1] == j))
                top = top[keep]
                chosen.append((int(i), int(j)))
            rob = state["rob_variation"]
            start_step = state["step"]
            deltas = state["extra"].get("deltas", [0.0] * start_step)
            iters = state["extra"].get("iters", [0] * start_step)
            times = state["extra"].get("times", [0.0] * start_step)
    return top, chosen, deltas, iters, times, rob, start_step


def _greedy_loop_fused(F, top, Q, k, mode, sign, fun, tol, rescale, schedule,
                       shift, checkpoint, dataset, R=8, rounds=None,
                       round_len=None):
    """Fused-block budget loop: R greedy steps per device dispatch
    (optimize/fused.py — the reference hot loop ``krylov_miobi.m:112-137``
    collapsed on device). Any step whose scored window has convergence
    stragglers beyond the fused budget is replayed through the accurate
    per-step path, so results keep the full 100-step straggler guarantee."""
    import warnings

    from ..funm.scalar import get_fun
    from .fused import FUSED_ROUND_LEN, FUSED_ROUNDS, fused_greedy_block

    rescale = float(rescale)
    fun_name = get_fun(fun).name
    rounds = FUSED_ROUNDS if rounds is None else int(rounds)
    round_len = FUSED_ROUND_LEN if round_len is None else int(round_len)
    top, chosen, deltas, iters, times, rob, step = _replay_checkpoint(
        F, top, mode, rescale, checkpoint, dataset)
    commit = 0.0 if mode == "break" else 1.0 / rescale
    op0, _ = F.fused_state()
    ba = getattr(op0, "batch_axis", None)
    pad_mult = int(op0.mesh.shape[ba]) if ba else 1

    def record(i, j, d, it, t):
        nonlocal rob
        chosen.append((int(i), int(j)))
        deltas.append(float(d))
        iters.append(int(it))
        rob += float(d)
        times.append(t)

    def shrink(i, j):
        nonlocal top
        keep = ~((top[:, 0] == i) & (top[:, 1] == j))
        top = top[keep]

    # FIXED table size for the whole sweep: one compiled block program.
    # (min(len(top), Q+R) would shrink as commits consume the candidate
    # list, retracing the block every step near the end of the budget.)
    nC_pad = -(-(Q + R) // pad_mult) * pad_mult
    # persistent-straggler bail-out: a dataset whose window candidates
    # routinely outlive the fused Krylov budget would otherwise pay a full
    # discarded R-step block before EVERY accurate replay; after two
    # consecutive zero-accept blocks, devolve to per-step scoring for the
    # rest of the sweep
    consec_bad = 0
    devolved = False
    while step < k:
        acc = 0
        want = min(R, k - step)
        if not devolved:
            t0 = time.perf_counter()
            nC = min(len(top), nC_pad)
            table = top[:nC]
            if nC_pad > nC:
                table = np.concatenate(
                    [table, np.repeat(table[:1], nC_pad - nC, axis=0)])
            alive = np.zeros(nC_pad, bool)
            alive[:nC] = True
            mapped = np.asarray(F.map_edges(table))
            slots = F.fused_slots(mapped)
            op, vals = F.fused_state()
            vals_f, alive_f, (hs, dls, its, oks, nfs) = fused_greedy_block(
                op, vals, jnp.asarray(mapped), jnp.asarray(slots),
                jnp.asarray(alive), commit, tol, shift, sign, rescale,
                rebuild=F.fused_rebuild, Q=Q, R=R, mode=mode,
                fun_name=fun_name, rounds=rounds, round_len=round_len)
            hs, dls = np.asarray(hs), np.asarray(dls)
            its = np.asarray(its)
            oks, nfs = np.asarray(oks), np.asarray(nfs)
            while acc < want and oks[acc]:
                acc += 1
            if np.any(nfs[:max(acc, 1)]):
                warnings.warn(
                    f"fused greedy {dataset}: non-finite candidate scores "
                    f"in steps {step}..{step + acc} (excluded from the "
                    "argmin)", RuntimeWarning)
            t_per = (time.perf_counter() - t0) / max(acc, 1)
            for r in range(acc):
                h = int(hs[r])
                record(table[h, 0], table[h, 1], dls[r], its[r], t_per)
                shrink(table[h, 0], table[h, 1])
            if acc == R:
                F.set_fused_vals(vals_f)
            elif acc > 0:
                idxs = slots[hs[:acc]].reshape(-1)
                F.set_fused_vals(
                    vals.at[jnp.asarray(idxs)].set(
                        jnp.asarray(commit, vals.dtype)))
            step += acc
            if checkpoint is not None and acc:
                checkpoint.save(dataset, step, chosen, rob,
                                extra={"deltas": deltas, "iters": iters,
                                       "times": times})
            consec_bad = consec_bad + 1 if acc == 0 else 0
            if consec_bad >= 2:
                devolved = True
                warnings.warn(
                    f"fused greedy {dataset}: convergence stragglers "
                    f"outlive the fused budget persistently at step {step};"
                    " devolving to per-step scoring for the remaining "
                    "budget", RuntimeWarning)
        if devolved or (acc < want and not oks[acc]):
            # convergence straggler in this step's window: score it through
            # the accurate per-step path (full straggler extension)
            t1 = time.perf_counter()
            E = top[:Q]
            res = trace_fun_update_edges(
                F.operator, F.map_edges(E), sign=sign, fun=fun, tol=tol,
                rescale=rescale, schedule=schedule, shift=shift)
            scores = np.asarray(res.delta).copy()
            worst = np.inf if mode == "break" else -np.inf
            if not _guard_scores(scores, step, dataset):
                scores[~np.isfinite(scores)] = worst
            h = int(np.argmin(scores) if mode == "break"
                    else np.argmax(scores))
            i, j = int(E[h, 0]), int(E[h, 1])
            F.set_edge(i, j, commit)
            record(i, j, scores[h], np.asarray(res.iters)[h],
                   time.perf_counter() - t1)
            shrink(i, j)
            step += 1
            if checkpoint is not None:
                checkpoint.save(dataset, step, chosen, rob,
                                extra={"deltas": deltas, "iters": iters,
                                       "times": times})
    if checkpoint is not None:
        checkpoint.clear()
    return GreedyResult(
        edges=np.asarray(chosen, dtype=np.int64).reshape(-1, 2),
        rob_variation=rob,
        A_new=F.to_scipy(),
        per_step_delta=np.asarray(deltas),
        per_step_iters=np.asarray(iters),
        per_step_time=np.asarray(times),
    )


def _greedy_loop(F, top, Q, k, mode, sign, fun, tol, rescale, schedule,
                 shift, checkpoint, dataset, rescore_every=1,
                 rescore_frac=0.2):
    """The budget loop shared by every backend: score the surviving Q
    candidates in one batched device call, commit the best edge, shrink the
    search space (``greedy_krylov.m:64-93``).

    ``rescore_every`` > 1 enables per-step candidate-score REUSE (the
    "fewer products" lever of ``ops/pallas_bsr_super.py:70-85``): scores
    drift slowly across greedy steps, so the full set is rescored only
    every that-many steps; between full rescores a FIXED-size subset — the
    current best ``rescore_frac`` of candidates by stale score, plus every
    candidate incident to the last edit — is scored fresh (fixed batch
    shape ⇒ one compiled program). The committed winner always carries a
    fresh this-step score: if the argmin lands on a stale candidate, the
    step falls back to a full rescore. rescore_every=1 is the reference
    protocol (full rescore each step)."""
    rescale = float(rescale)
    chosen = []
    deltas = []
    iters = []
    times = []
    rob = 0.0
    start_step = 0
    if checkpoint is not None:
        state = checkpoint.load(dataset)
        if state is not None:
            # replay recorded progress: apply edits, shrink the search space
            for i, j in state["edges"]:
                F.set_edge(int(i), int(j), 0.0 if mode == "break" else 1.0 / rescale)
                keep = ~((top[:, 0] == i) & (top[:, 1] == j))
                top = top[keep]
                chosen.append((int(i), int(j)))
            rob = state["rob_variation"]
            start_step = state["step"]
            deltas = state["extra"].get("deltas", [0.0] * start_step)
            iters = state["extra"].get("iters", [0] * start_step)
            times = state["extra"].get("times", [0.0] * start_step)
    worst = np.inf if mode == "break" else -np.inf
    scores_all = np.full(len(top), np.nan)  # stale scores aligned with top
    iters_all = np.zeros(len(top), np.int64)
    have_scores = False
    last_edit = None
    for step in range(start_step, k):
        t_step = time.perf_counter()
        E = top[:Q]
        nE = len(E)
        do_full = (rescore_every <= 1 or not have_scores
                   or (step - start_step) % rescore_every == 0)
        if not do_full:
            stale = scores_all[:nE]
            # fixed-size fresh subset: current best fraction by stale score
            # + candidates incident to the last edit + never-scored window
            # entrants; padded up to a multiple of 64 so the batched scorer
            # reuses one compiled program shape
            T_fix = min(nE, max(64, -(-int(nE * rescore_frac) // 64) * 64))
            rank_key = np.where(np.isnan(stale), worst,
                                stale if mode == "break" else -stale)
            order = np.argsort(rank_key, kind="stable")
            sel_mask = np.zeros(nE, bool)
            sel_mask[order[:T_fix]] = True
            sel_mask |= np.isnan(stale)
            if last_edit is not None:
                li, lj = last_edit
                sel_mask |= (
                    (E[:, 0] == li) | (E[:, 1] == li)
                    | (E[:, 0] == lj) | (E[:, 1] == lj)
                )
            sel = np.nonzero(sel_mask)[0]
            want = min(nE, -(-len(sel) // 64) * 64)
            if len(sel) < want:  # fill with next-best stale candidates
                extra = order[~sel_mask[order]][: want - len(sel)]
                sel = np.sort(np.concatenate([sel, extra]))
            res = trace_fun_update_edges(
                F.operator, F.map_edges(E[sel]), sign=sign, fun=fun,
                tol=tol, rescale=rescale, schedule=schedule, shift=shift,
            )
            scores = stale.copy()
            scores[sel] = np.asarray(res.delta)
            iters_vec = iters_all[:nE].copy()
            iters_vec[sel] = np.asarray(res.iters)
            guarded = np.zeros(nE, bool)
            if not _guard_scores(scores, step, dataset):
                guarded = ~np.isfinite(scores)
                scores[guarded] = worst
            h = int(np.argmin(scores) if mode == "break"
                    else np.argmax(scores))
            if not sel_mask[h]:
                # the would-be winner carries a stale score: fall back to a
                # full rescore so the committed pick is always fresh
                do_full = True
        if do_full:
            res = trace_fun_update_edges(
                F.operator, F.map_edges(E), sign=sign, fun=fun, tol=tol,
                rescale=rescale, schedule=schedule, shift=shift,
            )
            scores = np.asarray(res.delta).copy()
            iters_vec = np.asarray(res.iters).copy()
            guarded = np.zeros(nE, bool)
            if not _guard_scores(scores, step, dataset):
                guarded = ~np.isfinite(scores)
                scores[guarded] = worst
            h = int(np.argmin(scores) if mode == "break"
                    else np.argmax(scores))
        scores_all[:nE] = scores
        # guarded (transiently non-finite) entries persist as NaN, not
        # worst: NaN re-enters the never-scored refresh set next step, so a
        # non-converged candidate is retried immediately instead of staying
        # excluded until the next periodic full rescore (ADVICE r4)
        scores_all[:nE][guarded] = np.nan
        iters_all[:nE] = iters_vec
        have_scores = True
        i, j = int(E[h, 0]), int(E[h, 1])
        chosen.append((i, j))
        deltas.append(float(scores[h]))
        iters.append(int(iters_vec[h]))
        rob += float(scores[h])
        F.set_edge(i, j, 0.0 if mode == "break" else 1.0 / rescale)
        last_edit = (i, j)
        # drop the chosen edge from the search space (greedy_krylov.m:68-71)
        keep = ~((top[:, 0] == i) & (top[:, 1] == j))
        top = top[keep]
        scores_all = scores_all[keep]
        iters_all = iters_all[keep]
        times.append(time.perf_counter() - t_step)
        if checkpoint is not None:
            checkpoint.save(dataset, step + 1, chosen, rob,
                            extra={"deltas": deltas, "iters": iters,
                                   "times": times})
    if checkpoint is not None:
        checkpoint.clear()
    return GreedyResult(
        edges=np.asarray(chosen, dtype=np.int64).reshape(-1, 2),
        rob_variation=rob,
        A_new=F.to_scipy(),
        per_step_delta=np.asarray(deltas),
        per_step_iters=np.asarray(iters),
        per_step_time=np.asarray(times),
    )
