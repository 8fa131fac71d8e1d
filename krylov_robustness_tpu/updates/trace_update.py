"""Batched trace(f(A + U·B·Uᵀ) − f(A)) via block Lanczos.

This is the innermost kernel of the greedy optimizer — the reference calls
``trace_fun_update`` once per candidate edge per greedy step
(``krylov_miobi.m:99``), each an independent rank-2 Krylov run over the same
matrix. Here the whole candidate set is evaluated in ONE device program:

* all candidates' block recurrences advance together (single fused SpMM per
  step, width = candidates · 2),
* the projected trace differences come from **batched eigh** of the small
  tridiagonal projections,
* the reference's lag-2 stopping rule (``trace_fun_update.m:57-59,103-118``)
  becomes a *checkpoint schedule*: the recurrence runs in jitted PHASES, each
  phase containing several checkpoint rounds traced straight-line (one
  compile per phase, not per round); convergence is checked per candidate at
  round boundaries (X_m vs X_{m−lag}) inside the phase, and the host only
  decides between phases whether stragglers remain. Converged values freeze
  while stragglers continue — trading the reference's per-edge dynamic loop
  for compiled code plus masks.
* the reference's dense small-n fast path (``trace_fun_update.m:37-51``) is
  exposed as :func:`trace_fun_update_single`.

Zero-padding correctness: dead/converged candidates emit zero blocks, which
append *identical* decoupled zero eigenvalues to both tGm and Gm — their f
contributions cancel exactly in the difference, so masked sizes need no
special-casing.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..funm.dense import trace_fun_difference_eigs, trace_fun_update_dense
from ..funm.scalar import get_fun
from ..krylov.lanczos import (
    LanczosBlocks,
    LanczosState,
    assemble_tridiag,
    lanczos_continue,
    lanczos_start,
)

DEFAULT_SCHEDULE = (6, 6, 8, 12, 20, 28, 20)  # cumulative 100 = reference max it
DENSE_N_CUTOFF = 130  # reference trace_fun_update.m:37
# rounds per jitted phase: phase 1 = rounds covering the common convergence
# range; later phases only run for stragglers
DEFAULT_PHASES = (3, 2, 2)


def edge_start_blocks(n: int, edges: jax.Array, dtype) -> jax.Array:
    """U = [e_i, e_j] per candidate edge: (batch, n, 2) one-hot blocks
    (``krylov_miobi.m:91-94``)."""
    batch = edges.shape[0]
    U = jnp.zeros((batch, n, 2), dtype)
    b_idx = jnp.arange(batch)
    U = U.at[b_idx, edges[:, 0], 0].set(1.0)
    U = U.at[b_idx, edges[:, 1], 1].set(1.0)
    return U


def edge_B(edges: jax.Array, sign: float, rescale: float, dtype) -> jax.Array:
    """Rank-2 core factor ∓[[0,1],[1,0]]/rescale, degraded to rank-1 for
    self-loop rows (``krylov_miobi.m:76-98``)."""
    batch = edges.shape[0]
    off = jnp.asarray(sign / rescale, dtype)
    B = jnp.tile(jnp.array([[0.0, 1.0], [1.0, 0.0]], dtype), (batch, 1, 1))
    B = B * off
    is_loop = edges[:, 0] == edges[:, 1]
    B_loop = jnp.array([[1.0, 0.0], [0.0, 0.0]], dtype) * off
    return jnp.where(is_loop[:, None, None], B_loop[None], B)


@partial(jax.jit, static_argnames=("m_total", "bs", "fun_name"))
def _delta_trace_at(blocks_h, blocks_beta, Cm, m_total: int, bs: int,
                    fun_name: str, shift=0.0):
    """Δtrace from the first ``m_total`` recurrence steps (batched eigh)."""
    blocks = LanczosBlocks(
        h=blocks_h[:m_total], beta=blocks_beta[:m_total],
        lucky_step=jnp.zeros(blocks_h.shape[1], jnp.int32),
    )
    G = assemble_tridiag(blocks, bs=bs, m=m_total)
    G = (G + jnp.swapaxes(G, -1, -2)) / 2  # trace_fun_update.m:78-81
    k = Cm.shape[-1]
    tG = G.at[:, :k, :k].add((Cm + jnp.swapaxes(Cm, -1, -2)) / 2)
    d1 = jnp.linalg.eigvalsh(tG)
    d2 = jnp.linalg.eigvalsh(G)
    return trace_fun_difference_eigs(d1, d2, fun_name, shift=shift)


@partial(
    jax.jit,
    static_argnames=("rounds", "m_prev", "bs", "fun_name", "lag"),
)
def _phase(A, state: LanczosState, h_prev, beta_prev, Cm, tol, shift,
           delta, iters, converged, best_err,
           rounds: tuple, m_prev: int, bs: int, fun_name: str, lag: int):
    """One jitted phase: several checkpoint rounds traced straight-line.

    Extends the recurrence by sum(rounds) steps; at each round boundary
    computes the lag test and freezes newly-converged candidates.
    """
    h_all = [h_prev] if m_prev else []
    beta_all = [beta_prev] if m_prev else []
    m_done = m_prev
    for steps in rounds:
        blocks, state = lanczos_continue(A, state, steps)
        h_all.append(blocks.h)
        beta_all.append(blocks.beta)
        m_done += steps
        H = jnp.concatenate(h_all, axis=0) if len(h_all) > 1 else h_all[0]
        Bt = jnp.concatenate(beta_all, axis=0) if len(beta_all) > 1 else beta_all[0]
        x_lag = _delta_trace_at(H, Bt, Cm, m_done - lag, bs, fun_name,
                                shift=shift)
        x_now = _delta_trace_at(H, Bt, Cm, m_done, bs, fun_name,
                                shift=shift)
        err = jnp.abs(x_now - x_lag)
        dead = jnp.logical_not(state.alive)
        newly = jnp.logical_and(
            jnp.logical_not(converged), jnp.logical_or(err < tol, dead)
        )
        # best-iterate tracking (see _trace_update_host_eigh): only accept
        # x_now while the lag error is still shrinking — Lanczos-ghost drift
        # in low precision makes later iterates worse, not better
        improved = jnp.logical_and(jnp.logical_not(converged),
                                   jnp.logical_or(err <= best_err, newly))
        delta = jnp.where(improved, x_now, delta)
        iters = jnp.where(improved, m_done, iters)
        best_err = jnp.where(improved, err, best_err)
        converged = jnp.logical_or(converged, newly)
    H = jnp.concatenate(h_all, axis=0) if len(h_all) > 1 else h_all[0]
    Bt = jnp.concatenate(beta_all, axis=0) if len(beta_all) > 1 else beta_all[0]
    return state, H, Bt, delta, iters, converged, best_err


@dataclasses.dataclass
class TraceUpdateResult:
    delta: jax.Array  # (batch,) trace differences
    iters: jax.Array  # (batch,) steps used at acceptance
    converged: jax.Array  # (batch,) bool


def _eigvals_banded_batch(G: np.ndarray, nband: int) -> np.ndarray:
    """Eigenvalues of a batch of symmetric BANDED matrices (lower bandwidth
    < nband) via LAPACK dsbev — O(M²·nband) per candidate instead of
    eigvalsh's O(M³), which dominates the greedy wall time on TPU sessions
    (the projected matrices are block-tridiagonal, ``trace_fun_update.m``'s
    Gm structure)."""
    import scipy.linalg

    batch, M, _ = G.shape
    band = np.zeros((batch, nband, M), G.dtype)
    for d in range(nband):
        band[:, d, : M - d] = np.diagonal(G, -d, axis1=1, axis2=2)
    out = np.empty((batch, M), G.dtype)
    for c in range(batch):
        out[c] = scipy.linalg.eigvals_banded(
            band[c], lower=True, check_finite=False,
        )
    return out


def _host_delta_trace(h_np, beta_np, Cm_np, m_total: int, bs: int,
                      fun_name: str, shift: float = 0.0):
    """Host (numpy/LAPACK) version of :func:`_delta_trace_at`.

    The projected matrices are tiny ((2m)² per candidate) — on TPU sessions
    batched ``eigh`` inside the phase programs compiles into ~100 MB
    executables on the remote compile server (minutes per phase shape), so
    for TPU the device keeps only the SpMM-heavy recurrence and the small
    dense math runs here (same split as compute_centrality_host). The
    matrices are block-tridiagonal (bandwidth 3·bs−1, plus the top-left
    2bs×2bs Cm block inside that band), so the spectra come from the banded
    LAPACK solver — the dense eigvalsh here was the greedy bottleneck.
    """
    steps, batch = h_np.shape[0], h_np.shape[1]
    M = m_total * bs
    G = np.zeros((batch, M + 2 * bs, M), h_np.dtype)
    for j in range(m_total):
        contrib = np.concatenate([h_np[j], beta_np[j]], axis=1)  # (batch,3bs,bs)
        G[:, j * bs:(j + 3) * bs, j * bs:(j + 1) * bs] = contrib
    G = G[:, bs:bs + M, :]
    G = (G + np.swapaxes(G, -1, -2)) / 2
    k = Cm_np.shape[-1]
    tG = G.copy()
    tG[:, :k, :k] += (Cm_np + np.swapaxes(Cm_np, -1, -2)) / 2
    nband = min(max(3 * bs, k), M)  # Cm (k×k) sits inside the band for k≤3bs
    d1 = _eigvals_banded_batch(tG, nband)
    d2 = _eigvals_banded_batch(G, nband)
    from ..funm.dense import trace_fun_difference_eigs

    import jax.numpy as _jnp

    return np.asarray(
        trace_fun_difference_eigs(_jnp.asarray(d1), _jnp.asarray(d2), fun_name,
                                  shift=shift)
    )


def _trace_update_host_eigh(A, U0, B, fun, tol, schedule, lag,
                            shift: float = 0.0):
    """TPU-session variant: device runs jitted Lanczos extension rounds
    (scan of SpMM + MGS only — small, fast-compiling programs), host does
    the per-round projected eigendecompositions and the lag-d convergence
    bookkeeping (``trace_fun_update.m:103-118``)."""
    batch = U0.shape[0]
    bs = U0.shape[-1]
    dtype = U0.dtype
    state, R0 = lanczos_start(A, U0)
    Cm = np.asarray(jnp.einsum("bkl,blm,bpm->bkp", R0, B, R0))

    delta = np.zeros((batch,), np.float64)
    iters = np.zeros((batch,), np.int32)
    converged = np.zeros((batch,), bool)
    # In f32 the 3-term recurrence loses orthogonality once a Ritz pair
    # converges (classic Lanczos ghosts): the lag error REACHES a floor and
    # then drifts back up, so the last iterate can be worse than an earlier
    # one. Keep the minimum-lag-error iterate per candidate and return it
    # when the tolerance is never met.
    best_err = np.full((batch,), np.inf)
    h_np = np.zeros((0, batch, 2 * bs, bs), np.float64)
    beta_np = np.zeros((0, batch, bs, bs), np.float64)
    m_done = 0
    extend = jax.jit(lanczos_continue, static_argnames=("num_steps",))
    for steps in schedule:
        blocks, state = extend(A, state, num_steps=int(steps))
        h_np = np.concatenate([h_np, np.asarray(blocks.h, np.float64)], axis=0)
        beta_np = np.concatenate(
            [beta_np, np.asarray(blocks.beta, np.float64)], axis=0
        )
        m_done += int(steps)
        act = np.nonzero(~converged)[0]  # host eigh only for stragglers
        if len(act) == 0:
            break
        x_lag = _host_delta_trace(
            h_np[:, act], beta_np[:, act], Cm[act], m_done - lag, bs, fun.name,
            shift=shift,
        )
        x_now = _host_delta_trace(
            h_np[:, act], beta_np[:, act], Cm[act], m_done, bs, fun.name,
            shift=shift,
        )
        err = np.abs(x_now - x_lag)
        dead = ~np.asarray(state.alive)[act]
        # dtype-aware floor: an f32 recurrence cannot resolve below ~32 eps
        # relative — without this, candidates whose true error plateaus at
        # the noise floor burn the whole 100-step budget
        eps_m = np.finfo(np.dtype(dtype)).eps
        tol_eff = np.maximum(tol, 32.0 * eps_m * np.abs(x_now))
        newly = (err < tol_eff) | dead
        improved = err <= best_err[act]
        upd = act[improved | newly]
        delta[upd] = x_now[improved | newly]
        iters[upd] = m_done
        best_err[act] = np.minimum(best_err[act], err)
        converged[act] = newly
        if converged.all():
            break
    return TraceUpdateResult(
        delta=jnp.asarray(delta, dtype),
        iters=jnp.asarray(iters),
        converged=jnp.asarray(converged),
    )


def trace_fun_update_batched(
    A,
    U0: jax.Array,
    B: jax.Array,
    fun="exp",
    tol: float = 1e-12,
    schedule: Sequence[int] = DEFAULT_SCHEDULE,
    lag: int = 2,
    phases: Sequence[int] = DEFAULT_PHASES,
    host_eigh: bool | None = None,
    shift: float = 0.0,
) -> TraceUpdateResult:
    """Batched trace(f(A + U B Uᵀ) − f(A)).

    Parameters mirror ``functions/trace_fun_update.m``; ``schedule`` is the
    round structure replacing the per-iteration dynamic stopping (its sum is
    the reference's ``it`` cap); ``phases`` groups rounds into jitted
    programs — later phases run only if stragglers remain. U0: (batch, n,
    bs); B: (batch, bs, bs).
    """
    fun = get_fun(fun)
    batch, n, bs = U0.shape
    dtype = U0.dtype

    if host_eigh is None:
        # On TPU sessions the batched in-jit eigh compiles into huge remote
        # executables; split device-recurrence/host-eigh instead.
        host_eigh = jax.default_backend() == "tpu" and n > DENSE_N_CUTOFF

    # Dense exact fast path for small n (reference ``trace_fun_update.m:37``
    # takes it unconditionally when n ≤ 130): two batched eighs beat any
    # Krylov run, and joint high-rank updates (cross-method rescoring) stay
    # exact where the Krylov space would saturate.
    if n <= DENSE_N_CUTOFF and hasattr(A, "todense"):
        Ad = A.todense()[:n, :n].astype(dtype)
        Ad = (Ad + Ad.T) / 2
        d2 = jnp.sort(jnp.linalg.eigvalsh(Ad))
        At = Ad[None] + jnp.einsum("bnk,bkl,bml->bnm", U0, B, U0)
        At = (At + jnp.swapaxes(At, -1, -2)) / 2
        d1 = jnp.sort(jnp.linalg.eigvalsh(At))
        delta = trace_fun_difference_eigs(d1, d2[None], fun.name,
                                          shift=shift)
        return TraceUpdateResult(
            delta=delta,
            iters=jnp.zeros((batch,), jnp.int32),
            converged=jnp.ones((batch,), bool),
        )

    if host_eigh:
        return _trace_update_host_eigh(A, U0, B, fun, tol, schedule, lag,
                                       shift=shift)

    state, R0 = lanczos_start(A, U0)
    Cm = jnp.einsum("bkl,blm,bpm->bkp", R0, B, R0)

    # partition the schedule into phases
    phase_rounds = []
    idx = 0
    for p in phases:
        chunk = tuple(schedule[idx:idx + p])
        if chunk:
            phase_rounds.append(chunk)
        idx += p
    rest = tuple(schedule[idx:])
    if rest:
        phase_rounds.append(rest)

    delta = jnp.zeros((batch,), dtype)
    iters = jnp.zeros((batch,), jnp.int32)
    converged = jnp.zeros((batch,), bool)
    best_err = jnp.full((batch,), jnp.inf, dtype)
    h = jnp.zeros((0, batch, 2 * bs, bs), dtype)
    beta = jnp.zeros((0, batch, bs, bs), dtype)
    m_prev = 0
    tol_arr = jnp.asarray(tol, dtype)
    for rounds in phase_rounds:
        state, h, beta, delta, iters, converged, best_err = _phase(
            A, state, h, beta, Cm, tol_arr, jnp.asarray(shift, dtype),
            delta, iters, converged, best_err,
            rounds=rounds, m_prev=m_prev, bs=bs, fun_name=fun.name, lag=lag,
        )
        m_prev += sum(rounds)
        if bool(jnp.all(converged)):
            break

    return TraceUpdateResult(delta=delta, iters=iters, converged=converged)


def trace_fun_update_edges(
    A,
    edges: np.ndarray | jax.Array,
    sign: float,
    fun="exp",
    tol: float = 1e-12,
    rescale: float = 1.0,
    schedule: Sequence[int] = DEFAULT_SCHEDULE,
    phases: Sequence[int] = DEFAULT_PHASES,
    shift: float = 0.0,
) -> TraceUpdateResult:
    """Score all candidate edges at once: Δtrace for removing (sign=-1) or
    adding (sign=+1) each edge independently. The device-batched replacement
    for the loop at ``krylov_miobi.m:76-125``."""
    edges = jnp.asarray(edges)
    U0 = edge_start_blocks(A.n, edges, A.dtype)
    B = edge_B(edges, sign, rescale, A.dtype)
    return trace_fun_update_batched(
        A, U0, B, fun=fun, tol=tol, schedule=schedule, phases=phases,
        shift=shift,
    )


def trace_fun_update_single(
    A_dense: jax.Array, U: jax.Array, B: jax.Array, fun="exp"
) -> jax.Array:
    """Dense exact path (reference ``trace_fun_update.m:37-51``) for small n
    or oracle checks."""
    return trace_fun_update_dense(A_dense, U, B, fun)
