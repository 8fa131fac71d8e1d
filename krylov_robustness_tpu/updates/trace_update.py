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


_EIG_POOL = None


def _eig_pool():
    """Shared thread pool for the host LAPACK spectra: scipy's banded eig
    releases the GIL inside the Fortran call, so candidates factor in
    parallel on the host cores while the device sits idle anyway."""
    global _EIG_POOL
    if _EIG_POOL is None:
        import concurrent.futures
        import os

        _EIG_POOL = concurrent.futures.ThreadPoolExecutor(
            max_workers=min(8, os.cpu_count() or 2)
        )
    return _EIG_POOL


def _eigvals_banded_batch(band: np.ndarray) -> np.ndarray:
    """Eigenvalues of a batch of symmetric matrices in LOWER-banded storage
    (batch, nband, M) via LAPACK dsbev — O(M²·nband) per candidate instead
    of eigvalsh's O(M³). Threaded across the batch."""
    import scipy.linalg

    batch, _, M = band.shape
    out = np.empty((batch, M), band.dtype)

    def one(c):
        out[c] = scipy.linalg.eigvals_banded(
            band[c], lower=True, check_finite=False,
        )

    if batch > 1:
        list(_eig_pool().map(one, range(batch)))
    elif batch:
        one(0)
    return out


_NP_FUNS = {"exp": np.exp, "sinh": np.sinh, "cosh": np.cosh,
            "identity": lambda x: x}


def _trace_fun_difference_np(d1, d2, fun_name: str, shift: float = 0.0):
    """Pure-numpy twin of :func:`..funm.dense.trace_fun_difference_eigs` —
    the host path must NOT touch jnp: on TPU sessions an eager jnp op on
    straggler-shaped arrays compiles a fresh one-off remote program per
    boundary shape (30s+ each through the compile server)."""
    if fun_name == "exp":
        return np.sum(np.exp(d1 - shift) * -np.expm1(d2 - d1), axis=-1)
    f = _NP_FUNS[fun_name]
    return np.sum(f(d1 - shift) - f(d2 - shift), axis=-1)


def _band_from_blocks(h_np, beta_np, Cm_np, m: int, bs: int):
    """Lower-banded storage of the symmetrized projections, built directly
    from the recurrence blocks (no dense (M×M) buffers).

    The projected matrix at m steps is block tridiagonal
    (``trace_fun_update.m:71-81``): diag blocks alpha_j = h[j][bs:2bs],
    upper coupling blocks h[j][0:bs] (≈ beta_{j-1}ᵀ), lower blocks beta_j.
    After (G+Gᵀ)/2 the lower bandwidth is 2bs−1, so the banded storage is
    (batch, 2bs, M): band[d, col] = G[col+d, col]. Returns (band_tG, band_G)
    where tG adds the symmetrized Cm = R0·B·R0ᵀ top-left coupling
    (``trace_fun_update.m:73-77``); truncations to fewer steps are column
    slices band[:, :, :m'·bs] of the same arrays.
    """
    batch = h_np.shape[1]
    M = m * bs
    alpha = h_np[:m, :, bs:2 * bs, :]                       # (m, batch, bs, bs)
    Dsym = (alpha + alpha.transpose(0, 1, 3, 2)) / 2
    k = Cm_np.shape[-1]
    nb = min(max(2 * bs, k), M)
    band = np.zeros((batch, nb, M), h_np.dtype)
    rl, c = np.tril_indices(bs)
    d_idx = np.broadcast_to(rl - c, (m, len(rl))).ravel()
    col_idx = (np.arange(m)[:, None] * bs + c).ravel()
    band[:, d_idx, col_idx] = np.moveaxis(Dsym[:, :, rl, c], 1, 0).reshape(
        batch, -1
    )
    if m > 1:
        coup_next = h_np[1:m, :, 0:bs, :]                   # h[j+1][0:bs]
        Lsym = (beta_np[:m - 1] + coup_next.transpose(0, 1, 3, 2)) / 2
        rr, cc = np.meshgrid(np.arange(bs), np.arange(bs), indexing="ij")
        rr, cc = rr.ravel(), cc.ravel()
        d2_idx = np.broadcast_to(bs + rr - cc, (m - 1, bs * bs)).ravel()
        col2 = (np.arange(m - 1)[:, None] * bs + cc).ravel()
        band[:, d2_idx, col2] = np.moveaxis(
            Lsym[:, :, rr, cc], 1, 0
        ).reshape(batch, -1)
    band_t = band.copy()
    rl2, c2 = np.tril_indices(k)
    Cs = (Cm_np + Cm_np.transpose(0, 2, 1)) / 2
    band_t[:, rl2 - c2, c2] += Cs[:, rl2, c2]
    return band_t, band


@partial(jax.jit, static_argnames=("num_steps",))
def _lanczos_all(A, U0, num_steps: int):
    """Start + speculative recurrence fused into ONE device program: on
    TPU sessions every dispatch is a tunnel round-trip (~1s), so the
    speculated Krylov budget runs in one dispatch and the host reads the
    per-step coefficient blocks back once. Convergence never feeds back into
    the recurrence (forward blocks are unchanged by extension), so the
    results are bit-identical to round-by-round extension. The returned
    end state resumes the recurrence incrementally (:func:`_lanczos_more`)
    when stragglers outlive the speculation."""
    state0, R0 = lanczos_start(A, U0)
    blocks, state_end = lanczos_continue(A, state0, num_steps)
    return blocks, R0, state0.alive, state_end


@partial(jax.jit, static_argnames=("num_steps",))
def _lanczos_more(A, state, num_steps: int):
    """Incremental extension from a carried state — pays only the missing
    steps (one dispatch per schedule boundary), never a from-scratch
    rerun."""
    return lanczos_continue(A, state, num_steps)


def _trace_update_host_eigh(A, U0, B, fun, tol, schedule, lag,
                            shift: float = 0.0, spec_rounds: int | None = None):
    """Fused-dispatch variant: the device runs the SpMM-heavy recurrence in
    one jitted dispatch; the host does the per-boundary projected
    eigendecompositions and the lag-d convergence bookkeeping
    (``trace_fun_update.m:103-118``) from the transferred blocks.

    ``spec_rounds`` bounds the speculative recurrence budget to the first
    that-many schedule rounds (all platforms speculate phase 1, ~20 steps —
    the observed convergence range is m≈12 across the roster). If
    stragglers outlive the speculation, the carried end state is extended
    INCREMENTALLY by exactly each later round's missing steps
    (:func:`_lanczos_more` — one dispatch per outlived schedule boundary,
    never a from-scratch rerun); the forward blocks don't depend on
    convergence, so the extended run is bit-identical to a longer
    speculation (regression: ``tests/test_trace_update.py::
    test_host_lane_incremental_extension_bit_identical``).
    """
    import os
    import time as _time

    profile = bool(os.environ.get("KRT_PROFILE"))
    batch = U0.shape[0]
    bs = U0.shape[-1]
    dtype = U0.dtype
    total = int(sum(schedule))
    spec = total if spec_rounds is None else int(sum(schedule[:spec_rounds]))

    t0 = _time.perf_counter()
    blocks, R0, alive0, state_end = _lanczos_all(A, U0, num_steps=spec)
    h_np = np.asarray(blocks.h, np.float64)
    beta_np = np.asarray(blocks.beta, np.float64)
    lucky = np.asarray(blocks.lucky_step)
    alive0 = np.asarray(alive0)
    R0_np = np.asarray(R0, np.float64)
    have = spec
    t_device = _time.perf_counter() - t0

    Cm = np.einsum("bkl,blm,bpm->bkp", R0_np, np.asarray(B, np.float64),
                   R0_np)

    delta = np.zeros((batch,), np.float64)
    iters = np.zeros((batch,), np.int32)
    converged = np.zeros((batch,), bool)
    # In f32 the 3-term recurrence loses orthogonality once a Ritz pair
    # converges (classic Lanczos ghosts): the lag error REACHES a floor and
    # then drifts back up, so the last iterate can be worse than an earlier
    # one. Keep the minimum-lag-error iterate per candidate and return it
    # when the tolerance is never met.
    best_err = np.full((batch,), np.inf)
    t0 = _time.perf_counter()
    m_done = 0
    for steps in schedule:
        m_done += int(steps)
        act = np.nonzero(~converged)[0]  # host eigh only for stragglers
        if len(act) == 0:
            break
        if m_done > have:
            # stragglers outlived the speculated budget: extend the carried
            # recurrence by exactly this round's missing steps — pays only
            # the new steps (continuation of the same scan ⇒ bit-identical
            # to a longer speculation)
            t1 = _time.perf_counter()
            blocks2, state_end = _lanczos_more(A, state_end,
                                               num_steps=m_done - have)
            h_np = np.concatenate(
                [h_np, np.asarray(blocks2.h, np.float64)], axis=0)
            beta_np = np.concatenate(
                [beta_np, np.asarray(blocks2.beta, np.float64)], axis=0)
            lucky2 = np.asarray(blocks2.lucky_step)
            # lucky_step is segment-relative: members that survived the
            # first segment (lucky == have-at-that-time sentinel) carry the
            # continuation's offsetted value
            lucky = np.where(lucky < have, lucky, have + lucky2)
            have = m_done
            t_device += _time.perf_counter() - t1
        band_t, band_g = _band_from_blocks(
            h_np[:, act], beta_np[:, act], Cm[act], m_done, bs
        )
        M_lag = (m_done - lag) * bs
        x_lag = _trace_fun_difference_np(
            _eigvals_banded_batch(band_t[:, :, :M_lag]),
            _eigvals_banded_batch(band_g[:, :, :M_lag]),
            fun.name, shift=shift,
        )
        x_now = _trace_fun_difference_np(
            _eigvals_banded_batch(band_t),
            _eigvals_banded_batch(band_g),
            fun.name, shift=shift,
        )
        err = np.abs(x_now - x_lag)
        dead = (~alive0 | (lucky < m_done))[act]
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
    if profile:
        print(f"[trace_update] batch={batch} bs={bs} device+xfer="
              f"{t_device:.3f}s host_eig={_time.perf_counter() - t0:.3f}s "
              f"m_final={m_done}", flush=True)
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
        # executables; on CPU the jitted phase programs compile for minutes
        # (measured 287s vs 10s on Cardiff batch-250) while the fused
        # dispatch + banded host spectra run the same steady-state step.
        # Both platforms therefore default to the host-eigh lane; the
        # in-jit phase path stays available via host_eigh=False.
        host_eigh = n > DENSE_N_CUTOFF

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
        # Speculate only the first phase's rounds (~20 steps — the observed
        # convergence range is m≈12 across the whole roster) and extend to
        # the full budget only when stragglers remain: on TPU this cuts the
        # per-dispatch SpMM work and block transfer ~5x (one extra dispatch
        # + one cached compile in the rare straggler case), on CPU the
        # equivalent host-side win. The forward recurrence is convergence-
        # independent, so results are bit-identical either way.
        spec_rounds = int(phases[0]) if len(phases) else None
        return _trace_update_host_eigh(A, U0, B, fun, tol, schedule, lag,
                                       shift=shift, spec_rounds=spec_rounds)

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


# HBM ceiling for one scoring program, in candidate·row cells: the Lanczos
# carry + SpMM buffers are O(batch·n) f32 arrays (~60 B/cell measured —
# Birmingham full-E batch 20,913 × n 14,592 compiled to an 18.15 GB
# allocation against 15.75 GB HBM). Full-candidate-set scoring
# (krylov_miobi.m:43-52, the reference default) chunks the batch instead.
MAX_SCORE_CELLS = 32_000_000


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
    for the loop at ``krylov_miobi.m:76-125``. Batches whose Krylov state
    would exceed HBM run as fixed-shape candidate chunks (last chunk padded
    with a repeated edge so every chunk reuses one compiled program)."""
    edges = jnp.asarray(edges)
    batch = int(edges.shape[0])
    # candidate-sharded operators (RowShardedMatrix with a 'cands' axis)
    # need the fused SpMM width (batch·bs) divisible by the axis size: pad
    # the batch with a repeated edge and slice the results back
    ba = getattr(A, "batch_axis", None)
    pad_mult = int(A.mesh.shape[ba]) if ba else 1
    if pad_mult > 1 and batch % pad_mult:
        padded = -(-batch // pad_mult) * pad_mult
        e = jnp.concatenate(
            [edges, jnp.tile(edges[:1], (padded - batch, 1))], axis=0)
        r = trace_fun_update_edges(
            A, e, sign, fun=fun, tol=tol, rescale=rescale,
            schedule=schedule, phases=phases, shift=shift)
        return TraceUpdateResult(
            delta=r.delta[:batch], iters=r.iters[:batch],
            converged=r.converged[:batch])
    # chunk width under the cell budget, rounded down to a multiple of 64
    # (but at least 64): no silent floor above the HBM ceiling — at
    # n ≈ 2M a 64-wide chunk is the honest minimum program, and anything
    # wider must fit MAX_SCORE_CELLS.
    chunk = max(64, (int(MAX_SCORE_CELLS) // max(int(A.n), 1)) // 64 * 64)
    if pad_mult > 1:
        chunk = max(pad_mult, chunk - chunk % pad_mult)
    if batch > chunk:
        parts = []
        for s in range(0, batch, chunk):
            e = edges[s:s + chunk]
            keep = int(e.shape[0])
            if keep < chunk:
                e = jnp.concatenate(
                    [e, jnp.tile(e[:1], (chunk - keep, 1))], axis=0)
            r = trace_fun_update_edges(
                A, e, sign, fun=fun, tol=tol, rescale=rescale,
                schedule=schedule, phases=phases, shift=shift)
            parts.append((r, keep))
        return TraceUpdateResult(
            delta=jnp.concatenate([r.delta[:k] for r, k in parts]),
            iters=jnp.concatenate([r.iters[:k] for r, k in parts]),
            converged=jnp.concatenate([r.converged[:k] for r, k in parts]),
        )
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
