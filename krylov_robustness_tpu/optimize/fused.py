"""Fused multi-step greedy: R budget steps per device dispatch.

The per-step greedy loop (``_greedy_loop``) pays one host↔device round trip
per budget step — score, transfer blocks, host argmin, commit — which on a
tunnel-attached TPU costs ~0.4 s of latency against ~0.1 s of irreducible
work (results/NOTES_greedy_step_profile.md). The reference's own hot loop is
trivially fusable: ``krylov_miobi.m:112-137`` does arg-best then applies the
edit, and the frozen-structure operators make the edit a pure device value
scatter. This module collapses R consecutive budget steps into ONE jitted
``lax.scan``:

    per step:  score all candidates (block Lanczos + batched eigh)
               → in-window mask (first Q alive, ``greedy_krylov.m:64-93``)
               → arg-best → value-scatter commit → alive-mask update

Convergence semantics match the host-eigh lane (`_trace_update_host_eigh`)
bookkeeping exactly: lag-d error at round boundaries, dtype-aware tolerance
floor, best-iterate acceptance, lucky-breakdown dead flag — but the rounds
are UNIFORM (``round_len`` steps each, up to ``rounds``) so a
``lax.while_loop`` can exit early once every candidate converged. Projected
matrices are assembled at a fixed padded size; the pad appends identical
decoupled zero eigenvalues to both tGm and Gm whose f-contributions cancel
exactly in the trace difference (same argument as
``updates/trace_update.py`` zero-padding note).

A step whose scored in-window candidates did NOT all converge within the
fused budget reports ok=False; the host driver truncates the block there and
replays that one step through the accurate per-step path (full 100-step
straggler extension), so fused sweeps never lose the reference's
convergence guarantees.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..funm.dense import trace_fun_difference_eigs
from ..funm.scalar import get_fun
from ..krylov.lanczos import (
    LanczosBlocks,
    assemble_tridiag,
    lanczos_continue,
    lanczos_start,
)
from ..updates.trace_update import edge_B, edge_start_blocks

FUSED_ROUND_LEN = 6  # uniform round size (lag boundaries every 6 steps)
FUSED_ROUNDS = 5  # speculative fused budget = 30 steps (observed conv m≈12)


def coo_rebuild(op, vals):
    """Frozen-structure COO / row-sharded operator with replaced values."""
    return dataclasses.replace(op, vals=vals)


def bsr_rebuild(op, flat_vals):
    """SuperBsrOperator with replaced tile storage (flat view)."""
    children, aux = op.tree_flatten()
    atiles = flat_vals.reshape(op.atiles.shape)
    return type(op).tree_unflatten(aux, (atiles, children[1]))


def sharded_bsr_rebuild(op, flat_vals):
    """BsrRowShardedMatrix with replaced tile storage (flat view)."""
    return dataclasses.replace(
        op, atiles=flat_vals.reshape(op.atiles.shape))


# f32 eigenvalue-noise floor: spectra of the projected matrices carry
# per-eigenvalue error δd ≈ c·eps·‖G‖ whichever solver computes them
# (Sturm bisection or eigh), so the lag difference of two
# independently-computed trace values cannot resolve below
# ~c·eps·‖G‖·Σ|f'(d−σ)| ≈ C·eps·gnorm·fscale. Calibrated on ca-AstroPh
# (scripts/probe_fused_floor.py): |fused−hostlane| p95 = 6.5e-5 at
# gnorm ≈ 94, fscale ≈ 1 → C = 6 gives 6.8e-5. The gnorm factor matters:
# on unshifted road networks (gnorm ≈ 4, fscale ≈ 100) a gnorm-free
# floor was 20× too loose and flipped near-tie picks mid-sweep. The f64
# lane needs no floor (its spectra noise sits below any practical tol).
F32_FLOOR_REL = 6.0


def _score_all(A, state0, Cm, tol, shift, *, rounds: int, round_len: int,
               lag: int, bs: int, fun_name: str):
    """Score every candidate on device with early-exit over uniform rounds.

    Mirrors the host-lane bookkeeping of
    ``trace_update._trace_update_host_eigh`` (lag test, dtype floor,
    best-iterate, dead flag); returns (delta, iters, converged).

    Spectra: one batched solve per round over the STACKED
    [tG_now, G_now, tG_lag, G_lag] matrices — Sturm banded bisection
    (:func:`..ops.banded_eig.eigvalsh_banded`) in f32 (XLA's dense TPU
    eigh was ~90% of the scoring step), LAPACK-backed eigh in f64."""
    batch = Cm.shape[0]
    dtype = Cm.dtype
    S = rounds * round_len
    k = Cm.shape[-1]
    Cs = (Cm + jnp.swapaxes(Cm, -1, -2)) / 2
    eps_m = jnp.finfo(dtype).eps
    use_sturm = dtype == jnp.float32
    step_iota = jnp.arange(S)

    def G_at(Hbuf, Bbuf, m_used):
        # fixed-size assembly: blocks at steps >= m_used masked to zero, so
        # the projection is G_{m_used} ⊕ 0-pad (beta of the last kept step
        # is excluded — it would couple the real block into the pad)
        h_eff = jnp.where((step_iota < m_used)[:, None, None, None], Hbuf, 0)
        b_eff = jnp.where((step_iota < m_used - 1)[:, None, None, None],
                          Bbuf, 0)
        blocks = LanczosBlocks(
            h=h_eff, beta=b_eff,
            lucky_step=jnp.zeros((batch,), jnp.int32),
        )
        G = assemble_tridiag(blocks, bs=bs, m=S)
        G = (G + jnp.swapaxes(G, -1, -2)) / 2  # trace_fun_update.m:78-81
        return G

    def cond(c):
        r_idx = c[0]
        conv = c[6]
        return jnp.logical_and(r_idx < rounds,
                               jnp.logical_not(jnp.all(conv)))

    def body(c):
        r_idx, state, Hbuf, Bbuf, delta, iters, conv, best_err = c
        blocks, state = lanczos_continue(A, state, round_len)
        zero = jnp.asarray(0, r_idx.dtype)
        Hbuf = jax.lax.dynamic_update_slice(
            Hbuf, blocks.h, (r_idx * round_len, zero, zero, zero))
        Bbuf = jax.lax.dynamic_update_slice(
            Bbuf, blocks.beta, (r_idx * round_len, zero, zero, zero))
        m_done = (r_idx + 1) * round_len
        G_now = G_at(Hbuf, Bbuf, m_done)
        G_lag = G_at(Hbuf, Bbuf, m_done - lag)
        tG_now = G_now.at[:, :k, :k].add(Cs)
        tG_lag = G_lag.at[:, :k, :k].add(Cs)
        stacked = jnp.concatenate([tG_now, G_now, tG_lag, G_lag], axis=0)
        if use_sturm:
            from ..ops.banded_eig import eigvalsh_banded

            d = eigvalsh_banded(stacked, w=2 * bs - 1)
        else:
            d = jnp.linalg.eigvalsh(stacked)
        d1n, d2n = d[:batch], d[batch:2 * batch]
        d1l, d2l = d[2 * batch:3 * batch], d[3 * batch:]
        x_now = trace_fun_difference_eigs(d1n, d2n, fun_name, shift=shift)
        x_lag = trace_fun_difference_eigs(d1l, d2l, fun_name, shift=shift)
        err = jnp.abs(x_now - x_lag)
        dead = jnp.logical_not(state.alive)
        tol_eff = jnp.maximum(tol, 32.0 * eps_m * jnp.abs(x_now))
        if use_sturm:  # == f32: the noise floor and Sturm are both f32-tied
            fun = get_fun(fun_name)
            fscale = jnp.sum(jnp.abs(fun(d1n - shift)), axis=-1)
            gnorm = jnp.max(jnp.abs(d1n), axis=-1)
            tol_eff = jnp.maximum(
                tol_eff, F32_FLOOR_REL * eps_m * gnorm * fscale)
        act = jnp.logical_not(conv)
        newly = jnp.logical_and(act, jnp.logical_or(err < tol_eff, dead))
        upd = jnp.logical_and(act, jnp.logical_or(err <= best_err, newly))
        delta = jnp.where(upd, x_now, delta)
        iters = jnp.where(upd, m_done, iters)
        best_err = jnp.where(act, jnp.minimum(best_err, err), best_err)
        conv = jnp.logical_or(conv, newly)
        return (r_idx + 1, state, Hbuf, Bbuf, delta, iters, conv, best_err)

    init = (
        jnp.asarray(0, jnp.int32),
        state0,
        jnp.zeros((S, batch, 2 * bs, bs), dtype),
        jnp.zeros((S, batch, bs, bs), dtype),
        jnp.zeros((batch,), dtype),
        jnp.zeros((batch,), jnp.int32),
        jnp.zeros((batch,), bool),
        jnp.full((batch,), jnp.inf, dtype),
    )
    out = jax.lax.while_loop(cond, body, init)
    return out[4], out[5], out[6]


@partial(jax.jit, static_argnames=(
    "rebuild", "Q", "R", "mode", "fun_name", "rounds", "round_len", "lag"))
def fused_greedy_block(op, vals, edges, slots, alive, commit_value, tol,
                       shift, sign, rescale, *, rebuild, Q: int, R: int,
                       mode: str, fun_name: str,
                       rounds: int = FUSED_ROUNDS,
                       round_len: int = FUSED_ROUND_LEN, lag: int = 2):
    """R budget steps in one dispatch over a fixed candidate table.

    edges: (nC, 2) candidate table (backend node space); slots: (nC, 2)
    flat positions of each edge's two value slots in ``vals`` (self-loops
    repeat one slot); alive: (nC,) bool. The in-window mask reproduces the
    sliding top-Q window of ``greedy_krylov.m:64-93``: a candidate is
    scoreable at a step iff it is alive and fewer than Q alive candidates
    precede it. Returns (vals, alive, per-step (winner, delta, iters, ok,
    nonfinite_count)).
    """
    n = op.n
    dtype = vals.dtype if vals.dtype in (jnp.float32, jnp.float64) \
        else jnp.float32
    U0 = edge_start_blocks(n, edges, dtype)
    B = edge_B(edges, sign, rescale, dtype)
    state0, R0 = lanczos_start(None, U0)  # A unused by the start block QR
    Cm = jnp.einsum("bkl,blm,bpm->bkp", R0, B, R0)
    bs = U0.shape[-1]

    def body(carry, _):
        vals, alive = carry
        A = rebuild(op, vals)
        delta, iters, conv = _score_all(
            A, state0, Cm, tol, shift, rounds=rounds, round_len=round_len,
            lag=lag, bs=bs, fun_name=fun_name)
        cums = jnp.cumsum(alive.astype(jnp.int32))
        in_win = jnp.logical_and(alive, cums <= Q)
        finite = jnp.isfinite(delta)
        key = delta if mode == "break" else -delta
        key = jnp.where(jnp.logical_and(in_win, finite), key, jnp.inf)
        h = jnp.argmin(key)
        ok = jnp.all(jnp.logical_or(jnp.logical_not(in_win), conv))
        nonfin = jnp.sum(jnp.logical_and(in_win, jnp.logical_not(finite)))
        vals = vals.at[slots[h]].set(
            jnp.asarray(commit_value, vals.dtype))
        alive = alive.at[h].set(False)
        return (vals, alive), (h, delta[h], iters[h], ok, nonfin)

    (vals, alive), outs = jax.lax.scan(body, (vals, alive), None, length=R)
    return vals, alive, outs
