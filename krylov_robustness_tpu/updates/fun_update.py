"""Low-rank factors of f(A + U·B·Uᵀ) − f(A) ≈ Um·Xm·Umᵀ.

TPU-native counterpart of the reference's ``fun_update``
(``functions/fun_update.m``): block Arnoldi with stored basis (the basis is
needed for gradient assembly in the continuous path,
``fun_and_grad_krylov_exp.m:83-88``), core factor Xm = f(Gm+Cm) − f(Gm)
evaluated by batched eigh on device, lag-2 Frobenius stopping
(``fun_update.m:62-64,108-126``) via checkpoint rounds, and the dense
fallback when the Krylov space would saturate half the dimension
(``fun_update.m:85-90``).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..funm.dense import fun_sym
from ..funm.scalar import get_fun
from ..krylov.arnoldi import (
    arnoldi_continue,
    arnoldi_start,
    assemble_hessenberg,
)

DEFAULT_SCHEDULE = (6, 6, 8, 12, 20, 28, 20)


@dataclasses.dataclass
class FunUpdateResult:
    """Low-rank (or dense-fallback) representation of f(A+UBUᵀ) − f(A)."""

    Xm: jax.Array  # (batch, M, M) core factor (dense: (batch, n, n))
    Um: jax.Array  # (batch, n, M) basis (dense: identity semantics, None)
    converged: jax.Array  # (batch,)
    iters: int
    is_dense: bool

    def trace(self) -> jax.Array:
        return jnp.trace(self.Xm, axis1=-2, axis2=-1)

    def entries(self, rows, cols) -> jax.Array:
        """delta f(A)_{rows[h], cols[h]} = (Um Xm Umᵀ)[rows[h], cols[h]]
        batched over the trailing entry list (``fun_and_grad_krylov_exp.m:85-87``)."""
        rows = jnp.asarray(rows)
        cols = jnp.asarray(cols)
        if self.is_dense:
            return self.Xm[:, rows, cols]
        L = self.Um[:, rows, :]  # (batch, e, M)
        R = self.Um[:, cols, :]
        return jnp.einsum("bem,bmp,bep->be", L, self.Xm, R)


def fun_update(
    A,
    U0: jax.Array,
    B: jax.Array,
    fun="exp",
    tol: float = 1e-12,
    schedule: Sequence[int] = DEFAULT_SCHEDULE,
    lag: int = 2,
    dense_cutoff: int = 130,
    A_dense: jax.Array | None = None,
) -> FunUpdateResult:
    """U0: (batch, n, bs); B: (batch, bs, bs) symmetric.

    Saturation rule: the Krylov dimension never exceeds n/2; if the schedule
    cannot fit a single round under that cap (or n ≤ dense_cutoff), the exact
    dense difference is computed instead (``fun_update.m:85-90``).
    """
    fun = get_fun(fun)
    batch, n, bs = U0.shape

    # --- dense fallback ---------------------------------------------------
    max_steps_cap = max(int(n // (2 * bs)) - 1, 0)
    if n <= dense_cutoff or max_steps_cap < schedule[0]:
        Ad = A.todense() if A_dense is None else A_dense
        At = Ad[None] + jnp.einsum("bnk,bkl,bml->bnm", U0, B, U0)
        X = fun_sym(At, fun) - fun_sym(Ad, fun)[None]
        return FunUpdateResult(
            Xm=X,
            Um=jnp.broadcast_to(jnp.eye(n, dtype=U0.dtype), (batch, n, n)),
            converged=jnp.ones((batch,), bool),
            iters=0,
            is_dense=True,
        )

    # trim schedule to the saturation cap
    sched = []
    total = 0
    for s in schedule:
        if total + s > max_steps_cap:
            break
        sched.append(s)
        total += s
    if not sched:
        sched = [max_steps_cap]
        total = max_steps_cap

    state, R0 = arnoldi_start(A, U0, max_steps=total)
    Cm_small = jnp.einsum("bkl,blm,bpm->bkp", R0, B, R0)

    h_all, beta_all = [], []
    m_done = 0
    prev_X = None
    converged = jnp.zeros((batch,), bool)
    for round_steps in sched:
        blocks, state = arnoldi_continue(A, state, round_steps, bs)
        h_all.append(blocks.h)
        beta_all.append(blocks.beta)
        m_done += round_steps
        from ..krylov.arnoldi import ArnoldiBlocks

        all_blocks = ArnoldiBlocks(
            h=jnp.concatenate(h_all, axis=0),
            beta=jnp.concatenate(beta_all, axis=0),
        )
        X_now = _core_factor(all_blocks, Cm_small, bs, m_done, fun.name)
        X_lag = _core_factor(all_blocks, Cm_small, bs, m_done - lag, fun.name)
        # lag comparison zero-pads the smaller iterate (fun_update.m:110-112)
        M_now = X_now.shape[-1]
        X_lag_pad = jnp.zeros_like(X_now).at[:, : X_lag.shape[-1], : X_lag.shape[-1]].set(X_lag)
        err = jnp.linalg.norm(X_now - X_lag_pad, axis=(-2, -1))
        converged = jnp.logical_or(converged, err < tol)
        converged = jnp.logical_or(converged, jnp.logical_not(state.alive))
        if bool(jnp.all(converged)):
            break

    Um = state.V[:, :, : m_done * bs]
    return FunUpdateResult(
        Xm=X_now, Um=Um, converged=converged, iters=m_done, is_dense=False
    )


def _core_factor(blocks, Cm_small, bs: int, m: int, fun_name: str):
    """Xm = f(Gm + Cm) − f(Gm) on the m-step projection (batched eigh)."""
    G = assemble_hessenberg(blocks, bs, m)
    G = (G + jnp.swapaxes(G, -1, -2)) / 2  # fun_update.m:94
    k = Cm_small.shape[-1]
    Csym = (Cm_small + jnp.swapaxes(Cm_small, -1, -2)) / 2
    tG = G.at[:, :k, :k].add(Csym)
    return fun_sym(tG, fun_name) - fun_sym(G, fun_name)
