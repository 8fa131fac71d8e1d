"""Selected entries of f(A) via per-row Krylov spaces.

TPU-native counterpart of ``functions/function_multiple_entries.m``: one
Arnoldi space per *unique row index* of the requested (i, j) pairs, seeded
with e_i (``function_multiple_entries.m:84-110``), f applied to the projected
matrix, entry extracted from the basis row. The reference's per-entry
active-set convergence (lag d=3, ``function_multiple_entries.m:121-151``)
becomes a checkpoint-round loop over the whole batch; rounds stop when every
entry's first-column lag difference is below tol.

All unique seeds advance together — a single batched Arnoldi whose SpMM width
is the number of unique rows.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..funm.dense import fun_sym
from ..funm.scalar import get_fun
from ..krylov.arnoldi import arnoldi_continue, arnoldi_start, assemble_hessenberg

DEFAULT_SCHEDULE = (6, 6, 8, 12, 20, 28, 20)


def seed_blocks(n: int, nodes: np.ndarray, dtype) -> jax.Array:
    u = len(nodes)
    U = jnp.zeros((u, n, 1), dtype)
    U = U.at[jnp.arange(u), jnp.asarray(nodes), 0].set(1.0)
    return U


def function_multiple_entries(
    A,
    omega: np.ndarray,
    fun="exp",
    tol: float = 1e-12,
    schedule: Sequence[int] = DEFAULT_SCHEDULE,
    lag: int = 3,
):
    """f(A)_{i,j} for each (i, j) in omega. Returns (values, iters).

    Entry formula (``function_multiple_entries.m:162-165``):
    X(h) = Um_{row(i)}[j, :m] · f(Gm)[:, 0] · (first-seed sign); with CholQR
    the first basis vector is exactly +e_i, so the sign is 1.
    """
    fun = get_fun(fun)
    omega = np.asarray(omega, dtype=np.int64)
    rows_u, row_of = np.unique(omega[:, 0], return_inverse=True)
    n = A.n
    U0 = seed_blocks(n, rows_u, A.dtype)
    total = sum(schedule)
    max_cap = max(int(n // 2) - 1, 1)
    sched = _trim(schedule, max_cap)
    total = sum(sched)

    state, _ = arnoldi_start(A, U0, max_steps=total)
    h_all, beta_all = [], []
    m_done = 0
    prev_cols = {}
    done_all = False
    for round_steps in sched:
        blocks, state = arnoldi_continue(A, state, round_steps, 1)
        h_all.append(blocks.h)
        beta_all.append(blocks.beta)
        m_done += round_steps
        from ..krylov.arnoldi import ArnoldiBlocks

        ab = ArnoldiBlocks(
            h=jnp.concatenate(h_all, axis=0),
            beta=jnp.concatenate(beta_all, axis=0),
        )
        col_now = _first_column(ab, m_done, fun.name)  # (u, m)
        col_lag = _first_column(ab, m_done - lag, fun.name)
        err = jnp.linalg.norm(
            col_now - jnp.zeros_like(col_now).at[:, : col_lag.shape[1]].set(col_lag),
            axis=1,
        )
        if bool(jnp.all(jnp.logical_or(err < tol, jnp.logical_not(state.alive)))):
            done_all = True
            break

    # extract entries: value = V_basis[row(i)][j, :m] @ f(Gm)[:, 0]
    col = _first_column(
        ArnoldiBlocks(
            h=jnp.concatenate(h_all, axis=0),
            beta=jnp.concatenate(beta_all, axis=0),
        ),
        m_done,
        fun.name,
    )  # (u, m)
    V = state.V[:, :, :m_done]  # (u, n, m)
    vals = jnp.einsum(
        "em,em->e",
        V[jnp.asarray(row_of), jnp.asarray(omega[:, 1]), :],
        col[jnp.asarray(row_of)],
    )
    return vals, m_done


def entries_of_f_expmv(A, omega: np.ndarray, fun="exp", m_probe_cols=None):
    """f(A)_{i,j} for the exp family via batched ``expmv`` actions.

    TPU-preferred alternative to the per-row Arnoldi evaluator when
    f ∈ {exp, sinh, cosh}: f(A)·E for one-hot columns E over the unique
    column indices is ONE fused Taylor scan (two for sinh/cosh via
    (exp(A) ∓ exp(−A))/2), a single compile of the SpMM chain — where the
    stored-basis Arnoldi path compiles a large program per extension round
    (prohibitive through shard_map / the remote compile server). Exact up to
    the expmv truncation tolerance.

    Returns (values, 0) matching the ``function_multiple_entries`` tuple.
    """
    from ..funm.expmv import expmv, select_taylor_degree

    fun = get_fun(fun)
    if fun.name not in ("exp", "sinh", "cosh"):
        raise ValueError("entries_of_f_expmv supports exp/sinh/cosh only")
    omega = np.asarray(omega, dtype=np.int64)
    cols_u, col_of = np.unique(omega[:, 1], return_inverse=True)
    n = A.n
    E = jnp.zeros((n, len(cols_u)), A.dtype)
    E = E.at[jnp.asarray(cols_u), jnp.arange(len(cols_u))].set(1.0)
    plan = select_taylor_degree(A, t=1.0, b_cols=len(cols_u))
    Yp = expmv(A, E, t=1.0, plan=plan)
    if fun.name == "exp":
        Y = Yp
    else:
        plan_m = select_taylor_degree(A, t=-1.0, b_cols=len(cols_u))
        Ym = expmv(A, E, t=-1.0, plan=plan_m)
        Y = (Yp - Ym) / 2 if fun.name == "sinh" else (Yp + Ym) / 2
    vals = Y[jnp.asarray(omega[:, 0]), jnp.asarray(col_of)]
    return vals, 0


def _trim(schedule, cap):
    out, tot = [], 0
    for s in schedule:
        if tot + s > cap:
            break
        out.append(s)
        tot += s
    return out or [cap]


def _first_column(blocks, m: int, fun_name: str):
    G = assemble_hessenberg(blocks, 1, m)
    G = (G + jnp.swapaxes(G, -1, -2)) / 2
    F = fun_sym(G, fun_name)
    return F[:, :, 0]
