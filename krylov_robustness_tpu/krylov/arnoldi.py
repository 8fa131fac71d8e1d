"""Batched block Arnoldi with stored basis and full reorthogonalization.

TPU-native re-design of the reference's polynomial Arnoldi
(``functions/arnoldi_krylov.m``, internally ``poly_krylov``): the same
incremental block recurrence as Lanczos but orthogonalizing against the
*entire* basis (double MGS + one post-QR reorthogonalization pass,
``arnoldi_krylov.m:89-110``) and keeping V.

Static-shape design: the basis lives in a pre-allocated (batch, n, max_cols)
buffer whose unfilled columns are exactly zero — zero columns contribute
nothing to projections, so no masks are needed in the MGS. The scan step
writes block j+1 with a dynamic slice. For symmetric A the projected matrix
is numerically tridiagonal; full reorthogonalization is what buys the
reference its accuracy for the gradient/Fréchet paths, and we keep it.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

LUCKY_TOL = 1e-12  # reference arnoldi_krylov.m:79


class ArnoldiState(NamedTuple):
    V: jax.Array  # (batch, n, max_cols) basis; zero beyond filled blocks
    step: jax.Array  # scalar int32: number of completed steps
    alive: jax.Array  # (batch,) bool


class ArnoldiBlocks(NamedTuple):
    h: jax.Array  # (steps, batch, max_cols, bs) full coupling columns
    beta: jax.Array  # (steps, batch, bs, bs)


def _chol_qr(w, eps):
    """Batch-major (batch, n, bs) adapter over the n-major Lanczos CholQR
    (the Arnoldi layer keeps the stored-basis batch-major layout)."""
    from .lanczos import _chol_qr as impl

    Q, R, ok = impl(jnp.transpose(w, (1, 0, 2)), eps)
    return jnp.transpose(Q, (1, 0, 2)), R, ok


def arnoldi_start(A, B0: jax.Array, max_steps: int,
                  lucky_tol: float = LUCKY_TOL):
    """Orthonormalize B0 into block 0 of the padded basis.

    Returns (state, R0) with B0 = V₀·R0.
    """
    batch, n, bs = B0.shape
    Q, R, ok = _chol_qr(B0, lucky_tol)
    V = jnp.zeros((batch, n, (max_steps + 1) * bs), B0.dtype)
    V = jax.lax.dynamic_update_slice(V, Q, (0, 0, 0))
    return ArnoldiState(V=V, step=jnp.asarray(0, jnp.int32), alive=ok), R


def arnoldi_step(A, state: ArnoldiState, bs: int,
                 lucky_tol: float = LUCKY_TOL):
    """One Arnoldi block step (``arnoldi_krylov.m:78-111``)."""
    from .lanczos import _batched_spmm

    V, step, alive = state
    batch, n, max_cols = V.shape
    zero = jnp.asarray(0, step.dtype)
    v_last = jax.lax.dynamic_slice(
        V, (zero, zero, step * bs), (batch, n, bs)
    )
    w = _batched_spmm(A, v_last)

    def mgs(w):
        h = jnp.einsum("bnc,bnk->bck", V, w)
        w = w - jnp.einsum("bnc,bck->bnk", V, h)
        return w, h

    w, h1 = mgs(w)
    w, h2 = mgs(w)
    h = h1 + h2
    Q, R, ok = _chol_qr(w, lucky_tol)
    # post-QR reorthogonalization pass (arnoldi_krylov.m:104-107)
    hh = jnp.einsum("bnc,bnk->bck", V, Q)
    Q = Q - jnp.einsum("bnc,bck->bnk", V, hh)
    h = h + jnp.einsum("bck,bkl->bcl", hh, R)

    alive_next = jnp.logical_and(alive, ok)
    msk = alive[:, None, None]
    h = jnp.where(msk, h, jnp.zeros_like(h))
    beta = jnp.where(alive_next[:, None, None], R, jnp.zeros_like(R))
    Q = jnp.where(alive_next[:, None, None], Q, jnp.zeros_like(Q))
    V = jax.lax.dynamic_update_slice(V, Q, (zero, zero, (step + 1) * bs))
    return ArnoldiState(V=V, step=step + 1, alive=alive_next), h, beta


def arnoldi_continue(A, state: ArnoldiState, num_steps: int, bs: int,
                     lucky_tol: float = LUCKY_TOL):
    def body(state, _):
        state, h, beta = arnoldi_step(A, state, bs, lucky_tol)
        return state, (h, beta)

    state, (h, beta) = jax.lax.scan(body, state, None, length=num_steps)
    return ArnoldiBlocks(h=h, beta=beta), state


def arnoldi_run(A, B0: jax.Array, num_steps: int, max_steps: int | None = None,
                lucky_tol: float = LUCKY_TOL):
    max_steps = num_steps if max_steps is None else max_steps
    state, R0 = arnoldi_start(A, B0, max_steps, lucky_tol)
    blocks, state = arnoldi_continue(A, state, num_steps, B0.shape[-1], lucky_tol)
    return blocks, R0, state


def assemble_hessenberg(blocks: ArnoldiBlocks, bs: int, m: int):
    """Square projection Gm = H[: m·bs, : m·bs] (batch, m·bs, m·bs): coupling
    columns h (already full-height — a pure transpose/reshape) plus the
    subdiagonal beta blocks via one precomputed-index scatter."""
    import numpy as np

    h, beta = blocks.h, blocks.beta
    batch = h.shape[1]
    M = m * bs
    # h[:m][:, :, :M, :]: (m, batch, M, bs) → (batch, M, m, bs) → (batch, M, M)
    G = jnp.moveaxis(h[:m][:, :, :M, :], 1, 0)
    G = jnp.transpose(G, (0, 2, 1, 3)).reshape(batch, M, m * bs)
    if m > 1:
        j = np.arange(m - 1)[:, None, None]
        r = np.arange(bs)[None, :, None]
        c = np.arange(bs)[None, None, :]
        ridx = np.broadcast_to((j + 1) * bs + r, (m - 1, bs, bs))
        cidx = np.broadcast_to(j * bs + c, (m - 1, bs, bs))
        G = G.at[:, jnp.asarray(ridx), jnp.asarray(cidx)].set(
            jnp.moveaxis(beta[: m - 1], 1, 0)
        )
    return G
