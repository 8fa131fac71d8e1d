"""Batched eigenvalues of small symmetric BANDED matrices via Sturm-count
bisection — the TPU-native replacement for ``jnp.linalg.eigvalsh`` on the
fused greedy scorer's projected matrices.

Why not eigh: the projections are block-tridiagonal with bandwidth
2·bs−1 = 3 (``trace_fun_update.m:71-81``; the rank-2 coupling Cm is 2×2 —
inside the band), yet XLA's TPU eigh runs a dense QDWH-style
decomposition: measured 47-63 ms per (260, 40-60, 40-60) f32 batch, which
made eigenvalues ~90% of the fused scoring step
(scripts/probe_fused_floor.py). Bisection with banded LDLᵀ inertia counts
is embarrassingly parallel across (matrix, eigenvalue-index) lanes and
compiles to a small ``fori(scan)`` program: every lane holds its own
bisection interval, and one LDL sweep per iteration counts the
eigenvalues below each lane's midpoint simultaneously.

Algorithm per count: Schur-complement sweep down the band — carry the
active (w+1)×(w+1) window, count negative pivots (Sylvester inertia),
LAPACK ``dlaebz``-style pivmin clamp for near-zero pivots. Eigenvalue
error ≈ gerschgorin_range·2^−iters + O(eps·‖G‖) — matched to the f32
noise floor the caller already accounts for.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("w", "iters"))
def eigvalsh_banded(G: jax.Array, w: int = 3, iters: int | None = None
                    ) -> jax.Array:
    """Ascending eigenvalues of symmetric banded matrices.

    G: (batch, M, M), symmetric, (lower) bandwidth ``w`` — entries with
    |i−j| > w are IGNORED (assumed zero). Returns (batch, M).
    """
    batch, M, _ = G.shape
    dtype = G.dtype
    if iters is None:
        iters = 34 if dtype == jnp.float32 else 62

    diag = jnp.diagonal(G, axis1=-2, axis2=-1)  # (batch, M)
    # banded view: band[b, d, i] = G[i+d, i], d = 0..w (zero-padded tail)
    band = jnp.stack(
        [jnp.pad(jnp.diagonal(G, offset=-d, axis1=-2, axis2=-1),
                 ((0, 0), (0, d))) for d in range(w + 1)], axis=1)

    # Gerschgorin bounds from the banded entries only
    radius = jnp.zeros_like(diag)
    for d in range(1, w + 1):
        off = jnp.abs(band[:, d, :])  # |G[i+d, i]| attributed to rows i, i+d
        radius = radius + jnp.pad(off[:, : M - d], ((0, 0), (0, d)))
        radius = radius + jnp.pad(off[:, : M - d], ((0, 0), (d, 0)))
    lo0 = jnp.min(diag - radius, axis=-1)  # (batch,)
    hi0 = jnp.max(diag + radius, axis=-1)
    scale = jnp.maximum(jnp.maximum(jnp.abs(lo0), jnp.abs(hi0)),
                        jnp.asarray(1.0, dtype))
    # Pivot clamp at eps·scale — deliberately LARGER than LAPACK's
    # safmin-style pivmin. With bandwidth > 1 the elimination is a Schur
    # sweep, and a safmin clamp lets one near-singular pivot inject
    # v²/pivmin ~ 1e36 into the window; the NEXT near-singular pivot then
    # overflows v² to inf and the NaNs silently undercount every later
    # sign change (observed: interior negative eigenvalues reported as 0
    # on dead-candidate projections with large zero clusters). Clamping at
    # eps·scale — the eigenvalue resolution floor — bounds the cascade at
    # scale/eps per level, and the window saturation below caps the rest;
    # counts are only perturbed within O(eps·‖T‖) of a submatrix
    # singularity, which is below the bisection's accuracy anyway.
    eps = jnp.asarray(np.finfo(np.dtype(dtype)).eps, dtype)
    pivmin = eps * scale
    sat = scale / eps  # window saturation bound
    big = 4.0 * scale  # sentinel diagonal for past-the-end window slots

    # appended column per sweep step j (window moves to cover c = j+w+1):
    # cols_app[b, j, k] = G[c−w+k, c] for k = 0..w (k = w is the diagonal);
    # steps with c ≥ M append a decoupled +big slot (positive pivot, zero
    # coupling) so the window stays full-size without affecting the count.
    j_idx = np.arange(M)
    c_idx = j_idx + w + 1
    k_idx = np.arange(w + 1)
    d_sel = (w - k_idx)[None, :]  # band diagonal for entry (c−w+k, c)
    i_sel = np.clip(c_idx[:, None] - w + k_idx[None, :], 0, M - 1)
    valid = c_idx < M
    cols_app = band[:, d_sel, i_sel]  # (batch, M, w+1)
    app_mask = jnp.asarray(valid[:, None] & np.ones((1, w + 1), bool))
    cols_app = jnp.where(app_mask, cols_app, 0.0)
    diag_app = jnp.where(jnp.asarray(valid), cols_app[:, :, w],
                         big[:, None])  # (batch, M)
    is_real = jnp.asarray(valid)  # (M,)

    W1 = w + 1
    eyeW = jnp.eye(W1, dtype=dtype)
    # initial window: G[0:w+1, 0:w+1] (banded entries), built via band
    S0_full = jnp.zeros((batch, W1, W1), dtype)
    for d in range(0, w + 1):
        for i in range(0, W1 - d):
            S0_full = S0_full.at[:, i + d, i].set(band[:, d, i])
            if d:
                S0_full = S0_full.at[:, i, i + d].set(band[:, d, i])

    def count_below(x):
        """#{λ < x} per lane; x: (batch, L)."""
        L = x.shape[1]
        S = (S0_full[:, None, :, :]
             - x[:, :, None, None] * eyeW[None, None])  # (batch, L, W1, W1)

        def step(carry, inputs):
            S, cnt = carry
            a_off, a_diag, real = inputs  # (batch, w+1), (batch,), scalar
            p = S[..., 0, 0]
            p = jnp.where(jnp.abs(p) < pivmin[:, None],
                          -pivmin[:, None], p)
            cnt = cnt + (p < 0)
            v = S[..., 1:, 0]  # (batch, L, w)
            S2 = (S[..., 1:, 1:]
                  - v[..., :, None] * v[..., None, :] / p[..., None, None])
            # saturate the window: keeps consecutive clamped pivots finite
            lim = sat[:, None, None, None]
            S2 = jnp.clip(S2, -lim, lim)
            col = jnp.broadcast_to(a_off[:, None, :w], v.shape)
            d_new = jnp.where(real, a_diag[:, None] - x, a_diag[:, None])
            S = jnp.concatenate([
                jnp.concatenate([S2, col[..., :, None]], axis=-1),
                jnp.concatenate(
                    [col[..., None, :], d_new[..., None, None]], axis=-1),
            ], axis=-2)
            return (S, cnt), None

        cnt0 = jnp.zeros(x.shape, jnp.int32)
        (S, cnt), _ = jax.lax.scan(
            step, (S, cnt0),
            (jnp.moveaxis(cols_app, 1, 0), diag_app.T, is_real))
        return cnt

    # one bisection lane per eigenvalue index
    tgt = jnp.arange(M, dtype=jnp.int32)[None, :]  # λ_i ⇔ count ≥ i+1
    lo = jnp.broadcast_to(lo0[:, None], (batch, M))
    hi = jnp.broadcast_to(hi0[:, None], (batch, M))

    def bis(_, lohilo):
        lo, hi = lohilo
        mid = (lo + hi) / 2
        c = count_below(mid)
        go_left = c >= tgt + 1
        return jnp.where(go_left, lo, mid), jnp.where(go_left, mid, hi)

    lo, hi = jax.lax.fori_loop(0, iters, bis, (lo, hi))
    return (lo + hi) / 2
