"""Dense matrix-function kernels for small (projected) matrices.

All projected Krylov matrices in this framework are tiny (m ≲ 200), symmetric
or block-triangular of symmetric blocks, and evaluated in large batches —
exactly the regime where device-side ``eigh`` + elementwise f is the right
TPU primitive. Replaces the reference's ``expm``/``funm``/``fun_diag``
(``functions/fun_diag.m``, ``functions/fun_update.m:42-59``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .scalar import ScalarFun, get_fun


def fun_sym(M: jax.Array, f) -> jax.Array:
    """f(M) for symmetric M via eigendecomposition (``functions/fun_diag.m``).

    Batched: leading dimensions of M broadcast through eigh.
    """
    f = get_fun(f)
    M = (M + jnp.swapaxes(M, -1, -2)) / 2
    w, V = jnp.linalg.eigh(M)
    return jnp.einsum("...ij,...j,...kj->...ik", V, f(w), V)


def trace_fun_difference_eigs(d1: jax.Array, d2: jax.Array, f,
                              shift=0.0) -> jax.Array:
    """sum f(d1−σ) - f(d2−σ) for sorted eigenvalue arrays, with the
    cancellation-safe form for f=exp used by the reference
    (``functions/trace_fun_update.m:44-50``):
    ``sum(exp(d1) .* (1 - exp(d2 - d1)))``.

    ``shift`` (σ) evaluates the SHIFTED function trace(f(·−σI)): with
    σ≈λmax(A) every exponential stays O(1), which keeps the f32 TPU path
    finite on hub graphs where exp(λmax) overflows float32 (λmax ≳ 88,
    e.g. ca-AstroPh / soc-Epinions1) or where norms of O(exp(λmax))
    vectors overflow (λmax ≳ 44, e.g. as_735). Ratios like
    Δtrace/trace(exp(A)) are invariant under a common σ.

    Batched over leading dims; reduces the trailing dim.
    """
    f = get_fun(f)
    if f.name == "exp":
        return jnp.sum(jnp.exp(d1 - shift) * -jnp.expm1(d2 - d1), axis=-1)
    return jnp.sum(f(d1 - shift) - f(d2 - shift), axis=-1)


def trace_fun_update_dense(A: jax.Array, U: jax.Array, B: jax.Array, f,
                           shift=0.0) -> jax.Array:
    """Exact trace(f(A + U B Uᵀ) − f(A)) via two eighs — the reference's dense
    small-n fast path and debug oracle (``functions/trace_fun_update.m:37-51``).
    """
    At = A + U @ B @ U.T
    At = (At + At.T) / 2
    d1 = jnp.sort(jnp.linalg.eigvalsh(At))
    d2 = jnp.sort(jnp.linalg.eigvalsh((A + A.T) / 2))
    return trace_fun_difference_eigs(d1, d2, f, shift=shift)


def frechet_offdiag_sym(w1, V1, w2, V2, C, f) -> jax.Array:
    """Top-right block of f([[M1, C], [0, M2]]) for symmetric M1, M2 given by
    their eigendecompositions — the Daleckii–Krein / Sylvester form of the
    block-triangular trick the reference evaluates with a dense ``expm`` of
    the stacked matrix (``functions/multiple_frechet_eval.m:150-159``).

    X = V1 (F ∘ (V1ᵀ C V2)) V2ᵀ with F_ij = (f(w1_i) − f(w2_j)) / (w1_i − w2_j)
    (first divided difference; f'(w) on near-coincident pairs).

    Batched over leading dims.
    """
    from .scalar import derivative_of

    f = get_fun(f)
    df = derivative_of(f)
    num = f(w1)[..., :, None] - f(w2)[..., None, :]
    den = w1[..., :, None] - w2[..., None, :]
    mid = (w1[..., :, None] + w2[..., None, :]) / 2
    small = jnp.abs(den) < 1e-8
    F = jnp.where(small, df(mid), num / jnp.where(small, 1.0, den))
    Ct = jnp.einsum("...ij,...ik,...kl->...jl", V1, C, V2)
    return jnp.einsum("...ij,...jk,...lk->...il", V1, F * Ct, V2)


def frechet_offdiag(M1: jax.Array, M2: jax.Array, C: jax.Array, f) -> jax.Array:
    """Convenience wrapper: eigh both symmetric blocks then apply
    :func:`frechet_offdiag_sym`."""
    M1 = (M1 + jnp.swapaxes(M1, -1, -2)) / 2
    M2 = (M2 + jnp.swapaxes(M2, -1, -2)) / 2
    w1, V1 = jnp.linalg.eigh(M1)
    w2, V2 = jnp.linalg.eigh(M2)
    return frechet_offdiag_sym(w1, V1, w2, V2, C, f)
