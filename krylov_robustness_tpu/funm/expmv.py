"""Action of the matrix exponential: f = exp(t·A)·B without forming exp(t·A).

TPU-native re-design of Al-Mohy & Higham Alg. 3.2 (reference
``functions/expmv.m`` + ``functions/select_taylor_degree.m``):

* Degree/stage selection is a *host-side plan* computed once per operator
  (norm estimates are pulled to host as scalars), so the hot Taylor loop
  compiles with static (m, s) — no data-dependent shapes under ``jit``.
* The Taylor recurrence ``b ← (t/(s·k))·A·b; f ← f + b`` runs as a
  ``lax.while_loop`` (static bound m, data-dependent early exit mirroring
  ``expmv.m:81-88``) nested in a ``lax.fori_loop`` over the s stages.
* Everything is a block operation on (n, width) right-hand sides — Hutchinson
  probes and Krylov blocks arrive in batches, which is what feeds the TPU.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .normest import norm1, normAm_nonneg, norm_inf_rowsum
from .theta import THETA_DOUBLE

_PREC_TOL = {"double": 2.0 ** -53, "single": 2.0 ** -24, "half": 2.0 ** -10}


@dataclasses.dataclass(frozen=True)
class ExpmvPlan:
    """Static Taylor-evaluation plan: degree m, s scaling stages."""

    m: int
    s: int
    t: float
    mu: float
    prec: str = "double"
    shift: bool = True

    @property
    def tol(self) -> float:
        return _PREC_TOL[self.prec]


def _diag_trace(A) -> jax.Array:
    """trace(A) for a COO matrix."""
    on_diag = (A.rows == A.cols).astype(A.dtype)
    return jnp.sum(A.vals * on_diag)


def select_taylor_degree(
    A,
    t: float = 1.0,
    b_cols: int = 1,
    m_max: int = 55,
    p_max: int = 8,
    prec: str = "double",
    shift: bool = True,
    force_estm: bool = False,
) -> ExpmvPlan:
    """Choose Taylor degree m and number of stages s (host-side).

    Mirrors the selection logic of ``functions/select_taylor_degree.m`` and
    the cost minimization of ``functions/expmv.m:57-68``. α_p estimates use
    the nonnegative-exact path of ``functions/normAm.m:17-23`` applied to |A|
    (upper bound for general A — conservative, still correct).
    """
    if p_max < 2 or m_max > 60 or m_max + 1 < p_max * (p_max - 1):
        raise ValueError("invalid p_max or m_max")
    theta = THETA_DOUBLE  # double table; prec only changes the loop tol
    n = A.n
    mu = float(_diag_trace(A)) / n if shift else 0.0

    # 1-norm of the shifted, scaled operator t*(A - mu*I). Column sums of
    # |t·A| adjusted by the diagonal shift: exact.
    colsum = np.asarray(
        jax.ops.segment_sum(jnp.abs(A.vals), A.cols, num_segments=A.n)
    )
    if mu != 0.0:
        # colsum of |A - mu I|: replace the |diag| contribution by |diag - mu|
        rows = np.asarray(A.rows)
        cols = np.asarray(A.cols)
        vals = np.asarray(A.vals)
        diag = np.zeros(n)
        on_diag = rows == cols
        np.add.at(diag, cols[on_diag], vals[on_diag])
        colsum = colsum - np.abs(diag) + np.abs(diag - mu)
    normA = abs(t) * float(np.max(colsum))

    if (not force_estm) and normA <= 4 * theta[m_max - 1] * p_max * (
        p_max + 3
    ) / (m_max * b_cols):
        alpha = np.full(p_max - 1, normA)
    else:
        vals = np.asarray(A.vals)
        nonneg = bool(np.all(vals >= 0)) and mu <= 0.0
        Bs = None
        if not nonneg:
            # mixed-sign operator: the |A|-product bound would inflate the
            # Taylor degree; use the normest1-style block estimator on the
            # true shifted operator (``functions/normAm.m:25-51``)
            import scipy.sparse as _sp

            from .normest import normest1_power

            rows = np.asarray(A.rows)
            cols = np.asarray(A.cols)
            Bs = _sp.csr_matrix(
                (vals.astype(np.float64), (rows, cols)), shape=(n, n)
            )
        eta = np.zeros(p_max)
        for p in range(1, p_max + 1):
            if nonneg:
                c = float(normAm_abs(A, p + 1, mu=mu))
            else:
                c = normest1_power(
                    lambda X: Bs @ X - mu * X, n, m=p + 1, t=2
                )
            eta[p - 1] = (abs(t) ** (p + 1) * c) ** (1.0 / (p + 1))
        alpha = np.maximum(eta[: p_max - 1], eta[1:p_max])

    # M(m, p): alpha_p / theta_m for admissible degrees; cost = ceil(M)·m.
    M = np.zeros((m_max, p_max - 1))
    for p in range(2, p_max + 1):
        for m in range(p * (p - 1) - 1, m_max + 1):
            M[m - 1, p - 2] = alpha[p - 2] / theta[m - 1]

    C = np.ceil(M).T * np.arange(1, m_max + 1)[None, :]
    C[C == 0] = np.inf
    idx = np.unravel_index(np.argmin(C), C.shape)
    cost = C[idx]
    m = int(idx[1] + 1)
    if not np.isfinite(cost):
        cost = 0.0
    s = max(int(math.ceil(cost / m)), 1)
    return ExpmvPlan(m=m, s=s, t=float(t), mu=mu, prec=prec, shift=shift)


def normAm_abs(A, m: int, mu: float = 0.0) -> jax.Array:
    """‖|A − μI|^m‖₁ upper-bound estimate via chained products with |A|."""
    import dataclasses as _dc

    absA = _dc.replace(A, vals=jnp.abs(A.vals))
    if mu == 0.0:
        return normAm_nonneg(absA, m)
    e = jnp.ones((A.n,), A.dtype)

    def body(_, e):
        return absA @ e + abs(mu) * e

    e = jax.lax.fori_loop(0, m, body, e)
    return jnp.max(e)


@partial(jax.jit, static_argnames=("m", "s", "shift", "full_term"))
def _expmv_core(A, b, t, mu, tol, m: int, s: int, shift: bool, full_term: bool,
                sigma=0.0):
    dtype = b.dtype
    t = jnp.asarray(t, dtype)
    mu = jnp.asarray(mu, dtype)
    sigma = jnp.asarray(sigma, dtype)
    # spectral shift: computing exp(t·(A−σI))·b only changes the per-stage
    # unshift factor (the Taylor recurrence itself runs on A−μI as before);
    # with σ≈λmax all stage values stay O(‖b‖) — the f32 overflow guard for
    # hub graphs (see funm.dense.trace_fun_difference_eigs).
    mu_eff = (mu if shift else jnp.asarray(0.0, dtype)) - sigma
    eta = jnp.exp(t * mu_eff / s)

    def op(x):
        y = A @ x
        return y - mu * x if shift else y

    def stage(i, carry):
        b, f = carry
        c1 = norm_inf_rowsum(b)

        def wcond(st):
            k, b, f, c1, done = st
            return jnp.logical_and(k <= m, jnp.logical_not(done))

        def wbody(st):
            k, b, f, c1, done = st
            b = (t / (s * k)) * op(b)
            f = f + b
            c2 = norm_inf_rowsum(b)
            done = jnp.logical_and(
                not full_term,
                c1 + c2 <= tol * norm_inf_rowsum(f),
            )
            return (k + 1, b, f, c2, done)

        _, b, f, _, _ = jax.lax.while_loop(
            wcond, wbody, (jnp.asarray(1), b, f, c1, jnp.asarray(False))
        )
        f = eta * f
        return (f, f)

    f = jax.lax.fori_loop(0, s, stage, (b, b))[1]
    return f


def expmv(A, b: jax.Array, t: float = 1.0, plan: ExpmvPlan | None = None,
          prec: str = "double", shift: bool = True, full_term: bool = False,
          b_cols_hint: int | None = None, sigma: float = 0.0,
          debug_numerics: bool = False) -> jax.Array:
    """exp(t·(A − σI))·b (σ=``sigma``, default 0 ⇒ plain exp(t·A)·b).
    Builds a plan on first use if not provided.

    For repeated application with the same A (stochastic trace, Krylov seeds)
    compute ``plan = select_taylor_degree(A, t, b_cols)`` once and pass it in
    — the reference makes the same recommendation (``functions/expmv.m:12-15``).
    """
    if plan is None:
        cols = b_cols_hint or (b.shape[1] if b.ndim == 2 else 1)
        plan = select_taylor_degree(A, t=t, b_cols=cols, prec=prec, shift=shift)
    if t == 0.0:
        return b
    if plan.t != t:
        # the plan bakes in t (degree/scaling chosen from |t|·α and the
        # stage factor t/(s·k) uses plan.t) — a mismatched t would silently
        # compute exp(plan.t·A)·b
        raise ValueError(
            f"expmv plan was built for t={plan.t} but t={t} was requested; "
            "build a plan per t (degree selection depends only on |t|, so "
            "this is cheap for sign flips)"
        )
    if debug_numerics:
        # SURVEY.md §5.2: the TPU analog of the reference's runtime warnings
        # — run the Taylor loop under checkify so div/NaN faults surface
        # with a per-column finite report instead of silently propagating.
        from ..utils.guards import checkified, finite_mask

        err, f = checkified(
            partial(_expmv_core, m=plan.m, s=plan.s, shift=plan.shift,
                    full_term=full_term, sigma=sigma),
            A, b, plan.t, plan.mu, plan.tol,
        )
        err.throw()
        cols_ok = finite_mask(f, axis=1 if f.ndim == 2 else None)
        if not bool(jnp.all(cols_ok)):
            raise FloatingPointError(
                f"expmv produced non-finite columns: {np.nonzero(~np.asarray(cols_ok))[0]}"
            )
        return f
    return _expmv_core(
        A, b, plan.t, plan.mu, plan.tol, plan.m, plan.s, plan.shift, full_term,
        sigma=sigma,
    )
