"""Stochastic trace estimation: deflated Hutchinson (Hutch++-style).

Re-design of the reference's ``mc_trace`` (``functions/mc_trace.m``) for TPU:
the reference composes deflation *handles* recursively
(``Afun ← (I−QQᵀ)·Afun·(I−QQᵀ)``, ``mc_trace.m:47-48``) which makes each
outer iteration recompute the whole stack. Because each new Q block is
orthogonal to all previous ones (it is produced inside the deflated range),
the handle stack collapses to a single projector ``P = I − Q_acc·Q_accᵀ``
with the *accumulated* basis — so we keep one padded (n, m·K) basis on
device and each outer iteration is one jitted call of three operator
applications. The convergence test (relative change < tol,
``mc_trace.m:50-57``) stays on host between iterations.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from .expmv import ExpmvPlan, expmv, select_taylor_degree


def _rademacher(key, shape, dtype):
    return jnp.where(
        jax.random.bernoulli(key, 0.5, shape), 1.0, -1.0
    ).astype(dtype)


def _dot(a, b):
    """Full-precision matmul: TPU's DEFAULT matmul precision is bfloat16,
    which put ~5.6e-4 relative error into the deflation projections on the
    real chip (CPU-f32 lane: 1.2e-5) — above the golden agreement gate.
    The projector and trace dots must run at HIGHEST."""
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


def _project(Qacc, x):
    """x − Q (Qᵀ x) with a zero-padded accumulated basis."""
    return x - _dot(Qacc, _dot(Qacc.T, x))


def _mc_trace_iteration(op: Callable, key, Qacc, tr, t_idx, scale,
                        m_probe: int):
    """One outer iteration (``mc_trace.m:42-49``). ``op`` must be jit-safe."""
    n = Qacc.shape[0]
    dtype = Qacc.dtype
    kS, kG = jax.random.split(key)
    S = _rademacher(kS, (n, m_probe), dtype)
    G = _rademacher(kG, (n, m_probe), dtype)

    def defl_op(x):
        return _project(Qacc, op(_project(Qacc, x)))

    Y = defl_op(S)
    # second cross-block orthogonalization pass: one projection leaves
    # O(eps·κ) components along Qacc in Y; QR would bake them into "new"
    # directions. (Root cause of the round-2/3 f32 hub-graph defect —
    # see NOTES_f32_mc_trace.md.)
    Y = _project(Qacc, Y)
    Q, R = jnp.linalg.qr(Y)
    # rank guard: once deflation nearly spans the range, qr of the residual
    # returns junk orthonormal columns (|R_ii| ≈ 0) that are NOT orthogonal
    # to Qacc — keeping them double-counts eigenvalue mass and the estimate
    # runs away. The threshold must be ABSOLUTE (against the running scale
    # of the operator seen so far), not relative to the current block: when
    # the whole residual block is noise, its columns are mutually comparable
    # and a per-block-relative guard keeps them all. Zero them out
    # (jit-static shapes); the caller stops when nothing survives.
    rdiag = jnp.abs(jnp.diagonal(R))
    scale = jnp.maximum(scale, jnp.max(rdiag))
    keep = rdiag > 100 * jnp.finfo(dtype).eps * jnp.maximum(
        scale, jnp.asarray(1e-300, dtype))
    kept = jnp.sum(keep)
    Q = Q * keep[None, :].astype(dtype)
    tr = tr + jnp.trace(_dot(Q.T, defl_op(Q)))
    Qacc = jax.lax.dynamic_update_slice(Qacc, Q, (0, t_idx * m_probe))

    def defl_op2(x):
        return _project(Qacc, op(_project(Qacc, x)))

    tr_new = tr + jnp.trace(_dot(G.T, defl_op2(G))) / m_probe
    return tr, tr_new, Qacc, scale, kept


def mc_trace(
    op: Callable,
    n: int,
    tol: float = 1e-3,
    maxit: int = 10,
    is_real: bool = True,
    m_probe: int = 10,
    key=None,
    dtype=jnp.float64,
    debug: bool = False,
):
    """Trace of the black-box symmetric operator ``op`` (x ↦ A·x).

    Matches the reference protocol: outer budget ``K = ceil(maxit/(3·m))``
    (``mc_trace.m:41``), per iteration m exact deflation directions + an
    m-probe Hutchinson remainder, stop when the relative change of the
    estimate drops below tol.

    Returns (trace_estimate, residual, iterations).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    K = max(-(-maxit // (3 * m_probe)), 1)
    # deflation cannot usefully exceed the space dimension: cap the outer
    # budget at full span (ceil(n/m) blocks — the rank guard zeroes the
    # overshoot columns), at which point the estimate is exact and the
    # remainder contributes nothing
    K = min(K, max(-(-n // m_probe), 1))
    Qacc = jnp.zeros((n, m_probe * K), dtype)
    tr = jnp.asarray(0.0, dtype)
    tr_old = 0.0
    scale = jnp.asarray(0.0, dtype)
    it_fn = jax.jit(
        partial(_mc_trace_iteration, op, m_probe=m_probe),
        static_argnames=(),
    )
    tr_new = tr
    res = jnp.inf
    hits = 0
    # a single sub-tol relative change can be a stochastic fluke at tight
    # tolerances; below 1e-4 require two consecutive hits before accepting
    # (the reference's single-hit rule is kept at its own tol=1e-3/1e-4)
    need_hits = 1 if tol >= 1e-4 else 2
    for it in range(K):
        key, sub = jax.random.split(key)
        tr, tr_new, Qacc, scale, kept = it_fn(sub, Qacc, tr, it, scale)
        if int(kept) == 0:
            # deflation exhausted the operator's numerical range: the
            # residual is pure noise, the exact accumulator IS the trace up
            # to the dropped remainder — which the absolute rank guard
            # (~100·eps·scale per column) bounds at ~n·eps·scale. Report
            # that bound (relative, matching res's units elsewhere) rather
            # than claiming exactly 0 (ADVICE r4).
            tr_new = tr
            res = float(n * jnp.finfo(dtype).eps * jnp.abs(scale)
                        / jnp.maximum(jnp.abs(tr), 1e-300))
            if debug:
                print(f"mc_trace it={it + 1} deflation exhausted; "
                      f"tr={float(tr):.6e}")
            break
        tr_new_f = float(tr_new)
        res = abs(tr_new_f - tr_old) / max(abs(tr_new_f), abs(tr_old), 1e-300)
        if debug:
            print(
                f"mc_trace it={it + 1} pts={(it + 1) * 3 * m_probe} "
                f"tr={tr_new_f:.6e} res={res:.3e}"
            )
        hits = hits + 1 if res < tol else 0
        if hits >= need_hits:
            break
        tr_old = tr_new_f
    return float(jnp.real(tr_new)) if is_real else tr_new, res, it + 1


def mc_trace_host(op, n: int, tol: float = 1e-3, maxit: int = 10,
                  m_probe: int = 10, seed: int = 0):
    """Host (numpy f64) twin of :func:`mc_trace` — same deflated-Hutchinson
    protocol (``mc_trace.m:42-58``: per outer iteration m exact deflation
    directions + an m-probe remainder, relative-change stop). For TPU
    sessions the trace normalizer is a single scalar whose device
    evaluation costs one fresh compile + ~34 tunnel dispatches per graph;
    the host lane computes it in f64 in seconds (same split as
    compute_centrality_host)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    K = max(-(-maxit // (3 * m_probe)), 1)
    K = min(K, max(-(-n // m_probe), 1))
    Qacc = np.zeros((n, 0))
    tr = 0.0
    tr_old = 0.0
    res = np.inf
    hits = 0
    need_hits = 1 if tol >= 1e-4 else 2
    tr_new = 0.0
    scale = 0.0
    for it in range(K):
        S = rng.choice([-1.0, 1.0], size=(n, m_probe))
        G = rng.choice([-1.0, 1.0], size=(n, m_probe))

        def defl(x):
            x = x - Qacc @ (Qacc.T @ x)
            y = op(x)
            return y - Qacc @ (Qacc.T @ y)

        Y = defl(S)
        # same three guards as the device lane (NOTES_f32_mc_trace.md):
        # cross-block re-orthogonalization, ABSOLUTE rank guard against the
        # running scale, exhaustion stop. The f64 host lane hits the same
        # runaway on extreme hub spectra (Journals λmax≈101: numerically
        # rank-1 relative even in f64).
        Y = Y - Qacc @ (Qacc.T @ Y)
        Q, R = np.linalg.qr(Y)
        rdiag = np.abs(np.diagonal(R))
        scale = max(scale, rdiag.max(initial=0.0))
        keep = rdiag > 100 * np.finfo(np.float64).eps * max(scale, 1e-300)
        if not keep.any():
            # deflated operator numerically null: tr is exact up to the
            # guard-dropped remainder, bounded at ~n·eps·scale (relative
            # form to match res's units elsewhere; ADVICE r4)
            tr_new = tr
            res = (n * np.finfo(np.float64).eps * abs(scale)
                   / max(abs(tr), 1e-300))
            break
        Q = Q[:, keep]
        tr = tr + np.trace(Q.T @ defl(Q))
        Qacc = np.concatenate([Qacc, Q], axis=1)
        tr_new = tr + np.trace(G.T @ defl(G)) / m_probe
        res = abs(tr_new - tr_old) / max(abs(tr_new), abs(tr_old), 1e-300)
        hits = hits + 1 if res < tol else 0
        if hits >= need_hits:
            break
        tr_old = tr_new
    return float(tr_new), res, it + 1


def trace_exp_host(A_scipy, tol: float = 1e-4, maxit: int = 1000,
                   m_probe: int = 10, sigma: float = 0.0,
                   seed: int = 0) -> float:
    """Host-lane trace(exp(A − σI)) (reference ``trace_exp.m`` protocol) in
    f64. Used by TPU experiment sessions for the scalar normalizer.

    Two regimes:

    * σ-shifted hub graphs (σ ≈ λmax ≳ 20, the f32 overflow cases): the
      spectrum sum Σ e^{λi−σ} is dominated by the top eigenvalues, so a
      top-k ``eigsh`` partial sum with the CERTIFIED tail bound
      (n−k)·e^{λk−σ} converges to far below tol — and avoids
      ``expm_multiply``'s scaling blow-up on ‖A−σI‖₁ ≈ 2σ (hundreds of
      SpMV stages per probe on soc-Epinions1-scale graphs). Falls back to
      the stochastic lane if the bound doesn't certify.
    * otherwise: :func:`mc_trace_host` deflated Hutchinson over scipy's
      Al-Mohy–Higham ``expm_multiply`` action (the reference protocol).
    """
    import numpy as np
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    A = sp.csr_matrix(A_scipy).astype(float)
    n = A.shape[0]

    if sigma > 20.0 and n > 50:
        # adaptive top-k: hub spectra decay fast, so the certified tail
        # bound usually closes at k≈64 — escalating from there instead of
        # a fixed k=400 cut the soc-Epinions1 normalizer from ~180 s to
        # seconds. ARPACK's tol is RELATIVE (δλ ≈ tol·λmax ≈ tol·σ), and
        # the relative trace error is δ(e^{λ−σ})/e^{λ−σ} = δλ, so tol is
        # scaled by σ to keep the trace error ≤ ~1e-7 regardless of the
        # spectral scale (σ up to ~184 on soc-Epinions1).
        eig_tol = min(1e-8, 1e-7 / sigma)
        for k in (64, 256, min(400, n - 2)):
            k = min(k, n - 2)
            w = spla.eigsh(A, k=k, which="LA", return_eigenvectors=False,
                           tol=eig_tol)
            w = np.sort(w)[::-1]
            tr = float(np.sum(np.exp(w - sigma)))
            tail = (n - k) * float(np.exp(w[-1] - sigma))
            if tail < 1e-6 * tr:
                return tr
            if k >= n - 2:
                break

    if sigma:
        A = (A - sigma * sp.identity(n, format="csr")).tocsr()

    def op(x):
        return spla.expm_multiply(A, x)

    tr, _, _ = mc_trace_host(op, n, tol=tol, maxit=maxit, m_probe=m_probe,
                             seed=seed)
    return tr


def trace_exp(A, tol: float = 1e-4, maxit: int = 1000, key=None,
              plan: ExpmvPlan | None = None, m_probe: int = 10,
              sigma: float = 0.0):
    """Estimate trace(exp(A − σI)) — reference ``functions/trace_exp.m``:
    Hutchinson estimator over the ``expmv`` action with tol 1e-4. σ=0 gives
    plain trace(exp(A)); σ≈λmax keeps the f32 TPU path finite on hub graphs
    (shift-invariant ratios like Δtrace/trexp are unchanged)."""
    if plan is None:
        plan = select_taylor_degree(A, t=1.0, b_cols=m_probe)

    def op(x):
        return expmv(A, x, t=1.0, plan=plan, sigma=sigma)

    tr, res, it = mc_trace(
        op, A.n, tol=tol, maxit=maxit, is_real=True, m_probe=m_probe,
        key=key, dtype=A.dtype,
    )
    return tr
