#!/usr/bin/env python
"""Root-cause probe for the round-2/3 defect: the device-lane f32
sigma-shifted trace normalizer returned garbage magnitudes on hub graphs
(ca-CondMat: ~13,070 vs true 1.0007). Reproduce on CPU (the lane is
platform-independent) on as_735 and bisect: estimator (mc_trace) vs
action (expmv) vs their composition.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "")
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np
import scipy.sparse.linalg as spla

from krylov_robustness_tpu.funm.expmv import expmv, select_taylor_degree
from krylov_robustness_tpu.funm.normest import normest2_host
from krylov_robustness_tpu.funm.trace import mc_trace, trace_exp, trace_exp_host
from krylov_robustness_tpu.graphs.io import load_misc
from krylov_robustness_tpu.graphs.preprocess import preprocess_unweighted
from krylov_robustness_tpu.ops.sparse import CooMatrix

A = preprocess_unweighted(load_misc("as_735"))
n = A.shape[0]
sigma = float(normest2_host(A, tol=1e-2))
print(f"as_735 n={n} sigma={sigma:.4f}")

host = trace_exp_host(A, sigma=sigma)
print(f"[1] host f64 (certified eigsh): {host:.6f}")

M64 = CooMatrix.from_scipy(A, dtype=jnp.float64)
dev64 = trace_exp(M64, sigma=sigma)
print(f"[2] device lane f64:            {dev64:.6f}")

M32 = CooMatrix.from_scipy(A, dtype=jnp.float32)
dev32 = trace_exp(M32, sigma=sigma)
print(f"[3] device lane f32:            {dev32:.6f}")

# --- bisect: expmv action accuracy in f32 ------------------------------
rng = np.random.default_rng(0)
X = rng.choice([-1.0, 1.0], size=(n, 4))
ref = spla.expm_multiply(
    (A - sigma * __import__("scipy").sparse.identity(n)).tocsc(),
    X,
)
plan32 = select_taylor_degree(M32, t=1.0, b_cols=4)
print(f"    f32 plan: m={plan32.m} s={plan32.s} mu={plan32.mu}")
y32 = np.asarray(expmv(M32, jnp.asarray(X, jnp.float32), t=1.0, plan=plan32,
                       sigma=sigma))
plan64 = select_taylor_degree(M64, t=1.0, b_cols=4)
y64 = np.asarray(expmv(M64, jnp.asarray(X), t=1.0, plan=plan64, sigma=sigma))
print(f"[4] expmv f32 err vs scipy: {np.abs(y32 - ref).max():.3e} "
      f"(||ref||={np.abs(ref).max():.3e})")
print(f"[5] expmv f64 err vs scipy: {np.abs(y64 - ref).max():.3e}")

# --- bisect: mc_trace estimator in f32 with an EXACT action -------------
# top-eigenpair surrogate: exp(A - sigma I) ~= sum_k e^{lam_k-sigma} u_k u_k^T
w, V = spla.eigsh(A.astype(float), k=200, which="LA")
coef = np.exp(w - sigma)
exact_tr = coef.sum() + (n - 200) * np.exp(w.min() - sigma)
print(f"    surrogate exact trace: {coef.sum():.6f} (tail bound adds "
      f"{(n - 200) * np.exp(w.min() - sigma):.2e})")
V32 = jnp.asarray(V, jnp.float32)
c32 = jnp.asarray(coef, jnp.float32)


def op32(x):
    return V32 @ (c32[:, None] * (V32.T @ x))


tr_est, res, it = mc_trace(op32, n, tol=1e-4, maxit=1000, m_probe=10,
                           dtype=jnp.float32)
print(f"[6] mc_trace f32 on exact low-rank op: {tr_est:.6f} "
      f"(res={res:.2e}, it={it})")


def op64(x):
    return jnp.asarray(V) @ (jnp.asarray(coef)[:, None] * (jnp.asarray(V).T @ x))


tr_est64, res64, it64 = mc_trace(op64, n, tol=1e-4, maxit=1000, m_probe=10,
                                 dtype=jnp.float64)
print(f"[7] mc_trace f64 on exact low-rank op: {tr_est64:.6f} "
      f"(res={res64:.2e}, it={it64})")
