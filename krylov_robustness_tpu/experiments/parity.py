"""Deterministic accuracy parity vs the dense oracle (BASELINE.md north-star:
agreement ≤ ~1e-6 on the paper datasets).

Two tables:

1. ``expmv_parity`` — the expmv action is deterministic (no Monte-Carlo
   noise), so it is the right place to demonstrate the 1e-6 north-star:
   ``max_j ‖expmv(A, e_j) − expm(A)·e_j‖₂ / ‖expm(A)·e_j‖₂`` over a block of
   unit vectors seeded at the highest-degree nodes, plus one dense
   Rademacher block, for every paper graph whose LCC has n < dense_cutoff
   (the oracle is scipy ``expm``; the reference computes the same action via
   ``expmv.m:73-92``).

2. ``trace_exp_tight`` — the stochastic estimator (``trace_exp.m:5-6``) run
   with tol tightened to 1e-6 (reference protocol uses 1e-4) against the
   dense eigendecomposition trace, demonstrating that the Hutch++-style
   deflation reaches the north-star tolerance when asked to.
"""

from __future__ import annotations

import time

import numpy as np

import jax.numpy as jnp

from ..funm.expmv import expmv, select_taylor_degree
from ..funm.trace import trace_exp
from ..graphs.io import (
    MISC_PAPER_SET,
    TRANSPORT_PAPER_SET,
    load_misc,
    load_oregon,
    load_transport,
)
from ..graphs.preprocess import preprocess_unweighted
from ..ops.sparse import CooMatrix
from ..utils.logging import ResultLog

EXPMV_COLUMNS = ["dataset", "n", "nnz", "cols", "max_rel_err", "time"]
TRACE_COLUMNS = ["dataset", "n", "nnz", "tol", "trace", "rel_err_vs_dense",
                 "time"]


def _paper_graphs(dense_cutoff: int):
    """(label, loader) pairs for every paper graph + dt_oregon A0; the
    n-cutoff is applied after LCC preprocessing by the caller."""
    items = [("oregon-A0", lambda: load_oregon(0))]
    for name in MISC_PAPER_SET:
        items.append((name, lambda name=name: load_misc(name)))
    for name in TRANSPORT_PAPER_SET:
        items.append((name, lambda name=name: load_transport(name)))
    return items


def run_expmv_parity(out_dir: str = "results", dense_cutoff: int = 2500,
                     n_unit: int = 8, n_rand: int = 4, verbose=True):
    """Golden expmv-action parity table (VERDICT round-1 item 6)."""
    import scipy.linalg

    log = ResultLog(out_dir, "expmv_parity", columns=EXPMV_COLUMNS,
                key=("dataset",))
    out = {}
    for label, loader in _paper_graphs(dense_cutoff):
        if log.has(dataset=label):
            continue
        A = preprocess_unweighted(loader())
        n = A.shape[0]
        if n > dense_cutoff:
            if verbose:
                print(f"{label:16s} n={n:6d} skipped (n > {dense_cutoff})")
            continue
        deg = np.asarray(A.sum(axis=1)).ravel()
        seeds = np.argsort(-deg)[:n_unit]
        B = np.zeros((n, n_unit + n_rand))
        B[seeds, np.arange(n_unit)] = 1.0
        rng = np.random.default_rng(0)
        B[:, n_unit:] = np.sign(rng.standard_normal((n, n_rand)))
        t0 = time.time()
        M = CooMatrix.from_scipy(A, dtype=jnp.float64)
        got = np.asarray(expmv(M, jnp.asarray(B)))
        dt = time.time() - t0
        want = scipy.linalg.expm(A.toarray()) @ B
        rel = float(
            np.max(np.linalg.norm(got - want, axis=0)
                   / np.linalg.norm(want, axis=0))
        )
        log.append(dataset=label, n=n, nnz=A.nnz, cols=B.shape[1],
                   max_rel_err=rel, time=dt)
        out[label] = rel
        if verbose:
            print(f"{label:16s} n={n:6d} cols={B.shape[1]} "
                  f"max_rel_err={rel:.2e} [{dt:5.1f}s]")
    return out, log


F32_LANE_COLUMNS = ["dataset", "n", "nnz", "platform", "sigma", "tol",
                    "trace_host_f64", "trace_f32_lane", "rel_diff", "agree"]


def run_trace_f32_lane(datasets=("as_735", "ca-CondMat"),
                       out_dir: str = "results", tol: float = 1e-4,
                       verbose=True):
    """Golden consumer for the repaired f32 stochastic-trace lane
    (VERDICT r4 item 7): the σ-shifted f32 ``mc_trace``/``expmv`` lane —
    the one whose rank-guard runaway was root-caused and fixed in round 4
    (results/NOTES_f32_mc_trace.md) — evaluated next to the certified host
    f64 value on the hub graphs that broke it. Both values are in e^{-σ}
    units; ``agree`` asserts the lanes match within the stochastic
    tolerance (3·tol), so a future f32-lane regression surfaces in the
    golden artifact, not just pytest (reference behavior
    ``functions/trace_exp.m:5-6``)."""
    import jax

    from ..funm.normest import normest2_host
    from ..funm.trace import trace_exp, trace_exp_host

    log = ResultLog(out_dir, "trace_f32_lane", columns=F32_LANE_COLUMNS,
                    key=("dataset",))
    out = {}
    for name in datasets:
        A = preprocess_unweighted(load_misc(name))
        sigma = float(normest2_host(A, tol=1e-2))
        host = trace_exp_host(A, tol=tol, sigma=sigma)
        M = CooMatrix.from_scipy(A, dtype=jnp.float32)
        t0 = time.time()
        dev = float(trace_exp(M, tol=tol, sigma=sigma))
        dt = time.time() - t0
        rel = abs(dev - host) / abs(host)
        agree = rel < 3 * tol
        log.append(dataset=name, n=A.shape[0], nnz=A.nnz,
                   platform=jax.default_backend(), sigma=sigma, tol=tol,
                   trace_host_f64=host, trace_f32_lane=dev, rel_diff=rel,
                   agree=agree)
        out[name] = rel
        if verbose:
            print(f"{name:12s} sigma={sigma:.2f} host_f64={host:.6e} "
                  f"f32_lane={dev:.6e} rel_diff={rel:.2e} "
                  f"agree={agree} [{dt:.1f}s]")
    return out, log


def run_trace_tight(datasets=None, out_dir: str = "results",
                    tol: float = 1e-6, maxit: int = 10000, verbose=True):
    """trace(exp(A)) with the stochastic tolerance tightened to the
    north-star 1e-6, checked against the dense eigendecomposition."""
    if datasets is None:
        datasets = [
            ("oregon", 0), ("transport", "Anaheim"),
            ("transport", "Barcelona"), ("misc", "london"),
            ("misc", "netscience"), ("misc", "Edinburgh"),
        ]
    log = ResultLog(out_dir, "trace_exp_tight", columns=TRACE_COLUMNS,
                key=("dataset",))
    out = {}
    for coll, name in datasets:
        label = f"oregon-A{name}" if coll == "oregon" else str(name)
        if log.has(dataset=label):
            continue
        loader = {"oregon": load_oregon, "transport": load_transport,
                  "misc": load_misc}[coll]
        A = preprocess_unweighted(loader(name))
        M = CooMatrix.from_scipy(A, dtype=jnp.float64)
        t0 = time.time()
        tr = float(trace_exp(M, tol=tol, maxit=maxit))
        dt = time.time() - t0
        dense = float(np.sum(np.exp(np.linalg.eigvalsh(A.toarray()))))
        rel = abs(tr - dense) / dense
        log.append(dataset=label, n=A.shape[0], nnz=A.nnz, tol=tol, trace=tr,
                   rel_err_vs_dense=rel, time=dt)
        out[label] = rel
        if verbose:
            print(f"{label:16s} n={A.shape[0]:6d} trace={tr:.8e} "
                  f"rel_err={rel:.2e} [{dt:6.1f}s]")
    return out, log
