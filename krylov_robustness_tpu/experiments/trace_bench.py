"""trace(exp(A)) wall-time benchmark across the paper datasets
(BASELINE.md metric: trace-eval wall time at 1 chip / 1 host / N hosts).

Per dataset: preprocess, plan expmv once, run trace_exp, record wall time and
(where dense is feasible) the relative error vs the eigendecomposition —
CONFIG 1 of BASELINE.json generalized beyond dt_oregon.
"""

from __future__ import annotations

import time

import numpy as np

import jax.numpy as jnp

from ..funm.trace import trace_exp
from ..graphs.io import load_misc, load_oregon, load_transport
from ..graphs.preprocess import preprocess_unweighted
from ..ops.sparse import CooMatrix
from ..utils.logging import ResultLog

TRACE_COLUMNS = ["dataset", "n", "nnz", "time", "trace", "rel_err_vs_dense"]


def run(datasets=None, out_dir: str = "results", dtype=jnp.float64,
        dense_cutoff: int = 2500, tol: float = 1e-4, verbose=True):
    if datasets is None:
        datasets = [
            ("oregon", 0), ("transport", "Anaheim"), ("transport", "Rome"),
            ("transport", "Barcelona"), ("misc", "jazz"), ("misc", "USAir97"),
            ("misc", "london"),
        ]
    # keyed by dataset: resumed/re-run suites replace their old row instead
    # of appending duplicates (the round-2 table carried nan-era duplicates)
    log = ResultLog(out_dir, "trace_exp", columns=TRACE_COLUMNS,
                    key=("dataset",))
    out = {}
    for coll, name in datasets:
        if coll == "oregon":
            A = load_oregon(name)
            label = f"oregon-A{name}"
        elif coll == "transport":
            A = load_transport(name)
            label = name
        else:
            A = load_misc(name)
            label = name
        A = preprocess_unweighted(A)
        M = CooMatrix.from_scipy(A, dtype=dtype)
        t0 = time.time()
        tr = trace_exp(M, tol=tol)
        dt = time.time() - t0
        if A.shape[0] <= dense_cutoff:
            dense = float(
                np.sum(np.exp(np.linalg.eigvalsh(A.toarray())))
            )
            rel = abs(tr - dense) / dense
            rel_str = f"{rel:.2e}"
        else:
            # no silent nan: the dense oracle is intentionally not computed
            rel = rel_str = "skipped(n>cutoff)"
        log.append(dataset=label, n=A.shape[0], nnz=A.nnz, time=dt,
                   trace=tr, rel_err_vs_dense=rel)
        if verbose:
            print(f"{label:14s} n={A.shape[0]:6d} trace={tr:.6e} "
                  f"[{dt:6.2f}s] rel_err={rel_str}")
        out[label] = (tr, dt, rel)
    return out, log
