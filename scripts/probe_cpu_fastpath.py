#!/usr/bin/env python
"""CPU-lane greedy step profiling (VERDICT r3 item 4): compare the jitted
phase path (current CPU default) against the fused-dispatch + banded
host-spectra path (currently TPU-gated) on small-half graphs, and check the
edge picks are identical.
"""
import os
import sys
import time
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import numpy as np

from krylov_robustness_tpu.funm.normest import normest2_host
from krylov_robustness_tpu.graphs.centrality import compute_centrality_host
from krylov_robustness_tpu.graphs.io import load_misc, load_transport
from krylov_robustness_tpu.graphs.preprocess import preprocess_unweighted
from krylov_robustness_tpu.graphs.top_edges import find_top_edges
from krylov_robustness_tpu.ops.sparse import CooMatrix
from krylov_robustness_tpu.updates.trace_update import (
    trace_fun_update_batched,
    edge_start_blocks,
    edge_B,
)

name = sys.argv[1] if len(sys.argv) > 1 else "Cardiff"
loader = load_misc if name not in ("Anaheim", "Rome", "Barcelona") else load_transport
A = preprocess_unweighted(loader(name))
n = A.shape[0]
lognrm = float(normest2_host(A, tol=1e-2))
tol = 1e-6 * float(np.exp(min(lognrm, 709.0)))
cent = compute_centrality_host(A, "eig")
top = find_top_edges(A, cent, 300, "min")
M = CooMatrix.from_scipy(A, dtype=jnp.float64)
E = jnp.asarray(top[:250])
U0 = edge_start_blocks(n, E, M.dtype)
B = edge_B(E, -1.0, 1.0, M.dtype)
print(f"{name}: n={n} nnz={A.nnz} batch={E.shape[0]} tol={tol:.2e}")

for mode, he in (("phase(jit eigh)", False), ("host banded", True)):
    ts = []
    for rep in range(3):
        t0 = time.perf_counter()
        r = trace_fun_update_batched(M, U0, B, tol=tol, host_eigh=he)
        jax.block_until_ready(r.delta)
        ts.append(time.perf_counter() - t0)
    d = np.asarray(r.delta)
    print(f"  {mode:16s}: first={ts[0]:.2f}s steady={min(ts[1:]):.3f}s "
          f"argmin={int(np.argmin(d))} min={d.min():.8e} "
          f"iters_max={int(np.asarray(r.iters).max())}")
