"""CONFIG 5 (BASELINE.json): weighted rewiring of trace(sinh(A)) via
interior-point with Krylov gradient on the largest paper network, the
operator row-partitioned over a device mesh.

On real hardware the mesh spans chips/hosts; under
``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu`` it
exercises the identical sharded program on 8 virtual devices (how this repo
validates multi-chip paths; CLAUDE.md). The optimizer protocol mirrors
``Tests/test_weighted_sinh_lbfgs.m`` (rewire method) applied to a transport
graph instead of a power grid.

Usage:
    python scripts/config5_sharded_sinh_rewire.py [dataset] [n_devices]
"""

import os
import sys
import time

if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
# force CPU: this script validates the sharded program on virtual devices;
# the ambient environment points JAX_PLATFORMS at the remote TPU tunnel
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402


def main():
    dataset = sys.argv[1] if len(sys.argv) > 1 else "Vermont"
    n_dev = int(sys.argv[2]) if len(sys.argv) > 2 else len(jax.devices())
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    from krylov_robustness_tpu.graphs.centrality import compute_centrality_host
    from krylov_robustness_tpu.graphs.io import load_transport
    from krylov_robustness_tpu.graphs.preprocess import preprocess_unweighted
    from krylov_robustness_tpu.funm.normest import normest2_host
    from krylov_robustness_tpu.optimize.continuous import (
        build_problem,
        optimize_weights,
    )
    from krylov_robustness_tpu.parallel.mesh import make_mesh
    from krylov_robustness_tpu.parallel.spmm_sharded import RowShardedMatrix
    from krylov_robustness_tpu.utils.logging import ResultLog

    A = preprocess_unweighted(load_transport(dataset))
    n = A.shape[0]
    mesh = make_mesh(n_dev)
    M = RowShardedMatrix.from_scipy(A, mesh, dtype=dtype)
    print(f"{dataset}: n={n} nnz={A.nnz} mesh={tuple(mesh.shape.items())}",
          flush=True)

    nrmA = float(normest2_host(A, tol=1e-2))
    centrality = compute_centrality_host(A, "eig")
    t0 = time.time()
    # Search-space sizes scaled down from the power-grid protocol (100/30):
    # the gradient-refinement entries and the rank-2k update bases are
    # O(n · m · k) memory and n here is 30-100x the largest power grid.
    prob = build_problem(
        A, M, centrality, "rewire", fun="sinh", search_space=30,
        modifiable_edges=10, heur_order="min", total_weight=10.0,
        ndense=0,  # never densify: n is far past the dense cutoff
        tol=1e-6 * float(np.sinh(nrmA)),
        entries_method="expmv",  # fused Taylor actions; the per-row Arnoldi
        # evaluator compiles one large program per round through shard_map
    )
    t_build = time.time() - t0
    print(f"search space built in {t_build:.1f}s "
          f"({len(prob.Omega)} modifiable edges)", flush=True)

    t0 = time.time()
    res = optimize_weights(A, M, prob, fun="sinh", tol=1e-6,
                           use_hessian=False, maxiter=50, nrmA=nrmA)
    t_opt = time.time() - t0

    # score normalizer: trace(sinh(A)) = (tr exp(A) − tr exp(−A))/2 via
    # Hutchinson over expmv actions on the SAME sharded operator (t=−1 reuses
    # the +A Taylor plan — degree selection depends on |t|·‖A‖ only)
    from krylov_robustness_tpu.funm.expmv import expmv, select_taylor_degree
    from krylov_robustness_tpu.funm.trace import mc_trace

    plan_p = select_taylor_degree(M, t=1.0, b_cols=10)
    plan_m = select_taylor_degree(M, t=-1.0, b_cols=10)
    tr_p, _, _ = mc_trace(lambda x: expmv(M, x, t=1.0, plan=plan_p), n,
                          tol=1e-3, maxit=1000, dtype=M.dtype)
    tr_m, _, _ = mc_trace(lambda x: expmv(M, x, t=-1.0, plan=plan_m), n,
                          tol=1e-3, maxit=1000, dtype=M.dtype)
    tr_sinh = (tr_p - tr_m) / 2
    score = -res.fval / tr_sinh

    log = ResultLog("results", "config5_sharded_sinh_rewire",
                    columns=["dataset", "n", "n_devices", "method", "fun",
                             "score_pct", "iterations", "time_build",
                             "time_opt"])
    log.append(dataset=dataset, n=n, n_devices=n_dev, method="rewire",
               fun="sinh", score_pct=score * 100, iterations=res.iterations,
               time_build=t_build, time_opt=t_opt)
    print(f"rewire sinh: score={score * 100:.3f}%  it={res.iterations} "
          f"opt={t_opt:.1f}s  ({res.message})", flush=True)


if __name__ == "__main__":
    main()
