#!/usr/bin/env python
"""Measure fused-greedy effective step latency on the real chip at the
bench protocol shape (ca-AstroPh, Q=250, bs=2) — VERDICT r4 item 1's
"done" gate: median effective step <= 150 ms, picks identical to the
per-step loop.

Run from the repo root on a TPU session (do NOT replace PYTHONPATH).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from krylov_robustness_tpu.funm.normest import normest2_host
    from krylov_robustness_tpu.graphs.centrality import compute_centrality_host
    from krylov_robustness_tpu.graphs.io import load_misc
    from krylov_robustness_tpu.graphs.preprocess import preprocess_unweighted
    from krylov_robustness_tpu.optimize.greedy import greedy_krylov

    backend = sys.argv[1] if len(sys.argv) > 1 else "coo"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    R = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    dataset = sys.argv[4] if len(sys.argv) > 4 else "ca-AstroPh"
    mode = sys.argv[5] if len(sys.argv) > 5 else "break"

    print(f"platform={jax.default_backend()} backend={backend} k={k} R={R} "
          f"dataset={dataset} mode={mode}", flush=True)
    try:
        A = preprocess_unweighted(load_misc(dataset))
    except Exception:
        from krylov_robustness_tpu.graphs.io import load_transport

        A = preprocess_unweighted(load_transport(dataset))
    lognrm = float(normest2_host(A, tol=1e-2))
    sigma = lognrm if lognrm > 20.0 else 0.0
    tol_abs = 1e-6 * float(np.exp(lognrm - sigma))
    cent = compute_centrality_host(A, "eig")
    print(f"n={A.shape[0]} nnz={A.nnz} sigma={sigma:.2f}", flush=True)

    t0 = time.time()
    r_fused = greedy_krylov(
        A, k=k, Q=250, centrality=cent, order="min", tol=tol_abs,
        mode=mode, dtype=jnp.float32, backend=backend, shift=sigma,
        fused_steps=R)
    t_fused = time.time() - t0
    # first block includes compile; steady-state = later blocks
    steps = np.asarray(r_fused.per_step_time)
    print(f"fused: total {t_fused:.1f}s per-step times "
          f"{[f'{t:.3f}' for t in steps]}", flush=True)
    tail = steps[R:] if len(steps) > R else steps
    print(f"fused steady-state median step: {np.median(tail)*1e3:.0f} ms",
          flush=True)

    t0 = time.time()
    r_step = greedy_krylov(
        A, k=k, Q=250, centrality=cent, order="min", tol=tol_abs,
        mode=mode, dtype=jnp.float32, backend=backend, shift=sigma)
    t_step = time.time() - t0
    s2 = np.asarray(r_step.per_step_time)
    print(f"per-step: total {t_step:.1f}s median step "
          f"{np.median(s2[1:])*1e3:.0f} ms", flush=True)
    same = np.array_equal(r_fused.edges, r_step.edges)
    print(f"picks identical: {same}")
    print(f"rob fused={r_fused.rob_variation:.6e} "
          f"step={r_step.rob_variation:.6e}")


if __name__ == "__main__":
    main()
