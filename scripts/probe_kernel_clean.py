"""Clean-chip kernel probe for the remote-TPU tunnel.

Measurement rules learned the hard way (all enforced here):
- ``block_until_ready`` does not reliably round-trip the relay: force
  completion by returning a jitted SCALAR (sum of the chain output) and
  ``np.asarray``-ing it — fetching a program's own output waits for it.
- Identical (executable, inputs) calls can be served instantly; every
  timed call uses a unique input.
- Avoid eager ops (``float(x[0,0])`` on a fresh array compiles a one-off
  program through the remote compile server, ~minutes).
- Optionally SIGSTOP a competing PID (the golden-suite queue) around the
  timed region only.

Usage: python scripts/probe_kernel_clean.py [--pause-pid PID] [--b 512]
"""

import argparse
import os
import signal
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pause-pid", type=int, default=0)
    ap.add_argument("--b", type=int, default=512)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--dataset", default="Vermont")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    import scipy.sparse as sp

    from krylov_robustness_tpu.graphs.io import load_transport
    from krylov_robustness_tpu.graphs.preprocess import preprocess_unweighted
    from krylov_robustness_tpu.ops.pallas_bsr import BsrOperator
    from krylov_robustness_tpu.ops.pallas_bsr_super import SuperBsrOperator
    from krylov_robustness_tpu.ops.pallas_spmm import rcm_permutation
    from krylov_robustness_tpu.ops.sparse import CooMatrix

    A = preprocess_unweighted(load_transport(args.dataset))
    perm = rcm_permutation(A)
    Ap = sp.csr_matrix(A)[perm, :].tocsc()[:, perm].tocsr()
    n, nnz, b, iters = Ap.shape[0], Ap.nnz, args.b, args.iters
    rng = np.random.default_rng(1)
    x0 = rng.standard_normal((n, b)).astype(np.float32)

    @jax.jit
    def chain(op, x):
        def body(x, _):
            return (op @ x)[: x.shape[0]] * 1e-3, ()

        y = jax.lax.scan(body, x, None, length=iters)[0]
        return jnp.sum(y)  # scalar output: np.asarray forces execution

    # calibration chains (dense matmul + memory stream) share the rules
    M0 = jnp.asarray(rng.standard_normal((8192, 8192)).astype(np.float32)
                     ).astype(jnp.bfloat16)

    @jax.jit
    def mm_chain(a):
        def body(x, _):
            return (jnp.dot(x, a, preferred_element_type=jnp.bfloat16)
                    * jnp.bfloat16(1e-2)), ()

        return jnp.sum(jax.lax.scan(body, a, None, length=10)[0]
                       .astype(jnp.float32))

    ops = [
        ("xla_coo", CooMatrix.from_scipy(Ap, dtype=jnp.float32)),
        ("flat_f32", BsrOperator(Ap, dtype=jnp.float32)),
        ("bf16x2_512x128", SuperBsrOperator(Ap, dtype=jnp.float32,
                                            mode="bf16x2", tile=(512, 128))),
        ("bf16x3_512x128", SuperBsrOperator(Ap, dtype=jnp.float32,
                                            mode="bf16x3", tile=(512, 128))),
        ("bf16x3_512x512", SuperBsrOperator(Ap, dtype=jnp.float32,
                                            mode="bf16x3", tile=(512, 512))),
    ]
    pads = {tag: getattr(op, "n_pad", n) for tag, op in ops}
    xs = {tag: jnp.zeros((pads[tag], b), jnp.float32).at[:n].set(
        jnp.asarray(x0)) for tag, op in ops}

    # warmup/compile everything BEFORE pausing the competitor
    print("warmup/compile...", flush=True)
    float(np.asarray(mm_chain(M0)))
    for tag, op in ops:
        float(np.asarray(chain(op, xs[tag])))
        print(f"  {tag} compiled", flush=True)

    if args.pause_pid:
        os.kill(args.pause_pid, signal.SIGSTOP)
        print(f"paused pid {args.pause_pid}", flush=True)
    try:
        best = 1e9
        for i in range(3):
            t0 = time.time()
            float(np.asarray(mm_chain(M0 + jnp.bfloat16(i + 1))))
            best = min(best, (time.time() - t0) / 10)
        print(f"calib dense bf16 8192 matmul: {best*1e3:8.2f} ms "
              f"-> {2*8192**3/best/1e12:6.0f} TFLOP/s (peak 197)", flush=True)
        for tag, op in ops:
            best = 1e9
            for i in range(3):
                xi = xs[tag] + np.float32(1e-6 * (i + 1))
                t0 = time.time()
                float(np.asarray(chain(op, xi)))
                best = min(best, (time.time() - t0) / iters)
            print(f"{tag:<18} {best*1e3:8.3f} ms {nnz*b/best/1e9:8.2f} Gnnzb/s",
                  flush=True)
    finally:
        if args.pause_pid:
            os.kill(args.pause_pid, signal.SIGCONT)
            print(f"resumed pid {args.pause_pid}", flush=True)


if __name__ == "__main__":
    main()
