#!/usr/bin/env python
"""Real-chip validation of the sharded-BSR lane (VERDICT r4 item 2 'done'
criterion): BsrRowShardedMatrix on a 1-device mesh must match the plain
SuperBsrOperator throughput within ~10% — the shard_map + all_gather
wrapper and the per-shard tile pack must not tax the kernel. Vermont,
b=512, same protocol as bench.py (unique inputs, jitted scan chain)."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import scipy.sparse as sp

    from krylov_robustness_tpu.graphs.io import load_transport
    from krylov_robustness_tpu.graphs.preprocess import preprocess_unweighted
    from krylov_robustness_tpu.ops.pallas_bsr_super import SuperBsrOperator
    from krylov_robustness_tpu.ops.pallas_spmm import rcm_permutation
    from krylov_robustness_tpu.parallel.mesh import make_mesh
    from krylov_robustness_tpu.parallel.spmm_sharded import BsrRowShardedMatrix

    print(f"platform={jax.default_backend()}", flush=True)
    A = preprocess_unweighted(load_transport("Vermont"))
    n, nnz = A.shape[0], A.nnz
    perm = rcm_permutation(A)
    Ap = sp.csr_matrix(A)[perm, :].tocsc()[:, perm].tocsr()
    b = 512
    iters = 50
    rng = np.random.default_rng(1)
    x0 = rng.standard_normal((n, b)).astype(np.float32)
    ref = Ap @ x0.astype(np.float64)
    refmax = np.abs(ref).max()

    def timed(op, tag, n_pad):
        @jax.jit
        def chain(op, x):
            def body(x, _):
                return (op @ x)[: x.shape[0]] * 1e-3, ()

            y = jax.lax.scan(body, x, None, length=iters)[0]
            return jnp.sum(y)

        xp = jnp.zeros((n_pad, b), jnp.float32).at[:n].set(jnp.asarray(x0))
        acc = float(np.abs(np.asarray(op @ jnp.asarray(x0)) - ref).max()
                    / refmax)
        t0 = time.time()
        float(np.asarray(chain(op, xp)))
        t_c = time.time() - t0
        best = 1e9
        for i in range(3):
            xi = xp + np.float32(1e-6 * (i + 1))
            t0 = time.time()
            float(np.asarray(chain(op, xi)))
            best = min(best, (time.time() - t0) / iters)
        rate = nnz * b / best / 1e9
        print(f"{tag:24s} {best*1e3:8.3f} ms  {rate:6.2f} Gnnzb/s  "
              f"rel_err {acc:.2e}  (compile+warm {t_c:.0f}s)", flush=True)
        return best

    plain = SuperBsrOperator(Ap, dtype=jnp.float32, mode="bf16x2",
                             tile=(512, 256))
    t_plain = timed(plain, "super_plain_bf16x2", plain.n_pad)

    mesh = make_mesh(1)
    sh = BsrRowShardedMatrix.from_scipy(Ap, mesh, dtype=jnp.float32,
                                        tile=(512, 256), mode="bf16x2")
    t_sh = timed(sh, "sharded_bsr_1dev_mesh", sh.n)
    print(f"sharded/plain ratio: {t_sh / t_plain:.3f} "
          f"(criterion: within ~10%)")


if __name__ == "__main__":
    main()
