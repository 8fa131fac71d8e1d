"""Probe: BSR MXU SpMM precision modes on the real chip.

Measures, for jax.lax.Precision {HIGHEST, HIGH, DEFAULT} on Vermont at the
greedy scorer's batch width: per-SpMM wall time (inside one jitted scan, per
repo convention) and relative accuracy of a single SpMM vs the f64 host
product. Decides whether HIGH (bf16_3x — adjacency values are bf16-exact,
only x rounds) can replace HIGHEST on the hot path.
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

    from krylov_robustness_tpu.graphs.io import load_transport
    from krylov_robustness_tpu.graphs.preprocess import preprocess_unweighted
    from krylov_robustness_tpu.ops.pallas_bsr import _bsr_spmm, make_bsr_operator

    A = preprocess_unweighted(load_transport("Vermont"))
    n = A.shape[0]
    op, perm = make_bsr_operator(A, dtype=jnp.float32)
    import scipy.sparse as sp

    Ap = sp.csr_matrix(A)[perm, :].tocsc()[:, perm].tocsr()
    b, iters = 512, 50
    rng = np.random.default_rng(1)
    x = rng.standard_normal((n, b)).astype(np.float32)
    y_ref = (Ap.astype(np.float64) @ x.astype(np.float64))
    xp = jnp.zeros((op.n_pad, b), jnp.float32).at[:n].set(jnp.asarray(x))

    for prec in ["highest", "high", "default"]:
        p = dict(highest=jax.lax.Precision.HIGHEST,
                 high=jax.lax.Precision.HIGH,
                 default=jax.lax.Precision.DEFAULT)[prec]

        @jax.jit
        def chain(xin, p=p):
            def body(xc, _):
                return _bsr_spmm(op.cb, op.rb, op.first, op.ablocks, xc,
                                 precision=p) * 1e-3, ()

            return jax.lax.scan(body, xin, None, length=iters)[0]

        y1 = _bsr_spmm(op.cb, op.rb, op.first, op.ablocks, xp, precision=p)
        err = float(np.linalg.norm(np.asarray(y1)[:n] - y_ref) /
                    np.linalg.norm(y_ref))
        yc = chain(xp)
        yc.block_until_ready()
        t0 = time.time()
        yc = chain(xp)
        yc.block_until_ready()
        dt = (time.time() - t0) / iters
        print(f"{prec:8s}  t={dt * 1e3:7.3f} ms/SpMM  "
              f"thr={A.nnz * b / dt / 1e9:7.2f} Gnnzb/s  rel_err={err:.3e}",
              flush=True)


if __name__ == "__main__":
    main()
