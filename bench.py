"""Benchmark: SpMM throughput (nnz·batch/s per chip) on the largest paper
transport network at the batch width the greedy scorer actually consumes
(2·Q ≈ 512 Lanczos columns, ``krylov_miobi.m:76-125`` batched), best Pallas
kernel (BSR 128x128 MXU; see ops/pallas_bsr.py) vs the XLA COO segment-sum
SpMM (the reference-style implementation path) on the same graph and chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value        = Pallas SpMM effective throughput (Gnnz·b/s)
vs_baseline  = speedup over the XLA COO SpMM.

Runs on whatever backend jax selects (TPU under the driver; CPU fallback
works but is slow). Everything is measured inside one jitted scan so remote
dispatch latency is excluded — matching how the kernels are consumed by the
Krylov loops.
"""

import json
import sys
import time

import numpy as np


def build_graph():
    """Vermont (largest paper graph) when datasets are reachable, else a
    synthetic banded road-network stand-in of the same scale."""
    import scipy.sparse as sp

    try:
        sys.path.insert(0, "/root/repo")
        from krylov_robustness_tpu.graphs.io import load_transport
        from krylov_robustness_tpu.graphs.preprocess import preprocess_unweighted

        A = preprocess_unweighted(load_transport("Vermont"))
        return A, "Vermont"
    except Exception:
        rng = np.random.default_rng(0)
        n = 95672
        i = np.arange(n - 2)
        src = np.concatenate([i, i, rng.integers(0, n - 301, 15000)])
        off = np.concatenate(
            [np.full(n - 2, 1), np.full(n - 2, 2), rng.integers(1, 300, 15000)]
        )
        A = sp.coo_matrix((np.ones(len(src)), (src, src + off)), shape=(n, n))
        A = ((A + A.T) > 0).astype(np.float32)
        A.setdiag(0)
        A = sp.csr_matrix(A)
        A.eliminate_zeros()
        return A, "synthetic-road"


def main():
    import jax

    # Persistent compile cache: remote TPU compiles take minutes; cache them
    # across bench invocations.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import scipy.sparse as sp

    from krylov_robustness_tpu.ops.pallas_bsr import _bsr_spmm, make_bsr_operator
    from krylov_robustness_tpu.ops.sparse import CooMatrix

    A, name = build_graph()
    n, nnz = A.shape[0], A.nnz

    b = 512
    iters = 50
    rng = np.random.default_rng(1)
    on_tpu = jax.default_backend() != "cpu"

    op, perm = make_bsr_operator(A, dtype=jnp.float32)
    Ap = sp.csr_matrix(A)[perm, :].tocsc()[:, perm].tocsr()

    # --- XLA COO baseline (in-jit chain) -----------------------------------
    coo = CooMatrix.from_scipy(Ap, dtype=jnp.float32)
    x0 = jnp.asarray(rng.standard_normal((n, b)).astype(np.float32))

    @jax.jit
    def chain_coo(x):
        def body(x, _):
            return (coo @ x) * 1e-3, ()

        return jax.lax.scan(body, x, None, length=iters)[0]

    y = chain_coo(x0)
    y.block_until_ready()
    t0 = time.time()
    y = chain_coo(x0)
    y.block_until_ready()
    t_coo = (time.time() - t0) / iters

    # --- Pallas BSR MXU kernel ----------------------------------------------
    if on_tpu and hasattr(op, "ablocks"):
        xp = jnp.zeros((op.n_pad, b), jnp.float32).at[:n].set(x0)

        @jax.jit
        def chain_bsr(x):
            def body(x, _):
                y = _bsr_spmm(op.cb, op.rb, op.first, op.ablocks, x)
                return y * 1e-3, ()

            return jax.lax.scan(body, x, None, length=iters)[0]

        y = chain_bsr(xp)
        y.block_until_ready()
        t0 = time.time()
        y = chain_bsr(xp)
        y.block_until_ready()
        t_pallas = (time.time() - t0) / iters
    else:
        t_pallas = t_coo  # CPU (or BSR fallback): no Pallas; report parity

    value = nnz * b / t_pallas / 1e9
    print(
        json.dumps(
            {
                "metric": f"spmm_throughput_{name}_b{b}",
                "value": round(value, 3),
                "unit": "Gnnzb/s",
                "vs_baseline": round(t_coo / t_pallas, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
