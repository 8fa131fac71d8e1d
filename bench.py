"""Benchmark: SpMM throughput (nnz·batch/s per chip) on the largest paper
transport network, Pallas banded kernel vs the XLA gather/scatter baseline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value        = Pallas banded-ELL SpMM effective throughput (Gnnz·b/s)
vs_baseline  = speedup over the XLA COO segment-sum SpMM (the reference-style
               implementation path) on the same graph, batch, and chip.

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

    from krylov_robustness_tpu.ops.pallas_spmm import (
        BandedEllOperator,
        rcm_permutation,
    )
    from krylov_robustness_tpu.ops.sparse import CooMatrix

    A, name = build_graph()
    n, nnz = A.shape[0], A.nnz
    perm = rcm_permutation(A)
    Ap = A[perm, :].tocsc()[:, perm].tocsr()

    b = 8
    iters = 100
    rng = np.random.default_rng(1)
    on_tpu = jax.default_backend() != "cpu"

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

    # --- Pallas banded kernel ----------------------------------------------
    if on_tpu:
        op = BandedEllOperator(Ap, dtype=jnp.float32, b_tile=8)
        halo = op.Wv * 128
        xt0 = jnp.zeros((8, op.n_lanes + 2 * halo), jnp.float32)
        xt0 = xt0.at[:, halo:halo + n].set(x0.T)

        from krylov_robustness_tpu.ops.pallas_spmm import _banded_spmm

        @jax.jit
        def chain_pallas(xt):
            def body(xt, _):
                yt = _banded_spmm(
                    op.relT, op.winT, op.valT, xt,
                    op.num_windows, op.K, op.b_tile,
                )
                xt = jnp.zeros_like(xt).at[:, halo:halo + op.n_lanes].set(
                    yt * 1e-3
                )
                return xt, ()

            return jax.lax.scan(body, xt, None, length=iters)[0]

        y = chain_pallas(xt0)
        y.block_until_ready()
        t0 = time.time()
        y = chain_pallas(xt0)
        y.block_until_ready()
        t_pallas = (time.time() - t0) / iters
    else:
        t_pallas = t_coo  # CPU: no Pallas; report parity

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
