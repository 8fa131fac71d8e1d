"""TPU probe: super-row BSR kernel vs the flat BSR kernel on Vermont b=512.

Times each variant inside one jitted scan (CLAUDE.md: remote dispatch
latency dominates otherwise) and prints a roofline table: exact HBM bytes
per SpMM (A-block stream + x-slab refetches counted from the packed index
maps + y writeback) against the v5e HBM bound, plus accuracy deltas vs the
f64 host product.

Usage: python scripts/probe_bsr_super.py [--b 512] [--iters 50]
"""

import argparse
import sys
import time

sys.path.insert(0, "/root/repo")

HBM_GBPS = 819.0  # v5e


def main():
    ap = argparse.ArgumentParser()
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
    from krylov_robustness_tpu.ops.pallas_bsr_super import (
        BLK, TILE_C, TILE_R, SuperBsrOperator,
    )
    from krylov_robustness_tpu.ops.pallas_spmm import rcm_permutation

    A = preprocess_unweighted(load_transport(args.dataset))
    perm = rcm_permutation(A)
    Ap = sp.csr_matrix(A)[perm, :].tocsc()[:, perm].tocsr()
    n, nnz = Ap.shape[0], Ap.nnz
    b = args.b
    rng = np.random.default_rng(1)
    x0 = rng.standard_normal((n, b)).astype(np.float32)
    ref = (Ap @ x0.astype(np.float64))
    refmax = np.abs(ref).max()
    print(f"{args.dataset}: n={n} nnz={nnz} b={b} backend={jax.default_backend()}",
          flush=True)

    iters = args.iters

    # op rides as a pytree ARGUMENT: closing over it would embed the tile
    # array as an HLO constant and blow the remote compile server's request
    # size limit (HTTP 413) at Vermont scale.
    @jax.jit
    def chain(op, x):
        def body(x, _):
            return (op @ x)[: x.shape[0]] * 1e-3, ()

        return jax.lax.scan(body, x, None, length=iters)[0]

    def timed(op, tag):
        xp = jnp.zeros((op.n_pad, b), jnp.float32).at[:n].set(jnp.asarray(x0))
        # accuracy: single application
        y1 = np.asarray(op @ jnp.asarray(x0))
        acc = np.abs(y1 - ref).max() / refmax
        y = chain(op, xp)
        y.block_until_ready()
        t0 = time.time()
        y = chain(op, xp)
        y.block_until_ready()
        dt = (time.time() - t0) / iters
        return dt, acc

    results = {}

    # flat BSR (round-1 kernel), HIGHEST
    op0 = BsrOperator(Ap, dtype=jnp.float32)
    a_bytes0 = op0.nblocks * BLK * BLK * 4
    x_bytes0 = op0.nblocks * BLK * b * 4  # cb changes every step within a row
    y_bytes0 = op0.n_pad * b * 4
    dt, acc = timed(op0, "flat-f32")
    results["flat_f32_highest"] = (dt, acc, a_bytes0 + x_bytes0 + y_bytes0)

    for mode, (tr, tc) in (
        ("f32", (512, 512)), ("bf16x3", (512, 512)), ("bf16x2", (512, 512)),
        ("bf16x3", (512, 128)), ("bf16x2", (512, 128)),
        ("bf16x3", (1024, 128)), ("bf16x3", (512, 256)),
        ("bf16x3", (256, 128)),
    ):
        op = SuperBsrOperator(Ap, dtype=jnp.float32, mode=mode, tile=(tr, tc))
        slab = np.asarray(op.meta[0])
        switches = 1 + int(np.sum(slab[1:] != slab[:-1]))
        itemsize = 2 if mode.startswith("bf16x") else 4
        terms = int(mode[-1]) if mode.startswith("bf16x") else 1
        xw = 2 * terms if mode.startswith("bf16x") else 4
        a_bytes = op.ntiles * tr * tc * itemsize
        x_bytes = switches * tc * b * xw
        y_bytes = op.n_pad * b * 4
        dt, acc = timed(op, f"super-{mode}")
        results[f"{mode}_{tr}x{tc}_t{op.ntiles}"] = (dt, acc,
                                                     a_bytes + x_bytes + y_bytes)

    print(f"{'variant':<20}{'ms':>9}{'Gnnzb/s':>10}{'rel err':>12}"
          f"{'MB/spmm':>10}{'bound ms':>10}{'% of SoL':>9}")
    for tag, (dt, acc, byt) in results.items():
        bound = byt / (HBM_GBPS * 1e9)
        print(f"{tag:<20}{dt*1e3:>9.3f}{nnz*b/dt/1e9:>10.2f}{acc:>12.2e}"
              f"{byt/1e6:>10.1f}{bound*1e3:>10.3f}{100*bound/dt:>9.1f}")


if __name__ == "__main__":
    main()
