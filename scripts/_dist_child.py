"""Child process for the 2-process jax.distributed smoke test
(tests/test_distributed_smoke.py). Each process owns one CPU device;
after ``maybe_init_distributed`` the global mesh has 2 devices and a psum
across them must see both processes' contributions."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)  # f64 SpMM check below

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from krylov_robustness_tpu.parallel.mesh import (  # noqa: E402
    make_mesh,
    maybe_init_distributed,
)


def main():
    maybe_init_distributed()
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 2, jax.devices()

    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh()

    @jax.jit
    def allsum(x):
        return shard_map(
            lambda v: jax.lax.psum(v, "rows"), mesh=mesh,
            in_specs=P("rows"), out_specs=P(),
        )(x)

    pid = jax.process_index()
    local = jnp.asarray([float(pid + 1)])  # process 0 → 1.0, process 1 → 2.0
    glob = jax.make_array_from_process_local_data(
        jax.NamedSharding(mesh, P("rows")), local, (2,)
    )
    # out_specs=P() replicates the psum result: read the local shard
    total = float(jax.device_get(allsum(glob).addressable_data(0))[0])
    assert total == 3.0, total  # saw both processes' rows
    print(f"proc {pid}: psum over 2-process mesh ok ({total})")

    # real sharded SpMM across the two PROCESSES (the DCN-analog path of
    # SURVEY.md §5.8, one step up from the psum smoke): row-partitioned
    # operator, all_gather(x) crossing the process boundary, each process
    # checks its own row shard against scipy
    import numpy as np
    import scipy.sparse as sp

    from krylov_robustness_tpu.parallel.spmm_sharded import RowShardedMatrix

    rng = np.random.default_rng(7)  # same graph on both processes
    n = 64
    A = sp.random(n, n, density=0.08, random_state=3, format="csr")
    A = ((A + A.T) > 0).astype(np.float64)
    A.setdiag(0)
    A.eliminate_zeros()
    A = sp.csr_matrix(A)
    S = RowShardedMatrix.from_scipy(A, mesh, dtype=jnp.float64)
    x = rng.standard_normal((n, 3))
    y = S @ jnp.asarray(x)
    ref = A @ x
    rps = n // 2
    mine = np.asarray(jax.device_get(y.addressable_data(0)))
    want = ref[pid * rps:(pid + 1) * rps]
    err = float(np.abs(mine - want).max())
    assert err < 1e-12, err
    print(f"proc {pid}: 2-process row-sharded SpMM ok (max err {err:.1e})")


if __name__ == "__main__":
    main()
