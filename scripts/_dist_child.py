"""Child process for the 2-process jax.distributed smoke test
(tests/test_distributed_smoke.py). Each process owns one CPU device;
after ``maybe_init_distributed`` the global mesh has 2 devices and a psum
across them must see both processes' contributions."""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"

import jax  # noqa: E402

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


if __name__ == "__main__":
    main()
