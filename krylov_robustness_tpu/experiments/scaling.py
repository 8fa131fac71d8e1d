"""Multi-device scaling-efficiency harness (BASELINE.md north-star: ≥80%
SpMM nnz/s scaling from 1 chip to a multi-chip slice).

Measures the row-sharded shard_map SpMM at mesh sizes 1..D on whatever
devices are available (real chips on a pod; virtual CPU devices under
``--xla_force_host_platform_device_count`` for CI). Reports nnz·b/s per mesh
size and efficiency vs. the single-device run scaled by D.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel.mesh import make_mesh
from ..parallel.spmm_sharded import RowShardedMatrix


def measure_sharded_spmm(A_scipy, mesh_sizes=None, b: int = 8,
                         iters: int = 50, dtype=jnp.float32,
                         layout: str = "coo"):
    """Returns {D: (seconds_per_spmm, nnz_b_per_s)}. ``layout``: the
    RowShardedMatrix local-block representation ('coo' segment-sum or
    'ell' padded column slots via the native packer)."""
    n = A_scipy.shape[0]
    nnz = A_scipy.nnz
    total = len(jax.devices())
    if mesh_sizes is None:
        mesh_sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= total]
    rng = np.random.default_rng(0)
    x_host = rng.standard_normal((n, b)).astype(np.float64)
    out = {}
    for D in mesh_sizes:
        mesh = make_mesh(D)
        M = RowShardedMatrix.from_scipy(A_scipy, mesh, dtype=dtype,
                                        layout=layout)
        x = jnp.asarray(np.pad(x_host, ((0, M.n - n), (0, 0))), dtype=dtype)
        xs = jax.device_put(x, NamedSharding(mesh, P("rows", None)))

        @jax.jit
        def chain(x):
            def body(x, _):
                return M.spmm_sharded(x) * 1e-3, ()

            return jax.lax.scan(body, x, None, length=iters)[0]

        y = chain(xs)
        y.block_until_ready()
        t0 = time.time()
        y = chain(xs)
        y.block_until_ready()
        dt = (time.time() - t0) / iters
        out[D] = (dt, nnz * b / dt)
    return out


def scaling_efficiency(results: dict) -> dict:
    """Efficiency vs linear scaling from the smallest mesh."""
    base_D = min(results)
    base_rate = results[base_D][1] / base_D
    return {D: rate / (D * base_rate) for D, (dt, rate) in results.items()}
