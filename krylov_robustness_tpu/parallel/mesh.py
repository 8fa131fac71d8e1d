"""Device mesh construction and sharding helpers.

The reference is single-process MATLAB (SURVEY.md §2.5: no parallel backend
whatsoever); the distributed design here is new scope. Scheme: 1-D mesh over
a ``rows`` axis; matrices row-partitioned; vectors either replicated (outer
Krylov API) or row-sharded (inner shard_map kernels); reductions via psum
over ICI. Multi-host initialization goes through ``jax.distributed``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "rows") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_mesh_2d(rows: int, batch: int,
                 axes: tuple[str, str] = ("rows", "cands")) -> Mesh:
    """2-D mesh: row partitioning × candidate/probe data parallelism
    (SURVEY.md §2.5 — DP over candidates composed with row sharding).
    Lay ``rows`` as the minor (fastest-varying) axis so the all-gather of
    x row blocks rides neighboring ICI links."""
    devs = jax.devices()[: rows * batch]
    if len(devs) < rows * batch:
        raise ValueError(f"need {rows * batch} devices, have {len(devs)}")
    return Mesh(np.array(devs).reshape(batch, rows), (axes[1], axes[0]))


def maybe_init_distributed() -> None:
    """Initialize multi-host JAX when launched under a pod launcher.

    No-op in single-process environments (tests, single chip). On TPU pod
    launchers (MEGASCALE_*) jax auto-detects everything; on generic
    launchers jax.distributed.initialize() does NOT read JAX_NUM_PROCESSES /
    JAX_PROCESS_ID from the environment (verified against the installed
    jax — it raises 'Number of processes must be defined'), so pass them
    explicitly.
    """
    import os

    env = os.environ
    if "MEGASCALE_COORDINATOR_ADDRESS" in env:
        jax.distributed.initialize()
    elif "JAX_COORDINATOR_ADDRESS" in env:
        jax.distributed.initialize(
            coordinator_address=env["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(env["JAX_NUM_PROCESSES"])
            if "JAX_NUM_PROCESSES" in env else None,
            process_id=int(env["JAX_PROCESS_ID"])
            if "JAX_PROCESS_ID" in env else None,
        )


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def row_sharded(mesh: Mesh, axis: str = "rows"):
    return NamedSharding(mesh, P(axis))
