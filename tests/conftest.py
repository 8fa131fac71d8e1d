"""Test configuration: force an 8-device virtual CPU platform so sharded code
paths (mesh/collectives) are exercised without TPU hardware.

Must run before jax initializes its backends, hence the env mutation at import
time of conftest (pytest imports conftest before test modules).
"""

import os

# Force CPU even if the ambient environment points at a TPU platform (the
# driver environment sets JAX_PLATFORMS=axon): unit tests must run locally
# on a virtual 8-device mesh. Set KRT_TEST_TPU=1 to run tests on real TPU.
if not os.environ.get("KRT_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

if not os.environ.get("KRT_TEST_TPU"):
    # The axon sitecustomize hook overrides jax_platforms via jax.config at
    # interpreter start; env alone is not enough — override it back.
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu" or os.environ.get("KRT_TEST_TPU")
