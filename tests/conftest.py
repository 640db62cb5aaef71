"""Test environment: force CPU with 8 virtual devices so multi-chip sharding
paths (shard_map over a 'data' mesh axis) are exercised without TPU hardware.

Must run before the first jax import anywhere in the test session.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The environment's axon TPU plugin re-appends itself to jax_platforms even
# when $JAX_PLATFORMS=cpu, so pin the config explicitly — tests must run on
# the 8-device virtual CPU platform.
jax.config.update("jax_platforms", "cpu")

# The default matmul precision is low (bf16-level error observed on the fp32
# dot path); parity tests compare against exact fp32 torch math.
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_path():
    """Path to the read-only reference repo (for numerical parity tests)."""
    path = "/root/reference"
    if not os.path.isdir(path):
        pytest.skip("reference repo not available")
    return path
