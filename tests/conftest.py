"""Test configuration.

Unit tests run JAX on CPU with 8 virtual devices so sharding/mesh tests
exercise real multi-device semantics without TPU hardware (the driver
validates the TPU path separately via __graft_entry__.dryrun_multichip).

This container injects a TPU PJRT plugin ("axon") through sitecustomize at
interpreter start whenever PALLAS_AXON_POOL_IPS is set; register() forces
jax_platforms to "axon".  Backends initialize lazily, so overriding the
config back to CPU here (before any jax.devices()/jit call) is sufficient —
and unlike an os.execve re-exec it does not orphan pytest's fd-level
capture (which would silently swallow all test output).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


REFERENCE = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")
