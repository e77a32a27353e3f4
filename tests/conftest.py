"""Test configuration.

Unit tests run JAX on CPU with 8 virtual devices so sharding/mesh tests
exercise real multi-device semantics without TPU hardware (the driver
validates the TPU path separately via __graft_entry__.dryrun_multichip).

This container injects a TPU PJRT plugin ("axon") through sitecustomize at
interpreter start whenever PALLAS_AXON_POOL_IPS is set; once registered, any
JAX backend init blocks on the TPU tunnel even when JAX_PLATFORMS=cpu.  The
sitecustomize hook runs before pytest imports this file, so the only clean
escape is to re-exec pytest once with a sanitized environment.
"""

import os
import sys

_SENTINEL = "PACTPU_TEST_REEXEC"

if os.environ.get("PALLAS_AXON_POOL_IPS") and os.environ.get(_SENTINEL) != "1":
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env[_SENTINEL] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


REFERENCE = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")
