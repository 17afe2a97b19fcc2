"""Test environment: run on a virtual 8-device CPU mesh.

Must run before any module imports jax — pytest imports conftest first.
Multi-chip sharding is validated on host devices
(xla_force_host_platform_device_count); real-TPU behavior is exercised by
bench.py / the driver.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The axon site hook (PYTHONPATH=/root/.axon_site) forces JAX_PLATFORMS=axon
# regardless of the env var, so pin the platform via the config API too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
