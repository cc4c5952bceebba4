"""Test configuration: force CPU with 8 virtual devices and float64 support.

Multi-chip sharding tests run on a virtual 8-device CPU mesh
(xla_force_host_platform_device_count); parity tests use float64 to compare
against the NumPy oracle. Must run before jax initializes a backend.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The container's sitecustomize pins jax_platforms to the axon TPU plugin;
# the env var alone does not win, so force CPU at the config level.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
