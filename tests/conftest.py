"""Test harness: force an 8-device virtual CPU platform before JAX loads.

Multi-chip sharding paths are validated on this virtual mesh; the driver
separately dry-runs them, and benchmarks run on the real TPU.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
