"""Test harness: force the 8-device virtual CPU platform.

The driver environment pre-imports JAX via sitecustomize with
JAX_PLATFORMS=axon (the real TPU), so plain env vars here are too late; we go
through jax.config, which takes effect as long as no backend has been used
yet. Multi-chip sharding paths are validated on this virtual mesh; the driver
separately dry-runs them, and benchmarks run on the real TPU.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", False)
# Keep f32 matmuls exactly f32 even if something lands on a TPU backend.
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_sessionstart(session):
    devs = jax.devices()
    assert devs[0].platform == "cpu", f"tests must run on CPU, got {devs[0]}"
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
