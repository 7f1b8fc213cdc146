"""Test env: CPU backend with 8 virtual devices (the standard JAX answer to
testing multi-chip sharding without a cluster) and fp64 enabled for oracles.

The image's sitecustomize registers the axon TPU plugin and force-sets
``jax_platforms``; backends are still uninitialized when conftest runs, so a
config update here wins.  Pallas kernels auto-detect the CPU backend and run
in interpreter mode.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def pytest_report_header(config):
    return (
        f"jax backend: {jax.default_backend()}, "
        f"devices: {len(jax.devices())}"
    )
