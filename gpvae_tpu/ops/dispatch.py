"""Device-aware backend dispatch for the backend-sensitive compute paths.

Several ops pick between a Pallas TPU kernel and an XLA/interpret fallback
(Cholesky method, triangular-solve route, Pallas ``interpret=`` flag).  The
decision must follow the devices the computation actually runs on — NOT the
process-global default backend: on an image where a TPU plugin is registered,
``jax.default_backend()`` is "tpu" even while a computation is being traced
for a CPU mesh (e.g. the multi-chip dry run over
``--xla_force_host_platform_device_count`` virtual devices), which would
compile Pallas kernels non-interpreted for CPU and fail.

``target_platform()`` is what every dispatch site keys on.  It returns the
innermost :func:`compute_on` override if one is active, else the global
default backend.  Mesh-based entry points (``parallel.mesh``) and the driver
dry run wrap their trace/execute calls in ``compute_on(...)`` so that
tracing inside ``jit`` sees the platform of the mesh's devices.
"""
from __future__ import annotations

import contextlib
import contextvars
from typing import Iterator

import jax

_OVERRIDE: contextvars.ContextVar[str | None] = contextvars.ContextVar(
    "gpvae_compute_platform", default=None
)


def platform_of(target) -> str:
    """Platform string of a Mesh, a device, an iterable of devices, or a
    platform name itself."""
    if isinstance(target, str):
        return target
    devices = getattr(target, "devices", None)  # jax.sharding.Mesh
    if devices is not None and hasattr(devices, "flat"):
        return devices.flat[0].platform
    if hasattr(target, "platform"):  # a single Device
        return target.platform
    seq = list(target)
    return seq[0].platform


def target_platform() -> str:
    """The platform the *current* computation should be compiled for."""
    override = _OVERRIDE.get()
    if override is not None:
        return override
    return jax.default_backend()


def on_tpu() -> bool:
    return target_platform() == "tpu"


@contextlib.contextmanager
def compute_on(target) -> Iterator[str]:
    """Scope under which backend-sensitive ops dispatch for ``target``
    (a platform string, Device, device list, or Mesh).

    Must be active while the computation is *traced* (i.e. wrap the jitted
    call itself — tracing happens inside the first call); already-compiled
    executions are unaffected.
    """
    platform = platform_of(target)
    token = _OVERRIDE.set(platform)
    try:
        yield platform
    finally:
        _OVERRIDE.reset(token)
