from gpvae_tpu.utils.profiling import (
    trace,
    StepTimer,
    cholesky_flops,
    device_memory_stats,
)
from gpvae_tpu.utils.debug import (
    assert_finite,
    check_finite,
    enable_nan_debugging,
)

__all__ = [
    "trace",
    "StepTimer",
    "cholesky_flops",
    "device_memory_stats",
    "assert_finite",
    "check_finite",
    "enable_nan_debugging",
]
