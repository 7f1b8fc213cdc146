"""Driver-environment reproduction of the multi-chip dry run.

Round-1 regression: ``dryrun_multichip`` passed under the test suite (whose
conftest force-sets ``jax_platforms=cpu``) but FAILED in the driver
environment, where the image's sitecustomize registers a TPU plugin and
``jax.default_backend()`` is "tpu" while the mesh computation runs on
virtual CPU devices (VERDICT.md round 1, weak #1).  This test launches the
dry run exactly as the driver does — a fresh process, NO JAX_PLATFORMS
override, only XLA_FLAGS — so the in-entry-point platform forcing and the
device-aware op dispatch (gpvae_tpu.ops.dispatch) are what make it pass.
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dryrun_multichip_driver_style():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # the driver does not set it
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    ).strip()
    proc = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=560,
    )
    assert proc.returncode == 0, (
        f"dryrun failed (rc={proc.returncode})\n"
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-4000:]}"
    )
    assert "orbax roundtrip ok" in proc.stdout
