"""One data-parallel T=1024 train step over an 8-device virtual CPU mesh.

Run as a subprocess by bench.time_dp_step_virtual_mesh (the parent process's
backend is pinned to the TPU).  Forces the CPU platform the same way
tests/conftest.py does (env alone is overridden by the image's
sitecustomize), builds the ``dp_scale`` preset's model at shape with a
batch of 16 over 8 virtual devices, and prints one JSON line with the
median post-compile step time.
"""
import json
import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    from gpvae_tpu import configs, elbo as elbo_lib
    from gpvae_tpu.models import GPVAE
    from gpvae_tpu.parallel import (
        make_mesh, make_parallel_train_step, replicate, shard_batch,
    )
    from gpvae_tpu.train import TrainConfig, create_train_state
    import optax  # noqa: F401

    assert len(jax.devices()) == 8, jax.devices()
    preset = configs.get("dp_scale")
    cfg = preset.model
    t = cfg.time_len
    b = 16
    model = GPVAE(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "x": (rng.random((b, t, 15)) < 0.4).astype(np.float32),
        "times": np.broadcast_to(
            np.arange(t, dtype=np.float32) * (60.0 / t), (b, t)
        ).copy(),
        "mask": np.ones((b, t), bool),
    }
    state, tx = create_train_state(model, batch, TrainConfig())
    sched = elbo_lib.BetaSchedule()
    mesh = make_mesh(8)
    pstep = make_parallel_train_step(model, tx, sched, mesh)
    state = replicate(state, mesh)
    sharded = shard_batch(batch, mesh)
    state, metrics = pstep(state, sharded)          # compile + step 1
    jax.block_until_ready(metrics["loss"])
    assert np.isfinite(float(metrics["loss"]))
    samples = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, metrics = pstep(state, sharded)
        jax.block_until_ready(metrics["loss"])
        samples.append(time.perf_counter() - t0)
    print(json.dumps({
        "dp_step_seconds": statistics.median(samples),
        "devices": 8, "global_batch": b, "t": t,
    }))


if __name__ == "__main__":
    main()
