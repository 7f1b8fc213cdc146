"""Same-process A/B: toy headline with dense_precision highest vs default.

VERDICT r4 weak #1: BENCH_r03 measured 8,611 toy steps/s, BENCH_r04
7,800 — a 9.4% drop exceeding the documented ±5-8% process spread, and
round 4 changed exactly one thing in that hot path
(``dense_precision="highest"`` by default, models.py).  BASELINE.md
asserted "toy headline unchanged" without an artifact.  This script IS
the artifact: both arms run interleaved in ONE process (A B A B ...),
under the saturated ruler (bench.time_train), so process-to-process
spread cancels and the residual difference is the precision cost.

Usage: python benchmarks/ab_dense_precision.py [n_pairs]
"""
from __future__ import annotations

import json
import statistics
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def time_toy(dense_precision: str, n_stack: int = 256,
             n_rounds: int = 12) -> float:
    """bench.time_train's toy workload with the precision forced."""
    import jax
    import jax.numpy as jnp
    import optax

    from bench import _toy_arrays, timed_median
    from gpvae_tpu import elbo as elbo_lib
    from gpvae_tpu.models import GPVAE, GPVAEConfig
    from gpvae_tpu.train import TrainConfig, TrainState, create_train_state

    cfg = GPVAEConfig(
        latent_dim=2, obs_dim=15, time_len=45,
        prior="gp", posterior="gp",
        prior_lengthscales=(9.0, 3.0), posterior_lengthscales=(9.0, 3.0),
        encoder="dense", decoder="dense",
        dense_precision=dense_precision,
    )
    model = GPVAE(cfg)
    x, times, mask = _toy_arrays(45, 20, n_stack)
    batch0 = {"x": x[0], "times": times[0], "mask": mask[0]}
    state, tx = create_train_state(model, batch0, TrainConfig())
    sched = elbo_lib.BetaSchedule()

    def one_step(state, b):
        rng_key, sample_key = jax.random.split(state.rng)
        beta = sched(state.step)

        def loss_fn(params):
            out = model.apply(
                {"params": params}, b["x"], b["times"], b["mask"],
                beta=beta, rngs={"sample": sample_key},
            )
            return out.loss

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return TrainState(
            params=optax.apply_updates(state.params, updates),
            opt_state=opt_state, step=state.step + 1, rng=rng_key,
        ), loss

    @jax.jit
    def run_chunk(state, xs):
        state, losses = jax.lax.scan(one_step, state, xs)
        return state, losses[-1]

    stacked = {"x": jnp.asarray(x), "times": jnp.asarray(times),
               "mask": jnp.asarray(mask)}
    state, loss = run_chunk(state, stacked)
    assert np.isfinite(float(loss))
    box = {"state": state}

    def run_once():
        box["state"], loss = run_chunk(box["state"], stacked)
        return loss

    dt = timed_median(run_once, n_rounds)
    return n_stack / dt


def main():
    n_pairs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    highest, default = [], []
    for i in range(n_pairs):
        highest.append(time_toy("highest"))
        default.append(time_toy("default"))
        print(f"pair {i}: highest={highest[-1]:.0f} "
              f"default={default[-1]:.0f} steps/s", flush=True)
    h, d = statistics.median(highest), statistics.median(default)
    print(json.dumps({
        "highest_steps_per_sec": h,
        "default_steps_per_sec": d,
        "highest_all": highest,
        "default_all": default,
        "highest_over_default": h / d,
    }))


if __name__ == "__main__":
    main()
