"""Multi-step training chunks (steps_per_call) match single-step numerics."""
import numpy as np
import jax

from gpvae_tpu import elbo as elbo_lib, train as train_lib
from gpvae_tpu.data import Batcher, generate_toy_data, toy_to_masked_batch
from gpvae_tpu.models import GPVAE, GPVAEConfig


def setup(seed=0):
    data = generate_toy_data(jax.random.key(0), 8, t=10)
    batch = toy_to_masked_batch({k: np.asarray(v) for k, v in data.items()})
    cfg = GPVAEConfig(
        latent_dim=2, obs_dim=15, time_len=10,
        prior="gp", posterior="gp",
        prior_lengthscales=(9.0, 3.0), posterior_lengthscales=(9.0, 3.0),
    )
    return GPVAE(cfg), batch


def _drain(batcher):
    """Plain generator wrapper: hides the Batcher type so fit() takes the
    host-staged stacked path instead of the device-resident sampled one."""
    while True:
        yield next(batcher)


def test_multistep_matches_single_step():
    model, batch = setup()
    common = dict(learning_rate=1e-3, num_steps=12, log_every=4,
                  beta=elbo_lib.BetaSchedule(init=1e-3, rate=0.0))

    s1, log1 = train_lib.fit(
        model, iter(Batcher(batch, 4, seed=7)),
        train_lib.TrainConfig(**common), verbose=False,
    )
    s2, log2 = train_lib.fit(
        model, _drain(Batcher(batch, 4, seed=7)),
        train_lib.TrainConfig(**common, steps_per_call=4), verbose=False,
    )
    assert int(s1.step) == int(s2.step) == 12
    # same batch order + same PRNG stream -> identical final params
    p1 = jax.tree_util.tree_leaves(s1.params)
    p2 = jax.tree_util.tree_leaves(s2.params)
    for a, b in zip(p1, p2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7
        )
    # logged losses at matching steps agree
    by_step1 = {r["step"]: r["loss"] for r in log1.rows}
    by_step2 = {r["step"]: r["loss"] for r in log2.rows}
    for s in set(by_step1) & set(by_step2):
        np.testing.assert_allclose(by_step1[s], by_step2[s], rtol=2e-4)


def test_sampled_multistep_matches_single_step_trajectory():
    """The device-resident sampled path sees the exact same batch order and
    PRNG stream; its compiled program differs (gather fused into the scan),
    so parity is at loss-trajectory level, not bitwise — under Adam any
    1-ulp gradient difference grows to ~lr-scale parameter differences
    within a few steps (sign-normalized updates)."""
    model, batch = setup()
    common = dict(learning_rate=1e-3, num_steps=12, log_every=4,
                  beta=elbo_lib.BetaSchedule(init=1e-3, rate=0.0))

    s1, log1 = train_lib.fit(
        model, iter(Batcher(batch, 4, seed=7)),
        train_lib.TrainConfig(**common), verbose=False,
    )
    # a Batcher instance triggers the sampled path when steps_per_call > 1
    s2, log2 = train_lib.fit(
        model, Batcher(batch, 4, seed=7),
        train_lib.TrainConfig(**common, steps_per_call=4), verbose=False,
    )
    assert int(s1.step) == int(s2.step) == 12
    by_step1 = {r["step"]: r["loss"] for r in log1.rows}
    by_step2 = {r["step"]: r["loss"] for r in log2.rows}
    assert set(by_step1) == set(by_step2)
    for s in by_step1:
        np.testing.assert_allclose(by_step1[s], by_step2[s], rtol=5e-2)


def test_multistep_checkpointing(tmp_path):
    model, batch = setup()
    cfg = train_lib.TrainConfig(
        num_steps=12, log_every=4, steps_per_call=4,
        checkpoint_every=8, checkpoint_dir=str(tmp_path / "ck"),
    )
    state, _ = train_lib.fit(
        model, iter(Batcher(batch, 4)), cfg, verbose=False
    )
    assert int(state.step) == 12
    cfg2 = train_lib.TrainConfig(
        num_steps=20, log_every=4, steps_per_call=4,
        checkpoint_every=8, checkpoint_dir=str(tmp_path / "ck"),
    )
    state2, _ = train_lib.fit(
        model, iter(Batcher(batch, 4)), cfg2, verbose=False
    )
    assert int(state2.step) == 20
