"""Training: jitted step runs, overfit-on-tiny-subset sanity check (the
reference author's own verification practice, SURVEY.md §4.3), checkpoint
save/resume roundtrip."""
import numpy as np
import jax
import pytest

from gpvae_tpu import configs, elbo as elbo_lib, train as train_lib
from gpvae_tpu.data import Batcher, generate_toy_data, toy_to_masked_batch
from gpvae_tpu.models import GPVAE, GPVAEConfig


def small_toy_setup(num_seqs=8, t=12, batch_size=4):
    data = generate_toy_data(jax.random.key(0), num_seqs, t=t)
    batch = toy_to_masked_batch({k: np.asarray(v) for k, v in data.items()})
    cfg = GPVAEConfig(
        latent_dim=2, obs_dim=15, time_len=t,
        prior="gp", posterior="gp",
        prior_lengthscales=(9.0, 3.0), posterior_lengthscales=(9.0, 3.0),
    )
    return GPVAE(cfg), Batcher(batch, batch_size), batch


def test_overfit_two_batches_loss_decreases():
    """Reference practice: train on a tiny fixed subset 'to show that the
    net works' (src/Models/Full_GP_VAE_fixed_for_MovMnist.py:326-327)."""
    # one fixed batch of 4 sequences, so every step sees the same data
    model, batches, _ = small_toy_setup(num_seqs=4, batch_size=4)
    config = train_lib.TrainConfig(
        learning_rate=3e-3, num_steps=400,
        beta=elbo_lib.BetaSchedule(init=1e-3, rate=0.0),
        log_every=50,
    )
    state, log = train_lib.fit(
        model, iter(batches), config, verbose=False
    )
    losses = [r["loss"] for r in log.rows]
    assert len(losses) >= 4
    assert losses[-1] < losses[0] * 0.8, losses
    assert np.isfinite(losses).all()


def test_lengthscales_are_observable_and_move():
    model, batches, _ = small_toy_setup()
    config = train_lib.TrainConfig(
        learning_rate=5e-3, num_steps=60,
        beta=elbo_lib.BetaSchedule(init=1.0, rate=0.0), log_every=30,
    )
    state, log = train_lib.fit(model, iter(batches), config, verbose=False)
    assert "lengthscale_posterior" in log.rows[-1]
    ls0 = np.asarray(log.rows[0]["lengthscale_posterior"])
    ls1 = np.asarray(log.rows[-1]["lengthscale_posterior"])
    assert not np.allclose(ls0, ls1)
    assert np.all(ls1 > 0)  # log-parameterization keeps them positive


def test_checkpoint_resume_roundtrip(tmp_path):
    model, batches, _ = small_toy_setup()
    config = train_lib.TrainConfig(
        learning_rate=1e-3, num_steps=20, log_every=10,
        checkpoint_every=10, checkpoint_dir=str(tmp_path / "ckpt"),
    )
    state1, _ = train_lib.fit(model, iter(batches), config, verbose=False)
    assert int(state1.step) == 20

    # a fresh fit with a longer horizon resumes from step 20, not 0
    config2 = train_lib.TrainConfig(
        learning_rate=1e-3, num_steps=30, log_every=10,
        checkpoint_every=10, checkpoint_dir=str(tmp_path / "ckpt"),
    )
    state2, _ = train_lib.fit(model, iter(batches), config2, verbose=False)
    assert int(state2.step) == 30
    # params continued from the checkpoint (not re-initialized): the
    # restored optimizer state keeps Adam's moments, so one step from the
    # restored params equals continuing the original run
    p1 = jax.tree_util.tree_leaves(state1.params)[0]
    p2 = jax.tree_util.tree_leaves(state2.params)[0]
    assert not np.allclose(np.asarray(p1), np.asarray(p2))


def test_eval_step_finite():
    model, batches, batch = small_toy_setup()
    config = train_lib.TrainConfig(num_steps=5, log_every=5)
    state, _ = train_lib.fit(model, iter(batches), config, verbose=False)
    metrics = train_lib.eval_step(
        model, state.params, batch, jax.random.key(5)
    )
    assert np.isfinite(float(metrics["loss"]))


def test_preset_syn_data_step_runs():
    preset = configs.get("syn_data")
    data = generate_toy_data(jax.random.key(0), preset.batch_size)
    batch = toy_to_masked_batch({k: np.asarray(v) for k, v in data.items()})
    model = GPVAE(preset.model)
    b = Batcher(batch, preset.batch_size)
    config = train_lib.TrainConfig(num_steps=2, log_every=1)
    state, log = train_lib.fit(model, iter(b), config, verbose=False)
    assert np.isfinite(log.rows[-1]["loss"])


def test_fit_callbacks_fire():
    model, batches, _ = small_toy_setup()
    calls = []
    config = train_lib.TrainConfig(num_steps=30, log_every=30)
    train_lib.fit(
        model, iter(batches), config, verbose=False,
        callbacks=[(10, lambda state, step: calls.append(step))],
    )
    assert calls == [10, 20, 30]


def test_fp64_trajectory_audit_machinery():
    """The reference-reproduction runner's --fp64-check-steps audit
    (benchmarks/reference_reproduction.py) re-evaluates the ELBO at live
    trained params with the fp64 reference-math oracle.  Lock the
    machinery: after a short fit, the framework ELBO at the final params
    must match utils.reference_math.fp64_elbo within the 1e-4 north star
    (BASELINE.json)."""
    import jax.numpy as jnp
    from gpvae_tpu.utils import reference_math

    model, batches, batch = small_toy_setup(num_seqs=8, t=12, batch_size=4)
    config = train_lib.TrainConfig(
        num_steps=60, log_every=30,
        beta=elbo_lib.BetaSchedule(init=1e-3, rate=0.0),
    )
    state, _ = train_lib.fit(model, iter(batches), config, verbose=False)
    probe = {k: v[:4] for k, v in batch.items()}
    beta = 1e-3
    out = model.apply(
        {"params": state.params},
        jnp.asarray(probe["x"], jnp.float32),
        jnp.asarray(probe["times"], jnp.float32),
        jnp.asarray(probe["mask"]),
        beta=beta, rngs={"sample": jax.random.key(5)},
    )
    ref = reference_math.fp64_elbo(
        state.params, probe["x"], probe["times"], probe["mask"],
        np.asarray(out.latent_sample[0]), beta,
        prior_lengthscales=(9.0, 3.0),
    )
    kl_fw = float(np.sum(np.asarray(out.kl)))
    nll_fw = float(np.sum(np.asarray(out.nll)))
    assert abs(kl_fw - ref["kl"]) / abs(ref["kl"]) < 1e-4
    assert abs(nll_fw - ref["nll"]) / abs(ref["nll"]) < 1e-4
    assert abs(float(out.loss) - ref["loss"]) / abs(ref["loss"]) < 1e-4
