"""Analysis layer: imputation recovers structure, traversals/stats run."""
import jax
import jax.numpy as jnp
import numpy as np

from gpvae_tpu import analysis, elbo as elbo_lib, train as train_lib
from gpvae_tpu.data import Batcher, generate_toy_data, toy_to_masked_batch
from gpvae_tpu.models import GPVAE, GPVAEConfig


def _trained_toy_model(t=12, num_seqs=8, steps=60):
    data = generate_toy_data(jax.random.key(0), num_seqs, t=t)
    batch = toy_to_masked_batch({k: np.asarray(v) for k, v in data.items()})
    cfg = GPVAEConfig(
        latent_dim=2, obs_dim=15, time_len=t,
        prior="gp", posterior="gp",
        prior_lengthscales=(9.0, 3.0), posterior_lengthscales=(9.0, 3.0),
    )
    model = GPVAE(cfg)
    config = train_lib.TrainConfig(
        learning_rate=1e-3, num_steps=steps, log_every=steps,
        beta=elbo_lib.BetaSchedule(init=1e-3, rate=0.0),
    )
    state, _ = train_lib.fit(
        model, iter(Batcher(batch, 4)), config, verbose=False
    )
    return model, state.params, batch


def test_encode_decode_standalone():
    model, params, batch = _trained_toy_model(steps=5)
    x = jnp.asarray(batch["x"][:2])
    mean = analysis.encode(model, params, x)
    assert mean.shape == (2, 12, 2)
    logits = analysis.decode(model, params, mean)
    assert logits.shape == (2, 12, 15)


def test_reconstruct_shapes_and_range():
    model, params, batch = _trained_toy_model(steps=5)
    x = jnp.asarray(batch["x"][:2])
    times = jnp.asarray(batch["times"][:2])
    mask = jnp.asarray(batch["mask"][:2])
    probs, z = analysis.reconstruct(
        model, params, x, times, mask, key=jax.random.key(0), num_samples=3
    )
    assert probs.shape == (3, 2, 12, 15)
    assert z.shape == (3, 2, 12, 2)
    assert float(probs.min()) >= 0 and float(probs.max()) <= 1


def test_drop_timesteps_only_drops_observed():
    mask = jnp.asarray(np.random.default_rng(0).random((4, 10)) < 0.8)
    kept = analysis.drop_timesteps(jax.random.key(1), mask, 0.5)
    assert np.all(~np.asarray(kept)[~np.asarray(mask)])
    assert np.asarray(kept).sum() < np.asarray(mask).sum()


def test_impute_fills_dropped_steps():
    model, params, batch = _trained_toy_model()
    x = jnp.asarray(batch["x"][:4])
    times = jnp.asarray(batch["times"][:4])
    mask = jnp.asarray(batch["mask"][:4])
    kept = analysis.drop_timesteps(jax.random.key(2), mask, 0.4)
    probs, z_imp, post = analysis.impute(
        model, params, x, times, mask, kept, key=jax.random.key(3)
    )
    assert probs.shape == x.shape
    assert np.all(np.isfinite(np.asarray(probs)))
    # at kept steps the imputed latent equals the encoder mean exactly
    mean = analysis.encode(model, params, x)
    k = np.asarray(kept)
    np.testing.assert_allclose(
        np.asarray(z_imp)[k], np.asarray(mean)[k], rtol=1e-6
    )
    # at dropped-but-observed steps it comes from the GP posterior mean
    dropped = np.asarray(mask) & ~k
    if dropped.any():
        np.testing.assert_allclose(
            np.asarray(z_imp)[dropped], np.asarray(post.mean)[dropped],
            rtol=1e-5, atol=1e-6,
        )


def test_impute_vae_prior_baseline():
    model, params, batch = _trained_toy_model(steps=5)
    x = jnp.asarray(batch["x"][:2])
    mask = jnp.asarray(batch["mask"][:2])
    kept = analysis.drop_timesteps(jax.random.key(4), mask, 0.5)
    probs, z = analysis.impute_vae_prior(
        model, params, x, kept, key=jax.random.key(5)
    )
    assert probs.shape == x.shape
    assert np.all(np.isfinite(np.asarray(probs)))


def test_latent_traversal():
    model, params, _ = _trained_toy_model(steps=5)
    out = analysis.latent_traversal(
        model, params, jnp.zeros(2), dim=1, num_points=6
    )
    assert out.shape == (6, 15)
    # the swept dim actually changes the decoding
    assert float(jnp.abs(out[0] - out[-1]).max()) > 1e-6


def test_traversal_from_gp():
    model, params, batch = _trained_toy_model(steps=5)
    times = jnp.asarray(batch["times"][0])
    out = analysis.traversal_from_gp(
        model, params, times, dim=0, key=jax.random.key(6)
    )
    assert out.shape == (12, 15)
    assert np.all(np.isfinite(np.asarray(out)))


def test_activation_stats():
    model, params, batch = _trained_toy_model(steps=5)
    x = jnp.asarray(batch["x"][:4])
    times = jnp.asarray(batch["times"][:4])
    mask = jnp.asarray(batch["mask"][:4])
    mc_mean, var_sorted = analysis.activation_stats(
        model, params, x, times, mask, key=jax.random.key(7),
        num_samples=16,
    )
    assert mc_mean.shape == (4, 12, 2)
    assert var_sorted.shape == (2,)
    assert np.all(np.diff(np.asarray(var_sorted)) <= 1e-12)
