"""Gaussian-likelihood observation model."""
import jax
import jax.numpy as jnp
import numpy as np

from gpvae_tpu import elbo as elbo_lib
from gpvae_tpu.models import GPVAE, GPVAEConfig


def test_gaussian_nll_oracle():
    rng = np.random.default_rng(0)
    mean = rng.standard_normal((2, 3, 5, 4))
    x = rng.standard_normal((3, 5, 4))
    got = elbo_lib.gaussian_nll(jnp.asarray(mean), jnp.asarray(x))
    want = (
        0.5 * ((x[None] - mean) ** 2 + np.log(2 * np.pi))
    ).sum(-1).sum(-1).mean(0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_gaussian_model_trains():
    rng = np.random.default_rng(1)
    b, t, d = 6, 10, 15
    x = jnp.asarray(rng.standard_normal((b, t, d)) * 0.5, jnp.float32)
    times = jnp.asarray(
        np.sort(rng.uniform(0, 45, (b, t)), -1), jnp.float32
    )
    cfg = GPVAEConfig(
        latent_dim=2, obs_dim=d, time_len=t, likelihood="gaussian",
        prior="gp", posterior="gp",
        prior_lengthscales=(9.0, 3.0), posterior_lengthscales=(9.0, 3.0),
    )
    model = GPVAE(cfg)
    params = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        x, times, None,
    )
    out = model.apply(
        params, x, times, None, rngs={"sample": jax.random.key(2)}
    )
    assert np.isfinite(float(out.loss))
    g = jax.grad(
        lambda p: model.apply(
            p, x, times, None, rngs={"sample": jax.random.key(2)}
        ).loss
    )(params)
    assert all(
        np.all(np.isfinite(np.asarray(leaf)))
        for leaf in jax.tree_util.tree_leaves(g)
    )
