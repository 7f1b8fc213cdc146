"""shared_time_grid: the batch-shared factorization path must match the
per-sequence path exactly on uniform grids."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gpvae_tpu import gp, kernels
from gpvae_tpu.models import GPVAE, GPVAEConfig


def uniform_batch(rng, b=6, t=10, d=15):
    x = (rng.random((b, t, d)) < 0.4).astype(np.float32)
    times = np.broadcast_to(
        np.arange(1.0, t + 1, dtype=np.float32), (b, t)
    ).copy()
    mask = np.ones((b, t), bool)
    return jnp.asarray(x), jnp.asarray(times), jnp.asarray(mask)


def test_gp_kl_shared_factor_matches_full():
    rng = np.random.default_rng(0)
    b, z, t = 5, 3, 12
    times = jnp.broadcast_to(jnp.arange(t, dtype=jnp.float32), (b, t))
    ls_q = jnp.array([2.0, 4.0, 1.0], jnp.float32)
    ls_p = jnp.array([1.0, 1.0, 1.0], jnp.float32)
    mu = jnp.asarray(rng.standard_normal((b, t, z)), jnp.float32)
    l_q_full = jnp.linalg.cholesky(kernels.gram_bank(times, ls_q))
    l_p_full = jnp.linalg.cholesky(kernels.gram_bank(times, ls_p))
    l_q_1 = l_q_full[:1]
    l_p_1 = l_p_full[:1]
    kl_full = gp.gp_kl(mu, l_q_full, l_p_full)
    kl_shared = gp.gp_kl(mu, l_q_1, l_p_1)
    np.testing.assert_allclose(
        np.asarray(kl_full), np.asarray(kl_shared), rtol=1e-6
    )


def test_gp_prior_diag_kl_shared_factor_matches_full():
    rng = np.random.default_rng(1)
    b, z, t = 4, 2, 10
    times = jnp.broadcast_to(jnp.arange(t, dtype=jnp.float32), (b, t))
    ls = jnp.array([1.0, 2.0], jnp.float32)
    mu = jnp.asarray(rng.standard_normal((b, t, z)), jnp.float32)
    lv = jnp.asarray(rng.standard_normal((b, t, z)) * 0.3, jnp.float32)
    l_p = jnp.linalg.cholesky(kernels.gram_bank(times, ls))
    kl_full = gp.gp_prior_diag_kl(mu, lv, l_p)
    kl_shared = gp.gp_prior_diag_kl(mu, lv, l_p[:1])
    np.testing.assert_allclose(
        np.asarray(kl_full), np.asarray(kl_shared), rtol=1e-6
    )


def test_gp_sample_shared_factor_matches_full():
    rng = np.random.default_rng(2)
    b, z, t = 4, 2, 8
    times = jnp.broadcast_to(jnp.arange(t, dtype=jnp.float32), (b, t))
    ls = jnp.array([2.0, 3.0], jnp.float32)
    mu = jnp.asarray(rng.standard_normal((b, t, z)), jnp.float32)
    l = jnp.linalg.cholesky(kernels.gram_bank(times, ls))
    key = jax.random.key(0)
    z_full = gp.gp_sample(key, mu, l, 3)
    z_shared = gp.gp_sample(key, mu, l[:1], 3)
    np.testing.assert_allclose(
        np.asarray(z_full), np.asarray(z_shared), rtol=1e-5, atol=1e-6
    )


def test_model_shared_grid_matches_per_sequence():
    rng = np.random.default_rng(3)
    x, times, mask = uniform_batch(rng)
    base = GPVAEConfig(
        latent_dim=2, obs_dim=15, time_len=10,
        prior="gp", posterior="gp",
        prior_lengthscales=(1.0,), posterior_lengthscales=(1.0, 2.0),
    )
    m_full = GPVAE(base)
    m_shared = GPVAE(dataclasses.replace(base, shared_time_grid=True))
    params = m_full.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        x, times, mask,
    )
    out_f = m_full.apply(
        params, x, times, mask, rngs={"sample": jax.random.key(2)}
    )
    out_s = m_shared.apply(
        params, x, times, mask, rngs={"sample": jax.random.key(2)}
    )
    np.testing.assert_allclose(
        np.asarray(out_f.kl), np.asarray(out_s.kl), rtol=1e-5
    )
    # same key, same eps shape -> identical samples and NLL
    np.testing.assert_allclose(
        np.asarray(out_f.latent_sample), np.asarray(out_s.latent_sample),
        rtol=1e-5, atol=1e-6,
    )
