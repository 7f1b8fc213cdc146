"""Golden ELBO parity for two more zoo members (VERDICT r1 missing #5):

* the fixed-grid conv full-GP config — shared gram tiled across the batch,
  learnable prior lengthscales (src/Models/Full_GP_VAE_fixed_for_MovMnist.py:
  96-146, KL driver :299, NLL :307);
* the diag-posterior / GP-prior config — K built once on the fixed grid,
  explicit fp64 inverse/determinant KL (src/Models/VAE_GPprior_diag_cov.py:
  73-119).

Method (as in test_reference_parity.py): re-derive the reference *formulas*
in fp64 numpy, feed them the framework's own encoder outputs and latent
draw, and require every ELBO term to agree to <=1e-4 relative.  This pins
the masked static-shape KL/NLL assembly — including the shared-fixed-grid
factor sharing — against the reference's per-(sequence, latent) unrolled
math, independent of network internals.
"""
import jax
import jax.numpy as jnp
import numpy as np

from gpvae_tpu.models import GPVAE, GPVAEConfig

NOISE = 1e-3


def ref_gram(times, ls):
    dt = times[:, None] - times[None, :]
    k = np.exp(-(dt ** 2) / (2.0 * ls ** 2))
    return (1.0 - NOISE) * k + NOISE * np.eye(len(times))


def ref_bernoulli_nll(x, probs):
    return -np.sum(
        x * np.log(probs + 1e-10) + (1.0 - x) * np.log(1.0 - probs + 1e-10)
    )


def test_fixed_grid_conv_full_gp_parity():
    """Full_GP_VAE_fixed_for_MovMnist: ONE gram per latent on the fixed
    grid, tiled across the batch (:99); per-(seq,latent) fp64
    inverse+logdet KL (:216-236 form via the shared driver); beta=1."""
    rng = np.random.default_rng(0)
    b, t, z = 3, 8, 6
    size = 28
    times_row = np.arange(1.0, t + 1.0)          # reference grid 1..T (:280)
    x = (rng.random((b, t, size, size, 1)) < 0.3).astype(np.float64)

    cfg = GPVAEConfig(
        latent_dim=z, obs_dim=size * size, time_len=t,
        prior="gp", posterior="gp",
        prior_lengthscales=(1.0,), learn_prior_lengthscales=True,
        posterior_lengthscales=(1.0,), learn_posterior_lengthscales=True,
        encoder="conv", decoder="conv", image_shape=(size, size, 1),
        shared_time_grid=True,
    )
    model = GPVAE(cfg)
    xx = jnp.asarray(x, jnp.float32)
    tt = jnp.broadcast_to(jnp.asarray(times_row, jnp.float32), (b, t))
    mm = jnp.ones((b, t), bool)
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        xx, tt, mm,
    )
    params = variables["params"]
    out = jax.jit(
        lambda p: model.apply(
            p, xx, tt, mm, beta=1.0, rngs={"sample": jax.random.key(7)}
        )
    )(variables)

    mu = np.asarray(out.latent_mean, np.float64)           # [B, T, Z]
    ls_q = np.exp(np.asarray(params["posterior_log_ls"], np.float64))
    ls_p = np.exp(np.asarray(params["prior_log_ls"], np.float64))

    total_kl = 0.0
    for i in range(b):
        for d in range(z):
            kq = ref_gram(times_row, ls_q[d])
            kp = ref_gram(times_row, ls_p[d])
            kp_inv = np.linalg.inv(kp)
            m = mu[i, :, d]
            total_kl += 0.5 * (
                np.trace(kp_inv @ kq) - t
                + np.linalg.slogdet(kp)[1] - np.linalg.slogdet(kq)[1]
                + m @ kp_inv @ m
            )
    kl_fw = float(jnp.sum(out.kl))
    assert abs(kl_fw - total_kl) / abs(total_kl) < 1e-4, (kl_fw, total_kl)

    # NLL: reference simple reduce_sum clamped Bernoulli (:307)
    probs = 1.0 / (1.0 + np.exp(-np.asarray(out.logits[0], np.float64)))
    total_nll = ref_bernoulli_nll(x, probs)
    nll_fw = float(jnp.sum(out.nll))
    assert abs(nll_fw - total_nll) / abs(total_nll) < 1e-4, (
        nll_fw, total_nll
    )
    loss_ref = (total_nll + 1.0 * total_kl) / b
    assert abs(float(out.loss) - loss_ref) / abs(loss_ref) < 1e-4


def test_diag_posterior_gp_prior_parity():
    """VAE_GPprior_diag_cov: numpy K on the fixed 0..T-1 grid with l=1
    (:153-165,195), K^{-1}/det computed once (:83-84), per-(seq,latent)
    KL = 1/2 [tr(K^{-1} diag v) + logdet K - sum log v - T + mu^T K^{-1} mu]
    (:100-119)."""
    rng = np.random.default_rng(1)
    b, t, z = 4, 10, 5
    size = 28
    times_row = np.arange(float(t))              # reference grid 0..19 (:195)
    x = (rng.random((b, t, size, size, 1)) < 0.3).astype(np.float64)

    cfg = GPVAEConfig(
        latent_dim=z, obs_dim=size * size, time_len=t,
        prior="gp", posterior="diag",
        prior_lengthscales=(1.0,), learn_prior_lengthscales=False,
        encoder="conv", decoder="conv", image_shape=(size, size, 1),
        shared_time_grid=True,
    )
    model = GPVAE(cfg)
    xx = jnp.asarray(x, jnp.float32)
    tt = jnp.broadcast_to(jnp.asarray(times_row, jnp.float32), (b, t))
    mm = jnp.ones((b, t), bool)
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        xx, tt, mm,
    )
    out = jax.jit(
        lambda p: model.apply(
            p, xx, tt, mm, beta=1.0, rngs={"sample": jax.random.key(3)}
        )
    )(variables)

    mu = np.asarray(out.latent_mean, np.float64)            # [B, T, Z]
    log_var = np.asarray(out.aux["log_var"], np.float64)    # [B, T, Z]

    k = ref_gram(times_row, 1.0)
    k_inv = np.linalg.inv(k)          # computed ONCE, as the reference does
    logdet_k = np.linalg.slogdet(k)[1]
    total_kl = 0.0
    for i in range(b):
        for d in range(z):
            v = np.exp(log_var[i, :, d])
            m = mu[i, :, d]
            total_kl += 0.5 * (
                np.trace(k_inv @ np.diag(v)) + logdet_k - np.sum(
                    np.log(v)
                ) - t + m @ k_inv @ m
            )
    kl_fw = float(jnp.sum(out.kl))
    assert abs(kl_fw - total_kl) / abs(total_kl) < 1e-4, (kl_fw, total_kl)

    probs = 1.0 / (1.0 + np.exp(-np.asarray(out.logits[0], np.float64)))
    total_nll = ref_bernoulli_nll(x, probs)
    nll_fw = float(jnp.sum(out.nll))
    assert abs(nll_fw - total_nll) / abs(total_nll) < 1e-4
