"""Golden ELBO parity for the last two zoo members (VERDICT r2 missing #3):

* the GP-recognition model, BOTH KL modes — the reference pairs a
  correlated sampler ``z = mu + (chol(K) + diag(sqrt(v))) eps``
  (src/Models/GP_recog_VAE_prior.py:159-160) with the *diagonal* standard
  KL (:65-70); the framework reproduces that exactly under
  ``reference_recog_kl=True`` and offers the exact KL of the actual
  sampling distribution otherwise;
* the dynamic-time conv full-GP config — irregular per-sequence time
  grids, ragged fp64 per-(sequence, latent) KL restricted to each true
  length (src/Models/Full_GP_VAE_dynamic_time.py:302-416; KL form
  src/Models/syndata/GP_VAE_syn_data.py:216-236).

Method (as in test_reference_parity.py): re-derive the reference formulas
in fp64 numpy on the framework's own encoder outputs; every ELBO term must
agree to <= 1e-4 relative.
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


def _irregular_batch(rng, b, t, size, min_len):
    x = (rng.random((b, t, size, size, 1)) < 0.3).astype(np.float64)
    times = np.sort(rng.uniform(0.0, 20.0, (b, t)), axis=-1)
    lengths = rng.integers(min_len, t + 1, b)
    mask = np.arange(t)[None, :] < lengths[:, None]
    x *= mask[:, :, None, None, None]
    return x, times, lengths, mask


def _run_model(cfg, x, times, mask, key=7):
    model = GPVAE(cfg)
    xx = jnp.asarray(x, jnp.float32)
    tt = jnp.asarray(times, jnp.float32)
    mm = jnp.asarray(mask)
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        xx, tt, mm,
    )
    out = jax.jit(
        lambda p: model.apply(
            p, xx, tt, mm, beta=1.0, rngs={"sample": jax.random.key(key)}
        )
    )(variables)
    return model, variables, out


def test_recog_reference_kl_parity():
    """reference_recog_kl=True: the standard diagonal VAE KL of
    src/Models/GP_recog_VAE_prior.py:65-70 (sign-flipped at the use site),
    summed over observed timesteps only."""
    rng = np.random.default_rng(2)
    b, t, z, size = 3, 10, 4, 28
    x, times, lengths, mask = _irregular_batch(rng, b, t, size, 5)
    cfg = GPVAEConfig(
        latent_dim=z, obs_dim=size * size, time_len=t,
        prior="standard", posterior="gp_plus_diag",
        posterior_lengthscales=(1.0,),
        encoder="conv", decoder="conv", image_shape=(size, size, 1),
        reference_recog_kl=True,
    )
    _, _, out = _run_model(cfg, x, times, mask)

    mu = np.asarray(out.latent_mean, np.float64)
    log_var = np.asarray(out.aux["log_var"], np.float64)
    total_kl = 0.0
    for i in range(b):
        for s in range(lengths[i]):
            v = np.exp(log_var[i, s])
            m = mu[i, s]
            # -standard_vae_kl: 0.5 * sum(mu^2 + v - 1 - log v)
            total_kl += 0.5 * np.sum(m * m + v - 1.0 - np.log(1e-10 + v))
    kl_fw = float(jnp.sum(out.kl))
    assert abs(kl_fw - total_kl) / abs(total_kl) < 1e-4, (kl_fw, total_kl)

    probs = 1.0 / (1.0 + np.exp(-np.asarray(out.logits[0], np.float64)))
    total_nll = ref_bernoulli_nll(
        x[mask], probs[mask]
    )
    nll_fw = float(jnp.sum(out.nll))
    assert abs(nll_fw - total_nll) / abs(total_nll) < 1e-4


def test_recog_exact_kl_parity():
    """reference_recog_kl=False: the exact KL of the sampling distribution
    N(mu, C C^T), C = chol(K_q) + diag(sqrt(v)) on each observed
    subsequence (the covariance the reference actually samples from,
    src/Models/GP_recog_VAE_prior.py:159-160)."""
    rng = np.random.default_rng(3)
    b, t, z, size = 3, 9, 4, 28
    x, times, lengths, mask = _irregular_batch(rng, b, t, size, 4)
    cfg = GPVAEConfig(
        latent_dim=z, obs_dim=size * size, time_len=t,
        prior="standard", posterior="gp_plus_diag",
        posterior_lengthscales=(1.0,),
        encoder="conv", decoder="conv", image_shape=(size, size, 1),
        reference_recog_kl=False,
    )
    _, variables, out = _run_model(cfg, x, times, mask)

    mu = np.asarray(out.latent_mean, np.float64)
    log_var = np.asarray(out.aux["log_var"], np.float64)
    ls_q = np.exp(
        np.asarray(variables["params"]["posterior_log_ls"], np.float64)
    )
    total_kl = 0.0
    for i in range(b):
        n = lengths[i]
        t_obs = times[i, :n]
        for d in range(z):
            l = np.linalg.cholesky(ref_gram(t_obs, ls_q[d]))
            c = l + np.diag(np.sqrt(np.exp(log_var[i, :n, d])))
            m = mu[i, :n, d]
            total_kl += 0.5 * (
                np.sum(c * c) + m @ m - n
                - 2.0 * np.sum(np.log(np.diag(c)))
            )
    kl_fw = float(jnp.sum(out.kl))
    assert abs(kl_fw - total_kl) / abs(total_kl) < 1e-4, (kl_fw, total_kl)


def test_dynamic_time_conv_full_gp_parity():
    """Full_GP_VAE_dynamic_time: irregular per-sequence grids, conv nets,
    prior l=1 constant (:114), learnable posterior l (:72), ragged fp64
    inverse+logdet KL per (sequence, latent) over each true length."""
    rng = np.random.default_rng(4)
    b, t, z, size = 3, 10, 5, 28
    x, times, lengths, mask = _irregular_batch(rng, b, t, size, 5)
    cfg = GPVAEConfig(
        latent_dim=z, obs_dim=size * size, time_len=t,
        prior="gp", posterior="gp",
        prior_lengthscales=(1.0,), learn_prior_lengthscales=False,
        posterior_lengthscales=(1.0,), learn_posterior_lengthscales=True,
        encoder="conv", decoder="conv", image_shape=(size, size, 1),
    )
    model, variables, out = _run_model(cfg, x, times, mask)

    mu = np.asarray(out.latent_mean, np.float64)
    ls_q = np.exp(
        np.asarray(variables["params"]["posterior_log_ls"], np.float64)
    )
    total_kl = 0.0
    for i in range(b):
        n = lengths[i]
        t_obs = times[i, :n]
        for d in range(z):
            kq = ref_gram(t_obs, ls_q[d])
            kp = ref_gram(t_obs, 1.0)
            kp_inv = np.linalg.inv(kp)
            m = mu[i, :n, d]
            total_kl += 0.5 * (
                np.trace(kp_inv @ kq) - n
                + np.linalg.slogdet(kp)[1] - np.linalg.slogdet(kq)[1]
                + m @ kp_inv @ m
            )
    kl_fw = float(jnp.sum(out.kl))
    assert abs(kl_fw - total_kl) / abs(total_kl) < 1e-4, (kl_fw, total_kl)

    probs = 1.0 / (1.0 + np.exp(-np.asarray(out.logits[0], np.float64)))
    total_nll = ref_bernoulli_nll(x[mask], probs[mask])
    nll_fw = float(jnp.sum(out.nll))
    assert abs(nll_fw - total_nll) / abs(total_nll) < 1e-4
    loss_ref = (total_nll + total_kl) / b
    assert abs(float(out.loss) - loss_ref) / abs(loss_ref) < 1e-4
