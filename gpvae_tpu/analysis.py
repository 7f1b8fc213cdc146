"""Analysis / imputation / traversal APIs.

First-class re-design of the reference analysis scripts
(src/Models/FullGP_and_GPdecoder_dynamic_time_analysis.py,
src/Models/VanillaVAE_and_GPprior_model_analysis.py), which restore a
checkpoint by graph-tensor names and re-enter the TF graph mid-way by
feeding intermediate tensors (SURVEY.md §3.4).  Here encode/decode/sample
are ordinary pure functions of (model, params), so every capability is a
composable jittable call:

* :func:`reconstruct`       — encode + sample + decode;
* :func:`drop_timesteps`    — the latent drop bookkeeping
  (``drop_part_of_sequences``, reference :58-77) as a mask transform;
* :func:`impute`            — GP-posterior imputation of dropped steps
  (``post_gp_sample``/``sample_given_part_latent``, :40-56,96-111);
* :func:`impute_vae_prior`  — the N(0,1)-fill baseline
  (``drop_sample_VAE_prior``, :79-94);
* :func:`latent_traversal`  — sweep one latent dim over a probit grid
  (``random_single_latent``, :124-136);
* :func:`traversal_from_gp` — sweep along a draw from the learned
  per-latent GP gram (``single_batch_random_single_latent_fromGPapprox``,
  :138-152);
* :func:`activation_stats`  — MC latent mean/variance per dim (the
  commented block at :204-227).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from gpvae_tpu import gp
from gpvae_tpu.models import GPVAE


def _apply(model: GPVAE, params, method, *args, key=None):
    rngs = {"sample": key} if key is not None else None
    return model.apply({"params": params}, *args, method=method, rngs=rngs)


def encode(model: GPVAE, params, x):
    """[B, T, ...] -> latent mean [B, T, Z] (+ log_var when configured)."""
    return _apply(model, params, "encode", x)


def decode(model: GPVAE, params, z):
    """Latents -> Bernoulli logits (standalone decoder entry — the
    capability the reference gets by feeding ``latent_sample`` directly,
    SURVEY.md §3.4 note)."""
    return _apply(model, params, "decode", z)


def reconstruct(model: GPVAE, params, x, times=None, mask=None, *,
                key, num_samples: int = 1):
    """Full encode -> posterior sample -> decode; returns (probs, z)."""
    if times is None:
        times = jnp.broadcast_to(
            jnp.arange(x.shape[1], dtype=jnp.float32), x.shape[:2]
        )
    z, mean, log_var, aux = model.apply(
        {"params": params}, x, times, mask, num_samples,
        method="sample_posterior", rngs={"sample": key},
    )
    logits = decode(model, params, z)
    return jax.nn.sigmoid(logits), z


def drop_timesteps(key: jax.Array, mask: jnp.ndarray,
                   drop_fraction: float) -> jnp.ndarray:
    """Randomly drop ``drop_fraction`` of the *observed* timesteps; returns
    the kept-mask (reference ``drop_part_of_sequences`` keep-list
    bookkeeping, :58-77, as one vectorized mask op)."""
    u = jax.random.uniform(key, mask.shape)
    kept = mask & (u >= drop_fraction)
    return kept


def impute(
    model: GPVAE,
    params,
    x,
    times,
    mask,
    kept_mask,
    *,
    key,
    sample: bool = False,
    use_prior_lengthscales: bool = True,
):
    """GP-posterior imputation: encode, condition each latent dim's GP on
    the kept timesteps, predict/sample latents on the FULL grid, decode.

    Returns (probs [B, T, ...], z_imputed [B, T, Z], post mean/cov).
    ``use_prior_lengthscales`` conditions under the model's prior GP (the
    reference uses its fixed l=1 analysis kernel, :8-14); pass False to use
    the learned posterior lengthscales instead.
    """
    enc = encode(model, params, x)
    mean = enc[0] if isinstance(enc, tuple) else enc
    cfg = model.config
    if cfg.prior in ("gp", "sparse_gp") and use_prior_lengthscales:
        # sparse_gp: conditioning under the prior's (exact) RBF kernel is
        # the right analysis model — FITC only approximates the *training*
        # KL, the generative prior is the same GP (sparse.py module doc)
        ls = jnp.exp(_param_or_const(model, params, "prior_log_ls", cfg))
    else:
        ls = jnp.exp(
            _param_or_const(model, params, "posterior_log_ls", cfg)
        )
    post = gp.posterior_conditional(
        times, mean * kept_mask[..., None].astype(mean.dtype), times, ls,
        mask_obs=kept_mask, kernel=cfg.kernel, noise=cfg.noise,
        with_cov=sample,  # mean-imputation never reads S* (537 MB at T=4096)
    )
    if sample:
        z_full = gp.posterior_sample(key, post)[0]
    else:
        z_full = post.mean
    # keep encoder means where observed; GP fill where dropped
    z_imputed = jnp.where(kept_mask[..., None], mean, z_full)
    logits = decode(model, params, z_imputed)
    return jax.nn.sigmoid(logits), z_imputed, post


def impute_vae_prior(model: GPVAE, params, x, kept_mask, *, key):
    """Baseline for models with a standard-normal prior: dropped steps'
    latents are filled with N(0,1) draws (reference
    ``drop_sample_VAE_prior``, :79-94)."""
    enc = encode(model, params, x)
    mean = enc[0] if isinstance(enc, tuple) else enc
    noise = jax.random.normal(key, mean.shape, mean.dtype)
    z = jnp.where(kept_mask[..., None], mean, noise)
    logits = decode(model, params, z)
    return jax.nn.sigmoid(logits), z


def latent_traversal(
    model: GPVAE,
    params,
    z_base: jnp.ndarray,
    dim: int,
    *,
    num_points: int = 8,
    prob_range: tuple[float, float] = (0.05, 0.95),
):
    """Tile ``z_base [Z]``, sweep ``dim`` over a probit grid
    (``norm.ppf`` in the reference, :124-136); returns probs
    ``[num_points, ...]``."""
    from scipy.stats import norm

    grid = jnp.asarray(
        norm.ppf(np.linspace(*prob_range, num_points)), z_base.dtype
    )
    z = jnp.tile(z_base[None], (num_points, 1))
    z = z.at[:, dim].set(grid)
    logits = decode(model, params, z[:, None, :][None])  # [1,P,1,Z]
    return jax.nn.sigmoid(logits)[0, :, 0]


def traversal_from_gp(
    model: GPVAE,
    params,
    times: jnp.ndarray,
    dim: int,
    *,
    key,
    z_base: jnp.ndarray | None = None,
):
    """Sweep one latent dim along a trajectory drawn from the model's
    learned per-latent GP gram over ``times [T]`` (reference
    ``single_batch_random_single_latent_fromGPapprox``, :138-152)."""
    cfg = model.config
    ls = jnp.exp(_param_or_const(model, params, "posterior_log_ls", cfg))
    l = gp.chol_gram_bank(times[None], ls, kernel=cfg.kernel,
                          noise=cfg.noise)  # [1, Z, T, T]
    draw = gp.prior_sample(key, l)[0, 0]  # [T, Z]
    t = times.shape[0]
    if z_base is None:
        z_base = jnp.zeros((cfg.latent_dim,), draw.dtype)
    z = jnp.tile(z_base[None], (t, 1))
    z = z.at[:, dim].set(draw[:, dim])
    logits = decode(model, params, z[None, :, :][None])  # [1,1,T,Z]
    return jax.nn.sigmoid(logits)[0, 0]


def prior_draws(
    model: GPVAE,
    params,
    times: jnp.ndarray,
    *,
    key,
    num_samples: int = 1,
) -> jnp.ndarray:
    """Latent trajectories drawn from the model's GP prior over ``times
    [T]`` -> ``[S, T, Z]`` (reference ``prior_gp_sample``,
    src/Models/FullGP_and_GPdecoder_dynamic_time_analysis.py:24-30).

    On uniform grids with the Toeplitz structured prior active, sampling
    goes through circulant embedding + FFT (O(T log T),
    toeplitz.circulant_prior_sample) instead of a dense O(T^3) Cholesky —
    the long-sequence analysis path for BASELINE config 3.
    """
    cfg = model.config
    ls = jnp.exp(_param_or_const(model, params, "prior_log_ls", cfg))
    if cfg.toeplitz_prior:
        from gpvae_tpu import kernels as kernels_lib
        from gpvae_tpu import toeplitz

        step = times[1] - times[0]
        row = kernels_lib.toeplitz_row(
            times.shape[0], step, ls, kernel=cfg.kernel, noise=cfg.noise
        )
        draws = toeplitz.circulant_prior_sample(
            key, row, num_samples=num_samples
        )                                          # [S, Z, T]
        return jnp.swapaxes(draws, -1, -2)
    l = gp.chol_gram_bank(
        times[None], ls, kernel=cfg.kernel, noise=cfg.noise
    )
    return gp.prior_sample(key, l, num_samples)[:, 0]


def activation_stats(
    model: GPVAE, params, x, times, mask, *, key, num_samples: int = 100
):
    """Monte-Carlo per-dim latent statistics: E[z] per sequence and the
    across-dataset variance of those means, sorted — the reference's
    activation/variance scatter (commented block, :204-227).  Returns
    (mc_means [B, T, Z], per-dim variance [Z] sorted descending)."""
    z, *_ = model.apply(
        {"params": params}, x, times, mask, num_samples,
        method="sample_posterior", rngs={"sample": key},
    )
    mc_mean = jnp.mean(z, axis=0)  # [B, T, Z]
    if mask is not None:
        w = mask.astype(mc_mean.dtype)[..., None]
        flat_mean = (mc_mean * w).sum((0, 1)) / w.sum((0, 1))
        var = ((mc_mean - flat_mean) ** 2 * w).sum((0, 1)) / w.sum((0, 1))
    else:
        var = jnp.var(mc_mean, axis=(0, 1))
    order = jnp.argsort(-var)
    return mc_mean, var[order]


def imputation_metrics(
    model: GPVAE,
    params,
    x,
    times,
    mask,
    *,
    key,
    drop_fraction: float = 0.5,
) -> dict:
    """Quantitative imputation evaluation (the north-star "synthetic
    imputation" workload, BASELINE.json): drop a fraction of observed
    timesteps, GP-impute their latents, decode, and score the reconstruction
    against the held-out ground truth on exactly the dropped steps.

    Returns per-element Bernoulli NLL and MSE on dropped steps, with the
    N(0,1)-fill VAE baseline (reference ``drop_sample_VAE_prior``) for
    models with a standard prior as ``*_baseline``.
    """
    k_drop, k_imp, k_base = jax.random.split(key, 3)
    kept = drop_timesteps(k_drop, mask, drop_fraction)
    dropped = mask & ~kept

    def score(probs):
        p = jnp.clip(probs, 1e-6, 1.0 - 1e-6)
        nll = -(x * jnp.log(p) + (1.0 - x) * jnp.log1p(-p))
        mse = (probs - x) ** 2
        # mean over the dropped elements only
        w = dropped[(...,) + (None,) * (nll.ndim - 2)].astype(p.dtype)
        denom = jnp.maximum((w * jnp.ones_like(nll)).sum(), 1.0)
        return (
            float((nll * w).sum() / denom),
            float((mse * w).sum() / denom),
        )

    probs_gp, _, _ = impute(
        model, params, x, times, mask, kept, key=k_imp
    )
    nll_gp, mse_gp = score(probs_gp)
    out = {
        "dropped_steps": int(np.asarray(dropped).sum()),
        "nll_gp_impute": nll_gp,
        "mse_gp_impute": mse_gp,
    }
    probs_base, _ = impute_vae_prior(model, params, x, kept, key=k_base)
    nll_b, mse_b = score(probs_base)
    out["nll_baseline"] = nll_b
    out["mse_baseline"] = mse_b
    return out


def pixel_imputation_metrics(
    model: GPVAE,
    params,
    batch: dict,
    *,
    key,
) -> dict:
    """Missing-*pixel* imputation scoring (healing-MNIST regime,
    BASELINE.json config 2).

    ``batch`` is a ``data.healing.make_healing_batch`` dict: the encoder
    sees the zero-filled corrupted ``x``; reconstructions are scored against
    ``x_clean`` on exactly the missing pixels (``~feature_mask``), with the
    marginal-rate predictor as baseline.
    """
    x = jnp.asarray(batch["x"])
    x_clean = jnp.asarray(batch["x_clean"])
    fmask = jnp.asarray(batch["feature_mask"])
    times = jnp.asarray(batch["times"], jnp.float32)
    mask = jnp.asarray(batch["mask"])

    enc = encode(model, params, x)
    mean = enc[0] if isinstance(enc, tuple) else enc
    probs = jax.nn.sigmoid(decode(model, params, mean))

    missing = (~fmask).astype(probs.dtype)
    denom = jnp.maximum(missing.sum(), 1.0)

    def score(p):
        p = jnp.clip(p, 1e-6, 1.0 - 1e-6)
        nll = -(x_clean * jnp.log(p) + (1 - x_clean) * jnp.log1p(-p))
        mse = (p - x_clean) ** 2
        return (
            float((nll * missing).sum() / denom),
            float((mse * missing).sum() / denom),
        )

    nll_model, mse_model = score(probs)
    # baseline: predict the observed marginal on-rate everywhere
    obs_rate = (x_clean * fmask).sum() / jnp.maximum(fmask.sum(), 1.0)
    nll_base, mse_base = score(jnp.full_like(probs, obs_rate))
    return {
        "missing_pixels": int(np.asarray(missing).sum()),
        "nll_model": nll_model,
        "mse_model": mse_model,
        "nll_marginal_baseline": nll_base,
        "mse_marginal_baseline": mse_base,
    }


def _param_or_const(model: GPVAE, params, name: str, cfg):
    if name in params:
        return params[name]
    raw = (
        cfg.prior_lengthscales if name == "prior_log_ls"
        else cfg.posterior_lengthscales
    )
    return jnp.log(jnp.asarray(cfg._ls_tuple(raw), jnp.float32))


def make_artifact_callback(model: GPVAE, probe_batch: dict, out_dir: str):
    """Periodic training-artifact dump: input / reconstruction film strips
    (conv decoders) or latent-trajectory scatter (dense decoders), written
    as PNGs every time the callback fires — the reference's in-loop
    ``savefig`` blocks (src/Models/syndata/GP_VAE_syn_data.py:375-392;
    src/Models/Full_GP_VAE_dynamic_time.py:385-410) as a ``train.fit``
    callback.  Returns ``fn(state, step)`` for the ``callbacks`` list.
    """
    import os

    from gpvae_tpu.utils import plotting

    os.makedirs(out_dir, exist_ok=True)
    x = jnp.asarray(probe_batch["x"])
    times = jnp.asarray(probe_batch["times"], jnp.float32)
    mask = jnp.asarray(probe_batch["mask"])

    @jax.jit
    def forward(params, key):
        return model.apply(
            {"params": params}, x, times, mask, rngs={"sample": key},
        )

    def cb(state, step):
        out = forward(state.params, jax.random.key(step))
        probs = jax.nn.sigmoid(out.logits[0])  # first sample
        if model.config.decoder == "conv":
            plotting.film_strip(
                np.asarray(x[0]),
                os.path.join(out_dir, f"input_{step:08d}.png"),
                title=f"input (step {step})",
            )
            plotting.film_strip(
                np.asarray(probs[0]),
                os.path.join(out_dir, f"recon_{step:08d}.png"),
                title=f"reconstruction (step {step})",
            )
        else:
            plotting.trajectory_plot(
                np.asarray(times[0]), np.asarray(out.latent_mean[0]),
                os.path.join(out_dir, f"latents_{step:08d}.png"),
                mask=np.asarray(mask[0]),
            )

    return cb
