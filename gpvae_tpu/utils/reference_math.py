"""fp64 reference-math oracle for the dense toy model.

A from-scratch numpy re-derivation of the reference's *formulas* — ragged
per-sequence slicing, explicit matrix-inverse + logdet KL
(src/Models/syndata/GP_VAE_syn_data.py:168-236), clamped-probability
Bernoulli NLL (:334-341), loss = recon + beta*KL (:346) — evaluated in
float64.  Shared by the golden parity tests (tests/test_reference_parity*.py)
and the reference-reproduction runner's ``--fp64-check-steps`` trajectory
audit (benchmarks/reference_reproduction.py): the same network weights and
the same latent draw as the framework's fp32 masked static-shape ELBO must
reproduce every term within ~1e-4 relative.
"""
from __future__ import annotations

import numpy as np

DEFAULT_NOISE = 1e-3


def ref_gram(times: np.ndarray, ls: float,
             noise: float = DEFAULT_NOISE) -> np.ndarray:
    """K = (1-noise)*exp(-(ti-tj)^2/(2 ls^2)) + noise*I, fp64
    (src/Models/syndata/GP_VAE_syn_data.py:124-137)."""
    dt = times[:, None] - times[None, :]
    k = np.exp(-(dt ** 2) / (2.0 * ls ** 2))
    return (1.0 - noise) * k + noise * np.eye(len(times))


def ref_kl_full_gp(mu_seq: np.ndarray, times_seq: np.ndarray,
                   ls_q: np.ndarray, ls_p: np.ndarray,
                   noise: float = DEFAULT_NOISE) -> float:
    """Per-sequence sum over latents of the reference gp_kl_div
    (src/Models/syndata/GP_VAE_syn_data.py:216-236): fp64, explicit
    ``matrix_inverse``, logdet."""
    total = 0.0
    t = len(times_seq)
    for d in range(mu_seq.shape[1]):
        kq = ref_gram(times_seq, ls_q[d], noise)
        kp = ref_gram(times_seq, ls_p[d], noise)
        kp_inv = np.linalg.inv(kp)
        mu = mu_seq[:, d]
        kl = 0.5 * (
            np.trace(kp_inv @ kq)
            - t
            + np.linalg.slogdet(kp)[1]
            - np.linalg.slogdet(kq)[1]
            + mu @ kp_inv @ mu
        )
        total += kl
    return total


def ref_bernoulli_nll(x_seq: np.ndarray, probs_seq: np.ndarray) -> float:
    """Reference clamped form (src/Models/syndata/GP_VAE_syn_data.py:
    334-341)."""
    return -np.sum(
        x_seq * np.log(probs_seq + 1e-10)
        + (1.0 - x_seq) * np.log(1.0 - probs_seq + 1e-10)
    )


def ref_mlp_forward(params, x, layer_names, final_name, final_sigmoid):
    """fp64 forward through a flax Dense-stack params subtree (ReLU hidden,
    linear/sigmoid head) — the reference vae_encode/vae_decode MLPs
    (src/Models/syndata/GP_VAE_syn_data.py:15-39,238-275)."""
    h = x
    for name in layer_names:
        w = np.asarray(params[name]["kernel"], np.float64)
        b = np.asarray(params[name]["bias"], np.float64)
        h = np.maximum(h @ w + b, 0.0)
    w = np.asarray(params[final_name]["kernel"], np.float64)
    b = np.asarray(params[final_name]["bias"], np.float64)
    out = h @ w + b
    if final_sigmoid:
        out = 1.0 / (1.0 + np.exp(-out))
    return out


def _dense_layers(subtree) -> list[str]:
    names = [k for k in subtree if k.startswith("Dense_")]
    names.sort(key=lambda s: int(s.split("_")[1]))
    return names


def fp64_elbo(params, x, times, mask, latent_sample, beta,
              prior_lengthscales=None, noise: float = DEFAULT_NOISE) -> dict:
    """fp64 reference-math ELBO of the dense full-GP toy model at the given
    framework ``params`` and latent draw.

    * ``params``: the flax params tree (``encoder_net``/``decoder_net``
      Dense stacks, ``posterior_log_ls``, optionally ``prior_log_ls``),
    * ``x [B, T, D]`` / ``times [B, T]`` / ``mask [B, T]`` host arrays,
    * ``latent_sample [B, T, Z]``: the framework's z draw (one sample),
    * ``prior_lengthscales``: fixed prior lengthscales when not learnable.

    Returns per-run totals ``{"kl", "nll", "loss"}`` where
    ``loss = (nll + beta*kl) / B`` (the reference's per-step objective).
    """
    x = np.asarray(x, np.float64)
    times = np.asarray(times, np.float64)
    mask = np.asarray(mask, bool)
    z_sample = np.asarray(latent_sample, np.float64)
    enc = params["encoder_net"]
    dec = params["decoder_net"]
    enc_layers = _dense_layers(enc)
    dec_layers = _dense_layers(dec)
    ls_q = np.exp(np.asarray(params["posterior_log_ls"], np.float64))
    if "prior_log_ls" in params:
        ls_p = np.exp(np.asarray(params["prior_log_ls"], np.float64))
    else:
        ls_p = np.asarray(prior_lengthscales, np.float64)
    b = x.shape[0]
    total_kl = 0.0
    total_nll = 0.0
    for i in range(b):
        ti = times[i, mask[i]]
        xi = x[i, mask[i]]           # ragged slicing, reference-style
        mu_i = ref_mlp_forward(
            enc, xi, enc_layers, "mean_head", final_sigmoid=False
        )
        total_kl += ref_kl_full_gp(mu_i, ti, ls_q, ls_p, noise)
        zi = z_sample[i, mask[i]]    # same latent draw as the framework
        probs_i = ref_mlp_forward(
            dec, zi, dec_layers, "logits_head", final_sigmoid=True
        )
        total_nll += ref_bernoulli_nll(xi, probs_i)
    return {
        "kl": total_kl,
        "nll": total_nll,
        "loss": (total_nll + beta * total_kl) / b,
    }
