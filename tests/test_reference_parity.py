"""Golden ELBO parity with the reference implementation (the north-star
"match reference ELBO within 1e-4", BASELINE.json).

A from-scratch fp64 numpy re-implementation of the reference's *math* —
ragged per-sequence slicing, explicit matrix inverse + logdet KL
(src/Models/syndata/GP_VAE_syn_data.py:168-236), clamped-probability
Bernoulli NLL (:334-341), loss = recon + beta*KL (:346) — evaluated with
the SAME network weights and the SAME latent sample as this framework's
masked static-shape jitted ELBO.  Every term must agree to <=1e-4 relative.
"""
import jax
import jax.numpy as jnp
import numpy as np

from gpvae_tpu.models import GPVAE, GPVAEConfig
# the fp64 oracle lives in the library (it also audits live training
# trajectories via benchmarks/reference_reproduction.py --fp64-check-steps)
from gpvae_tpu.utils.reference_math import (
    ref_bernoulli_nll,
    ref_kl_full_gp,
    ref_mlp_forward,
)


def test_elbo_parity_with_reference_math():
    rng = np.random.default_rng(0)
    b, t, d, z = 6, 14, 15, 2
    beta = 0.37
    # irregular observed-time structure like the toy data
    times = np.sort(rng.uniform(0, 45, (b, t)), -1)
    lengths = rng.integers(8, t + 1, b)
    mask = np.arange(t)[None] < lengths[:, None]
    x = (rng.random((b, t, d)) < 0.4).astype(np.float64) * mask[..., None]

    cfg = GPVAEConfig(
        latent_dim=z, obs_dim=d, time_len=t,
        prior="gp", posterior="gp",
        prior_lengthscales=(9.0, 3.0), posterior_lengthscales=(5.0, 2.0),
    )
    model = GPVAE(cfg)
    xx = jnp.asarray(x, jnp.float32)
    tt = jnp.asarray(times, jnp.float32)
    mm = jnp.asarray(mask)
    variables = model.init(
        {"params": jax.random.key(0), "sample": jax.random.key(1)},
        xx, tt, mm,
    )
    params = variables["params"]

    # --- framework ELBO (jitted, fp32, masked static shapes) -------------
    out = jax.jit(
        lambda p: model.apply(
            p, xx, tt, mm, beta=beta, rngs={"sample": jax.random.key(7)}
        )
    )(variables)
    z_sample = np.asarray(out.latent_sample[0], np.float64)  # [B, T, Z]

    # --- reference math, fp64, ragged ------------------------------------
    enc = params["encoder_net"]
    enc_layers = [k for k in enc if k.startswith("Dense_")]
    enc_layers.sort(key=lambda s: int(s.split("_")[1]))
    dec = params["decoder_net"]
    dec_layers = [k for k in dec if k.startswith("Dense_")]
    dec_layers.sort(key=lambda s: int(s.split("_")[1]))

    ls_q = np.exp(np.asarray(params["posterior_log_ls"], np.float64))
    ls_p = np.array([9.0, 3.0])

    total_kl_ref = 0.0
    total_nll_ref = 0.0
    for i in range(b):
        ti = times[i, mask[i]]
        xi = x[i, mask[i]]           # ragged slicing, reference-style
        mu_i = ref_mlp_forward(
            enc, xi, enc_layers, "mean_head", final_sigmoid=False
        )
        total_kl_ref += ref_kl_full_gp(mu_i, ti, ls_q, ls_p)
        zi = z_sample[i, mask[i]]    # same latent draw as the framework
        probs_i = ref_mlp_forward(
            dec, zi, dec_layers, "logits_head", final_sigmoid=True
        )
        total_nll_ref += ref_bernoulli_nll(xi, probs_i)

    kl_fw = float(jnp.sum(out.kl))
    nll_fw = float(jnp.sum(out.nll))
    loss_ref = (total_nll_ref + beta * total_kl_ref) / b
    loss_fw = float(out.loss)

    assert abs(kl_fw - total_kl_ref) / abs(total_kl_ref) < 1e-4, (
        kl_fw, total_kl_ref
    )
    assert abs(nll_fw - total_nll_ref) / abs(total_nll_ref) < 1e-4, (
        nll_fw, total_nll_ref
    )
    assert abs(loss_fw - loss_ref) / abs(loss_ref) < 1e-4, (
        loss_fw, loss_ref
    )
