"""Toeplitz structured-prior KL paths (BASELINE config 3 integration):
the Durbin/Gohberg-Semencul prior must match the dense-prior KLs exactly
on uniform grids, end to end through the model."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gpvae_tpu import configs, gp, kernels
from gpvae_tpu.models import GPVAE, GPVAEConfig


def _uniform_setup(b=3, t=64, z=2, seed=0):
    rng = np.random.default_rng(seed)
    times = jnp.broadcast_to(
        jnp.arange(t, dtype=jnp.float32) * 0.5, (b, t)
    )
    mu = jnp.asarray(rng.standard_normal((b, t, z)), jnp.float32)
    ls_q = jnp.asarray([5.0, 2.0], jnp.float32)[:z]
    ls_p = jnp.asarray([9.0, 3.0], jnp.float32)[:z]
    l_q = gp.chol_gram_bank(times, ls_q)
    l_p = gp.chol_gram_bank(times, ls_p)
    row = kernels.toeplitz_row(t, 0.5, ls_p)
    return times, mu, l_q, l_p, row


@pytest.mark.parametrize("t", [32, 64, 128])
def test_gp_kl_toeplitz_matches_dense(t):
    times, mu, l_q, l_p, row = _uniform_setup(t=t)
    dense = np.asarray(gp.gp_kl(mu, l_q, l_p))
    toep = np.asarray(gp.gp_kl_toeplitz_prior(mu, l_q, row))
    np.testing.assert_allclose(toep, dense, rtol=1e-3, atol=1e-3)


def test_gp_kl_toeplitz_shared_factor():
    times, mu, l_q, l_p, row = _uniform_setup(b=4, t=48)
    dense = np.asarray(gp.gp_kl(mu, l_q[:1], l_p[:1]))
    toep = np.asarray(gp.gp_kl_toeplitz_prior(mu, l_q[:1], row))
    np.testing.assert_allclose(toep, dense, rtol=1e-3, atol=1e-3)


def test_gp_prior_diag_kl_toeplitz_matches_dense():
    times, mu, l_q, l_p, row = _uniform_setup(t=64)
    rng = np.random.default_rng(1)
    log_var = jnp.asarray(
        rng.standard_normal(mu.shape) * 0.3 - 1.0, jnp.float32
    )
    dense = np.asarray(gp.gp_prior_diag_kl(mu, log_var, l_p))
    toep = np.asarray(gp.gp_prior_diag_kl_toeplitz(mu, log_var, row))
    np.testing.assert_allclose(toep, dense, rtol=1e-3, atol=1e-3)


def test_toeplitz_kl_gradients_flow_to_prior_row():
    times, mu, l_q, l_p, row = _uniform_setup(t=48)

    def loss(r):
        return jnp.sum(gp.gp_kl_toeplitz_prior(mu, l_q, r))

    g = np.asarray(jax.grad(loss)(row))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


def _model_pair(t=64):
    base = dict(
        latent_dim=2, obs_dim=15, time_len=t,
        prior="gp", posterior="gp",
        prior_lengthscales=(9.0, 3.0), learn_prior_lengthscales=True,
        posterior_lengthscales=(5.0, 2.0),
        encoder="dense", decoder="dense", shared_time_grid=True,
    )
    return (
        GPVAE(GPVAEConfig(structured_prior="toeplitz", **base)),
        GPVAE(GPVAEConfig(structured_prior="dense", **base)),
    )


def test_model_toeplitz_prior_matches_dense_end_to_end():
    t = 64
    m_toep, m_dense = _model_pair(t)
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.random((4, t, 15)) < 0.4), jnp.float32)
    times = jnp.broadcast_to(jnp.arange(t, dtype=jnp.float32) * 0.9, (4, t))
    mask = jnp.ones((4, t), bool)
    seeds = {"params": jax.random.key(0), "sample": jax.random.key(1)}
    p1 = m_toep.init(seeds, x, times, mask)["params"]
    p2 = m_dense.init(seeds, x, times, mask)["params"]
    out1 = m_toep.apply({"params": p1}, x, times, mask,
                        rngs={"sample": jax.random.key(2)})
    out2 = m_dense.apply({"params": p2}, x, times, mask,
                         rngs={"sample": jax.random.key(2)})
    np.testing.assert_allclose(
        np.asarray(out1.kl), np.asarray(out2.kl), rtol=1e-3
    )
    np.testing.assert_allclose(
        float(out1.loss), float(out2.loss), rtol=1e-3
    )

    # learnable prior lengthscales receive gradient through the scan
    def loss_fn(params):
        out = m_toep.apply({"params": params}, x, times, mask,
                           rngs={"sample": jax.random.key(2)})
        return out.loss

    g = jax.grad(loss_fn)(p1)
    assert "prior_log_ls" in g
    assert np.isfinite(np.asarray(g["prior_log_ls"])).all()
    assert np.abs(np.asarray(g["prior_log_ls"])).max() > 0


def test_t1024_preset_registered_and_auto_threshold():
    p = configs.get("t1024_toeplitz")
    assert p.model.toeplitz_prior
    assert p.model.structured_prior == "toeplitz"
    dp = configs.get("dp_scale")
    assert dp.batch_size == 4096
    # unresolved "auto" behaves as dense; the host-boundary resolution
    # against the first real batch is tested below
    # (test_resolve_structured_prior_auto)
    small = configs.get("full_gp_fixed").model
    assert not small.toeplitz_prior
    auto_big = dataclasses.replace(
        small, time_len=512, structured_prior="auto"
    )
    assert not auto_big.toeplitz_prior  # unresolved auto stays dense
    explicit = dataclasses.replace(
        small, time_len=512, structured_prior="toeplitz"
    )
    assert explicit.toeplitz_prior


def test_resolve_structured_prior_auto():
    """'auto' resolves to DENSE at the host boundary — since the round-3c
    parts-flow factorization the dense prior path is the measured winner
    at every benchmarked size (BASELINE.md round 3c) — while explicit
    settings are validated, not overridden."""
    from gpvae_tpu.models import resolve_structured_prior

    base = configs.get("full_gp_fixed").model
    auto = dataclasses.replace(
        base, time_len=64, structured_prior="auto", shared_time_grid=True
    )
    uniform = np.broadcast_to(
        np.arange(64, dtype=np.float32) * 0.5, (3, 64)
    )
    full = np.ones((3, 64), bool)
    assert resolve_structured_prior(
        auto, uniform, full
    ).structured_prior == "dense"
    ragged = np.sort(np.random.default_rng(0).uniform(0, 60, (3, 64)), -1)
    assert resolve_structured_prior(
        auto, ragged.astype(np.float32), full
    ).structured_prior == "dense"
    # explicit toeplitz on a good grid passes through (validated)
    explicit = dataclasses.replace(auto, structured_prior="toeplitz")
    assert resolve_structured_prior(
        explicit, uniform, full
    ).structured_prior == "toeplitz"
    # explicit toeplitz on a bad grid still raises (validation preserved)
    with pytest.raises(ValueError):
        resolve_structured_prior(explicit, ragged.astype(np.float32), full)
    # explicit dense passes through untouched
    dense = dataclasses.replace(auto, structured_prior="dense")
    assert resolve_structured_prior(dense, uniform, full) is dense


def test_fit_resolves_auto_to_toeplitz():
    """train.fit on a shared uniform grid with structured_prior='auto'
    resolves at the host boundary (to the dense path — the measured
    winner) and trains with finite loss; the model swap is invisible to
    the caller's params."""
    from gpvae_tpu import train as train_lib
    from gpvae_tpu.data.batching import Batcher

    t = 32
    base = configs.get("full_gp_fixed").model
    cfg = dataclasses.replace(
        base, time_len=t, structured_prior="auto", shared_time_grid=True,
        obs_dim=6, latent_dim=2, encoder="dense", decoder="dense",
    )
    model = GPVAE(cfg)
    rng = np.random.default_rng(3)
    arrays = {
        "x": (rng.uniform(size=(16, t, 6)) > 0.5).astype(np.float32),
        "times": np.broadcast_to(
            np.arange(t, dtype=np.float32) * 0.7, (16, t)
        ).copy(),
        "mask": np.ones((16, t), bool),
    }
    batcher = Batcher(arrays, batch_size=8, seed=0)
    tcfg = train_lib.TrainConfig(num_steps=4, log_every=2, steps_per_call=1)
    state, log = train_lib.fit(model, batcher, tcfg, verbose=False)
    losses = [m["loss"] for m in log.rows]
    assert np.isfinite(losses).all()


def test_cli_t1024_preset_smoke(capsys):
    from gpvae_tpu.__main__ import main

    main([
        "train", "--preset", "t1024_toeplitz", "--num-seqs", "16",
        "--time-len", "32", "--steps", "2", "--log-every", "1",
    ])
    assert "done at step 2" in capsys.readouterr().out


def test_prior_draws_circulant_matches_dense_statistics():
    """analysis.prior_draws: the circulant path's draws have the prior's
    covariance (checked against the dense gram at moderate T)."""
    from gpvae_tpu import analysis, kernels

    m_toep, m_dense = _model_pair(t=64)
    times = jnp.arange(64, dtype=jnp.float32) * 0.9
    rng_key = jax.random.key(0)
    x = jnp.zeros((2, 64, 15))
    seeds = {"params": jax.random.key(0), "sample": jax.random.key(1)}
    p = m_toep.init(seeds, x, jnp.broadcast_to(times, (2, 64)),
                    jnp.ones((2, 64), bool))["params"]

    draws = analysis.prior_draws(
        m_toep, p, times, key=rng_key, num_samples=4000
    )
    assert draws.shape == (4000, 64, 2)
    emp = np.einsum("stz,suz->ztu", np.asarray(draws),
                    np.asarray(draws)) / 4000
    ls = np.exp(np.asarray(p["prior_log_ls"]))
    for z in range(2):
        want = np.asarray(kernels.gram(times, float(ls[z])))
        err = np.abs(emp[z] - want).max()
        assert err < 0.15, (z, err)  # MC tolerance at 4000 samples

    d2 = analysis.prior_draws(m_dense, p, times, key=rng_key,
                              num_samples=3)
    assert d2.shape == (3, 64, 2)
    assert np.isfinite(np.asarray(d2)).all()
