"""Healing-MNIST regime: per-pixel masks through the ELBO, training on
corrupted inputs, missing-pixel imputation beats the marginal baseline."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gpvae_tpu import analysis, configs, elbo as elbo_lib, train as train_lib
from gpvae_tpu.data import Batcher, make_healing_batch
from gpvae_tpu.models import GPVAE


def test_feature_mask_nll_semantics():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((1, 2, 3, 4, 4, 1))
    x = (rng.random((2, 3, 4, 4, 1)) < 0.5).astype(np.float64)
    fmask = rng.random((2, 3, 4, 4, 1)) < 0.6
    got = elbo_lib.bernoulli_nll(
        jnp.asarray(logits), jnp.asarray(x), None, jnp.asarray(fmask)
    )
    elem = np.logaddexp(0.0, logits[0]) - x * logits[0]
    want = (elem * fmask).sum(axis=(1, 2, 3, 4))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_healing_batch_contract():
    batch = make_healing_batch(6, t=5, size=28, missing_fraction=0.4)
    assert batch["x"].shape == (6, 5, 28, 28, 1)
    assert batch["feature_mask"].shape == (6, 5, 28, 28, 1)
    # corrupted input is zero-filled at missing pixels
    assert np.all(batch["x"][~batch["feature_mask"]] == 0.0)
    # clean frames are binary and temporally structured (consecutive frames
    # correlate strongly)
    x = batch["x_clean"][..., 0]
    corr = np.mean([
        np.corrcoef(x[i, 0].ravel(), x[i, 1].ravel())[0, 1]
        for i in range(6)
    ])
    assert corr > 0.5


def test_healing_training_and_imputation():
    # tiny overfit run on the healing preset (shrunk): the trained model's
    # missing-pixel reconstruction must beat the marginal-rate baseline
    batch = make_healing_batch(8, t=6, size=28, missing_fraction=0.5)
    preset = configs.get("healing_mnist")
    cfg = dataclasses.replace(
        preset.model, time_len=6, latent_dim=8,
        posterior_lengthscales=(2.0,), prior_lengthscales=(2.0,),
    )
    model = GPVAE(cfg)

    arrays = {k: batch[k] for k in ("x", "times", "mask", "feature_mask")}
    batcher = Batcher(arrays, 8)

    import optax
    state, tx = train_lib.create_train_state(
        model, batch, train_lib.TrainConfig(learning_rate=2e-3)
    )

    @jax.jit
    def step(state, b):
        def loss_fn(params):
            out = model.apply(
                {"params": params}, b["x"], b["times"], b["mask"],
                beta=1e-3, feature_mask=b["feature_mask"],
                rngs={"sample": jax.random.fold_in(state.rng, state.step)},
            )
            return out.loss
        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        return train_lib.TrainState(
            params=optax.apply_updates(state.params, updates),
            opt_state=opt_state, step=state.step + 1, rng=state.rng,
        ), loss

    b = {k: jnp.asarray(v) for k, v in arrays.items()}
    b["times"] = b["times"].astype(jnp.float32)
    losses = []
    for _ in range(60):
        state, loss = step(state, b)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])

    metrics = analysis.pixel_imputation_metrics(
        model, state.params, batch, key=jax.random.key(1)
    )
    assert metrics["missing_pixels"] > 0
    assert np.isfinite(metrics["nll_model"])
    assert metrics["nll_model"] < metrics["nll_marginal_baseline"], metrics


def test_cli_evaluate_healing_uses_pixel_metrics(tmp_path, capsys):
    """evaluate on the healing preset scores missing pixels against the
    clean targets (pixel_imputation_metrics), not timestep drops."""
    import json

    from gpvae_tpu.__main__ import main

    main([
        "train", "--preset", "healing_mnist", "--num-seqs", "24",
        "--time-len", "3", "--steps", "2", "--log-every", "1",
        "--batch-size", "8", "--ckpt-dir", str(tmp_path / "ck"),
    ])
    capsys.readouterr()
    main([
        "evaluate", "--preset", "healing_mnist", "--num-seqs", "24",
        "--time-len", "3", "--eval-batch", "2", "--batch-size", "8",
        "--ckpt-dir", str(tmp_path / "ck"),
    ])
    out = capsys.readouterr().out
    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    metrics = json.loads(line)
    assert "missing_pixels" in json.dumps(metrics) or any(
        "pixel" in k or "missing" in k for k in metrics
    ), metrics
