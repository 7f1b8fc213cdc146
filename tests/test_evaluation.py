"""Imputation metrics + plotting artifacts + evaluate CLI."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from gpvae_tpu import analysis
from gpvae_tpu.__main__ import main
from gpvae_tpu.utils import plotting
from tests.test_analysis import _trained_toy_model


def test_imputation_metrics_gp_beats_baseline():
    """A trained GP-VAE's GP imputation should beat the N(0,1)-fill
    baseline on held-out dropped steps (the qualitative claim of the
    reference's comparison grids, quantified)."""
    # overfit regime: enough training that encoder latents carry signal —
    # then GP conditioning on kept steps must beat uninformed N(0,1) fill
    model, params, batch = _trained_toy_model(t=16, num_seqs=8, steps=300)
    x = jnp.asarray(batch["x"])
    times = jnp.asarray(batch["times"])
    mask = jnp.asarray(batch["mask"])
    metrics = analysis.imputation_metrics(
        model, params, x, times, mask, key=jax.random.key(0),
        drop_fraction=0.3,
    )
    assert metrics["dropped_steps"] > 0
    assert np.isfinite(metrics["nll_gp_impute"])
    assert metrics["nll_gp_impute"] < metrics["nll_baseline"], metrics


def test_plotting_artifacts(tmp_path):
    rng = np.random.default_rng(0)
    frames = rng.random((6, 28, 28)).astype(np.float32)
    p1 = plotting.film_strip(frames, str(tmp_path / "strip.png"))
    assert os.path.getsize(p1) > 0
    p2 = plotting.comparison_grid(
        {"input": frames, "recon": frames * 0.5},
        str(tmp_path / "grid.png"),
        kept_mask=np.array([True, False, True, True, False, True]),
    )
    assert os.path.getsize(p2) > 0
    p3 = plotting.trajectory_plot(
        np.arange(10.0), rng.standard_normal((10, 2)),
        str(tmp_path / "traj.png"),
        mask=np.arange(10) % 2 == 0,
    )
    assert os.path.getsize(p3) > 0


def test_evaluate_cli(tmp_path, capsys):
    main([
        "evaluate", "--preset", "syn_data", "--time-len", "12",
        "--num-seqs", "32", "--eval-batch", "4",
        "--plots", str(tmp_path / "plots"),
    ])
    out = capsys.readouterr().out
    assert "nll_gp_impute" in out
    assert os.path.exists(tmp_path / "plots" / "latents.png")


def test_evaluate_cli_with_traversal(tmp_path, capsys):
    main([
        "evaluate", "--preset", "syn_data", "--time-len", "10",
        "--num-seqs", "24", "--eval-batch", "2",
        "--plots", str(tmp_path / "p"), "--traversal", "1",
    ])
    assert os.path.exists(tmp_path / "p" / "traversal.png")
