"""Accuracy at the SHIPPED presets' own conditioning (VERDICT r4 weak #4 /
next #6).

Earlier accuracy bands were quoted at bench conditioning (ls=5, noise
1e-2); the presets users actually run are harder: the t1024 presets put
ls=[9, 3] on a 0..60 grid (spacing 0.0586 — the lengthscale spans ~150
grid steps, near-singular), healing runs a Cauchy kernel, sparse_t4096
an ls=256 RBF over 0..4095.  This script measures, ON THE CHIP, at each
preset's exact grid:

* max Cholesky factor error vs the fp64 oracle,
* GP-KL relative error vs the fp64 reference formulas
  (utils/reference_math.ref_kl_full_gp),
* posterior-lengthscale gradient relative error vs an fp64 numpy
  central difference through the same fp64 KL.

Output: one markdown table (pasted into BASELINE.md) + a JSON line.
"""
from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def _kl_chip(times, mask, mu, ls_q, ls_p, kernel="rbf", noise=1e-3):
    import jax
    import jax.numpy as jnp

    from gpvae_tpu import gp

    @jax.jit
    def f(mu, log_ls_q):
        l_q = gp.chol_gram_bank(
            times, jnp.exp(log_ls_q), mask=mask, kernel=kernel, noise=noise
        )
        l_p = gp.chol_gram_bank(
            times, ls_p, mask=mask, kernel=kernel, noise=noise
        )
        kl = gp.gp_kl(mu, l_q, l_p, mask=mask)
        return jnp.sum(kl), (kl, l_q)

    (tot, (kl, l_q)), grad = jax.value_and_grad(f, argnums=1, has_aux=True)(
        mu, jnp.log(ls_q)
    )
    return np.asarray(kl), np.asarray(l_q), np.asarray(grad)


def _kl_fp64(times, mask, mu, ls_q, ls_p, noise=1e-3):
    """fp64 reference KL per (b): sum over z, ragged (mask-sliced)."""
    from gpvae_tpu.utils.reference_math import ref_kl_full_gp

    out = []
    for b in range(mu.shape[0]):
        m = np.asarray(mask[b])
        out.append(ref_kl_full_gp(
            np.asarray(mu[b])[m], np.asarray(times[b], np.float64)[m],
            np.asarray(ls_q, np.float64), np.asarray(ls_p, np.float64),
            noise,
        ))
    return np.asarray(out)


def _grad_fp64(times, mask, mu, ls_q, ls_p, noise=1e-3, h=1e-5):
    """Central difference d(sum KL)/d(log ls_q) in fp64."""
    g = np.zeros(len(ls_q))
    for d in range(len(ls_q)):
        for s, sign in ((h, 1.0), (-h, -1.0)):
            lsq = np.asarray(ls_q, np.float64).copy()
            lsq[d] = np.exp(np.log(lsq[d]) + s)
            g[d] += sign * _kl_fp64(times, mask, mu, lsq, ls_p, noise).sum()
    return g / (2 * h)


def preset_t1024():
    """t1024_toeplitz / dense: shared 0..60 grid, ls=[9,3], noise 1e-3."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    b, t, z = 4, 1024, 2
    times = jnp.broadcast_to(
        jnp.linspace(0.0, 60.0, t, dtype=jnp.float32), (b, t)
    )
    mask = jnp.ones((b, t), bool)
    mu = jnp.asarray(rng.standard_normal((b, t, z)).astype(np.float32) * 0.3)
    return dict(times=times, mask=mask, mu=mu,
                ls_q=jnp.asarray([5.0, 2.0]), ls_p=jnp.asarray([9.0, 3.0]),
                kernel="rbf", name="t1024 (0..60 grid, ls=[9,3])")


def preset_toy():
    """syn_data: T<=45 irregular masked times 0..60."""
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    b, t, z = 20, 45, 2
    times = jnp.asarray(
        np.sort(rng.uniform(0, 60, (b, t)), -1).astype(np.float32)
    )
    mask = jnp.asarray(
        np.arange(t)[None] < rng.integers(25, t + 1, b)[:, None]
    )
    mu = jnp.asarray(
        (rng.standard_normal((b, t, z)) * np.asarray(mask)[..., None]
         ).astype(np.float32) * 0.3
    )
    return dict(times=times, mask=mask, mu=mu,
                ls_q=jnp.asarray([5.0, 2.0]), ls_p=jnp.asarray([9.0, 3.0]),
                kernel="rbf", name="toy (T=45 irregular)")


def preset_healing():
    """healing_mnist: T=10 grid 0..9, Cauchy ls=2."""
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    b, t, z = 16, 10, 4
    times = jnp.broadcast_to(jnp.arange(t, dtype=jnp.float32), (b, t))
    mask = jnp.ones((b, t), bool)
    mu = jnp.asarray(rng.standard_normal((b, t, z)).astype(np.float32) * 0.3)
    return dict(times=times, mask=mask, mu=mu,
                ls_q=jnp.asarray([2.0] * z), ls_p=jnp.asarray([2.0] * z),
                kernel="cauchy", name="healing (T=10, Cauchy ls=2)")


def run_one(cfg) -> dict:
    from gpvae_tpu import kernels as kernels_lib

    kl_chip, l_chip, grad_chip = _kl_chip(
        cfg["times"], cfg["mask"], cfg["mu"], cfg["ls_q"], cfg["ls_p"],
        kernel=cfg["kernel"],
    )
    # factor error vs fp64 (numpy chol of the fp64 gram, masked form)
    k = np.asarray(kernels_lib.gram_bank(
        cfg["times"], cfg["ls_q"], mask=cfg["mask"], kernel=cfg["kernel"],
    ), np.float64)
    l64 = np.linalg.cholesky(k)
    factor_err = float(np.abs(l_chip - l64).max())

    out = {"factor_err": factor_err}
    if cfg["kernel"] == "rbf":
        kl64 = _kl_fp64(cfg["times"], cfg["mask"], cfg["mu"],
                        np.asarray(cfg["ls_q"]), np.asarray(cfg["ls_p"]))
        kl_chip_seq = kl_chip.sum(-1)
        out["kl_rel"] = float(
            np.abs(kl_chip_seq - kl64).max() / np.abs(kl64).max()
        )
        g64 = _grad_fp64(cfg["times"], cfg["mask"], cfg["mu"],
                         np.asarray(cfg["ls_q"]), np.asarray(cfg["ls_p"]))
        out["grad_rel"] = float(
            np.abs(grad_chip - g64).max() / np.abs(g64).max()
        )
    return out


def main():
    rows = {}
    for mk in (preset_toy, preset_t1024, preset_healing):
        cfg = mk()
        rows[cfg["name"]] = run_one(cfg)
        print(cfg["name"], rows[cfg["name"]], flush=True)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
