"""A/B: classical Durbin scan vs blocked Schur/Durbin on the TPU.

Measures ``durbin_gs_factors`` (the production entry: logdet + GS inverse
generators) under the saturated barrier-chained fori_loop ruler at
T in {1024, 2048, 4096}, plus the full structured-prior KL
(``gp.gp_kl_toeplitz_prior``) and the dense-prior KL arm for the
crossover decision (VERDICT r3 #9).

Usage:  python benchmarks/prof_durbin.py [nb ...]
        GPVAE_DURBIN_BLOCK picks the blocked width per subprocess-free
        A/B arm via the GPVAE_DURBIN_BLOCK env var (re-read per call,
        the traced program, which differs per width — safe in-process).
"""
from __future__ import annotations

import statistics
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from gpvae_tpu import gp, kernels, toeplitz

_LAT = None


def latency():
    global _LAT
    if _LAT is not None:
        return _LAT
    a = jnp.ones((8, 128), jnp.float32)
    f = jax.jit(jnp.sum)
    float(f(a))
    ss = []
    for _ in range(7):
        t0 = time.perf_counter()
        float(f(a))
        ss.append(time.perf_counter() - t0)
    _LAT = statistics.median(ss)
    return _LAT


def timed(run, reps=3):
    float(run())
    lat = latency()
    trials = []
    for _ in range(reps):
        t0 = time.perf_counter()
        v = run()
        float(v)
        trials.append(max(time.perf_counter() - t0 - lat, 1e-9))
    return statistics.median(trials)


def bench_gs(t, z=2, inner=None):
    """durbin_gs_factors ms/op for the current dispatch setting."""
    if inner is None:
        inner = max(1, int(300e6 // (t * t)))  # rough work scaling
    row = kernels.toeplitz_row(
        t, 60.0 / t, jnp.asarray([9.0, 3.0], jnp.float32)[:z], noise=1e-3
    )

    @jax.jit
    def run(row):
        def body(_, acc):
            r, _a = jax.lax.optimization_barrier((row, acc))
            ld, a, b, e = toeplitz.durbin_gs_factors(r)
            return acc + ld.sum() + a[..., -1].sum() + b[..., 1].sum() + e.sum()
        return jax.lax.fori_loop(0, inner, body, jnp.float32(0.0))

    dt = timed(lambda: run(row)) / inner
    return dt * 1e3


def check_accuracy(t, z=2):
    """fp32 on-chip blocked vs fp64 host scan."""
    ls = np.asarray([9.0, 3.0][:z])
    tt = np.arange(t) * (60.0 / t)
    rows64 = np.stack([
        (1 - 1e-3) * np.exp(-(tt ** 2) / (2 * l * l)) for l in ls
    ])
    rows64[:, 0] += 1e-3
    ld, a, b, e = toeplitz.durbin_gs_factors(
        jnp.asarray(rows64, jnp.float32)
    )
    ld, a, e = np.asarray(ld, np.float64), np.asarray(a, np.float64), np.asarray(e, np.float64)
    errs = []
    for i in range(z):
        dense = (1 - 1e-3) * np.exp(
            -((tt[:, None] - tt[None, :]) ** 2) / (2 * ls[i] ** 2)
        ) + 1e-3 * np.eye(t)
        want = np.linalg.slogdet(dense)[1]
        errs.append(abs(ld[i] - want) / abs(want))
    return max(errs)


def bench_kl(t=1024, b=8, z=2, inner=64):
    rng = np.random.default_rng(0)
    times = jnp.broadcast_to(
        jnp.arange(t, dtype=jnp.float32) * (60.0 / t), (b, t)
    )
    mu = jnp.asarray(rng.standard_normal((b, t, z)), jnp.float32)
    ls_q = jnp.asarray([5.0, 2.0], jnp.float32)[:z]
    ls_p = jnp.asarray([9.0, 3.0], jnp.float32)[:z]
    l_q = gp.chol_gram_bank(times[:1], ls_q)

    @jax.jit
    def dense(times, ls_p, mu):
        def body(_, acc):
            tt, ls, m_, _a = jax.lax.optimization_barrier((times, ls_p, mu, acc))
            l_p = gp.chol_gram_bank(tt[:1], ls)
            return acc + jnp.sum(gp.gp_kl(m_, l_q, l_p))
        return jax.lax.fori_loop(0, inner, body, jnp.float32(0.0))

    @jax.jit
    def toep(times, ls_p, mu):
        def body(_, acc):
            tt, ls, m_, _a = jax.lax.optimization_barrier((times, ls_p, mu, acc))
            row = kernels.toeplitz_row(t, tt[0, 1] - tt[0, 0], ls)
            return acc + jnp.sum(gp.gp_kl_toeplitz_prior(m_, l_q, row))
        return jax.lax.fori_loop(0, inner, body, jnp.float32(0.0))

    d = timed(lambda: dense(times, ls_p, mu)) / inner * 1e3
    tp = timed(lambda: toep(times, ls_p, mu)) / inner * 1e3
    return d, tp


def main():
    widths = [int(w) for w in sys.argv[1:]] or [0, 32, 64, 128]
    print(f"latency {latency()*1e3:.1f} ms")
    for t in (1024, 2048, 4096):
        line = [f"T={t}"]
        for nb in widths:
            os.environ["GPVAE_DURBIN_BLOCK"] = str(nb)
            ms = bench_gs(t)
            tag = "scan" if nb == 0 else f"nb={nb}"
            line.append(f"{tag} {ms:.3f}ms")
        print("gs_factors  " + "  ".join(line), flush=True)
    os.environ["GPVAE_DURBIN_BLOCK"] = "128"
    for t in (1024, 4096):
        print(f"accuracy T={t}: blocked fp32 logdet rel err "
              f"{check_accuracy(t):.3e}", flush=True)
    for nb in widths:
        os.environ["GPVAE_DURBIN_BLOCK"] = str(nb)
        d, tp = bench_kl()
        tag = "scan" if nb == 0 else f"nb={nb}"
        print(f"prior-KL T=1024 ({tag}): dense {d:.2f}ms  toeplitz {tp:.2f}ms",
              flush=True)


if __name__ == "__main__":
    main()
