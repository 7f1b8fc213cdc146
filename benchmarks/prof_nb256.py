"""Same-process A/B: fused gram+Cholesky+logdet at T=1024 N=128 with
nb=128 (production) vs nb=256 (halved history re-read traffic; 256-wide
diagonal blocks glued at the XLA level from the fused 128 kernels).

The left-looking schedule's dominant HBM stream is the history panel
re-read: sum_b (T - b*nb)*(b-1)*nb*N*4 bytes — 470 MB at nb=128 vs 134 MB
at nb=256 (T=1024, N=128).  VERDICT r3 next #1.

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/prof_nb256.py
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import time

import jax
import jax.numpy as jnp
import numpy as np

import bench
from gpvae_tpu.ops import pallas_big
from gpvae_tpu.ops.logdet import logdet_from_chol

T, N = 1024, 128


def run_variant(times, ls, var, nb, inner=96, reps=3):
    @jax.jit
    def run(times):
        def body(_, acc):
            tt, _a = jax.lax.optimization_barrier((times, acc))
            l = pallas_big.cholesky_gram_inplace(tt, ls, None, var,
                                                 noise=1e-2, nb=nb)
            ld = logdet_from_chol(l)
            l = jax.lax.optimization_barrier(l)
            return acc + ld.sum() + jnp.sum(l[..., 0, :1])
        return jax.lax.fori_loop(0, inner, body, jnp.float32(0.0))

    t0 = time.perf_counter()
    float(run(times))
    print(f"  nb={nb} compile+warm {time.perf_counter()-t0:.0f}s", flush=True)
    dt = bench.timed_median(lambda: run(times), reps) / inner
    tf = N * (T ** 3) / 3.0 / dt / 1e12
    print(f"  nb={nb}: {dt*1e3:.3f} ms  = {tf:.2f} TF/s", flush=True)
    return dt


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(1)
    times = jnp.asarray(
        np.sort(rng.uniform(0, T, (N, T)), -1).astype(np.float32)
    )
    ls = jnp.full((N,), 5.0, jnp.float32)
    var = jnp.ones((N,), jnp.float32)
    float(jnp.sum(times))

    # correctness first: both block sizes vs each other and fp64 on a slice
    l128 = jax.jit(lambda tt: pallas_big.cholesky_gram_inplace(
        tt, ls, None, var, noise=1e-2, nb=128))(times)
    l256 = jax.jit(lambda tt: pallas_big.cholesky_gram_inplace(
        tt, ls, None, var, noise=1e-2, nb=256))(times)
    a = np.asarray(l128[:4]); b = np.asarray(l256[:4])
    from gpvae_tpu import kernels as kernels_lib
    k64 = np.asarray(jax.jit(lambda tt: kernels_lib.gram(
        tt[:4], ls[:4, None, None], noise=1e-2,
        variance=var[:4, None, None]))(times)).astype(np.float64)
    lref = np.linalg.cholesky(k64)
    scale = np.abs(lref).max()
    print(f"nb128 vs fp64: {np.abs(a - lref).max()/scale:.2e}  "
          f"nb256 vs fp64: {np.abs(b - lref).max()/scale:.2e}  "
          f"128 vs 256: {np.abs(a - b).max()/scale:.2e}", flush=True)

    # interleaved A/B, twice
    for rnd in range(2):
        print(f"round {rnd}:", flush=True)
        run_variant(times, ls, var, 128)
        run_variant(times, ls, var, 256)


if __name__ == "__main__":
    main()
