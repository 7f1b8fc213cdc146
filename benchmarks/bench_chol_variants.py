"""Variant shootout for the large-T batched Cholesky (round-2 roofline work).

Measures chol+logdet TFLOP/s at T=1024/256 across: blocked nb=128 (round-1
default), blocked nb=256/512 (wide diag blocks via the recursive
chol_and_inv split), the pure recursive whole-matrix split, and XLA native.

Run ON TPU from /root/repo:  python benchmarks/bench_chol_variants.py
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from gpvae_tpu.ops import chol, logdet_from_chol


def make_k(n, t, seed=0):
    rng = np.random.default_rng(seed)
    times = np.sort(rng.uniform(0, t, (n, t)), -1).astype(np.float32)
    dt = times[:, :, None] - times[:, None, :]
    k = 0.999 * np.exp(-(dt**2) / (2.0 * (t / 10.0) ** 2))
    k += 1e-3 * np.eye(t, dtype=np.float32)
    return jnp.asarray(k, jnp.float32)


def sync(x):
    return float(jnp.sum(x))


def timeit(fn, k, roundtrip, reps=3, inner=4):
    """Device-looped timing: the op runs ``inner`` times inside one jitted
    fori_loop, chained through a ~ulp data dependency.  Single-dispatch
    wall timing on this remote image measured up to 2.6x too fast for
    sub-ms work (docs/DESIGN.md)."""
    @jax.jit
    def run(kd):
        def body(_, carry):
            scale, acc = carry
            acc = acc + jnp.sum(fn(kd * scale))
            return 1.0 + acc * 1e-24, acc

        _, acc = jax.lax.fori_loop(
            0, inner, body, (jnp.float32(1.0), jnp.float32(0.0))
        )
        return acc

    float(run(k))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(k))
        ts.append((time.perf_counter() - t0 - roundtrip) / inner)
    return float(np.median(ts))


def chol_flops(n, t):
    # factorization T^3/3 + logdet (negligible)
    return n * (t**3) / 3.0


def main():
    import sys
    only = sys.argv[1:] or None
    # roundtrip cost of the host sync itself
    z = jnp.zeros((8, 128), jnp.float32)
    sync(z)
    t0 = time.perf_counter()
    for _ in range(5):
        sync(z)
    roundtrip = (time.perf_counter() - t0) / 5
    print(f"host roundtrip: {roundtrip*1e3:.1f} ms")


    variants = {
        "blocked_nb128": functools.partial(chol.cholesky_blocked,
                                           block_size=128),
        "blocked_left": chol.cholesky_blocked_left,
        "blocked_fused": chol.cholesky_blocked_fused,
        "recursive_cholinv": lambda k: chol.chol_and_inv(k)[0],
        "xla": chol.cholesky_xla,
    }

    for (n, t) in [(128, 1024), (512, 256)]:
        k = make_k(n, t)
        kd = np.asarray(k, np.float64)
        l64 = np.linalg.cholesky(kd)
        fl = chol_flops(n, t)
        print(f"\n== N={n} T={t} ==", flush=True)
        for name, fn in variants.items():
            if only and name not in only:
                continue
            jfn = jax.jit(lambda kk, f=fn: (
                lambda l: (l, logdet_from_chol(l[:, None])))(f(kk))[0])
            try:
                dt = timeit(jfn, k, roundtrip)
                l = np.asarray(jfn(k))
                err = np.max(np.abs(np.tril(l) - l64)) / np.max(np.abs(l64))
                print(f"  {name:20s} {dt*1e3:8.2f} ms  "
                      f"{fl/dt/1e12:6.2f} TFLOP/s  relerr={err:.2e}",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"  {name:20s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
