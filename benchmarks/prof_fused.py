"""Per-component timing of the fused-gram in-place path (pallas_big.
cholesky_gram_inplace) — the production covariance op.

Answers where the milliseconds go at a given (T, N, nb): k00 gram +
chol_and_inv, gram_init_l, each deferred hist step, the per-step diag
chol_and_inv / final chol_wide, diag writeback, and the whole op —
saturated device-side fori_loop timing (see bench.timed_median caveats).

Run ON TPU:  python benchmarks/prof_fused.py [T] [nb]
"""
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from gpvae_tpu import kernels as kernels_lib  # noqa: E402
from gpvae_tpu.ops import chol, pallas_big  # noqa: E402


def main():
    t = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    n = {128: 1024, 256: 512, 512: 256, 1024: 128, 2048: 32}[t]
    rng = np.random.default_rng(1)
    times = jnp.asarray(
        np.sort(rng.uniform(0, t, (n, t)), -1).astype(np.float32)
    )
    ls = jnp.full((n,), 5.0, jnp.float32)
    var = jnp.ones((n,), jnp.float32)
    lsb = jnp.broadcast_to(ls[:, None], (n, 128))
    varb = jnp.broadcast_to(var[:, None], (n, 128))
    mk = jnp.ones((n, t), jnp.float32)
    noise = 1e-2

    l_full = jnp.asarray(np.asarray(
        pallas_big.cholesky_gram_inplace(times, ls, None, var, noise=noise,
                                         nb=nb)
    ))
    k00 = kernels_lib.gram(
        times[:, :nb], ls[:, None, None], noise=noise,
        variance=var[:, None, None],
    )
    ld0, ldi0 = chol.chol_and_inv(k00)
    float(jnp.sum(l_full) + jnp.sum(ld0))

    z = jnp.ones((8, 128), jnp.float32)
    tiny = jax.jit(jnp.sum)
    float(tiny(z))
    lat = statistics.median(
        [
            (lambda t0: (float(tiny(z)), time.perf_counter() - t0)[1])(
                time.perf_counter()
            )
            for _ in range(7)
        ]
    )
    print(f"T={t} N={n} nb={nb}   lat {lat * 1e3:.1f} ms")

    def bench(fn, args, label, inner=32, reps=3, scale=1):
        @jax.jit
        def run(*args):
            def body(_, acc):
                a0, _a = jax.lax.optimization_barrier((args[0], acc))
                out = fn(a0, *args[1:])
                out = jax.lax.optimization_barrier(out)
                leaf = jax.tree_util.tree_leaves(out)[0]
                return acc + jnp.sum(leaf[..., 0, :1])

            return jax.lax.fori_loop(0, inner, body, jnp.float32(0.0))

        float(run(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(*args))
            ts.append((time.perf_counter() - t0 - lat) / inner)
        dt = statistics.median(ts)
        tag = f" x{scale}" if scale != 1 else ""
        print(f"{label:28s} {dt * 1e6:7.0f} us{tag}")
        return dt * scale

    nblocks = t // nb
    total = 0.0
    total += bench(
        lambda tt: chol.chol_and_inv(kernels_lib.gram(
            tt[:, :nb], ls[:, None, None], noise=noise,
            variance=var[:, None, None]))[0],
        (times,), "k00 gram+chol_and_inv",
    )
    if nblocks == 1:
        print(f"single block; total ~ {total * 1e3:.2f} ms")
        return
    total += bench(
        lambda tt: pallas_big._gram_init_l_jit(
            tt, mk, lsb, varb, ld0, ldi0, nb, "rbf", noise, False),
        (times,), "gram_init_l",
    )
    # step b=1 is the non-deferred hist2
    total += bench(
        lambda l: pallas_big._gram_hist2_jit(
            l, times, mk, lsb, varb, 1, nb, "rbf", noise, False),
        (l_full,), "gram_hist2 b=1",
    )
    # deferred steps b=2..nblocks-1
    for b in range(2, nblocks):
        r = t - b * nb
        sub_prev = jnp.asarray(
            np.asarray(l_full[:, (b - 1) * nb + nb:, :nb])
        )  # stand-in with the right [n, r, nb] shape
        total += bench(
            lambda l, b=b, sp=sub_prev:
                pallas_big._gram_hist2_defer_jit(
                    l.copy(), times, mk, lsb, varb, sp, ldi0,
                    b, nb, "rbf", noise, False),
            (l_full,), f"defer b={b} (+l copy)",
        )
    # per-step diag factor+inverse (same shape every step)
    total += bench(
        lambda d: chol.chol_and_inv(d), (ld0 @ jnp.swapaxes(ld0, -1, -2),),
        "chol_and_inv(diag)", scale=nblocks - 2,
    )
    total += bench(
        lambda d: chol.chol_wide(d), (ld0 @ jnp.swapaxes(ld0, -1, -2),),
        "chol_wide(final diag)",
    )
    total += bench(
        lambda l: pallas_big._writeback_diag_only(l.copy(), ld0, 1, nb),
        (l_full,), "diag writeback (+l copy)", scale=nblocks - 1,
    )
    print(f"sum of parts ~ {total * 1e3:.2f} ms")

    whole = bench(
        lambda tt: pallas_big.cholesky_gram_inplace(
            tt, ls, None, var, noise=noise, nb=nb),
        (times,), "WHOLE cholesky_gram_inplace", inner=16,
    )
    tf = n * t ** 3 / 3.0 / whole / 1e12
    print(f"whole op {whole * 1e3:.3f} ms  -> {tf:.2f} TF/s (chol flops)")


if __name__ == "__main__":
    main()
