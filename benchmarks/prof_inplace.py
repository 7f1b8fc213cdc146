"""Per-component timing of the in-place left-looking path (pallas_big).

Answers where the T=1024 milliseconds go: init_l, each hist_panel_split
step, col_writeback, chol_and_inv — saturated device-side fori_loop
timing (see bench.timed_median caveats).

Run ON TPU:  python benchmarks/prof_inplace.py [T] [nb]
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
    n = {256: 512, 512: 256, 1024: 128, 2048: 32}[t]
    rng = np.random.default_rng(1)
    times = jnp.asarray(
        np.sort(rng.uniform(0, t, (n, t)), -1).astype(np.float32)
    )
    kd = jax.jit(
        lambda tt: kernels_lib.gram_bank(
            tt, jnp.array([5.0], jnp.float32), noise=1e-2
        )[:, 0]
    )(times)
    l_full = jnp.asarray(np.asarray(pallas_big.cholesky_inplace(kd, nb=nb)))
    ld0, ldi0 = chol.chol_and_inv(kd[:, :nb, :nb])
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
    print(f"lat {lat * 1e3:.1f} ms")

    def bench(fn, args, label, inner=32, reps=3):
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
        print(f"{label:24s} {dt * 1e6:7.0f} us")
        return dt

    total = 0.0
    total += bench(
        lambda k: pallas_big.init_l(k, ld0, ldi0, nb), (kd,), "init_l"
    )
    total += bench(
        lambda k: chol.chol_and_inv(k[:, :nb, :nb])[0], (kd,), "chol_and_inv"
    ) * (t // nb - 1)
    nblocks = t // nb
    for b in range(1, nblocks - 1):
        total += bench(
            lambda l, k, b=b: pallas_big.hist_panel_split(l, k, b, nb),
            (l_full, kd),
            f"hist_split b={b}",
        )
    total += bench(
        lambda l, k: pallas_big.hist_panel(l, k, nblocks - 1, nb),
        (l_full, kd),
        f"hist b={nblocks - 1} (last)",
    )
    # writeback at a middle step
    b = nblocks // 2
    sub = jnp.asarray(np.asarray(l_full[:, (b + 1) * nb:, b * nb:(b + 1) * nb]))
    wb = bench(
        lambda l, s: pallas_big.col_writeback(l.copy(), ld0, ldi0, s, b, nb),
        (l_full, sub),
        f"col_writeback b={b} (+copy)",
    )
    total += wb * (nblocks - 2)
    print(f"sum of parts ~ {total * 1e3:.2f} ms "
          f"(writeback x{nblocks - 2} at b={b} incl. a defensive copy)")


if __name__ == "__main__":
    main()
