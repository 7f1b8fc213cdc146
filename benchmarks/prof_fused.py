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

    # eager ops produce materialized (packed) device buffers — no host
    # round-trip needed (np.asarray of a [128,1024,1024] bank through the
    # tunnel costs minutes)
    l_full = pallas_big.cholesky_gram_inplace(times, ls, None, var,
                                              noise=noise, nb=nb)
    k00 = kernels_lib.gram(
        times[:, :nb], ls[:, None, None], noise=noise,
        variance=var[:, None, None],
    )
    ld0, ldi0 = chol.chol_and_inv(k00)
    float(jnp.sum(l_full) + jnp.sum(ld0))

    # nominal tunnel latency; each timed sync covers >= ~300 ms of device
    # work so the 26-44 ms per-call variance contributes < 3 us/op
    lat = 0.030
    print(f"T={t} N={n} nb={nb}   (saturated loops, nominal lat 30 ms)")

    def bench(fn, args, label, inner=None, reps=3, scale=1):
        if inner is None:
            inner = 768 if t <= 256 else (384 if t <= 512 else 128)
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
        lambda tt: pallas_big.gram_chol_inv_128_parts(
            tt, mk, lsb, varb, "rbf", noise),
        (times,), "k00 gram_chol_inv_parts",
    )
    pr = pallas_big.gram_chol_inv_128_parts(times, mk, lsb, varb, "rbf",
                                            noise)
    l11, a21, l22, i11, i21, i22 = [jnp.asarray(x) for x in pr]
    if nblocks == 1:
        print(f"single block; total ~ {total * 1e3:.2f} ms")
        return
    total += bench(
        lambda tt: pallas_big._init0_parts_jit(l11, a21, l22, t, nb, False),
        (times,), "init0_parts",
    )
    # step b=1: column 0 deferred from in-kernel gram tiles
    total += bench(
        lambda l: pallas_big._gram_defer1_jit(
            l.copy(), times, mk, lsb, varb, i11, i21, i22, nb, "rbf",
            noise, False),
        (l_full,), "defer1 (+l copy)",
    )
    # deferred steps b=2..nblocks-1
    for b in range(2, nblocks):
        r = t - b * nb
        # eager slice = materialized packed buffer with the right shape
        sub_prev = l_full[:, (b - 1) * nb + nb:, :nb]
        total += bench(
            lambda l, b=b, sp=sub_prev:
                pallas_big._gram_hist2_defer_jit(
                    l.copy(), times, mk, lsb, varb, sp, i11, i21, i22,
                    b, nb, "rbf", noise, False),
            (l_full,), f"defer b={b} (+l copy)",
        )
    # per-step diag factor+inverse parts (same shape every step)
    total += bench(
        lambda d: chol.chol_inv_parts(d), (ld0 @ jnp.swapaxes(ld0, -1, -2),),
        "chol_inv_parts(diag)", scale=nblocks - 2,
    )
    total += bench(
        lambda d: chol.chol_parts(d), (ld0 @ jnp.swapaxes(ld0, -1, -2),),
        "chol_parts(final diag)",
    )
    total += bench(
        lambda l: pallas_big.diag_parts_writeback(
            l.copy(), (l11, a21, l22), 1, nb),
        (l_full,), "diag parts wb (+l copy)", scale=nblocks - 1,
    )
    print(f"sum of parts ~ {total * 1e3:.2f} ms")

    whole = bench(
        lambda tt: pallas_big.cholesky_gram_inplace(
            tt, ls, None, var, noise=noise, nb=nb),
        (times,), "WHOLE cholesky_gram_inplace",
        inner=256 if t <= 512 else 96,
    )
    tf = n * t ** 3 / 3.0 / whole / 1e12
    print(f"whole op {whole * 1e3:.3f} ms  -> {tf:.2f} TF/s (chol flops)")


if __name__ == "__main__":
    main()
