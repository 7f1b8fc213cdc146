"""Per-component timing breakdown of the blocked Cholesky paths on the chip.

Answers "where do the milliseconds go" for the T=256 and T=1024 bank
factorizations so kernel work targets the real bottleneck.  Each component
runs in a device-side fori_loop over pre-staged distinct inputs (no input
mutation pass, no full-output consume) — the same methodology as
bench.time_cholesky after the round-3 fix.
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
from bench import host_roundtrip_latency, timed_median  # noqa: E402


def _banks(t, n, copies, seed=1):
    import jax
    import jax.numpy as jnp
    from gpvae_tpu import kernels as kernels_lib

    rng = np.random.default_rng(seed)
    times = jnp.asarray(
        np.sort(rng.uniform(0, t, (copies, n, t)), -1).astype(np.float32)
    )
    kd = jax.jit(
        jax.vmap(
            lambda tt: kernels_lib.gram_bank(
                tt, jnp.array([5.0], jnp.float32), noise=1e-2
            )[:, 0]
        )
    )(times)
    float(jnp.sum(kd[0, 0]))
    return kd


def time_op(fn, banks, reps=4, repeats=2, inner=24):
    """Time fn(bank)->consumable inside a device-side fori_loop.

    The loop body reads the (loop-invariant) bank through an
    ``optimization_barrier`` chained with the accumulator, so XLA can
    neither hoist the op out of the loop (the input symbolically depends
    on the previous iteration) nor overlap/dedupe iterations — while the
    body compiles exactly once and ``inner`` iterations amortize the
    ~25 ms tunnel-latency jitter.  ``repeats`` kept for call compat.
    Returns seconds per fn() call.
    """
    import jax
    import jax.numpy as jnp

    bank = banks[0]

    @jax.jit
    def run(bank):
        def body(_, acc):
            k, _a = jax.lax.optimization_barrier((bank, acc))
            return acc + fn(k)
        return jax.lax.fori_loop(0, inner, body, jnp.float32(0.0))

    float(run(bank))  # compile+warm
    dt = timed_median(lambda: run(bank), reps) / inner
    return dt


def consume(l):
    import jax
    import jax.numpy as jnp
    # force the full factor to materialize (as production consumers do),
    # then read only O(N*T): the log-diagonal (the logdet path)
    l = jax.lax.optimization_barrier(l)
    return jnp.sum(jnp.log(jnp.diagonal(l, axis1=-2, axis2=-1)))


def main():
    import jax
    import jax.numpy as jnp
    from gpvae_tpu.ops import chol as chol_lib
    from gpvae_tpu.ops import pallas_chol, pallas_left, pallas_trail

    host_roundtrip_latency()

    only = set(int(a) for a in sys.argv[1:]) or {256, 512, 1024}
    for t, n, copies in ((256, 512, 4), (512, 256, 4), (1024, 128, 2)):
        if t not in only:
            continue
        flops = n * t**3 / 3
        banks = _banks(t, n, copies)
        print(f"=== T={t} N={n} ({flops/1e9:.2f} GFLOP useful) ===")
        for method in ("blocked_fused", "blocked", "blocked_left",
                       "blocked_left_streamed"):
            try:
                dt = time_op(
                    lambda k, m=method: consume(
                        chol_lib._cholesky_fwd_impl(k, m)
                    ),
                    banks,
                )
                print(f"  {method:24s} {dt*1e3:8.3f} ms  "
                      f"{flops/dt/1e12:6.2f} TF/s")
            except Exception as e:  # noqa: BLE001
                print(f"  {method:24s} FAILED {type(e).__name__}: {e}")

        # components
        nb = 128
        d_banks = jax.jit(lambda b: b[:, :, :nb, :nb].copy())(banks)
        dt = time_op(lambda d: consume(chol_lib.chol_and_inv(d)[0]),
                     d_banks, repeats=4)
        print(f"  chol_and_inv[{n}x{nb}x{nb}]    {dt*1e3:8.3f} ms")

        l64_banks = jax.jit(lambda b: b[:, :, :64, :64].copy())(banks)
        dt = time_op(
            lambda d: consume(pallas_chol.chol_inv_small_batched(d)[0]),
            l64_banks, repeats=4,
        )
        print(f"  lane chol_inv[{n}x64x64]   {dt*1e3:8.3f} ms")
        dt = time_op(
            lambda d: consume(pallas_chol.chol_small_batched(d)),
            l64_banks, repeats=4,
        )
        print(f"  lane chol[{n}x64x64]       {dt*1e3:8.3f} ms")

        ld_inv = jax.jit(lambda d: chol_lib.chol_and_inv(d)[1])(
            d_banks[0]
        )
        if t >= 2 * nb:
            def ptu(k, ld_inv=ld_inv):
                colx, s = pallas_trail.panel_trailing_update(k, ld_inv)
                colx, s = jax.lax.optimization_barrier((colx, s))
                return jnp.sum(colx[..., 0, :]) + jnp.sum(s[..., 0, :])
            dt = time_op(ptu, banks)
            print(f"  panel_trailing(step0)     {dt*1e3:8.3f} ms")

        # raw matmul ceiling at this size, HIGHEST vs DEFAULT (full-output
        # materialization via barrier; sum fused reduce would under-count)
        for prec, name in ((jax.lax.Precision.HIGHEST, "HIGHEST"),
                           (jax.lax.Precision.DEFAULT, "DEFAULT")):
            def mm(k, prec=prec):
                y = jax.lax.dot_general(
                    k, k, (((2,), (2,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32, precision=prec,
                )
                y = jax.lax.optimization_barrier(y)
                return jnp.sum(y[..., 0, :])
            dt = time_op(mm, banks)
            mm_flops = 2 * n * t**3
            print(f"  square matmul {name:8s}    {dt*1e3:8.3f} ms  "
                  f"{mm_flops/dt/1e12:6.2f} TF/s")
        # HBM copy bandwidth ruler
        def cp(k):
            y = jax.lax.optimization_barrier(k + 1.0)
            return jnp.sum(y[..., 0, :])
        dt = time_op(cp, banks)
        gb = n * t * t * 4 * 2 / 1e9
        print(f"  copy (R+W {gb:.2f} GB)       {dt*1e3:8.3f} ms  "
              f"{gb/dt:6.0f} GB/s")
    print("host_roundtrip_ms", round(host_roundtrip_latency() * 1e3, 1))


if __name__ == "__main__":
    main()
