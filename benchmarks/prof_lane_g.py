"""A/B: G-batched lane Cholesky(+inverse) — VERDICT r4 weak #2 / next #4.

The T=256 N=512 fused op's serial floor is ~0.7 ms of lane-kernel
chol/inv rounds; each round runs the 64-column recurrence over g=4
sequential grid steps (one per 128-lane group).  Hypothesis (the
tri_inv_flat lesson): the recurrence's per-column VPU ops are small
([rows, 8, 128]-ish), so a grid step is op-issue-latency bound, and
fattening every op with a leading G dim (processing G lane groups per
grid step) buys up to Gx utilization without lengthening the 64-step
serial chain.  Counter-hypothesis (BASELINE.md round 4): the rounds are
VPU-throughput bound and G-batching changes nothing.  VMEM bounds G <= 2
for the fused factor+inverse (in 4 + out 2x4 + live trailing ~4 MB).

This script measures both and decides; the result goes to BASELINE.md /
DESIGN.md either way.
"""
from __future__ import annotations

import functools
import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpvae_tpu.ops import pallas_chol as pc

_PANEL = pc._PANEL


def _panel_factor_g(a_cur, l_ref, base, pw):
    """pallas_chol._panel_factor with a leading G dim: a_cur [G, r, r, L]."""
    r = a_cur.shape[1]
    rows_r = jax.lax.broadcasted_iota(jnp.int32, (1, r, 1), 1)
    ap = a_cur[:, :, :pw, :]                               # [G, r, pw, L]
    cols, ds = [], []
    for jj in range(pw):
        d = jax.lax.rsqrt(
            jnp.maximum(ap[:, jj, jj, :], pc._DIAG_EPS)
        )                                                  # [G, L]
        col = ap[:, :, jj, :] * d[:, None, :]              # [G, r, L]
        col = jnp.where(rows_r >= jj, col, 0.0)
        l_ref[:, base:, base + jj, :] = col
        ap = ap - col[:, :, None, :] * col[:, :pw][:, None, :, :]
        cols.append(col[:, pw:])
        ds.append(d)
    return cols, ds


def _panel_trailing_g(a_cur, cols, pw):
    trail = a_cur[:, pw:, pw:, :]
    for ck in cols:
        trail = trail - ck[:, :, None, :] * ck[:, None, :, :]
    return trail


def _chol_kernel_g(a_ref, l_ref, *, pw=_PANEL):
    t_pad = a_ref.shape[2]
    l_ref[...] = jnp.zeros_like(a_ref)
    a_cur = a_ref[...]
    for p in range(t_pad // pw):
        base = p * pw
        cols, _ = _panel_factor_g(a_cur, l_ref, base, pw)
        if t_pad - base > pw:
            a_cur = _panel_trailing_g(a_cur, cols, pw)


def _chol_inv_kernel_g(a_ref, l_ref, x_ref, *, pw=_PANEL):
    t_pad = a_ref.shape[2]
    rows_t = jax.lax.broadcasted_iota(jnp.int32, (1, t_pad, 1), 1)
    x_ref[...] = jnp.zeros_like(a_ref)
    l_ref[...] = jnp.zeros_like(a_ref)
    a_cur = a_ref[...]
    for p in range(t_pad // pw):
        base = p * pw
        w = base + pw
        cols, ds = _panel_factor_g(a_cur, l_ref, base, pw)
        for jj in range(pw):
            j = base + jj
            l_row = l_ref[:, j, :w, :]                     # [G, w, L]
            acc = jnp.sum(
                l_row[:, :, None, :] * x_ref[:, :w, :w, :], axis=1
            )                                              # [G, w, L]
            onehot = (rows_t[:, :w] == j).astype(acc.dtype)
            x_ref[:, j, :w, :] = (onehot - acc) * ds[jj][:, None, :]
        if t_pad - base > pw:
            a_cur = _panel_trailing_g(a_cur, cols, pw)


@functools.partial(jax.jit, static_argnames=("g_blk", "with_inv"))
def _run_g(kt, g_blk, with_inv):
    """kt [G_total, T, T, L] grouped layout -> (L, X?) same layout."""
    g_total, t, _, lanes = kt.shape
    spec = pl.BlockSpec((g_blk, t, t, lanes),
                        lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    # G>1 blocks exceed the default 16 MB scoped-VMEM limit (first A/B run:
    # "23.56M vs 16.00M" at G=2 chol-only); raise it like the production
    # glue kernels do (pallas_chol._glue_params)
    blk_bytes = g_blk * t * t * lanes * 4
    n_bufs = 3 if with_inv else 2
    params = pltpu.CompilerParams(
        vmem_limit_bytes=min(
            120 * 1024 * 1024,
            max(16 * 1024 * 1024, int(blk_bytes * (n_bufs + 3) * 1.5)),
        ),
    )
    if with_inv:
        return pl.pallas_call(
            _chol_inv_kernel_g,
            grid=(g_total // g_blk,),
            in_specs=[spec], out_specs=(spec, spec),
            out_shape=(
                jax.ShapeDtypeStruct(kt.shape, jnp.float32),
                jax.ShapeDtypeStruct(kt.shape, jnp.float32),
            ),
            compiler_params=params,
        )(kt)
    return pl.pallas_call(
        _chol_kernel_g,
        grid=(g_total // g_blk,),
        in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(kt.shape, jnp.float32),
        compiler_params=params,
    )(kt)


def _latency():
    a = jnp.ones((8, 128), jnp.float32)
    tiny = jax.jit(jnp.sum)
    float(tiny(a))
    s = []
    for _ in range(5):
        t0 = time.perf_counter()
        float(tiny(a))
        s.append(time.perf_counter() - t0)
    return statistics.median(s)


def _saturated_ms(fn, x, reps):
    """Device-side fori_loop chained through a ~ulp dependency (the
    bench.time_cholesky ruler — python-level redispatch through the
    tunnel measured ~10x inflation on sub-ms ops)."""
    import functools

    @functools.partial(jax.jit, static_argnames=("n_iter",))
    def run(x, n_iter):
        def body(_, v):
            v = jax.lax.optimization_barrier(v)
            out = fn(v)
            return v + out[..., :1, :1, :1] * 1e-30
        return jax.lax.fori_loop(0, n_iter, body, x)

    float(jnp.sum(run(x, 2)[..., 0, 0, :1]))  # compile+warm
    lat = _latency()
    trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(run(x, reps)[..., 0, 0, :1]))
        trials.append((time.perf_counter() - t0 - lat) / reps)
    return statistics.median(trials) * 1e3


def _saturated_ms3(fn, x, reps):
    import functools

    @functools.partial(jax.jit, static_argnames=("n_iter",))
    def run(x, n_iter):
        def body(_, v):
            v = jax.lax.optimization_barrier(v)
            out = fn(v)
            return v + out[..., :1, :1] * 1e-30
        return jax.lax.fori_loop(0, n_iter, body, x)

    float(jnp.sum(run(x, 2)[..., 0, :1]))
    lat = _latency()
    trials = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(run(x, reps)[..., 0, :1]))
        trials.append((time.perf_counter() - t0 - lat) / reps)
    return statistics.median(trials) * 1e3


def main():
    n, t, lanes = 512, 64, 128
    rng = np.random.default_rng(0)
    # well-conditioned PSD batch
    b = rng.standard_normal((n, t, t)).astype(np.float32) / np.sqrt(t)
    k = np.einsum("nij,nkj->nik", b, b) + 0.5 * np.eye(t, dtype=np.float32)
    kt = jnp.asarray(
        np.transpose(k.reshape(n // lanes, lanes, t, t), (0, 2, 3, 1))
    )
    want = np.linalg.cholesky(k.astype(np.float64))

    def check(out_l, tag):
        l = np.transpose(np.asarray(out_l), (0, 3, 1, 2)).reshape(n, t, t)
        err = np.abs(np.tril(l) - want).max()
        print(f"  {tag} max err vs fp64: {err:.2e}")

    for with_inv in (False, True):
        name = "chol_inv" if with_inv else "chol"
        for g_blk in (1, 2, 4):
            try:
                out = _run_g(kt, g_blk, with_inv)
            except Exception as e:  # noqa: BLE001
                print(f"{name} G={g_blk}: FAILS ({str(e)[:120]})")
                continue
            l = out[0] if with_inv else out

            def step(x, g_blk=g_blk, with_inv=with_inv):
                o = _run_g(x, g_blk, with_inv)
                return o[0] if with_inv else o

            ms = _saturated_ms(step, kt, reps=400)
            print(f"{name} G={g_blk}: {ms:.3f} ms  (N={n}, T={t})",
                  flush=True)
            check(l, f"G={g_blk}")

    # production reference points
    kj = jnp.asarray(k)

    def prod_inv(x):
        l, _xinv = pc.chol_inv_small_batched(x)
        return l

    ms = _saturated_ms3(prod_inv, kj, reps=400)
    print(f"production chol_inv_small_batched: {ms:.3f} ms")

    def prod_chol(x):
        return pc.chol_small_batched(x, lower_only=False)

    ms = _saturated_ms3(prod_chol, kj, reps=400)
    print(f"production chol_small_batched: {ms:.3f} ms")


if __name__ == "__main__":
    main()
