"""A/B the blocked vs flat lane-kernel bodies on the real chip.

The serial 64-wide diagonal-block recurrences cost ~0.4-0.55 ms per bank
at T=256 N=512 (docs/DESIGN.md roofline note) — the blocked bodies
(pallas_chol.BLOCKED_LANE_BODY) cut the VPU element work ~3x (factor) /
~2x (inverse substitution) with bitwise-identical arithmetic order.
This script measures, saturated-loop style (bench.py methodology):

  1. chol_inv_small_batched on [512, 64, 64] (the raw lane kernel),
  2. chol_and_inv on [512, 128, 128] (the recursion both blocked paths hit),
  3. the fused production op at T=256 N=512 and T=1024 N=128.

Because BLOCKED_LANE_BODY is read at trace time and jit caches do not key
on it, each arm runs in a SUBPROCESS with the flag forced via env
GPVAE_BLOCKED_LANE_BODY.  Run on the chip (no JAX_PLATFORMS override):

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/prof_lane.py
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

_ARM = os.environ.get("GPVAE_BLOCKED_LANE_BODY")


def run_arm() -> None:
    import numpy as np
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from gpvae_tpu.ops import pallas_chol, pallas_big
    from gpvae_tpu.ops import chol as chol_lib
    from gpvae_tpu.ops.logdet import logdet_from_chol
    import bench

    pallas_chol.BLOCKED_LANE_BODY = _ARM == "1"
    out = {"blocked": pallas_chol.BLOCKED_LANE_BODY}

    rng = np.random.default_rng(0)

    def psd(n, t):
        a = rng.standard_normal((n, t, t)).astype(np.float32) / np.sqrt(t)
        k = a @ a.transpose(0, 2, 1) + 0.1 * np.eye(t, dtype=np.float32)
        return jnp.asarray(k)

    def saturated_ms(fn, x, inner):
        @jax.jit
        def run(x):
            def body(_, acc):
                xx, _a = jax.lax.optimization_barrier((x, acc))
                r = fn(xx)
                r = jax.lax.optimization_barrier(r)
                return acc + jnp.sum(r[..., 0, :1]) + r[0].ravel()[0] * 0
            return jax.lax.fori_loop(0, inner, body, jnp.float32(0.0))

        float(run(x))
        return bench.timed_median(lambda: run(x), 4) / inner * 1e3

    # 1. raw lane kernel [512, 64, 64]
    k64 = psd(512, 64)
    out["lane64_chol_inv_ms"] = round(saturated_ms(
        lambda x: pallas_chol.chol_inv_small_batched(x)[0], k64, 64), 4)
    # 2. the recursion at [512, 128, 128]
    k128 = psd(512, 128)
    out["chol_and_inv128_ms"] = round(saturated_ms(
        lambda x: chol_lib.chol_and_inv(x)[0], k128, 32), 4)
    # 3. production fused op
    out["fused_T256_tflops"] = round(bench.time_cholesky_fused(256, 512), 3)
    out["fused_T1024_tflops"] = round(
        bench.time_cholesky_fused(1024, 128, reps=4), 3)
    # correctness spot check on-chip
    l = pallas_big.cholesky_gram_inplace(
        jnp.asarray(np.sort(rng.uniform(0, 256, (8, 256)), -1)
                    .astype(np.float32)),
        jnp.full((8,), 5.0, jnp.float32), None, jnp.ones((8,), jnp.float32),
        noise=1e-2,
    )
    ld = logdet_from_chol(l)
    out["logdet_finite"] = bool(np.isfinite(np.asarray(ld)).all())
    print(json.dumps(out))


def main() -> None:
    env = dict(os.environ)
    results = {}
    for arm in ("1", "0"):
        env["GPVAE_BLOCKED_LANE_BODY"] = arm
        p = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=1200,
        )
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        if not line:
            print(f"arm {arm} failed:\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}")
            continue
        results["blocked" if arm == "1" else "flat"] = json.loads(line[-1])
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    if _ARM is not None:
        run_arm()
    else:
        main()
