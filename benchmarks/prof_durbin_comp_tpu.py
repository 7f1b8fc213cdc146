"""TPU A/B: compensated (two-float) theta tree vs plain fp32 in the
blocked Schur/Durbin (VERDICT r4 weak #5 / next #7).

Measures ``durbin_gs_factors`` ms/op and fp32 logdet accuracy vs the
fp64 host oracle at T in {1024, 4096}, and the structured prior-KL,
with GPVAE_DURBIN_COMP on/off (re-read per call, so both arms run in
one process under the same ruler).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from prof_durbin import bench_gs, bench_kl, check_accuracy, latency


def main():
    os.environ["GPVAE_DURBIN_BLOCK"] = "128"
    print(f"latency {latency()*1e3:.1f} ms", flush=True)
    for t in (1024, 4096):
        line = [f"T={t}"]
        for comp in ("0", "1"):
            os.environ["GPVAE_DURBIN_COMP"] = comp
            ms = bench_gs(t)
            acc = check_accuracy(t)
            tag = "comp" if comp == "1" else "fp32"
            line.append(f"{tag} {ms:.3f}ms rel={acc:.2e}")
        print("gs_factors  " + "  ".join(line), flush=True)
    for comp in ("0", "1"):
        os.environ["GPVAE_DURBIN_COMP"] = comp
        d, tp = bench_kl()
        tag = "comp" if comp == "1" else "fp32"
        print(f"prior-KL T=1024 ({tag}): dense {d:.2f}ms  "
              f"toeplitz {tp:.2f}ms", flush=True)


if __name__ == "__main__":
    main()
