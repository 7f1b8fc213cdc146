"""Decompose the t1024 chol-backward + KL-forward cost (VERDICT r3 #2):
tri_inv block recursion vs the big HIGHEST matmuls vs the gram pullback,
at the production small-N shapes ([2 or 4, 1024, 1024]).

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/prof_bwd_parts.py
"""
from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import bench
from benchmarks.prof_train_phases import sat_time
from gpvae_tpu import gp, kernels as kernels_lib
from gpvae_tpu.ops import pallas_tri
from gpvae_tpu.ops.chol import cholesky_bwd_from_l, _phi

T = 1024
_HI = jax.lax.Precision.HIGHEST


def main():
    print(f"backend: {jax.default_backend()}", flush=True)
    rng = np.random.default_rng(0)
    times = jnp.asarray(
        np.broadcast_to(np.arange(T, dtype=np.float32) * (60.0 / T),
                        (1, T)).copy()
    )
    ls4 = jnp.asarray([9.0, 3.0, 5.0, 2.0], jnp.float32)
    bank4 = gp.chol_gram_bank(times, ls4)          # [1, 4, T, T]
    l4 = bank4.reshape(4, T, T)
    l2 = l4[:2]
    lbar = jnp.asarray(rng.standard_normal((4, T, T)), jnp.float32) * 1e-3

    sat_time(lambda l: jnp.sum(pallas_tri.tri_inv(l)[..., 0, :1]),
             (l2,), 128, label="tri_inv N=2")
    sat_time(lambda l: jnp.sum(pallas_tri.tri_inv(l)[..., 0, :1]),
             (l4,), 128, label="tri_inv N=4")

    def pmat(l, lb):
        p = _phi(jnp.einsum("nji,njk->nik", l, lb,
                            preferred_element_type=jnp.float32,
                            precision=_HI))
        return jnp.sum(p[..., 0, :1])

    sat_time(pmat, (l4, lbar), 128, label="P=phi(L^T Lbar)")

    x4 = pallas_tri.tri_inv(l4)
    w4 = 0.5 * (lbar + jnp.swapaxes(lbar, -1, -2))

    def triple(x, w):
        kbar = jnp.einsum("nji,njk,nkl->nil", x, w, x,
                          preferred_element_type=jnp.float32, precision=_HI)
        return jnp.sum(kbar[..., 0, :1])

    sat_time(triple, (x4, w4), 128, label="X^T W X")

    sat_time(lambda l, lb: jnp.sum(
        cholesky_bwd_from_l(l, lb)[..., 0, :1]),
        (l4, lbar), 96, label="full chol bwd")

    # gram pullback: k_bar -> ls_bar
    kbar = jnp.asarray(rng.standard_normal((1, 4, T, T)), jnp.float32) * 1e-3

    def gram_pull(kb):
        def f(ls):
            return jnp.vdot(kernels_lib.gram_bank(times, ls), kb)
        return jax.grad(f)(ls4).sum()

    sat_time(gram_pull, (kbar,), 128, label="gram pullback")

    # KL fwd pieces
    mu = jnp.asarray(rng.standard_normal((8, T, 2)), jnp.float32)
    l_q, l_p = bank4[:, :2], bank4[:, 2:]

    def kl_fwd(mu, lq, lp):
        return jnp.sum(gp.gp_kl(mu, lq, lp))

    sat_time(kl_fwd, (mu, l_q, l_p), 128, label="kl_fwd")

    def a_term(lq, inv_p):
        a = jnp.einsum("nzij,nzjk->nzik", inv_p, lq,
                       preferred_element_type=jnp.float32, precision=_HI)
        return jnp.sum(a[..., 0, :1])

    inv_p = pallas_tri.tri_inv(l_p)
    sat_time(a_term, (l_q, inv_p), 128, label="A=invP@Lq")


if __name__ == "__main__":
    main()
