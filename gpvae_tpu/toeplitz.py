"""Structured covariance for uniform time grids (Toeplitz path).

All the reference's MNIST configs use uniform grids (times ``1..20``,
src/Models/Full_GP_VAE_fixed_for_MovMnist.py:280), where the gram is
symmetric Toeplitz — fully described by its first row (kernels.toeplitz_row,
O(T) memory instead of O(T^2)).  This module exploits that structure for the
long-sequence regime (BASELINE.json config 3, T=1024) where dense O(T^3)
work is wasteful on the *prior* side (fixed per-latent lengthscales, shared
across the batch):

* :func:`durbin_logdet` — log-determinant in O(T^2) via the Durbin
  recursion's prediction-error variances (det T = prod_k E_k), as a
  ``lax.scan`` of full-width VPU ops;
* :func:`levinson_solve` — K x = b in O(T^2) per right-hand side;
* :func:`circulant_prior_sample` — exact GP prior draws on a uniform grid
  in O(T log T) via circulant embedding + FFT, replacing the O(T^3)
  chol-then-matmul sampling path for long sequences.

The dense lane-batched/blocked Cholesky remains the path for the posterior
bank (learnable lengthscales, per-sequence grams).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gpvae_tpu import kernels as kernels_lib


def _durbin_scan(rho: jnp.ndarray):
    """Run the Durbin recursion on normalized autocovariances ``rho [T-1]``.

    Returns (log_errors [T-1], y, rev_y): per-order normalized prediction
    error variances E_k (log), and the final forward solution (for
    levinson_solve).
    """
    t1 = rho.shape[-1]
    idx = jnp.arange(t1)

    def step(carry, k):
        y, rev_y, e = carry
        # alpha_k = -(rho[k] + <rho[:k], rev_y[:k]>) / E_{k}
        valid = (idx < k).astype(rho.dtype)
        num = rho[k] + jnp.sum(rho * rev_y * valid)
        alpha = -num / e
        y_new = y + alpha * rev_y
        y_new = jnp.where(idx == k, alpha, jnp.where(idx < k, y_new, 0.0))
        # reverse of the order-(k+1) solution: [alpha, rev_y + alpha*y]
        rev_shift = jnp.roll(rev_y + alpha * y, 1)
        rev_new = jnp.where(
            idx == 0, alpha, jnp.where(idx <= k, rev_shift, 0.0)
        )
        e_new = e * (1.0 - alpha * alpha)
        return (y_new, rev_new, e_new), jnp.log(e_new)

    init = (jnp.zeros_like(rho), jnp.zeros_like(rho), jnp.asarray(1.0, rho.dtype))
    (y, rev_y, e), log_e = jax.lax.scan(step, init, jnp.arange(t1))
    return log_e, y, rev_y, e


@jax.jit
def durbin_logdet(row: jnp.ndarray) -> jnp.ndarray:
    """logdet of the symmetric PD Toeplitz matrix with first row ``row``
    (``[..., T]`` -> ``[...]``), O(T^2) instead of O(T^3).

    det T_n = prod_{k=0}^{n-1} E_k with E_0 = r_0 and the Durbin
    prediction-error recursion E_k = E_{k-1} (1 - alpha_k^2).
    """
    row = jnp.asarray(row)
    batch = row.shape[:-1]
    t = row.shape[-1]
    flat = row.reshape((-1, t))

    def one(r):
        r0 = r[0]
        rho = r[1:] / r0
        log_e, _, _, _ = _durbin_scan(rho)
        return t * jnp.log(r0) + jnp.sum(log_e)

    return jax.vmap(one)(flat).reshape(batch)


def tri_toeplitz(col: jnp.ndarray) -> jnp.ndarray:
    """Dense lower-triangular Toeplitz ``[..., T, T]`` from its first column
    ``[..., T]`` (materialized once; multiplication then rides the MXU)."""
    t = col.shape[-1]
    i = jnp.arange(t)[:, None]
    j = jnp.arange(t)[None, :]
    idx = jnp.clip(i - j, 0, t - 1)
    return jnp.where(i >= j, col[..., idx], jnp.zeros((), col.dtype))


@jax.jit
def durbin_gs_factors(
    row: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Log-determinant + Gohberg-Semencul inverse representation of the
    symmetric PD Toeplitz matrix with first row ``row [..., T]``.

    Returns ``(logdet, a, b, e)`` with

        K^{-1} = (1/e) (A A^T - B B^T)

    where ``A``/``B`` are the lower-triangular Toeplitz matrices with first
    columns ``a = (1, y_1..y_{T-1})`` and ``b = (0, y_{T-1}..y_1)`` built
    from the final Durbin (Yule-Walker) solution ``y``, and ``e`` is the
    final unnormalized prediction-error variance.  One O(T^2) scan yields
    the logdet AND an O(T^2)-to-build exact inverse whose application is
    pure MXU matmuls — this is what replaces the O(T^3) sequential prior
    Cholesky for uniform grids (BASELINE.json config 3; all reference MNIST
    grids are uniform, src/Models/Full_GP_VAE_fixed_for_MovMnist.py:280).
    """
    row = jnp.asarray(row)
    batch = row.shape[:-1]
    t = row.shape[-1]
    flat = row.reshape((-1, t))

    def one(r):
        r0 = r[0]
        rho = r[1:] / r0
        log_e, y, rev_y, e = _durbin_scan(rho)
        logdet = t * jnp.log(r0) + jnp.sum(log_e)
        one_ = jnp.ones((1,), r.dtype)
        zero = jnp.zeros((1,), r.dtype)
        a = jnp.concatenate([one_, y])
        b = jnp.concatenate([zero, rev_y])
        return logdet, a, b, r0 * e

    logdet, a, b, e = jax.vmap(one)(flat)
    return (
        logdet.reshape(batch),
        a.reshape(batch + (t,)),
        b.reshape(batch + (t,)),
        e.reshape(batch),
    )


@jax.jit
def levinson_solve(row: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve ``T x = b`` for symmetric PD Toeplitz ``T`` (first row ``row``
    [T], rhs ``b`` [..., T]) in O(T^2) via the Levinson recursion."""
    row = jnp.asarray(row)
    t = row.shape[-1]
    r0 = row[0]
    rho = row[1:] / r0
    b_norm = b / r0
    idx = jnp.arange(t - 1)

    def solve_one(bv):
        def step(carry, k):
            y, rev_y, e, x = carry
            validk = (idx < k).astype(rho.dtype)
            # extend the forward (Durbin) solution to order k+1
            num = rho[k] + jnp.sum(rho * rev_y * validk)
            alpha = -num / e
            y_new = jnp.where(
                idx == k, alpha,
                jnp.where(idx < k, y + alpha * rev_y, 0.0),
            )
            rev_shift = jnp.roll(rev_y + alpha * y, 1)
            rev_new = jnp.where(
                idx == 0, alpha, jnp.where(idx <= k, rev_shift, 0.0)
            )
            e_new = e * (1.0 - alpha * alpha)
            # extend the solution x to order k+1 (Levinson step)
            xi = jnp.arange(t)
            validx = (xi < k + 1).astype(rho.dtype)
            # mu = (b[k+1] - <rho reversed over current window, x>) / E
            rev_x_dot = jnp.sum(
                jnp.where(xi < k + 1, rho[jnp.clip(k - xi, 0, t - 2)] * x, 0.0)
            )
            mu = (bv[k + 1] - rev_x_dot) / e_new
            rev_y_full = jnp.concatenate([rev_new, jnp.zeros((1,), rho.dtype)])
            x_new = x + mu * jnp.where(
                xi == k + 1, 1.0, jnp.where(xi < k + 1, rev_y_full, 0.0)
            )
            x_new = jnp.where(xi <= k + 1, x_new, 0.0)
            return (y_new, rev_new, e_new, x_new), None

        x0 = jnp.zeros((t,), rho.dtype).at[0].set(bv[0])
        init = (
            jnp.zeros_like(rho), jnp.zeros_like(rho),
            jnp.asarray(1.0, rho.dtype), x0,
        )
        (_, _, _, x), _ = jax.lax.scan(step, init, jnp.arange(t - 1))
        return x

    flat = b_norm.reshape((-1, t))
    return jax.vmap(solve_one)(flat).reshape(b.shape)


@functools.partial(jax.jit, static_argnames=("num_samples",))
def circulant_prior_sample(
    key: jax.Array,
    row: jnp.ndarray,
    num_samples: int = 1,
) -> jnp.ndarray:
    """Exact stationary GP draws on a uniform grid in O(T log T).

    Embeds the Toeplitz gram (first row ``row [Z, T]``) in a circulant of
    size 2(T-1), takes the FFT eigenvalues, and filters white noise — the
    classic circulant-embedding sampler, replacing ``chol(K) @ eps``
    (reference ``prior_gp_sample``,
    src/Models/FullGP_and_GPdecoder_dynamic_time_analysis.py:24-30) for long
    sequences.  Returns ``[S, Z, T]``.

    Negative embedding eigenvalues (possible for very smooth kernels at
    short T) are clamped to zero — the draw is then from the nearest valid
    spectrum.
    """
    z, t = row.shape
    m = 2 * (t - 1)
    # circulant first row: [r0, r1, ..., r_{T-1}, r_{T-2}, ..., r1]
    circ = jnp.concatenate([row, row[:, -2:0:-1]], axis=-1)  # [Z, M]
    lam = jnp.fft.rfft(circ, axis=-1).real  # [Z, M/2+1]
    lam = jnp.maximum(lam, 0.0)
    shape = (num_samples, z, m)
    eps = jax.random.normal(key, shape)
    spec = jnp.fft.rfft(eps, axis=-1)
    filtered = spec * jnp.sqrt(lam / m)[None]
    draw = jnp.fft.irfft(filtered, n=m, axis=-1) * jnp.sqrt(
        jnp.asarray(m, row.dtype)
    )
    return draw[..., :t]
