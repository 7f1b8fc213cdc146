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
* :func:`tri_toeplitz_matvec` / :func:`tri_toeplitz_matvec_t` — O(T log T)
  FFT application of the Gohberg-Semencul inverse factors (solves and the
  KL trace/quad terms ride these; a scan-based Levinson solver was removed
  in round 3 as production-dead once the GS route landed);
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
    error variances E_k (log), and the final forward (Yule-Walker) solution
    with its reversal (the Gohberg-Semencul ingredients).
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


def _fft_len(t: int) -> int:
    """Power-of-two FFT length >= 2T-1 (radix-2 keeps the TPU FFT fast)."""
    m = 1
    while m < 2 * t - 1:
        m *= 2
    return m


def tri_toeplitz_matvec_t(
    col: jnp.ndarray, y: jnp.ndarray
) -> jnp.ndarray:
    """``A^T @ y`` for lower-triangular Toeplitz ``A`` (first column
    ``col [Z, T]``) applied to ``y [..., Z, T, C]`` along the T axis,
    in O(T log T) per column via FFT correlation — no ``[Z, T, T]`` matrix.

    ``(A^T y)[i] = sum_{j >= i} col[j - i] * y[j]`` is an anticausal
    correlation: with both operands zero-padded to M >= 2T-1,
    ``irfft(conj(rfft(col)) * rfft(y))[..., :T]`` gives exactly the
    non-negative lags.  This is what makes the Gohberg-Semencul inverse
    *application* O(T^2 log T) for the whole trace term instead of dense
    O(T^3) matmuls (the round-2 structured path materialized ``A``/``B``
    densely and lost to the dense prior at its own design point).
    """
    t = col.shape[-1]
    m = _fft_len(t)
    fc = jnp.conj(jnp.fft.rfft(col, n=m, axis=-1))      # [Z, M/2+1]
    fy = jnp.fft.rfft(y, n=m, axis=-2)                  # [..., Z, M/2+1, C]
    prod = fc[..., :, None] * fy
    out = jnp.fft.irfft(prod, n=m, axis=-2)[..., :t, :]
    return out.astype(y.dtype)


def tri_toeplitz_matvec(
    col: jnp.ndarray, y: jnp.ndarray
) -> jnp.ndarray:
    """``A @ y`` (causal convolution) for lower-triangular Toeplitz ``A``
    with first column ``col [Z, T]``; ``y [..., Z, T, C]``."""
    t = col.shape[-1]
    m = _fft_len(t)
    fc = jnp.fft.rfft(col, n=m, axis=-1)
    fy = jnp.fft.rfft(y, n=m, axis=-2)
    prod = fc[..., :, None] * fy
    out = jnp.fft.irfft(prod, n=m, axis=-2)[..., :t, :]
    return out.astype(y.dtype)


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
