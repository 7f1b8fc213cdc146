"""GP prior/posterior machinery: factorized gram banks, KL divergences in
trace/solve/logdet form, correlated latent sampling, posterior conditioning.

Re-designs the reference's L1-L3 layers (SURVEY.md §1):

* ``calc_gp_kl`` / ``gp_kl_div`` / ``trans_break_mat``
  (src/Models/syndata/GP_VAE_syn_data.py:168-236) — a Python loop unrolling
  B*Z fp64 {matrix_inverse, logdet, trace} subgraphs — becomes one batched
  solve-form KL with no explicit inverse and no determinant.
* ``gp_vae_sample`` (…:147-166) — ragged split/slice/concat — becomes one
  batched ``mu + L @ eps`` einsum on the MXU with explicit PRNG keys (fixing
  the reference's fresh-noise-per-fetch quirk, SURVEY.md §3.4).
* diag-cov KL (src/Models/VAE_GPprior_diag_cov.py:73-119), standard VAE KL
  (src/Models/GP_recog_VAE_prior.py:65-70), and the GP-recognition sampler
  ``L + diag(sqrt(v))`` (…:159-160) are all covered, including a
  behavioral-parity flag for the reference's not-quite-a-factor recog KL.
* numpy GP-posterior imputation (``sample_given_part_latent``,
  src/Models/FullGP_and_GPdecoder_dynamic_time_analysis.py:40-56) becomes a
  batched masked conditioning op.

Irregular time grids are handled with boolean masks over a static ``T``:
masked gram rows/cols are identity-padded (kernels.py), masked means are
zeroed, and masked diag variances are neutralized per-formula, which makes
every masked timestep contribute *exactly* zero to every KL — the static-shape
equivalent of the reference's ragged per-sequence slicing.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gpvae_tpu import kernels as kernels_lib
from gpvae_tpu.ops import (
    cholesky,
    dispatch,
    gram_chol_fused,
    logdet_from_chol,
    solve_triangular,
    LANE_BATCH_MAX_T,
)
from gpvae_tpu.ops.chol import cholesky_bwd_from_l

# None = auto (TPU, up to trsm.INV_ROUTE_MAX_T — the triangular inverse is
# lane-batched at T <= 64 and MXU block recursion above); tests override to
# exercise the inverse-routed KL paths in interpreter mode on CPU
FORCE_INVERSE_PATH: bool | None = None


def _inverse_path(t: int) -> bool:
    from gpvae_tpu.ops.trsm import INV_ROUTE_MAX_T

    if FORCE_INVERSE_PATH is not None:
        return FORCE_INVERSE_PATH and t <= INV_ROUTE_MAX_T
    return dispatch.on_tpu() and t <= INV_ROUTE_MAX_T


def _tri_tri_frob2(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """``||P Q||_F^2`` over the last two axes for lower-triangular P, Q.

    The product of two lower-triangular matrices is lower-triangular, so
    one level of 2x2 blocking computes it with 4 half-size HIGHEST MXU
    matmuls instead of the dense product's 8 — and the Frobenius norm is
    accumulated per block, so the [.., T, T] product is never assembled
    in HBM.  The auto-derived VJP inherits the halving (each blocked
    matmul pulls back into two half-size matmuls).  Odd T falls back to
    the dense einsum (MXU tiling alignment).
    """
    t = p.shape[-1]
    if t % 256 != 0:
        a = jnp.einsum(
            "...ij,...jk->...ik", p, q,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.sum(a * a, axis=(-2, -1))
    h = t // 2
    mm = functools.partial(
        jnp.einsum, "...ij,...jk->...ik",
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    p11, p21, p22 = p[..., :h, :h], p[..., h:, :h], p[..., h:, h:]
    q11, q21, q22 = q[..., :h, :h], q[..., h:, :h], q[..., h:, h:]
    a11 = mm(p11, q11)
    a21 = mm(p21, q11) + mm(p22, q21)
    a22 = mm(p22, q22)
    return (jnp.sum(a11 * a11, axis=(-2, -1))
            + jnp.sum(a21 * a21, axis=(-2, -1))
            + jnp.sum(a22 * a22, axis=(-2, -1)))


# ---------------------------------------------------------------------------
# Differentiable fused gram-bank Cholesky
# ---------------------------------------------------------------------------

def _chol_gram_bank_unfused(times, lengthscales, mask, variance, kernel,
                            noise, method="auto"):
    k = kernels_lib.gram_bank(
        times, lengthscales, kernel=kernel, noise=noise, variance=variance,
        mask=mask,
    )
    return cholesky(k, method=method)


def _gram_chol_blocked(times, lengthscales, mask, variance, kernel, noise):
    """Large-T fused path: flatten [B, T] x [Z] -> N = B*Z matrices and run
    the blocked in-place factorization with gram tiles built in-kernel
    (ops/pallas_big.cholesky_gram_inplace) — the [B, Z, T, T] gram never
    exists in HBM (at T=1024 N=128: 537 MB write + 537 MB read deleted;
    measured 6.39 -> 4.39 ms when introduced; ~13 TF/s current,
    BASELINE.md round 3)."""
    from gpvae_tpu.ops import pallas_big

    b, t = times.shape
    z = lengthscales.shape[-1]
    n = b * z
    f32 = jnp.float32
    tt = jnp.broadcast_to(times[:, None, :], (b, z, t)).reshape(n, t)
    if lengthscales.ndim == 1:
        ls = jnp.broadcast_to(lengthscales[None, :], (b, z)).reshape(n)
    else:
        ls = lengthscales.reshape(n)
    mk = (None if mask is None else
          jnp.broadcast_to(mask[:, None, :], (b, z, t)).reshape(n, t))
    var = jnp.asarray(variance, f32)
    if var.ndim == 0:
        var = jnp.full((n,), var, f32)
    else:
        var = jnp.broadcast_to(var[None, :], (b, z)).reshape(n)
    l = pallas_big.cholesky_gram_inplace(
        tt, ls, mk, var, kernel=kernel, noise=noise,
    )
    return l.reshape(b, z, t, t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _chol_gram_bank_p(times, lengthscales, mask, variance, kernel, noise,
                      diff_times):
    if times.shape[-1] <= LANE_BATCH_MAX_T:
        return gram_chol_fused(
            times, lengthscales, mask=mask, kernel=kernel, noise=noise,
            variance=variance,
        )
    return _gram_chol_blocked(times, lengthscales, mask, variance, kernel,
                              noise)


def _chol_gram_bank_fwd(times, lengthscales, mask, variance, kernel, noise,
                        diff_times):
    l = _chol_gram_bank_p(times, lengthscales, mask, variance, kernel,
                          noise, diff_times)
    return l, (times, lengthscales, mask, variance, l)


def _chol_gram_bank_bwd(kernel, noise, diff_times, res, l_bar):
    times, lengthscales, mask, variance, l = res
    k_bar = cholesky_bwd_from_l(l, l_bar)

    def gram_fn(tt, ls, var):
        return kernels_lib.gram_bank(
            tt, ls, kernel=kernel, noise=noise, variance=var, mask=mask
        )

    # The times cotangent is OPT-IN (``chol_gram_bank(diff_times=True)``):
    # XLA cannot dead-code-eliminate it out of the fused vjp (the gram
    # pullback entangles it with the lengthscale cotangent — measured ~12%
    # of toy-config training throughput), and every shipped model treats
    # observation times as data.  With the default, differentiating through
    # times yields an explicit ZERO gradient here — not silently: this is
    # the documented contract.
    if diff_times:
        _, vjp = jax.vjp(gram_fn, times, lengthscales, variance)
        times_bar, ls_bar, var_bar = vjp(k_bar)
    else:
        _, vjp = jax.vjp(
            lambda ls, var: gram_fn(times, ls, var), lengthscales, variance
        )
        ls_bar, var_bar = vjp(k_bar)
        times_bar = jnp.zeros_like(times)
    return (times_bar, ls_bar, None, var_bar)


_chol_gram_bank_p.defvjp(_chol_gram_bank_fwd, _chol_gram_bank_bwd)


def chol_gram_bank(
    times: jnp.ndarray,
    lengthscales: jnp.ndarray,
    *,
    mask: jnp.ndarray | None = None,
    kernel: str = "rbf",
    noise: float = kernels_lib.DEFAULT_NOISE,
    variance: jnp.ndarray | float = 1.0,
    diff_times: bool = False,
    impl: str = "auto",
) -> jnp.ndarray:
    """Cholesky factors ``L [B, Z, T, T]`` of the per-latent gram bank.

    The production entry point for the covariance subsystem: on TPU with
    T <= 64 the gram is built and factored inside one Pallas kernel (the
    ``[B,Z,T,T]`` gram never reaches HBM); otherwise it composes the batched
    gram with the blocked/XLA Cholesky.  Differentiable w.r.t.
    ``lengthscales`` and ``variance`` via the analytic Cholesky backward;
    pass ``diff_times=True`` if you differentiate through the observation
    times (learned time warps) — the default backward returns an explicit
    zero for them, because the extra pullback costs ~12% of training
    throughput and times are data in every shipped model.

    ``impl`` selects the implementation as data (no module patching):
    ``"auto"`` (fused Pallas on TPU, composed gram+XLA-chol elsewhere),
    ``"fused"`` (force the Pallas path), or ``"xla"`` (force the composed
    gram + ``jnp.linalg.cholesky`` path — the bench baseline, i.e. what a
    straight TF->JAX translation of the reference would delegate to).
    """
    if impl not in ("auto", "fused", "xla"):
        raise ValueError("impl must be auto, fused, or xla")
    variance = jnp.asarray(variance, jnp.float32)
    if impl == "xla":
        return _chol_gram_bank_unfused(times, lengthscales, mask, variance,
                                       kernel, noise, method="xla")
    if impl == "fused" or (
            dispatch.on_tpu() and kernel in kernels_lib.KERNELS):
        # T <= 64: lane-fused single kernel; larger T: blocked in-place
        # factorization with gram tiles built in-kernel — either way the
        # gram bank never exists in HBM
        return _chol_gram_bank_p(times, lengthscales, mask, variance, kernel,
                                 noise, diff_times)
    return _chol_gram_bank_unfused(times, lengthscales, mask, variance,
                                   kernel, noise)


# ---------------------------------------------------------------------------
# KL divergences
# ---------------------------------------------------------------------------

def gp_kl(
    mu: jnp.ndarray,
    l_q: jnp.ndarray,
    l_p: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """KL( N(mu, K_q) || N(0, K_p) ) per (sequence, latent) -> ``[B, Z]``.

    Solve-form rewrite of the reference ``gp_kl_div``
    (src/Models/syndata/GP_VAE_syn_data.py:216-236):

        KL = 1/2 [ ||L_p^{-1} L_q||_F^2 + ||L_p^{-1} mu||^2 - T
                   + logdet K_p - logdet K_q ]

    which eliminates ``tf.matrix_inverse`` entirely.  With identity-padded
    factors and masked (zeroed) means, each masked timestep contributes
    ``1 - 1 = 0``, so subtracting the *static* T is exact — no ragged
    bookkeeping.

    * ``mu``  ``[B, T, Z]`` posterior means (masked rows zero),
    * ``l_q``/``l_p`` ``[B, Z, T, T]`` Cholesky factors.

    Factors with a leading batch dim of 1 (``[1, Z, T, T]``) are treated as
    *shared across the batch* — the reference's fixed-time models tile one
    gram over all sequences (src/Models/Full_GP_VAE_fixed_for_MovMnist.py:99);
    here the O(T^3) trace/logdet terms are computed once and broadcast, and
    only the O(T^2) per-sequence quad term runs at full batch.
    """
    if mask is not None:
        mu = mu * mask.astype(mu.dtype)[..., None]
    b, t = mu.shape[0], mu.shape[-2]
    if _inverse_path(t):
        # ONE lane-batched inverse of L_p, applied by MXU matmuls to both
        # the trace term and the quad term (vs two separate trsm/inversions)
        from gpvae_tpu.ops import pallas_tri
        inv_p = pallas_tri.tri_inv(l_p)
        tr = _tri_tri_frob2(inv_p, l_q)               # ||L_p^{-1} L_q||_F^2
        if inv_p.shape[0] == 1 and b > 1:  # shared fixed-grid factor
            v = jnp.einsum(
                "zij,bjz->bzi", inv_p[0], mu,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        else:
            v = jnp.einsum(
                "bzij,bjz->bzi", inv_p, mu,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        quad = jnp.sum(v * v, axis=-1)
    else:
        a = solve_triangular(l_p, l_q)                # L_p^{-1} L_q
        tr = jnp.sum(a * a, axis=(-2, -1))            # [B or 1, Z]
        mu_bz = jnp.swapaxes(mu, -1, -2)[..., None]   # [B, Z, T, 1]
        l_p_full = (
            jnp.broadcast_to(l_p, (b,) + l_p.shape[1:])
            if l_p.shape[0] == 1 and b > 1 else l_p
        )
        v = solve_triangular(l_p_full, mu_bz)
        quad = jnp.sum(v * v, axis=(-2, -1))
    ld_p = logdet_from_chol(l_p)
    ld_q = logdet_from_chol(l_q)
    return 0.5 * (jnp.broadcast_to(tr, quad.shape) + quad - t
                  + jnp.broadcast_to(ld_p - ld_q, quad.shape))


def gp_prior_diag_kl(
    mu: jnp.ndarray,
    log_var: jnp.ndarray,
    l_p: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """KL( N(mu, diag v) || N(0, K_p) ) -> ``[B, Z]``.

    The diag-posterior/GP-prior KL of src/Models/VAE_GPprior_diag_cov.py:73-119
    (which uses raw ``tf.matrix_inverse``/``matrix_determinant``), rewritten:

        KL = 1/2 [ sum_i v_i * d_i + ||L_p^{-1} mu||^2 - T
                   + logdet K_p - sum_i log v_i ]

    with ``d_i = (K_p^{-1})_ii = sum_j W_ji^2`` from one trsm ``W = L_p^{-1}``.
    Masked steps use v=1, mu=0 and contribute 0.
    """
    if mask is not None:
        m = mask.astype(mu.dtype)[..., None]
        mu = mu * m
        log_var = log_var * m  # masked -> log v = 0 -> v = 1
    b, t = mu.shape[0], mu.shape[-2]
    if _inverse_path(t):
        # W = L^{-1} I is literally the triangular inverse: one lane-batched
        # kernel call, reused for both the trace diag and the quad term
        from gpvae_tpu.ops import pallas_tri
        w = pallas_tri.tri_inv(l_p)
        if w.shape[0] == 1 and b > 1:
            y = jnp.einsum(
                "zij,bjz->bzi", w[0], mu,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        else:
            y = jnp.einsum(
                "bzij,bjz->bzi", w, mu,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        quad = jnp.sum(y * y, axis=-1)
    else:
        eye = jnp.broadcast_to(jnp.eye(t, dtype=l_p.dtype), l_p.shape)
        w = solve_triangular(l_p, eye)                # [B or 1, Z, T, T]
        mu_bz = jnp.swapaxes(mu, -1, -2)[..., None]
        l_p_full = (
            jnp.broadcast_to(l_p, (b,) + l_p.shape[1:])
            if l_p.shape[0] == 1 and b > 1 else l_p
        )
        y = solve_triangular(l_p_full, mu_bz)
        quad = jnp.sum(y * y, axis=(-2, -1))
    dinv = jnp.sum(w * w, axis=-2)                    # diag(K^{-1})
    v_bz = jnp.swapaxes(jnp.exp(log_var), -1, -2)     # [B, Z, T]
    tr = jnp.sum(jnp.broadcast_to(
        dinv, v_bz.shape[:1] + dinv.shape[1:]
    ) * v_bz, axis=-1) if dinv.shape[0] == 1 and b > 1 else jnp.sum(
        dinv * v_bz, axis=-1
    )
    ld_p = logdet_from_chol(l_p)
    sum_log_v = jnp.sum(jnp.swapaxes(log_var, -1, -2), axis=-1)
    return 0.5 * (tr + quad - t + jnp.broadcast_to(ld_p, tr.shape)
                  - sum_log_v)


def gp_kl_toeplitz_prior(
    mu: jnp.ndarray,
    l_q: jnp.ndarray,
    prior_row: jnp.ndarray,
) -> jnp.ndarray:
    """KL( N(mu, K_q) || N(0, K_p) ) with a *Toeplitz* prior -> ``[B, Z]``.

    The structured-prior path for uniform shared time grids (all reference
    MNIST configs, src/Models/Full_GP_VAE_fixed_for_MovMnist.py:280, and
    BASELINE config 3 at T=1024): the prior gram is symmetric Toeplitz, so
    instead of a dense O(T^3) *sequential* factorization of K_p, one O(T^2)
    Durbin scan yields its logdet AND the Gohberg-Semencul inverse
    representation ``K_p^{-1} = (A A^T - B B^T)/e`` whose application is
    pure MXU matmuls:

        tr(K_p^{-1} K_q) = (||A^T L_q||_F^2 - ||B^T L_q||_F^2) / e
        mu^T K_p^{-1} mu = (||A^T mu||^2   - ||B^T mu||^2) / e

    * ``prior_row`` ``[Z, T]`` first rows (kernels.toeplitz_row),
    * ``l_q`` ``[B or 1, Z, T, T]`` posterior factors (leading 1 = shared),
    * ``mu`` ``[B, T, Z]``.

    No mask parameter: a uniform shared grid is full by construction.
    Differentiable in ``prior_row`` (learnable prior lengthscales) through
    the scan — no custom VJP needed.
    """
    from gpvae_tpu import toeplitz

    b, t = mu.shape[0], mu.shape[-2]
    ld_p, a_col, b_col, e = toeplitz.durbin_gs_factors(prior_row)
    # A^T / B^T applications ride one shared FFT of the operand: the
    # anticausal correlation irfft(conj(rfft(col)) * rfft(y))[:T] is the
    # triangular-Toeplitz product in O(T log T) per column — the [Z, T, T]
    # A/B matrices never exist and the trace term costs O(Z T^2 log T)
    # instead of dense O(Z T^3) MXU matmuls.
    m_fft = toeplitz._fft_len(t)
    fa = jnp.conj(jnp.fft.rfft(a_col, n=m_fft, axis=-1))   # [Z, M/2+1]
    fb = jnp.conj(jnp.fft.rfft(b_col, n=m_fft, axis=-1))

    def _both_sq(y):
        """(||A^T y||^2, ||B^T y||^2) summed over the last two axes,
        sharing one forward FFT of ``y [..., Z, T, C]``."""
        fy = jnp.fft.rfft(y, n=m_fft, axis=-2)
        ya = jnp.fft.irfft(fa[..., :, None] * fy, n=m_fft, axis=-2)[
            ..., :t, :
        ]
        yb = jnp.fft.irfft(fb[..., :, None] * fy, n=m_fft, axis=-2)[
            ..., :t, :
        ]
        return jnp.sum(ya * ya, axis=(-2, -1)), jnp.sum(
            yb * yb, axis=(-2, -1)
        )

    tr_a, tr_b = _both_sq(l_q)                          # [B or 1, Z]
    qa, qb = _both_sq(jnp.swapaxes(mu, -1, -2)[..., None])  # [B, Z]
    tr = (tr_a - tr_b) / e
    quad = (qa - qb) / e
    ld_q = logdet_from_chol(l_q)
    return 0.5 * (
        jnp.broadcast_to(tr, quad.shape) + quad - t
        + jnp.broadcast_to(ld_p[None] - ld_q, quad.shape)
    )


def gp_prior_diag_kl_toeplitz(
    mu: jnp.ndarray,
    log_var: jnp.ndarray,
    prior_row: jnp.ndarray,
) -> jnp.ndarray:
    """KL( N(mu, diag v) || N(0, K_p) ) with a Toeplitz prior -> ``[B, Z]``.

    Fully O(T^2): the Durbin scan gives logdet K_p and the Gohberg-Semencul
    vectors; ``diag(K_p^{-1})_i = (cumsum(a^2)_i - cumsum(b^2)_i)/e``
    because A/B are lower-triangular Toeplitz, so the trace term needs no
    matrix at all, and the quad term is two matvecs.
    """
    from gpvae_tpu import toeplitz

    b, t = mu.shape[0], mu.shape[-2]
    ld_p, a_col, b_col, e = toeplitz.durbin_gs_factors(prior_row)
    dinv = (
        jnp.cumsum(a_col * a_col, axis=-1)
        - jnp.cumsum(b_col * b_col, axis=-1)
    ) / e[..., None]                                    # [Z, T]
    v_bz = jnp.swapaxes(jnp.exp(log_var), -1, -2)       # [B, Z, T]
    tr = jnp.sum(dinv[None] * v_bz, axis=-1)            # [B, Z]
    mu_c = jnp.swapaxes(mu, -1, -2)[..., None]          # [B, Z, T, 1]
    ya = toeplitz.tri_toeplitz_matvec_t(a_col, mu_c)
    yb = toeplitz.tri_toeplitz_matvec_t(b_col, mu_c)
    quad = (
        jnp.sum(ya * ya, axis=(-2, -1)) - jnp.sum(yb * yb, axis=(-2, -1))
    ) / e
    sum_log_v = jnp.sum(jnp.swapaxes(log_var, -1, -2), axis=-1)
    return 0.5 * (tr + quad - t + ld_p[None] - sum_log_v)


def standard_kl(
    mu: jnp.ndarray,
    log_var: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """KL( N(mu, diag v) || N(0, I) ) summed over latent dim -> ``[B, T]``
    then masked-summed to ``[B]``.

    The standard VAE KL (src/Models/GP_recog_VAE_prior.py:65-70; inline at
    src/Models/Vanilla_VAE.py:71).
    """
    kl_tz = -0.5 * (1.0 + log_var - mu * mu - jnp.exp(log_var))  # [B, T, Z]
    kl_t = jnp.sum(kl_tz, axis=-1)
    if mask is not None:
        kl_t = kl_t * mask.astype(kl_t.dtype)
    return jnp.sum(kl_t, axis=-1)


def recog_gp_kl(
    mu: jnp.ndarray,
    log_var: jnp.ndarray,
    l_q: jnp.ndarray,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Exact KL for the GP-recognition model's *actual* sampling
    distribution: z = mu + (L + diag(sqrt(v))) eps, prior N(0, I).

    The reference pairs that correlated sampler (GP_recog_VAE_prior.py:159-160)
    with the *diagonal* standard KL — the covariance the KL scores is not the
    covariance it samples from.  Here, with C = L_q + diag(sqrt(v)) (masked
    rows identity):

        KL = 1/2 [ ||C||_F^2 + ||mu||^2 - T - 2 sum_i log C_ii ]

    Use :func:`standard_kl` on (mu, log_var) instead for behavioral parity
    with the reference (models.py exposes the flag).
    Returns ``[B, Z]``.
    """
    t = mu.shape[-2]
    sqrt_v = jnp.exp(0.5 * log_var)                   # [B, T, Z]
    if mask is not None:
        m = mask.astype(mu.dtype)[..., None]
        mu = mu * m
        sqrt_v = sqrt_v * m                           # masked -> diag from L (=1)
    c = l_q + _batch_diag(jnp.swapaxes(sqrt_v, -1, -2))
    fro = jnp.sum(c * c, axis=(-2, -1))
    mu_bz = jnp.swapaxes(mu, -1, -2)
    quad = jnp.sum(mu_bz * mu_bz, axis=-1)
    diag_c = jnp.diagonal(c, axis1=-2, axis2=-1)
    ld = 2.0 * jnp.sum(jnp.log(diag_c), axis=-1)
    return 0.5 * (fro + quad - t - ld)


def _batch_diag(v: jnp.ndarray) -> jnp.ndarray:
    """[..., T] -> [..., T, T] diagonal embed."""
    return v[..., :, None] * jnp.eye(v.shape[-1], dtype=v.dtype)


# ---------------------------------------------------------------------------
# Reparameterized sampling
# ---------------------------------------------------------------------------

def gp_sample(
    key: jax.Array,
    mu: jnp.ndarray,
    l_q: jnp.ndarray,
    num_samples: int = 1,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Correlated reparameterized samples ``z = mu + (L eps)`` -> [S, B, T, Z].

    One batched MXU einsum replacing the reference's per-sequence
    transpose/split/slice/concat pipeline (``gp_vae_sample``,
    src/Models/syndata/GP_VAE_syn_data.py:147-166).  Noise comes from an
    explicit key — the reference's in-graph ``tf.random_normal`` re-draws on
    every fetch (SURVEY.md §3.4), which explicit keys make impossible.
    ``l_q`` with leading dim 1 is shared across the batch (fixed-time grid).
    """
    b = mu.shape[0]
    _, z, t, _ = l_q.shape
    eps = jax.random.normal(key, (num_samples, b, z, t), dtype=mu.dtype)
    if l_q.shape[0] == 1 and b > 1:
        corr = jnp.einsum(
            "zij,sbzj->sbiz", l_q[0], eps,
            preferred_element_type=jnp.float32,
        )
    else:
        corr = jnp.einsum(
            "bzij,sbzj->sbiz", l_q, eps, preferred_element_type=jnp.float32
        )
    out = mu[None] + corr
    if mask is not None:
        out = out * mask.astype(out.dtype)[None, :, :, None]
    return out


def diag_sample(
    key: jax.Array,
    mu: jnp.ndarray,
    log_var: jnp.ndarray,
    num_samples: int = 1,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """``z = mu + sqrt(v) eps`` -> [S, B, T, Z]
    (reference ``vae_sample``, src/Models/VAE_GPprior_diag_cov.py:64-71)."""
    eps = jax.random.normal(
        key, (num_samples,) + mu.shape, dtype=mu.dtype
    )
    out = mu[None] + jnp.exp(0.5 * log_var)[None] * eps
    if mask is not None:
        out = out * mask.astype(out.dtype)[None, :, :, None]
    return out


def recog_sample(
    key: jax.Array,
    mu: jnp.ndarray,
    log_var: jnp.ndarray,
    l_q: jnp.ndarray,
    num_samples: int = 1,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """GP-recognition sampler ``z = mu + (L + diag(sqrt(v))) eps``
    (src/Models/GP_recog_VAE_prior.py:155-166) -> [S, B, T, Z].

    ``l_q`` with leading dim 1 (shared fixed-grid factor) broadcasts against
    the per-sequence ``diag(sqrt(v))``; the noise batch size always follows
    ``mu`` so every sequence gets an independent draw."""
    b = mu.shape[0]
    _, z, t, _ = l_q.shape
    sqrt_v = jnp.exp(0.5 * jnp.swapaxes(log_var, -1, -2))  # [B, Z, T]
    c = l_q + _batch_diag(sqrt_v)                          # broadcasts to B
    eps = jax.random.normal(key, (num_samples, b, z, t), dtype=mu.dtype)
    corr = jnp.einsum(
        "bzij,sbzj->sbiz", c, eps, preferred_element_type=jnp.float32
    )
    out = mu[None] + corr
    if mask is not None:
        out = out * mask.astype(out.dtype)[None, :, :, None]
    return out


def prior_sample(
    key: jax.Array,
    l_p: jnp.ndarray,
    num_samples: int = 1,
) -> jnp.ndarray:
    """Draw latent trajectories from the GP prior: ``z = L_p eps``
    (reference ``prior_gp_sample``,
    src/Models/FullGP_and_GPdecoder_dynamic_time_analysis.py:24-30).
    Returns ``[S, B, T, Z]``."""
    b, z, t, _ = l_p.shape
    eps = jax.random.normal(key, (num_samples, b, z, t), dtype=l_p.dtype)
    return jnp.einsum(
        "bzij,sbzj->sbiz", l_p, eps, preferred_element_type=jnp.float32
    )


# ---------------------------------------------------------------------------
# GP posterior conditioning (imputation)
# ---------------------------------------------------------------------------

class GPPosterior(NamedTuple):
    mean: jnp.ndarray  # [B, Tq, Z]
    cov: jnp.ndarray   # [B, Z, Tq, Tq]


def posterior_conditional(
    times_obs: jnp.ndarray,
    z_obs: jnp.ndarray,
    times_query: jnp.ndarray,
    lengthscales: jnp.ndarray,
    *,
    mask_obs: jnp.ndarray | None = None,
    kernel: str = "rbf",
    noise: float = kernels_lib.DEFAULT_NOISE,
    variance: jnp.ndarray | float = 1.0,
    jitter: float | None = None,
    with_cov: bool = True,
) -> GPPosterior:
    """Batched GP conditioning p(z(t_query) | z(t_obs)) per latent dim.

    The TPU-native form of the numpy imputation oracle
    ``sample_given_part_latent``
    (src/Models/FullGP_and_GPdecoder_dynamic_time_analysis.py:40-56):

        L   = chol(K_oo + jitter I)
        A   = L^{-1} K_oq
        m*  = A^T L^{-1} z_obs
        S*  = K_qq - A^T A

    Masked observations are identity-padded in ``K_oo`` and zero rows of
    ``K_oq`` / ``z_obs``, contributing nothing.

    * ``times_obs`` ``[B, To]``, ``z_obs`` ``[B, To, Z]``,
      ``times_query`` ``[B, Tq]``.

    ``with_cov=False`` skips ``K_qq`` and ``S*`` entirely and returns
    ``cov=None`` — at T=4096 the posterior covariance is a 537 MB/seq
    buffer that mean-imputation never reads.
    """
    if jitter is None:
        # fp32 factorizations need ~1e-4 headroom on near-singular RBF
        # grams; 1e-6 is a fp64 habit (the noise term usually dominates,
        # but noise can legitimately be set near zero here)
        jitter = 1e-6 if jnp.dtype(times_obs.dtype).itemsize >= 8 else 1e-5
    k_oo = kernels_lib.gram_bank(
        times_obs, lengthscales, kernel=kernel, noise=noise,
        variance=variance, mask=mask_obs,
    )
    t_o = times_obs.shape[-1]
    k_oo = k_oo + jitter * jnp.eye(t_o, dtype=k_oo.dtype)
    k_oq = kernels_lib.cross_gram(
        times_obs, times_query, lengthscales, kernel=kernel, noise=noise,
        variance=variance, mask_a=mask_obs,
    )
    l = cholesky(k_oo)
    a = solve_triangular(l, k_oq)                      # [B, Z, To, Tq]
    z_bz = jnp.swapaxes(z_obs, -1, -2)[..., None]      # [B, Z, To, 1]
    if mask_obs is not None:
        z_bz = z_bz * mask_obs.astype(z_bz.dtype)[:, None, :, None]
    alpha = solve_triangular(l, z_bz)                  # L^{-1} z
    mean = jnp.einsum(
        "bzoq,bzor->bzqr", a, alpha, preferred_element_type=jnp.float32
    )[..., 0]                                          # [B, Z, Tq]
    if not with_cov:
        return GPPosterior(mean=jnp.swapaxes(mean, -1, -2), cov=None)
    k_qq = kernels_lib.gram_bank(
        times_query, lengthscales, kernel=kernel, noise=noise,
        variance=variance,
    )
    cov = k_qq - jnp.einsum(
        "bzoq,bzor->bzqr", a, a, preferred_element_type=jnp.float32
    )
    return GPPosterior(mean=jnp.swapaxes(mean, -1, -2), cov=cov)


def posterior_sample(
    key: jax.Array,
    post: GPPosterior,
    num_samples: int = 1,
    jitter: float | None = None,
) -> jnp.ndarray:
    """Sample trajectories from a conditioned posterior -> [S, B, Tq, Z]
    (reference ``post_gp_sample`` with ``mean_or_sample='sample'``,
    src/Models/FullGP_and_GPdecoder_dynamic_time_analysis.py:96-111)."""
    b, z, tq, _ = post.cov.shape
    if jitter is None:
        jitter = (
            1e-6 if jnp.dtype(post.cov.dtype).itemsize >= 8 else 1e-5
        )
    cov = post.cov + jitter * jnp.eye(tq, dtype=post.cov.dtype)
    l = cholesky(cov)
    eps = jax.random.normal(key, (num_samples, b, z, tq), post.mean.dtype)
    corr = jnp.einsum(
        "bzij,sbzj->sbiz", l, eps, preferred_element_type=jnp.float32
    )
    return post.mean[None] + corr
