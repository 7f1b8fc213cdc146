"""Linalg ops (Cholesky / trsm / logdet) vs fp64 oracles, incl. gradients."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpvae_tpu import kernels
from gpvae_tpu.ops import (
    cholesky,
    cholesky_blocked,
    chol_small_batched,
    gram_chol_fused,
    logdet_from_chol,
    slogdet_psd,
    solve_triangular,
)


def random_psd(rng, n, t, cond_scale=1.0):
    a = rng.standard_normal((n, t, t)) * cond_scale
    k = a @ np.swapaxes(a, -1, -2) + t * np.eye(t)
    return k.astype(np.float64)


@pytest.mark.parametrize("t", [4, 20, 45, 64])
def test_chol_small_batched_vs_oracle(t):
    rng = np.random.default_rng(0)
    k = random_psd(rng, 7, t)
    got = chol_small_batched(jnp.asarray(k, jnp.float32))
    want = np.linalg.cholesky(k)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("t", [96, 128, 200, 256])
def test_cholesky_blocked_vs_oracle(t):
    rng = np.random.default_rng(1)
    k = random_psd(rng, 3, t)
    got = cholesky_blocked(jnp.asarray(k, jnp.float32))
    want = np.linalg.cholesky(k)
    err = np.abs(np.asarray(got) - want)
    scale = np.abs(want).max()
    assert err.max() / scale < 5e-4


def test_cholesky_gram_conditioning_regime():
    # the reference's actual regime: scaled-RBF gram, T=20, l=1, cond~60
    # (SURVEY.md §6, measured logdet ~ -12.576)
    times = jnp.arange(1.0, 21.0)[None]
    k = kernels.gram_bank(times, jnp.array([1.0]))
    ld = slogdet_psd(jnp.asarray(k, jnp.float32))
    assert abs(float(ld[0, 0]) - (-12.576)) < 1e-2


def test_cholesky_near_singular_probe():
    # generalization of determinant_testing_minimal.py: long lengthscale on a
    # dense grid -> near-singular gram whose raw determinant (~3e-110) is far
    # below fp32 underflow (~1e-38) — the failure mode that forced the
    # reference's fp64 casts; logdet-via-Cholesky stays finite in fp32.
    times = jnp.linspace(0.0, 45.0, 45)[None]
    k = kernels.gram_bank(times, jnp.array([9.0]))
    assert np.linalg.det(np.asarray(k[0, 0])) < 1e-38
    ld = slogdet_psd(jnp.asarray(k, jnp.float32))
    assert np.isfinite(float(ld[0, 0]))
    ld64 = np.linalg.slogdet(np.asarray(k[0, 0]))[1]
    assert abs(float(ld[0, 0]) - ld64) / abs(ld64) < 1e-3


def test_gram_chol_fused_matches_composition():
    rng = np.random.default_rng(2)
    b, z, t = 3, 2, 20
    times = np.sort(rng.uniform(0, 45, (b, t)), axis=-1).astype(np.float32)
    mask = np.ones((b, t), bool)
    mask[0, 15:] = False
    mask[2, 10:] = False
    ls = np.array([9.0, 3.0], np.float32)
    got = gram_chol_fused(
        jnp.asarray(times), jnp.asarray(ls), mask=jnp.asarray(mask)
    )
    kb = kernels.gram_bank(
        jnp.asarray(times), jnp.asarray(ls), mask=jnp.asarray(mask)
    )
    want = np.linalg.cholesky(np.asarray(kb, np.float64))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_cholesky_custom_vjp_matches_jax_native():
    rng = np.random.default_rng(3)
    k = random_psd(rng, 2, 12)
    k32 = jnp.asarray(k, jnp.float32)

    def loss_custom(k):
        l = cholesky(k)
        return jnp.sum(jnp.log(jnp.diagonal(l, axis1=-2, axis2=-1))) + jnp.sum(
            l * jnp.cos(jnp.arange(12.0, dtype=k.dtype))
        )

    def loss_native(k):
        l = jnp.linalg.cholesky(k)
        return jnp.sum(jnp.log(jnp.diagonal(l, axis1=-2, axis2=-1))) + jnp.sum(
            l * jnp.cos(jnp.arange(12.0, dtype=k.dtype))
        )

    g_custom = jax.grad(loss_custom)(k32)
    g_native = jax.grad(loss_native)(jnp.asarray(k))
    np.testing.assert_allclose(
        np.asarray(g_custom), np.asarray(g_native), rtol=1e-3, atol=1e-4
    )


def test_solve_triangular_roundtrip():
    rng = np.random.default_rng(4)
    k = random_psd(rng, 5, 30)
    l = np.linalg.cholesky(k)
    b = rng.standard_normal((5, 30, 4))
    x = solve_triangular(jnp.asarray(l), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(jnp.einsum("nij,njk->nik",
                                                     jnp.asarray(l), x)),
                               b, atol=1e-8)


def test_logdet_from_chol_masked_padding_contributes_zero():
    times = jnp.arange(10.0)[None]
    mask = jnp.array([[True] * 6 + [False] * 4])
    k_masked = kernels.gram_bank(times, jnp.array([2.0]), mask=mask)
    k_short = kernels.gram_bank(times[:, :6], jnp.array([2.0]))
    ld_m = logdet_from_chol(jnp.linalg.cholesky(k_masked))
    ld_s = logdet_from_chol(jnp.linalg.cholesky(k_short))
    np.testing.assert_allclose(
        np.asarray(ld_m), np.asarray(ld_s), atol=1e-10
    )


def test_chol_inv_fused_kernel():
    from gpvae_tpu.ops.pallas_chol import chol_inv_small_batched

    rng = np.random.default_rng(11)
    k = random_psd(rng, 5, 40)
    l, x = chol_inv_small_batched(jnp.asarray(k, jnp.float32))
    want_l = np.linalg.cholesky(k)
    np.testing.assert_allclose(np.asarray(l), want_l, rtol=2e-4, atol=2e-4)
    roundtrip = np.asarray(x) @ want_l
    np.testing.assert_allclose(
        roundtrip, np.broadcast_to(np.eye(40), roundtrip.shape), atol=5e-4
    )


@pytest.mark.parametrize("t", [128, 200, 384])
def test_cholesky_blocked_fused_vs_oracle(t):
    """The streaming panel+trailing Pallas path (ops/pallas_trail.py)."""
    from gpvae_tpu.ops.chol import cholesky_blocked_fused

    rng = np.random.default_rng(2)
    k = random_psd(rng, 3, t)
    got = np.asarray(cholesky_blocked_fused(jnp.asarray(k, jnp.float32)))
    want = np.linalg.cholesky(k)
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < 5e-5, err
    assert np.allclose(got, np.tril(got))


def test_cholesky_fused_gradient_matches_xla():
    """The shared custom VJP applies regardless of forward method."""
    rng = np.random.default_rng(3)
    k = jnp.asarray(random_psd(rng, 2, 160), jnp.float32)
    w = jnp.asarray(rng.standard_normal(k.shape[-2:]), jnp.float32)

    def loss(method):
        return lambda kk: jnp.sum(cholesky(kk, method=method) * w)

    g_fused = jax.grad(loss("blocked_fused"))(k)
    g_xla = jax.grad(loss("xla"))(k)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_xla), rtol=2e-3, atol=2e-4
    )


@pytest.mark.parametrize("t", [100, 256, 520])
def test_tri_inv_blocked_vs_oracle(t):
    """Block-recursive triangular inverse (the large-T solve route)."""
    from gpvae_tpu.ops import pallas_tri

    rng = np.random.default_rng(4)
    k = random_psd(rng, 3, t)
    l = np.linalg.cholesky(k).astype(np.float32)
    x = np.asarray(pallas_tri.tri_inv(jnp.asarray(l)))
    want = np.linalg.inv(l.astype(np.float64))
    err = np.abs(x - want).max() / np.abs(want).max()
    assert err < 1e-4, err
    assert np.allclose(x, np.tril(x))
    # and through the differentiable entry with a gradient
    g = jax.grad(
        lambda ll: jnp.sum(pallas_tri.tri_inv(ll) * jnp.cos(
            jnp.arange(ll.size).reshape(ll.shape)))
    )(jnp.asarray(l))
    assert np.isfinite(np.asarray(g)).all()


def test_solve_triangular_inverse_route_large_t():
    from gpvae_tpu.ops.trsm import solve_triangular

    rng = np.random.default_rng(5)
    k = random_psd(rng, 2, 200)
    l = jnp.asarray(np.linalg.cholesky(k), jnp.float32)
    b = jnp.asarray(rng.standard_normal((2, 200, 7)), jnp.float32)
    x_inv = solve_triangular(l, b, via_inverse=True)
    x_sub = solve_triangular(l, b, via_inverse=False)
    np.testing.assert_allclose(
        np.asarray(x_inv), np.asarray(x_sub), rtol=2e-3, atol=2e-3
    )


@pytest.mark.parametrize("t,method", [
    (200, "blocked_inplace"), (384, "blocked_inplace"),
    (520, "blocked_inplace"),
    (192, "blocked_fused_64"), (256, "blocked_fused_64"),
])
def test_cholesky_round3_paths_vs_oracle(t, method):
    """Round-3 large-T paths: the in-place left-looking factorization
    (ops/pallas_big.py) and the 64-wide fused panel path.  With
    FAST_DOTS=False (the default since the round-3 A/B: the 3-pass bf16
    dots bought ~4% and cost 200x factor accuracy on correlated grams)
    every contraction is HIGHEST precision, so these sit in the ~1e-5
    family; 5e-5 is a safe bound well inside the ELBO-level 1e-4
    north-star budget (BASELINE.md)."""
    from gpvae_tpu.ops.chol import _cholesky_fwd_impl

    rng = np.random.default_rng(5)
    k = random_psd(rng, 3, t)
    got = np.asarray(_cholesky_fwd_impl(jnp.asarray(k, jnp.float32), method))
    want = np.linalg.cholesky(k)
    err = np.abs(got - want).max() / np.abs(want).max()
    assert err < 5e-5, (method, t, err)
    assert np.allclose(got, np.tril(got))


def test_cholesky_inplace_gradient_matches_xla():
    from gpvae_tpu.ops.chol import cholesky

    rng = np.random.default_rng(6)
    k = jnp.asarray(random_psd(rng, 2, 200), jnp.float32)
    w = jnp.asarray(rng.standard_normal(k.shape[-2:]), jnp.float32)

    def loss(method):
        return lambda kk: jnp.sum(cholesky(kk, method=method) * w)

    g = jax.grad(loss("blocked_inplace"))(k)
    g_xla = jax.grad(loss("xla"))(k)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_xla), rtol=2e-3, atol=2e-4
    )
