"""Gram construction vs fp64 numpy oracles (reference semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpvae_tpu import kernels


def ref_gram_np(times, lengthscale, noise=1e-3):
    """fp64 oracle for the reference scaled-RBF gram
    (src/Models/syndata/GP_VAE_syn_data.py:129-137)."""
    t = np.asarray(times, np.float64)
    dt = t[:, None] - t[None, :]
    k = np.exp(-(dt ** 2) / (2.0 * lengthscale ** 2))
    return (1.0 - noise) * k + noise * np.eye(len(t))


def test_reference_gram_parity():
    rng = np.random.default_rng(0)
    times = np.sort(rng.choice(45, size=20, replace=False)).astype(np.float64)
    for ls in [1.0, 3.0, 9.0]:
        got = kernels.gram(jnp.asarray(times), jnp.asarray(ls))
        want = ref_gram_np(times, ls)
        np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=1e-12)


def test_gram_bank_matches_per_item():
    rng = np.random.default_rng(1)
    b, z, t = 4, 3, 17
    times = rng.uniform(0, 45, (b, t)).astype(np.float64)
    ls = np.array([9.0, 3.0, 1.0])
    bank = kernels.gram_bank(jnp.asarray(times), jnp.asarray(ls))
    assert bank.shape == (b, z, t, t)
    for i in range(b):
        for j in range(z):
            want = ref_gram_np(times[i], ls[j])
            np.testing.assert_allclose(
                np.asarray(bank[i, j]), want, atol=1e-12
            )


def test_gram_bank_mask_identity_padding():
    b, t = 2, 10
    times = jnp.tile(jnp.arange(t, dtype=jnp.float64)[None], (b, 1))
    mask = jnp.array([[True] * 6 + [False] * 4, [True] * 10])
    bank = kernels.gram_bank(times, jnp.array([2.0]), mask=mask)
    k0 = np.asarray(bank[0, 0])
    # masked block is exactly identity
    np.testing.assert_allclose(k0[6:, 6:], np.eye(4), atol=0)
    np.testing.assert_allclose(k0[:6, 6:], 0.0, atol=0)
    # observed block matches the unmasked gram of the first 6 times
    want = ref_gram_np(np.arange(6), 2.0)
    np.testing.assert_allclose(k0[:6, :6], want, atol=1e-12)
    # eigenvalues stay >= noise level: well-posed for Cholesky
    assert np.linalg.eigvalsh(k0).min() > 1e-4


@pytest.mark.parametrize("name", sorted(kernels.KERNELS))
def test_kernel_families_psd(name):
    # every kernel family yields a factorizable gram on an irregular grid
    rng = np.random.default_rng(2)
    times = jnp.asarray(np.sort(rng.uniform(0, 60, 30)))
    k = kernels.gram(times, jnp.asarray(5.0), kernel=name)
    np.linalg.cholesky(np.asarray(k))  # raises if not PD


def test_cross_gram_masking():
    b, to, tq = 2, 8, 5
    times_o = jnp.tile(jnp.arange(to, dtype=jnp.float64)[None], (b, 1))
    times_q = jnp.tile(jnp.linspace(0, 7, tq)[None], (b, 1))
    mask = jnp.array([[True] * 5 + [False] * 3, [True] * 8])
    k = kernels.cross_gram(times_o, times_q, jnp.array([2.0]), mask_a=mask)
    assert k.shape == (b, 1, to, tq)
    np.testing.assert_allclose(np.asarray(k[0, 0, 5:, :]), 0.0, atol=0)


def test_toeplitz_matches_dense():
    t, step = 32, 1.0
    ls = jnp.array([3.0, 9.0])
    row = kernels.toeplitz_row(t, step, ls)
    dense = kernels.toeplitz_to_dense(row)
    times = jnp.arange(t, dtype=jnp.float32)[None]
    want = kernels.gram_bank(times, ls)[0]
    np.testing.assert_allclose(
        np.asarray(dense), np.asarray(want), atol=1e-6
    )
