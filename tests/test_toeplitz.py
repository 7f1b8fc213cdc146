"""Toeplitz structured path vs dense fp64 oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpvae_tpu import kernels, toeplitz


def make_row(t, ls, noise=1e-3, dtype=np.float64):
    return np.asarray(
        kernels.toeplitz_row(t, 1.0, jnp.array([ls]), noise=noise,
                             dtype=dtype)
    )[0]


@pytest.mark.parametrize("t,ls", [(16, 2.0), (64, 3.0), (256, 5.0)])
def test_durbin_logdet_vs_dense(t, ls):
    row = make_row(t, ls)
    dense = np.asarray(kernels.toeplitz_to_dense(jnp.asarray(row)))
    want = np.linalg.slogdet(dense)[1]
    got = float(toeplitz.durbin_logdet(jnp.asarray(row)))
    assert abs(got - want) < 1e-6 * max(1.0, abs(want)), (got, want)


def test_durbin_logdet_batched():
    rows = jnp.stack(
        [jnp.asarray(make_row(32, ls)) for ls in (1.0, 3.0, 9.0)]
    )
    got = toeplitz.durbin_logdet(rows)
    assert got.shape == (3,)
    for i, ls in enumerate((1.0, 3.0, 9.0)):
        dense = np.asarray(kernels.toeplitz_to_dense(rows[i]))
        want = np.linalg.slogdet(dense)[1]
        assert abs(float(got[i]) - want) < 1e-6 * max(1.0, abs(want))


def test_circulant_prior_sample_covariance():
    # empirical covariance of FFT draws matches the dense Toeplitz gram
    t = 24
    row = jnp.stack([
        jnp.asarray(make_row(t, 3.0, dtype=np.float64)),
    ])
    zs = toeplitz.circulant_prior_sample(jax.random.key(0), row, 30000)
    zs = np.asarray(zs)[:, 0, :]
    emp = np.cov(zs.T)
    dense = np.asarray(kernels.toeplitz_to_dense(row[0]))
    assert np.abs(emp - dense).max() < 0.08


def test_durbin_logdet_long_sequence():
    # T=1024 regime (BASELINE config 3): O(T^2) logdet stays finite and
    # matches dense slogdet
    t = 1024
    row = make_row(t, 16.0, noise=1e-2)
    got = float(toeplitz.durbin_logdet(jnp.asarray(row)))
    dense = np.asarray(kernels.toeplitz_to_dense(jnp.asarray(row)))
    want = np.linalg.slogdet(dense)[1]
    assert abs(got - want) / abs(want) < 1e-6


@pytest.mark.parametrize("t", [16, 45, 128])
def test_fft_tri_toeplitz_matvec_vs_dense(t):
    # A y and A^T y via FFT correlation == dense triangular-Toeplitz matmul
    rng = np.random.default_rng(3)
    col = jnp.asarray(rng.standard_normal((2, t)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((2, t, 5)).astype(np.float32))
    dense = np.asarray(toeplitz.tri_toeplitz(col))          # [2, T, T]
    got_t = np.asarray(toeplitz.tri_toeplitz_matvec_t(col, y))
    want_t = np.einsum("zji,zjc->zic", dense, np.asarray(y))
    np.testing.assert_allclose(got_t, want_t, rtol=2e-5, atol=2e-5)
    got = np.asarray(toeplitz.tri_toeplitz_matvec(col, y))
    want = np.einsum("zij,zjc->zic", dense, np.asarray(y))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fft_tri_toeplitz_matvec_batched_leading():
    rng = np.random.default_rng(4)
    col = jnp.asarray(rng.standard_normal((3, 20)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((4, 3, 20, 2)).astype(np.float32))
    dense = np.asarray(toeplitz.tri_toeplitz(col))
    got = np.asarray(toeplitz.tri_toeplitz_matvec_t(col, y))
    want = np.einsum("zji,bzjc->bzic", dense, np.asarray(y))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("nb", [8, 32])
@pytest.mark.parametrize("comp", ["0", "1"])
def test_blocked_durbin_matches_scan(nb, comp, monkeypatch):
    """The blocked Schur/Durbin (VERDICT r3 #9) computes the same algebra
    as the classical scan — fp64 agreement to ~1e-12 on (logdet, a, b, e),
    including a non-divisible T (remainder block masking) — with both the
    plain and the compensated (two-float) theta tree."""
    monkeypatch.setenv("GPVAE_DURBIN_COMP", comp)
    for t in (45, 257):
        row = jnp.asarray(make_row(t, 3.0))
        # env vars are re-read per call and thread through jit as static
        # args — no jax.clear_caches() needed (round-5 advisor fix)
        monkeypatch.setenv("GPVAE_DURBIN_BLOCK", "0")
        want = [np.asarray(v) for v in toeplitz.durbin_gs_factors(row[None])]
        monkeypatch.setenv("GPVAE_DURBIN_BLOCK", str(nb))
        monkeypatch.setenv("GPVAE_DURBIN_MIN_T", "1")
        got = [np.asarray(v) for v in toeplitz.durbin_gs_factors(row[None])]
        for g, w in zip(got, want):
            np.testing.assert_allclose(g, w, rtol=1e-9, atol=1e-10)


def test_ds_poly_mul_vs_fp64():
    """The two-float polynomial product (the compensated theta tree's
    primitive) matches the fp64 convolution from fp32 inputs to ~2^-40 —
    far past plain fp32's ~1e-7."""
    rng = np.random.default_rng(7)
    a64 = rng.standard_normal((3, 17))
    b64 = rng.standard_normal((3, 9))
    a32 = a64.astype(np.float32).astype(np.float64)  # exact fp32 values
    b32 = b64.astype(np.float32).astype(np.float64)
    want = np.stack([np.convolve(a32[i], b32[i]) for i in range(3)])
    ah = jnp.asarray(a32, jnp.float32)
    bh = jnp.asarray(b32, jnp.float32)
    zh = jnp.zeros_like(ah)
    zb = jnp.zeros_like(bh)
    hi, lo = toeplitz._ds_poly_mul(ah, zh, bh, zb)
    got = np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() < 1e-12 * scale


def test_durbin_comp_near_singular_t4096():
    """VERDICT r4 weak #5 / next #7: the compensated theta tree holds the
    fp32 blocked logdet to <=1e-4 of the fp64 dense oracle at the t4096
    preset conditioning (grid 60/T, ls=9 ~ 614 grid steps, noise 1e-3) —
    the regime where plain fp32 measures ~3.3e-4.  Error attribution and
    the measured bands: benchmarks/prof_durbin_comp.py, BASELINE.md r5."""
    t = 4096
    noise = 1e-3
    row64 = np.asarray(
        kernels.toeplitz_row(t, 60.0 / t, jnp.array([9.0]), noise=noise,
                             dtype=jnp.float64)
    )[0]
    row = jnp.asarray(row64, jnp.float32)
    logdet = float(toeplitz.durbin_logdet(row[None])[0])  # comp default ON
    dense = np.asarray(kernels.toeplitz_to_dense(jnp.asarray(row64)))
    want = np.linalg.slogdet(dense)[1]
    assert abs(logdet - want) / abs(want) < 1e-4, (logdet, want)


def test_blocked_durbin_gradient_matches_scan(monkeypatch):
    """Lengthscale gradients through the blocked recursion == through the
    scan (the prior lengthscales are learnable in the fixed-MNIST config,
    src/Models/Full_GP_VAE_fixed_for_MovMnist.py:96)."""
    def f(ls):
        row = kernels.toeplitz_row(64, 1.0, ls, noise=1e-3,
                                   dtype=jnp.float64)
        ld, a, b, e = toeplitz.durbin_gs_factors(row)
        return jnp.sum(ld) + jnp.sum(a * a) + jnp.sum(b * b) + jnp.sum(e)

    ls = jnp.asarray([3.0], jnp.float64)
    monkeypatch.setenv("GPVAE_DURBIN_BLOCK", "0")
    want = np.asarray(jax.grad(f)(ls))
    monkeypatch.setenv("GPVAE_DURBIN_BLOCK", "16")
    monkeypatch.setenv("GPVAE_DURBIN_MIN_T", "1")
    got = np.asarray(jax.grad(f)(ls))
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_durbin_gs_fp32_stability_t4096():
    """The structured prior's contract is *stability at scale*: the fp32
    Durbin (blocked Schur dispatch at this size) + GS inverse must stay
    finite and accurate at T=4096 on a smooth RBF row.  nb=128 measured
    *more* accurate than the scan here (1.7e-3 vs 3.0e-3 GS-identity —
    fewer tail-update roundings)."""
    t = 4096
    row64 = make_row(t, 64.0, noise=1e-3)          # long lengthscale: the
    # hard regime — strongly correlated, prediction errors shrink fast
    row = jnp.asarray(row64, jnp.float32)
    logdet, a, b, e = toeplitz.durbin_gs_factors(row[None])
    logdet, a, b, e = (np.asarray(v)[0] for v in (logdet, a, b, e))
    assert np.isfinite(logdet) and np.isfinite(e) and e > 0
    assert np.isfinite(a).all() and np.isfinite(b).all()
    # logdet vs dense fp64 oracle
    dense = np.asarray(kernels.toeplitz_to_dense(jnp.asarray(row64)))
    want = np.linalg.slogdet(dense)[1]
    assert abs(logdet - want) / abs(want) < 5e-4, (logdet, want)
    # GS inverse applies correctly: K (K^{-1} v) == v through the fp64
    # reassembly of (A A^T - B B^T)/e
    rng = np.random.default_rng(0)
    v = rng.standard_normal(t)
    a64, b64 = a.astype(np.float64), b.astype(np.float64)
    A = np.asarray(toeplitz.tri_toeplitz(jnp.asarray(a64)[None]))[0]
    B = np.asarray(toeplitz.tri_toeplitz(jnp.asarray(b64)[None]))[0]
    kinv_v = (A @ (A.T @ v) - B @ (B.T @ v)) / e
    back = dense @ kinv_v
    assert np.abs(back - v).max() < 5e-3, np.abs(back - v).max()
