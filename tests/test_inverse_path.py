"""The TPU inverse-routed fast paths (lane-batched tri_inv + MXU matmuls)
must match the substitution paths — exercised in interpreter mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpvae_tpu import gp, kernels
from gpvae_tpu.ops import solve_triangular
from gpvae_tpu.ops.pallas_tri import tri_inv


@pytest.fixture
def force_inverse():
    gp.FORCE_INVERSE_PATH = True
    yield
    gp.FORCE_INVERSE_PATH = None


def _bank(rng, b, z, t, ls):
    times = jnp.asarray(np.sort(rng.uniform(0, 45, (b, t)), -1), jnp.float32)
    return jnp.linalg.cholesky(
        kernels.gram_bank(times, jnp.asarray(ls, jnp.float32))
    ).astype(jnp.float32)


def test_gp_kl_inverse_path_matches_solve_path(force_inverse):
    rng = np.random.default_rng(0)
    b, z, t = 4, 2, 12
    l_q = _bank(rng, b, z, t, [2.0, 5.0])
    l_p = _bank(rng, b, z, t, [9.0, 3.0])
    mu = jnp.asarray(rng.standard_normal((b, t, z)), jnp.float32)
    kl_fast = gp.gp_kl(mu, l_q, l_p)
    gp.FORCE_INVERSE_PATH = False
    kl_slow = gp.gp_kl(mu, l_q, l_p)
    np.testing.assert_allclose(
        np.asarray(kl_fast), np.asarray(kl_slow), rtol=1e-4, atol=1e-5
    )


def test_gp_kl_inverse_path_shared_factor(force_inverse):
    rng = np.random.default_rng(1)
    b, z, t = 5, 2, 10
    l_q = _bank(rng, 1, z, t, [2.0, 4.0])
    l_p = _bank(rng, 1, z, t, [1.0, 1.0])
    mu = jnp.asarray(rng.standard_normal((b, t, z)), jnp.float32)
    kl_fast = gp.gp_kl(mu, l_q, l_p)
    gp.FORCE_INVERSE_PATH = False
    kl_slow = gp.gp_kl(mu, l_q, l_p)
    np.testing.assert_allclose(
        np.asarray(kl_fast), np.asarray(kl_slow), rtol=1e-4, atol=1e-5
    )


def test_gp_prior_diag_kl_inverse_path(force_inverse):
    rng = np.random.default_rng(2)
    b, z, t = 3, 2, 14
    l_p = _bank(rng, b, z, t, [3.0, 6.0])
    mu = jnp.asarray(rng.standard_normal((b, t, z)), jnp.float32)
    lv = jnp.asarray(rng.standard_normal((b, t, z)) * 0.3, jnp.float32)
    kl_fast = gp.gp_prior_diag_kl(mu, lv, l_p)
    gp.FORCE_INVERSE_PATH = False
    kl_slow = gp.gp_prior_diag_kl(mu, lv, l_p)
    np.testing.assert_allclose(
        np.asarray(kl_fast), np.asarray(kl_slow), rtol=1e-4, atol=1e-5
    )


def test_gp_kl_gradient_through_inverse_path(force_inverse):
    rng = np.random.default_rng(3)
    b, z, t = 2, 2, 8
    times = jnp.asarray(np.sort(rng.uniform(0, 45, (b, t)), -1), jnp.float32)
    mu = jnp.asarray(rng.standard_normal((b, t, z)), jnp.float32)
    ls_p = jnp.array([9.0, 3.0], jnp.float32)

    def loss(ls_q, use_fast):
        gp.FORCE_INVERSE_PATH = use_fast
        l_q = jnp.linalg.cholesky(
            kernels.gram_bank(times, ls_q)
        ).astype(jnp.float32)
        l_p = jnp.linalg.cholesky(
            kernels.gram_bank(times, ls_p)
        ).astype(jnp.float32)
        return gp.gp_kl(mu, l_q, l_p).sum()

    ls_q = jnp.array([4.0, 4.0], jnp.float32)
    g_fast = jax.grad(lambda l: loss(l, True))(ls_q)
    g_slow = jax.grad(lambda l: loss(l, False))(ls_q)
    np.testing.assert_allclose(
        np.asarray(g_fast), np.asarray(g_slow), rtol=1e-3
    )


def test_tri_inv_custom_vjp_matches_native():
    rng = np.random.default_rng(4)
    a = rng.standard_normal((3, 10, 10))
    l = np.linalg.cholesky(a @ np.swapaxes(a, -1, -2) + 10 * np.eye(10))
    l32 = jnp.asarray(l, jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 10, 10)), jnp.float32)

    g_custom = jax.grad(
        lambda l: jnp.sum(tri_inv(l) * w)
    )(l32)
    g_native = jax.grad(
        lambda l: jnp.sum(jnp.linalg.inv(l) * w)
    )(jnp.asarray(l))
    # native inv grad is dense; ours is the lower-tri restriction (valid for
    # lower-triangular inputs)
    np.testing.assert_allclose(
        np.asarray(g_custom), np.tril(np.asarray(g_native)),
        rtol=1e-3, atol=1e-4,
    )


def test_solve_triangular_via_inverse_flag():
    rng = np.random.default_rng(5)
    a = rng.standard_normal((4, 16, 16))
    l = np.linalg.cholesky(a @ np.swapaxes(a, -1, -2) + 16 * np.eye(16))
    b = rng.standard_normal((4, 16, 6))
    for left in (True, False):
        bb = b if left else np.swapaxes(b, -1, -2)
        for trans in (True, False):
            want = solve_triangular(
                jnp.asarray(l), jnp.asarray(bb), left_side=left,
                transpose_a=trans, via_inverse=False,
            )
            got = solve_triangular(
                jnp.asarray(l, jnp.float32), jnp.asarray(bb, jnp.float32),
                left_side=left, transpose_a=trans, via_inverse=True,
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=2e-3, atol=1e-4
            )


def test_gp_kl_inverse_route_large_t_matches_solve():
    """The inverse-routed KL now extends past the lane-kernel max (to
    trsm.INV_ROUTE_MAX_T) via the block-recursive triangular inverse."""
    import numpy as np
    import jax.numpy as jnp

    from gpvae_tpu import gp

    rng = np.random.default_rng(7)
    b, t, z = 3, 200, 2
    times = jnp.asarray(np.sort(rng.uniform(0, 60, (b, t)), -1), jnp.float32)
    mu = jnp.asarray(rng.standard_normal((b, t, z)), jnp.float32)
    l_q = gp.chol_gram_bank(times, jnp.asarray([5.0, 2.0], jnp.float32))
    l_p = gp.chol_gram_bank(times, jnp.asarray([9.0, 3.0], jnp.float32))

    prev = gp.FORCE_INVERSE_PATH
    try:
        gp.FORCE_INVERSE_PATH = False
        solve = np.asarray(gp.gp_kl(mu, l_q, l_p))
        gp.FORCE_INVERSE_PATH = True
        inv = np.asarray(gp.gp_kl(mu, l_q, l_p))
    finally:
        gp.FORCE_INVERSE_PATH = prev
    np.testing.assert_allclose(inv, solve, rtol=2e-3, atol=2e-3)


def test_tri_tri_frob2_blocked_matches_dense():
    """The blocked ||P Q||_F^2 (t % 256 == 0 branch) must match the dense
    einsum in value and gradient — lower-tri x lower-tri products are
    lower-triangular, so the skipped upper blocks are structurally zero."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from gpvae_tpu import gp

    t = 512
    rng = np.random.default_rng(9)
    p64 = np.tril(rng.standard_normal((2, 3, t, t))) / np.sqrt(t)
    q64 = np.tril(rng.standard_normal((1, 3, t, t))) / np.sqrt(t)
    p32, q32 = jnp.asarray(p64, jnp.float32), jnp.asarray(q64, jnp.float32)

    def dense(p, q):
        a = jnp.einsum("...ij,...jk->...ik", p, q,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
        return jnp.sum(a * a, axis=(-2, -1))

    got = np.asarray(gp._tri_tri_frob2(p32, q32))
    want = np.asarray(dense(p32, q32))
    assert got.shape == want.shape == (2, 3)
    np.testing.assert_allclose(got, want, rtol=1e-5)

    g_got = jax.grad(lambda p, q: gp._tri_tri_frob2(p, q).sum(),
                     argnums=(0, 1))(p32, q32)
    g_want = jax.grad(lambda p, q: dense(p, q).sum(),
                      argnums=(0, 1))(p32, q32)
    # the two gradients may differ only in the skipped (1,2) operand
    # block — structurally zero in the operands, and discarded by every
    # upstream consumer (tri_inv's lower-tri-restricted VJP, the phi in
    # the Cholesky VJP); the blocked path leaves it exactly zero
    h = t // 2
    for gg, gw in zip(g_got, g_want):
        gg, gw = np.asarray(gg).copy(), np.asarray(gw).copy()
        np.testing.assert_array_equal(gg[..., :h, h:], 0.0)
        gw[..., :h, h:] = 0.0
        np.testing.assert_allclose(gg, gw, rtol=1e-4, atol=1e-5)
