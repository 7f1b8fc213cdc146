"""Batched Cholesky factorization: dispatch, blocked MXU path, custom VJP.

Replaces the reference's ``tf.cholesky`` call sites
(src/Models/syndata/GP_VAE_syn_data.py:138;
src/Models/Full_GP_VAE_fixed_for_MovMnist.py:133) and the numpy
``np.linalg.cholesky`` oracles
(src/Models/FullGP_and_GPdecoder_dynamic_time_analysis.py:44-55;
src/determinant_testing_minimal.py:33).

Execution paths behind one differentiable entry point:

* ``pallas``        — lane-batched kernel (pallas_chol.py) for T <= 64: the
  reference regime (T = 20 MNIST / 45 toy).
* ``blocked``       — right-looking blocked factorization: lane-batched
  diagonal blocks across all matrices, MXU panels via the block inverse,
  trailing update at the XLA level (MAGMA-style split).
* ``blocked_left``  — left-looking variant: reads the final column-block
  history instead of re-materializing the trailing submatrix each step.
* ``blocked_fused`` — the panel + lower-only trailing downdate streamed
  through one Pallas kernel per step (ops/pallas_trail.py).
* ``blocked_inplace`` — round-3 left-looking path with in-place column
  writeback and compensated 3-pass bf16 contractions (ops/pallas_big.py).
  (A whole-matrix-in-VMEM kernel was tried in round 2 and retired in
  round 3: with <= ~30 matrices co-resident the serial column recurrence
  is not amortized and it measured 1.04 TF/s, worse than every blocked
  path — see docs/DESIGN.md.)
* ``xla``           — ``jnp.linalg.cholesky`` fallback (fp64 oracle on CPU).

``auto`` picks per measured v5e crossovers (see LEFT_LOOKING_MIN_T below).

All paths share one analytic custom VJP (the standard differentiable-Cholesky
backward, two triangular solves), so the ELBO differentiates through the
factorization regardless of forward path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gpvae_tpu.ops import dispatch, pallas_chol, pallas_tri
from gpvae_tpu.ops.trsm import solve_triangular


def cholesky_xla(k: jnp.ndarray) -> jnp.ndarray:
    """XLA-native batched Cholesky (lower)."""
    return jnp.linalg.cholesky(k)


# ---------------------------------------------------------------------------
# Blocked path for large T
# ---------------------------------------------------------------------------

def _chol_diag_block(d: jnp.ndarray) -> jnp.ndarray:
    """Factor a batch of small diagonal blocks [N, nb, nb]."""
    if d.shape[-1] <= pallas_chol.LANE_BATCH_MAX_T:
        return pallas_chol.chol_small_batched(d)
    if dispatch.on_tpu():
        # wide blocks: recursive split over the 64-wide lane kernels
        return chol_and_inv(d)[0]
    return cholesky_xla(d)


_HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.einsum(
        "nij,njk->nik", a, b, preferred_element_type=jnp.float32,
        precision=_HI,
    )


def chol_and_inv(
    d: jnp.ndarray, base: int | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(L, L^{-1}) of batched PSD ``d [N, nb, nb]`` for nb a power-of-two
    multiple of 64 (or <= 64 directly).

    Wide blocks are built *recursively* from the 64-wide lane-batched
    kernels with pure MXU matmuls:

        L   = [[L11, 0], [A21, L22]],   A21 = D21 L11^{-T}
        L^{-1} = [[L11^{-1}, 0], [-L22^{-1} A21 L11^{-1}, L22^{-1}]]

    This is what lets the blocked factorization use 128/256-wide panels —
    halving/quartering the dominant trailing-update HBM traffic — while all
    sequential-recurrence work stays in the 64-wide lane kernels.
    """
    n, nb, _ = d.shape
    if base is None:
        base = pallas_chol.LANE_BATCH_MAX_T
    # Force the operand to materialize packed: XLA otherwise fuses a
    # strided sub-block slice (e.g. k[:, :nb, :nb] of a [N, T, T] bank)
    # into the lane-layout transpose, which measured 1.82 ms vs 0.12 ms
    # for the materialized copy at [128, 128, 128] from T=1024 (15x).
    # On an already-packed buffer this is a no-op scheduling barrier.
    d = jax.lax.optimization_barrier(d)
    if nb <= base or nb <= 8:
        if dispatch.on_tpu():
            return pallas_chol.chol_inv_small_batched(d)
        l = _chol_diag_block(d)
        return l, pallas_tri.tri_inv_small_batched(l)
    if nb == 128 and base == 64 and dispatch.on_tpu():
        # fused-glue kernels: same arithmetic, no XLA-level batched
        # matmuls or concat assemblies (each ~100-260 us of MXU-issue
        # latency + HBM round-trip at N=512)
        return pallas_chol.chol_and_inv_128(d)
    h = nb // 2
    l11, inv11 = chol_and_inv(d[:, :h, :h], base)
    a21 = _mm(d[:, h:, :h], jnp.swapaxes(inv11, -1, -2))
    s22 = d[:, h:, h:] - _mm(a21, jnp.swapaxes(a21, -1, -2))
    l22, inv22 = chol_and_inv(s22, base)
    inv21 = -_mm(_mm(inv22, a21), inv11)
    zero = jnp.zeros((n, h, h), jnp.float32)
    l = jnp.concatenate([
        jnp.concatenate([l11, zero], axis=2),
        jnp.concatenate([a21, l22], axis=2),
    ], axis=1)
    inv = jnp.concatenate([
        jnp.concatenate([inv11, zero], axis=2),
        jnp.concatenate([inv21, inv22], axis=2),
    ], axis=1)
    return l, inv


def chol_inv_parts(d: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
    """Half-block parts ``(l11, a21, l22, i11, i21, i22)`` of
    :func:`chol_and_inv` for ``d [N, nb, nb]`` with even ``nb`` — the
    deferred-column flow consumes the blocks directly (in-kernel
    assembly), skipping the full-tile L/L^{-1} HBM writes + the diag DUS
    round-trip.  Values match the assembled forms exactly (same chain)."""
    n, nb, _ = d.shape
    assert nb % 2 == 0, f"chol_inv_parts needs even nb, got {nb}"
    h = nb // 2
    if nb == 128 and dispatch.on_tpu():
        d = jax.lax.optimization_barrier(d)
        return pallas_chol.chol_inv_128_parts(d)
    if nb == 256 and dispatch.on_tpu():
        return _chol_inv_256_parts(d)
    l, inv = chol_and_inv(d)
    return (l[:, :h, :h], l[:, h:, :h], l[:, h:, h:],
            inv[:, :h, :h], inv[:, h:, :h], inv[:, h:, h:])


def _chol_inv_256_parts(d: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
    """Parts-native 256-wide diagonal block: the :func:`chol_and_inv`
    recursion with the 128-halves on the fused Pallas kernels and NO
    [N, 256, 256] assembly/re-slice round-trip (the assembled form costs
    ~16 full-tile HBM passes per block; the first nb=256 A/B measured the
    sloppy glue at +0.47 ms over nb=128 despite halving the dominant
    history stream — benchmarks/prof_nb256.py)."""
    d = jax.lax.optimization_barrier(d)
    l11, i11 = pallas_chol.chol_and_inv_128(d[:, :128, :128])
    a21, s22 = pallas_chol.schur128(d, i11)
    l22, i22 = pallas_chol.chol_and_inv_128(s22)
    i21 = pallas_chol.inv21_128(i11, a21, i22)
    return l11, a21, l22, i11, i21, i22


def chol_parts(d: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
    """Factor-only half-block parts ``(l11, a21, l22)`` of
    :func:`chol_wide` (final diagonal blocks)."""
    n, nb, _ = d.shape
    assert nb % 2 == 0, f"chol_parts needs even nb, got {nb}"
    h = nb // 2
    if nb == 128 and dispatch.on_tpu():
        d = jax.lax.optimization_barrier(d)
        return pallas_chol.chol_128_parts(d)
    if nb == 256 and dispatch.on_tpu():
        d = jax.lax.optimization_barrier(d)
        l11, i11 = pallas_chol.chol_and_inv_128(d[:, :128, :128])
        a21, s22 = pallas_chol.schur128(d, i11)
        l22 = pallas_chol.chol_128(s22)
        return l11, a21, l22
    l = chol_wide(d)
    return l[:, :h, :h], l[:, h:, :h], l[:, h:, h:]


def chol_wide(d: jnp.ndarray, base: int | None = None) -> jnp.ndarray:
    """``L`` of batched PSD ``d [N, nb, nb]`` — the :func:`chol_and_inv`
    recursion *without* the inverse assembly.

    Identical factor values (the L11/A21/S22 chain is the same arithmetic)
    but the trailing half skips the inverse substitution in the lane kernel
    and the ``inv21``/``inv`` concat writes.  Use for FINAL diagonal blocks,
    whose ``L^{-1}`` nothing consumes (the writeback substitution only needs
    inverses of *earlier* blocks).
    """
    n, nb, _ = d.shape
    if base is None:
        base = pallas_chol.LANE_BATCH_MAX_T
    d = jax.lax.optimization_barrier(d)
    if nb <= base or nb <= 8:
        return _chol_diag_block(d)
    if nb == 128 and base == 64 and dispatch.on_tpu():
        return pallas_chol.chol_128(d)
    h = nb // 2
    l11, inv11 = chol_and_inv(d[:, :h, :h], base)
    a21 = _mm(d[:, h:, :h], jnp.swapaxes(inv11, -1, -2))
    s22 = d[:, h:, h:] - _mm(a21, jnp.swapaxes(a21, -1, -2))
    l22 = chol_wide(s22, base)
    zero = jnp.zeros((n, h, h), jnp.float32)
    return jnp.concatenate([
        jnp.concatenate([l11, zero], axis=2),
        jnp.concatenate([a21, l22], axis=2),
    ], axis=1)


def cholesky_blocked(
    k: jnp.ndarray,
    block_size: int = 128,
    *,
    panel_via_inverse: bool = True,
) -> jnp.ndarray:
    """Blocked right-looking batched Cholesky for ``k [N, T, T]``, large T.

    Each block step: (1) factor all matrices' diagonal blocks with the
    lane-batched kernel (batch = N, fully vectorized), (2) invert the
    diagonal blocks with the lane-batched triangular-inverse kernel so the
    panel ``X = P L_d^{-T}`` is a *pure batched MXU matmul* (the MAGMA-style
    split; XLA's triangular_solve is a sequential-substitution fallback via
    ``panel_via_inverse=False``), (3) trailing update ``S -= X X^T``
    (batched MXU matmul).  The Python loop is unrolled at trace time; every
    shape is static.
    """
    n, t, _ = k.shape
    if t <= pallas_chol.LANE_BATCH_MAX_T:
        return _chol_diag_block(k.astype(jnp.float32))
    nb = block_size
    num_blocks = -(-t // nb)
    t_pad = num_blocks * nb
    if t_pad != t:
        pad = t_pad - t
        k = jnp.pad(k, ((0, 0), (0, pad), (0, pad)))
        diag_pad = (jnp.arange(t_pad) >= t).astype(k.dtype)
        k = k + jnp.eye(t_pad, dtype=k.dtype) * diag_pad[None, None, :]

    s = k.astype(jnp.float32)  # current trailing submatrix [N, R, R]
    col_blocks = []
    for b in range(num_blocks):
        d = s[:, :nb, :nb]
        rest = s[:, nb:, :nb]                                 # [N, R-nb, nb]
        # X L_d^T = rest  =>  X = rest L_d^{-T}
        if panel_via_inverse and dispatch.on_tpu():
            ld, ld_inv = chol_and_inv(d)
            x = jnp.einsum(
                "nrk,njk->nrj", rest, ld_inv,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        else:
            ld = _chol_diag_block(d)
            x = solve_triangular(
                ld, rest, left_side=False, lower=True, transpose_a=True
            )
        col = jnp.concatenate([ld, x], axis=1)                # [N, R, nb]
        col_blocks.append(col)
        if b < num_blocks - 1:
            trail = s[:, nb:, nb:]
            # HIGHEST precision: the default TPU f32 matmul uses bf16 passes,
            # which costs ~3 decimal digits in the trailing update and
            # violates the fp64-parity tolerance (north star, BASELINE.md).
            s = trail - jnp.einsum(
                "nik,njk->nij", x, x,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
    # Assemble lower-triangular L from column blocks.
    cols = []
    for b, col in enumerate(col_blocks):
        top = jnp.zeros((n, b * nb, nb), jnp.float32)
        cols.append(jnp.concatenate([top, col], axis=1))
    l = jnp.concatenate(cols, axis=2)
    return l[:, :t, :t]


def cholesky_blocked_left(
    k: jnp.ndarray, block_size: int = 128
) -> jnp.ndarray:
    """Left-looking blocked batched Cholesky for ``k [N, T, T]``, large T.

    The right-looking variant (``cholesky_blocked``) re-materializes the
    [N, R, R] trailing submatrix in HBM at every block step — measured to
    dominate the T=1024 factorization (docs/DESIGN.md).  The left-looking
    order instead *reads* the already-final column-block history (slices
    fuse into the MXU dot operands) and writes each column block exactly
    once via ``dynamic_update_slice`` (in-place for XLA): per-step traffic
    is read-only history + one panel write, roughly halving HBM traffic
    and eliminating the defensive whole-submatrix copies.
    """
    n, t, _ = k.shape
    if t <= pallas_chol.LANE_BATCH_MAX_T:
        return _chol_diag_block(k.astype(jnp.float32))
    nb = block_size
    num_blocks = -(-t // nb)
    t_pad = num_blocks * nb
    if t_pad != t:
        pad = t_pad - t
        k = jnp.pad(k, ((0, 0), (0, pad), (0, pad)))
        diag_pad = (jnp.arange(t_pad) >= t).astype(k.dtype)
        k = k + jnp.eye(t_pad, dtype=k.dtype) * diag_pad[None, None, :]
    k = k.astype(jnp.float32)

    l = jnp.zeros((n, t_pad, t_pad), jnp.float32)
    for b in range(num_blocks):
        o = b * nb
        panel = k[:, o:, o:o + nb]                           # [N, R, nb]
        if b > 0:
            hist = jax.lax.slice(l, (0, o, 0), (n, t_pad, o))
            rowblk = jax.lax.slice(l, (0, o, 0), (n, o + nb, o))
            panel = panel - jnp.einsum(
                "nrk,njk->nrj", hist, rowblk,
                preferred_element_type=jnp.float32, precision=_HI,
            )
        if dispatch.on_tpu():
            ld, ld_inv = chol_and_inv(panel[:, :nb, :])
            x = jnp.einsum(
                "nrk,njk->nrj", panel[:, nb:, :], ld_inv,
                preferred_element_type=jnp.float32, precision=_HI,
            )
        else:
            ld = _chol_diag_block(panel[:, :nb, :])
            x = solve_triangular(
                ld, panel[:, nb:, :],
                left_side=False, lower=True, transpose_a=True,
            )
        col = jnp.concatenate([ld, x], axis=1)               # [N, R, nb]
        l = jax.lax.dynamic_update_slice(l, col, (0, o, o))
    return l[:, :t, :t]


# ---------------------------------------------------------------------------
# Dispatch + custom VJP
# ---------------------------------------------------------------------------

def cholesky_blocked_left_streamed(
    k: jnp.ndarray, block_size: int = 128
) -> jnp.ndarray:
    """Left-looking blocked Cholesky with the history contraction streamed
    through a Pallas kernel (ops/pallas_left.py): same algorithm as
    ``cholesky_blocked_left``, but the ``K_panel - L_hist @ L_rowblk^T``
    pass runs with blocked-spec pipelining and the subtraction fused,
    avoiding the XLA-level panel materialization between matmul and
    subtract."""
    from gpvae_tpu.ops import pallas_left

    n, t, _ = k.shape
    nb = pallas_left.NB
    if block_size != nb:
        raise ValueError(f"streamed path is fixed at block_size={nb}")
    if t <= pallas_chol.LANE_BATCH_MAX_T:
        return _chol_diag_block(k.astype(jnp.float32))
    num_blocks = -(-t // nb)
    t_pad = num_blocks * nb
    if t_pad != t:
        pad = t_pad - t
        k = jnp.pad(k, ((0, 0), (0, pad), (0, pad)))
        diag_pad = (jnp.arange(t_pad) >= t).astype(k.dtype)
        k = k + jnp.eye(t_pad, dtype=k.dtype) * diag_pad[None, None, :]
    k = k.astype(jnp.float32)

    l = jnp.zeros((n, t_pad, t_pad), jnp.float32)
    for b in range(num_blocks):
        o = b * nb
        if b == 0:
            panel = k[:, :, :nb]
        else:
            panel = pallas_left.hist_panel_update(l, k, b)
        if dispatch.on_tpu():
            ld, ld_inv = chol_and_inv(panel[:, :nb, :])
            if t_pad - o > nb:
                x = jnp.einsum(
                    "nrk,njk->nrj", panel[:, nb:, :], ld_inv,
                    preferred_element_type=jnp.float32, precision=_HI,
                )
                col = jnp.concatenate([ld, x], axis=1)
            else:
                col = ld
        else:
            ld = _chol_diag_block(panel[:, :nb, :])
            if t_pad - o > nb:
                x = solve_triangular(
                    ld, panel[:, nb:, :],
                    left_side=False, lower=True, transpose_a=True,
                )
                col = jnp.concatenate([ld, x], axis=1)
            else:
                col = ld
        l = jax.lax.dynamic_update_slice(l, col, (0, o, o))
    return l[:, :t, :t]


def cholesky_blocked_fused(
    k: jnp.ndarray, block_size: int = 128
) -> jnp.ndarray:
    """Blocked batched Cholesky with the panel + trailing update fused into
    one Pallas kernel per block step (ops/pallas_trail.py).

    Per step: (1) diagonal blocks of ALL matrices factor+invert in the
    lane-batched kernel (the serial recurrence amortized across the bank),
    (2) one Pallas kernel per matrix computes the panel (MXU matmul against
    the block inverse), emits the column block, and applies the trailing
    downdate touching only lower-triangular tiles — the trailing submatrix
    is written exactly once per step with no XLA defensive copies and half
    the MXU work of the naive ``S -= X X^T``.
    """
    from gpvae_tpu.ops import pallas_trail

    n, t, _ = k.shape
    nb = block_size
    if nb % pallas_chol.LANE_BATCH_MAX_T != 0:
        raise ValueError(f"fused path needs a multiple-of-64 block, got {nb}")
    if t <= pallas_chol.LANE_BATCH_MAX_T:
        return _chol_diag_block(k.astype(jnp.float32))
    num_blocks = -(-t // nb)
    t_pad = num_blocks * nb
    if t_pad != t:
        pad = t_pad - t
        k = jnp.pad(k, ((0, 0), (0, pad), (0, pad)))
        diag_pad = (jnp.arange(t_pad) >= t).astype(k.dtype)
        k = k + jnp.eye(t_pad, dtype=k.dtype) * diag_pad[None, None, :]

    s = k.astype(jnp.float32)
    col_blocks = []
    for b in range(num_blocks):
        ld, ld_inv = chol_and_inv(s[:, :nb, :nb])
        if b == num_blocks - 1:
            col_blocks.append(ld)
            break
        col_x, s = pallas_trail.panel_trailing_update(s, ld_inv)
        col_blocks.append(jnp.concatenate([ld, col_x], axis=1))
    cols = []
    for b, col in enumerate(col_blocks):
        top = jnp.zeros((n, b * nb, nb), jnp.float32)
        cols.append(jnp.concatenate([top, col], axis=1))
    l = jnp.concatenate(cols, axis=2)
    return l[:, :t, :t]


# measured crossovers on v5e (saturated device-looped fori_loop timing,
# >=300 ms device work per host sync — shorter loops are polluted by the
# 26-44 ms tunnel-latency estimate, +-0.5 ms/op at inner=12; 2026-08-18,
# after the Pallas-fused 128-wide glue kernels):
#   T=256  N=512: streamed 1.37 | blocked 1.50 | inplace 1.50 | fused 1.53
#   T=512  N=256: streamed 2.25 | blocked 2.72 | fused 2.80 | inplace 2.93
#   T=1024 N=128: streamed 4.42 | inplace 4.45 | blocked 6.40 | fused 6.97
FUSED_MAX_T = 511          # (blocked_fused: best below this pre-glue only)
LEFT_LOOKING_MIN_T = 768   # above: in-place left-looking; below: streamed


def _cholesky_fwd_impl(k: jnp.ndarray, method: str) -> jnp.ndarray:
    t = k.shape[-1]
    batch_shape = k.shape[:-2]
    if method == "auto":
        if dispatch.on_tpu():
            if t <= pallas_chol.LANE_BATCH_MAX_T:
                method = "pallas"
            elif t < LEFT_LOOKING_MIN_T:
                method = "blocked_left_streamed"
            else:
                method = "blocked_inplace"
        else:
            method = "xla"
    if method == "xla":
        return cholesky_xla(k)
    kb = k.reshape((-1,) + k.shape[-2:])
    if method == "pallas":
        lb = pallas_chol.chol_small_batched(kb)
    elif method == "blocked":
        lb = cholesky_blocked(kb)
    elif method == "blocked_left":
        lb = cholesky_blocked_left(kb)
    elif method == "blocked_left_streamed":
        lb = cholesky_blocked_left_streamed(kb)
    elif method == "blocked_inplace":
        from gpvae_tpu.ops import pallas_big
        lb = pallas_big.cholesky_inplace(kb)
    elif method == "blocked_inplace_128":
        from gpvae_tpu.ops import pallas_big
        lb = pallas_big.cholesky_inplace(kb, nb=128)
    elif method == "blocked_fused":
        lb = cholesky_blocked_fused(kb)
    elif method == "blocked_fused_64":
        lb = cholesky_blocked_fused(kb, block_size=64)
    else:
        raise ValueError(f"unknown cholesky method {method!r}")
    return lb.reshape(batch_shape + (t, t))


def _phi(m: jnp.ndarray) -> jnp.ndarray:
    """Lower-triangular with halved diagonal (Murray 2016 backward)."""
    return jnp.tril(m) - 0.5 * jnp.tril(jnp.triu(m))


def _phi_w_blocks(l: jnp.ndarray, l_bar: jnp.ndarray):
    """2x2 blocks ``(w11, w21, w22)`` of ``w = sym(phi(L^T L_bar))``.

    ``L`` is lower-triangular and ``phi`` discards the strict upper
    triangle, so the (1,2) product block is never needed: 4 half-size
    HIGHEST matmuls instead of the dense product's 8, and the [..., T, T]
    ``w`` is handed to the sandwich in block form without ever being
    reassembled in HBM.  Exact blockwise restatement of
    ``0.5 * (phi(L^T L_bar) + phi(L^T L_bar)^T)`` — ``phi`` zeroes the
    (1,2) block and keeps the (2,1) block whole, so
    ``w21 = 0.5 * (L22^T L_bar21)`` and the diagonal blocks symmetrize
    their own ``phi``.  Requires ``t % 256 == 0`` (caller-checked).
    """
    h = l.shape[-1] // 2
    mm = functools.partial(
        jnp.einsum, "...ji,...jk->...ik",
        preferred_element_type=jnp.float32, precision=_HI,
    )
    l11, l21, l22 = l[..., :h, :h], l[..., h:, :h], l[..., h:, h:]
    b11, b21, b22 = (l_bar[..., :h, :h], l_bar[..., h:, :h],
                     l_bar[..., h:, h:])
    p11 = _phi(mm(l11, b11) + mm(l21, b21))
    p22 = _phi(mm(l22, b22))
    w11 = 0.5 * (p11 + jnp.swapaxes(p11, -1, -2))
    w22 = 0.5 * (p22 + jnp.swapaxes(p22, -1, -2))
    w21 = 0.5 * mm(l22, b21)
    return w11, w21, w22


def _tri_sandwich(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """``X^T w X`` for lower-triangular ``x`` and symmetric ``w``.

    One level of 2x2 blocking skips the structurally-zero x12 operand
    blocks and the redundant upper half of the symmetric result:
    11 half-size HIGHEST matmuls instead of the dense einsum's 16
    (measured 0.551 -> 0.425 ms at [4, 1024, 1024] under the saturated
    full-output-consuming ruler — the triple product was the largest
    matmul term left in the T=1024 chol VJP).
    """
    t = x.shape[-1]
    h = t // 2
    if t % 256 != 0:
        # odd/small splits lose MXU tiling alignment — dense einsum
        return jnp.einsum(
            "...ji,...jk,...kl->...il", x, w, x,
            preferred_element_type=jnp.float32, precision=_HI,
        )
    w11, w22 = w[..., :h, :h], w[..., h:, h:]
    w21 = jnp.swapaxes(w[..., :h, h:], -1, -2)
    return _tri_sandwich_blocks(x, w11, w21, w22)


def _tri_sandwich_blocks(x: jnp.ndarray, w11: jnp.ndarray,
                         w21: jnp.ndarray, w22: jnp.ndarray) -> jnp.ndarray:
    """`_tri_sandwich` with ``w`` supplied as its (11, 21, 22) blocks."""
    t = x.shape[-1]
    h = t // 2
    mm = functools.partial(
        jnp.einsum, "...ji,...jk->...ik",
        preferred_element_type=jnp.float32, precision=_HI,
    )
    mm_nt = functools.partial(
        jnp.einsum, "...ij,...jk->...ik",
        preferred_element_type=jnp.float32, precision=_HI,
    )
    x11, x21, x22 = x[..., :h, :h], x[..., h:, :h], x[..., h:, h:]
    w12 = jnp.swapaxes(w21, -1, -2)
    # t = X^T w  (X^T upper block-triangular: [[x11^T, x21^T], [0, x22^T]])
    t11 = mm(x11, w11) + mm(x21, w21)
    t12 = mm(x11, w12) + mm(x21, w22)
    t21 = mm(x22, w21)
    t22 = mm(x22, w22)
    # kbar = t X  (X lower block-triangular); kbar is symmetric, so only
    # the lower blocks are computed and kbar12 is mirrored from kbar21
    k11 = mm_nt(t11, x11) + mm_nt(t12, x21)
    k21 = mm_nt(t21, x11) + mm_nt(t22, x21)
    k22 = mm_nt(t22, x22)
    k11 = 0.5 * (k11 + jnp.swapaxes(k11, -1, -2))
    k22 = 0.5 * (k22 + jnp.swapaxes(k22, -1, -2))
    top = jnp.concatenate([k11, jnp.swapaxes(k21, -1, -2)], axis=-1)
    bot = jnp.concatenate([k21, k22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def cholesky_bwd_from_l(l: jnp.ndarray, l_bar: jnp.ndarray) -> jnp.ndarray:
    """Standard Cholesky reverse-mode: K_bar from (L, L_bar).

    K_bar = (1/2) L^{-T} (phi(L^T L_bar) + phi(L^T L_bar)^T) L^{-1},
    returned symmetrized (valid for K produced by a symmetric constructor,
    as all grams here are).
    """
    from gpvae_tpu.ops.trsm import INV_ROUTE_MAX_T

    t = l.shape[-1]
    if dispatch.on_tpu() and t <= INV_ROUTE_MAX_T:
        # one triangular inverse (lane kernel <= 64, MXU block recursion
        # above), then K_bar = X^T w X — both stages exploit the
        # block-triangular operand structure; XLA's triangular_solve is
        # a sequential substitution on TPU
        x = pallas_tri.tri_inv(l)
        if t % 256 == 0:
            return _tri_sandwich_blocks(x, *_phi_w_blocks(l, l_bar))
        p = _phi(jnp.einsum("...ji,...jk->...ik", l, l_bar,
                            preferred_element_type=jnp.float32,
                            precision=_HI))
        return _tri_sandwich(x, 0.5 * (p + jnp.swapaxes(p, -1, -2)))
    p = _phi(jnp.einsum("...ji,...jk->...ik", l, l_bar,
                        preferred_element_type=jnp.float32, precision=_HI))
    w = 0.5 * (p + jnp.swapaxes(p, -1, -2))
    # tmp = L^{-T} w  : solve L^T tmp = w
    tmp = solve_triangular(l, w, left_side=True, lower=True, transpose_a=True)
    # kbar = tmp L^{-1} : solve kbar L = tmp
    kbar = solve_triangular(l, tmp, left_side=False, lower=True,
                            transpose_a=False)
    # kbar = L^{-T} sym(phi(L^T Lbar)) L^{-1} is already symmetric — the
    # symmetric-gradient convention jnp.linalg.cholesky uses.
    return kbar


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _cholesky_p(k: jnp.ndarray, method: str) -> jnp.ndarray:
    return _cholesky_fwd_impl(k, method)


def _cholesky_p_fwd(k, method):
    l = _cholesky_fwd_impl(k, method)
    return l, l


def _cholesky_p_bwd(method, l, l_bar):
    return (cholesky_bwd_from_l(l, l_bar),)


_cholesky_p.defvjp(_cholesky_p_fwd, _cholesky_p_bwd)


def cholesky(k: jnp.ndarray, *, method: str = "auto") -> jnp.ndarray:
    """Differentiable batched Cholesky (lower) of PSD ``k [..., T, T]``.

    ``method`` in {"auto", "pallas", "blocked", "xla"}; "auto" picks the
    Pallas lane-batched kernel for T <= 64 on TPU, the blocked MXU path for
    larger T, and XLA elsewhere.
    """
    return _cholesky_p(k, method)
