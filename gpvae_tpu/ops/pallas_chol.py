"""Pallas TPU kernels for batched small-matrix Cholesky.

TPU-native replacement for the reference's per-(sequence, latent)
``tf.cholesky`` calls (src/Models/syndata/GP_VAE_syn_data.py:138, one call per
gram inside a double Python loop).  The reference factors B*Z tiny T x T
matrices one at a time on CPU; here the *batch lives in the 128-wide lane
axis* so every step of the column recurrence is a full-width VPU op:

* layout ``[T, T, LANES]`` — lanes index matrices, sublanes index gram rows;
* the column loop is unrolled at trace time (T is static), so every slice is
  static and every iteration is one masked rank-1 update over ``[T, T, L]``;
* no scalar extraction, no gather, no dynamic shapes.

``gram_chol_fused`` goes further: it builds the gram *inside* the kernel from
the per-sequence time vectors (reference ``tf_kernel``,
GP_VAE_syn_data.py:124-145) and factors it without the ``[N, T, T]`` gram
ever touching HBM — the op is HBM-bandwidth-minimal: in ``times/mask/ls``
(O(N*T)), out ``L`` (O(N*T^2)).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpvae_tpu import kernels as kernels_lib
from gpvae_tpu.ops import dispatch

LANES = 128
# [T, T, LANES] fp32 working set must fit VMEM (~16 MB): 3 copies at T=64 is
# ~6 MB.  Larger T goes through the blocked MXU path (chol.cholesky_blocked),
# whose wide diagonal blocks are built recursively from 64-blocks.
LANE_BATCH_MAX_T = 64
_DIAG_EPS = 1e-20


def _lanes_for(t_pad: int) -> int:
    # lane tiles are physically 128 wide on TPU; narrower tiles would not
    # reduce VMEM (Mosaic pads them) and fail to compile when sliced
    return LANES


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret() -> bool:
    return not dispatch.on_tpu()


# Blocked (8-column-panel, shrinking-trailing) lane bodies: identical math
# to the flat column recurrence (bitwise: same per-element operation order)
# but ~3x less VPU element work — panel-step updates touch [r, 8, L]
# instead of [T, T, L], trailing rank-8 updates run once per panel on the
# shrinking Schur complement, and the inverse substitution contracts only
# the rows that can be nonzero.  Default ON: validated on the v5e chip
# 2026-08-18 (benchmarks/prof_lane.py — lane64 chol+inv 0.108 vs 0.123 ms,
# chol_and_inv(128) 0.418 vs 0.492 ms, fused T=256 1.84 vs 1.67 TF/s,
# T=1024 10.74 vs 10.61; Mosaic lowers clean, logdets finite).  The env
# override exists for A/B only; jit caches do NOT key on this flag, so
# flip it in a fresh process (or jax.clear_caches()).
BLOCKED_LANE_BODY = os.environ.get("GPVAE_BLOCKED_LANE_BODY", "1") == "1"
_PANEL = 8


def _chol_lane_body_flat(a, l_ref, t_pad):
    """Flat column recurrence: factor ``a`` [T, T, L] into ``l_ref``."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (t_pad, 1), 0)
    for j in range(t_pad):
        d = jax.lax.rsqrt(jnp.maximum(a[j, j, :], _DIAG_EPS))  # [L]
        col = a[:, j, :] * d[None, :]                          # [T, L]
        col = jnp.where(rows >= j, col, 0.0)
        l_ref[:, j, :] = col
        a = a - col[:, None, :] * col[None, :, :]
    return a


def _panel_factor(a_cur, l_ref, base, pw):
    """Factor the leading ``pw`` columns of the trailing submatrix
    ``a_cur [r, r, L]``, writing final L columns at absolute offset
    ``base``.  Returns (below-panel final columns ``[pw] of [r-pw, L]``,
    per-column inverse diagonals ``[pw] of [L]``)."""
    r = a_cur.shape[0]
    rows_r = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    ap = a_cur[:, :pw, :]                                      # [r, pw, L]
    cols, ds = [], []
    for jj in range(pw):
        d = jax.lax.rsqrt(jnp.maximum(ap[jj, jj, :], _DIAG_EPS))  # [L]
        col = ap[:, jj, :] * d[None, :]                        # [r, L]
        col = jnp.where(rows_r >= jj, col, 0.0)
        l_ref[base:, base + jj, :] = col
        # columns <= jj of ap are never read again: no update mask needed
        ap = ap - col[:, None, :] * col[:pw][None, :, :]
        cols.append(col[pw:])
        ds.append(d)
    return cols, ds


def _panel_trailing(a_cur, cols, pw):
    """Rank-``pw`` Schur-complement update: trailing [r-pw, r-pw, L] minus
    the below-panel columns' outer products."""
    trail = a_cur[pw:, pw:, :]
    for ck in cols:
        trail = trail - ck[:, None, :] * ck[None, :, :]
    return trail


def _chol_lane_body_blocked(a, l_ref, t_pad, pw=_PANEL):
    """Blocked factor body (see BLOCKED_LANE_BODY).  Writes every column of
    ``l_ref`` (upper triangle zero-initialized in one pass)."""
    l_ref[...] = jnp.zeros_like(a)
    a_cur = a
    for p in range(t_pad // pw):
        base = p * pw
        cols, _ = _panel_factor(a_cur, l_ref, base, pw)
        if t_pad - base > pw:
            a_cur = _panel_trailing(a_cur, cols, pw)


def _chol_lane_body(a, l_ref, t_pad):
    if BLOCKED_LANE_BODY and t_pad % _PANEL == 0:
        _chol_lane_body_blocked(a, l_ref, t_pad)
        return None
    return _chol_lane_body_flat(a, l_ref, t_pad)


def _chol_kernel(a_ref, l_ref):
    # refs are [1, T, T, L] (grouped layout); squeeze the group dim
    t_pad = a_ref.shape[1]
    _chol_lane_body(a_ref[0], l_ref.at[0], t_pad)


def _chol_inv_kernel_flat(a_ref, l_ref, x_ref):
    """Factor AND invert in one pass: after column j of L is final, row j of
    X = L^{-1} follows by forward substitution using the already-written
    rows (X rows >= j still zero, so the full contraction needs no mask)."""
    _chol_inv_body_flat(a_ref[0], l_ref.at[0], x_ref.at[0], a_ref.shape[1])


def _chol_inv_body_flat(a, lv, xv, t_pad):
    rows = jax.lax.broadcasted_iota(jnp.int32, (t_pad, 1), 0)
    xv[...] = jnp.zeros_like(a)
    # zero-init L too: the substitution row-read below contracts the full
    # row (cols > j are multiplied by zero X rows, but stale NaNs would
    # still poison the product)
    lv[...] = jnp.zeros_like(a)
    for j in range(t_pad):
        d = jax.lax.rsqrt(jnp.maximum(a[j, j, :], _DIAG_EPS))  # [L]
        col = a[:, j, :] * d[None, :]
        col = jnp.where(rows >= j, col, 0.0)
        lv[:, j, :] = col
        a = a - col[:, None, :] * col[None, :, :]
        # row j of L is now final: L[j, i] for i <= j
        l_row = lv[j, :, :]                                    # [T, L]
        acc = jnp.sum(l_row[:, None, :] * xv[...], axis=0)     # [T, L]
        onehot = (rows == j).astype(col.dtype)
        xv[j, :, :] = (onehot - acc) * d[None, :]


def _chol_inv_kernel_blocked(a_ref, l_ref, x_ref, pw=_PANEL):
    """Blocked fused factor+inverse.  The factor side is
    :func:`_chol_lane_body_blocked`; the substitution for X = L^{-1} runs
    per panel once its L rows are final, contracting only the first
    ``base+pw`` X rows (rows >= j are still zero — and L[j, c] = 0 for
    c in (j, base+pw] by the row mask, so the panel-aligned read is exact)."""
    _chol_inv_body_blocked(a_ref[0], l_ref.at[0], x_ref.at[0],
                           a_ref.shape[1], pw)


def _chol_inv_body_blocked(a, lv, xv, t_pad, pw=_PANEL):
    rows_t = jax.lax.broadcasted_iota(jnp.int32, (t_pad, 1), 0)
    xv[...] = jnp.zeros_like(a)
    lv[...] = jnp.zeros_like(a)
    a_cur = a
    for p in range(t_pad // pw):
        base = p * pw
        w = base + pw
        cols, ds = _panel_factor(a_cur, lv, base, pw)
        for jj in range(pw):
            j = base + jj
            l_row = lv[j, :w, :]                           # [w, L]
            # X[i, c] = 0 for c > i, and i < w here, so the contraction
            # and the row write stop at column w (cols > w stay at their
            # zero init — bitwise what the full-width form produced)
            acc = jnp.sum(
                l_row[:, None, :] * xv[:w, :w, :], axis=0
            )                                              # [w, L]
            onehot = (rows_t[:w] == j).astype(acc.dtype)
            xv[j, :w, :] = (onehot - acc) * ds[jj][None, :]
        if t_pad - base > pw:
            a_cur = _panel_trailing(a_cur, cols, pw)


def _chol_inv_kernel(a_ref, l_ref, x_ref):
    if BLOCKED_LANE_BODY and a_ref.shape[1] % _PANEL == 0:
        _chol_inv_kernel_blocked(a_ref, l_ref, x_ref)
    else:
        _chol_inv_kernel_flat(a_ref, l_ref, x_ref)


def chol_small_batched(k: jnp.ndarray, lower_only: bool = True) -> jnp.ndarray:
    """Batched Cholesky ``L`` of PSD ``k`` with shape ``[N, T, T]``, T <= 64.

    Pads T to a multiple of 8 (identity padding) and N to a multiple of 128,
    runs the lane-batched kernel, and strips padding.  fp32 in, fp32 out.
    """
    # interpret resolved OUTSIDE the jit so the trace cache keys on it —
    # the same shapes may be traced for a CPU mesh and the real TPU in one
    # process (dispatch.compute_on)
    return _chol_small_batched_jit(k, lower_only, _interpret())


@functools.partial(jax.jit, static_argnames=("lower_only", "interpret"))
def _chol_small_batched_jit(
    k: jnp.ndarray, lower_only: bool, interpret: bool
) -> jnp.ndarray:
    n, t, t2 = k.shape
    assert t == t2, k.shape
    if t > LANE_BATCH_MAX_T:
        raise ValueError(
            f"T={t} > {LANE_BATCH_MAX_T}; use cholesky_blocked for large T"
        )
    t_pad = max(_round_up(t, 8), 8)
    lanes = _lanes_for(t_pad)
    n_pad = _round_up(max(n, 1), lanes)
    kp = k.astype(jnp.float32)
    if t_pad != t:
        eye = jnp.eye(t_pad, dtype=jnp.float32)
        kp = jnp.pad(kp, ((0, 0), (0, t_pad - t), (0, t_pad - t)))
        pad_mask = (jnp.arange(t_pad) >= t).astype(jnp.float32)
        kp = kp + eye * pad_mask[None, None, :]
    if n_pad != n:
        pad_block = jnp.broadcast_to(
            jnp.eye(t_pad, dtype=jnp.float32), (n_pad - n, t_pad, t_pad)
        )
        kp = jnp.concatenate([kp, pad_block], axis=0)

    # grouped layout [G, T, T, lanes]: the lane dim equals the array's last
    # dim, satisfying the Pallas (8, 128-or-full) tiling constraint even for
    # 64-lane tiles
    g = n_pad // lanes
    kt = jnp.transpose(kp.reshape(g, lanes, t_pad, t_pad), (0, 2, 3, 1))
    out = pl.pallas_call(
        _chol_kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, t_pad, t_pad, lanes), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_pad, t_pad, lanes),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, t_pad, t_pad, lanes),
                                       jnp.float32),
        interpret=interpret,
    )(kt)
    l = jnp.transpose(out, (0, 3, 1, 2)).reshape(n_pad, t_pad, t_pad)
    l = l[:n, :t, :t]
    if lower_only:
        l = jnp.tril(l)
    return l


def chol_inv_small_batched(
    k: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(L, L^{-1}) of batched PSD ``k [N, T, T]``, T <= 64, in ONE kernel —
    the factor and its inverse share the column recurrence, halving kernel
    launches and layout transposes vs chol_small_batched + tri_inv."""
    return _chol_inv_small_batched_jit(k, _interpret())


@functools.partial(jax.jit, static_argnames=("interpret",))
def _chol_inv_small_batched_jit(
    k: jnp.ndarray, interpret: bool
) -> tuple[jnp.ndarray, jnp.ndarray]:
    n, t, t2 = k.shape
    assert t == t2, k.shape
    if t > LANE_BATCH_MAX_T:
        raise ValueError(f"T={t} > {LANE_BATCH_MAX_T}")
    t_pad = max(_round_up(t, 8), 8)
    lanes = _lanes_for(t_pad)
    n_pad = _round_up(max(n, 1), lanes)
    kp = k.astype(jnp.float32)
    if t_pad != t:
        eye = jnp.eye(t_pad, dtype=jnp.float32)
        kp = jnp.pad(kp, ((0, 0), (0, t_pad - t), (0, t_pad - t)))
        pad_mask = (jnp.arange(t_pad) >= t).astype(jnp.float32)
        kp = kp + eye * pad_mask[None, None, :]
    if n_pad != n:
        pad_block = jnp.broadcast_to(
            jnp.eye(t_pad, dtype=jnp.float32), (n_pad - n, t_pad, t_pad)
        )
        kp = jnp.concatenate([kp, pad_block], axis=0)
    g = n_pad // lanes
    kt = jnp.transpose(kp.reshape(g, lanes, t_pad, t_pad), (0, 2, 3, 1))
    spec = pl.BlockSpec((1, t_pad, t_pad, lanes), lambda i: (i, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    l_out, x_out = pl.pallas_call(
        _chol_inv_kernel,
        grid=(g,),
        in_specs=[spec],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((g, t_pad, t_pad, lanes), jnp.float32),
            jax.ShapeDtypeStruct((g, t_pad, t_pad, lanes), jnp.float32),
        ),
        interpret=interpret,
    )(kt)

    def unpack(o):
        o = jnp.transpose(o, (0, 3, 1, 2)).reshape(n_pad, t_pad, t_pad)
        return jnp.tril(o[:n, :t, :t])

    return unpack(l_out), unpack(x_out)


# ---------------------------------------------------------------------------
# Fused 128-wide recursion glue
# ---------------------------------------------------------------------------
#
# ``chol.chol_and_inv`` builds 128-wide diagonal blocks from the 64-wide
# lane kernels via a Schur-complement split.  At the XLA level each glue
# step is a batched [N, 64, 64] matmul — measured ~260 us at N=512 on v5e
# (MXU-issue-latency bound: 512 tiny matmuls x 6 HIGHEST passes, each a
# full HBM round-trip) — plus two [N, 128, 128] concat assemblies (~106 us).
# The kernels below run the same arithmetic inside Pallas: per matrix-slab
# the dots issue back-to-back from VMEM with no per-op dispatch or HBM
# round-trips, and the assembly is a single fused write pass.

def _schur64_kernel(d_ref, i11_ref, a21_ref, s22_ref):
    d = d_ref[...]
    a21 = jax.lax.dot_general(
        d[:, 64:, :64], i11_ref[...], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    a21_ref[...] = a21
    s22_ref[...] = d[:, 64:, 64:] - jax.lax.dot_general(
        a21, a21, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _slab_div(n: int, budget: int) -> int:
    m = max(1, min(n, budget))
    while n % m != 0:
        m -= 1
    return m


def _glue_params(bytes_per_m: int, m: int) -> pltpu.CompilerParams:
    # explicit scoped-VMEM limit: at N=512 the default 16 MB limit is
    # within 0.2% of the assembly kernel's footprint and OOMs inside
    # while-loop contexts (measured: "16.02M vs 16.00M")
    return pltpu.CompilerParams(
        vmem_limit_bytes=max(16 * 1024 * 1024, int(bytes_per_m * m * 1.5)),
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _schur64_jit(d, i11, interpret):
    n = d.shape[0]
    m = _slab_div(n, 32)
    half = pl.BlockSpec((m, 64, 64), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _schur64_kernel,
        grid=(n // m,),
        in_specs=[
            pl.BlockSpec((m, 128, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            half,
        ],
        out_specs=(half, half),
        out_shape=(
            jax.ShapeDtypeStruct((n, 64, 64), jnp.float32),
            jax.ShapeDtypeStruct((n, 64, 64), jnp.float32),
        ),
        compiler_params=_glue_params(4 * (2 * 128 * 128 + 4 * 64 * 64), m),
        interpret=interpret,
    )(d.astype(jnp.float32), i11)


def _assemble128_kernel(l11_ref, a21_ref, l22_ref, i11_ref, i22_ref,
                        l_ref, inv_ref):
    zero = jnp.zeros_like(l11_ref[...])
    a21 = a21_ref[...]
    i11 = i11_ref[...]
    i22 = i22_ref[...]

    def cat(tl, bl, br):
        return jnp.concatenate([
            jnp.concatenate([tl, zero], axis=2),
            jnp.concatenate([bl, br], axis=2),
        ], axis=1)

    l_ref[...] = cat(l11_ref[...], a21, l22_ref[...])
    t1 = jax.lax.dot_general(
        a21, i11, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    inv21 = -jax.lax.dot_general(
        i22, t1, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    inv_ref[...] = cat(i11, inv21, i22)


def _assemble128_l_kernel(l11_ref, a21_ref, l22_ref, l_ref):
    zero = jnp.zeros_like(l11_ref[...])
    l_ref[...] = jnp.concatenate([
        jnp.concatenate([l11_ref[...], zero], axis=2),
        jnp.concatenate([a21_ref[...], l22_ref[...]], axis=2),
    ], axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _assemble128_jit(l11, a21, l22, i11, i22, interpret):
    n = l11.shape[0]
    m = _slab_div(n, 16)
    half = pl.BlockSpec((m, 64, 64), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec((m, 128, 128), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _assemble128_kernel,
        grid=(n // m,),
        in_specs=[half] * 5,
        out_specs=(full, full),
        out_shape=(
            jax.ShapeDtypeStruct((n, 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((n, 128, 128), jnp.float32),
        ),
        compiler_params=_glue_params(
            4 * (2 * 5 * 64 * 64 + 2 * 2 * 128 * 128 + 2 * 128 * 128), m
        ),
        interpret=interpret,
    )(l11, a21, l22, i11, i22)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _assemble128_l_jit(l11, a21, l22, interpret):
    n = l11.shape[0]
    m = _slab_div(n, 16)
    half = pl.BlockSpec((m, 64, 64), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    full = pl.BlockSpec((m, 128, 128), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _assemble128_l_kernel,
        grid=(n // m,),
        in_specs=[half] * 3,
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct((n, 128, 128), jnp.float32),
        compiler_params=_glue_params(
            4 * (2 * 3 * 64 * 64 + 2 * 128 * 128 + 128 * 128), m
        ),
        interpret=interpret,
    )(l11, a21, l22)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _slice11_jit(d, interpret):
    """Packed copy of ``d[:, :64, :64]`` — a bare XLA strided slice fuses
    into the lane-layout transpose with a measured 15x penalty."""
    n = d.shape[0]
    m = _slab_div(n, 64)
    return pl.pallas_call(
        lambda d_ref, o_ref: o_ref.__setitem__(
            (Ellipsis,), d_ref[:, :64, :64]
        ),
        grid=(n // m,),
        in_specs=[pl.BlockSpec((m, 128, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((m, 64, 64), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 64, 64), jnp.float32),
        compiler_params=_glue_params(4 * (2 * 128 * 128 + 2 * 64 * 64), m),
        interpret=interpret,
    )(d.astype(jnp.float32))


def _inv21_kernel(i11_ref, a21_ref, i22_ref, o_ref):
    t1 = jax.lax.dot_general(
        a21_ref[...], i11_ref[...], (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    o_ref[...] = -jax.lax.dot_general(
        i22_ref[...], t1, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _inv21_jit(i11, a21, i22, interpret):
    """``inv21 = -i22 (a21 i11)`` — the off-diagonal block of the 128-wide
    inverse, identical arithmetic to :func:`_assemble128_kernel` but
    without assembling (or writing) the full [N, 128, 128] matrices."""
    n = i11.shape[0]
    m = _slab_div(n, 32)
    half = pl.BlockSpec((m, 64, 64), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _inv21_kernel,
        grid=(n // m,),
        in_specs=[half] * 3,
        out_specs=half,
        out_shape=jax.ShapeDtypeStruct((n, 64, 64), jnp.float32),
        compiler_params=_glue_params(4 * (2 * 4 * 64 * 64 + 64 * 64), m),
        interpret=interpret,
    )(i11, a21, i22)


def _schur128_kernel(d_ref, i11_ref, a21_ref, s22_ref):
    d = d_ref[...]
    a21 = jax.lax.dot_general(
        d[:, 128:, :128], i11_ref[...], (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    a21_ref[...] = a21
    s22_ref[...] = d[:, 128:, 128:] - jax.lax.dot_general(
        a21, a21, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def _schur128_jit(d, i11, interpret):
    n = d.shape[0]
    m = _slab_div(n, 16)
    half = pl.BlockSpec((m, 128, 128), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _schur128_kernel,
        grid=(n // m,),
        in_specs=[
            pl.BlockSpec((m, 256, 256), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            half,
        ],
        out_specs=(half, half),
        out_shape=(
            jax.ShapeDtypeStruct((n, 128, 128), jnp.float32),
            jax.ShapeDtypeStruct((n, 128, 128), jnp.float32),
        ),
        compiler_params=_glue_params(4 * (2 * 256 * 256 + 4 * 128 * 128), m),
        interpret=interpret,
    )(d.astype(jnp.float32), i11)


def schur128(d: jnp.ndarray, i11: jnp.ndarray):
    """``(a21, s22)`` of a 256-wide diagonal block from ``d [N, 256, 256]``
    and the (0,0)-quadrant inverse ``i11 [N, 128, 128]``:
    ``a21 = D21 i11^T``, ``s22 = D22 - a21 a21^T`` — one fused kernel, no
    XLA-level slices or intermediate HBM panels (the 128-wide analog of
    :func:`_schur64_jit`, for the nb=256 deferred-column schedule)."""
    return _schur128_jit(d, i11, _interpret())


@functools.partial(jax.jit, static_argnames=("interpret",))
def _inv21_128_jit(i11, a21, i22, interpret):
    n = i11.shape[0]
    m = _slab_div(n, 16)
    half = pl.BlockSpec((m, 128, 128), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _inv21_kernel,
        grid=(n // m,),
        in_specs=[half] * 3,
        out_specs=half,
        out_shape=jax.ShapeDtypeStruct((n, 128, 128), jnp.float32),
        compiler_params=_glue_params(4 * (2 * 4 * 128 * 128 + 128 * 128), m),
        interpret=interpret,
    )(i11, a21, i22)


def inv21_128(i11: jnp.ndarray, a21: jnp.ndarray, i22: jnp.ndarray):
    """``inv21 = -i22 (a21 i11)`` for 128-wide halves of a 256 block."""
    return _inv21_128_jit(i11, a21, i22, _interpret())


def chol_inv_128_parts(
    d: jnp.ndarray,
) -> tuple[jnp.ndarray, ...]:
    """Block parts ``(l11, a21, l22, i11, i21, i22)`` (each [N, 64, 64]) of
    the 128-wide (L, L^{-1}) — :func:`chol_and_inv_128` WITHOUT the final
    [N, 128, 128] assembly writes.  Consumers that only need the blocks
    (the deferred-column flow: the diag writeback assembles in-kernel, the
    defer kernels latch the inverse from parts into VMEM scratch) skip
    two full-tile HBM writes plus the DUS round-trip per block step."""
    assert d.shape[-1] == 128
    interp = _interpret()
    d11 = _slice11_jit(d, interp)
    l11, i11 = chol_inv_small_batched(d11)
    a21, s22 = _schur64_jit(d, i11, interp)
    l22, i22 = chol_inv_small_batched(s22)
    i21 = _inv21_jit(i11, a21, i22, interp)
    return l11, a21, l22, i11, i21, i22


def chol_128_parts(d: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
    """Factor-only parts ``(l11, a21, l22)`` of the 128-wide L (final
    diagonal blocks — nothing consumes their inverse)."""
    assert d.shape[-1] == 128
    interp = _interpret()
    d11 = _slice11_jit(d, interp)
    l11, i11 = chol_inv_small_batched(d11)
    a21, s22 = _schur64_jit(d, i11, interp)
    l22 = chol_small_batched(s22)
    return l11, a21, l22


def chol_and_inv_128(d: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(L, L^{-1}) of batched PSD ``d [N, 128, 128]`` with the recursion
    glue fused into Pallas kernels (TPU only; callers fall back to the
    XLA recursion elsewhere).  Same arithmetic as ``chol.chol_and_inv``:
    L11/A21/S22/L22 chain + inv21 = -i22 (a21 i11)."""
    assert d.shape[-1] == 128
    interp = _interpret()
    d11 = _slice11_jit(d, interp)
    l11, i11 = chol_inv_small_batched(d11)
    a21, s22 = _schur64_jit(d, i11, interp)
    l22, i22 = chol_inv_small_batched(s22)
    return _assemble128_jit(l11, a21, l22, i11, i22, interp)


def chol_128(d: jnp.ndarray) -> jnp.ndarray:
    """``L`` of batched PSD ``d [N, 128, 128]`` — :func:`chol_and_inv_128`
    without the inverse assembly (final diagonal blocks)."""
    assert d.shape[-1] == 128
    interp = _interpret()
    d11 = _slice11_jit(d, interp)
    l11, i11 = chol_inv_small_batched(d11)
    a21, s22 = _schur64_jit(d, i11, interp)
    l22 = chol_small_batched(s22)
    return _assemble128_l_jit(l11, a21, l22, interp)


# ---------------------------------------------------------------------------
# Fused gram construction + Cholesky
# ---------------------------------------------------------------------------

def _gram_lane(times_ref, ls_ref, mask_ref, var_ref, noise, kfn, t_pad):
    """Gram bank ``[T, T, L]`` built in lane layout from the per-matrix
    time vectors — exact ``kernels.gram`` semantics (masked-to-identity)."""
    tt = times_ref[0]            # [T, L]
    ls = ls_ref[0]               # [1, L] (sublane-padded scalar row)
    m = mask_ref[0]              # [T, L]
    var = var_ref[0]             # [1, L]
    dt = tt[:, None, :] - tt[None, :, :]          # [T, T, L]
    a = var[None, :, :] * kfn(dt, ls[None, :, :])  # [T, T, L]
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (t_pad, t_pad, 1), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (t_pad, t_pad, 1), 1)
    ).astype(jnp.float32)
    a = (1.0 - noise) * a + noise * eye
    mm = m[:, None, :] * m[None, :, :]
    return a * mm + (1.0 - m[:, None, :]) * eye


def _make_gram_chol_kernel(kernel_name: str, noise: float, t_pad: int):
    kfn = kernels_lib.get_kernel(kernel_name)

    def kernel(times_ref, ls_ref, mask_ref, var_ref, l_ref):
        a = _gram_lane(times_ref, ls_ref, mask_ref, var_ref, noise, kfn,
                       t_pad)
        _chol_lane_body(a, l_ref.at[0], t_pad)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("kernel", "noise", "t", "interpret")
)
def _gram_chol_fused_impl(times, ls, mask, var, *, kernel, noise, t,
                          interpret):
    """times/ls/mask/var all ``[N]``-leading flat layout; see wrapper."""
    # grouped layout [G, ..., lanes] (see chol_small_batched)
    g, t_pad, lanes = times.shape
    body = _make_gram_chol_kernel(kernel, noise, t_pad)
    out = pl.pallas_call(
        body,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, t_pad, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, lanes), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_pad, t_pad, lanes),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, t_pad, t_pad, lanes),
                                       jnp.float32),
        interpret=interpret,
    )(times, ls, mask, var)
    return out  # [G, T_pad, T_pad, lanes]


def gram_chol_fused(
    times: jnp.ndarray,
    lengthscales: jnp.ndarray,
    *,
    mask: jnp.ndarray | None = None,
    kernel: str = "rbf",
    noise: float = kernels_lib.DEFAULT_NOISE,
    variance: jnp.ndarray | float = 1.0,
) -> jnp.ndarray:
    """Fused gram-bank construction + batched Cholesky.

    Equivalent to ``cholesky(gram_bank(times, lengthscales, ...))`` but the
    ``[B, Z, T, T]`` gram never exists in HBM.  Returns ``L [B, Z, T, T]``.

    * ``times`` ``[B, T]`` fp32, ``mask`` ``[B, T]`` bool or None,
    * ``lengthscales`` ``[Z]`` or ``[B, Z]``,
    * ``variance`` scalar or ``[Z]``.

    Only the forward pass; the differentiable entry point with a custom VJP is
    ``gpvae_tpu.gp.chol_gram_bank``.
    """
    b, t = times.shape
    if t > LANE_BATCH_MAX_T:
        raise ValueError(f"fused path supports T <= {LANE_BATCH_MAX_T}")
    z = lengthscales.shape[-1]
    n = b * z
    t_pad = max(_round_up(t, 8), 8)
    n_pad = _round_up(n, _lanes_for(t_pad))

    f32 = jnp.float32
    # Broadcast to flat [N] matrix index = (b, z)
    tt = jnp.broadcast_to(times[:, None, :], (b, z, t)).reshape(n, t)
    if lengthscales.ndim == 1:
        ls = jnp.broadcast_to(lengthscales[None, :], (b, z)).reshape(n)
    else:
        ls = lengthscales.reshape(n)
    if mask is None:
        mk = jnp.ones((n, t), f32)
    else:
        mk = jnp.broadcast_to(
            mask.astype(f32)[:, None, :], (b, z, t)
        ).reshape(n, t)
    var = jnp.asarray(variance, f32)
    if var.ndim == 0:
        var = jnp.full((n,), var, f32)
    else:
        var = jnp.broadcast_to(var[None, :], (b, z)).reshape(n)

    def pad_n(x, fill=0.0):
        if n_pad == n:
            return x
        pad_width = [(0, n_pad - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad_width, constant_values=fill)

    tt = pad_n(tt.astype(f32))
    ls = pad_n(ls.astype(f32), fill=1.0)
    mk = pad_n(mk)  # padded matrices fully masked -> identity gram
    var = pad_n(var, fill=1.0)

    def pad_t(x):
        if t_pad == t:
            return x
        return jnp.pad(x, ((0, 0), (0, t_pad - t)))

    tt, mk = pad_t(tt), pad_t(mk)

    lanes = _lanes_for(t_pad)
    g = n_pad // lanes

    def group(x):  # [N, T] -> [G, T, lanes]
        return jnp.transpose(x.reshape(g, lanes, -1), (0, 2, 1))

    out = _gram_chol_fused_impl(
        group(tt), group(ls[:, None]), group(mk), group(var[:, None]),
        kernel=kernel, noise=noise, t=t_pad, interpret=_interpret(),
    )
    l = jnp.transpose(out, (0, 3, 1, 2)).reshape(n_pad, t_pad, t_pad)
    l = l[:n, :t, :t]
    return jnp.tril(l).reshape(b, z, t, t)


def _make_gram_chol_inv_kernel(kernel_name: str, noise: float, t_pad: int):
    kfn = kernels_lib.get_kernel(kernel_name)

    def kernel(times_ref, ls_ref, mask_ref, var_ref, l_ref, x_ref):
        a = _gram_lane(times_ref, ls_ref, mask_ref, var_ref, noise, kfn,
                       t_pad)
        if BLOCKED_LANE_BODY and t_pad % _PANEL == 0:
            _chol_inv_body_blocked(a, l_ref.at[0], x_ref.at[0], t_pad)
        else:
            _chol_inv_body_flat(a, l_ref.at[0], x_ref.at[0], t_pad)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("kernel", "noise", "interpret")
)
def gram_chol_inv_small(
    times: jnp.ndarray,
    lengthscales: jnp.ndarray,
    mask: jnp.ndarray,
    variance: jnp.ndarray,
    *,
    kernel: str = "rbf",
    noise: float = kernels_lib.DEFAULT_NOISE,
    interpret: bool | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused gram + (L, L^{-1}) for a flat bank: ``times [N, T]`` (T <= 64),
    ``lengthscales/variance [N]``, ``mask [N, T]`` float — the gram is
    built in-kernel (``kernels.gram`` semantics) and factored+inverted in
    the same lane pass.  Feeds the first diagonal block of the fused
    large-T flow (``pallas_big.gram_chol_inv_128_parts``) so the k00 gram
    never exists in HBM."""
    if interpret is None:
        interpret = _interpret()
    n, t = times.shape
    assert t <= LANE_BATCH_MAX_T, t
    t_pad = max(_round_up(t, 8), 8)
    lanes = _lanes_for(t_pad)
    n_pad = _round_up(max(n, 1), lanes)
    f32 = jnp.float32

    def pad_n(x, fill=0.0):
        if n_pad == n:
            return x
        pad_width = [(0, n_pad - n)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad_width, constant_values=fill)

    tt = pad_n(times.astype(f32))
    ls = pad_n(lengthscales.astype(f32).reshape(n), fill=1.0)
    mk = pad_n(mask.astype(f32))  # padded matrices fully masked -> identity
    var = pad_n(jnp.asarray(variance, f32).reshape(n), fill=1.0)
    if t_pad != t:
        tt = jnp.pad(tt, ((0, 0), (0, t_pad - t)))
        mk = jnp.pad(mk, ((0, 0), (0, t_pad - t)))
    g = n_pad // lanes

    def group(x):  # [N, T] -> [G, T, lanes]
        return jnp.transpose(x.reshape(g, lanes, -1), (0, 2, 1))

    body = _make_gram_chol_inv_kernel(kernel, noise, t_pad)
    vec = pl.BlockSpec((1, t_pad, lanes), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    par = pl.BlockSpec((1, 1, lanes), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((1, t_pad, t_pad, lanes), lambda i: (i, 0, 0, 0),
                       memory_space=pltpu.VMEM)
    l_out, x_out = pl.pallas_call(
        body,
        grid=(g,),
        in_specs=[vec, par, vec, par],
        out_specs=(mat, mat),
        out_shape=(
            jax.ShapeDtypeStruct((g, t_pad, t_pad, lanes), f32),
            jax.ShapeDtypeStruct((g, t_pad, t_pad, lanes), f32),
        ),
        interpret=interpret,
    )(group(tt), group(ls[:, None]), group(mk), group(var[:, None]))

    def unpack(o):
        o = jnp.transpose(o, (0, 3, 1, 2)).reshape(n_pad, t_pad, t_pad)
        return o[:n, :t, :t]

    return unpack(l_out), unpack(x_out)
