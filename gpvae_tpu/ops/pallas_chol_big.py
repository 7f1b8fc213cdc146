"""Whole-matrix in-VMEM Pallas Cholesky for large T (up to 1024+).

TPU-native replacement for the reference's large-gram ambitions (the aborted
``max_time=1000`` attempt at src/old/GP_VAE_syn_data.py:226 and the T=1024
scale configs in BASELINE.json).  The XLA-level blocked path
(``ops/chol.py::cholesky_blocked``) is bound by slice/copy traffic between
kernel launches: every block step re-materializes the trailing submatrix in
HBM (measured: matmul passes ~1 ms of a 16 ms factorization at T=1024).
This kernel keeps each matrix *resident in VMEM for its entire
factorization*:

* grid over groups of ``M`` matrices; each grid step DMAs a ``[M, T, T]``
  slab HBM -> VMEM scratch, factors it in place, and DMAs the factor back —
  HBM traffic is the information-theoretic minimum (read K once, write L
  once);
* in-kernel right-looking blocked loop (``nb = 128`` panels, statically
  unrolled — T is static): diagonal blocks factor *and invert* via a
  64-wide row-form recurrence batched over the ``M`` co-resident matrices
  (one ``lax.fori_loop``, every step full-lane-width VPU/MXU ops, the
  sequential chain is shared by all M matrices), panels are pure MXU
  matmuls against the block inverse, and the trailing update touches only
  the lower-triangular blocks (half the FLOPs of a naive ``S -= X X^T``);
* ``M`` is chosen so the slab fills VMEM (T=1024 -> M=2, T=512 -> M=8,
  T=256 -> M=32), amortizing the serial diagonal recurrence across
  matrices.

The 64-wide base recurrence works in ROW form (producing ``U = L^T`` row by
row) so every vector op is lane-major: the scaled pivot row is ``[M,1,64]``
(64 lanes), the rank-1 update is a K=1 ``dot_general`` (no transposes), and
the interleaved forward substitution emits ``L^{-1}`` rows for free.

Forward only; the differentiable entry point with the shared analytic VJP
is ``ops.cholesky(method="whole"|"auto")``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpvae_tpu.ops import dispatch

NB = 128          # outer panel width (full MXU contraction)
BASE = 64         # base recurrence width
_DIAG_EPS = 1e-20
# VMEM budget for the resident slab; leaves headroom for panel/update
# temporaries (<= ~2 MB) and Mosaic overhead out of the ~16 MB per core.
_SLAB_BYTES = 9 * 1024 * 1024
_MAX_M = 32


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret() -> bool:
    return not dispatch.on_tpu()


_HI = jax.lax.Precision.HIGHEST


def _bmm_nt(a, b):
    """Batched ``a @ b^T``: [M, i, k] x [M, j, k] -> [M, i, j] (MXU)."""
    return jax.lax.dot_general(
        a, b, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=_HI,
    )


def _bmm_nn(a, b):
    """Batched ``a @ b``: [M, i, k] x [M, k, j] -> [M, i, j] (MXU)."""
    return jax.lax.dot_general(
        a, b, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32, precision=_HI,
    )


def _chol_inv_base(s, o, u, x, m):
    """Factor the [M, BASE, BASE] diagonal block of scratch ``s`` at offset
    ``o`` IN PLACE (leaving L there) and its inverse in scratch ref ``x``
    — row-form recurrence.

    Builds ``U = L^T`` one row per iteration (the pivot row of the trailing
    matrix IS the new factor row, by symmetry), applies the rank-1 downdate
    as a K=1 MXU outer product (no transposes anywhere), and interleaves
    forward substitution for ``X = L^{-1}`` (row j of X finalizes as soon
    as row j of U exists).  The column loop is unrolled at trace time —
    every index is static (Mosaic does not lower ``dynamic_slice`` on
    values).  All per-column state lives in the scratch refs ``u``/``x``
    and the block of ``s`` itself, so temporaries die within each
    iteration (long value-carried chains overflow the Mosaic VMEM stack).
    """
    nb = BASE
    pw = 8  # micro-panel width = the fp32 sublane tile (aligned ref I/O)
    f32 = jnp.float32
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, nb), 2)
    prow = jax.lax.broadcasted_iota(jnp.int32, (1, pw, 1), 1)
    krow = jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0)
    ccol = jax.lax.broadcasted_iota(jnp.int32, (1, pw), 1)

    u[...] = jnp.zeros((m, nb, nb), f32)
    x[...] = jnp.zeros((m, nb, nb), f32)

    def _dot(a, b, dims):
        return jax.lax.dot_general(
            a, b, dims, preferred_element_type=f32, precision=_HI,
        )

    def panel(p, _):
        # Mosaic bans dynamic lane slicing and unaligned dynamic sublane
        # access; every dynamic ref access below is an 8-row-aligned
        # sublane window, and lane extraction goes through mask-reduce or
        # a one-hot matmul.
        base_row = pl.multiple_of(pw * p, pw)
        row_start = pl.multiple_of(o + pw * p, pw)
        chunk = s[:, pl.ds(row_start, pw), o:o + nb]            # [M,pw,nb]
        # prev-panel substitution input: rows g of (U^T X) for this panel's
        # g = pw*p + c, via a one-hot column gather (sel[k, c] = [k == g_c])
        sel = (krow == pw * p + ccol).astype(f32)               # [nb,pw]
        # HIGHEST: a selection matmul, but DEFAULT would round the gathered
        # u values to bf16 (measured 4e-4 factor error at T=1024)
        ucols = jax.lax.dot_general(
            u[...], sel, (((2,), (0,)), ((), ())),
            preferred_element_type=f32, precision=_HI,
        )                                                       # [M,nb,pw]
        acc_chunk = _dot(
            ucols, x[...], (((1,), (1,)), ((0,), (0,)))
        )                                                       # [M,pw,nb]

        cpan = jnp.zeros((m, pw, nb), f32)
        xpan = jnp.zeros((m, pw, nb), f32)
        for c in range(pw):
            g = pw * p + c
            colmask = (cols == g).astype(f32)                   # [1,1,nb]
            # within-panel couplings: coeffs[k] = L[g, pw*p+k] = cpan[k][g]
            coeffs = jnp.sum(
                cpan * colmask, axis=2, keepdims=True
            )                                                   # [M,pw,1]
            corr = _dot(coeffs, cpan, (((1,), (1,)), ((0,), (0,))))
            pivot = chunk[:, c:c + 1, :] - corr                 # [M,1,nb]
            ajj = jnp.sum(pivot * colmask, axis=2, keepdims=True)
            d = jax.lax.rsqrt(jnp.maximum(ajj, _DIAG_EPS))
            crow = jnp.where(cols >= g, pivot * d, 0.0)
            cpan = jnp.where(prow == c, crow, cpan)
            # forward substitution row for X = L^{-1}
            xdown = _dot(coeffs, xpan, (((1,), (1,)), ((0,), (0,))))
            xrow = (colmask - acc_chunk[:, c:c + 1, :] - xdown) * d
            xpan = jnp.where(prow == c, xrow, xpan)

        u[:, pl.ds(base_row, pw), :] = cpan
        x[:, pl.ds(base_row, pw), :] = xpan
        # rank-pw MXU downdate of the whole block (rows already factored
        # are never read again; the block is overwritten by U^T at the end)
        down = _dot(cpan, cpan, (((1,), (1,)), ((0,), (0,))))   # [M,nb,nb]
        s[:, o:o + nb, o:o + nb] = s[:, o:o + nb, o:o + nb] - down
        return 0

    jax.lax.fori_loop(0, nb // pw, panel, 0)
    s[:, o:o + nb, o:o + nb] = jnp.swapaxes(u[...], -1, -2)


def _factor_diag_block(s, o, u, x, m):
    """Factor the [M, NB, NB] diagonal block of scratch ``s`` at offset
    ``o`` in place and return its inverse parts ``(x11, x21, x22)``
    ([M, 64, 64] each; the full inverse is [[x11, 0], [x21, x22]]).

    Two-level split: the 64-wide halves go through the base recurrence, the
    coupling is pure MXU (``L21 = D21 X11^T``, Schur complement, block
    substitution for the inverse).
    """
    h = BASE
    _chol_inv_base(s, o, u, x, m)
    x11 = x[...]
    l21 = _bmm_nt(s[:, o + h:o + NB, o:o + h], x11)
    s[:, o + h:o + NB, o:o + h] = l21
    s[:, o + h:o + NB, o + h:o + NB] = (
        s[:, o + h:o + NB, o + h:o + NB] - _bmm_nt(l21, l21)
    )
    _chol_inv_base(s, o + h, u, x, m)
    x22 = x[...]
    x21 = -_bmm_nn(_bmm_nn(x22, l21), x11)
    s[:, o:o + h, o + h:o + NB] = jnp.zeros((m, h, h), jnp.float32)
    return x11, x21, x22


def _make_whole_kernel(m: int, t: int):
    nsteps = t // NB
    h = BASE

    def kernel(a_hbm, l_hbm, s, u, x, sem_in, sem_out):
        i = pl.program_id(0)
        cp_in = pltpu.make_async_copy(
            a_hbm.at[pl.ds(i * m, m)], s, sem_in
        )
        cp_in.start()
        cp_in.wait()
        for b in range(nsteps):
            o = b * NB
            x11, x21, x22 = _factor_diag_block(s, o, u, x, m)
            r = t - o - NB
            if r > 0:
                # panel: X = rest @ Ld^{-T}, with the inverse in block
                # parts so no [NB, NB] concat is needed for the matmul
                # rest @ Ld^{-T} with Ld^{-T} = [[x11^T, x21^T], [0, x22^T]]
                rest1 = s[:, o + NB:, o:o + h]          # [M, r, 64]
                rest2 = s[:, o + NB:, o + h:o + NB]     # [M, r, 64]
                xp1 = _bmm_nt(rest1, x11)
                xp2 = _bmm_nt(rest1, x21) + _bmm_nt(rest2, x22)
                s[:, o + NB:, o:o + h] = xp1
                s[:, o + NB:, o + h:o + NB] = xp2
                xp = jnp.concatenate([xp1, xp2], axis=2)  # [M, r, NB]
                # trailing update, lower-triangular blocks only (row block
                # rb updates columns o+NB .. rb_end): half the FLOPs of
                # the naive full S -= X X^T
                for rb in range(b + 1, nsteps):
                    ro = rb * NB
                    lo = ro - (o + NB)
                    xrb = xp[:, lo:lo + NB, :]            # [M, NB, NB]
                    xcb = xp[:, :lo + NB, :]              # [M, w, NB]
                    upd = _bmm_nt(xrb, xcb)               # [M, NB, w]
                    s[:, ro:ro + NB, o + NB:ro + NB] = (
                        s[:, ro:ro + NB, o + NB:ro + NB] - upd
                    )
        # blocks strictly above the 128-block diagonal still hold original
        # gram values (never written): zero them so the output is lower
        # triangular
        for rb in range(nsteps - 1):
            ro = rb * NB
            w = t - ro - NB
            s[:, ro:ro + NB, ro + NB:] = jnp.zeros((m, NB, w), jnp.float32)
        cp_out = pltpu.make_async_copy(
            s, l_hbm.at[pl.ds(i * m, m)], sem_out
        )
        cp_out.start()
        cp_out.wait()

    return kernel


def _group_size(t_pad: int) -> int:
    return max(1, min(_MAX_M, _SLAB_BYTES // (t_pad * t_pad * 4)))


def chol_whole_batched(k: jnp.ndarray) -> jnp.ndarray:
    """Batched Cholesky ``L`` of PSD ``k [N, T, T]`` with each matrix
    resident in VMEM for its whole factorization.  T is padded to a
    multiple of 128 (identity padding); supports T up to ~1500 (one
    matrix per slab).  fp32 in, fp32 out.
    """
    # interpret resolved OUTSIDE the jit so the trace cache keys on it
    return _chol_whole_jit(k, _interpret())


@functools.partial(jax.jit, static_argnames=("interpret",))
def _chol_whole_jit(k: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    n, t, t2 = k.shape
    assert t == t2, k.shape
    t_pad = max(_round_up(t, NB), NB)
    m = min(_group_size(t_pad), max(n, 1))
    if m < 1 or t_pad * t_pad * 4 > _SLAB_BYTES:
        raise ValueError(
            f"T={t} too large for the whole-matrix kernel "
            f"(slab budget {_SLAB_BYTES} bytes)"
        )
    kp = k.astype(jnp.float32)
    if t_pad != t:
        kp = jnp.pad(kp, ((0, 0), (0, t_pad - t), (0, t_pad - t)))
        diag_pad = (jnp.arange(t_pad) >= t).astype(jnp.float32)
        kp = kp + jnp.eye(t_pad, dtype=jnp.float32) * diag_pad[None, None, :]
    n_pad = _round_up(max(n, 1), m)
    if n_pad != n:
        pad_block = jnp.broadcast_to(
            jnp.eye(t_pad, dtype=jnp.float32), (n_pad - n, t_pad, t_pad)
        )
        kp = jnp.concatenate([kp, pad_block], axis=0)

    out = pl.pallas_call(
        _make_whole_kernel(m, t_pad),
        grid=(n_pad // m,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((n_pad, t_pad, t_pad), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((m, t_pad, t_pad), jnp.float32),
            pltpu.VMEM((m, BASE, BASE), jnp.float32),
            pltpu.VMEM((m, BASE, BASE), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(kp)
    return out[:n, :t, :t]
