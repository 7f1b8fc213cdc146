"""Fused panel + trailing-update Pallas kernel for the blocked Cholesky.

The large-T factorization splits per block step into (1) a lane-batched
diagonal-block factor+invert across all N matrices (ops/pallas_chol.py —
the serial recurrence amortized over the whole bank, which a per-matrix
whole-in-VMEM kernel cannot match) and (2) the panel solve + symmetric
trailing downdate.  At the XLA level, (2) is what dominates: every step
re-materializes the [N, R, R] trailing submatrix in HBM with defensive
copies (docs/DESIGN.md: matmul passes ~1 ms of a 16 ms T=1024
factorization).

This kernel streams (2) through a two-dimensional grid — (matrix slab,
128-row tile) — so Pallas's pipeline double-buffers every HBM move
automatically (a manual-DMA variant was measured DMA-latency-bound: too
many small transfers per matrix):

* each tile's input block carries 128 trailing rows with ALL columns, so
  the tile's own panel slice is ``block[:, :, :nb]``;
* ``X_j = panel_j @ Ld^{-T}`` — one MXU matmul against the prefactored
  block inverse (no triangular solve anywhere) — is emitted as the column
  block AND accumulated into a persistent VMEM scratch;
* the trailing downdate for the tile contracts against exactly the X rows
  already produced (row tiles stream in order, and column c of the update
  needs X row c <= tile end): columns beyond the tile's lower-triangular
  extent receive garbage that no consumer reads — the next step's kernel
  and the lane-batched diagonal factor read only the panel and the
  diagonal blocks.

All dots are ``precision=HIGHEST`` (fp32-accurate multi-pass — Mosaic
honors it; DEFAULT would be bf16).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpvae_tpu.ops import dispatch

NB = 128           # panel width = row-tile height (full MXU contraction)
_SLAB_BYTES = 5 * 1024 * 1024  # VMEM budget for one slab's working set

_HI = jax.lax.Precision.HIGHEST


def _interpret() -> bool:
    return not dispatch.on_tpu()


def _make_kernel(m: int, r: int, nb: int):
    from gpvae_tpu.ops.pallas_big import split_dot

    r2 = r - nb

    def kernel(s_ref, ldi_ref, colx_ref, out_ref, x_buf):
        j = pl.program_id(1)
        tile = s_ref[...]                                   # [m, nb, r]
        xj = split_dot(
            tile[:, :, :nb], ldi_ref[...],
            (((2,), (2,)), ((0,), (0,))),
        )                                                   # [m, nb, nb]
        colx_ref[...] = xj
        row0 = pl.multiple_of(j * nb, nb)
        x_buf[:, pl.ds(row0, nb), :] = xj
        # Full-width contraction.  Correctness invariant: X rows <= tile end
        # are fresh for THIS slab because the grid iterates j (the row tile)
        # as the minor axis and the VMEM scratch persists across grid
        # iterations; rows past the tile end are stale — at j=0 of slab i>0
        # they are leftovers from the PREVIOUS slab — and feed only the
        # upper-triangular output columns, which no consumer reads (the next
        # block step touches the panel + diagonal blocks only).
        upd = split_dot(
            xj, x_buf[...], (((2,), (2,)), ((0,), (0,))),
        )                                                   # [m, nb, r2]
        out_ref[...] = tile[:, :, nb:] - upd

    # An in-kernel factorization of the next diagonal block (chaining steps
    # with no XLA round in between) was tried and REVERTED: the micro-panel
    # recurrence is serial per slab, and with n/m slabs per step it cost far
    # more than the lane-batched XLA round it replaced (measured 18x
    # slower at T=256 N=512).  The serial work belongs where the whole bank
    # amortizes it.
    return kernel


def _slab_size(r: int, n: int, nb: int) -> int:
    # in block (m, nb, r) + out (m, nb, r-nb) + colx + x_buf (m, r-nb, nb),
    # with in/out double-buffered by the pipeline
    per_matrix = 4 * (2 * nb * r + 2 * nb * (r - nb) + nb * nb
                      + (r - nb) * nb)
    m = max(1, _SLAB_BYTES // per_matrix)
    while n % m != 0:
        m -= 1
    return m


def panel_trailing_update(
    s: jnp.ndarray, ld_inv: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One blocked-Cholesky step over the bank.

    ``s [N, R, R]`` is the current trailing submatrix (diagonal block
    included; only its lower block triangle is read), ``ld_inv``
    ``[N, NB, NB]`` the inverses of its prefactored diagonal blocks.
    Returns ``(col_x [N, R-NB, NB], s_new [N, R-NB, R-NB])``: the
    sub-diagonal panel of the new column block (the caller stacks the
    diagonal factor on top) and the downdated trailing submatrix, of which
    only the lower block triangle is defined.  Requires ``R`` a multiple
    of NB, ``R >= 2*NB``.
    """
    return _panel_trailing_jit(s, ld_inv, _interpret())


@functools.partial(jax.jit, static_argnames=("interpret",))
def _panel_trailing_jit(s, ld_inv, interpret):
    n, r, r_ = s.shape
    nb = ld_inv.shape[-1]
    assert r == r_ and r % nb == 0 and r >= 2 * nb, (s.shape, nb)
    r2 = r - nb
    m = _slab_size(r, n, nb)
    f32 = jnp.float32
    colx, out = pl.pallas_call(
        _make_kernel(m, r, nb),
        grid=(n // m, r2 // nb),
        in_specs=[
            pl.BlockSpec((m, nb, r), lambda i, j: (i, j + 1, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, nb, nb), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((m, nb, nb), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, nb, r2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, r2, nb), f32),
            jax.ShapeDtypeStruct((n, r2, r2), f32),
        ),
        scratch_shapes=[
            pltpu.VMEM((m, r2, nb), f32),
        ],
        interpret=interpret,
    )(s.astype(f32), ld_inv.astype(f32))
    return colx, out
