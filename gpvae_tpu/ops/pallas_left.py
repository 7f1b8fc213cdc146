"""Streamed history-matmul kernel for the left-looking blocked Cholesky.

The left-looking order (ops/chol.py::cholesky_blocked_left) computes each
panel as ``K_panel - L_hist @ L_rowblk^T`` against the already-final column
history.  At the XLA level those history operands are slices of the big L
buffer feeding one einsum; this kernel streams the same contraction through
a (matrix-slab, row-tile) Pallas grid — blocked specs, automatic pipeline
double-buffering, the row-block operand resident across tiles, and the
subtraction fused into the same pass (no [N, R, nb] panel temp in HBM
between the matmul and the subtract).

Contraction depth is exactly ``b*nb`` per step (no full-width zero wastage)
and every dot is ``precision=HIGHEST``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpvae_tpu.ops import dispatch

NB = 128
_SLAB_BYTES = 5 * 1024 * 1024

_HI = jax.lax.Precision.HIGHEST


def _interpret() -> bool:
    return not dispatch.on_tpu()


def _make_kernel():
    def kernel(k_ref, hist_ref, row_ref, out_ref):
        upd = jax.lax.dot_general(
            hist_ref[...], row_ref[...], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32, precision=_HI,
        )                                                 # [m, nb, nb]
        out_ref[...] = k_ref[...] - upd

    return kernel


def _slab_size(o: int, n: int) -> int:
    per_matrix = 4 * (2 * NB * o * 2 + 2 * NB * NB)  # hist(2buf)+row + io
    m = max(1, _SLAB_BYTES // max(per_matrix, 1))
    while n % m != 0:
        m -= 1
    return m


def hist_panel_update(
    l: jnp.ndarray, k: jnp.ndarray, block: int
) -> jnp.ndarray:
    """Panel for left-looking step ``block`` over the bank.

    ``l [N, T, T]`` is the L-so-far buffer (columns < block*NB final),
    ``k [N, T, T]`` the original matrix bank.  Returns
    ``panel [N, T - block*NB, NB] = K[:, o:, o:o+NB] - L[:, o:, :o] @
    L[:, o:o+NB, :o]^T`` with ``o = block*NB``.  Requires block >= 1 and
    T a multiple of NB.
    """
    return _hist_panel_jit(l, k, block, _interpret())


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def _hist_panel_jit(l, k, block, interpret):
    n, t, t_ = k.shape
    assert t == t_ and t % NB == 0 and 1 <= block < t // NB
    o = block * NB
    r = t - o
    m = _slab_size(o, n)
    f32 = jnp.float32
    out = pl.pallas_call(
        _make_kernel(),
        grid=(n // m, r // NB),
        in_specs=[
            pl.BlockSpec((m, NB, NB), lambda i, j, b=block: (i, b + j, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, NB, o), lambda i, j, b=block: (i, b + j, 0),
                         memory_space=pltpu.VMEM),
            # the row block is constant across j: kept resident
            pl.BlockSpec((m, NB, o), lambda i, j, b=block: (i, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, NB, NB), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, r, NB), f32),
        interpret=interpret,
    )(k.astype(f32), l.astype(f32), l.astype(f32))
    return out
