"""Pallas kernel: batched small lower-triangular inverse.

The enabler for the MXU-only blocked Cholesky: instead of solving the panel
``X L_d^T = P`` with a (sequential, latency-bound) triangular solve, invert
each diagonal block once — ``X = P L_d^{-T}`` is then a plain batched matmul
that the MXU eats.  This is the standard trick production GPU/TPU solvers
use for batched factorizations; the reference instead calls a full
``tf.matrix_inverse`` on every T x T gram (src/Models/syndata/
GP_VAE_syn_data.py:226), which this kernel renders unnecessary (inverses
exist only for <=64-wide triangular diagonal blocks, never for full grams).

Same lane-batched layout as pallas_chol.py: matrices ``[nb, nb, 128]`` with
the batch in the lane axis, row recurrence unrolled at trace time, every
step a full-width VPU op.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
MAX_NB = 64


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _tri_inv_kernel(l_ref, x_ref):
    """Forward substitution, rows unrolled: row j of X = L^{-1} is
    ``(e_j - sum_i L[j,i] X[i]) / L[j,j]`` — the sum uses the full X whose
    rows >= j are still zero, so no masking is needed.  Rows accumulate in
    the output ref (``.at[].set`` on values lowers to scatter, which Mosaic
    does not implement)."""
    nb = l_ref.shape[0]
    l = l_ref[...]                       # [nb, nb, L]
    x_ref[...] = jnp.zeros_like(l)
    for j in range(nb):
        lj = l[j, :, :]                  # [nb(i), L]
        acc = jnp.sum(lj[:, None, :] * x_ref[...], axis=0)  # [nb(c), L]
        onehot = jax.lax.broadcasted_iota(
            jnp.int32, (nb, 1), 0
        ) == j                                          # [nb, 1]
        row = (onehot.astype(l.dtype) - acc) / l[j, j, :][None, :]
        x_ref[j, :, :] = row


@jax.jit
def tri_inv_small_batched(l: jnp.ndarray) -> jnp.ndarray:
    """Inverse of batched lower-triangular ``l [N, nb, nb]``, nb <= 64."""
    n, nb, nb2 = l.shape
    assert nb == nb2, l.shape
    if nb > MAX_NB:
        raise ValueError(f"nb={nb} > {MAX_NB}")
    nb_pad = max(_round_up(nb, 8), 8)
    n_pad = _round_up(max(n, 1), LANES)
    lp = l.astype(jnp.float32)
    if nb_pad != nb:
        pad_diag = (jnp.arange(nb_pad) >= nb).astype(jnp.float32)
        lp = jnp.pad(lp, ((0, 0), (0, nb_pad - nb), (0, nb_pad - nb)))
        lp = lp + jnp.eye(nb_pad, dtype=jnp.float32) * pad_diag[None, None, :]
    if n_pad != n:
        pad_block = jnp.broadcast_to(
            jnp.eye(nb_pad, dtype=jnp.float32), (n_pad - n, nb_pad, nb_pad)
        )
        lp = jnp.concatenate([lp, pad_block], axis=0)
    lt = jnp.transpose(lp, (1, 2, 0))
    out = pl.pallas_call(
        _tri_inv_kernel,
        grid=(n_pad // LANES,),
        in_specs=[
            pl.BlockSpec((nb_pad, nb_pad, LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb_pad, nb_pad, LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb_pad, nb_pad, n_pad), jnp.float32),
        interpret=_interpret(),
    )(lt)
    x = jnp.transpose(out, (2, 0, 1))[:n, :nb, :nb]
    return jnp.tril(x)
