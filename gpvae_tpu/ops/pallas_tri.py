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

from gpvae_tpu.ops import dispatch

LANES = 128
MAX_NB = 64


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret() -> bool:
    return not dispatch.on_tpu()


def _tri_inv_kernel(l_ref, x_ref):
    """Forward substitution, rows unrolled: row j of X = L^{-1} is
    ``(e_j - sum_i L[j,i] X[i]) / L[j,j]`` — the sum uses the full X whose
    rows >= j are still zero, so no masking is needed.  Rows accumulate in
    the output ref (``.at[].set`` on values lowers to scatter, which Mosaic
    does not implement).  Refs are [1, nb, nb, L] (grouped layout)."""
    nb = l_ref.shape[1]
    l = l_ref[0]                         # [nb, nb, L]
    xv = x_ref.at[0]
    xv[...] = jnp.zeros_like(l)
    for j in range(nb):
        lj = l[j, :, :]                  # [nb(i), L]
        acc = jnp.sum(lj[:, None, :] * xv[...], axis=0)  # [nb(c), L]
        onehot = jax.lax.broadcasted_iota(
            jnp.int32, (nb, 1), 0
        ) == j                                          # [nb, 1]
        row = (onehot.astype(l.dtype) - acc) / l[j, j, :][None, :]
        xv[j, :, :] = row


def tri_inv_blocked(l: jnp.ndarray) -> jnp.ndarray:
    """Lower-triangular inverse for any side via block recursion:

        inv([[A, 0], [B, C]]) = [[A^{-1}, 0], [-C^{-1} B A^{-1}, C^{-1}]]

    halving down to the 64-wide lane-batched base — every level above the
    base is two HIGHEST-precision MXU matmuls, no sequential substitution
    anywhere.  This is what routes the large-T KLs and the Cholesky VJP
    around XLA's sequential ``triangular_solve``.  ``l [N, T, T]``.

    NOTE: the sequential recursion dispatches T/64 *separate* lane-kernel
    calls, each padding its tiny batch to 128 lanes — at the production
    KL shapes ([2, 1024, 1024]) that is ~16 calls with 126/128 lanes
    wasted.  :func:`tri_inv_flat` batches all diagonal blocks into ONE
    lane call and merges level-by-level; ``tri_inv`` dispatches there.
    This recursion is kept as the reference implementation (tests pit the
    two against each other).
    """
    n, t, _ = l.shape
    if t <= MAX_NB:
        return tri_inv_small_batched(l)
    # pad to a power-of-two multiple of MAX_NB split points: split at the
    # largest multiple of MAX_NB >= t/2 keeps blocks aligned
    h = max(MAX_NB, ((t // 2 + MAX_NB - 1) // MAX_NB) * MAX_NB)
    if h >= t:  # t in (MAX_NB, 2*MAX_NB): split at MAX_NB
        h = MAX_NB
    ia = tri_inv_blocked(l[:, :h, :h])
    ic = tri_inv_blocked(l[:, h:, h:])
    hi = jax.lax.Precision.HIGHEST
    ib = -jnp.einsum(
        "nij,njk,nkl->nil", ic, l[:, h:, :h], ia,
        preferred_element_type=jnp.float32, precision=hi,
    )
    zero = jnp.zeros((n, h, t - h), jnp.float32)
    return jnp.concatenate([
        jnp.concatenate([ia, zero], axis=2),
        jnp.concatenate([ib, ic], axis=2),
    ], axis=1)


def _block_diag_extract(l: jnp.ndarray, s: int) -> jnp.ndarray:
    """``[N, T, T] -> [N, T//s, s, s]`` diagonal s-blocks via a selection
    contraction (one streaming read of ``l``; jnp.diagonal-style element
    gathers measured ~1.9 ms on big banks — the diag_extract lesson)."""
    n, t, _ = l.shape
    c = t // s
    l5 = l.reshape(n, c, s, c, s)
    eye = jnp.eye(c, dtype=l.dtype)
    return jnp.einsum(
        "niajb,ij->niab", l5, eye,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def tri_inv_flat(l: jnp.ndarray) -> jnp.ndarray:
    """Batched lower-triangular inverse ``[N, T, T]`` with level-parallel
    merging — the production large-T path.

    1. ALL N * T/64 diagonal 64-blocks invert in ONE lane-batched kernel
       call (the serial substitution chain amortizes over every block of
       every matrix at once, instead of T/64 sequential calls padding a
       tiny N to 128 lanes);
    2. level k merges pairs of adjacent s-blocks (s = 64*2^k) with two
       batched HIGHEST MXU matmuls: ``ib = -ic @ B @ ia`` for all pairs
       of all matrices at once.

    T is identity-padded up to the next 64*2^k (the inverse of
    blockdiag(L, I) is blockdiag(L^{-1}, I), exact).
    """
    n, t, _ = l.shape
    if t <= MAX_NB:
        return tri_inv_small_batched(l)
    # pad T to 64 * 2^k
    t_pad = MAX_NB
    while t_pad < t:
        t_pad *= 2
    if t_pad != t:
        pad = t_pad - t
        diag_pad = (jnp.arange(t_pad) >= t).astype(jnp.float32)
        l = jnp.pad(l.astype(jnp.float32), ((0, 0), (0, pad), (0, pad)))
        l = l + jnp.eye(t_pad, dtype=jnp.float32) * diag_pad[None, None, :]
    else:
        l = l.astype(jnp.float32)

    c = t_pad // MAX_NB
    d = _block_diag_extract(l, MAX_NB)                 # [N, c, 64, 64]
    inv = tri_inv_small_batched(
        d.reshape(n * c, MAX_NB, MAX_NB)
    ).reshape(n, c, MAX_NB, MAX_NB)
    hi = jax.lax.Precision.HIGHEST
    s = MAX_NB
    while s < t_pad:
        pairs = t_pad // (2 * s)
        # off-diagonal s-block of each 2s diagonal block of l
        d2 = _block_diag_extract(l, 2 * s)             # [N, pairs, 2s, 2s]
        b = d2[:, :, s:, :s]
        ia = inv[:, 0::2]                              # [N, pairs, s, s]
        ic = inv[:, 1::2]
        ib = -jnp.einsum(
            "npij,npjk,npkl->npil", ic, b, ia,
            preferred_element_type=jnp.float32, precision=hi,
        )
        zero = jnp.zeros((n, pairs, s, s), jnp.float32)
        inv = jnp.concatenate([
            jnp.concatenate([ia, zero], axis=3),
            jnp.concatenate([ib, ic], axis=3),
        ], axis=2)                                     # [N, pairs, 2s, 2s]
        s *= 2
    return inv[:, 0, :t, :t]


def _flat_pad_overhead(t: int) -> float:
    """FLOP multiplier tri_inv_flat's next-64*2^k padding costs at ``t``
    (1.0 when t is already 64*2^k)."""
    t_pad = MAX_NB
    while t_pad < t:
        t_pad *= 2
    return (t_pad / t) ** 3


@jax.custom_vjp
def tri_inv(l: jnp.ndarray) -> jnp.ndarray:
    """Differentiable lower-triangular inverse ``[..., T, T]``.

    Forward: the lane-batched kernel for T <= 64, block recursion above
    (``tri_inv_blocked``).  Backward: the analytic rule
    ``d(L^{-1}) = -L^{-1} dL L^{-1}`` transposed, i.e.
    ``L_bar = -tril(X^T X_bar X^T)`` with ``X = L^{-1}`` — pure MXU matmuls.

    (A Newton refinement ``X <- X(2I - LX)`` was measured to give no
    accuracy improvement on jittered gram factors — the residual KL error
    vs fp64 is dominated by the fp32 factorization itself — so the forward
    is the raw kernel output.)
    """
    batch = l.shape[:-2]
    nb = l.shape[-1]
    flat = l.reshape((-1, nb, nb))
    if nb <= MAX_NB:
        x = tri_inv_small_batched(flat)
    elif _flat_pad_overhead(nb) <= 2.0:
        x = tri_inv_flat(flat.astype(jnp.float32))
    else:
        # tri_inv_flat identity-pads T to the next 64*2^k; far from a
        # power of two (e.g. T=1088 -> 2048) that multiplies the merge
        # FLOPs/memory by (t_pad/t)^3 ~ 6.7x, and the 64-aligned block
        # recursion is cheaper despite its sequential lane calls
        x = tri_inv_blocked(flat.astype(jnp.float32))
    return x.reshape(batch + (nb, nb))


def _tri_inv_fwd(l):
    x = tri_inv(l)
    return x, x


def _tri_inv_bwd(x, x_bar):
    xt = jnp.swapaxes(x, -1, -2)
    l_bar = -jnp.einsum(
        "...ij,...jk,...kl->...il", xt, x_bar, xt,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return (jnp.tril(l_bar),)


tri_inv.defvjp(_tri_inv_fwd, _tri_inv_bwd)


def tri_inv_small_batched(l: jnp.ndarray) -> jnp.ndarray:
    """Inverse of batched lower-triangular ``l [N, nb, nb]``, nb <= 64."""
    # interpret resolved outside the jit so the trace cache keys on it
    return _tri_inv_small_batched_jit(l, _interpret())


@functools.partial(jax.jit, static_argnames=("interpret",))
def _tri_inv_small_batched_jit(l: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    n, nb, nb2 = l.shape
    assert nb == nb2, l.shape
    if nb > MAX_NB:
        raise ValueError(f"nb={nb} > {MAX_NB}")
    nb_pad = max(_round_up(nb, 8), 8)
    lanes = LANES
    n_pad = _round_up(max(n, 1), lanes)
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
    g = n_pad // lanes
    lt = jnp.transpose(lp.reshape(g, lanes, nb_pad, nb_pad), (0, 2, 3, 1))
    out = pl.pallas_call(
        _tri_inv_kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((1, nb_pad, nb_pad, lanes), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nb_pad, nb_pad, lanes),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, nb_pad, nb_pad, lanes),
                                       jnp.float32),
        interpret=interpret,
    )(lt)
    x = jnp.transpose(out, (0, 3, 1, 2)).reshape(n_pad, nb_pad, nb_pad)
    return jnp.tril(x[:n, :nb, :nb])
