"""In-place left-looking blocked Cholesky — the large-T production path.

Round-3 redesign of the streamed left-looking factorization
(ops/chol.py::cholesky_blocked_left_streamed + ops/pallas_left.py), built
from the round-2 driver measurements: at T=1024 the old path was
HBM-dominated — a 537 MB zeros-init of L, a full x-panel temp + DUS round
trip per step, and `precision=HIGHEST` (6-pass bf16) on contractions that
measured 30 TF/s against the chip's 116 TF/s bf16 pipe.  Three changes:

* **nb=256 panels** — the left-looking history re-reads scale as
  ``sum_b (T-o)*o`` which halves going 128 -> 256 (704 -> 336 MB at
  T=1024 N=128);
* **compensated 3-pass bf16 dots** (``split dot``): each f32 operand is
  split ``x = hi + lo`` (bf16 hi, bf16 residual) and the product assembled
  as ``hi@hi + hi@lo + lo@hi`` with f32 accumulation — the same
  compensation family as XLA's HIGHEST (which uses 6 passes for ~1e-7;
  3 passes give ~1e-5 at depth 1024 for 2x the throughput, measured
  60 vs 30 TF/s).  The factor-level fp64 parity budget is documented and
  tested at 3e-5 for the large-T paths (tests/test_ops.py); the ELBO-level
  north-star tolerance is 1e-4 (BASELINE.md).
* **in-place column writeback** — the column block ``[Ld; X]`` is written
  straight into the L buffer through ``input_output_aliases`` (no x temp,
  no dynamic_update_slice copy), and L is born from ``pad(col0)`` so the
  upper-triangular zeros are settled in the same single pass that stores
  the first column block.

The diagonal-block factor+inverse stays on the lane-batched kernels via
``ops.chol.chol_and_inv`` (HIGHEST; its serial recurrence is the
accuracy-critical part and its cost is launch-bound, not FLOP-bound).

Replaces the reference's ``tf.cholesky`` at the T=1024 scale the reference
could not reach (src/old/GP_VAE_syn_data.py:226 — an abandoned
max_time=1000 attempt; SURVEY.md §5 long-context).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpvae_tpu.ops import dispatch

_SLAB_BYTES = 6 * 1024 * 1024

# Module switch for the compensated 3-pass bf16 contractions in the
# large-T blocked paths.  False -> precision=HIGHEST everywhere (the
# round-2 behavior); flipped only by tests and A/B harnesses.
FAST_DOTS = True


def _interpret() -> bool:
    return not dispatch.on_tpu()


def split_dot(a, b, dims, *, fast: bool | None = None):
    """``dot_general`` with compensated 3-pass bf16 accumulation.

    ``a``/``b`` f32; computes ``hi_a@hi_b + hi_a@lo_b + lo_a@hi_b`` with
    f32 accumulation (drops only the ``lo@lo`` term, ~2^-18 relative).
    Works inside Pallas kernels (plain bf16 dots — no DotAlgorithm
    lowering needed) and at the XLA level alike.  ``fast=False`` falls
    back to one HIGHEST-precision dot.
    """
    if fast is None:
        fast = FAST_DOTS
    if not fast:
        return jax.lax.dot_general(
            a, b, dims, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    a_hi = a.astype(jnp.bfloat16)
    b_hi = b.astype(jnp.bfloat16)
    a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def d(x, y):
        return jax.lax.dot_general(
            x, y, dims, preferred_element_type=jnp.float32,
        )

    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


# ---------------------------------------------------------------------------
# In-kernel diagonal-block factorization
# ---------------------------------------------------------------------------

_DIAG_EPS = 1e-20
_HI = jax.lax.Precision.HIGHEST


def _hi_dot(a, b, dims):
    return jax.lax.dot_general(
        a, b, dims, preferred_element_type=jnp.float32, precision=_HI,
    )


def _chol64_rows(a, want_inv, scr=None):
    """Batch-leading 64-wide Cholesky of symmetric PSD ``a [m, 64, 64]``.

    Returns ``(l, x)`` with ``l`` lower-triangular and ``x = L^{-1}`` (or
    None when ``want_inv`` is false).  Row-form recurrence for Mosaic
    friendliness: the trailing matrix stays symmetric under the rank-1
    downdate, so column j equals row j — every per-step read is a cheap
    static sublane (row) slice and the pivot element comes from a lane
    mask-reduce.  The downdate is an exact-fp32 VPU broadcast product (a
    ``dot_general`` here would round through bf16 at the MXU's DEFAULT
    precision — measured 3.5e-5 factor error on well-conditioned blocks,
    2.8e-2 on a T=256 gram bank).

    ``scr``: optional ``(d_scr, u_scr, x_scr)`` VMEM scratch refs, each
    ``[m, 64, 64]`` — REQUIRED inside real TPU kernels so per-column state
    lives in refs (64-deep value-carried chains overflow the Mosaic VMEM
    stack: measured 4.8 MB/matrix of scoped vmem).  Without ``scr`` the
    state is value-carried (CPU/interpret/unit-test path, same math).
    """
    m = a.shape[0]
    f32 = jnp.float32
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, 64, 1), 1)
    lanes3 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 64), 2)
    lane_r = jax.lax.broadcasted_iota(jnp.int32, (1, 64), 1)
    if scr is not None:
        d_scr, u_scr, x_scr = scr
        d_scr[...] = a
        u_scr[...] = jnp.zeros((m, 64, 64), f32)
        if want_inv:
            x_scr[...] = jnp.zeros((m, 64, 64), f32)
    else:
        a_v = a
        u_v = jnp.zeros((m, 64, 64), f32)
        x_v = jnp.zeros((m, 64, 64), f32) if want_inv else None
    for j in range(64):
        arow = d_scr[:, j, :] if scr is not None else a_v[:, j, :]  # [m,64]
        ajj = jnp.sum(jnp.where(lane_r == j, arow, 0.0), axis=1)  # [m]
        d = jax.lax.rsqrt(jnp.maximum(ajj, _DIAG_EPS))          # [m]
        urow = jnp.where(lane_r >= j, arow * d[:, None], 0.0)
        upd = urow[:, :, None] * urow[:, None, :]               # VPU, exact
        if scr is not None:
            u_scr[:, j, :] = urow
            d_scr[...] = d_scr[...] - upd
        else:
            u_v = jnp.where(rows == j, urow[:, None, :], u_v)
            a_v = a_v - upd
        if want_inv:
            # forward substitution row j of X = L^{-1}: L[j, k] = u[k, j]
            # (mask-reduce the lane-j column; X rows >= j are still zero,
            # so the unmasked contraction is exact)
            u = u_scr[...] if scr is not None else u_v
            x = x_scr[...] if scr is not None else x_v
            ucol = jnp.sum(jnp.where(lanes3 == j, u, 0.0), axis=2)  # [m,64]
            acc = jnp.sum(ucol[:, :, None] * x, axis=1)         # [m, 64]
            xrow = (jnp.where(lane_r == j, 1.0, 0.0) - acc) * d[:, None]
            if scr is not None:
                x_scr[:, j, :] = xrow
            else:
                x_v = jnp.where(rows == j, xrow[:, None, :], x_v)
    u = u_scr[...] if scr is not None else u_v
    l = jnp.transpose(u, (0, 2, 1))
    if not want_inv:
        return l, None
    return l, (x_scr[...] if scr is not None else x_v)


def _chol_inv_wide(a, nb, want_inv, scr=None):
    """``(L, L^{-1} or None)`` of symmetric PSD ``a [m, nb, nb]`` (nb a
    multiple of 64), batch-leading — for use INSIDE Pallas kernels.

    Right-looking over 64-wide sub-blocks: each diagonal sub-block runs
    the serial row-form recurrence (VPU), panels and trailing downdates
    are batched MXU dots at K=64, and the inverse assembles by block
    forward substitution.  This replaces the XLA-level
    ``ops.chol.chol_and_inv`` recursion whose ~10 small ops round-tripped
    every intermediate through HBM (measured 546 us at [512,128,128] —
    over half the whole T=256 bank factorization).
    """
    s_blocks = nb // 64
    assert nb % 64 == 0, nb
    if s_blocks == 1:
        return _chol64_rows(a, want_inv, scr)
    m = a.shape[0]
    f32 = jnp.float32
    lcols = []
    xdiag = []
    for s in range(s_blocks):
        o = 64 * s
        # the diagonal inverses are needed for the sub-panel solves even
        # when the caller only wants L (they stay internal then)
        need_x = want_inv or s < s_blocks - 1
        l64, x64 = _chol64_rows(a[:, o:o + 64, o:o + 64], need_x, scr)
        if s < s_blocks - 1:
            below = a[:, o + 64:, o:o + 64]                  # [m, R, 64]
            p = _hi_dot(below, x64, (((2,), (2,)), ((0,), (0,))))
            colb = jnp.concatenate([l64, p], axis=1)
            pfull = jnp.concatenate(
                [jnp.zeros((m, o + 64, 64), f32), p], axis=1
            )
            a = a - _hi_dot(pfull, pfull, (((2,), (2,)), ((0,), (0,))))
        else:
            colb = l64
        if o:
            colb = jnp.concatenate(
                [jnp.zeros((m, o, 64), f32), colb], axis=1
            )
        lcols.append(colb)
        xdiag.append(x64)
    l = jnp.concatenate(lcols, axis=2)                       # [m, nb, nb]
    if not want_inv:
        return l, None
    zero = jnp.zeros((m, 64, 64), f32)
    xblocks = [[zero] * s_blocks for _ in range(s_blocks)]
    for i in range(s_blocks):
        xblocks[i][i] = xdiag[i]
        for jc in range(i):
            acc = None
            for k in range(jc, i):
                lik = l[:, 64 * i:64 * i + 64, 64 * k:64 * k + 64]
                term = _hi_dot(
                    lik, xblocks[k][jc], (((2,), (1,)), ((0,), (0,)))
                )
                acc = term if acc is None else acc + term
            xblocks[i][jc] = -_hi_dot(
                xdiag[i], acc, (((2,), (1,)), ((0,), (0,)))
            )
    xrows = [
        jnp.concatenate(xblocks[i], axis=2) for i in range(s_blocks)
    ]
    return l, jnp.concatenate(xrows, axis=1)


# ---------------------------------------------------------------------------
# History-contraction panel kernel (left-looking)
# ---------------------------------------------------------------------------

def _hist_kernel(k_ref, hist_ref, row_ref, out_ref):
    upd = split_dot(
        hist_ref[...], row_ref[...], (((2,), (2,)), ((0,), (0,))),
    )
    out_ref[...] = k_ref[...] - upd


def _hist2_kernel(k_ref, hist_ref, row_ref, diag_ref, sub_ref):
    j = pl.program_id(1)
    upd = split_dot(
        hist_ref[...], row_ref[...], (((2,), (2,)), ((0,), (0,))),
    )
    panel = k_ref[...] - upd

    @pl.when(j == 0)
    def _():
        diag_ref[...] = panel

    @pl.when(j > 0)
    def _():
        sub_ref[...] = panel


def _hist_slab(o: int, n: int, nb: int) -> int:
    per_matrix = 4 * (2 * nb * o * 2 + 2 * nb * nb)
    m = max(1, _SLAB_BYTES // max(per_matrix, 1))
    while n % m != 0:
        m -= 1
    return m


@functools.partial(jax.jit, static_argnames=("block", "nb", "interpret"))
def _hist_panel_jit(l, k, block, nb, interpret):
    n, t, t_ = k.shape
    assert t == t_ and t % nb == 0 and 1 <= block < t // nb
    o = block * nb
    r = t - o
    m = _hist_slab(o, n, nb)
    out = pl.pallas_call(
        _hist_kernel,
        grid=(n // m, r // nb),
        in_specs=[
            pl.BlockSpec((m, nb, nb), lambda i, j, b=block: (i, b + j, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, nb, o), lambda i, j, b=block: (i, b + j, 0),
                         memory_space=pltpu.VMEM),
            # constant across j: stays resident
            pl.BlockSpec((m, nb, o), lambda i, j, b=block: (i, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, nb, nb), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, r, nb), jnp.float32),
        interpret=interpret,
    )(k.astype(jnp.float32), l, l)
    return out


def hist_panel(l, k, block: int, nb: int):
    """``K[:, o:, o:o+nb] - L[:, o:, :o] @ L[:, o:o+nb, :o]^T`` (o=block*nb),
    streamed with the subtraction fused; compensated bf16 dots."""
    return _hist_panel_jit(l, k, block, nb, _interpret())


@functools.partial(jax.jit, static_argnames=("block", "nb", "interpret"))
def _hist_panel2_jit(l, k, block, nb, interpret):
    n, t, t_ = k.shape
    assert t == t_ and t % nb == 0 and 1 <= block < t // nb
    o = block * nb
    r = t - o
    m = _hist_slab(o, n, nb)
    diag_spec = pl.BlockSpec((m, nb, nb), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    sub_spec = pl.BlockSpec(
        (m, nb, nb), lambda i, j: (i, jnp.maximum(j - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    diag, sub = pl.pallas_call(
        _hist2_kernel,
        grid=(n // m, r // nb),
        in_specs=[
            pl.BlockSpec((m, nb, nb), lambda i, j, b=block: (i, b + j, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, nb, o), lambda i, j, b=block: (i, b + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, nb, o), lambda i, j, b=block: (i, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(diag_spec, sub_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n, nb, nb), jnp.float32),
            jax.ShapeDtypeStruct((n, max(r - nb, nb), nb), jnp.float32),
        ),
        interpret=interpret,
    )(k.astype(jnp.float32), l, l)
    return diag, sub[:, : r - nb] if r - nb > 0 else sub[:, :0]


def hist_panel_split(l, k, block: int, nb: int):
    """Like :func:`hist_panel` but returns ``(diag [N, nb, nb],
    sub [N, R-nb, nb])`` as two outputs, so the diagonal-block
    factorization and the writeback consume them without the strided
    slice copies a single ``[N, R, nb]`` panel would force."""
    if _interpret():
        panel = hist_panel(l, k, block, nb)
        return panel[:, :nb], panel[:, nb:]
    return _hist_panel2_jit(l, k, block, nb, False)


# ---------------------------------------------------------------------------
# Diagonal extraction (logdet feeder)
# ---------------------------------------------------------------------------

def _diag_kernel(l_ref, out_ref):
    tile = l_ref[...]                                       # [m, nb, nb]
    nb = tile.shape[-1]
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (1, nb, nb), 1)
        == jax.lax.broadcasted_iota(jnp.int32, (1, nb, nb), 2)
    ).astype(jnp.float32)
    out_ref[...] = jnp.sum(tile * eye, axis=2)              # [m, nb]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _diag_extract_jit(l, interpret):
    n, t, _ = l.shape
    nb = 128
    m = max(1, min(n, (_SLAB_BYTES // 2) // (4 * nb * nb)))
    while n % m != 0:
        m -= 1
    return pl.pallas_call(
        _diag_kernel,
        grid=(n // m, t // nb),
        in_specs=[
            pl.BlockSpec((m, nb, nb), lambda i, j: (i, j, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, nb), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, t), jnp.float32),
        interpret=interpret,
    )(l.astype(jnp.float32))


@jax.custom_vjp
def diag_extract(l):
    """Main diagonal of batched ``l [N, T, T]`` -> ``[N, T]``.

    ``jnp.diagonal`` on a large factor is an element-strided gather —
    measured ~1.9 ms on a [128, 1024, 1024] bank (a third of the whole
    factorization!); this kernel reads only the T/128 diagonal TILES
    (67 MB instead of a 131k-element gather) and mask-reduces in VMEM.
    """
    n, t, t_ = l.shape
    assert t == t_
    if _interpret() or t % 128 != 0:
        return jnp.diagonal(l, axis1=-2, axis2=-1)
    return _diag_extract_jit(l, False)


def _diag_extract_fwd(l):
    return diag_extract(l), None


def _diag_extract_bwd(_, g):
    eye = jnp.eye(g.shape[-1], dtype=g.dtype)
    return (g[..., :, None] * eye,)


diag_extract.defvjp(_diag_extract_fwd, _diag_extract_bwd)


# ---------------------------------------------------------------------------
# Standalone one-launch batched wide Cholesky + inverse
# ---------------------------------------------------------------------------

def _make_chol_inv_kernel(nb: int, want_inv: bool):
    def kernel(d_ref, ld_ref, ldi_ref, d_scr, u_scr, x_scr):
        l, x = _chol_inv_wide(
            d_ref[...], nb, want_inv, (d_scr, u_scr, x_scr)
        )
        ld_ref[...] = l
        ldi_ref[...] = x if want_inv else jnp.zeros_like(l)

    return kernel


@functools.partial(jax.jit, static_argnames=("want_inv", "interpret"))
def _chol_inv_batched_jit(d, want_inv, interpret):
    n, nb, nb_ = d.shape
    assert nb == nb_ and nb % 64 == 0
    # in + 2 out + 3 recurrence scratch + ~6 live block values; m is also
    # hard-capped at 8 — the 128-deep unrolled recurrence at [16, 64, 64]
    # crashes the Mosaic compiler (subprocess exit 1), [8, 64, 64] is fine
    per_matrix = 4 * (3 * nb * nb + 3 * 64 * 64 + 6 * 64 * nb)
    m = max(1, min(n, 8, (_SLAB_BYTES * 2) // per_matrix))
    while n % m != 0:
        m -= 1
    spec = pl.BlockSpec((m, nb, nb), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    ld, ldi = pl.pallas_call(
        _make_chol_inv_kernel(nb, want_inv),
        grid=(n // m,),
        in_specs=[spec],
        out_specs=(spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct((n, nb, nb), jnp.float32),
            jax.ShapeDtypeStruct((n, nb, nb), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((m, 64, 64), jnp.float32),
            pltpu.VMEM((m, 64, 64), jnp.float32),
            pltpu.VMEM((m, 64, 64), jnp.float32),
        ],
        interpret=interpret,
    )(d.astype(jnp.float32))
    return ld, ldi


def chol_inv_batched(d, want_inv: bool = True):
    """One-pallas-call ``(L, L^{-1})`` of batched PSD ``d [N, nb, nb]``
    (nb a multiple of 64; use ``ops.chol.chol_and_inv`` for the general
    entry).  Replaces the XLA-level recursion whose ~10 small ops
    round-tripped every intermediate through HBM: measured 546 us ->
    in-kernel at [512, 128, 128].  ``want_inv=False`` skips the inverse
    recurrences (the factor-only last block step)."""
    if _interpret():
        from gpvae_tpu.ops import chol as chol_lib

        ld, ldi = chol_lib.chol_and_inv(d)
        if not want_inv:
            ldi = jnp.zeros_like(ld)
        return ld, ldi
    return _chol_inv_batched_jit(d, want_inv, False)


# ---------------------------------------------------------------------------
# Fused history + diagonal-factorization step kernel
# ---------------------------------------------------------------------------

def _make_hist_chol_kernel(nb: int, want_inv: bool):
    def kernel(k_ref, hist_ref, row_ref, ld_ref, ldi_ref, sub_ref,
               d_scr, u_scr, x_scr):
        j = pl.program_id(1)
        panel = k_ref[...] - split_dot(
            hist_ref[...], row_ref[...], (((2,), (2,)), ((0,), (0,))),
        )

        @pl.when(j == 0)
        def _():
            l, x = _chol_inv_wide(
                panel, nb, want_inv, (d_scr, u_scr, x_scr)
            )
            ld_ref[...] = l
            ldi_ref[...] = x if want_inv else jnp.zeros_like(l)

        @pl.when(j > 0)
        def _():
            sub_ref[...] = panel

    return kernel


@functools.partial(
    jax.jit, static_argnames=("block", "nb", "want_inv", "interpret")
)
def _hist_chol_jit(l, k, block, nb, want_inv, interpret):
    n, t, t_ = k.shape
    assert t == t_ and t % nb == 0 and 1 <= block < t // nb
    o = block * nb
    r = t - o
    # slab budget: hist/k/row tiles as in _hist_slab, plus ld/ldi outputs
    # and the recurrence temporaries (~6 more nb x nb values live at j=0)
    per_matrix = 4 * (2 * nb * o * 2 + 2 * nb * nb) + 4 * nb * nb * 8
    m = max(1, _SLAB_BYTES // max(per_matrix, 1))
    while n % m != 0:
        m -= 1
    pinned = pl.BlockSpec((m, nb, nb), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    sub_spec = pl.BlockSpec(
        (m, nb, nb), lambda i, j: (i, jnp.maximum(j - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    ld, ldi, sub = pl.pallas_call(
        _make_hist_chol_kernel(nb, want_inv),
        grid=(n // m, r // nb),
        in_specs=[
            pl.BlockSpec((m, nb, nb), lambda i, j, b=block: (i, b + j, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, nb, o), lambda i, j, b=block: (i, b + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, nb, o), lambda i, j, b=block: (i, b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pinned, pinned, sub_spec),
        out_shape=(
            jax.ShapeDtypeStruct((n, nb, nb), jnp.float32),
            jax.ShapeDtypeStruct((n, nb, nb), jnp.float32),
            jax.ShapeDtypeStruct((n, max(r - nb, nb), nb), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((m, 64, 64), jnp.float32),
            pltpu.VMEM((m, 64, 64), jnp.float32),
            pltpu.VMEM((m, 64, 64), jnp.float32),
        ],
        interpret=interpret,
    )(k.astype(jnp.float32), l, l)
    return ld, ldi, sub[:, : r - nb] if r - nb > 0 else sub[:, :0]


def hist_chol(l, k, block: int, nb: int, want_inv: bool = True):
    """One fused left-looking block step: the history-contracted panel's
    diagonal block is factored (and inverted) IN the kernel — ``(ld, ldi,
    sub)`` come out of a single pallas_call, eliminating the ~10-op XLA
    ``chol_and_inv`` glue whose HBM round trips dominated the per-step
    cost (243 us x 7 steps at T=1024 N=128)."""
    if _interpret():
        from gpvae_tpu.ops import chol as chol_lib

        diag, sub = hist_panel_split(l, k, block, nb)
        ld, ldi = chol_lib.chol_and_inv(diag)
        if not want_inv:
            ldi = jnp.zeros_like(ld)
        return ld, ldi, sub
    return _hist_chol_jit(l, k, block, nb, want_inv, False)


# ---------------------------------------------------------------------------
# L initialization kernel: zeros + column block 0 in one write pass
# ---------------------------------------------------------------------------

def _init_kernel(k_ref, ld_ref, ldi_ref, out_ref):
    c = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when((c == 0) & (j == 0))
    def _():
        out_ref[...] = ld_ref[...]

    @pl.when((c == 0) & (j > 0))
    def _():
        out_ref[...] = split_dot(
            k_ref[...], ldi_ref[...], (((2,), (2,)), ((0,), (0,))),
        )

    @pl.when(c > 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)


def _make_init_chol_kernel(nb: int):
    def kernel(k_ref, out_ref, ld_ref, ldi_ref, d_scr, u_scr, x_scr):
        c = pl.program_id(1)
        j = pl.program_id(2)

        @pl.when((c == 0) & (j == 0))
        def _():
            l, x = _chol_inv_wide(
                k_ref[...], nb, True, (d_scr, u_scr, x_scr)
            )
            ld_ref[...] = l
            ldi_ref[...] = x
            out_ref[...] = l

        @pl.when((c == 0) & (j > 0))
        def _():
            out_ref[...] = split_dot(
                k_ref[...], ldi_ref[...], (((2,), (2,)), ((0,), (0,))),
            )

        @pl.when(c > 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

    return kernel


@functools.partial(jax.jit, static_argnames=("nb", "interpret"))
def _init_l_chol_jit(k, nb, interpret):
    n, t, _ = k.shape
    m = _wb_slab(n, nb)
    nblk = t // nb
    out = pl.pallas_call(
        _make_init_chol_kernel(nb),
        # c (column block) middle, j (row tile) minor: slab i's first tile
        # is (c=0, j=0), where the leading diagonal block is factored and
        # inverted in-kernel into persistent scratch; the k fetch index is
        # pinned to (i, 0, 0) whenever c > 0 so the zero sweep re-reads
        # nothing
        grid=(n // m, nblk, nblk),
        in_specs=[
            pl.BlockSpec(
                (m, nb, nb),
                lambda i, c, j: (i, jnp.where(c == 0, j, 0), 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((m, nb, nb), lambda i, c, j: (i, j, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, t, t), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((m, nb, nb), jnp.float32),
            pltpu.VMEM((m, nb, nb), jnp.float32),
            pltpu.VMEM((m, 64, 64), jnp.float32),
            pltpu.VMEM((m, 64, 64), jnp.float32),
            pltpu.VMEM((m, 64, 64), jnp.float32),
        ],
        interpret=interpret,
    )(k.astype(jnp.float32))
    return out


def init_l_chol(k, nb: int):
    """:func:`init_l` with the leading-block factorization fused in: one
    kernel reads K, factors+inverts ``K[:, :nb, :nb]`` in scratch, and
    writes the full newborn L (zeros + column block 0) in a single pass —
    no XLA ``chol_and_inv`` launch at step 0."""
    if _interpret():
        from gpvae_tpu.ops import chol as chol_lib

        ld, ld_inv = chol_lib.chol_and_inv(k[:, :nb, :nb])
        return init_l(k, ld, ld_inv, nb)
    return _init_l_chol_jit(k, nb, False)


@functools.partial(jax.jit, static_argnames=("nb", "interpret"))
def _init_l_jit(k, ld, ld_inv, nb, interpret):
    n, t, _ = k.shape
    m = _wb_slab(n, nb)
    nblk = t // nb
    out = pl.pallas_call(
        _init_kernel,
        # c (column block) middle, j (row tile) minor: the k fetch index
        # is pinned to (i, 0, 0) whenever c > 0 so the zero sweep re-reads
        # nothing
        grid=(n // m, nblk, nblk),
        in_specs=[
            pl.BlockSpec(
                (m, nb, nb),
                lambda i, c, j: (i, jnp.where(c == 0, j, 0), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((m, nb, nb), lambda i, c, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, nb, nb), lambda i, c, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, nb, nb), lambda i, c, j: (i, j, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, t, t), jnp.float32),
        interpret=interpret,
    )(k.astype(jnp.float32), ld, ld_inv)
    return out


def init_l(k, ld, ld_inv, nb: int):
    """Materialize the newborn L: zeros everywhere except column block 0 =
    ``[Ld; K[:, nb:, :nb] @ Ld^{-T}]`` — one write pass over the [N, T, T]
    buffer (the round-2 paths paid a zeros-init AND a pad/concat copy)."""
    if _interpret():
        x0 = split_dot(
            k[:, nb:, :nb].astype(jnp.float32), ld_inv,
            (((2,), (2,)), ((0,), (0,))), fast=False,
        )
        col0 = jnp.concatenate([ld, x0], axis=1)
        return jnp.pad(col0, ((0, 0), (0, 0), (0, k.shape[1] - nb)))
    return _init_l_jit(k, ld, ld_inv, nb, False)


# ---------------------------------------------------------------------------
# In-place column writeback kernel
# ---------------------------------------------------------------------------

def _wb_kernel(l_in_ref, ld_ref, ldi_ref, panel_ref, out_ref):
    del l_in_ref  # aliased with out; never read
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[...] = ld_ref[...]

    @pl.when(j > 0)
    def _():
        out_ref[...] = split_dot(
            panel_ref[...], ldi_ref[...], (((2,), (2,)), ((0,), (0,))),
        )


def _wb_slab(n: int, nb: int) -> int:
    per_matrix = 4 * nb * nb * 6  # panel + ld + ldi + out, double-buffered
    m = max(1, _SLAB_BYTES // per_matrix)
    while n % m != 0:
        m -= 1
    return m


@functools.partial(jax.jit, static_argnames=("block", "nb", "interpret"),
                   donate_argnums=(0,))
def _writeback_jit(l, ld, ld_inv, panel_sub, block, nb, interpret):
    n, t, t_ = l.shape
    o = block * nb
    r = t - o
    assert panel_sub.shape == (n, r - nb, nb), (panel_sub.shape, r, nb)
    m = _wb_slab(n, nb)
    bidx = o // nb
    # panel_sub row tile for grid j >= 1 is rows (j-1)*nb; the j=0 map
    # also reads tile 0 (discarded by pl.when) to keep the spec total.
    out = pl.pallas_call(
        _wb_kernel,
        grid=(n // m, r // nb),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # aliased L, unread
            pl.BlockSpec((m, nb, nb), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, nb, nb), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, nb, nb),
                         lambda i, j: (i, jnp.maximum(j - 1, 0), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((m, nb, nb),
                               lambda i, j, b=bidx: (i, b + j, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, t, t), jnp.float32),
        input_output_aliases={0: 0},
        interpret=interpret,
    )(l, ld, ld_inv, panel_sub)
    return out


def col_writeback(l, ld, ld_inv, panel_sub, block: int, nb: int):
    """Write column block ``[Ld; panel_sub @ Ld^{-T}]`` into ``l`` at
    ``(o, o)`` in place (aliased output; the rest of ``l`` is untouched)."""
    if _interpret():
        # CPU/interpret fallback: same math, dynamic_update_slice instead
        # of the aliased kernel (pltpu.ANY specs are TPU-only)
        x = split_dot(
            panel_sub, ld_inv, (((2,), (2,)), ((0,), (0,))), fast=False,
        )
        col = jnp.concatenate([ld, x], axis=1)
        return jax.lax.dynamic_update_slice(
            l, col, (0, block * nb, block * nb)
        )
    return _writeback_jit(l, ld, ld_inv, panel_sub, block, nb, False)


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def cholesky_inplace(k: jnp.ndarray, nb: int = 256) -> jnp.ndarray:
    """Left-looking blocked batched Cholesky of ``k [N, T, T]``, in-place
    column writes, compensated bf16 contractions.  T padded to a multiple
    of ``nb`` (identity padding)."""
    from gpvae_tpu.ops import chol as chol_lib

    n, t, _ = k.shape
    num_blocks = -(-t // nb)
    t_pad = num_blocks * nb
    if t_pad != t:
        pad = t_pad - t
        k = jnp.pad(k, ((0, 0), (0, pad), (0, pad)))
        diag_pad = (jnp.arange(t_pad) >= t).astype(k.dtype)
        k = k + jnp.eye(t_pad, dtype=k.dtype) * diag_pad[None, None, :]
    k = k.astype(jnp.float32)

    if num_blocks == 1:
        ld, _ = chol_lib.chol_and_inv(k[:, :nb, :nb])
        return ld[:, :t, :t]
    # step 0: give birth to L in one write pass (zeros + column block 0
    # fused in init_l) — the round-2 paths paid a 537 MB zeros-init AND a
    # pad/concat copy at T=1024.  The diagonal blocks stay on the
    # lane-layout chol_and_inv: an in-kernel batch-leading recurrence was
    # measured 7.5x SLOWER (m <= 8 slabs are relayout-bound on the VPU).
    ld, ld_inv = chol_lib.chol_and_inv(k[:, :nb, :nb])
    l = init_l(k, ld, ld_inv, nb)
    for b in range(1, num_blocks):
        if b == num_blocks - 1:
            # single diag block left: no sub-panel, no writeback kernel
            diag = hist_panel(l, k, b, nb)
            ld, _ = chol_lib.chol_and_inv(diag[:, :nb])
            l = _writeback_diag_only(l, ld, b, nb)
        else:
            diag, sub = hist_panel_split(l, k, b, nb)
            ld, ldi = chol_lib.chol_and_inv(diag)
            l = col_writeback(l, ld, ldi, sub, b, nb)
    return l[:, :t, :t]


@functools.partial(jax.jit, static_argnames=("block", "nb"),
                   donate_argnums=(0,))
def _writeback_diag_only(l, ld, block, nb):
    o = block * nb
    return jax.lax.dynamic_update_slice(l, ld, (0, o, o))
