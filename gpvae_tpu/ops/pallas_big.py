"""In-place left-looking blocked Cholesky — the large-T production path.

Round-3 design, driven by saturated device-looped measurements (see
docs/DESIGN.md "round 3"):

* **in-place column writeback** — the column block ``[Ld; X]`` is written
  straight into the L buffer through ``input_output_aliases`` (no x temp,
  no dynamic_update_slice copy); in the fused-gram flow L is born writing
  only the (0, 0) tile and the upper-triangle zeros (``_init0_parts_jit``)
  and column 0 itself rides the b=1 deferred kernel (``_gram_defer1_jit``);
* **fused gram construction** (``cholesky_gram_inplace``) — every K tile
  is built in-kernel from the O(N*T) time vectors with exact
  ``kernels.gram`` semantics, so the [N, T, T] gram never exists in HBM:
  at T=1024 N=128 this deletes a 537 MB gram write and a 537 MB K read
  (measured 6.39 -> 4.39 ms when introduced; the op now runs at
  ~13 TF/s after the round-3c parts flow — BASELINE.md);
* **slice materialization + Pallas diagonal extraction** — see
  ``ops/chol.py::chol_and_inv`` and ``diag_extract`` below for the two
  systemic HBM pathologies this path dodges.

The diagonal blocks stay on the lane-layout ``ops.chol.chol_and_inv``
(XLA recursion over the 64-wide lane kernels).  Round-3 measured dead
ends, so nobody re-walks them: (a) an in-kernel batch-leading 64-wide
recurrence (row-form, scratch-ref state) ran 7.5x SLOWER than the XLA
recursion — at the m <= 8 matrices/slab that VMEM permits, every
per-column op is relayout-bound on the VPU, while the lane layout
amortizes one serial chain over 128 co-resident matrices; (b) m = 16
slabs crash the Mosaic compiler on the 128-deep unrolled chain; (c)
``split_dot`` 3-pass bf16 contractions buy only ~4% end-to-end (the
history contraction is HBM-bound) while costing 200x factor accuracy on
strongly-correlated grams, so ``FAST_DOTS`` defaults to False.

Replaces the reference's ``tf.cholesky`` at the T=1024 scale the reference
could not reach (src/old/GP_VAE_syn_data.py:226 — an abandoned
max_time=1000 attempt; SURVEY.md §5 long-context).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpvae_tpu.ops import dispatch

# Slab budget for the history/defer kernels' per-grid-step VMEM footprint.
# Measured optimum: raising to 24 MB (m=8 at T=1024's widest history) LOST
# ~8% at T=1024 and ~35% at T=256 — fewer, fatter grid steps pipeline worse
# than many small double-buffered ones.  The init kernels use their own
# larger budget (_INIT_SLAB_BYTES), where it measured 3x the other way.
# Env overrides are for A/B tuning only (jit caches do not re-key on them;
# set in a fresh process).
_SLAB_BYTES = int(os.environ.get("GPVAE_HIST_SLAB_MB", "6")) * 1024 * 1024

# Module switch for the compensated 3-pass bf16 contractions in the
# large-T blocked paths.  False -> precision=HIGHEST everywhere.
# Measured on the round-3 chip: the fast dots buy only 4% end-to-end at
# T=1024 (5.23 vs 5.44 ms — the history contraction is HBM-, not
# MXU-bound) while costing 200x factor accuracy on strongly-correlated
# grams (1.8e-3 vs 9e-6 relative at lengthscale T/10).  HIGHEST is the
# default; True is for A/B harnesses only.
FAST_DOTS = False


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

def _diag_slab(n: int) -> int | None:
    """Batch slab for the diagonal-tile kernel.  The [m, nb] out block
    puts m on the SUBLANE axis, so Mosaic requires m divisible by 8
    unless the block spans the whole array (m == n) — e.g. N = 170 must
    not pick its divisor 34.  Returns None when no valid slab exists
    within the budget (callers fall back to the jnp.diagonal gather)."""
    nb = 128
    budget = max(1, (_SLAB_BYTES // 2) // (4 * nb * nb))
    best = None
    for m in range(8, min(n, budget) + 1, 8):
        if n % m == 0:
            best = m
    if best is not None:
        return best
    if n <= budget:  # odd-divisor batch small enough for one block
        return n
    return None


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
    m = _diag_slab(n)
    assert m is not None, (
        f"no Mosaic-legal batch slab for N={n}; use diag_extract (it falls "
        f"back to the jnp.diagonal gather)"
    )
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
    if _interpret() or t % 128 != 0 or _diag_slab(n) is None:
        return jnp.diagonal(l, axis1=-2, axis2=-1)
    return _diag_extract_jit(l, False)


def _diag_extract_fwd(l):
    return diag_extract(l), None


def _diag_extract_bwd(_, g):
    eye = jnp.eye(g.shape[-1], dtype=g.dtype)
    return (g[..., :, None] * eye,)


diag_extract.defvjp(_diag_extract_fwd, _diag_extract_bwd)


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


# L-init kernels: per-step footprint is small (a handful of nb x nb tiles),
# so a much larger slab than the hist kernels' is both safe and necessary —
# at m=8 the init pass measured 337 GB/s (grid-step overhead bound); bigger
# slabs cut the grid-step count ~8x.
_INIT_SLAB_BYTES = (
    int(os.environ.get("GPVAE_INIT_SLAB_MB", "24")) * 1024 * 1024
)


def _init_slab(n: int, nb: int) -> int:
    per_matrix = 4 * nb * nb * 8  # out + k + ld + ldi, double-buffered
    m = max(1, _INIT_SLAB_BYTES // per_matrix)
    while n % m != 0:
        m -= 1
    return m


def _init_vmem_params(m: int, nb: int) -> pltpu.CompilerParams:
    need = 4 * m * nb * nb * 8 + 512 * 1024
    return pltpu.CompilerParams(
        vmem_limit_bytes=max(16 * 1024 * 1024, int(need * 1.25)),
    )


def _init_out_map(nblk: int):
    """Out index map that skips the strictly-lower-or-diagonal tiles of
    columns > 0: every such tile is later overwritten (column c's lower
    tiles by the deferred writeback at step c+1 / col_writeback, diag
    tiles by ``_writeback_diag_only``), so writing their zeros is pure
    wasted HBM bandwidth (~1/3 of the pass at T=1024).  Skipped grid steps
    are redirected to the last diagonal tile — a sacrificial target that
    the final diag writeback overwrites — and consecutive skips coalesce
    into one flush (the out index only changes on real tiles)."""
    q = nblk - 1

    def out_map(i, c, j):
        skip = (c > 0) & (j >= c)
        return (i, jnp.where(skip, q, j), jnp.where(skip, q, c))

    return out_map


@functools.partial(jax.jit, static_argnames=("nb", "interpret"))
def _init_l_jit(k, ld, ld_inv, nb, interpret):
    n, t, _ = k.shape
    m = _init_slab(n, nb)
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
        out_specs=pl.BlockSpec((m, nb, nb), _init_out_map(nblk),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, t, t), jnp.float32),
        compiler_params=_init_vmem_params(m, nb),
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
            pl.BlockSpec(memory_space=pl.ANY),  # aliased L, unread
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
# Fused-gram variants: K tiles built in-kernel from the time vectors
# ---------------------------------------------------------------------------

def _gram_tile(tr, tc, mr, mc, ls, var, noise, kfn, is_diag):
    """Gram tile ``[m, nb, nb]`` for row-times ``tr [m, nb]`` x col-times
    ``tc [m, nb]`` with masks ``mr``/``mc`` and per-matrix ``ls``/``var``
    ``[m, 1]`` — exactly :func:`gpvae_tpu.kernels.gram` semantics
    ``((1-noise)*var*k(dt) + noise*I) masked-to-identity``; the identity
    terms exist only on diagonal tiles (``is_diag``)."""
    f32 = jnp.float32
    dt = tr[:, :, None] - tc[:, None, :]
    k = (1.0 - noise) * (var[:, :, None] * kfn(dt, ls[:, :, None]))
    k = k * (mr[:, :, None] * mc[:, None, :])
    nb = tr.shape[-1]
    eye = (
        jax.lax.broadcasted_iota(jnp.int32, (1, nb, nb), 1)
        == jax.lax.broadcasted_iota(jnp.int32, (1, nb, nb), 2)
    ).astype(f32)
    # on the diagonal: noise*I*m_i + (1 - m_i)*I = I*(1 - m_i*(1-noise))
    diag_term = eye * (1.0 - mr[:, :, None] * (1.0 - noise))
    return k + jnp.where(is_diag, f32(1.0), f32(0.0)) * diag_term


def _round_up8(n: int) -> int:
    return ((n + 7) // 8) * 8


def _slab8(n: int, budget_m: int) -> int:
    """Largest multiple-of-8 divisor of ``n`` (callers pad n to 8k) that is
    <= budget — the 2D time/mask tiles put the batch on the SUBLANE axis,
    so Mosaic requires the block's m divisible by 8."""
    assert n % 8 == 0, n
    m = max(8, (min(budget_m, n) // 8) * 8)
    while n % m != 0:
        m -= 8
    return m


def _vmem_params(m: int, nb: int, o: int) -> pltpu.CompilerParams:
    """Raised scoped-VMEM limit for the fused-gram kernels.

    ``_slab8`` must keep the batch slab a multiple of 8 (the time/mask
    tiles put the batch on the sublane axis), so at large history widths
    ``o`` the forced m=8 can exceed the 6 MB ``_SLAB_BYTES`` budget —
    at T=1024, block 7 (o=896) needs ~16.05 MB, 48 KB past the default
    16 MB scoped limit.  Size the limit from the actual double-buffered
    block footprints plus 25% headroom (v5e has 128 MB VMEM)."""
    hist_row = 3 * nb * o              # hist double-buffered + row scratch
    tiles = 14 * nb * nb               # sub/ldi/col/diag/subo/cbrow + values
    need = 4 * m * (hist_row + tiles) + 512 * 1024
    return pltpu.CompilerParams(
        vmem_limit_bytes=max(16 * 1024 * 1024, int(need * 1.25)),
    )


# ---------------------------------------------------------------------------
# Deferred-column history kernels
# ---------------------------------------------------------------------------
#
# The round-2 flow paid a full extra pass per column block: hist wrote the
# raw panel ``sub`` to HBM, then ``col_writeback`` RE-READ it, applied the
# diagonal block's ``ldi``, and wrote the final column.  But the transform
# can ride the NEXT step's history kernel instead: step ``b`` needs column
# block ``b-1`` as part of its history anyway, so it reads ``sub_prev``
# (same bytes it would have read from L), applies ``ldi_prev`` on the MXU
# in-register, uses the result for the history correction, and writes it
# into L through ``input_output_aliases`` — the separate writeback pass
# (and its ~350 MB sub re-read at T=1024 N=128) disappears.  The diagonal
# block itself goes in via the tiny ``_writeback_diag_only`` DUS.

def _make_defer_kernel(kfn, noise, with_gram: bool, with_sub: bool = True):
    """Deferred-column hist kernel for step b >= 2 (o' = (b-1)*nb history
    columns finalized in L; column block b-1 arrives as ``sub_prev``).

    Grid ``(i, j)``; row tile j covers absolute rows ``(b+j)*nb``.  Every
    iteration: ``colb = sub_prev[j] @ ldi_prev^T`` (the final column tile,
    written to L at column block b-1), then
    ``panel = K_tile - hist_L @ row_L^T - colb @ colb_row^T``
    (j = 0 -> diag of block b, j > 0 -> raw sub of block b).
    ``colb_row`` (the column's row block) is exactly the j = 0 ``colb``:
    it is latched into persistent VMEM scratch at j = 0 rather than
    precomputed at the XLA level — an XLA-level [N, nb, nb] batched
    matmul measured ~120 us at N=128 from dispatch + HBM round-trip
    alone, once per block step.
    """
    def kernel(*refs):
        if with_gram:
            (tr_ref, tc_ref, mr_ref, mc_ref, ls_ref, var_ref,
             sub_ref, i11_ref, i21_ref, i22_ref, hist_ref,
             *rest) = refs
        else:
            (k_ref, sub_ref, i11_ref, i21_ref, i22_ref, hist_ref,
             *rest) = refs
        if with_sub:
            col_ref, diag_ref, subo_ref, row_scr, cbrow_scr, ldi_scr = rest
        else:
            # final block step (r == nb): the raw-sub output would be a
            # never-written dummy whose [N, nb, nb] buffer Pallas still
            # flushes to HBM — drop it from the signature instead
            col_ref, diag_ref, row_scr, cbrow_scr, ldi_scr = rest
        j = pl.program_id(1)

        # the history ROW block (rows of the diag tile) is exactly the j=0
        # hist tile: latch it into persistent VMEM scratch (grid iterates
        # j minor; scratch persists across grid steps) so the donated l
        # needs no second (copy-forcing) input use
        @pl.when(j == 0)
        def _():
            row_scr[...] = hist_ref[...]

        # the previous block's inverse arrives as half-block parts (its
        # [N, nb, nb] form is never written to HBM — see chol_inv_parts);
        # assemble it once per matrix slab into persistent scratch
        @pl.when(j == 0)
        def _():
            zero = jnp.zeros_like(i11_ref[...])
            ldi_scr[...] = jnp.concatenate([
                jnp.concatenate([i11_ref[...], zero], axis=2),
                jnp.concatenate([i21_ref[...], i22_ref[...]], axis=2),
            ], axis=1)

        colb = split_dot(
            sub_ref[...], ldi_scr[...], (((2,), (2,)), ((0,), (0,))),
        )
        col_ref[...] = colb

        # j=0's colb IS the column's row block: latch it (reading the
        # scratch back immediately below is well-defined in-kernel)
        @pl.when(j == 0)
        def _():
            cbrow_scr[...] = colb

        if with_gram:
            ktile = _gram_tile(
                tr_ref[...], tc_ref[...], mr_ref[...], mc_ref[...],
                ls_ref[:, :1], var_ref[:, :1], noise, kfn, j == 0,
            )
        else:
            ktile = k_ref[...]
        panel = (
            ktile
            - split_dot(
                hist_ref[...], row_scr[...], (((2,), (2,)), ((0,), (0,))),
            )
            - split_dot(
                colb, cbrow_scr[...], (((2,), (2,)), ((0,), (0,))),
            )
        )

        @pl.when(j == 0)
        def _():
            diag_ref[...] = panel

        if with_sub:
            @pl.when(j > 0)
            def _():
                subo_ref[...] = panel

    return kernel


def _defer_slab(o: int, n: int, nb: int) -> int:
    # hist double-buffered + resident row (width o) + 8 nb x nb buffers
    # (incl. the assembled-inverse scratch; the three half parts together
    # count as one)
    per_matrix = 4 * (3 * nb * o + 8 * nb * nb)
    m = max(1, _SLAB_BYTES // max(per_matrix, 1))
    while n % m != 0:
        m -= 1
    return m


@functools.partial(
    jax.jit,
    static_argnames=("block", "nb", "kernel", "noise", "interpret"),
    donate_argnums=(0,),
)
def _gram_hist2_defer_jit(l, times, mask, ls, var, sub_prev,
                          i11_prev, i21_prev, i22_prev,
                          block, nb, kernel, noise, interpret):
    from gpvae_tpu import kernels as kernels_lib

    n, t = times.shape
    assert t % nb == 0 and 2 <= block < t // nb
    o = (block - 1) * nb              # finalized history width in L
    r = t - block * nb                # rows of this panel (and of sub_prev)
    h = nb // 2
    assert sub_prev.shape[1] >= r, (sub_prev.shape, r)
    assert i11_prev.shape[-1] == h, (i11_prev.shape, h)
    m = _slab8(n, _defer_slab(o + nb, n, nb))
    kfn = kernels_lib.get_kernel(kernel)
    b = block
    vec = pl.BlockSpec((m, nb), lambda i, j: (i, b + j))
    vec0 = pl.BlockSpec((m, nb), lambda i, j: (i, b))
    par = pl.BlockSpec((m, 128), lambda i, j: (i, 0))
    tile = pl.BlockSpec((m, nb, nb), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)
    pinned = pl.BlockSpec((m, nb, nb), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    pinned_h = pl.BlockSpec((m, h, h), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((m, nb, nb), lambda i, j: (i, b + j, b - 1),
                            memory_space=pltpu.VMEM)
    subo_spec = pl.BlockSpec(
        (m, nb, nb), lambda i, j: (i, jnp.maximum(j - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        vec, vec0, vec, vec0, par, par,
        tile,                                     # sub_prev row tile j
        pinned_h, pinned_h, pinned_h,             # ldi_prev half parts
        pl.BlockSpec((m, nb, o), lambda i, j: (i, b + j, 0),
                     memory_space=pltpu.VMEM),    # hist_L
    ]
    with_sub = r > nb
    out_specs = (col_spec, pinned) + ((subo_spec,) if with_sub else ())
    out_shape = (
        jax.ShapeDtypeStruct((n, t, t), jnp.float32),
        jax.ShapeDtypeStruct((n, nb, nb), jnp.float32),
    ) + ((jax.ShapeDtypeStruct((n, r - nb, nb), jnp.float32),)
         if with_sub else ())
    out = pl.pallas_call(
        _make_defer_kernel(kfn, noise, with_gram=True, with_sub=with_sub),
        grid=(n // m, r // nb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases={10: 0},  # l (hist input) -> column-updated l
        scratch_shapes=[pltpu.VMEM((m, nb, o), jnp.float32),
                        pltpu.VMEM((m, nb, nb), jnp.float32),
                        pltpu.VMEM((m, nb, nb), jnp.float32)],
        compiler_params=_vmem_params(m, nb, o + nb),
        interpret=interpret,
    )(times, times, mask, mask, ls, var,
      sub_prev[:, :r], i11_prev, i21_prev, i22_prev, l)
    if with_sub:
        return out
    return out[0], out[1], jnp.zeros((n, 0, nb), jnp.float32)


@functools.partial(
    jax.jit, static_argnames=("block", "nb", "interpret"),
    donate_argnums=(0,),
)
def _hist2_defer_jit(l, k, sub_prev, i11_prev, i21_prev, i22_prev,
                     block, nb, interpret):
    n, t, t_ = k.shape
    assert t == t_ and t % nb == 0 and 2 <= block < t // nb
    o = (block - 1) * nb
    r = t - block * nb
    h = nb // 2
    assert i11_prev.shape[-1] == h, (i11_prev.shape, h)
    m = _defer_slab(o + nb, n, nb)
    b = block
    tile = pl.BlockSpec((m, nb, nb), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)
    pinned = pl.BlockSpec((m, nb, nb), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    pinned_h = pl.BlockSpec((m, h, h), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((m, nb, nb), lambda i, j: (i, b + j, b - 1),
                            memory_space=pltpu.VMEM)
    subo_spec = pl.BlockSpec(
        (m, nb, nb), lambda i, j: (i, jnp.maximum(j - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        pl.BlockSpec((m, nb, nb), lambda i, j: (i, b + j, b),
                     memory_space=pltpu.VMEM),    # K tile
        tile, pinned_h, pinned_h, pinned_h,
        pl.BlockSpec((m, nb, o), lambda i, j: (i, b + j, 0),
                     memory_space=pltpu.VMEM),    # hist_L
    ]
    with_sub = r > nb
    out_specs = (col_spec, pinned) + ((subo_spec,) if with_sub else ())
    out_shape = (
        jax.ShapeDtypeStruct((n, t, t), jnp.float32),
        jax.ShapeDtypeStruct((n, nb, nb), jnp.float32),
    ) + ((jax.ShapeDtypeStruct((n, r - nb, nb), jnp.float32),)
         if with_sub else ())
    out = pl.pallas_call(
        _make_defer_kernel(None, 0.0, with_gram=False, with_sub=with_sub),
        grid=(n // m, r // nb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases={5: 0},
        scratch_shapes=[pltpu.VMEM((m, nb, o), jnp.float32),
                        pltpu.VMEM((m, nb, nb), jnp.float32),
                        pltpu.VMEM((m, nb, nb), jnp.float32)],
        compiler_params=_vmem_params(m, nb, o + nb),
        interpret=interpret,
    )(k.astype(jnp.float32), sub_prev[:, :r],
      i11_prev, i21_prev, i22_prev, l)
    if with_sub:
        return out
    return out[0], out[1], jnp.zeros((n, 0, nb), jnp.float32)


def _init0_parts_kernel(rmap_ref, cmap_ref, l11_ref, a21_ref, l22_ref,
                        out_ref):
    """Upper-zeros + L[0:nb, 0:nb] init, assembled in-kernel from the
    half-block parts: column 0's sub-diagonal tiles are NOT written here —
    they ride the b=1 deferred kernel (``_gram_defer1_jit``) exactly like
    every later column rides step b+1.  The scalar-prefetched (row, col)
    maps enumerate ONLY the real tiles (the (0, 0) diagonal + the
    strictly-upper zeros), so unlike the old sacrificial-redirect grid no
    wasted tile flushes happen at all (~2x the useful bytes at nblk=2)."""
    del rmap_ref, cmap_ref
    u = pl.program_id(1)

    @pl.when(u == 0)
    def _():
        zero = jnp.zeros_like(l11_ref[...])
        out_ref[...] = jnp.concatenate([
            jnp.concatenate([l11_ref[...], zero], axis=2),
            jnp.concatenate([a21_ref[...], l22_ref[...]], axis=2),
        ], axis=1)

    @pl.when(u > 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)


@functools.partial(
    jax.jit, static_argnames=("t", "nb", "interpret", "zero_upper")
)
def _init0_parts_jit(l11, a21, l22, t, nb, interpret, zero_upper=True):
    import numpy as np

    n = l11.shape[0]
    h = nb // 2
    nblk = t // nb
    if interpret:
        zero = jnp.zeros((n, h, h), jnp.float32)
        ld = jnp.concatenate([
            jnp.concatenate([l11, zero], axis=2),
            jnp.concatenate([a21, l22], axis=2),
        ], axis=1)
        return jnp.pad(ld, ((0, 0), (0, t - nb), (0, t - nb)))
    # tile list: u=0 -> (0, 0) diag; then the strictly-upper (j < c) zeros.
    # zero_upper=False skips the latter — the strictly-upper TILES of the
    # output are then undefined (lower-only contract: every production
    # consumer of this op class reads only diagonal/lower tiles — logdet
    # diag extraction, tri_inv_flat levels, trsm, the VJP triple product;
    # zero the upper explicitly before any dense-matmul consumer like the
    # sampling einsum).  At T=1024 N=128 the skipped write is ~235 MB
    # (~0.4 ms of a 3.54 ms op) — the roofline lever of VERDICT r4 #3.
    rows, cols = [0], [0]
    for c in range(1, nblk if zero_upper else 0):
        for j in range(c):
            rows.append(j)
            cols.append(c)
    u_total = len(rows)
    rmap = jnp.asarray(np.asarray(rows, np.int32))
    cmap = jnp.asarray(np.asarray(cols, np.int32))
    # the old 4-full-tile slab estimate (_init_slab) deliberately kept:
    # sizing m from this kernel's true (smaller) footprint quadruples the
    # block to ~8 MB and measured ~6% slower — fat write blocks pipeline
    # worse than many double-buffered ones (same lesson as the hist slabs)
    m = _slab8(n, _init_slab(n, nb))
    half = pl.BlockSpec((m, h, h), lambda i, u, rm, cm: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n // m, u_total),
        in_specs=[half, half, half],
        out_specs=pl.BlockSpec(
            (m, nb, nb), lambda i, u, rm, cm: (i, rm[u], cm[u]),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        _init0_parts_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, t, t), jnp.float32),
        compiler_params=_init_vmem_params(m, nb),
        interpret=interpret,
    )(rmap, cmap, l11, a21, l22)


def _make_gram_schur_kernel(kfn, noise):
    """Schur step of the 128-wide k00 recursion with the gram built
    in-kernel: K21/K22 tiles come from the time vectors (so the
    [N, 128, 128] k00 gram never exists in HBM), then
    ``a21 = K21 i11^T``, ``s22 = K22 - a21 a21^T`` — the same arithmetic
    as ``pallas_chol._schur64_kernel`` on an XLA-built gram."""
    def kernel(t_ref, m_ref, ls_ref, var_ref, i11_ref, a21_ref, s22_ref):
        # Mosaic wants 128-wide (or full) 2D blocks: the [m, 128] time/mask
        # rows arrive whole and the 64-halves are static value slices
        tr, tc = t_ref[:, 64:], t_ref[:, :64]
        mr, mc = m_ref[:, 64:], m_ref[:, :64]
        k21 = _gram_tile(
            tr, tc, mr, mc,
            ls_ref[:, :1], var_ref[:, :1], noise, kfn, False,
        )
        a21 = split_dot(
            k21, i11_ref[...], (((2,), (2,)), ((0,), (0,))),
        )
        a21_ref[...] = a21
        k22 = _gram_tile(
            tr, tr, mr, mr,
            ls_ref[:, :1], var_ref[:, :1], noise, kfn, True,
        )
        s22_ref[...] = k22 - split_dot(
            a21, a21, (((2,), (2,)), ((0,), (0,))),
        )

    return kernel


@functools.partial(
    jax.jit, static_argnames=("kernel", "noise", "interpret")
)
def _gram_schur64_jit(times, mask, ls, var, i11, kernel, noise, interpret):
    from gpvae_tpu import kernels as kernels_lib

    n, t = times.shape
    assert t == 128 and i11.shape[-1] == 64
    kfn = kernels_lib.get_kernel(kernel)
    m = _slab8(n, 32)
    par = pl.BlockSpec((m, 128), lambda i: (i, 0))
    half = pl.BlockSpec((m, 64, 64), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_gram_schur_kernel(kfn, noise),
        grid=(n // m,),
        in_specs=[par, par, par, par, half],
        out_specs=(half, half),
        out_shape=(
            jax.ShapeDtypeStruct((n, 64, 64), jnp.float32),
            jax.ShapeDtypeStruct((n, 64, 64), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(
                16 * 1024 * 1024, int(4 * m * (8 * 64 * 64) * 2)
            ),
        ),
        interpret=interpret,
    )(times, mask, ls, var, i11)


def gram_chol_inv_128_parts(times, mask, ls, var, kernel="rbf",
                            noise: float = 1e-3):
    """Half-block parts ``(l11, a21, l22, i11, i21, i22)`` of the first
    128-wide diagonal block's (L, L^{-1}) with the gram built entirely
    in-kernel: the lane pass factors+inverts the (0, 0) 64-quadrant from
    the time vectors (``pallas_chol.gram_chol_inv_small``), the Schur
    kernel builds K21/K22 tiles in-kernel, so neither the [N, 128, 128]
    k00 gram nor the assembled L0/L0^{-1} ever touch HBM.  ``times/mask``
    are ``[N, 128]``, ``ls/var`` ``[N, 128]`` broadcast rows."""
    from gpvae_tpu.ops import pallas_chol

    times, mask = times[:, :128], mask[:, :128]
    l11, i11 = pallas_chol.gram_chol_inv_small(
        times[:, :64], ls[:, 0], mask[:, :64], var[:, 0],
        kernel=kernel, noise=noise,
    )
    a21, s22 = _gram_schur64_jit(times, mask, ls, var, i11, kernel, noise,
                                 _interpret())
    l22, i22 = pallas_chol.chol_inv_small_batched(s22)
    i21 = pallas_chol._inv21_jit(i11, a21, i22, _interpret())
    return l11, a21, l22, i11, i21, i22


def _diag_parts_kernel(l_any_ref, l11_ref, a21_ref, l22_ref, out_ref):
    del l_any_ref  # aliased with out; never read
    zero = jnp.zeros_like(l11_ref[...])
    out_ref[...] = jnp.concatenate([
        jnp.concatenate([l11_ref[...], zero], axis=2),
        jnp.concatenate([a21_ref[...], l22_ref[...]], axis=2),
    ], axis=1)


@functools.partial(jax.jit, static_argnames=("block", "nb", "interpret"),
                   donate_argnums=(0,))
def _diag_parts_wb_jit(l, l11, a21, l22, block, nb, interpret):
    n, t, _ = l.shape
    h = nb // 2
    b = block
    if interpret:
        zero = jnp.zeros((n, h, h), jnp.float32)
        ld = jnp.concatenate([
            jnp.concatenate([l11, zero], axis=2),
            jnp.concatenate([a21, l22], axis=2),
        ], axis=1)
        return jax.lax.dynamic_update_slice(l, ld, (0, b * nb, b * nb))
    per_matrix = 4 * (3 * h * h + nb * nb) * 2
    m = max(1, _SLAB_BYTES // per_matrix)
    while n % m != 0:
        m -= 1
    half = pl.BlockSpec((m, h, h), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _diag_parts_kernel,
        grid=(n // m,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # aliased L, unread
            half, half, half,
        ],
        out_specs=pl.BlockSpec((m, nb, nb), lambda i: (i, b, b),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, t, t), jnp.float32),
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(16 * 1024 * 1024, int(per_matrix * m * 1.5)),
        ),
        interpret=interpret,
    )(l, l11, a21, l22)


def diag_parts_writeback(l, parts, block: int, nb: int):
    """Write diagonal block ``block`` of ``l`` in place from half-block
    factor parts ``(l11, a21, l22)`` — replaces the assemble + DUS pair
    (two full-tile writes + one read) with a single aliased write."""
    l11, a21, l22 = parts
    return _diag_parts_wb_jit(l, l11, a21, l22, block, nb, _interpret())


def _make_defer1_kernel(kfn, noise, with_sub: bool = True):
    """b=1 deferred kernel: column 0's sub-diagonal tiles are built from
    in-kernel gram tiles (``colb = K[rows, 0:nb] @ ldi0^T`` — the same
    bytes the old init pass wrote and the old b=1 history pass re-read)
    and written to L through the alias, while the block-1 panel comes out
    as ``K[rows, nb:2nb] - colb @ cbrow^T`` (j=0 -> diag, j>0 -> sub).
    There is no history input at all: column 0 IS the history at b=1.
    ``with_sub=False`` (t == 2 nb) drops the raw-sub output — it would be
    a never-written dummy whose buffer Pallas still flushes to HBM.
    """
    def kernel(tr_ref, tc0_ref, tc1_ref, mr_ref, mc0_ref, mc1_ref,
               ls_ref, var_ref, i11_ref, i21_ref, i22_ref, l_any_ref,
               *rest):
        del l_any_ref  # aliased with the col output; never read
        if with_sub:
            col_ref, diag_ref, subo_ref, cbrow_scr, ldi_scr = rest
        else:
            col_ref, diag_ref, cbrow_scr, ldi_scr = rest
        j = pl.program_id(1)

        # block 0's inverse arrives as half parts (never assembled in HBM)
        @pl.when(j == 0)
        def _():
            zero = jnp.zeros_like(i11_ref[...])
            ldi_scr[...] = jnp.concatenate([
                jnp.concatenate([i11_ref[...], zero], axis=2),
                jnp.concatenate([i21_ref[...], i22_ref[...]], axis=2),
            ], axis=1)

        k0 = _gram_tile(
            tr_ref[...], tc0_ref[...], mr_ref[...], mc0_ref[...],
            ls_ref[:, :1], var_ref[:, :1], noise, kfn, False,
        )
        colb = split_dot(
            k0, ldi_scr[...], (((2,), (2,)), ((0,), (0,))),
        )
        col_ref[...] = colb

        @pl.when(j == 0)
        def _():
            cbrow_scr[...] = colb

        k1 = _gram_tile(
            tr_ref[...], tc1_ref[...], mr_ref[...], mc1_ref[...],
            ls_ref[:, :1], var_ref[:, :1], noise, kfn, j == 0,
        )
        panel = k1 - split_dot(
            colb, cbrow_scr[...], (((2,), (2,)), ((0,), (0,))),
        )

        @pl.when(j == 0)
        def _():
            diag_ref[...] = panel

        if with_sub:
            @pl.when(j > 0)
            def _():
                subo_ref[...] = panel

    return kernel


@functools.partial(
    jax.jit, static_argnames=("nb", "kernel", "noise", "interpret"),
    donate_argnums=(0,),
)
def _gram_defer1_jit(l, times, mask, ls, var, i11_0, i21_0, i22_0,
                     nb, kernel, noise, interpret):
    from gpvae_tpu import kernels as kernels_lib

    n, t = times.shape
    assert t % nb == 0 and t // nb >= 2
    r = t - nb
    h = nb // 2
    assert i11_0.shape[-1] == h, (i11_0.shape, h)
    m = _slab8(n, _defer_slab(2 * nb, n, nb))
    kfn = kernels_lib.get_kernel(kernel)
    vec = pl.BlockSpec((m, nb), lambda i, j: (i, 1 + j))
    vec0 = pl.BlockSpec((m, nb), lambda i, j: (i, 0))
    vec1 = pl.BlockSpec((m, nb), lambda i, j: (i, 1))
    par = pl.BlockSpec((m, 128), lambda i, j: (i, 0))
    pinned = pl.BlockSpec((m, nb, nb), lambda i, j: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    pinned_h = pl.BlockSpec((m, h, h), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((m, nb, nb), lambda i, j: (i, 1 + j, 0),
                            memory_space=pltpu.VMEM)
    subo_spec = pl.BlockSpec(
        (m, nb, nb), lambda i, j: (i, jnp.maximum(j - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    in_specs = [
        vec, vec0, vec1, vec, vec0, vec1, par, par,
        pinned_h, pinned_h, pinned_h,             # ldi0 half parts
        pl.BlockSpec(memory_space=pl.ANY),     # aliased L, unread
    ]
    with_sub = r > nb
    out_specs = (col_spec, pinned) + ((subo_spec,) if with_sub else ())
    out_shape = (
        jax.ShapeDtypeStruct((n, t, t), jnp.float32),
        jax.ShapeDtypeStruct((n, nb, nb), jnp.float32),
    ) + ((jax.ShapeDtypeStruct((n, r - nb, nb), jnp.float32),)
         if with_sub else ())
    out = pl.pallas_call(
        _make_defer1_kernel(kfn, noise, with_sub=with_sub),
        grid=(n // m, r // nb),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        input_output_aliases={11: 0},
        scratch_shapes=[pltpu.VMEM((m, nb, nb), jnp.float32),
                        pltpu.VMEM((m, nb, nb), jnp.float32)],
        compiler_params=_vmem_params(m, nb, 2 * nb),
        interpret=interpret,
    )(times, times, times, mask, mask, mask, ls, var,
      i11_0, i21_0, i22_0, l)
    if with_sub:
        return out
    return out[0], out[1], jnp.zeros((n, 0, nb), jnp.float32)


def cholesky_gram_inplace(
    times: jnp.ndarray,
    lengthscales: jnp.ndarray,
    mask: jnp.ndarray | None,
    variance: jnp.ndarray,
    kernel: str = "rbf",
    noise: float = 1e-3,
    nb: int = 128,
    zero_upper: bool = True,
) -> jnp.ndarray:
    """Fused gram construction + in-place blocked Cholesky.

    ``times [N, T]``, ``lengthscales [N]``, ``mask [N, T]`` bool or None,
    ``variance [N]`` -> ``L [N, T, T]``.  Equivalent to
    ``cholesky_inplace(kernels.gram(...))`` but the ``[N, T, T]`` gram
    never exists in HBM: every K tile is built in-kernel from the O(N*T)
    time vectors — at T=1024 N=128 this deletes a 537 MB gram write AND a
    537 MB K read from the critical path (the large-T extension of the
    T<=64 lane-fused ``gram_chol_fused``, SURVEY.md §2.3).

    ``zero_upper=False`` (TPU path only) additionally skips the
    strictly-upper zero-tile writes — the output's upper TILES are then
    undefined.  Lower-only consumers (logdet diag extraction, tri_inv,
    trsm, the Cholesky VJP) are exact under this contract; apply
    ``jnp.tril`` before any dense-matmul consumer (the sampling einsum).
    """
    from gpvae_tpu.ops import chol as chol_lib
    from gpvae_tpu import kernels as kernels_lib

    n, t = times.shape
    nb = _nb_for_t(t, nb)
    f32 = jnp.float32
    times = times.astype(f32)
    mk = (jnp.ones((n, t), f32) if mask is None
          else mask.astype(f32))
    lengthscales = lengthscales.astype(f32).reshape(n)
    variance = jnp.asarray(variance, f32).reshape(n)
    n_pad = _round_up8(n)
    if n_pad != n:
        # fully-masked pad matrices factor to the identity (Mosaic wants
        # the batch-on-sublane time/mask tiles in multiples of 8)
        times = jnp.pad(times, ((0, n_pad - n), (0, 0)))
        mk = jnp.pad(mk, ((0, n_pad - n), (0, 0)))
        lengthscales = jnp.pad(lengthscales, (0, n_pad - n),
                               constant_values=1.0)
        variance = jnp.pad(variance, (0, n_pad - n), constant_values=1.0)
    n_out, n = n, n_pad
    num_blocks = -(-t // nb)
    t_pad = num_blocks * nb
    if t_pad != t:
        times = jnp.pad(times, ((0, 0), (0, t_pad - t)))
        mk = jnp.pad(mk, ((0, 0), (0, t_pad - t)))  # pad rows -> identity
    if _interpret():
        k = kernels_lib.gram(
            times, lengthscales[:, None, None], kernel=kernel, noise=noise,
            variance=variance[:, None, None], mask=mk > 0.5,
        )
        return cholesky_inplace(k, nb=nb)[:n_out, :t, :t]
    ls = jnp.broadcast_to(lengthscales[:, None], (n, 128))
    var = jnp.broadcast_to(variance[:, None], (n, 128))
    if num_blocks == 1:
        k00 = kernels_lib.gram(
            times[:, :nb], lengthscales[:, None, None],
            kernel=kernel, noise=noise, variance=variance[:, None, None],
            mask=mk[:, :nb] > 0.5,
        )
        return chol_lib.chol_wide(k00)[:n_out, :t, :t]
    # Deferred-column flow: each step's kernel writes the PREVIOUS block's
    # final column (sub_prev @ ldi_prev^T, aliased into l) while computing
    # this block's panel — no separate writeback pass (see the
    # deferred-column section above).  Column 0 itself is deferred into
    # the b=1 kernel (its "sub_prev" is the gram, built in-kernel), so
    # init only writes the (0, 0) tile and the upper-triangle zeros.
    # Diagonal blocks travel as half-block PARTS end-to-end: the k00 gram
    # is built in the lane/Schur kernels (never in HBM), each step's
    # (L_d, L_d^{-1}) stays unassembled (chol_inv_parts), the defer
    # kernels latch the inverse from parts into VMEM scratch, and the
    # diag tile is assembled in-kernel by the aliased writeback — the
    # full-tile L/L^{-1} HBM writes and the DUS round-trip disappear.
    if nb == 128:
        l11, a21, l22, i11, i21, i22 = gram_chol_inv_128_parts(
            times, mk, ls, var, kernel, noise,
        )
    else:
        k00 = kernels_lib.gram(
            times[:, :nb], lengthscales[:, None, None],
            kernel=kernel, noise=noise, variance=variance[:, None, None],
            mask=mk[:, :nb] > 0.5,
        )
        l11, a21, l22, i11, i21, i22 = chol_lib.chol_inv_parts(k00)
    l = _init0_parts_jit(l11, a21, l22, t_pad, nb, False,
                         zero_upper=zero_upper)
    sub_prev = None
    iparts = (i11, i21, i22)
    for b in range(1, num_blocks):
        if b == 1:
            l, diag, sub = _gram_defer1_jit(
                l, times, mk, ls, var, *iparts, nb, kernel, noise, False,
            )
        else:
            l, diag, sub = _gram_hist2_defer_jit(
                l, times, mk, ls, var, sub_prev, *iparts,
                b, nb, kernel, noise, False,
            )
        if b == num_blocks - 1:
            fparts = chol_lib.chol_parts(diag)
        else:
            p11, pa21, p22, j11, j21, j22 = chol_lib.chol_inv_parts(diag)
            fparts = (p11, pa21, p22)
            sub_prev, iparts = sub, (j11, j21, j22)
        l = diag_parts_writeback(l, fparts, b, nb)
    return l[:n_out, :t, :t]


# ---------------------------------------------------------------------------
# Driver
# ---------------------------------------------------------------------------

def _nb_for_t(t: int, nb: int) -> int:
    """Clamp the block width so the defer kernels' resident history row
    (width up to T - nb) fits the 16 MB scoped-VMEM limit at one matrix
    per slab.  Measured on-chip: nb=256 at T=4096 needs 17.73 MB > 16
    (the _defer_slab estimate under-counts Mosaic's stack by ~1.3x);
    nb=128 fits through T=8192.  Above that the streamed paths are the
    answer, not this one."""
    if t > 2048 and nb > 128:
        return 128
    return nb


def cholesky_inplace(k: jnp.ndarray, nb: int = 256) -> jnp.ndarray:
    """Left-looking blocked batched Cholesky of ``k [N, T, T]``, in-place
    column writes, compensated bf16 contractions.  T padded to a multiple
    of ``nb`` (identity padding)."""
    from gpvae_tpu.ops import chol as chol_lib

    n, t, _ = k.shape
    nb = _nb_for_t(t, nb)
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
    if _interpret():
        # CPU/interpret: the proven non-deferred flow (each helper has its
        # own XLA fallback); the deferred kernels are tested directly
        for b in range(1, num_blocks):
            if b == num_blocks - 1:
                diag = hist_panel(l, k, b, nb)
                ld = chol_lib.chol_wide(diag[:, :nb])
                l = _writeback_diag_only(l, ld, b, nb)
            else:
                diag, sub = hist_panel_split(l, k, b, nb)
                ld, ldi = chol_lib.chol_and_inv(diag)
                l = col_writeback(l, ld, ldi, sub, b, nb)
        return l[:, :t, :t]
    # Deferred-column flow (see the deferred-column section above); the
    # diagonal blocks travel as half-block parts, assembled only by the
    # aliased in-place diag writeback
    sub_prev = iparts = None
    for b in range(1, num_blocks):
        if sub_prev is None:
            if b == num_blocks - 1:
                diag, sub = hist_panel(l, k, b, nb)[:, :nb], None
            else:
                diag, sub = hist_panel_split(l, k, b, nb)
        else:
            l, diag, sub = _hist2_defer_jit(
                l, k, sub_prev, *iparts, b, nb, False,
            )
        if b == num_blocks - 1:
            fparts = chol_lib.chol_parts(diag)
        else:
            p11, pa21, p22, j11, j21, j22 = chol_lib.chol_inv_parts(diag)
            fparts = (p11, pa21, p22)
            sub_prev, iparts = sub, (j11, j21, j22)
        l = diag_parts_writeback(l, fparts, b, nb)
    return l[:, :t, :t]


@functools.partial(jax.jit, static_argnames=("block", "nb"),
                   donate_argnums=(0,))
def _writeback_diag_only(l, ld, block, nb):
    o = block * nb
    return jax.lax.dynamic_update_slice(l, ld, (0, o, o))
