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

    # step 0: factor the leading block, then give birth to L in ONE write
    # pass (zeros + column block 0 fused in init_l) — the round-2 paths
    # paid a 537 MB zeros-init AND a pad/concat copy at T=1024
    ld, ld_inv = chol_lib.chol_and_inv(k[:, :nb, :nb])
    if num_blocks == 1:
        return ld[:, :t, :t]
    l = init_l(k, ld, ld_inv, nb)
    for b in range(1, num_blocks):
        if b == num_blocks - 1:
            # single diag block left: no sub-panel, no writeback kernel
            diag = hist_panel(l, k, b, nb)
            ld, _ = chol_lib.chol_and_inv(diag[:, :nb])
            l = _writeback_diag_only(l, ld, b, nb)
        else:
            diag, sub = hist_panel_split(l, k, b, nb)
            ld, ld_inv = chol_lib.chol_and_inv(diag)
            l = col_writeback(l, ld, ld_inv, sub, b, nb)
    return l[:, :t, :t]


@functools.partial(jax.jit, static_argnames=("block", "nb"),
                   donate_argnums=(0,))
def _writeback_diag_only(l, ld, block, nb):
    o = block * nb
    return jax.lax.dynamic_update_slice(l, ld, (0, o, o))
