"""ELBO assembly: reconstruction NLLs, multi-sample averaging, β schedule.

Reference L3 layer: Bernoulli NLL inlined into each ``main()``
(src/Models/syndata/GP_VAE_syn_data.py:334-341 multi-sample;
src/Models/Full_GP_VAE_fixed_for_MovMnist.py:307 single reduce_sum) and the
β-annealing block (src/Models/syndata/GP_VAE_syn_data.py:343-365).

Numerics delta: the reference clamps probabilities (``log(p + 1e-10)``);
here the NLL is computed from logits with the stable softplus form — exact,
no clamps, and it fuses into the decoder's last matmul under XLA.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


def bernoulli_nll(
    logits: jnp.ndarray,
    x: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    feature_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Per-sequence Bernoulli negative log-likelihood -> ``[B]``.

    * ``logits`` ``[S, B, T, ...]`` decoder outputs for S posterior samples,
    * ``x``      ``[B, T, ...]`` targets in [0, 1],
    * ``mask``   ``[B, T]`` observed-timestep mask,
    * ``feature_mask`` ``[B, T, ...]`` per-feature observed mask (the
      healing-MNIST missing-*pixel* regime, BASELINE.json config 2): masked
      features contribute zero likelihood, so the model is only trained on
      what was actually observed.

    Sums over observation dims and timesteps (masked), averages over the S
    samples — the reference's tile-by-S / split / mean / sum pipeline
    (GP_VAE_syn_data.py:308-312,334-341) collapsed to one reduction.

    Stable form: ``nll = softplus(logits) - x * logits`` (elementwise).
    """
    x = x[None]  # broadcast over samples
    elem = jnp.logaddexp(0.0, logits) - x * logits  # [S, B, T, ...]
    if feature_mask is not None:
        elem = elem * feature_mask.astype(elem.dtype)[None]
    reduce_dims = tuple(range(3, elem.ndim))
    per_t = jnp.sum(elem, axis=reduce_dims)  # [S, B, T]
    if mask is not None:
        per_t = per_t * mask.astype(per_t.dtype)[None]
    return jnp.mean(jnp.sum(per_t, axis=-1), axis=0)  # [B]


def gaussian_nll(
    mean: jnp.ndarray,
    x: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    feature_mask: jnp.ndarray | None = None,
    log_var: jnp.ndarray | float = 0.0,
) -> jnp.ndarray:
    """Per-sequence Gaussian NLL -> ``[B]`` (not in the reference zoo; provided
    for continuous-valued data)."""
    x = x[None]
    log_var = jnp.asarray(log_var)
    elem = 0.5 * (
        jnp.exp(-log_var) * (x - mean) ** 2
        + log_var
        + jnp.log(2.0 * jnp.pi)
    )
    if feature_mask is not None:
        elem = elem * feature_mask.astype(elem.dtype)[None]
    reduce_dims = tuple(range(3, elem.ndim))
    per_t = jnp.sum(elem, axis=reduce_dims)
    if mask is not None:
        per_t = per_t * mask.astype(per_t.dtype)[None]
    return jnp.mean(jnp.sum(per_t, axis=-1), axis=0)


@dataclasses.dataclass(frozen=True)
class BetaSchedule:
    """The reference's β-annealing: constant ``init`` until ``start_step``,
    then ``+= rate`` per step, clamped at ``max_value``
    (src/Models/syndata/GP_VAE_syn_data.py:344,361-364; VM variant
    GP_VAE_syn_data_VM.py:346-347 differs only in init/rate; MNIST full-GP
    scripts fix β=1, src/Models/Full_GP_VAE_dynamic_time.py:359)."""
    init: float = 1e-3
    rate: float = 1e-7
    start_step: int = 20_000
    max_value: float = 1.0

    def __call__(self, step: jnp.ndarray) -> jnp.ndarray:
        ramp = jnp.maximum(step - self.start_step, 0).astype(jnp.float32)
        return jnp.minimum(self.init + self.rate * ramp, self.max_value)


CONSTANT_BETA = BetaSchedule(init=1.0, rate=0.0, start_step=0)
