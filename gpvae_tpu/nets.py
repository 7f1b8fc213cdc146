"""Encoder/decoder networks (flax.linen).

Re-implementations of the reference's L4 layer:

* dense MLP encoder/decoder (obs 15 <-> Z) —
  src/Models/syndata/GP_VAE_syn_data.py:15-39 (encode), :238-275 (decode),
  truncated-normal(0.1) weights / 0.1 bias init (:9-13);
* strided conv encoder / transposed-conv decoder (64x64x1 <-> Z) —
  src/Models/Full_GP_VAE_dynamic_time.py:15-58 (encode), :262-292 (decode);
* optional log-variance head for diagonal/recognition posteriors —
  src/Models/VAE_GPprior_diag_cov.py:54-62.

Design deltas from the reference (deliberate):
* decoders return *logits*, not clamped sigmoid probabilities — the Bernoulli
  NLL is computed with the numerically stable log-sigmoid form instead of the
  reference's ``log(p + 1e-10)`` clamp (GP_VAE_syn_data.py:334-341);
* convolutions are XLA-native ``lax.conv_general_dilated`` via flax — already
  MXU-optimal on TPU (SURVEY.md §2.3), no custom kernel warranted;
* the DENSE nets pin ``precision=HIGHEST`` by default: on TPU the default
  f32 matmul runs bf16 passes, which was measured to dominate the shipped
  config's deviation from the fp64 reference math (max loss rel 2.6e-4 vs
  the 1e-4 north star; forcing HIGHEST recovers 1.1e-5 — BASELINE.md fp64
  trajectory audit).  These matmuls are ~15x32 — the cost is nil.  The conv
  nets keep the default (bf16-pass) precision; flip with
  ``GPVAEConfig(dense_precision="default")``.
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

# Reference initializers (src/Models/syndata/GP_VAE_syn_data.py:9-13)
_W_INIT = nn.initializers.truncated_normal(stddev=0.1)
_B_INIT = nn.initializers.constant(0.1)

# Reference conv channel schedule (src/Models/Full_GP_VAE_dynamic_time.py:27-58)
CONV_FEATURES = (16, 32, 64, 128, 256, 512)
# Reference dense hidden schedule (src/Models/syndata/GP_VAE_syn_data.py:15-39)
DENSE_HIDDEN = (32, 32, 16, 8)


class DenseEncoder(nn.Module):
    """15 -> 32 -> 32 -> 16 -> 8 -> Z ReLU MLP with linear mean head
    (and optional log-variance head)."""
    latent_dim: int
    hidden: Sequence[int] = DENSE_HIDDEN
    with_log_var: bool = False
    precision: Any = _HI

    @nn.compact
    def __call__(self, x):
        h = x
        for width in self.hidden:
            h = nn.relu(
                nn.Dense(width, kernel_init=_W_INIT, bias_init=_B_INIT,
                         precision=self.precision)(h)
            )
        mean = nn.Dense(
            self.latent_dim, kernel_init=_W_INIT, bias_init=_B_INIT,
            precision=self.precision, name="mean_head",
        )(h)
        if not self.with_log_var:
            return mean
        log_var = nn.Dense(
            self.latent_dim, kernel_init=_W_INIT, bias_init=_B_INIT,
            precision=self.precision, name="log_var_head",
        )(h)
        return mean, log_var


class DenseDecoder(nn.Module):
    """Z -> 8 -> 16 -> 32 -> 32 -> obs_dim, returning Bernoulli logits."""
    obs_dim: int
    hidden: Sequence[int] = tuple(reversed(DENSE_HIDDEN))
    precision: Any = _HI

    @nn.compact
    def __call__(self, z):
        h = z
        for width in self.hidden:
            h = nn.relu(
                nn.Dense(width, kernel_init=_W_INIT, bias_init=_B_INIT,
                         precision=self.precision)(h)
            )
        return nn.Dense(
            self.obs_dim, kernel_init=_W_INIT, bias_init=_B_INIT,
            precision=self.precision, name="logits_head",
        )(h)


class ConvEncoder(nn.Module):
    """64x64x1 -> six stride-2 3x3 convs (16..512) -> flatten -> Z.

    Input: ``[N, H, W, C]`` frames (callers flatten [B, T] into N)."""
    latent_dim: int
    features: Sequence[int] = CONV_FEATURES
    with_log_var: bool = False

    @nn.compact
    def __call__(self, x):
        h = x
        for feat in self.features:
            h = nn.relu(
                nn.Conv(
                    feat, kernel_size=(3, 3), strides=(2, 2), padding="SAME",
                    kernel_init=_W_INIT, bias_init=_B_INIT,
                )(h)
            )
        h = h.reshape((h.shape[0], -1))
        mean = nn.Dense(
            self.latent_dim, kernel_init=_W_INIT, bias_init=_B_INIT,
            name="mean_head",
        )(h)
        if not self.with_log_var:
            return mean
        log_var = nn.Dense(
            self.latent_dim, kernel_init=_W_INIT, bias_init=_B_INIT,
            name="log_var_head",
        )(h)
        return mean, log_var


class ConvDecoder(nn.Module):
    """Z -> dense -> h0 x h0 seed -> stride-2 transposed convs -> H x W
    logits (reference src/Models/Full_GP_VAE_dynamic_time.py:262-292).

    For the reference's 64x64 frames this is exactly its architecture
    (1x1x512 seed, six doublings).  Non-power-of-two sizes (e.g. 28x28
    healing-MNIST) seed at the largest odd divisor (7x7) and double from
    there."""
    image_shape: tuple[int, int, int] = (64, 64, 1)
    features: Sequence[int] = tuple(reversed(CONV_FEATURES))

    @nn.compact
    def __call__(self, z):
        h_dim = self.image_shape[0]
        # number of stride-2 doublings: 2-adic valuation, capped at the
        # reference's six layers; seed spatial size is what remains
        k = 0
        seed = h_dim
        while seed % 2 == 0 and k < len(self.features):
            seed //= 2
            k += 1
        feats = self.features[len(self.features) - k:] or (self.features[-1],)
        h = nn.relu(
            nn.Dense(
                seed * seed * self.features[len(self.features) - k - 1]
                if k < len(self.features)
                else self.features[0],
                kernel_init=_W_INIT, bias_init=_B_INIT,
            )(z)
        )
        c0 = h.shape[-1] // (seed * seed)
        h = h.reshape((h.shape[0], seed, seed, c0))
        for feat in feats[1:] if k == len(self.features) else feats:
            h = nn.relu(
                nn.ConvTranspose(
                    feat, kernel_size=(3, 3), strides=(2, 2), padding="SAME",
                    kernel_init=_W_INIT, bias_init=_B_INIT,
                )(h)
            )
        h = nn.ConvTranspose(
            self.image_shape[-1], kernel_size=(3, 3),
            strides=(2, 2) if k == len(self.features) else (1, 1),
            padding="SAME", kernel_init=_W_INIT, bias_init=_B_INIT,
            name="logits_head",
        )(h)
        return h  # [N, H, W, C] logits
