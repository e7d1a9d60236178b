"""SpecAugment: on-device time/frequency masking of feature sequences.

Opt-in training augmentation (Park et al., 2019) — NOT part of the
reference's capability surface, provided as a modern robustness extension
alongside the SNR noise mixing (SURVEY.md §5.9).  Runs inside the jitted
step: masks are built from broadcasted iota comparisons (no dynamic shapes,
no host round-trips).

Applied to the post-frontend feature sequence [B, T, D]: `num_time_masks`
spans of up to `time_mask_width` frames and `num_freq_masks` bands of up to
`freq_mask_width` feature channels are zeroed per example.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def spec_augment(
    rng: jax.Array,
    feat: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    num_time_masks: int = 2,
    time_mask_width: int = 20,
    num_freq_masks: int = 2,
    freq_mask_width: int = 8,
) -> jnp.ndarray:
    """Mask random time spans and feature bands. feat: [B, T, D]."""
    B, T, D = feat.shape
    t_idx = jnp.arange(T)[None, :]  # [1, T]
    d_idx = jnp.arange(D)[None, :]  # [1, D]
    keep = jnp.ones((B, T, 1), feat.dtype)

    for k in range(num_time_masks):
        rng, k_start, k_width = jax.random.split(rng, 3)
        # start uniform within the VALID region of each utterance
        width = jax.random.randint(k_width, (B, 1), 0, time_mask_width + 1)
        max_start = jnp.maximum(lengths[:, None] - width, 1)
        start = jax.random.randint(k_start, (B, 1), 0, T) % max_start
        mask = jnp.logical_and(t_idx >= start, t_idx < start + width)
        keep = keep * (1.0 - mask.astype(feat.dtype))[:, :, None]

    keep_d = jnp.ones((B, 1, D), feat.dtype)
    for k in range(num_freq_masks):
        rng, k_start, k_width = jax.random.split(rng, 3)
        width = jax.random.randint(k_width, (B, 1), 0, freq_mask_width + 1)
        start = jax.random.randint(k_start, (B, 1), 0, jnp.maximum(D - width, 1))
        mask = jnp.logical_and(d_idx >= start, d_idx < start + width)
        keep_d = keep_d * (1.0 - mask.astype(feat.dtype))[:, None, :]

    return feat * keep * keep_d
