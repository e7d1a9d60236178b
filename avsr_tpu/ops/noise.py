"""On-device SNR-controlled additive-noise mixing.

The reference mixed babble/cafe noise into FIXED noisy TFRecord copies at
dataset-writing time, at SNR in {-5, 0, 10, 20} dB
(upstream:avsr/dataset_writer.py, SURVEY.md §3.3, §5.9).  Per the north star
[BASELINE.json:north_star], this framework instead stores clean waveforms
plus a noise bank and mixes INSIDE the jitted step: a noise segment, noise
type, and SNR are sampled per example on device.  This removes the
N-copies-of-the-dataset cost and enables randomized-SNR training, while
fixed-SNR deterministic mixing keeps evaluation-condition parity.

SNR convention: snr_db = 10*log10(P_speech / P_noise), with powers measured
over the utterance's valid samples (masked means).  Unit-tested by measuring
the achieved SNR of mixed synthetic tones (SURVEY §4.1).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _masked_power(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Mean power over valid samples. x: [B, S], lengths: [B] -> [B]."""
    S = x.shape[-1]
    mask = (jnp.arange(S)[None, :] < lengths[:, None]).astype(x.dtype)
    denom = jnp.maximum(lengths.astype(x.dtype), 1.0)
    return jnp.sum(jnp.square(x) * mask, axis=-1) / denom


def _gather_segments(
    noise_bank: jnp.ndarray, idx: jnp.ndarray, offsets: jnp.ndarray, length: int
) -> jnp.ndarray:
    """Per-example noise segment: bank [N, L], idx [B], offsets [B] -> [B, length]."""

    def one(i, off):
        return jax.lax.dynamic_slice(noise_bank[i], (off,), (length,))

    return jax.vmap(one)(idx, offsets)


def mix_at_snr(
    wav: jnp.ndarray,
    wav_lengths: jnp.ndarray,
    noise: jnp.ndarray,
    snr_db: jnp.ndarray,
) -> jnp.ndarray:
    """Mix `noise` into `wav` at a target SNR (per example).

    Args:
      wav: [B, S] clean speech (zero-padded).
      noise: [B, S] noise segments.
      snr_db: [B] target SNR in dB.

    Returns [B, S] noisy speech; padding stays zero.
    """
    S = wav.shape[-1]
    p_speech = _masked_power(wav, wav_lengths)
    p_noise = _masked_power(noise, wav_lengths)
    # scale^2 * P_n = P_s / 10^(snr/10)
    scale = jnp.sqrt(p_speech / jnp.maximum(p_noise, 1e-12)) * jnp.power(
        10.0, -snr_db / 20.0
    )
    mask = (jnp.arange(S)[None, :] < wav_lengths[:, None]).astype(wav.dtype)
    return wav + scale[:, None] * noise * mask


def sample_and_mix(
    rng: jax.Array,
    wav: jnp.ndarray,
    wav_lengths: jnp.ndarray,
    noise_bank: jnp.ndarray,
    snr_choices: Tuple[float, ...],
    clean_probability: float = 0.0,
) -> jnp.ndarray:
    """Randomized training-time mixing: sample (noise row, offset, SNR) per
    example; leave an example clean with `clean_probability`.

    noise_bank: [N, L] with L >= S.
    """
    B, S = wav.shape
    N, L = noise_bank.shape
    if L < S:
        raise ValueError(f"noise bank rows ({L}) shorter than waveform ({S})")
    k_idx, k_off, k_snr, k_clean = jax.random.split(rng, 4)
    idx = jax.random.randint(k_idx, (B,), 0, N)
    offsets = jax.random.randint(k_off, (B,), 0, L - S + 1)
    snrs = jnp.asarray(snr_choices, jnp.float32)[
        jax.random.randint(k_snr, (B,), 0, len(snr_choices))
    ]
    noise = _gather_segments(noise_bank, idx, offsets, S)
    noisy = mix_at_snr(wav, wav_lengths, noise, snrs)
    if clean_probability > 0.0:
        keep_clean = jax.random.bernoulli(k_clean, clean_probability, (B,))
        noisy = jnp.where(keep_clean[:, None], wav, noisy)
    return noisy


def mix_fixed_snr(
    wav: jnp.ndarray,
    wav_lengths: jnp.ndarray,
    noise_bank: jnp.ndarray,
    snr_db: float,
    *,
    seed: int = 0,
) -> jnp.ndarray:
    """Deterministic fixed-SNR mixing for evaluation-condition parity.

    Noise row/offset are a deterministic function of the example index and
    `seed`, so repeated evaluations see identical noisy inputs (mirrors the
    reference's fixed noisy dataset copies).
    """
    B, S = wav.shape
    rng = jax.random.PRNGKey(seed)
    k_idx, k_off = jax.random.split(rng)
    N, L = noise_bank.shape
    idx = jax.random.randint(k_idx, (B,), 0, N)
    offsets = jax.random.randint(k_off, (B,), 0, max(L - S + 1, 1))
    noise = _gather_segments(noise_bank, idx, offsets, S)
    snrs = jnp.full((B,), snr_db, jnp.float32)
    return mix_at_snr(wav, wav_lengths, noise, snrs)
