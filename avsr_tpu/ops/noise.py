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

import dataclasses
from typing import Dict, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class NoiseBank:
    """Named noise-type bank: one [Ni, Li] waveform array per noise type.

    The reference's noise axis is (type x SNR) with type in {babble, cafe}
    (SURVEY.md §1 item 4, §3.3): separate noisy dataset copies existed per
    condition.  Here the types live side by side on device and training
    samples (type, row, offset, SNR) per example; evaluation pins a type.

    ``names`` is static Python metadata (resolved at trace time); ``banks``
    are device arrays captured as jit constants.
    """

    names: Tuple[str, ...]
    banks: Tuple[jnp.ndarray, ...]

    def __post_init__(self):
        if len(self.names) != len(self.banks) or not self.names:
            raise ValueError("NoiseBank needs one array per type name")

    @classmethod
    def create(
        cls,
        banks: Union["NoiseBank", jnp.ndarray, np.ndarray, Dict[str, np.ndarray]],
        default_name: str = "noise",
    ) -> "NoiseBank":
        """Coerce a raw [N, L] array or a {type: [Ni, Li]} dict."""
        if isinstance(banks, cls):
            return banks
        if isinstance(banks, dict):
            names = tuple(banks.keys())
            arrays = tuple(jnp.atleast_2d(jnp.asarray(banks[n])) for n in names)
            return cls(names, arrays)
        return cls((default_name,), (jnp.atleast_2d(jnp.asarray(banks)),))

    @property
    def num_types(self) -> int:
        return len(self.names)

    def type_index(self, name: Optional[str]) -> int:
        """Resolve a type name to its bank index (None -> 0)."""
        if name is None:
            return 0
        try:
            return self.names.index(name)
        except ValueError:
            raise KeyError(
                f"unknown noise type {name!r}; bank has {list(self.names)}"
            ) from None


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


def _sample_type_segments(
    rng: jax.Array, bank: NoiseBank, batch: int, length: int
) -> jnp.ndarray:
    """Sample one noise segment per example, drawing (type, row, offset)
    uniformly.  Returns [B, length]."""
    k_type, k_rest = jax.random.split(rng)
    segs = []
    for arr in bank.banks:
        N, L = arr.shape
        if L < length:
            raise ValueError(
                f"noise bank rows ({L}) shorter than waveform ({length})"
            )
        k_rest, k_idx, k_off = jax.random.split(k_rest, 3)
        idx = jax.random.randint(k_idx, (batch,), 0, N)
        offsets = jax.random.randint(k_off, (batch,), 0, L - length + 1)
        segs.append(_gather_segments(arr, idx, offsets, length))
    if bank.num_types == 1:
        return segs[0]
    type_idx = jax.random.randint(k_type, (batch,), 0, bank.num_types)
    stacked = jnp.stack(segs)  # [T, B, length]
    return jnp.take_along_axis(stacked, type_idx[None, :, None], axis=0)[0]


def sample_and_mix(
    rng: jax.Array,
    wav: jnp.ndarray,
    wav_lengths: jnp.ndarray,
    noise_bank: Union[NoiseBank, jnp.ndarray],
    snr_choices: Tuple[float, ...],
    clean_probability: float = 0.0,
) -> jnp.ndarray:
    """Randomized training-time mixing: sample (noise type, row, offset, SNR)
    per example; leave an example clean with `clean_probability`.

    noise_bank: NoiseBank, or a plain [N, L] array (single anonymous type).
    """
    bank = NoiseBank.create(noise_bank)
    B, S = wav.shape
    k_seg, k_snr, k_clean = jax.random.split(rng, 3)
    snrs = jnp.asarray(snr_choices, jnp.float32)[
        jax.random.randint(k_snr, (B,), 0, len(snr_choices))
    ]
    noise = _sample_type_segments(k_seg, bank, B, S)
    noisy = mix_at_snr(wav, wav_lengths, noise, snrs)
    if clean_probability > 0.0:
        keep_clean = jax.random.bernoulli(k_clean, clean_probability, (B,))
        noisy = jnp.where(keep_clean[:, None], wav, noisy)
    return noisy


def mix_fixed_snr(
    wav: jnp.ndarray,
    wav_lengths: jnp.ndarray,
    noise_bank: Union[NoiseBank, jnp.ndarray],
    snr_db: float,
    *,
    noise_type: Optional[str] = None,
    seed: int = 0,
    uid_hashes: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Deterministic fixed-(type x SNR) mixing for evaluation-condition
    parity (one condition per reference noisy-dataset copy).

    Noise row/offset are a deterministic function of `seed` and the
    UTTERANCE — ``uid_hashes`` ([B] uint32, e.g. crc32 of the uid) keys each
    example's noise draw, so the same utterance receives the same noise in
    any batch composition / eval-set ordering, making error rates comparable
    across checkpoints even as the eval set changes.  Without hashes the
    draw falls back to batch position (stable only for a frozen eval set).
    ``noise_type`` selects the bank type by name (None -> first type).
    """
    bank = NoiseBank.create(noise_bank)
    arr = bank.banks[bank.type_index(noise_type)]
    B, S = wav.shape
    N, L = arr.shape
    if L < S:
        # Same loud check as the train path (_sample_type_segments):
        # clamping the offset range would let tracing proceed into an
        # opaque dynamic_slice shape error minutes into a remote compile.
        raise ValueError(
            f"noise bank rows ({L}) shorter than waveform ({S})"
        )
    base = jax.random.PRNGKey(seed)
    if uid_hashes is None:
        uid_hashes = jnp.arange(B, dtype=jnp.uint32)

    def draw(h):
        k_idx, k_off = jax.random.split(jax.random.fold_in(base, h))
        return (
            jax.random.randint(k_idx, (), 0, N),
            jax.random.randint(k_off, (), 0, L - S + 1),
        )

    idx, offsets = jax.vmap(draw)(uid_hashes.astype(jnp.uint32))
    noise = _gather_segments(arr, idx, offsets, S)
    snrs = jnp.full((B,), snr_db, jnp.float32)
    return mix_at_snr(wav, wav_lengths, noise, snrs)
