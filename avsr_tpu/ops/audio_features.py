"""In-graph audio feature frontend: waveform -> log-mel/spectrogram features.

TPU-native rebuild of the reference's tf.signal pipeline
(upstream:avsr/audio.py, SURVEY.md §2.2 row 8 and §2.3): framing -> Hann
window -> rFFT -> mel filterbank matmul -> log, then delta/delta-delta
features, per-utterance masked normalization, and frame stacking with
skipping.  Everything here is shape-static and jit-compatible; the mel
projection is a single MXU matmul and the whole frontend fuses into the
training step's XLA program (no host<->device feature round-trips,
[BASELINE.json:north_star]).

Layouts are batch-major [B, T, D]; lengths are carried explicitly as int32
and every statistic is computed under the valid-frame mask.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from avsr_tpu.configs import AudioFrontendConfig


# ---------------------------------------------------------------------------
# Mel filterbank (precomputed on host, constant-folded under jit)
# ---------------------------------------------------------------------------


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, dtype=np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    num_mel_bins: int,
    num_spectrogram_bins: int,
    sample_rate: int,
    lower_hz: float,
    upper_hz: float,
) -> np.ndarray:
    """Triangular mel weight matrix [num_spectrogram_bins, num_mel_bins].

    Same construction as tf.signal.linear_to_mel_weight_matrix (triangle
    filters with linear interpolation in mel space); validated against a
    NumPy golden implementation in tests/test_audio_frontend.py.
    """
    nyquist = sample_rate / 2.0
    freqs = np.linspace(0.0, nyquist, num_spectrogram_bins)
    mel_freqs = hz_to_mel(freqs)
    mel_edges = np.linspace(
        hz_to_mel(lower_hz), hz_to_mel(upper_hz), num_mel_bins + 2
    )
    lower, center, upper = mel_edges[:-2], mel_edges[1:-1], mel_edges[2:]
    # [num_spectrogram_bins, num_mel_bins]
    up_slope = (mel_freqs[:, None] - lower[None, :]) / np.maximum(
        center - lower, 1e-12
    )[None, :]
    down_slope = (upper[None, :] - mel_freqs[:, None]) / np.maximum(
        upper - center, 1e-12
    )[None, :]
    weights = np.maximum(0.0, np.minimum(up_slope, down_slope))
    weights[0, :] = 0.0  # DC bin carries no mel energy
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# Framing / STFT
# ---------------------------------------------------------------------------


def num_frames(num_samples: int, frame_length: int, frame_step: int) -> int:
    """Full frames only (tf.signal.stft pad_end=False semantics)."""
    if num_samples < frame_length:
        return 0
    return 1 + (num_samples - frame_length) // frame_step


def frame_signal(x: jnp.ndarray, frame_length: int, frame_step: int) -> jnp.ndarray:
    """[B, S] -> [B, T, frame_length] overlapping frames (gather-based)."""
    S = x.shape[-1]
    T = num_frames(S, frame_length, frame_step)
    starts = np.arange(T, dtype=np.int32) * frame_step
    idx = starts[:, None] + np.arange(frame_length, dtype=np.int32)[None, :]
    return x[..., idx]  # gather along the sample axis


@functools.lru_cache(maxsize=None)
def hann_window(frame_length: int) -> np.ndarray:
    # Periodic Hann (tf.signal default), not symmetric.
    n = np.arange(frame_length, dtype=np.float64)
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * n / frame_length)).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _dft_matrices(frame_length: int, fft_length: int) -> Tuple[np.ndarray, np.ndarray]:
    """Windowed real-DFT as two matmuls: frames @ C -> real, frames @ S -> imag.

    The Hann window is folded into the DFT matrices so the whole
    frame->window->rFFT pipeline becomes two MXU matmuls.  At these sizes
    (frame 400, fft 512 -> [400, 257] matrices) the extra FLOPs vs an FFT are
    negligible against the TPU's matmul throughput, and it avoids XLA's slow
    TPU FFT path entirely.
    """
    # rfft(x, n) zero-pads when n > len(x) and TRUNCATES when n < len(x);
    # the window applies to the full frame before truncation, so the
    # effective matrix rows are min(frame_length, fft_length).
    eff = min(frame_length, fft_length)
    n = np.arange(fft_length)[:, None]          # time index within fft frame
    k = np.arange(fft_length // 2 + 1)[None, :]  # output bin
    ang = -2.0 * np.pi * n * k / fft_length
    cos = np.cos(ang)[:eff, :]
    sin = np.sin(ang)[:eff, :]
    win = hann_window(frame_length)[:eff, None].astype(np.float64)
    return (cos * win).astype(np.float32), (sin * win).astype(np.float32)


def stft_power(
    wav: jnp.ndarray,
    frame_length: int,
    frame_step: int,
    fft_length: int,
    *,
    use_matmul_dft: bool = True,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """[B, S] waveform -> [B, T, fft_length//2+1] POWER spectrogram.

    ``use_matmul_dft`` routes through the windowed-DFT-as-matmul path (MXU);
    otherwise XLA's rfft is used.  Both paths are numerically pinned against
    SciPy in tests/test_audio_frontend.py.
    """
    frames = frame_signal(wav, frame_length, frame_step)
    if use_matmul_dft:
        cos_m, sin_m = _dft_matrices(frame_length, fft_length)
        eff = cos_m.shape[0]  # rfft truncates frames longer than fft_length
        f = frames[..., :eff].astype(compute_dtype)
        re = jnp.einsum(
            "btf,fk->btk", f, jnp.asarray(cos_m, compute_dtype),
            preferred_element_type=jnp.float32,
        )
        im = jnp.einsum(
            "btf,fk->btk", f, jnp.asarray(sin_m, compute_dtype),
            preferred_element_type=jnp.float32,
        )
        return re * re + im * im
    frames = frames * jnp.asarray(hann_window(frame_length))
    if fft_length > frame_length:
        pad = [(0, 0)] * (frames.ndim - 1) + [(0, fft_length - frame_length)]
        frames = jnp.pad(frames, pad)
    spec = jnp.fft.rfft(frames.astype(jnp.float32), n=fft_length, axis=-1)
    return jnp.square(jnp.abs(spec))


def stft_magnitude(
    wav: jnp.ndarray, frame_length: int, frame_step: int, fft_length: int
) -> jnp.ndarray:
    """[B, S] waveform -> [B, T, fft_length//2+1] magnitude spectrogram."""
    return jnp.sqrt(
        stft_power(wav, frame_length, frame_step, fft_length,
                   use_matmul_dft=False)
    )


# ---------------------------------------------------------------------------
# Deltas, normalization, stacking
# ---------------------------------------------------------------------------


def delta_features(feat: jnp.ndarray, window: int = 2) -> jnp.ndarray:
    """Regression-formula deltas along time: [B, T, D] -> [B, T, D].

    d_t = sum_{n=1..N} n*(c_{t+n} - c_{t-n}) / (2*sum n^2), edges replicated
    (standard HTK/Kaldi delta computation).
    """
    N = window
    denom = 2.0 * sum(n * n for n in range(1, N + 1))
    padded = jnp.concatenate(
        [jnp.repeat(feat[:, :1], N, axis=1), feat, jnp.repeat(feat[:, -1:], N, axis=1)],
        axis=1,
    )
    T = feat.shape[1]
    out = jnp.zeros_like(feat)
    for n in range(1, N + 1):
        out = out + n * (
            padded[:, N + n : N + n + T] - padded[:, N - n : N - n + T]
        )
    return out / denom


def masked_normalize(
    feat: jnp.ndarray, lengths: jnp.ndarray, eps: float = 1e-8
) -> jnp.ndarray:
    """Per-utterance mean/var normalization over valid frames only."""
    T = feat.shape[1]
    mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(feat.dtype)
    denom = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1.0)[..., None]
    m = mask[..., None]
    mean = jnp.sum(feat * m, axis=1, keepdims=True) / denom
    var = jnp.sum(jnp.square(feat - mean) * m, axis=1, keepdims=True) / denom
    return (feat - mean) * jax.lax.rsqrt(var + eps) * m


def stack_frames(
    feat: jnp.ndarray, lengths: jnp.ndarray, stack: int, skip: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stack `stack` consecutive frames every `skip` frames.

    [B, T, D] -> [B, T', D*stack] with T' = max(0, (T - stack)//skip + 1).
    New lengths follow the same formula per utterance (clamped >= 1 for
    non-empty inputs).
    """
    if stack <= 1 and skip <= 1:
        return feat, lengths
    B, T, D = feat.shape
    Tp = max(0, (T - stack) // skip + 1)
    starts = np.arange(Tp, dtype=np.int32) * skip
    idx = starts[:, None] + np.arange(stack, dtype=np.int32)[None, :]  # [T', k]
    gathered = feat[:, idx]  # [B, T', k, D]
    out = gathered.reshape(B, Tp, stack * D)
    new_len = jnp.maximum((lengths - stack) // skip + 1, jnp.minimum(lengths, 1))
    new_len = jnp.clip(new_len, 0, Tp).astype(jnp.int32)
    # Stacked frames whose window straddles the valid/padded boundary mix
    # real frames with padding — zero them so downstream masks can trust
    # that positions >= new_len are exactly zero.
    out_mask = (jnp.arange(Tp)[None, :] < new_len[:, None]).astype(out.dtype)
    return out * out_mask[..., None], new_len


# ---------------------------------------------------------------------------
# Full frontend
# ---------------------------------------------------------------------------


def logmel_frontend(
    wav: jnp.ndarray,
    wav_lengths: jnp.ndarray,
    cfg: AudioFrontendConfig,
    *,
    compute_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Waveform batch -> feature batch.

    Args:
      wav: [B, S] float32 waveform, zero-padded.
      wav_lengths: [B] int32 valid sample counts.
      cfg: frontend configuration.

    Returns:
      (features [B, T', D_out] float32, feature_lengths [B] int32)
    """
    power = stft_power(
        wav, cfg.frame_length, cfg.frame_step, cfg.fft_length,
        use_matmul_dft=cfg.use_matmul_dft, compute_dtype=compute_dtype,
    )
    feat_len = jnp.where(
        wav_lengths >= cfg.frame_length,
        1 + (wav_lengths - cfg.frame_length) // cfg.frame_step,
        0,
    ).astype(jnp.int32)

    if cfg.feature_type == "spectrogram":
        feat = jnp.log(power + cfg.log_floor)
    else:
        mel_w = jnp.asarray(
            mel_filterbank(
                cfg.num_mel_bins,
                cfg.fft_length // 2 + 1,
                cfg.sample_rate,
                cfg.mel_lower_hz,
                cfg.mel_upper_hz,
            )
        )
        # Power-spectrum -> mel energies: one MXU matmul over the bin axis.
        mel = jnp.einsum(
            "btf,fm->btm", power, mel_w,
            preferred_element_type=jnp.float32,
        )
        feat = jnp.log(mel + cfg.log_floor)

    if cfg.add_deltas:
        # Edge-replicate the last valid frame into the padded tail before the
        # delta windows run: padded frames hold log(log_floor) (~ -13.8) and
        # would otherwise contaminate the deltas of the last valid frames,
        # making tail features depend on the bucket's pad length.  With
        # clamped indices the delta window sees the valid region only (the
        # padded positions themselves are re-zeroed below regardless).
        T_frames = feat.shape[1]
        t_idx = jnp.minimum(
            jnp.arange(T_frames)[None, :],
            jnp.maximum(feat_len[:, None] - 1, 0),
        )
        feat_edge = jnp.take_along_axis(feat, t_idx[..., None], axis=1)
        d1 = delta_features(feat_edge, cfg.delta_window)
        d2 = delta_features(d1, cfg.delta_window)
        feat = jnp.concatenate([feat, d1, d2], axis=-1)

    if cfg.normalization == "per_utterance":
        feat = masked_normalize(feat, feat_len)
    elif cfg.normalization == "global":
        # Batch statistics over VALID frames only: unmasked mean/var would
        # include the padded frames' log-floor values, making features
        # depend on pad length and batch composition (the padding-
        # invariance design invariant).
        T_frames = feat.shape[1]
        m = (
            jnp.arange(T_frames)[None, :] < feat_len[:, None]
        ).astype(feat.dtype)[..., None]
        denom = jnp.maximum(jnp.sum(m) * feat.shape[-1], 1.0)
        mu = jnp.sum(feat * m) / denom
        var = jnp.sum(jnp.square(feat - mu) * m) / denom
        feat = (feat - mu) * jax.lax.rsqrt(var + 1e-8)

    # Zero out padded frames so downstream masked ops can trust zeros.
    T = feat.shape[1]
    mask = (jnp.arange(T)[None, :] < feat_len[:, None]).astype(feat.dtype)
    feat = feat * mask[..., None]

    feat, feat_len = stack_frames(feat, feat_len, cfg.frame_stacking, cfg.frame_skipping)
    return feat, feat_len


def output_frames(cfg: AudioFrontendConfig, num_samples: int) -> int:
    """Static output length for a padded waveform of `num_samples` samples."""
    T = num_frames(num_samples, cfg.frame_length, cfg.frame_step)
    if cfg.frame_stacking > 1 or cfg.frame_skipping > 1:
        T = max(0, (T - cfg.frame_stacking) // cfg.frame_skipping + 1)
    return T
