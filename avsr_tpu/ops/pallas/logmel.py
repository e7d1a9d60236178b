"""Fused log-mel frontend as a Pallas TPU kernel.

The north star calls for the audio frontend as fused Pallas/XLA kernels
[BASELINE.json:north_star].  The XLA path (ops/audio_features.py) already
fuses window->DFT->mel->log into a few MXU matmuls, but it must first
materialize the overlapping frame tensor in HBM ([B, T, 400] — a ~2.5x
blow-up of the waveform, written and read back).  This kernel removes that
round-trip: the waveform is viewed as hop rows [n_hops, frame_step], each
grid step DMAs its TILE_T+2 hop rows into VMEM, and the windowed DFT is
computed IN HOP SPACE — frame i spans hop rows i, i+1, i+2, so

    re = H[0:T] @ C0 + H[1:T+1] @ C1 + H[2:T+2] @ C2

where C0/C1/C2 are the window-folded DFT matrix split into frame_step-sized
row blocks (C2 zero-padded past the frame end).  All slices are static and
all matmuls hit the MXU; no per-frame gather, no dynamic misaligned VMEM
indexing (Mosaic requires lane-dim slices to be 128-aligned — the naive
per-frame formulation fails to compile).

Applicability: frame_length <= 3 * frame_step (the standard 25 ms / 10 ms
speech configuration: 400 <= 480).  Callers fall back to the XLA path
otherwise.  Numerics pinned against the XLA path in
tests/test_pallas_logmel.py (interpret mode on CPU; compiled on TPU,
maxerr 2.4e-3 on v5e).

STATUS (v5e, B=32 x 6 s): this kernel 25.0 ms (with the double-buffered
DMA pipeline below; 27.8 ms without) vs 2.4 ms for the XLA matmul-DFT
path — per-grid-step overhead on this platform dominates regardless of
DMA overlap.  The XLA path (ops/audio_features.stft_power) is therefore
the production frontend; this kernel is kept as the correctness-pinned
Pallas formulation.  Next idea if revisited: process several tiles per
grid step to amortize the per-step cost.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from avsr_tpu.ops.audio_features import hann_window, mel_filterbank

TILE_T = 128  # frames per grid step


def _hop_dft_blocks(
    frame_length: int, frame_step: int, fft_length: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Window-folded DFT matrices split into 3 hop-row blocks.

    Returns (cos_blocks, sin_blocks), each [3, frame_step, n_bins].
    """
    if frame_length > 3 * frame_step:
        raise ValueError("hop-space kernel requires frame_length <= 3*frame_step")
    eff = min(frame_length, fft_length)
    n = np.arange(fft_length)[:, None]
    k = np.arange(fft_length // 2 + 1)[None, :]
    ang = -2.0 * np.pi * n * k / fft_length
    win = hann_window(frame_length)[:eff, None].astype(np.float64)
    cos = (np.cos(ang)[:eff, :] * win).astype(np.float32)  # [eff, bins]
    sin = (np.sin(ang)[:eff, :] * win).astype(np.float32)
    n_bins = cos.shape[1]
    hop_pad = -(-frame_step // 128) * 128
    cos_b = np.zeros((3, hop_pad, n_bins), np.float32)
    sin_b = np.zeros((3, hop_pad, n_bins), np.float32)
    for j in range(3):
        lo = j * frame_step
        hi = min((j + 1) * frame_step, eff)
        if lo < hi:
            cos_b[j, : hi - lo] = cos[lo:hi]
            sin_b[j, : hi - lo] = sin[lo:hi]
    return cos_b, sin_b


def pallas_logmel(
    wav: jnp.ndarray,
    *,
    frame_length: int = 400,
    frame_step: int = 160,
    fft_length: int = 512,
    num_mel_bins: int = 30,
    sample_rate: int = 16_000,
    mel_lower_hz: float = 80.0,
    mel_upper_hz: float = 7_600.0,
    log_floor: float = 1e-6,
    interpret: bool = False,
) -> jnp.ndarray:
    """[B, S] waveform -> [B, T, num_mel_bins] log-mel, T = full frame count.

    Frames past the true frame count of S are computed from padding and must
    be masked by length downstream (framework invariant).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, S = wav.shape
    T = max(1 + (S - frame_length) // frame_step, 1)
    num_tiles = -(-T // TILE_T)
    T_pad = num_tiles * TILE_T
    # hop rows needed: frame (T_pad-1) spans hops T_pad-1 .. T_pad+1; the
    # per-tile DMA row count must be sublane-aligned (multiple of 8), so
    # reserve 8 extra hop rows.
    n_hops = T_pad + 8
    S_need = n_hops * frame_step
    if S_need > S:
        wav = jnp.pad(wav, ((0, 0), (0, S_need - S)))
    # hop rows padded to a lane multiple (128); the DFT blocks have zero
    # rows in the padded lanes, so they contribute nothing.
    hop_pad = -(-frame_step // 128) * 128
    wav2d = wav[:, :S_need].reshape(B, n_hops, frame_step)
    wav2d = jnp.pad(wav2d, ((0, 0), (0, 0), (0, hop_pad - frame_step)))

    cos_b, sin_b = _hop_dft_blocks(frame_length, frame_step, fft_length)
    n_bins = fft_length // 2 + 1
    mel_m = mel_filterbank(
        num_mel_bins, n_bins, sample_rate, mel_lower_hz, mel_upper_hz
    )

    ROWS = TILE_T + 8  # sublane-aligned DMA row count

    # Flatten (batch, tile) into ONE grid axis so the double-buffered DMA
    # pipeline runs across the whole problem without refilling.
    n_steps = B * num_tiles

    def kernel(wav_ref, cos_ref, sin_ref, mel_ref, out_ref, seg_ref, sem):
        step = pl.program_id(0)

        def start_dma(slot, s):
            b = s // num_tiles
            t = s % num_tiles
            return pltpu.make_async_copy(
                wav_ref.at[b, pl.ds(t * TILE_T, ROWS), :],
                seg_ref.at[slot],
                sem.at[slot],
            )

        slot = step % 2
        # Warm up the pipeline on the first step.
        @pl.when(step == 0)
        def _():
            start_dma(0, 0).start()

        # Prefetch the NEXT tile while computing this one.
        @pl.when(step + 1 < n_steps)
        def _():
            start_dma((step + 1) % 2, step + 1).start()

        start_dma(slot, step).wait()
        re = jnp.zeros((TILE_T, n_bins), jnp.float32)
        im = jnp.zeros((TILE_T, n_bins), jnp.float32)
        for j in range(3):  # static shifts: frame i spans hop rows i..i+2
            hops = seg_ref[slot, j : j + TILE_T, :]
            re = re + jnp.dot(hops, cos_ref[j], preferred_element_type=jnp.float32)
            im = im + jnp.dot(hops, sin_ref[j], preferred_element_type=jnp.float32)
        power = re * re + im * im
        mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32)
        out_ref[0, :, :] = jnp.log(mel + log_floor)

    out = pl.pallas_call(
        kernel,
        grid=(n_steps,),
        in_specs=[
            # whole hop-view waveform stays in HBM/ANY (TPU lowering requires
            # ANY blocks be the full array); the kernel DMAs its rows
            pl.BlockSpec((B, n_hops, hop_pad), lambda s: (0, 0, 0),
                         memory_space=pl.ANY),
            pl.BlockSpec((3, hop_pad, n_bins), lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, hop_pad, n_bins), lambda s: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_bins, num_mel_bins), lambda s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_T, num_mel_bins),
            lambda s: (s // num_tiles, s % num_tiles, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, T_pad, num_mel_bins), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, hop_pad), jnp.float32),  # double buffer
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(wav2d, jnp.asarray(cos_b), jnp.asarray(sin_b), jnp.asarray(mel_m))
    return out[:, :T, :]
