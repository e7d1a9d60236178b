"""Pallas fused log-mel kernel vs the XLA path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from avsr_tpu.ops import audio_features as af
from avsr_tpu.ops.pallas.logmel import pallas_logmel


def xla_logmel(wav, frame_length=400, frame_step=160, fft_length=512,
               num_mel=30, floor=1e-6):
    power = af.stft_power(jnp.asarray(wav), frame_length, frame_step,
                          fft_length, use_matmul_dft=True)
    mel_w = jnp.asarray(af.mel_filterbank(num_mel, fft_length // 2 + 1,
                                          16000, 80.0, 7600.0))
    mel = jnp.einsum("btf,fm->btm", power, mel_w,
                     preferred_element_type=jnp.float32)
    return jnp.log(mel + floor)


def test_pallas_logmel_matches_xla(rng):
    wav = rng.standard_normal((2, 16000)).astype(np.float32)
    ref = np.asarray(xla_logmel(wav))
    got = np.asarray(pallas_logmel(jnp.asarray(wav), interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)


def test_pallas_logmel_short_utterance(rng):
    # fewer frames than one tile
    wav = rng.standard_normal((1, 4000)).astype(np.float32)
    ref = np.asarray(xla_logmel(wav))
    got = np.asarray(pallas_logmel(jnp.asarray(wav), interpret=True))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=5e-3, atol=5e-3)
