"""Audio frontend numerics vs NumPy/SciPy golden values (SURVEY.md §4.1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.signal

from avsr_tpu.configs import AudioFrontendConfig
from avsr_tpu.ops import audio_features as af


def test_framing_matches_manual():
    x = np.arange(100, dtype=np.float32)[None, :]
    frames = np.asarray(af.frame_signal(jnp.asarray(x), 25, 10))
    T = af.num_frames(100, 25, 10)
    assert frames.shape == (1, T, 25)
    for t in range(T):
        np.testing.assert_array_equal(frames[0, t], x[0, t * 10 : t * 10 + 25])


def test_stft_matches_scipy(rng):
    sr = 16000
    wav = rng.standard_normal(sr // 4).astype(np.float32)
    frame_len, frame_step, nfft = 400, 160, 512
    mag = np.asarray(
        af.stft_magnitude(jnp.asarray(wav[None]), frame_len, frame_step, nfft)
    )[0]
    # scipy reference: same periodic Hann, no padding of the edges
    win = scipy.signal.get_window("hann", frame_len, fftbins=True)
    T = af.num_frames(len(wav), frame_len, frame_step)
    for t in [0, T // 2, T - 1]:
        seg = wav[t * frame_step : t * frame_step + frame_len] * win
        ref = np.abs(np.fft.rfft(seg, nfft))
        np.testing.assert_allclose(mag[t], ref, rtol=1e-4, atol=1e-4)


def test_matmul_dft_matches_fft(rng):
    """The MXU matmul-DFT path must equal the FFT path (power spectrum)."""
    wav = rng.standard_normal((2, 4000)).astype(np.float32)
    p_fft = np.asarray(
        af.stft_power(jnp.asarray(wav), 400, 160, 512, use_matmul_dft=False)
    )
    p_mm = np.asarray(
        af.stft_power(jnp.asarray(wav), 400, 160, 512, use_matmul_dft=True)
    )
    np.testing.assert_allclose(p_mm, p_fft, rtol=2e-3, atol=2e-3)


def test_mel_filterbank_properties():
    fb = af.mel_filterbank(30, 257, 16000, 80.0, 7600.0)
    assert fb.shape == (257, 30)
    assert np.all(fb >= 0)
    # Every mel bin has some support; interior spectrogram bins inside the
    # passband are covered.
    assert np.all(fb.sum(axis=0) > 0)
    # Triangles peak at 1 after normalization-free construction
    assert fb.max() <= 1.0 + 1e-6


def test_deltas_match_reference_formula(rng):
    feat = rng.standard_normal((2, 20, 5)).astype(np.float32)
    out = np.asarray(af.delta_features(jnp.asarray(feat), window=2))
    # brute force
    N = 2
    denom = 2 * sum(n * n for n in range(1, N + 1))
    padded = np.concatenate(
        [np.repeat(feat[:, :1], N, 1), feat, np.repeat(feat[:, -1:], N, 1)], 1
    )
    ref = np.zeros_like(feat)
    for t in range(feat.shape[1]):
        acc = np.zeros_like(feat[:, 0])
        for n in range(1, N + 1):
            acc += n * (padded[:, t + N + n] - padded[:, t + N - n])
        ref[:, t] = acc / denom
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_masked_normalize_ignores_padding(rng):
    feat = rng.standard_normal((2, 10, 4)).astype(np.float32)
    lengths = np.array([10, 6], np.int32)
    out = np.asarray(af.masked_normalize(jnp.asarray(feat), jnp.asarray(lengths)))
    # valid region of row 1 is mean-0/var-1 regardless of padding contents
    valid = out[1, :6]
    assert abs(valid.mean()) < 1e-4
    assert abs(valid.var() - 1.0) < 1e-3
    # padded region zeroed
    np.testing.assert_allclose(out[1, 6:], 0.0, atol=1e-6)


def test_stack_frames_shapes_and_content(rng):
    feat = rng.standard_normal((1, 11, 3)).astype(np.float32)
    lengths = np.array([11], np.int32)
    out, new_len = af.stack_frames(jnp.asarray(feat), jnp.asarray(lengths), 4, 3)
    out = np.asarray(out)
    Tp = (11 - 4) // 3 + 1
    assert out.shape == (1, Tp, 12)
    np.testing.assert_allclose(out[0, 1], feat[0, 3:7].reshape(-1))
    assert int(new_len[0]) == Tp


def test_full_frontend_shapes_and_lengths():
    cfg = AudioFrontendConfig()
    B, S = 3, 16000
    wav = np.random.default_rng(1).standard_normal((B, S)).astype(np.float32)
    lengths = np.array([16000, 8000, 4000], np.int32)
    feat, feat_len = jax.jit(
        lambda w, l: af.logmel_frontend(w, l, cfg)
    )(jnp.asarray(wav), jnp.asarray(lengths))
    feat = np.asarray(feat)
    assert feat.shape[0] == B
    assert feat.shape[2] == cfg.output_dim
    assert feat.shape[1] == af.output_frames(cfg, S)
    # shorter utterances -> shorter feature lengths, monotone
    fl = np.asarray(feat_len)
    assert fl[0] > fl[1] > fl[2] > 0
    # padded frames are exactly zero
    assert np.allclose(feat[2, fl[2]:], 0.0)


def test_frontend_bf16_tolerance():
    """bf16 DFT path stays within a tolerance band of fp32 (SURVEY §4.3);
    normalized log-mel features are robust to matmul precision."""
    cfg = AudioFrontendConfig(add_deltas=False)
    rng = np.random.default_rng(3)
    wav = jnp.asarray(rng.standard_normal((2, 16000)).astype(np.float32))
    lengths = jnp.asarray([16000, 16000], jnp.int32)
    f32, _ = af.logmel_frontend(wav, lengths, cfg, compute_dtype=jnp.float32)
    bf16, _ = af.logmel_frontend(wav, lengths, cfg, compute_dtype=jnp.bfloat16)
    # features are CMVN-normalized; compare absolutely
    err = np.abs(np.asarray(f32) - np.asarray(bf16))
    assert np.percentile(err, 99) < 0.15, np.percentile(err, 99)
    assert err.mean() < 0.05, err.mean()


def test_global_normalization_pad_invariant():
    """normalization='global' statistics run over VALID frames only: the
    same utterance in a longer bucket must produce identical features."""
    cfg = AudioFrontendConfig(normalization="global")
    rng = np.random.default_rng(3)
    wav = rng.standard_normal(6000).astype(np.float32)
    w1 = np.zeros((1, 8000), np.float32)
    w1[0, :6000] = wav
    w2 = np.zeros((1, 12000), np.float32)
    w2[0, :6000] = wav
    l = jnp.asarray([6000], jnp.int32)
    f1, n1 = af.logmel_frontend(jnp.asarray(w1), l, cfg)
    f2, n2 = af.logmel_frontend(jnp.asarray(w2), l, cfg)
    T = int(n1[0])
    np.testing.assert_allclose(np.asarray(f1[0, :T]), np.asarray(f2[0, :T]),
                               rtol=1e-5, atol=1e-6)
    # padded positions stay exactly zero
    assert np.all(np.asarray(f2[0, int(n2[0]):]) == 0.0)


def test_frontend_padding_invariance():
    """Same audio padded to different lengths -> identical valid features
    (SURVEY §4.3 property test)."""
    cfg = AudioFrontendConfig(normalization="per_utterance")
    rng = np.random.default_rng(2)
    wav = rng.standard_normal(6000).astype(np.float32)
    w1 = np.zeros((1, 8000), np.float32)
    w1[0, :6000] = wav
    w2 = np.zeros((1, 12000), np.float32)
    w2[0, :6000] = wav
    l = jnp.asarray([6000], jnp.int32)
    f1, n1 = af.logmel_frontend(jnp.asarray(w1), l, cfg)
    f2, n2 = af.logmel_frontend(jnp.asarray(w2), l, cfg)
    assert int(n1[0]) == int(n2[0])
    T = int(n1[0])
    np.testing.assert_allclose(
        np.asarray(f1)[0, :T], np.asarray(f2)[0, :T], rtol=2e-4, atol=2e-4
    )
