"""Real-media ingest tests (SURVEY.md §2.2 rows 11/15): wav parsing and
resampling numerics, OpenFace AU CSV import, lip-ROI extraction, and the
manifest -> TFRecord corpus writer."""

import os
import wave

import numpy as np
import pytest

from avsr_tpu.data import ingest, tfrecord


def write_wav(path, x, rate, width=2, channels=1):
    """x: float32 in [-1, 1] (mono) or [N, C]."""
    x = np.asarray(x, np.float32)
    if channels > 1 and x.ndim == 1:
        x = np.tile(x[:, None], (1, channels))
    if width == 2:
        data = np.clip(x * 32767.0, -32768, 32767).astype("<i2").tobytes()
    elif width == 1:
        data = (np.clip(x, -1, 1) * 128.0 + 128.0).clip(0, 255).astype(
            np.uint8).tobytes()
    else:
        raise ValueError(width)
    with wave.open(path, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        w.writeframes(data)


def dominant_freq(x, rate):
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    return np.argmax(spec) * rate / len(x)


def test_load_wav_pcm16_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = (rng.uniform(-0.9, 0.9, 8000)).astype(np.float32)
    p = str(tmp_path / "a.wav")
    write_wav(p, x, 16_000)
    y = ingest.load_wav(p, target_rate=16_000)
    assert y.dtype == np.float32 and y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=1.0 / 32767.0)


def test_load_wav_resamples_preserving_pitch(tmp_path):
    rate_in = 8_000
    t = np.arange(rate_in) / rate_in  # 1 s
    x = 0.5 * np.sin(2 * np.pi * 440.0 * t)
    p = str(tmp_path / "b.wav")
    write_wav(p, x, rate_in)
    y = ingest.load_wav(p, target_rate=16_000)
    assert abs(len(y) - 16_000) <= 2  # duration preserved
    assert abs(dominant_freq(y, 16_000) - 440.0) < 5.0  # pitch preserved


def test_load_wav_stereo_averages_channels(tmp_path):
    x = np.linspace(-0.5, 0.5, 4000).astype(np.float32)
    p = str(tmp_path / "c.wav")
    write_wav(p, x, 16_000, channels=2)
    y = ingest.load_wav(p, target_rate=16_000)
    assert y.shape == x.shape
    np.testing.assert_allclose(y, x, atol=2.0 / 32767.0)


def test_load_wav_8bit(tmp_path):
    x = 0.25 * np.sin(np.arange(4000) / 10.0)
    p = str(tmp_path / "d.wav")
    write_wav(p, x, 16_000, width=1)
    y = ingest.load_wav(p, target_rate=16_000)
    np.testing.assert_allclose(y, x, atol=1.5 / 128.0)


def test_resample_linear_identity():
    x = np.random.default_rng(1).standard_normal(1000).astype(np.float32)
    np.testing.assert_array_equal(ingest.resample_linear(x, 16_000, 16_000), x)


def test_load_openface_aus(tmp_path):
    p = str(tmp_path / "aus.csv")
    with open(p, "w") as f:
        f.write("frame, timestamp, AU01_r, AU12_r, AU01_c\n")
        f.write("1, 0.00, 0.5, 1.5, 1\n")
        f.write("2, 0.04, 0.7, 1.7, 0\n")
    au = ingest.load_openface_aus(p)
    # only the _r intensity columns, in header order
    assert au.shape == (2, 2)
    np.testing.assert_allclose(au, [[0.5, 1.5], [0.7, 1.7]])
    # explicit column selection
    au1 = ingest.load_openface_aus(p, au_columns=["AU12_r"])
    np.testing.assert_allclose(au1[:, 0], [1.5, 1.7])


def test_load_openface_aus_empty_raises(tmp_path):
    p = str(tmp_path / "empty.csv")
    with open(p, "w") as f:
        f.write("frame, timestamp\n")
    with pytest.raises(ValueError):
        ingest.load_openface_aus(p)


@pytest.fixture
def tiny_video(tmp_path):
    cv2 = pytest.importorskip("cv2")
    p = str(tmp_path / "v.avi")
    w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"MJPG"), 25.0, (64, 48))
    if not w.isOpened():
        pytest.skip("no usable video codec in this OpenCV build")
    rng = np.random.default_rng(2)
    for _ in range(4):
        frame = rng.integers(0, 255, (48, 64, 3), np.uint8)
        w.write(frame)
    w.release()
    return p


def test_extract_lip_rois_shape_and_range(tiny_video):
    rois = ingest.extract_lip_rois(tiny_video, roi_size=36)
    assert rois.shape == (4, 36, 36, 1)
    assert rois.dtype == np.float32
    assert rois.min() >= 0.0 and rois.max() <= 1.0


def test_extract_lip_rois_max_frames(tiny_video):
    rois = ingest.extract_lip_rois(tiny_video, roi_size=24, max_frames=2)
    assert rois.shape == (2, 24, 24, 1)


def test_write_corpus_manifest(tmp_path):
    t = np.arange(8000) / 16_000.0
    wav_path = str(tmp_path / "u.wav")
    write_wav(wav_path, 0.3 * np.sin(2 * np.pi * 500 * t), 16_000)
    au_path = str(tmp_path / "u.csv")
    with open(au_path, "w") as f:
        f.write("frame, AU01_r\n1, 0.5\n2, 0.6\n")
    out = str(tmp_path / "c.tfrecord")
    n = ingest.write_corpus(
        [{"uid": "u0", "transcript": "hello", "wav": wav_path,
          "au_csv": au_path}],
        out,
    )
    assert n == 1
    got = tfrecord.read_dataset(out)
    assert got[0].uid == "u0" and got[0].transcript == "hello"
    assert got[0].waveform.shape == (8000,)
    assert got[0].au.shape == (2, 1)
