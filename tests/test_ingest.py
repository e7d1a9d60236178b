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


def test_write_corpus_sharded_streaming(tmp_path):
    """num_shards > 1 writes the write_dataset shard layout, readable as
    one dataset via the shard glob; one utterance in memory at a time."""
    rows = []
    for i in range(5):
        wav_path = str(tmp_path / f"u{i}.wav")
        write_wav(wav_path, 0.1 * np.sin(np.arange(2000) / (3.0 + i)), 16_000)
        rows.append({"uid": f"u{i}", "transcript": f"t{i}", "wav": wav_path})
    out = str(tmp_path / "c.tfrecord")
    n = ingest.write_corpus(rows, out, num_shards=2)
    assert n == 5
    assert not os.path.exists(out)  # sharded: base path is a prefix only
    shards = sorted(
        str(p) for p in tmp_path.glob("c.tfrecord-*-of-00002"))
    assert len(shards) == 2
    got = [u for s in shards for u in tfrecord.read_dataset(s)]
    assert [u.uid for u in got] == [f"u{i}" for i in range(5)]
    assert got[3].waveform.shape == (2000,)


def test_read_manifest_csv_paths_and_transcript_files(tmp_path):
    """read_manifest: relative paths resolve against the manifest dir,
    transcript_file is read (LRS2 'Text:' prefix stripped), blank cells
    drop out, and path columns come back absolute."""
    sub = tmp_path / "corpus"
    sub.mkdir()
    (sub / "u1.txt").write_text("Text:  HELLO WORLD\nConf: 4\n")
    man = sub / "man.csv"
    man.write_text(
        "uid,transcript,transcript_file,wav,roi_npy\n"
        "u0,hi there,,audio/u0.wav,\n"
        "u1,,u1.txt,/abs/u1.wav,rois/u1.npy\n"
    )
    rows = ingest.read_manifest(str(man))
    assert rows[0]["uid"] == "u0"
    assert rows[0]["transcript"] == "hi there"
    assert rows[0]["wav"] == str(sub / "audio" / "u0.wav")
    assert "roi_npy" not in rows[0]  # blank cell dropped
    assert rows[1]["transcript"] == "HELLO WORLD"
    assert rows[1]["wav"] == "/abs/u1.wav"  # absolute passes through
    assert rows[1]["roi_npy"] == str(sub / "rois" / "u1.npy")
    assert "transcript_file" not in rows[1]  # consumed at parse time


def test_read_manifest_tsv_and_errors(tmp_path):
    tsv = tmp_path / "man.tsv"
    tsv.write_text("uid\ttranscript\nu0\thello tab world\n")
    rows = ingest.read_manifest(str(tsv))
    assert rows == [{"uid": "u0", "transcript": "hello tab world"}]

    bad = tmp_path / "bad.csv"
    bad.write_text("name,transcript\nu0,x\n")
    with pytest.raises(ValueError, match="uid"):
        ingest.read_manifest(str(bad))

    empty_uid = tmp_path / "empty_uid.csv"
    empty_uid.write_text("uid,transcript\n,x\n")
    with pytest.raises(ValueError, match="empty uid"):
        ingest.read_manifest(str(empty_uid))

    both = tmp_path / "both.csv"
    (tmp_path / "t.txt").write_text("words")
    both.write_text("uid,transcript,transcript_file\nu0,x,t.txt\n")
    with pytest.raises(ValueError, match="both"):
        ingest.read_manifest(str(both))


def test_cli_write_records_manifest(tmp_path):
    """The user path: manifest CSV -> `cli write-records --manifest` ->
    readable TFRecord corpus."""
    from avsr_tpu import cli

    wav_path = str(tmp_path / "u0.wav")
    write_wav(wav_path, 0.2 * np.sin(np.arange(4000) / 5.0), 16_000)
    man = tmp_path / "man.csv"
    man.write_text(f"uid,transcript,wav\nu0,good morning,u0.wav\n")
    out = str(tmp_path / "real.tfrecord")
    rc = cli.main(["write-records", "--manifest", str(man), "--out", out])
    assert rc == 0
    got = tfrecord.read_dataset(out)
    assert got[0].uid == "u0" and got[0].transcript == "good morning"
    assert got[0].waveform.shape == (4000,)


# ---------------------------------------------------------------------------
# tracked ROI pipeline (synthetic video with a known moving mouth)
# ---------------------------------------------------------------------------


def synth_face_video(T=40, H=120, W=160, jitter=0.0, drop_every=0,
                     seed=0, mouth_move=True):
    """Synthetic talking head: bright face square drifting right, a mouth
    blob oscillating inside its lower third.  Returns (frames [T,H,W],
    detections per frame (with optional jitter/dropouts), true mouth
    centers [T, 2])."""
    rng = np.random.default_rng(seed)
    frames = np.zeros((T, H, W), np.float32)
    dets, centers = [], []
    fw = fh = 60
    for t in range(T):
        fx = 30 + t * 0.5          # slow drift
        fy = 25.0
        face = (int(round(fx)), int(round(fy)))
        frames[t, face[1]:face[1]+fh, face[0]:face[0]+fw] = 0.35
        # mouth: blob centered in the lower third, oscillating open/closed
        mcx = fx + fw / 2.0
        mcy = fy + fh * 5.0 / 6.0
        open_amt = 3.0 + (2.5 * np.sin(t * 1.1) if mouth_move else 0.0)
        yy, xx = np.mgrid[0:H, 0:W]
        blob = np.exp(-(((xx - mcx) / 6.0) ** 2
                        + ((yy - mcy) / open_amt) ** 2))
        frames[t] += 0.6 * blob
        centers.append((mcx, mcy))
        det = None
        if not (drop_every and t % drop_every):
            jx, jy = rng.normal(0, jitter, 2) if jitter else (0.0, 0.0)
            det = (fx + jx, fy + jy, fw, fh)
        dets.append(det)
    return frames, dets, np.asarray(centers, np.float32)


def roi_center_error(frames, dets, centers, **kw):
    """Mean distance between each frame's crop center and the true mouth."""
    from avsr_tpu.data.ingest import motion_mouth_center, track_boxes

    boxes = track_boxes(dets, frames.shape[1:], kw.get("smooth_window", 7))
    if kw.get("use_motion", True):
        cx, cy = motion_mouth_center(frames, boxes)
    else:
        cx, cy = 0.5, 5.0 / 6.0
    errs = []
    for t in range(frames.shape[0]):
        x, y, w, h = boxes[t]
        errs.append(np.hypot(x + cx * w - centers[t, 0],
                             y + cy * h - centers[t, 1]))
    return float(np.mean(errs))


def test_tracked_roi_center_error_bounded():
    """VERDICT round-2 next #6 'done' bar: ROI center error bounded on a
    synthetic fixture with a known moving mouth."""
    frames, dets, centers = synth_face_video(jitter=4.0, drop_every=3, seed=1)
    err = roi_center_error(frames, dets, centers)
    assert err < 6.0, err  # within ~10% of the 60 px face box

    rois = ingest.rois_from_frames(frames, dets, roi_size=36)
    assert rois.shape == (40, 36, 36, 1)
    assert 0.0 <= rois.min() and rois.max() <= 1.0
    # the mouth blob (brightest object) must actually be in the crops
    assert rois.max() > 0.5


def test_tracking_beats_unsmoothed_jittery_detections():
    frames, dets, centers = synth_face_video(jitter=6.0, drop_every=4, seed=2)
    smoothed = roi_center_error(frames, dets, centers, smooth_window=9)
    raw = roi_center_error(frames, dets, centers, smooth_window=1)
    assert smoothed <= raw + 1e-6, (smoothed, raw)


def test_motion_localization_beats_geometric_prior_when_mouth_off_center():
    """Shift the true mouth off the geometric lower-third center: motion
    energy must pull the crop toward it."""
    frames, dets, centers = synth_face_video(seed=3)
    # displace the mouth blob: regenerate with mouth at 0.35 of face width
    T, H, W = frames.shape
    frames2 = np.zeros_like(frames)
    centers2 = []
    fw = fh = 60
    for t in range(T):
        fx, fy = 30 + t * 0.5, 25.0
        frames2[t, int(fy):int(fy)+fh, int(round(fx)):int(round(fx))+fw] = 0.35
        mcx = fx + fw * 0.35
        mcy = fy + fh * 0.72
        open_amt = 3.0 + 2.5 * np.sin(t * 1.1)
        yy, xx = np.mgrid[0:H, 0:W]
        frames2[t] += 0.6 * np.exp(-(((xx - mcx) / 6.0) ** 2
                                     + ((yy - mcy) / open_amt) ** 2))
        centers2.append((mcx, mcy))
    centers2 = np.asarray(centers2, np.float32)
    with_motion = roi_center_error(frames2, dets, centers2, use_motion=True)
    without = roi_center_error(frames2, dets, centers2, use_motion=False)
    assert with_motion < without, (with_motion, without)
    assert with_motion < 6.0, with_motion


def test_track_boxes_interpolates_and_falls_back():
    from avsr_tpu.data.ingest import track_boxes

    # interpolation across a dropout
    dets = [(10.0, 20.0, 30.0, 30.0), None, (14.0, 20.0, 30.0, 30.0)]
    track = track_boxes(dets, (100, 100), smooth_window=1)
    np.testing.assert_allclose(track[1], [12.0, 20.0, 30.0, 30.0])
    # no detections at all -> centered lower-third fallback, all frames
    track = track_boxes([None, None], (90, 120), smooth_window=1)
    np.testing.assert_allclose(track[0], [40.0, 60.0, 40.0, 30.0])
    np.testing.assert_allclose(track[0], track[1])


def test_landmark_rois_and_openface_csv(tmp_path):
    """Reference-parity path: OpenFace 68-point CSV -> mouth-hull crops
    centered on the true mouth."""
    frames, _, centers = synth_face_video(seed=4)
    T = frames.shape[0]
    # synthesize landmarks: mouth points (48-67) ring the true mouth center
    lms = np.zeros((T, 68, 2), np.float32)
    ang = np.linspace(0, 2 * np.pi, 20, endpoint=False)
    for t in range(T):
        lms[t, :, 0] = centers[t, 0]  # park non-mouth points at the center
        lms[t, :, 1] = centers[t, 1]
        lms[t, 48:68, 0] = centers[t, 0] + 10.0 * np.cos(ang)
        lms[t, 48:68, 1] = centers[t, 1] + 5.0 * np.sin(ang)
    rois = ingest.rois_from_landmarks(frames, lms, roi_size=36)
    assert rois.shape == (T, 36, 36, 1)
    # the crop is centered on the mouth: the blob peak sits mid-crop
    mid = rois[:, 10:26, 10:26, 0].max()
    assert mid == rois.max()

    # CSV round trip
    path = str(tmp_path / "of.csv")
    cols = (["frame"] + [f"x_{i}" for i in range(68)]
            + [f"y_{i}" for i in range(68)])
    with open(path, "w") as f:
        f.write(",".join(cols) + "\n")
        for t in range(T):
            row = [str(t)] + [f"{v:.2f}" for v in lms[t, :, 0]] \
                + [f"{v:.2f}" for v in lms[t, :, 1]]
            f.write(",".join(row) + "\n")
    loaded = ingest.load_openface_landmarks(path)
    np.testing.assert_allclose(loaded, lms, atol=0.01)


def test_build_utterance_roi_npy_import(tmp_path):
    """Externally-extracted ROI stacks import verbatim (uint8 normalized)."""
    rois = (np.random.default_rng(5).random((7, 36, 36)) * 255).astype(
        np.uint8)
    path = str(tmp_path / "rois.npy")
    np.save(path, rois)
    utt = ingest.build_utterance("u0", "ab", roi_npy_path=path)
    assert utt.video.shape == (7, 36, 36, 1)
    assert utt.video.max() <= 1.0
    np.testing.assert_allclose(
        utt.video[..., 0], rois.astype(np.float32) / 255.0, atol=1e-6
    )


def test_bank_from_wavs_rows_and_tiling(tmp_path):
    """Recorded-noise bank ingress (SURVEY §5.9): long recordings are cut
    into consecutive rows; short ones are tiled to one full row."""
    rng = np.random.default_rng(7)
    long_path = str(tmp_path / "babble_long.wav")
    short_path = str(tmp_path / "babble_short.wav")
    long_x = rng.uniform(-0.5, 0.5, 2500).astype(np.float32)
    short_x = rng.uniform(-0.5, 0.5, 400).astype(np.float32)
    write_wav(long_path, long_x, 16_000)
    write_wav(short_path, short_x, 16_000)

    bank = ingest.bank_from_wavs([long_path, short_path], row_samples=1000)
    assert bank.shape == (3, 1000)  # 2 rows from long (remainder dropped)
    # rows are the consecutive segments of the recording
    ref = ingest.load_wav(long_path)
    np.testing.assert_allclose(bank[0], ref[:1000], atol=1e-6)
    np.testing.assert_allclose(bank[1], ref[1000:2000], atol=1e-6)
    # short recording tiled: second period repeats the first
    np.testing.assert_allclose(bank[2][:400], bank[2][400:800], atol=1e-6)

    with pytest.raises(ValueError, match="silent"):
        silent = str(tmp_path / "silent.wav")
        write_wav(silent, np.zeros(2000, np.float32), 16_000)
        ingest.bank_from_wavs([silent], row_samples=1000)


def test_cli_noise_bank_from_wav_list(tmp_path):
    """CLI write-records --noise-wavs: list file of real recordings -> one
    typed bank record, loadable by the AVSR noise-bank reader."""
    from avsr_tpu.cli import main as cli_main

    rng = np.random.default_rng(9)
    paths = []
    for i in range(2):
        p = str(tmp_path / f"cafe{i}.wav")
        write_wav(p, rng.uniform(-0.4, 0.4, 1500).astype(np.float32), 16_000)
        paths.append(p)
    lst = tmp_path / "cafe.list"
    lst.write_text("# cafe recordings\n" + "\n".join(paths) + "\n")
    out = str(tmp_path / "cafe_bank.tfrecord")

    rc = cli_main(["write-records", "--noise-wavs", str(lst),
                   "--noise-out", out, "--noise-samples", "600"])
    assert rc == 0 or rc is None

    rows = [u.waveform for u in tfrecord.read_dataset(out)]
    assert len(rows) == 4  # 2 recordings x 2 rows each (1500 // 600 = 2)
    assert all(len(r) == 600 for r in rows)
    # the trainer-side loader accepts it as a typed bank
    from avsr_tpu.avsr import _load_noise_bank

    bank = _load_noise_bank({"cafe": out})
    assert bank["cafe"].shape == (1, 2400)
