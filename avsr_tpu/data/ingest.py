"""Offline media ingestion: raw audio/video -> Utterances -> TFRecords.

Rebuild of the reference's L0 preprocessing + dataset-writing path
(upstream:avsr/dataset_writer.py and companion ROI tooling, SURVEY.md §2.2
rows 11/15, §3.3): load waveforms, resample, extract lip-ROI crops from
video (face detection + mouth-region crop), import precomputed OpenFace
action-unit CSVs, and serialize per-utterance SequenceExamples.

Everything here is OFFLINE tooling — it never runs in the training path.
Imports of cv2 are gated so environments without media libraries can still
train from prepared records.  The reference used dlib/OpenFace landmarks;
this implementation uses OpenCV's Haar face detector with a geometric
mouth-region heuristic (lower third of the face box), which matches the
reference's ~36x36 grayscale lip crops contract (SURVEY §2.2 row 9).
"""

from __future__ import annotations

import csv
import os
import wave
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from avsr_tpu.data.synthetic import Utterance
from avsr_tpu.data.tfrecord import write_dataset


# ---------------------------------------------------------------------------
# audio
# ---------------------------------------------------------------------------


def load_wav(path: str, target_rate: int = 16_000) -> np.ndarray:
    """Load a PCM wav file -> float32 [-1, 1], resampled to target_rate."""
    with wave.open(path, "rb") as w:
        rate = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        channels = w.getnchannels()
        raw = w.readframes(n)
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}[width]
    x = np.frombuffer(raw, dtype).astype(np.float32)
    if width == 1:
        x = (x - 128.0) / 128.0
    else:
        x = x / float(np.iinfo(dtype).max)
    if channels > 1:
        x = x.reshape(-1, channels).mean(axis=1)
    if rate != target_rate:
        x = resample_linear(x, rate, target_rate)
    return x


def resample_linear(x: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    """Linear-interpolation resampler (offline tooling quality bar)."""
    n_out = int(round(len(x) * dst_rate / src_rate))
    src_t = np.arange(len(x)) / src_rate
    dst_t = np.arange(n_out) / dst_rate
    return np.interp(dst_t, src_t, x).astype(np.float32)


# ---------------------------------------------------------------------------
# video: lip-ROI extraction
# ---------------------------------------------------------------------------


def _face_detector(cv2):
    """Best available face detector, or None for the geometric fallback.

    OpenCV 4 ships Haar cascades (cv2.CascadeClassifier); OpenCV 5 removed
    them in favor of DNN detectors that require model files we cannot assume
    offline.  With no detector every frame uses the lower-third center-crop
    heuristic — the same graceful degradation applied to failed detections.
    """
    if hasattr(cv2, "CascadeClassifier") and hasattr(cv2, "data"):
        xml = cv2.data.haarcascades + "haarcascade_frontalface_default.xml"
        if os.path.exists(xml):
            cascade = cv2.CascadeClassifier(xml)

            def detect(gray):
                return cascade.detectMultiScale(gray, 1.1, 4)

            return detect
    return None


def extract_lip_rois(
    video_path: str,
    roi_size: int = 36,
    max_frames: Optional[int] = None,
) -> np.ndarray:
    """Video file -> [T, roi, roi, 1] float32 grayscale lip crops.

    Face detection via OpenCV Haar cascade; mouth region = lower third of
    the detected face box.  Falls back to a center crop when no face is
    found (same graceful degradation the reference tooling applied to failed
    landmark fits).
    """
    try:
        import cv2
    except ImportError as e:  # pragma: no cover
        raise RuntimeError(
            "OpenCV is required for ROI extraction; prepare records on a "
            "host with cv2 installed"
        ) from e

    detect = _face_detector(cv2)
    cap = cv2.VideoCapture(video_path)
    rois: List[np.ndarray] = []
    last_box: Optional[Tuple[int, int, int, int]] = None
    while True:
        ok, frame = cap.read()
        if not ok or (max_frames and len(rois) >= max_frames):
            break
        gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        if detect is not None:
            faces = detect(gray)
            if len(faces):
                last_box = max(faces, key=lambda b: b[2] * b[3])
        if last_box is not None:
            x, y, w, h = last_box
            mouth = gray[y + 2 * h // 3 : y + h, x + w // 4 : x + 3 * w // 4]
        else:
            H, W = gray.shape
            mouth = gray[2 * H // 3 :, W // 3 : 2 * W // 3]
        if mouth.size == 0:
            mouth = gray
        roi = cv2.resize(mouth, (roi_size, roi_size)).astype(np.float32) / 255.0
        rois.append(roi[..., None])
    cap.release()
    if not rois:
        raise ValueError(f"no frames decoded from {video_path}")
    return np.stack(rois)


# ---------------------------------------------------------------------------
# OpenFace action units
# ---------------------------------------------------------------------------


def load_openface_aus(
    csv_path: str, au_columns: Optional[Sequence[str]] = None
) -> np.ndarray:
    """OpenFace output CSV -> [T, au_dim] AU intensity matrix.

    Default columns: all ``AU*_r`` intensity outputs (the TASLP-2020
    experiments regress AU intensities from the attended visual context).
    """
    with open(csv_path) as f:
        reader = csv.DictReader(f)
        rows = list(reader)
    if not rows:
        raise ValueError(f"empty AU csv {csv_path}")
    keys = [k.strip() for k in rows[0].keys()]
    if au_columns is None:
        au_columns = [k for k in keys if k.startswith("AU") and k.endswith("_r")]
    if not au_columns:
        raise ValueError(f"no AU intensity columns in {csv_path}")
    out = np.zeros((len(rows), len(au_columns)), np.float32)
    for i, row in enumerate(rows):
        clean = {k.strip(): v for k, v in row.items()}
        for j, c in enumerate(au_columns):
            out[i, j] = float(clean[c])
    return out


# ---------------------------------------------------------------------------
# corpus -> records
# ---------------------------------------------------------------------------


def build_utterance(
    uid: str,
    transcript: str,
    wav_path: Optional[str] = None,
    video_path: Optional[str] = None,
    au_csv_path: Optional[str] = None,
    *,
    sample_rate: int = 16_000,
    roi_size: int = 36,
) -> Utterance:
    return Utterance(
        uid=uid,
        transcript=transcript,
        waveform=load_wav(wav_path, sample_rate) if wav_path else None,
        video=extract_lip_rois(video_path, roi_size) if video_path else None,
        au=load_openface_aus(au_csv_path) if au_csv_path else None,
    )


def write_corpus(
    manifest: List[Dict[str, str]],
    out_path: str,
    video_codec: str = "uint8",
    **kw,
) -> int:
    """Manifest rows {uid, transcript, wav?, video?, au_csv?} -> TFRecord file.

    Lip-ROI crops produced by :func:`extract_lip_rois` are grayscale in
    [0, 1], so the default codec quantizes them to uint8 (4x smaller
    records); pass ``video_codec="float32"`` for bit-exact storage.
    """
    utts = [
        build_utterance(
            row["uid"], row["transcript"],
            row.get("wav"), row.get("video"), row.get("au_csv"), **kw,
        )
        for row in manifest
    ]
    write_dataset(utts, out_path, video_codec=video_codec)
    return len(utts)
