#!/usr/bin/env python
"""Reference-parity lip-ROI preparation from OpenFace landmarks.

The upstream tooling cropped mouth ROIs from dlib/OpenFace landmark fits
(SURVEY.md §2.2 row 15).  When you have OpenFace output CSVs (with
x_0..x_67 / y_0..y_67 columns), this manifest path reproduces those crops
exactly; without landmarks, drop the ``landmarks_csv`` key and the tracked
Haar + motion-energy localizer is used instead.  Precomputed ROI stacks
import verbatim via ``roi_npy``.
"""
from avsr_tpu.data.ingest import write_corpus

manifest = [
    {
        "uid": "s1_u01",
        "transcript": "bin blue at f two now",
        "wav": "raw/s1/u01.wav",
        "video": "raw/s1/u01.mp4",
        "landmarks_csv": "openface/s1/u01.csv",   # reference-parity crops
        "au_csv": "openface/s1/u01.csv",          # AU intensities (TASLP loss)
    },
    {
        "uid": "s1_u02",
        "transcript": "lay green in c three please",
        "wav": "raw/s1/u02.wav",
        "roi_npy": "precomputed/s1/u02_rois.npy",  # external ROI import
    },
]

n = write_corpus(manifest, "data/train_av.tfrecord", video_codec="uint8")
print(f"wrote {n} utterances")
