#!/usr/bin/env python
"""Dataset serialization example (upstream dataset_writer workflow):
manifest of {uid, transcript, wav, video, au_csv} rows -> TFRecords."""
from avsr_tpu.data.ingest import write_corpus

manifest = [
    # {"uid": "spk01_s1", "transcript": "bin blue at f two now",
    #  "wav": "raw/spk01_s1.wav", "video": "raw/spk01_s1.mp4",
    #  "au_csv": "openface/spk01_s1.csv"},
]
n = write_corpus(manifest, "data/train.tfrecord")
print(f"wrote {n} utterances")
