#!/usr/bin/env python
"""Audio-only ASR experiment [BASELINE.json:configs[0]].

One-script-per-experiment workflow, matching the reference's run_audio*.py
style (SURVEY.md §2.2 row 14): instantiate AVSR with literal hyperparameters
and call train()/evaluate().  Point the record paths at your prepared
TCD-TIMIT TFRecords (see avsr_tpu/data/ingest.py and
`python -m avsr_tpu.cli write-records`).
"""
from avsr_tpu.avsr import AVSR

avsr = AVSR(
    unit="character",
    architecture="audio",
    audio_train_record="data/tcdtimit_train_audio.tfrecord",
    audio_test_record="data/tcdtimit_test_audio.tfrecord",
    encoder_units_per_layer=(256, 256, 256),
    decoder_units_per_layer=(256,),
    attention_type="bahdanau",
    embedding_size=128,
    batch_size=32,
    learning_rate=1e-3,
    dropout_probability=0.1,
    beam_width=10,
    max_label_length=150,
)
avsr.train(num_epochs=100, logfile="run_audio.log",
           try_restore_latest_checkpoint=True)
print(avsr.evaluate())
