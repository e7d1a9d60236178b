#!/usr/bin/env python
"""AV-Align audio-visual fusion experiment [BASELINE.json:configs[2]]
(arXiv:1809.01728)."""
from avsr_tpu.avsr import AVSR

avsr = AVSR(
    unit="character",
    architecture="av_align",
    audio_train_record="data/tcdtimit_train_audio.tfrecord",
    audio_test_record="data/tcdtimit_test_audio.tfrecord",
    video_train_record="data/tcdtimit_train_video.tfrecord",
    video_test_record="data/tcdtimit_test_video.tfrecord",
    encoder_units_per_layer=(256, 256, 256),
    video_encoder_units_per_layer=(256,),
    decoder_units_per_layer=(256,),
    beam_width=10,
)
avsr.train(num_epochs=100, logfile="run_av.log",
           try_restore_latest_checkpoint=True)
print(avsr.evaluate())
