#!/usr/bin/env python
"""Visual-only lip-reading experiment [BASELINE.json:configs[1]]."""
from avsr_tpu.avsr import AVSR

avsr = AVSR(
    unit="character",
    architecture="video",
    video_train_record="data/tcdtimit_train_video.tfrecord",
    video_test_record="data/tcdtimit_test_video.tfrecord",
    video_encoder_units_per_layer=(256,),
    decoder_units_per_layer=(256,),
    embedding_size=128,
    batch_size=32,
    learning_rate=1e-3,
    beam_width=10,
)
avsr.train(num_epochs=100, logfile="run_video.log",
           try_restore_latest_checkpoint=True)
print(avsr.evaluate())
