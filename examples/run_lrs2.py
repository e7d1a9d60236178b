#!/usr/bin/env python
"""Full LRS2 pipeline [BASELINE.json:configs[4]]: large-vocab char targets,
scheduled sampling, AU auxiliary loss (TASLP-2020), width-10 beam decode.

For the full knob set (compact int16/uint8 host->device transfer, parallel
record decode workers, label bucket caps) use the preset instead:
    python -m avsr_tpu.cli train --preset lrs2_av_align \
        --set data.audio_train_records=data/lrs2_train_audio.tfrecord ...
"""
from avsr_tpu.avsr import AVSR

avsr = AVSR(
    unit="character_lrs2",  # LRS2 transcripts contain digits/punctuation
    architecture="av_align",
    audio_train_record="data/lrs2_train_audio.tfrecord",
    audio_test_record="data/lrs2_test_audio.tfrecord",
    video_train_record="data/lrs2_train_video.tfrecord",
    video_test_record="data/lrs2_test_video.tfrecord",
    encoder_units_per_layer=(256, 256, 256),
    sampling_probability=0.1,
    au_loss_weight=10.0,
    batch_size=128,
    beam_width=10,
    max_label_length=150,
)
avsr.train(num_epochs=50, logfile="run_lrs2.log",
           try_restore_latest_checkpoint=True)
print(avsr.evaluate())
