#!/usr/bin/env python
"""Noise-robust AV-Align training [BASELINE.json:configs[3]]: babble/cafe
mixed ON DEVICE at {-5, 0, 10, 20} dB SNR, with per-condition evaluation."""
from avsr_tpu.avsr import AVSR

avsr = AVSR(
    unit="character",
    architecture="av_align",
    audio_train_record="data/tcdtimit_train_audio.tfrecord",
    audio_test_record="data/tcdtimit_test_audio.tfrecord",
    video_train_record="data/tcdtimit_train_video.tfrecord",
    video_test_record="data/tcdtimit_test_video.tfrecord",
    noise_snr_db=(-5.0, 0.0, 10.0, 20.0),
    noise_bank_record="data/noise_bank.tfrecord",
    beam_width=10,
)
avsr.train(num_epochs=100, logfile="run_av_noisy.log",
           try_restore_latest_checkpoint=True)
# per-SNR evaluation matrix (clean, 20, 10, 0, -5 dB)
print(avsr.evaluate_noise_matrix())
