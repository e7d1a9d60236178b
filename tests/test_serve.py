"""AOT serving-artifact tests: export -> serialize -> load -> transcribe.

The exported program must reproduce the in-process decode exactly; because
the Predictor pads to the EXPORT shape while predict() pads to the loader's
bucket shape, agreement here also re-exercises the padding-invariance
design invariant (CLAUDE.md).
"""

import numpy as np
import pytest

from avsr_tpu.avsr import AVSR
from avsr_tpu.data.synthetic import SyntheticSpec, generate
from avsr_tpu.serve import Predictor, export_serving_artifact


@pytest.fixture(scope="module")
def data():
    utts = generate(SyntheticSpec(num_utterances=8, min_chars=2, max_chars=3,
                                  seed=11, alphabet="ab", roi=20,
                                  char_duration_s=0.1))
    # Align the synthetic signals to the compact wire grids (int16 PCM,
    # uint8 pixels) so exported-compact vs in-process-float comparisons
    # are EXACT — real corpora are grid-aligned by construction (16-bit
    # wavs, uint8 ROI crops).
    for u in utts:
        u.waveform = (np.round(u.waveform * 32767.0) / 32767.0).astype(
            np.float32)
        u.video = (np.round(u.video * 255.0) / 255.0).astype(np.float32)
    return utts


def _tiny_avsr(tmp_path, data, architecture="audio"):
    if architecture == "audio":
        return AVSR(
            architecture="audio", encoder_units_per_layer=(16,),
            decoder_units_per_layer=(16,), embedding_size=8, batch_size=4,
            max_label_length=6, compute_dtype="float32",
            run_dir=str(tmp_path / "run"),
            train_utterances=data, eval_utterances=data,
        )
    from avsr_tpu.configs import (
        AudioFrontendConfig, DataConfig, DecodeConfig, DecoderConfig,
        EncoderConfig, ExperimentConfig, FusionConfig, TrainConfig,
        VideoFrontendConfig,
    )

    cfg = ExperimentConfig(
        architecture=architecture,
        audio=AudioFrontendConfig(num_mel_bins=12, fft_length=256,
                                  frame_stacking=3, frame_skipping=3,
                                  add_deltas=False),
        video=VideoFrontendConfig(roi_height=20, roi_width=20,
                                  conv_channels=(4,), embedding_dim=16),
        audio_encoder=EncoderConfig(hidden_units=(16,), dropout_rate=0.0),
        video_encoder=EncoderConfig(hidden_units=(16,), dropout_rate=0.0),
        fusion=FusionConfig(attention_units=12),
        decoder=DecoderConfig(embedding_dim=8, hidden_units=(16,),
                              attention_units=12, max_label_length=6,
                              dropout_rate=0.0),
        data=DataConfig(batch_size=4, audio_bucket_boundaries=(60,),
                        max_label_length=6, video_fps=25.0),
        train=TrainConfig(compute_dtype="float32", log_every_steps=10),
        decode=DecodeConfig(beam_width=3, max_decode_length=6),
        name="serve_av",
    )
    return AVSR(config=cfg, run_dir=str(tmp_path / "run"),
                train_utterances=data, eval_utterances=data)


def test_export_roundtrip_matches_predict(tmp_path, data):
    avsr = _tiny_avsr(tmp_path, data)
    avsr.train(num_epochs=1)
    want = dict(avsr.predict(data[:4], use_beam=False))

    out = export_serving_artifact(
        avsr, str(tmp_path / "artifact"), use_beam=False, batch_size=4,
        audio_seconds=0.5,
    )
    pred = Predictor.load(out)
    got = pred.transcribe(audio=[u.waveform for u in data[:4]])
    assert got == [want[u.uid] for u in data[:4]]
    # Artifact is self-describing: inventory + id semantics in meta.
    assert pred.meta["architecture"] == "audio"
    assert pred.meta["eos_id"] == 2
    assert pred.batch_size == 4
    # Portable by default: one artifact serves CPU and TPU hosts.
    assert sorted(pred.meta["platforms"]) == ["cpu", "tpu"]
    # Compact wire by default: int16 PCM on the wire, dequantized on device.
    assert pred._inputs["audio"]["dtype"] == "int16"
    # Params are pinned on device after the first call — a host-numpy leaf
    # list would re-transfer the full parameter set per request (measured
    # to dominate flagship serving latency over the TPU relay).
    import jax

    assert all(isinstance(l, jax.Array) for l in pred._leaves)


def test_compact_wire_rejects_out_of_range(tmp_path, data):
    avsr = _tiny_avsr(tmp_path, data)
    avsr.train(num_epochs=1)
    out = export_serving_artifact(
        avsr, str(tmp_path / "artifact_rng"), use_beam=False, batch_size=2,
        audio_seconds=0.4,
    )
    pred = Predictor.load(out)
    with pytest.raises(ValueError, match="int16-PCM-range"):
        pred.transcribe(audio=[np.full(1600, 2.5, np.float32)])
    # ...but full-scale 16-bit PCM is valid: a clipped recording's most
    # negative sample is -32768/32767 after load_wav's /32767 (the same
    # bound the training loader's compact transfer accepts).
    full_scale = np.full(1600, -32768.0 / 32767.0, np.float32)
    assert pred.transcribe(audio=[full_scale])


def test_float32_transfer_export(tmp_path, data):
    """transfer='float32' keeps the reference wire dtypes."""
    avsr = _tiny_avsr(tmp_path, data)
    avsr.train(num_epochs=1)
    want = dict(avsr.predict(data[:2], use_beam=False))
    out = export_serving_artifact(
        avsr, str(tmp_path / "artifact_f32"), use_beam=False, batch_size=2,
        audio_seconds=0.5, transfer="float32",
    )
    pred = Predictor.load(out)
    assert pred._inputs["audio"]["dtype"] == "float32"
    got = pred.transcribe(audio=[u.waveform for u in data[:2]])
    assert got == [want[u.uid] for u in data[:2]]


def test_export_av_align_beam(tmp_path, data):
    avsr = _tiny_avsr(tmp_path, data, architecture="av_align")
    avsr.train(num_epochs=1)
    want = dict(avsr.predict(data[:2], use_beam=True))

    out = export_serving_artifact(
        avsr, str(tmp_path / "artifact_av"), use_beam=True, batch_size=2,
        audio_seconds=0.5,
    )
    pred = Predictor.load(out)
    got = pred.transcribe(audio=[u.waveform for u in data[:2]],
                          video=[u.video for u in data[:2]])
    assert got == [want[u.uid] for u in data[:2]]


def test_bucketed_export_routes_to_smallest_fit(tmp_path, data):
    from avsr_tpu.serve import BucketedPredictor, load_predictor

    avsr = _tiny_avsr(tmp_path, data)
    avsr.train(num_epochs=1)
    want = dict(avsr.predict(data[:2], use_beam=False))

    out = export_serving_artifact(
        avsr, str(tmp_path / "buckets"), use_beam=False, batch_size=2,
        audio_seconds=(0.4, 1.0),
    )
    pred = load_predictor(out)
    assert isinstance(pred, BucketedPredictor)
    assert len(pred.buckets) == 2

    short = [u.waveform for u in data[:2]]  # <= 0.3 s each
    chosen = pred._pick(short, None)
    assert chosen._inputs["audio"]["shape"][1] == int(0.4 * 16_000)
    assert pred.transcribe(audio=short) == [want[u.uid] for u in data[:2]]

    long = [np.zeros(int(0.8 * 16_000), np.float32)]
    chosen = pred._pick(long, None)
    assert chosen._inputs["audio"]["shape"][1] == int(1.0 * 16_000)


def test_predictor_rejects_overruns(tmp_path, data):
    avsr = _tiny_avsr(tmp_path, data)
    avsr.train(num_epochs=1)
    out = export_serving_artifact(
        avsr, str(tmp_path / "artifact2"), use_beam=False, batch_size=2,
        audio_seconds=0.3,
    )
    pred = Predictor.load(out)
    with pytest.raises(ValueError, match="exceed the exported batch size"):
        pred.transcribe(audio=[u.waveform for u in data[:3]])
    with pytest.raises(ValueError, match="exported horizon"):
        pred.transcribe(audio=[np.zeros(16_000, np.float32)])


def test_export_never_trained_raises(tmp_path, data):
    avsr = _tiny_avsr(tmp_path, data)
    with pytest.raises(RuntimeError, match="never-trained"):
        export_serving_artifact(avsr, str(tmp_path / "artifact3"))


def test_data_parallel_export_matches_single_device(tmp_path, data):
    """A DP-sharded artifact (8-device virtual mesh, params replicated,
    batch sharded) must produce the single-device artifact's exact ids."""
    import jax

    assert len(jax.devices()) >= 8  # conftest virtual mesh
    avsr = _tiny_avsr(tmp_path, data)
    avsr.train(num_epochs=1)

    single = export_serving_artifact(
        avsr, str(tmp_path / "a1"), use_beam=False, batch_size=8,
        audio_seconds=0.4,
    )
    dp = export_serving_artifact(
        avsr, str(tmp_path / "a8"), use_beam=False, batch_size=8,
        audio_seconds=0.4, data_parallel=8,
    )
    p1, p8 = Predictor.load(single), Predictor.load(dp)
    assert p8.meta["num_devices"] == 8 and p1.meta["num_devices"] == 1

    wavs = [u.waveform for u in data]  # 8 utterances
    assert p8.transcribe(audio=wavs) == p1.transcribe(audio=wavs)


def test_export_av_fast_combo_beam(tmp_path, data):
    """Serving export of the lrs2_av_fast lever stack (cross-attention
    fusion over a time-reduced audio memory, recurrent decoder): the
    artifact's beam transcriptions must match live predict()."""
    import dataclasses

    from avsr_tpu.configs import EncoderConfig

    avsr = _tiny_avsr(tmp_path, data, architecture="av_align")
    cfg = dataclasses.replace(
        avsr.config,
        audio_encoder=EncoderConfig(hidden_units=(16, 16),
                                    time_reduction=(1, 2),
                                    dropout_rate=0.0),
        fusion=dataclasses.replace(avsr.config.fusion,
                                   fusion_type="cross_attention",
                                   num_heads=2, attention_units=12),
    )
    avsr = AVSR(config=cfg, run_dir=str(tmp_path / "run_fast"),
                train_utterances=data, eval_utterances=data)
    avsr.train(num_epochs=1)
    want = dict(avsr.predict(data[:2], use_beam=True))

    out = export_serving_artifact(
        avsr, str(tmp_path / "artifact_fast"), use_beam=True, batch_size=2,
        audio_seconds=0.5,
    )
    pred = Predictor.load(out)
    got = pred.transcribe(audio=[u.waveform for u in data[:2]],
                          video=[u.video for u in data[:2]])
    assert got == [want[u.uid] for u in data[:2]]


def test_export_av_fast_xfdec_beam(tmp_path, data):
    """Serving export of the PROMOTED lrs2_av_fast structure (round 4
    promotion #2: cross-attention fusion over a time-reduced audio
    memory feeding the transformer decoder): the artifact's KV-cache
    beam transcriptions must match live predict()."""
    import dataclasses

    from avsr_tpu.configs import EncoderConfig

    avsr = _tiny_avsr(tmp_path, data, architecture="av_align")
    cfg = dataclasses.replace(
        avsr.config,
        audio_encoder=EncoderConfig(hidden_units=(16, 16),
                                    time_reduction=(1, 2),
                                    dropout_rate=0.0),
        fusion=dataclasses.replace(avsr.config.fusion,
                                   fusion_type="cross_attention",
                                   num_heads=2, attention_units=12),
        decoder=dataclasses.replace(avsr.config.decoder,
                                    decoder_type="transformer", num_heads=2,
                                    sampling_probability=0.0,
                                    sampling_ramp_steps=0),
    )
    avsr = AVSR(config=cfg, run_dir=str(tmp_path / "run_fast_xf"),
                train_utterances=data, eval_utterances=data)
    avsr.train(num_epochs=1)
    want = dict(avsr.predict(data[:2], use_beam=True))

    out = export_serving_artifact(
        avsr, str(tmp_path / "artifact_fast_xf"), use_beam=True,
        batch_size=2, audio_seconds=0.5,
    )
    pred = Predictor.load(out)
    got = pred.transcribe(audio=[u.waveform for u in data[:2]],
                          video=[u.video for u in data[:2]])
    assert got == [want[u.uid] for u in data[:2]]
