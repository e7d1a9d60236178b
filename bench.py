"""Benchmark harness: train frames/sec/chip on the flagship AV model.

Protocol (BASELINE.md §C): frames/sec/chip = (10 ms audio frames consumed
per step x steps/sec) / chips, measured over steady-state steps after
compilation.

Timing protocol notes (hard-won, see CLAUDE.md):
  * the axon relay adds ~27 ms fixed round-trip latency to every host sync,
    and ``block_until_ready`` has been observed returning early;
  * so steps are timed as a CHAINED pipeline — N steps whose state
    data-depends on the previous step, with ONE host value-fetch of the
    final loss forcing the whole chain — exactly how a real training loop
    runs (no per-step sync).  Per-step-synced timing would charge the relay
    latency to every step.

Benched model (round 5): the ``lrs2_av_fast`` preset config — recurrent
encoders with cross-attention fusion + (2,2,1) pyramidal time reduction
(early placement: halves the full-rate BiLSTM layer 1 at the same total
factor) + parallel-teacher-forcing transformer decoder, full-width
attention values — the fastest arm that holds the corpus-scale quality
gates (toy-dims CAMPAIGN.json arms ``av_fast_xfdec_warmup``/
``av_fast_tr21`` AND preset-dims on-chip CAMPAIGN_TPU.json
``av_fast_tr221``: held-out noise-matrix CER at width-10 beam, ordering
AND parity vs the reference mechanism — at or better than av_ref on
every condition; the value-projected arms ran faster in round 3 but
FAILED held-out parity and were not promoted; RESULTS.md rounds 4-5).  The same run ALSO measures the
reference-dims parity model (paper dims, AV-Align fusion scan, no value
projection) and reports it in the same JSON line under
``reference_dims`` — the honest parity-dims number next to the headline.

When any AVSR_BENCH_* variant knob is set (tools/bench_variants.py sweep
arms), only that single variant is measured, exactly as before.

``vs_baseline`` divides by TF1_CPU_BASELINE_FPS, which is MEASURED on
this host (round 4, tools/baseline_tf1.py; artifact BASELINE_tf1.json):
a TF1 graph-mode AV-Align train step at these exact shapes — in-graph
tf.signal frontend, dynamic_rnn BiLSTM encoders, hand-rolled
AttentionWrapper fusion/decoder, per-step session.run — peaks at 1,083
10ms-frames/s at B=64 on this 1-core CPU (970 at B=16; the best of ALL
runs is used, generous to the baseline — a round-5 uncontended rerun
measured 823.5, so 1,083 is a ceiling for TF1 and vs_baseline a floor
for us).  BASELINE.json records
``"published": {}`` (SURVEY.md §6), so this measured stand-in IS the
operative ">=5x TF1-CPU" denominator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

TF1_CPU_BASELINE_FPS = 1083.0  # measured best-of-runs: BASELINE_tf1.json

# LRS2-scale config [BASELINE.json:configs[4]]: ~6 s utterances, char vocab.
BATCH = 128
SECONDS = 6.0
VIDEO_FRAMES = int(SECONDS * 25)
LABEL_LEN = 48
VOCAB = 31  # builtin character inventory

WARMUP_STEPS = 5
MEASURE_STEPS = 30


def _build_cfg(var, name: str):
    from avsr_tpu.configs import (
        AudioFrontendConfig,
        DecoderConfig,
        ExperimentConfig,
        FusionConfig,
        TrainConfig,
        VideoFrontendConfig,
    )

    return ExperimentConfig(
        architecture="av_align",
        audio=AudioFrontendConfig(),  # 30 mel + deltas, stack 8 skip 3
        video=VideoFrontendConfig(),
        audio_encoder=var.audio_encoder,
        video_encoder=var.video_encoder,
        fusion=FusionConfig(
            attention_units=128, memory_value_dim=var.fusion_value_dim,
            fusion_type=var.fusion_type,
        ),
        decoder=DecoderConfig(embedding_dim=128, hidden_units=(256,),
                              attention_units=128,
                              max_label_length=LABEL_LEN,
                              decoder_type=var.decoder_type,
                              sampling_probability=(
                                  var.decoder_sampling_probability),
                              memory_value_dim=var.decoder_value_dim),
        train=TrainConfig(compute_dtype="bfloat16",
                          fuse_encoder_scans=var.fuse_encoder_scans),
        name=name,
    )


def _promoted_variant():
    """The benched flagship: lrs2_av_fast's structure at bench dims
    (= sweep arm ``xa_tr221_xfdec``, 16.14 ms; campaign-gated via toy
    arms ``av_fast_xfdec_warmup``/``av_fast_tr21`` AND the preset-dims
    on-chip campaign ``av_fast_tr221`` (CAMPAIGN_TPU.json) — the
    vdim-projected arms ran faster but failed held-out parity,
    CAMPAIGN.json).  Round-5 placement: (2,2,1) halves the full-rate
    BiLSTM layer 1 at the same total pyramid factor."""
    from avsr_tpu.configs import EncoderConfig
    from avsr_tpu.utils.bench_knobs import BenchVariant

    return BenchVariant(
        fuse_encoder_scans=False,
        fusion_value_dim=None,
        decoder_value_dim=None,
        time_reduction=(2, 2, 1),
        audio_encoder=EncoderConfig(hidden_units=(256, 256, 256),
                                    bidirectional=True, dropout_rate=0.1,
                                    time_reduction=(2, 2, 1)),
        video_encoder=EncoderConfig(hidden_units=(256,), bidirectional=True),
        fusion_type="cross_attention",
        decoder_type="transformer",
    )


def _reference_dims_variant():
    """Paper dims, AV-Align fusion scan, no value projection — the
    reference-parity model (sweep arm ``reference_dims``)."""
    from avsr_tpu.configs import EncoderConfig
    from avsr_tpu.utils.bench_knobs import BenchVariant

    return BenchVariant(
        fuse_encoder_scans=False,
        fusion_value_dim=None,
        decoder_value_dim=None,
        time_reduction=None,
        audio_encoder=EncoderConfig(hidden_units=(256, 256, 256),
                                    bidirectional=True, dropout_rate=0.1),
        video_encoder=EncoderConfig(hidden_units=(256,), bidirectional=True),
        fusion_type="av_align",
        decoder_type="rnn",
    )


def measure(cfg) -> dict:
    """Compile + warm + chained-pipeline-time one train-step program."""
    import jax
    import jax.numpy as jnp

    from avsr_tpu.models.seq2seq import Batch
    from avsr_tpu.train import step as step_lib

    rng = np.random.default_rng(0)
    S = int(16000 * SECONDS)
    batch = Batch(
        audio=jnp.asarray(rng.standard_normal((BATCH, S)).astype(np.float32)),
        audio_lengths=jnp.asarray([S] * BATCH, jnp.int32),
        video=jnp.asarray(
            rng.standard_normal((BATCH, VIDEO_FRAMES, 36, 36, 1)).astype(
                np.float32
            )
        ),
        video_lengths=jnp.asarray([VIDEO_FRAMES] * BATCH, jnp.int32),
        targets=jnp.asarray(rng.integers(3, VOCAB, (BATCH, LABEL_LEN)),
                            jnp.int32),
        target_lengths=jnp.asarray([LABEL_LEN] * BATCH, jnp.int32),
    )

    state, tx = step_lib.create_train_state(
        jax.random.PRNGKey(0), cfg, VOCAB, steps_per_epoch=1000
    )
    train_step = step_lib.make_jitted_train_step(cfg, tx)
    key = jax.random.PRNGKey(1)

    for _ in range(WARMUP_STEPS):
        state, metrics = train_step(state, batch, key)
    float(metrics["loss"])  # hard host sync after warmup

    # Chained pipeline timing: each step's state depends on the previous
    # step, so one value-fetch of the final loss forces the whole chain.
    t0 = time.perf_counter()
    for _ in range(MEASURE_STEPS):
        state, metrics = train_step(state, batch, key)
    final_loss = float(metrics["loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(final_loss)

    # 10 ms audio frames consumed per step.
    frames_per_step = BATCH * int(
        (S - cfg.audio.frame_length) / cfg.audio.frame_step + 1
    )
    n_chips = 1  # bench runs single-chip
    fps_per_chip = frames_per_step * MEASURE_STEPS / dt / n_chips
    ms_per_step = dt / MEASURE_STEPS * 1e3

    # Absolute-performance accounting (BASELINE.md §C): analytic matmul
    # FLOPs per train step -> MFU against the device's bf16 peak.
    from avsr_tpu.utils.flops import peak_flops_of, train_step_flops

    flops = train_step_flops(
        cfg, batch=BATCH, audio_samples=S, video_frames=VIDEO_FRAMES,
        label_len=LABEL_LEN, vocab=VOCAB,
    )
    peak = peak_flops_of(jax.devices()[0])
    mfu_pct = flops["total"] / (dt / MEASURE_STEPS) / peak * 100.0

    return {
        "value": round(fps_per_chip, 1),
        "vs_baseline": round(fps_per_chip / TF1_CPU_BASELINE_FPS, 2),
        "ms_per_step": round(ms_per_step, 2),
        "model_flops_per_step": round(flops["total"]),
        "mfu_pct": round(mfu_pct, 2),
    }


def main() -> None:
    if any(k.startswith("AVSR_BENCH_") for k in os.environ):
        # Sweep-arm mode (tools/bench_variants.py): one variant from the
        # env knobs, exactly the historical single-line behavior.
        from avsr_tpu.utils.bench_knobs import variant_from_env

        res = measure(_build_cfg(variant_from_env(), "bench_variant"))
        print(json.dumps({
            "metric": "train_frames_per_sec_per_chip",
            "unit": "10ms audio frames/sec/chip (AV train step)",
            **res,
        }))
        return

    # Default (driver) mode: the promoted lrs2_av_fast flagship is the
    # headline; the reference-dims parity model is measured in the same
    # run and reported alongside (VERDICT r3 next #1).
    fast = measure(_build_cfg(_promoted_variant(), "bench_av_fast"))
    ref = measure(_build_cfg(_reference_dims_variant(), "bench_av_align"))
    print(json.dumps({
        "metric": "train_frames_per_sec_per_chip",
        "unit": ("10ms audio frames/sec/chip (lrs2_av_fast train step; "
                 "campaign quality-gated — CAMPAIGN.json)"),
        **fast,
        "reference_dims": ref,
    }))


if __name__ == "__main__":
    main()
