"""Per-bucket-mix benchmark: weighted frames/s over a length-distributed
corpus + the measured effect of label_bucket_caps (BASELINE.md §C
"frames/sec reported per bucket mix"; VERDICT round-2 next #4).

bench.py measures exactly one shape (B=128, 6 s); real corpora (LRS2) are
length-distributed, so steady-state throughput is the MIX-WEIGHTED average
over bucket programs, and the round-2 perf feature ``label_bucket_caps``
(per-bucket decoder horizons) only shows up here.

Protocol:
  * synthesize a duration-distributed corpus (1-10 s utterances, label
    length tracking duration at ~12.5 chars/s — an LRS2-like mix: mostly
    short, a long tail);
  * run the REAL BucketingLoader over it to obtain the epoch's bucket
    sequence (the mix) and one genuinely-assembled batch per bucket;
  * pre-place each bucket's batch on device (isolates compute from the
    axon relay's ~16-20 MB/s H2D transfer — see CLAUDE.md), then time each
    bucket's jitted train step as a chained pipeline with one host sync;
  * weighted frames/s = sum_b(count_b * frames_b) / sum_b(count_b * t_b),
    computed for label_bucket_caps ON (per-bucket horizons) and OFF
    (every bucket pays the global max_label_length horizon).

Usage: python tools/bench_bucket_mix.py [batch_size]
  AVSR_BUCKET_BS="192,128,64"  adds a third arm measuring per-bucket batch
  sizes (data.bucket_batch_sizes) at the given sizes (caps stay on).
Prints one JSON line; takes ~20 min on TPU (6 program compiles; 9 with
the bucket-batch-size arm).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BOUNDARIES = (300, 600, 1000)      # audio frames @100 Hz: <=3 s, <=6 s, <=10 s
CAPS = (40, 80, 130)               # ~12.5 chars/s * boundary + EOS margin
MAX_LABEL = 150                    # the uncapped horizon every bucket pays
CHAR_S = 0.08                      # 12.5 chars/s
WARMUP = 2
MEASURE = 15


def make_corpus(n: int, seed: int = 0):
    """Duration-distributed synthetic AV corpus: 50% 1-3 s, 30% 3-6 s,
    15% 6-8 s, 5% 8-10 s."""
    from avsr_tpu.data.synthetic import SyntheticSpec, generate

    bands = [  # (fraction, min_chars, max_chars) at 12.5 chars/s
        (0.50, 13, 37),
        (0.30, 38, 75),
        (0.15, 76, 100),
        (0.05, 101, 124),
    ]
    utts = []
    for i, (frac, lo, hi) in enumerate(bands):
        utts += generate(SyntheticSpec(
            num_utterances=max(int(round(n * frac)), 1),
            min_chars=lo, max_chars=hi, char_duration_s=CHAR_S,
            roi=36, seed=seed + i,
        ))
    rng = np.random.default_rng(seed)
    rng.shuffle(utts)
    for j, u in enumerate(utts):  # re-uid after shuffle for determinism
        u.uid = f"mix{j:05d}"
    return utts


def build(cfg_label_caps, utts, batch_size, bucket_batch_sizes=None):
    import dataclasses

    from avsr_tpu.configs import (
        AudioFrontendConfig,
        DataConfig,
        DecoderConfig,
        EncoderConfig,
        ExperimentConfig,
        FusionConfig,
        TrainConfig,
        VideoFrontendConfig,
    )
    from avsr_tpu.data.loader import BucketingLoader
    from avsr_tpu.data.units import builtin_unit_dict

    cfg = ExperimentConfig(
        architecture="av_align",
        audio=AudioFrontendConfig(),
        video=VideoFrontendConfig(),
        audio_encoder=EncoderConfig(hidden_units=(256, 256, 256),
                                    bidirectional=True, dropout_rate=0.1),
        video_encoder=EncoderConfig(hidden_units=(256,), bidirectional=True),
        fusion=FusionConfig(attention_units=128),
        decoder=DecoderConfig(embedding_dim=128, hidden_units=(256,),
                              attention_units=128, max_label_length=MAX_LABEL,
                              sampling_probability=0.1),
        data=DataConfig(batch_size=batch_size,
                        audio_bucket_boundaries=BOUNDARIES,
                        label_bucket_caps=cfg_label_caps,
                        bucket_batch_sizes=bucket_batch_sizes,
                        max_label_length=MAX_LABEL),
        train=TrainConfig(compute_dtype="bfloat16"),
        name="bench_bucket_mix",
    )
    units = builtin_unit_dict("character")
    loader = BucketingLoader(
        utts, units, cfg.data, require_audio=True, require_video=True,
        frame_step=cfg.audio.frame_step, frame_length=cfg.audio.frame_length,
    )
    return cfg, units, loader


def measure(cfg, units, loader):
    """Time one bucket program per bucket on its real first batch."""
    import jax

    from avsr_tpu.data.loader import to_model_batch
    from avsr_tpu.train import step as step_lib

    state, tx = step_lib.create_train_state(
        jax.random.PRNGKey(0), cfg, units.vocab_size, steps_per_epoch=1000
    )
    train_step = step_lib.make_jitted_train_step(cfg, tx)
    key = jax.random.PRNGKey(1)

    mix = {}        # bucket -> batch count in one epoch
    first = {}      # bucket -> first real NumpyBatch
    for b, np_batch in loader.epoch(shuffle=False):
        mix[b] = mix.get(b, 0) + 1
        if b not in first:
            first[b] = np_batch

    per_bucket = {}
    for b in sorted(first):
        np_batch = first[b]
        frames = int(np.sum(np_batch["audio_lengths"]) // 160)
        import jax.numpy as jnp

        batch = jax.device_put(to_model_batch(np_batch))
        # jnp.copy: the jitted step donates its state argument, so each
        # bucket must start from a fresh copy (same pattern as warmup()).
        st = jax.tree_util.tree_map(jnp.copy, state)
        for _ in range(WARMUP):
            st, metrics = train_step(st, batch, key)
        float(metrics["loss"])  # true host sync drains the compile
        t0 = time.perf_counter()
        for _ in range(MEASURE):
            st, metrics = train_step(st, batch, key)
        assert np.isfinite(float(metrics["loss"]))
        dt = time.perf_counter() - t0
        per_bucket[b] = {
            "ms_per_step": round(dt / MEASURE * 1e3, 2),
            "frames_per_batch": frames,
            "label_len": loader.bucket_shapes()[b].label_len,
            "batches_per_epoch": mix[b],
        }
    total_t = sum(
        per_bucket[b]["ms_per_step"] / 1e3 * mix[b] for b in per_bucket
    )
    total_frames = sum(
        per_bucket[b]["frames_per_batch"] * mix[b] for b in per_bucket
    )
    return {
        "per_bucket": per_bucket,
        "weighted_frames_per_sec": round(total_frames / total_t, 1),
        "epoch_batches": sum(mix.values()),
    }


def main() -> None:
    batch_size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    utts = make_corpus(max(batch_size * 3, 256))
    out = {"batch_size": batch_size, "boundaries": BOUNDARIES, "caps": CAPS}
    for name, caps in (("caps_on", CAPS), ("caps_off", None)):
        cfg, units, loader = build(caps, utts, batch_size)
        out[name] = measure(cfg, units, loader)
    on = out["caps_on"]["weighted_frames_per_sec"]
    off = out["caps_off"]["weighted_frames_per_sec"]
    out["caps_speedup"] = round(on / off, 3)
    bbs_env = os.environ.get("AVSR_BUCKET_BS")
    if bbs_env:
        bbs = tuple(int(x) for x in bbs_env.split(","))
        cfg, units, loader = build(CAPS, utts, batch_size,
                                   bucket_batch_sizes=bbs)
        out["bucket_bs"] = dict(measure(cfg, units, loader), sizes=bbs)
        out["bucket_bs_speedup"] = round(
            out["bucket_bs"]["weighted_frames_per_sec"] / on, 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
