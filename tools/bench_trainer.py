"""Real-training-loop benchmark: Trainer.train() vs bench.py's bare step.

bench.py times the jitted train step as a chained pipeline with no host
work; this tool times the ACTUAL Trainer loop — prefetch thread, host->
device transfer, JSONL logging, per-epoch orbax checkpoint — on the same
B=128 / 6 s AV-Align config, so the loop overhead (host syncs, transfer
stalls) is measured rather than assumed.  The loader is a cached-batch
stub: batch ASSEMBLY cost is excluded on purpose (it varies with corpus
storage), host->device transfer and dispatch are included.

Usage: python tools/bench_trainer.py [steps_per_epoch] [epochs] [mode]
  mode = "stream"   (default) fresh fp32 batch transferred every step
         "compact"  same, int16 audio + uint8 video (data.transfer_dtype)
         "resident" batch pre-placed on device: isolates pure loop
                    overhead (dispatch, logging, host step tracking)
Prints per-epoch ms/step from the Trainer's own epoch timer.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class CachedBatchLoader:
    """Minimal loader: yields one pre-assembled batch `n` times per epoch."""

    def __init__(self, np_batch, n: int):
        self.np_batch = np_batch
        self.n = n

    def __len__(self) -> int:
        return self.n

    def epoch(self, shuffle: bool = True):
        for _ in range(self.n):
            yield 0, self.np_batch


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    mode = sys.argv[3] if len(sys.argv) > 3 else "stream"

    from avsr_tpu.configs import (
        AudioFrontendConfig,
        DecoderConfig,
        EncoderConfig,
        ExperimentConfig,
        FusionConfig,
        TrainConfig,
        VideoFrontendConfig,
    )
    from avsr_tpu.data.loader import NumpyBatch
    from avsr_tpu.data.units import builtin_unit_dict
    from avsr_tpu.train.loop import Trainer

    B, SECONDS, FPS, K, VOCAB = 128, 6.0, 25, 48, 31
    S = int(16000 * SECONDS)
    Tv = int(SECONDS * FPS)

    cfg = ExperimentConfig(
        architecture="av_align",
        audio=AudioFrontendConfig(),
        video=VideoFrontendConfig(),
        audio_encoder=EncoderConfig(hidden_units=(256, 256, 256),
                                    bidirectional=True, dropout_rate=0.1),
        video_encoder=EncoderConfig(hidden_units=(256,), bidirectional=True),
        fusion=FusionConfig(attention_units=128),
        decoder=DecoderConfig(embedding_dim=128, hidden_units=(256,),
                              attention_units=128, max_label_length=K,
                              sampling_probability=0.1),
        # log_every_steps = steps/epoch: the Trainer's epoch timer stops at
        # the last DISPATCH, and only a log-step's float(loss) fetch truly
        # drains the device — so each epoch must END on a log step or the
        # unsynced tail escapes the timer and understates ms/step (observed:
        # 32.6 "ms/step" for a 42 ms program when 60-step epochs logged
        # every 50).
        train=TrainConfig(compute_dtype="bfloat16", log_every_steps=steps),
        name="bench_trainer",
    )

    rng = np.random.default_rng(0)
    audio = np.clip(rng.standard_normal((B, S)) * 0.2, -1, 1).astype(np.float32)
    video = rng.random((B, Tv, 36, 36, 1)).astype(np.float32)
    if mode == "compact":
        audio = np.clip(np.round(audio * 32767.0), -32768, 32767).astype(np.int16)
        video = np.round(video * 255.0).astype(np.uint8)
    np_batch = NumpyBatch(
        audio=audio,
        audio_lengths=np.full((B,), S, np.int32),
        video=video,
        video_lengths=np.full((B,), Tv, np.int32),
        targets=rng.integers(3, VOCAB, (B, K)).astype(np.int32),
        target_lengths=np.full((B,), K, np.int32),
    )
    np_batch["uids"] = [f"u{i}" for i in range(B)]
    np_batch["num_real"] = B

    import tempfile

    with tempfile.TemporaryDirectory() as run_dir:
        trainer = Trainer(
            cfg, builtin_unit_dict("character"),
            CachedBatchLoader(np_batch, steps), run_dir=run_dir,
        )
        if mode == "resident":
            # Pre-place only the big tensors; lengths/targets stay numpy so
            # the Trainer's host-side frame counting never reads the device.
            import jax

            placed = jax.device_put({"audio": np_batch["audio"],
                                     "video": np_batch["video"]})
            np_batch["audio"] = placed["audio"]
            np_batch["video"] = placed["video"]
            jax.block_until_ready(list(placed.values()))
        trainer.train(num_epochs=epochs)

        # Per-epoch numbers come from the Trainer's own epoch timer; re-read
        # the JSONL for one machine-readable summary (epoch 1 incl. compile).
        with open(f"{run_dir}/metrics.jsonl") as f:
            rows = [json.loads(line) for line in f]
    for r in rows:
        if r.get("kind") == "epoch":
            ms = r["seconds"] * 1e3 / steps
            print(json.dumps({
                "epoch": int(r["epoch"]), "ms_per_step": round(ms, 2),
                "frames_per_sec": round(r["frames_per_sec"], 1),
            }))


if __name__ == "__main__":
    main()
