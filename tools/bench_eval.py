"""Eval-pipeline benchmark: batched beam decode + eval loss on TPU.

Times the fused eval program (one encode feeding BOTH the teacher-forced
eval loss and the width-10 beam decode — train/loop.py
``_make_eval_decode_fn``) on the bench model at B=128, and isolates the
early-exit decode win by comparing an EOS-biased model (every hypothesis
finishes at step ~1, the best case) against the worst case (no hypothesis
ever finishes, full max_decode_length horizon).

Usage: python tools/bench_eval.py [batch] [max_decode_length]
Prints one JSON line per condition.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 150  # LRS2 horizon

    import jax
    import jax.numpy as jnp

    from avsr_tpu.configs import (
        AudioFrontendConfig,
        DecodeConfig,
        DecoderConfig,
        EncoderConfig,
        ExperimentConfig,
        FusionConfig,
        TrainConfig,
        VideoFrontendConfig,
    )
    from avsr_tpu.decode.beam import beam_search
    from avsr_tpu.models import seq2seq
    from avsr_tpu.models.seq2seq import Batch

    SECONDS, FPS, K, VOCAB = 6.0, 25, 48, 31
    S = int(16000 * SECONDS)
    Tv = int(SECONDS * FPS)

    # Honors the shared AVSR_BENCH_* model-variant knobs
    # (avsr_tpu/utils/bench_knobs.py) like bench.py and bench_decode.py;
    # defaults are the measured flagship (vdim 256/256, RNN family).
    from avsr_tpu.utils.bench_knobs import variant_from_env

    var = variant_from_env()
    cfg = ExperimentConfig(
        architecture="av_align",
        audio=AudioFrontendConfig(),
        video=VideoFrontendConfig(),
        audio_encoder=var.audio_encoder,
        video_encoder=var.video_encoder,
        fusion=FusionConfig(attention_units=128,
                            memory_value_dim=var.fusion_value_dim,
                            fusion_type=var.fusion_type),
        decoder=DecoderConfig(embedding_dim=128, hidden_units=(256,),
                              attention_units=128, max_label_length=K,
                              decoder_type=var.decoder_type,
                              memory_value_dim=var.decoder_value_dim),
        decode=DecodeConfig(beam_width=10, max_decode_length=L),
        train=TrainConfig(compute_dtype="bfloat16"),
        name="bench_eval",
    )

    rng = np.random.default_rng(0)
    batch = Batch(
        audio=jnp.asarray(rng.standard_normal((B, S)).astype(np.float32)),
        audio_lengths=jnp.asarray([S] * B, jnp.int32),
        video=jnp.asarray(
            rng.standard_normal((B, Tv, 36, 36, 1)).astype(np.float32)
        ),
        video_lengths=jnp.asarray([Tv] * B, jnp.int32),
        targets=jnp.asarray(rng.integers(3, VOCAB, (B, K)), jnp.int32),
        target_lengths=jnp.asarray([K] * B, jnp.int32),
    )
    params = seq2seq.model_init(jax.random.PRNGKey(0), cfg, VOCAB)

    def eval_decode(params, batch):
        out = seq2seq.encode(params, cfg, batch, train=False)
        _, metrics = seq2seq.loss_given_encode(params, cfg, batch, out,
                                               train=False)
        res = beam_search(
            params["decoder"], cfg.decoder, out.memories, L,
            beam_width=cfg.decode.beam_width,
            compute_dtype=seq2seq.compute_dtype_of(cfg),
        )
        return res.ids, res.steps, metrics["loss"]

    fn = jax.jit(eval_decode)

    def run(tag, p, reps=10):
        ids, steps, loss = fn(p, batch)  # compile + warm
        # true host fetches: block_until_ready can return EARLY under the
        # axon relay, leaking compile+warmup into the timed region
        float(loss)
        np.asarray(ids[0, 0])
        t0 = time.perf_counter()
        for _ in range(reps):
            ids, steps, loss = fn(p, batch)
        float(loss)
        np.asarray(ids[0, 0])
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(json.dumps({
            "metric": "eval_batch_ms", "condition": tag, "batch": B,
            "max_decode_length": L, "value": round(dt, 2),
            "decode_steps": int(steps),
            "utterances_per_sec": round(B / dt * 1e3, 1),
        }))

    # Worst case: random model never emits EOS -> full horizon, no early exit.
    run("full_horizon", params)
    # Best case: every beam finishes immediately -> early exit dominates.
    import copy

    p2 = jax.tree_util.tree_map(lambda x: x, params)
    p2 = dict(p2)
    p2["decoder"] = dict(p2["decoder"])
    p2["decoder"]["out_b"] = p2["decoder"]["out_b"].at[2].set(50.0)  # EOS_ID
    run("early_exit", p2)


if __name__ == "__main__":
    main()
