"""p50 beam-decode latency benchmark (BASELINE.json:metric).

Protocol (BASELINE.md §C): single-utterance batched decode, width-10 beam,
p50 over many decodes after compilation.  Usage:
    python tools/bench_decode.py [batch_size]

Honors the shared AVSR_BENCH_* model-variant knobs
(avsr_tpu/utils/bench_knobs.py), e.g. AVSR_BENCH_DECODER_TYPE=transformer
to time the v2 KV-cache decode path.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from avsr_tpu.configs import (
        AudioFrontendConfig, DecodeConfig, DecoderConfig,
        ExperimentConfig, FusionConfig, TrainConfig, VideoFrontendConfig,
    )
    from avsr_tpu.decode.beam import beam_search
    from avsr_tpu.models import seq2seq
    from avsr_tpu.models.seq2seq import Batch

    from avsr_tpu.utils.bench_knobs import variant_from_env

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    S, VF, K = 96000, 150, 48
    var = variant_from_env()
    cfg = ExperimentConfig(
        architecture="av_align",
        audio=AudioFrontendConfig(),
        video=VideoFrontendConfig(),
        audio_encoder=var.audio_encoder,
        video_encoder=var.video_encoder,
        # flagship value down-projection (bench.py round-3 default; set the
        # AVSR_BENCH_*VDIM env knobs for the reference-dims model)
        fusion=FusionConfig(attention_units=128,
                            memory_value_dim=var.fusion_value_dim,
                            fusion_type=var.fusion_type),
        decoder=DecoderConfig(embedding_dim=128, hidden_units=(256,),
                              attention_units=128, max_label_length=K,
                              decoder_type=var.decoder_type,
                              memory_value_dim=var.decoder_value_dim),
        decode=DecodeConfig(beam_width=10, max_decode_length=K),
        train=TrainConfig(compute_dtype="bfloat16"),
    )
    rng = np.random.default_rng(0)
    batch = Batch(
        audio=jnp.asarray(rng.standard_normal((B, S)).astype(np.float32)),
        audio_lengths=jnp.asarray([S] * B, jnp.int32),
        video=jnp.asarray(rng.standard_normal((B, VF, 36, 36, 1)).astype(np.float32)),
        video_lengths=jnp.asarray([VF] * B, jnp.int32),
    )
    params = seq2seq.model_init(jax.random.PRNGKey(0), cfg, 31)

    @jax.jit
    def decode(params, batch):
        out = seq2seq.encode(params, cfg, batch, train=False)
        res = beam_search(
            params["decoder"], cfg.decoder, out.memories,
            cfg.decode.max_decode_length,
            beam_width=cfg.decode.beam_width,
            compute_dtype=seq2seq.compute_dtype_of(cfg),
        )
        return res.ids

    ids = decode(params, batch)
    np.asarray(ids)
    times = []
    for _ in range(50):
        t0 = time.perf_counter()
        ids = decode(params, batch)
        np.asarray(ids)  # full host sync
        times.append(time.perf_counter() - t0)
    times.sort()
    p50 = times[len(times) // 2]
    print(json.dumps({
        "metric": "p50_beam_decode_latency",
        "value": round(p50 * 1000, 2),
        "unit": f"ms (batch={B}, width=10, 6s AV utterance)",
    }))


if __name__ == "__main__":
    main()
