"""End-to-end serving-latency benchmark for exported decode artifacts.

Measures what a serving host actually pays per request: host-side pad +
quantize (compact wire), H2D transfer, the exported beam-decode program,
and the hypothesis-id fetch.  This is the artifact-path counterpart of
tools/bench_decode.py (which times the in-process jit with params already
resident).

Protocol: flagship LRS2 AV-Align shapes (6 s utterance, width-10 beam,
memory_value_dim=256 — bench.py's round-3 default), random params (decode
cost does not depend on param values), p50 over 30 warm requests after one
drained cold call.  Usage:

    python tools/bench_serve.py [batch_size] [transfer]

batch_size defaults to 1 (interactive serving); transfer is "compact"
(default, int16/uint8 wire) or "float32".
"""

import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))
sys.path.insert(0, _TOOLS)  # for the shared bench_serving timing routine


def main():
    import jax

    from avsr_tpu.configs import (
        AudioFrontendConfig, DecodeConfig, DecoderConfig,
        ExperimentConfig, FusionConfig, TrainConfig, VideoFrontendConfig,
    )
    from avsr_tpu.data.units import load_or_builtin
    from avsr_tpu.models import seq2seq
    from avsr_tpu.serve import Predictor, export_decode, save_artifact

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    transfer = sys.argv[2] if len(sys.argv) > 2 else "compact"
    K = 48
    # Honors the shared AVSR_BENCH_* model-variant knobs like bench.py /
    # bench_decode.py / bench_eval.py, so the fast/v2 families' exported
    # artifacts get serving rows too (defaults: the measured flagship).
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
        decode=DecodeConfig(beam_width=10, max_decode_length=K),
        train=TrainConfig(compute_dtype="bfloat16"),
    )
    unit_dict = load_or_builtin(None, "character")
    params = seq2seq.model_init(jax.random.PRNGKey(0), cfg,
                                len(unit_dict.idx_to_unit))

    t0 = time.perf_counter()
    exported, leaves, sig = export_decode(
        params, cfg, batch_size=B, audio_seconds=6.0, transfer=transfer,
    )
    export_s = time.perf_counter() - t0

    out = tempfile.mkdtemp(prefix="bench_serve_")
    try:
        save_artifact(out, exported, leaves, sig, unit_dict,
                      extra_meta={"transfer": transfer})
        param_mb = os.path.getsize(os.path.join(out, "params.npz")) / 2**20
        prog_mb = os.path.getsize(os.path.join(out, "decode.jaxexport")) / 2**20
        pred = Predictor.load(out)
    finally:
        shutil.rmtree(out, ignore_errors=True)

    rng = np.random.default_rng(0)
    # 6 s utterances on the PCM/pixel grid (compact wire requires it).
    wavs = [
        (np.round(rng.standard_normal(96000) * 0.25 * 32767)
         / 32767.0).astype(np.float32).clip(-1, 1)
        for _ in range(B)
    ]
    vids = [
        (np.round(rng.random((150, 36, 36, 1)) * 255) / 255.0)
        .astype(np.float32)
        for _ in range(B)
    ]

    from bench_serving import time_requests  # shared timing protocol

    cold_s, times = time_requests(
        pred, {"audio": wavs, "video": vids}, 30
    )
    p50 = times[len(times) // 2]
    print(json.dumps({
        "metric": "p50_serving_request_latency",
        "value": round(p50 * 1000, 2),
        "unit": (f"ms (artifact path, batch={B}, transfer={transfer}, "
                 "width=10 beam, 6s AV utterance)"),
        "cold_first_request_s": round(cold_s, 1),
        "export_s": round(export_s, 1),
        "artifact_program_mb": round(prog_mb, 2),
        "artifact_params_mb": round(param_mb, 1),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
