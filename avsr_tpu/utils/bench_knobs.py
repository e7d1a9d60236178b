"""Shared parsing of the AVSR_BENCH_* model-variant env knobs.

One definition for every benchmark that A/Bs the opt-in model extensions
against the reference-parity flagship (bench.py train step,
tools/bench_decode.py beam latency; tools/bench_variants.py sweeps them by
setting these variables per arm).  Defaults are the measured round-3
flagship: 256-dim value down-projection on both attention memories, RNN
family everywhere else.

Knobs:
  AVSR_BENCH_FUSE=1                 train.fuse_encoder_scans
  AVSR_BENCH_FUSION_VDIM=N          fusion.memory_value_dim (0 = off)
  AVSR_BENCH_DECODER_VDIM=N         decoder.memory_value_dim (0 = off)
  AVSR_BENCH_TIME_REDUCTION=1,2,2   audio_encoder.time_reduction
  AVSR_BENCH_XF=d,layers,heads      transformer AUDIO encoder
  AVSR_BENCH_XF_VIDEO=d,layers,heads  transformer VIDEO encoder
  AVSR_BENCH_XF_CONV=K              conformer depthwise-conv module of odd
                                    kernel K on every transformer encoder
                                    (EncoderConfig.conv_kernel; ignored for
                                    the RNN family)
  AVSR_BENCH_FUSION_TYPE=cross_attention  scan-free multi-head fusion
  AVSR_BENCH_DECODER_TYPE=transformer     parallel teacher-forcing decoder
                                    (forces sampling_probability=0)
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Tuple

from avsr_tpu.configs import EncoderConfig

__all__ = ["BenchVariant", "variant_from_env"]


@dataclass(frozen=True)
class BenchVariant:
    fuse_encoder_scans: bool
    fusion_value_dim: Optional[int]
    decoder_value_dim: Optional[int]
    time_reduction: Optional[Tuple[int, ...]]
    audio_encoder: EncoderConfig
    video_encoder: EncoderConfig
    fusion_type: str
    decoder_type: str

    @property
    def decoder_sampling_probability(self) -> float:
        """Scheduled sampling is rejected by the transformer decoder."""
        return 0.0 if self.decoder_type == "transformer" else 0.1


def _xf_encoder(spec: str, time_reduction=None) -> EncoderConfig:
    d, layers, heads = (int(x) for x in spec.split(","))
    conv_env = os.environ.get("AVSR_BENCH_XF_CONV", "")
    return EncoderConfig(
        hidden_units=(d,) * layers, encoder_type="transformer",
        num_heads=heads, dropout_rate=0.1, time_reduction=time_reduction,
        conv_kernel=int(conv_env) if conv_env else None,
    )


def variant_from_env() -> BenchVariant:
    tr_env = os.environ.get("AVSR_BENCH_TIME_REDUCTION", "")
    time_red = tuple(int(x) for x in tr_env.split(",")) if tr_env else None

    xf_env = os.environ.get("AVSR_BENCH_XF", "")
    if xf_env:
        audio_encoder = _xf_encoder(xf_env, time_red)
    else:
        audio_encoder = EncoderConfig(hidden_units=(256, 256, 256),
                                      bidirectional=True, dropout_rate=0.1,
                                      time_reduction=time_red)

    xfv_env = os.environ.get("AVSR_BENCH_XF_VIDEO", "")
    if xfv_env:
        video_encoder = _xf_encoder(xfv_env)
    else:
        video_encoder = EncoderConfig(hidden_units=(256,),
                                      bidirectional=True)

    return BenchVariant(
        fuse_encoder_scans=os.environ.get("AVSR_BENCH_FUSE", "0") == "1",
        fusion_value_dim=int(
            os.environ.get("AVSR_BENCH_FUSION_VDIM", "256")) or None,
        decoder_value_dim=int(
            os.environ.get("AVSR_BENCH_DECODER_VDIM", "256")) or None,
        time_reduction=time_red,
        audio_encoder=audio_encoder,
        video_encoder=video_encoder,
        fusion_type=os.environ.get("AVSR_BENCH_FUSION_TYPE", "av_align"),
        decoder_type=os.environ.get("AVSR_BENCH_DECODER_TYPE", "rnn"),
    )
