"""Analytic per-step FLOPs accounting for MFU reporting (BASELINE.md §C).

Counts MATMUL/CONV multiply-adds only (2 FLOPs each) — the MXU work that
peak-TFLOP/s figures describe.  Elementwise ops, softmaxes, norms, and
gathers are excluded, so the resulting MFU is a slight UNDER-estimate
(honest direction: reported MFU never flatters the implementation).

Backward-pass convention per component:
  * factor 3.0 — standard training step: dL/dx = dY @ W^T and dW = X^T @ dY
    are each one forward-sized matmul (the custom-VJP LSTM backward in
    ops/rnn.py recomputes only elementwise gates, so it stays 3x);
  * factor 4.0 — components whose scan body is rematerialized
    (fusion/decoder, models/fusion.py + models/decoder.py): the forward
    matmuls run a second time inside the backward scan.

Geometry mirrors one bench/train batch: B examples, S audio samples,
T_v video frames, K label steps, V vocab units.
"""

from __future__ import annotations

from typing import Dict

from avsr_tpu.configs import ExperimentConfig
from avsr_tpu.models.encoder import encoder_output_dim


def _lstm_flops(batch: int, steps: int, input_dim: int, hidden: int) -> float:
    """One direction, one layer: the fused [x;h] @ W_{4H} gate matmul."""
    return 2.0 * batch * steps * 4 * hidden * (input_dim + hidden)


def _encoder_flops(cfg_enc, batch: int, steps: int, input_dim: int):
    """Returns (flops, output_steps) — pyramidal time_reduction folds r
    frames into the feature dim before a layer, shrinking its step count."""
    from avsr_tpu.models.encoder import time_reductions

    total = 0.0
    d = input_dim
    if cfg_enc.encoder_type == "transformer":
        dm = cfg_enc.hidden_units[0]
        for i, r in enumerate(time_reductions(cfg_enc)):
            steps = -(-steps // r)
            d *= r
            if i == 0:
                total += 2.0 * batch * steps * d * dm  # input projection
            elif r > 1:
                total += 2.0 * batch * steps * d * dm  # fold re-projection
            # qkv+output projections, score/context einsums, FFN
            total += 4 * 2.0 * batch * steps * dm * dm
            total += 2 * 2.0 * batch * steps * steps * dm
            total += 2 * 2.0 * batch * steps * dm * (
                cfg_enc.ff_multiplier * dm
            )
            if cfg_enc.conv_kernel is not None:
                # conformer conv module: pointwise GLU in-proj [d, 2d],
                # depthwise time-conv (k MACs per channel per step),
                # pointwise out-proj [d, d]
                total += 2.0 * batch * steps * dm * 2 * dm
                total += 2.0 * batch * steps * cfg_enc.conv_kernel * dm
                total += 2.0 * batch * steps * dm * dm
            d = dm
        return total, steps
    for h, r in zip(cfg_enc.hidden_units, time_reductions(cfg_enc)):
        steps = -(-steps // r)
        d *= r
        per_dir = _lstm_flops(batch, steps, d, h)
        total += per_dir * (2 if cfg_enc.bidirectional else 1)
        d = h * (2 if cfg_enc.bidirectional else 1)
    return total, steps


def _attention_flops(
    batch: int, queries: int, memory_len: int, memory_dim: int,
    query_dim: int, att_units: int, value_dim=None,
) -> float:
    """Bahdanau-style: keys projected once, then per-query score + context.
    ``value_dim`` adds the one-time value down-projection and shrinks the
    per-query context read (attention.py memory_value_dim)."""
    keys = 2.0 * batch * memory_len * memory_dim * att_units
    query_proj = 2.0 * batch * queries * query_dim * att_units
    energies = 2.0 * batch * queries * memory_len * att_units
    v_dim = value_dim or memory_dim
    value_proj = (
        2.0 * batch * memory_len * memory_dim * value_dim if value_dim else 0.0
    )
    context = 2.0 * batch * queries * memory_len * v_dim
    return keys + query_proj + energies + value_proj + context


def train_step_flops(
    cfg: ExperimentConfig,
    *,
    batch: int,
    audio_samples: int = 0,
    video_frames: int = 0,
    label_len: int,
    vocab: int,
) -> Dict[str, float]:
    """Analytic FLOPs of ONE training step (fwd + bwd) per component.

    Returns {"total": ..., "forward": ..., per-component entries...}.
    """
    arch = cfg.architecture
    comps: Dict[str, Dict[str, float]] = {}  # name -> {fwd, factor}

    T_raw = T_a = 0
    if arch in ("audio", "av_align", "bimodal"):
        a = cfg.audio
        T_raw = max((audio_samples - a.frame_length) // a.frame_step + 1, 0)
        T_a = max((T_raw - a.frame_stacking) // a.frame_skipping + 1, 1)
        fft_bins = a.fft_length // 2 + 1
        frontend = 0.0
        if a.use_matmul_dft:
            # windowed frames @ [frame_length, 2*fft_bins] DFT bases
            frontend += 2.0 * batch * T_raw * a.frame_length * 2 * fft_bins
        if a.feature_type == "logmel":
            frontend += 2.0 * batch * T_raw * fft_bins * a.num_mel_bins
        comps["audio_frontend"] = {"fwd": frontend, "factor": 3.0}
        enc_flops, T_a = _encoder_flops(
            cfg.audio_encoder, batch, T_a, a.output_dim
        )
        comps["audio_encoder"] = {"fwd": enc_flops, "factor": 3.0}

    video_out = 0
    if arch in ("video", "av_align", "bimodal"):
        v = cfg.video
        if v.use_au_features:
            cnn = 2.0 * batch * video_frames * v.au_dim * v.embedding_dim
        else:
            cnn = 0.0
            h, w, c_in = v.roi_height, v.roi_width, v.channels
            for c_out in v.conv_channels:
                h = -(-h // v.conv_stride)
                w = -(-w // v.conv_stride)
                cnn += (2.0 * batch * video_frames * h * w
                        * v.conv_kernel * v.conv_kernel * c_in * c_out)
                c_in = c_out
            cnn += 2.0 * batch * video_frames * h * w * c_in * v.embedding_dim
        comps["video_cnn"] = {"fwd": cnn, "factor": 3.0}
        venc_flops, video_frames = _encoder_flops(
            cfg.video_encoder, batch, video_frames, cfg.video.embedding_dim
        )
        comps["video_encoder"] = {"fwd": venc_flops, "factor": 3.0}
        video_out = encoder_output_dim(cfg.video_encoder)

    audio_out = encoder_output_dim(cfg.audio_encoder)

    if arch == "audio":
        memory_dims = [audio_out]
        memory_lens = [T_a]
    elif arch == "video":
        memory_dims = [video_out]
        memory_lens = [video_frames]
    elif arch == "bimodal":
        memory_dims = [audio_out, video_out]
        memory_lens = [T_a, video_frames]
    else:  # av_align
        ctx_v = cfg.fusion.memory_value_dim or video_out
        if cfg.fusion.fusion_type == "cross_attention":
            qk = cfg.fusion.attention_units * cfg.fusion.num_heads
            fusion = 2.0 * batch * T_a * audio_out * qk  # q proj
            fusion += 2.0 * batch * video_frames * video_out * qk  # k proj
            fusion += 2.0 * batch * video_frames * video_out * ctx_v  # v
            fusion += 2.0 * batch * T_a * video_frames * qk  # scores
            fusion += 2.0 * batch * T_a * video_frames * ctx_v  # context
            fusion += 2.0 * batch * T_a * ctx_v * ctx_v  # output proj
            if cfg.fusion.au_loss_weight > 0.0:
                fusion += 2.0 * batch * T_a * ctx_v * cfg.fusion.au_dim
            comps["fusion"] = {"fwd": fusion, "factor": 3.0}  # no remat scan
            memory_dims = [audio_out + ctx_v]
        else:
            H = cfg.audio_encoder.hidden_units[-1]
            fusion = _lstm_flops(batch, T_a, audio_out, H)
            if cfg.fusion.input_feeding:  # ctx -> 4H proj inside the scan
                fusion += 2.0 * batch * T_a * ctx_v * 4 * H
            fusion += _attention_flops(batch, T_a, video_frames, video_out,
                                       H, cfg.fusion.attention_units,
                                       value_dim=cfg.fusion.memory_value_dim)
            if cfg.fusion.au_loss_weight > 0.0:
                fusion += 2.0 * batch * T_a * ctx_v * cfg.fusion.au_dim
            # remat'd scan body
            comps["fusion"] = {"fwd": fusion, "factor": 4.0}
            memory_dims = [H + ctx_v]
        memory_lens = [T_a]

    # Decoder: input-fed LSTM stack + one attention per memory + out proj
    # (rnn), or causal self-attn + per-memory cross-attn (transformer).
    d = cfg.decoder
    dec = 0.0
    ctx_dims = [d.memory_value_dim or m for m in memory_dims]
    if d.decoder_type == "transformer":
        D = d.hidden_units[0]
        qk = d.attention_units * d.num_heads
        K = label_len
        if d.memory_value_dim:
            # prepare_memory's one-time value down-projection (the RNN
            # branch counts the identical matmul via _attention_flops).
            for m_dim, c_dim, m_len in zip(memory_dims, ctx_dims,
                                           memory_lens):
                dec += 2.0 * batch * m_len * m_dim * c_dim
        dec += 2.0 * batch * K * d.embedding_dim * D  # input projection
        for _ in d.hidden_units:
            dec += 4 * 2.0 * batch * K * D * D          # self qkv + out
            dec += 2 * 2.0 * batch * K * K * D          # causal attn
            dec += 2.0 * batch * K * D * qk             # cross queries
            for m_dim, c_dim, m_len in zip(memory_dims, ctx_dims,
                                           memory_lens):
                dec += 2.0 * batch * m_len * c_dim * qk  # cross keys
                dec += 2.0 * batch * K * m_len * qk      # cross scores
                dec += 2.0 * batch * K * m_len * c_dim   # cross context
            dec += 2.0 * batch * K * sum(ctx_dims) * D   # context out proj
            dec += 2 * 2.0 * batch * K * D * (d.ff_multiplier * D)
        dec += 2.0 * batch * K * D * vocab
        comps["decoder"] = {"fwd": dec, "factor": 3.0}  # no remat scan
    else:
        in_dim = d.embedding_dim + sum(ctx_dims)
        for h in d.hidden_units:
            dec += _lstm_flops(batch, label_len, in_dim, h)
            in_dim = h
        top = d.hidden_units[-1]
        for m_dim, m_len in zip(memory_dims, memory_lens):
            dec += _attention_flops(batch, label_len, m_len, m_dim, top,
                                    d.attention_units,
                                    value_dim=d.memory_value_dim)
        dec += 2.0 * batch * label_len * (top + sum(ctx_dims)) * vocab
        comps["decoder"] = {"fwd": dec, "factor": 4.0}  # remat'd scan body

    out: Dict[str, float] = {}
    fwd_total = train_total = 0.0
    for name, c in comps.items():
        out[name] = c["fwd"] * c["factor"]
        fwd_total += c["fwd"]
        train_total += out[name]
    out["forward"] = fwd_total
    out["total"] = train_total
    return out


# Peak dense-matmul throughput used for MFU normalization.
PEAK_BF16_FLOPS = {
    "TPU v5 lite": 197e12,  # v5e: 197 TFLOP/s bf16 per chip
    "cpu": 1e12,            # nominal placeholder for CPU runs
}


def peak_flops_of(device) -> float:
    kind = getattr(device, "device_kind", "") or ""
    for name, peak in PEAK_BF16_FLOPS.items():
        if name.lower() in kind.lower() or name.lower() in str(device).lower():
            return peak
    return PEAK_BF16_FLOPS["TPU v5 lite"]
