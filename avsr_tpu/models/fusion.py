"""AV-Align cross-modal fusion encoder.

Mechanism (arXiv:1809.01728; SURVEY.md §2.2 row 4, §3.4): the TOP audio
LSTM attends over the video encoder's output states at every audio timestep;
the attended visual context c_t is concatenated with the audio output to form
the fused memory the decoder attends over:

    for t in 1..T_a:
        alpha_t = attention(audio_state_t, V)        # Bahdanau-scored
        c_t     = sum_i alpha_ti * V_i
        fused_t = [audio_out_t ; c_t]

The TASLP-2020 variant adds an action-unit regression head on c_t so the
cross-modal alignment becomes meaningful on harder data (LRS2).

TPU design: one ``lax.scan`` over audio time carrying (h, c, prev_context);
the video memory keys are projected ONCE before the scan; the audio-input
projection x@Wx is hoisted out of the scan; only the recurrent matmul, the
context-input projection, and the attention read run per step.  Input
feeding (attended context into the next LSTM step input) matches TF1
``AttentionWrapper`` semantics and is config-gated.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from avsr_tpu.configs import FusionConfig
from avsr_tpu.ops import attention as attn
from avsr_tpu.ops import rnn
from avsr_tpu.utils.params import Params, glorot_uniform


class AVAlignOutput(NamedTuple):
    fused: jnp.ndarray          # [T_a, B, H_a + H_v] fused decoder memory
    alignments: jnp.ndarray     # [T_a, B, T_v] cross-modal attention weights
    au_predictions: Optional[jnp.ndarray]  # [T_a, B, au_dim] or None


def av_align_init(
    key,
    cfg: FusionConfig,
    audio_input_dim: int,
    audio_hidden: int,
    video_dim: int,
    dtype=jnp.float32,
) -> Params:
    k_cell, k_ctx, k_att, k_au = jax.random.split(key, 4)
    params: Params = {
        # Top audio LSTM cell; its x-projection covers only the acoustic
        # input — the context input has its own projection so the x part can
        # be hoisted out of the scan.
        "cell": rnn.lstm_init(k_cell, audio_input_dim, audio_hidden, dtype),
        "att": attn.attention_init(
            cfg.attention_type, k_att, audio_hidden, video_dim,
            cfg.attention_units, dtype, value_dim=cfg.memory_value_dim,
        ),
    }
    # With memory_value_dim set, the attended context (and hence the fused
    # memory's visual half, the input-feeding path, and the AU head input)
    # has the projected dim.
    ctx_dim = cfg.memory_value_dim or video_dim
    if cfg.input_feeding:
        params["ctx_proj"] = glorot_uniform(
            k_ctx, (ctx_dim, 4 * audio_hidden), dtype
        )
    if cfg.au_loss_weight > 0.0:
        params["au_w"] = glorot_uniform(k_au, (ctx_dim, cfg.au_dim), dtype)
        params["au_b"] = jnp.zeros((cfg.au_dim,), dtype)
    return params


def av_align_apply(
    params: Params,
    cfg: FusionConfig,
    audio_tbd: jnp.ndarray,
    audio_lengths: jnp.ndarray,
    video_memory: jnp.ndarray,
    video_lengths: jnp.ndarray,
    *,
    compute_dtype=jnp.bfloat16,
) -> AVAlignOutput:
    """Run the cross-modal attention audio encoder layer.

    Args:
      audio_tbd: [T_a, B, D] output of the lower audio encoder layers
        (time-major).
      video_memory: [B, T_v, H_v] video encoder outputs (batch-major memory).

    Returns fused memory (time-major), alignments, and AU predictions.
    """
    T_a, B, _ = audio_tbd.shape
    H = params["cell"]["wh"].shape[0]

    mem = attn.prepare_memory(
        cfg.attention_type, params["att"], video_memory, video_lengths,
        compute_dtype=compute_dtype,
    )
    Hv = mem.values.shape[-1]  # = video dim, or memory_value_dim if projected
    # Hoisted acoustic-input projection: [T_a, B, 4H] in one matmul.
    xw = jnp.einsum(
        "tbd,dg->tbg",
        audio_tbd.astype(compute_dtype),
        params["cell"]["wx"].astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    mask = (jnp.arange(T_a)[:, None] < audio_lengths[None, :]).astype(jnp.float32)

    ctx_proj = params.get("ctx_proj")

    # Remat the scan body: its dominant linearization residual is the
    # per-step Bahdanau tanh tensor ([B, T_v, A] — ~2 GB across a 6 s
    # utterance at B=128); recomputing it in the backward scan trades a few
    # cheap VPU ops for that entire HBM save/restore.
    @jax.checkpoint
    def body(carry, inp):
        h, c, ctx = carry
        xw_t, m_t = inp
        gate_in = xw_t
        if ctx_proj is not None:
            gate_in = gate_in + jnp.dot(
                ctx.astype(compute_dtype),
                ctx_proj.astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
        (h_new, c_new), _ = rnn.lstm_step(
            params["cell"], gate_in, (h, c), preprojected=True,
            compute_dtype=compute_dtype,
        )
        ctx_new, align = attn.attend(
            cfg.attention_type, params["att"], h_new, mem,
            compute_dtype=compute_dtype,
        )
        m = m_t[:, None]
        h_out = m * h_new + (1.0 - m) * h
        c_out = m * c_new + (1.0 - m) * c
        ctx_out = m * ctx_new + (1.0 - m) * ctx
        return (h_out, c_out, ctx_out), (h_new * m, ctx_new * m, align * m)

    h0 = jnp.zeros((B, H), jnp.float32)
    c0 = jnp.zeros((B, H), jnp.float32)
    ctx0 = jnp.zeros((B, Hv), jnp.float32)
    _, (hs, ctxs, aligns) = jax.lax.scan(body, (h0, c0, ctx0), (xw, mask))

    fused = jnp.concatenate([hs, ctxs], axis=-1)  # [T_a, B, H + Hv]

    au_pred = None
    if "au_w" in params:
        au_pred = (
            jnp.einsum(
                "tbh,hd->tbd", ctxs.astype(compute_dtype),
                params["au_w"].astype(compute_dtype),
                preferred_element_type=jnp.float32,
            )
            + params["au_b"]
        ) * mask[:, :, None]

    return AVAlignOutput(fused=fused, alignments=aligns, au_predictions=au_pred)


def cross_attention_fusion_init(
    key,
    cfg: FusionConfig,
    audio_dim: int,
    video_dim: int,
    dtype=jnp.float32,
) -> Params:
    """Scan-free fusion (FusionConfig.fusion_type="cross_attention" —
    opt-in extension, no reference counterpart): multi-head cross
    attention with audio queries over video keys/values.  The fused
    memory keeps AV-Align's [audio ; attended-visual-context] layout, so
    the decoder and AU head are unchanged; what changes is HOW the
    context is computed — a few large MXU matmuls over the whole
    [T_a, B, ...] block instead of a sequential lax.scan (the scan is the
    train step's largest single consumer, RESULTS.md component budget).
    """
    ctx_dim = cfg.memory_value_dim or video_dim
    if ctx_dim % cfg.num_heads != 0:
        raise ValueError(
            f"fusion context dim {ctx_dim} (memory_value_dim or video dim) "
            f"not divisible by fusion num_heads {cfg.num_heads}"
        )
    qk = cfg.attention_units * cfg.num_heads
    ks = jax.random.split(key, 5)
    params: Params = {
        "wq": glorot_uniform(ks[0], (audio_dim, qk), dtype),
        "wk": glorot_uniform(ks[1], (video_dim, qk), dtype),
        "wv": glorot_uniform(ks[2], (video_dim, ctx_dim), dtype),
        "wo": glorot_uniform(ks[3], (ctx_dim, ctx_dim), dtype),
    }
    if cfg.au_loss_weight > 0.0:
        params["au_w"] = glorot_uniform(ks[4], (ctx_dim, cfg.au_dim), dtype)
        params["au_b"] = jnp.zeros((cfg.au_dim,), dtype)
    return params


def cross_attention_fusion_apply(
    params: Params,
    cfg: FusionConfig,
    audio_tbd: jnp.ndarray,
    audio_lengths: jnp.ndarray,
    video_memory: jnp.ndarray,
    video_lengths: jnp.ndarray,
    *,
    compute_dtype=jnp.bfloat16,
) -> AVAlignOutput:
    """Same contract as av_align_apply (fused memory is
    [audio_out ; context], time-major, padded steps exactly zero;
    alignments [T_a, B, T_v] are the head-averaged attention weights)."""
    cdt = compute_dtype
    T_a, B, _ = audio_tbd.shape
    T_v = video_memory.shape[1]
    nh = cfg.num_heads
    A = cfg.attention_units
    ctx_dim = params["wv"].shape[-1]
    dv = ctx_dim // nh

    a_bm = jnp.transpose(audio_tbd, (1, 0, 2)).astype(cdt)  # [B, T_a, Da]
    vm = video_memory.astype(cdt)
    q = (a_bm @ params["wq"].astype(cdt)).reshape(B, T_a, nh, A)
    k = (vm @ params["wk"].astype(cdt)).reshape(B, T_v, nh, A)
    v = (vm @ params["wv"].astype(cdt)).reshape(B, T_v, nh, dv)
    scores = jnp.einsum("bqha,bkha->bhqk", q, k).astype(jnp.float32)
    scores = scores / jnp.sqrt(jnp.float32(A))
    key_valid = (
        jnp.arange(T_v)[None, :] < video_lengths[:, None]
    ).astype(jnp.float32)  # [B, T_v]
    scores = scores + (1.0 - key_valid)[:, None, None, :] * -1e9
    w = jax.nn.softmax(scores, axis=-1)  # [B, nh, T_a, T_v] fp32
    ctx = jnp.einsum("bhqk,bkhd->bqhd", w.astype(cdt), v).reshape(
        B, T_a, ctx_dim
    )
    ctx = (ctx @ params["wo"].astype(cdt)).astype(jnp.float32)

    a_mask = (
        jnp.arange(T_a)[:, None] < audio_lengths[None, :]
    ).astype(jnp.float32)  # [T_a, B]
    ctx_tm = jnp.transpose(ctx, (1, 0, 2)) * a_mask[:, :, None]
    fused = jnp.concatenate(
        [audio_tbd * a_mask[:, :, None], ctx_tm], axis=-1
    )
    aligns = jnp.transpose(jnp.mean(w, axis=1), (1, 0, 2)) * a_mask[:, :, None]

    au_pred = None
    if "au_w" in params:
        au_pred = (
            jnp.einsum(
                "tbh,hd->tbd", ctx_tm.astype(cdt),
                params["au_w"].astype(cdt),
                preferred_element_type=jnp.float32,
            )
            + params["au_b"]
        ) * a_mask[:, :, None]

    return AVAlignOutput(fused=fused, alignments=aligns, au_predictions=au_pred)


def au_regression_loss(
    au_pred: jnp.ndarray,
    au_target: jnp.ndarray,
    audio_lengths: jnp.ndarray,
    row_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Masked MSE between predicted and target action units.

    au_pred/au_target: [T_a, B, au_dim]; targets are video AU values mapped
    to the audio frame rate by the data pipeline (nearest-frame mapping).
    ``row_weights`` [B] excludes rows with no real AU stream (the loader's
    repeated padding rows and au=None utterances) — without it their
    all-zero targets would regress predictions toward 0 at full weight.
    """
    T_a = au_pred.shape[0]
    mask = (jnp.arange(T_a)[:, None] < audio_lengths[None, :]).astype(jnp.float32)
    if row_weights is not None:
        mask = mask * row_weights[None, :].astype(jnp.float32)
    sq = jnp.sum(jnp.square(au_pred - au_target), axis=-1)  # [T_a, B]
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(sq * mask) / denom
