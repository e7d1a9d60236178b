"""Transformer encoder option (EncoderConfig.encoder_type="transformer").

Opt-in extension beyond the reference (which is BiLSTM-only,
upstream:avsr/encoder.py — SURVEY §2.2 row 3): a pre-LN self-attention
encoder stack behind the exact ``encoder_init``/``encoder_apply``
interface, so every downstream consumer (AV-Align fusion scan, decoder
attention memories, serving export) is untouched.

Why it exists, TPU-first: the BiLSTM stack is SEQUENTIAL-LATENCY bound on
TPU (hundreds of small scan steps; RESULTS.md component budget), while a
transformer layer is a handful of LARGE MXU matmuls over the whole
[T, B, D] block — no scan, no recurrence, XLA fuses the epilogues.  The
reference parity model remains the RNN default; this is the measured
"don't stop at parity" lever for users who accept a model change.

Same invariants as the RNN encoder: time-major [T, B, D], padded steps
exactly zero in the output, padding-invariant valid outputs (attention
masks padded KEYS; positional encodings are absolute so valid positions
see identical features regardless of pad horizon), pyramidal
``time_reduction`` supported between layers (frame folding + a learned
re-projection to d_model).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from avsr_tpu.configs import EncoderConfig
from avsr_tpu.models.transformer_common import (
    inverted_dropout as _dropout,
    layer_norm as _layer_norm,
    sinusoidal_pe,
)
from avsr_tpu.utils.params import Params, glorot_uniform

__all__ = [
    "validate_transformer_config",
    "transformer_encoder_init",
    "transformer_encoder_apply",
]


def validate_transformer_config(cfg: EncoderConfig) -> int:
    """Check transformer-specific invariants; returns d_model."""
    dims = set(cfg.hidden_units)
    if len(dims) != 1:
        raise ValueError(
            "encoder_type='transformer' needs one model dim: all "
            f"hidden_units equal (got {cfg.hidden_units}); depth = "
            "len(hidden_units)"
        )
    d = cfg.hidden_units[0]
    if d % cfg.num_heads != 0:
        raise ValueError(
            f"hidden dim {d} not divisible by num_heads {cfg.num_heads}"
        )
    if d % 2:
        raise ValueError(
            f"hidden dim {d} must be even (sinusoidal position encodings "
            "interleave sin/cos pairs)"
        )
    for knob in ("residual", "highway", "layer_norm"):
        if getattr(cfg, knob):
            raise ValueError(
                f"EncoderConfig.{knob} is an RNN-stack knob; the "
                "transformer encoder has its own residuals/LayerNorm"
            )
    if cfg.recurrent_dropout_rate > 0.0:
        raise ValueError(
            "recurrent_dropout_rate is RNN-only; use dropout_rate for the "
            "transformer's residual-branch dropout"
        )
    if cfg.conv_kernel is not None:
        k = cfg.conv_kernel
        if k < 3 or k % 2 == 0:
            raise ValueError(
                f"conv_kernel must be an odd width >= 3 (got {k}): the "
                "depthwise conv is centered so valid positions stay "
                "pad-horizon-invariant"
            )
    return d


def _sinusoidal_pe(T: int, d: int) -> jnp.ndarray:
    """[T, 1, d] absolute sinusoidal position encodings (fp32)."""
    return sinusoidal_pe(T, d)[:, None, :]


def transformer_encoder_init(
    key, cfg: EncoderConfig, input_dim: int, dtype=jnp.float32
) -> Params:
    from avsr_tpu.models.encoder import time_reductions

    d = validate_transformer_config(cfg)
    reductions = time_reductions(cfg)
    n_layers = len(cfg.hidden_units)
    keys = jax.random.split(key, n_layers + 1)
    in_dim = input_dim * reductions[0]
    params: Params = {
        "in_proj": glorot_uniform(keys[0], (in_dim, d), dtype),
        "in_bias": jnp.zeros((d,), dtype),
        "layers": [],
        "ln_f_scale": jnp.ones((d,), dtype),
        "ln_f_bias": jnp.zeros((d,), dtype),
    }
    ff = cfg.ff_multiplier * d
    for i in range(n_layers):
        ks = jax.random.split(keys[i + 1], 10)
        layer: Params = {
            "ln1_scale": jnp.ones((d,), dtype),
            "ln1_bias": jnp.zeros((d,), dtype),
            "wq": glorot_uniform(ks[0], (d, d), dtype),
            "wk": glorot_uniform(ks[1], (d, d), dtype),
            "wv": glorot_uniform(ks[2], (d, d), dtype),
            "wo": glorot_uniform(ks[3], (d, d), dtype),
            "ln2_scale": jnp.ones((d,), dtype),
            "ln2_bias": jnp.zeros((d,), dtype),
            "ff_w1": glorot_uniform(ks[4], (d, ff), dtype),
            "ff_b1": jnp.zeros((ff,), dtype),
            "ff_w2": glorot_uniform(ks[5], (ff, d), dtype),
            "ff_b2": jnp.zeros((d,), dtype),
        }
        if cfg.conv_kernel is not None:
            # conformer conv module: pointwise GLU -> depthwise -> pointwise
            k = cfg.conv_kernel
            layer["conv_ln_scale"] = jnp.ones((d,), dtype)
            layer["conv_ln_bias"] = jnp.zeros((d,), dtype)
            layer["conv_w_in"] = glorot_uniform(ks[7], (d, 2 * d), dtype)
            layer["conv_b_in"] = jnp.zeros((2 * d,), dtype)
            # depthwise kernel [k, 1, d] (WIO layout, feature_group_count=d)
            layer["conv_dw"] = glorot_uniform(ks[8], (k, 1, d), dtype)
            layer["conv_dw_ln_scale"] = jnp.ones((d,), dtype)
            layer["conv_dw_ln_bias"] = jnp.zeros((d,), dtype)
            layer["conv_w_out"] = glorot_uniform(ks[9], (d, d), dtype)
            layer["conv_b_out"] = jnp.zeros((d,), dtype)
        if i > 0 and reductions[i] > 1:
            # pyramid fold between layers: r*d -> d re-projection
            layer["fold"] = glorot_uniform(ks[6], (reductions[i] * d, d),
                                           dtype)
        params["layers"].append(layer)
    return params


def transformer_encoder_apply(
    params: Params,
    cfg: EncoderConfig,
    x_tbd: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, Tuple]:
    """Same contract as encoder.encoder_apply: time-major in/out, fp32
    outputs with padded steps exactly zero, (outputs, final_state) — the
    "final state" here is the masked mean over valid output steps (a
    sequence summary; discarded by every current caller, like the RNN
    one)."""
    from avsr_tpu.models.encoder import _time_reduce, time_reductions

    d = validate_transformer_config(cfg)
    reductions = time_reductions(cfg)
    n_heads = cfg.num_heads
    dh = d // n_heads
    drop = cfg.dropout_rate if train else 0.0

    T = x_tbd.shape[0]
    mask = (jnp.arange(T)[:, None] < lengths[None, :]).astype(jnp.float32)
    h = x_tbd * mask[:, :, None]
    if reductions[0] > 1:
        h = _time_reduce(h, reductions[0])
        lengths = -(-lengths // reductions[0])
        mask = (
            jnp.arange(h.shape[0])[:, None] < lengths[None, :]
        ).astype(jnp.float32)

    cdt = compute_dtype
    h = h.astype(cdt) @ params["in_proj"].astype(cdt) + params[
        "in_bias"
    ].astype(cdt)
    h = h.astype(jnp.float32) * np.sqrt(d) + _sinusoidal_pe(h.shape[0], d)
    h = h * mask[:, :, None]

    for i, layer in enumerate(params["layers"]):
        if i > 0 and reductions[i] > 1:
            h = h * mask[:, :, None]
            h = _time_reduce(h, reductions[i])
            lengths = -(-lengths // reductions[i])
            mask = (
                jnp.arange(h.shape[0])[:, None] < lengths[None, :]
            ).astype(jnp.float32)
            h = (h.astype(cdt) @ layer["fold"].astype(cdt)).astype(
                jnp.float32
            )
        Tl, B = h.shape[0], h.shape[1]
        if train and drop > 0.0:
            dropout_rng, k_att, k_ff, k_conv = jax.random.split(dropout_rng, 4)

        # -- self-attention block (pre-LN) --
        y = _layer_norm(h, layer["ln1_scale"], layer["ln1_bias"]).astype(cdt)
        yb = jnp.transpose(y, (1, 0, 2))  # [B, T, d]
        # One [d, 3d] matmul instead of three [d, d]: triples the MXU
        # tile count in N (the d=384 layers run K,N <= 3 tiles — the
        # family's measured bound, RESULTS.md round 4).  Params stay
        # separate (checkpoint layout unchanged); the concat is a 3-tile
        # copy and each output column block is bitwise-identical to the
        # separate matmuls.
        wqkv = jnp.concatenate(
            [layer["wq"].astype(cdt), layer["wk"].astype(cdt),
             layer["wv"].astype(cdt)], axis=1)
        qkv = (yb @ wqkv).reshape(B, Tl, 3, n_heads, dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        # [B, H, Tq, Tk] energies; padded KEYS masked before softmax (fp32)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        scores = scores / np.sqrt(dh)
        key_valid = jnp.transpose(mask, (1, 0))  # [B, Tk]
        scores = scores + (1.0 - key_valid)[:, None, None, :] * -1e9
        w = jax.nn.softmax(scores, axis=-1).astype(cdt)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, Tl, d)
        att = ctx @ layer["wo"].astype(cdt)
        att = jnp.transpose(att, (1, 0, 2)).astype(jnp.float32)
        if train and drop > 0.0:
            att = _dropout(att, drop, k_att)
        h = h + att

        # -- conformer conv module (pre-LN), between attention and FF --
        if cfg.conv_kernel is not None:
            y = _layer_norm(h, layer["conv_ln_scale"], layer["conv_ln_bias"])
            # Padded positions of h carry residual garbage between layers
            # (only the FINAL output is masked); attention never reads them
            # (padded KEYS are masked) but a time-conv WOULD — so the conv
            # branch masks its input, and again after the biased pointwise
            # (whose bias un-zeroes padded rows).  Out-of-range neighbors
            # then contribute exact zeros, keeping valid outputs invariant
            # to the pad horizon (tests/test_transformer_encoder.py).
            y = (y * mask[:, :, None]).astype(cdt)
            g = y @ layer["conv_w_in"].astype(cdt) + layer["conv_b_in"].astype(cdt)
            a, b_gate = jnp.split(g, 2, axis=-1)
            y = a * jax.nn.sigmoid(b_gate)  # GLU
            y = y * mask[:, :, None].astype(cdt)
            # The k-tap depthwise sum runs in f32 — BOTH operands cast, so
            # forward and transpose (grad) convs stay homogeneous-dtype
            # (preferred_element_type=f32 on bf16 operands broke the
            # transpose rule: f32 cotangent x bf16 kernel = mixed-dtype
            # conv TypeError).  f32 here costs ~nothing (the conv is
            # <<1% of step FLOPs) and keeps accumulation exact, matching
            # the fp32 CPU campaign that quality-gated the module.
            yb = jnp.transpose(y, (1, 0, 2)).astype(jnp.float32)  # [B, T, d]
            yb = jax.lax.conv_general_dilated(
                yb,
                layer["conv_dw"].astype(jnp.float32),
                window_strides=(1,),
                padding="SAME",
                dimension_numbers=("NWC", "WIO", "NWC"),
                feature_group_count=d,
            )
            y = jnp.transpose(yb, (1, 0, 2))
            y = _layer_norm(y, layer["conv_dw_ln_scale"],
                            layer["conv_dw_ln_bias"])
            y = y * jax.nn.sigmoid(y)  # swish
            y = (y.astype(cdt) @ layer["conv_w_out"].astype(cdt)
                 + layer["conv_b_out"].astype(cdt)).astype(jnp.float32)
            if train and drop > 0.0:
                y = _dropout(y, drop, k_conv)
            h = h + y

        # -- feed-forward block (pre-LN) --
        y = _layer_norm(h, layer["ln2_scale"], layer["ln2_bias"]).astype(cdt)
        y = jax.nn.gelu(y @ layer["ff_w1"].astype(cdt)
                        + layer["ff_b1"].astype(cdt))
        y = (y @ layer["ff_w2"].astype(cdt)
             + layer["ff_b2"].astype(cdt)).astype(jnp.float32)
        if train and drop > 0.0:
            y = _dropout(y, drop, k_ff)
        h = h + y

    out = _layer_norm(h, params["ln_f_scale"], params["ln_f_bias"])
    out = out * mask[:, :, None]
    denom = jnp.maximum(jnp.sum(mask, axis=0), 1.0)[:, None]
    summary = jnp.sum(out, axis=0) / denom  # [B, d] masked mean
    return out.astype(jnp.float32), (summary,)
