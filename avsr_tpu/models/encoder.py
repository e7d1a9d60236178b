"""Stacked (Bi)LSTM sequence encoder.

TPU-native rebuild of the reference's ``Seq2SeqEncoder``
(upstream:avsr/encoder.py + avsr/cells.py, SURVEY.md §2.2 rows 3/7):
stacked LSTM/GRU layers via fused-gate ``lax.scan`` (avsr_tpu/ops/rnn.py),
optional bidirectionality per layer, per-layer output dropout, optional
residual connections.  Works on time-major [T, B, D] tensors throughout.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from avsr_tpu.configs import EncoderConfig
from avsr_tpu.ops import rnn
from avsr_tpu.utils.params import Params


def encoder_init(key, cfg: EncoderConfig, input_dim: int, dtype=jnp.float32) -> Params:
    layers = []
    d = input_dim
    keys = jax.random.split(key, len(cfg.hidden_units))
    for k, h in zip(keys, cfg.hidden_units):
        layer = {}
        if cfg.bidirectional:
            kf, kb, kh = jax.random.split(k, 3)
            layer["fwd"] = rnn.cell_init(cfg.cell_type, kf, d, h, dtype,
                                         layer_norm=cfg.layer_norm)
            layer["bwd"] = rnn.cell_init(cfg.cell_type, kb, d, h, dtype,
                                         layer_norm=cfg.layer_norm)
            d_out = 2 * h
        else:
            k, kh = jax.random.split(k)
            layer["fwd"] = rnn.cell_init(cfg.cell_type, k, d, h, dtype,
                                         layer_norm=cfg.layer_norm)
            d_out = h
        if cfg.highway and d == d_out:
            # transform-gate bias init -1: start close to carry-through
            from avsr_tpu.utils.params import glorot_uniform

            layer["hw_w"] = glorot_uniform(kh, (d, d_out), dtype)
            layer["hw_b"] = jnp.full((d_out,), -1.0, dtype)
        layers.append(layer)
        d = d_out
    return {"layers": layers}


def encoder_output_dim(cfg: EncoderConfig) -> int:
    h = cfg.hidden_units[-1]
    return 2 * h if cfg.bidirectional else h


def encoder_apply(
    params: Params,
    cfg: EncoderConfig,
    x_tbd: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    train: bool = False,
    dropout_rng: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, Tuple]:
    """Encode a time-major feature sequence.

    Args:
      x_tbd: [T, B, D] features.
      lengths: [B] int32 valid step counts.

    Returns:
      (outputs [T, B, H_out] fp32 with zeros at padded steps,
       final state of the last layer).
    """
    T, B, _ = x_tbd.shape
    mask = (jnp.arange(T)[:, None] < lengths[None, :]).astype(jnp.float32)
    h = x_tbd
    final_state = None
    use_rd = (
        train and cfg.recurrent_dropout_rate > 0.0 and dropout_rng is not None
        and cfg.cell_type == "lstm"
    )
    for i, layer in enumerate(params["layers"]):
        prev = h
        rd_masks = None
        if use_rd:
            # Variational recurrent dropout: one fixed [B, H] mask per
            # layer/direction, applied to the recurrent input every step.
            from avsr_tpu.utils.rng import dropout_mask

            keep = 1.0 - cfg.recurrent_dropout_rate
            H = layer["fwd"]["wh"].shape[0]
            dropout_rng, k1, k2 = jax.random.split(dropout_rng, 3)
            rd_masks = (dropout_mask(k1, keep, (B, H)),
                        dropout_mask(k2, keep, (B, H)))
        if cfg.bidirectional:
            h, final_state = rnn.bidirectional_scan(
                cfg.cell_type, layer["fwd"], layer["bwd"], h, mask,
                compute_dtype=compute_dtype, unroll=cfg.scan_unroll,
                recurrent_dropout_masks=rd_masks,
            )
        else:
            kw = {}
            if rd_masks is not None:
                kw["recurrent_dropout_mask"] = rd_masks[0]
            h, final_state = rnn.rnn_scan(
                cfg.cell_type, layer["fwd"], h, mask,
                compute_dtype=compute_dtype, unroll=cfg.scan_unroll, **kw,
            )
        if cfg.residual and prev.shape[-1] == h.shape[-1]:
            h = h + prev
        elif "hw_w" in layer:  # highway wrapper (dims matched at init)
            t = jax.nn.sigmoid(
                jnp.einsum(
                    "tbd,dk->tbk", prev.astype(compute_dtype),
                    layer["hw_w"].astype(compute_dtype),
                    preferred_element_type=jnp.float32,
                ) + layer["hw_b"]
            )
            h = t * h + (1.0 - t) * prev
        if train and cfg.dropout_rate > 0.0 and dropout_rng is not None:
            from avsr_tpu.utils.rng import dropout_mask

            dropout_rng, sub = jax.random.split(dropout_rng)
            keep = 1.0 - cfg.dropout_rate
            # hardware-RNG (rbg) mask bits: these [T, B, H] draws are the
            # train step's largest RNG cost (utils/rng.py, 4x faster)
            h = h * dropout_mask(sub, keep, h.shape, h.dtype)
    # Re-zero padded steps (residual/dropout can reintroduce nonzeros).
    h = h * mask[:, :, None]
    return h, final_state
