"""Stacked (Bi)LSTM sequence encoder.

TPU-native rebuild of the reference's ``Seq2SeqEncoder``
(upstream:avsr/encoder.py + avsr/cells.py, SURVEY.md §2.2 rows 3/7):
stacked LSTM/GRU layers via fused-gate ``lax.scan`` (avsr_tpu/ops/rnn.py),
optional bidirectionality per layer, per-layer output dropout, optional
residual connections.  Works on time-major [T, B, D] tensors throughout.

Opt-in extension beyond the reference: pyramidal time reduction
(``EncoderConfig.time_reduction``, LAS-style, arXiv:1508.01211) folds r
consecutive frames into the feature dim before a layer, cutting that
layer's sequential step count — and every downstream consumer of the
encoder output (fusion scan, decoder attention memory) — by r.  Use
``encoder_output_lengths`` for the valid-step counts of the output.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from avsr_tpu.configs import EncoderConfig
from avsr_tpu.ops import rnn
from avsr_tpu.utils.params import Params


def time_reductions(cfg: EncoderConfig) -> Tuple[int, ...]:
    """Per-layer input time-reduction factors, validated (all-1 if unset)."""
    if cfg.time_reduction is None:
        return (1,) * len(cfg.hidden_units)
    r = tuple(int(x) for x in cfg.time_reduction)
    if len(r) != len(cfg.hidden_units) or any(x < 1 for x in r):
        raise ValueError(
            f"time_reduction {cfg.time_reduction} must list one factor >= 1 "
            f"per layer ({len(cfg.hidden_units)} layers)"
        )
    return r


def total_time_reduction(cfg: EncoderConfig) -> int:
    out = 1
    for r in time_reductions(cfg):
        out *= r
    return out


def encoder_output_lengths(cfg: EncoderConfig, lengths):
    """Valid-step counts of the encoder OUTPUT: successive ceil-division of
    the input lengths by each layer's time-reduction factor."""
    for r in time_reductions(cfg):
        if r > 1:
            lengths = -(-lengths // r)
    return lengths


def _time_reduce(h: jnp.ndarray, r: int) -> jnp.ndarray:
    """[T, B, D] -> [ceil(T/r), B, r*D]: concat r consecutive frames (LAS
    pyramid step).  Caller must have zeroed padded steps first so a partly
    valid last group carries zeros, keeping padding invariance."""
    T, B, D = h.shape
    Tp = -(-T // r) * r
    if Tp != T:
        h = jnp.pad(h, ((0, Tp - T), (0, 0), (0, 0)))
    return h.reshape(Tp // r, r, B, D).transpose(0, 2, 1, 3).reshape(
        Tp // r, B, r * D
    )


def encoder_init(key, cfg: EncoderConfig, input_dim: int, dtype=jnp.float32) -> Params:
    if cfg.encoder_type == "transformer":
        from avsr_tpu.models.transformer import transformer_encoder_init

        return transformer_encoder_init(key, cfg, input_dim, dtype)
    if cfg.encoder_type != "rnn":
        raise ValueError(f"unknown encoder_type {cfg.encoder_type!r}")
    if cfg.conv_kernel is not None:
        raise ValueError(
            "EncoderConfig.conv_kernel is transformer-only (the conformer "
            "conv module); the RNN stack is already local"
        )
    layers = []
    d = input_dim
    keys = jax.random.split(key, len(cfg.hidden_units))
    for k, h, r in zip(keys, cfg.hidden_units, time_reductions(cfg)):
        d *= r
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
    if cfg.encoder_type == "transformer":
        return h  # d_model; self-attention is inherently bidirectional
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
      (outputs [T_out, B, H_out] fp32 with zeros at padded steps — T_out
       = T reduced by the pyramid factors (== T without time_reduction);
       valid counts via ``encoder_output_lengths`` —, final state of the
       last layer).
    """
    if cfg.encoder_type == "transformer":
        from avsr_tpu.models.transformer import transformer_encoder_apply

        return transformer_encoder_apply(
            params, cfg, x_tbd, lengths, train=train,
            dropout_rng=dropout_rng, compute_dtype=compute_dtype,
        )
    T, B, _ = x_tbd.shape
    mask = (jnp.arange(T)[:, None] < lengths[None, :]).astype(jnp.float32)
    h = x_tbd
    final_state = None
    reductions = time_reductions(cfg)
    for i, layer in enumerate(params["layers"]):
        if reductions[i] > 1:
            # Zero padded steps before folding so the (possibly partly
            # valid) last group carries zeros regardless of pad length,
            # then fold r frames into the feature dim (LAS pyramid).
            h = h * mask[:, :, None]
            h = _time_reduce(h, reductions[i])
            lengths = -(-lengths // reductions[i])
            mask = (
                jnp.arange(h.shape[0])[:, None] < lengths[None, :]
            ).astype(jnp.float32)
        prev = h
        rd_masks, dropout_rng = _rd_masks(layer, cfg, B, train, dropout_rng)
        h, final_state = _layer_scan(
            layer, cfg, h, mask, rd_masks, compute_dtype
        )
        h, dropout_rng = _post_layer(
            layer, cfg, prev, h, train, dropout_rng, compute_dtype
        )
    # Re-zero padded steps (residual/dropout can reintroduce nonzeros).
    h = h * mask[:, :, None]
    return h, final_state


def _rd_masks(layer, cfg: EncoderConfig, B: int, train: bool, dropout_rng):
    """Variational recurrent dropout masks: one fixed [B, H] mask per
    layer/direction, applied to the recurrent input every step."""
    use_rd = (
        train and cfg.recurrent_dropout_rate > 0.0 and dropout_rng is not None
        and cfg.cell_type == "lstm"
    )
    if not use_rd:
        return None, dropout_rng
    from avsr_tpu.utils.rng import dropout_mask

    keep = 1.0 - cfg.recurrent_dropout_rate
    H = layer["fwd"]["wh"].shape[0]
    dropout_rng, k1, k2 = jax.random.split(dropout_rng, 3)
    return (
        (dropout_mask(k1, keep, (B, H)), dropout_mask(k2, keep, (B, H))),
        dropout_rng,
    )


def _layer_scan(layer, cfg: EncoderConfig, h, mask, rd_masks, compute_dtype):
    if cfg.bidirectional:
        return rnn.bidirectional_scan(
            cfg.cell_type, layer["fwd"], layer["bwd"], h, mask,
            compute_dtype=compute_dtype, unroll=cfg.scan_unroll,
            recurrent_dropout_masks=rd_masks,
        )
    kw = {}
    if rd_masks is not None:
        kw["recurrent_dropout_mask"] = rd_masks[0]
    return rnn.rnn_scan(
        cfg.cell_type, layer["fwd"], h, mask,
        compute_dtype=compute_dtype, unroll=cfg.scan_unroll, **kw,
    )


def _post_layer(layer, cfg: EncoderConfig, prev, h, train, dropout_rng,
                compute_dtype):
    """Residual / highway wrapper + output dropout after one layer's scan."""
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
    return h, dropout_rng


def can_pair_encoders(cfg_a: EncoderConfig, cfg_b: EncoderConfig,
                      train: bool) -> bool:
    """True when paired_encoder_apply can fuse at least the first layers of
    two independent encoder stacks into one scan: plain bidirectional LSTM
    cells (the custom-VJP direction-batched core's contract) with equal
    first-layer hidden sizes.  Recurrent dropout is per-stream state inside
    the scan body and is not supported by the batched core."""
    for c in (cfg_a, cfg_b):
        if c.encoder_type != "rnn":
            return False
        if c.cell_type != "lstm" or not c.bidirectional or c.layer_norm:
            return False
        if c.scan_unroll != 1:
            return False
        if train and c.recurrent_dropout_rate > 0.0:
            return False
        if total_time_reduction(c) > 1:
            # paired_encoder_apply computes masks once per stack and never
            # re-derives lengths between layers, so pyramidal stacks must
            # take the unpaired path
            return False
    return cfg_a.hidden_units[0] == cfg_b.hidden_units[0]


def paired_encoder_apply(
    params_a: Params,
    cfg_a: EncoderConfig,
    xa_tbd: jnp.ndarray,
    lengths_a: jnp.ndarray,
    params_b: Params,
    cfg_b: EncoderConfig,
    xb_tbd: jnp.ndarray,
    lengths_b: jnp.ndarray,
    *,
    train: bool = False,
    dropout_rng_a: Optional[jax.Array] = None,
    dropout_rng_b: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
) -> Tuple[Tuple[jnp.ndarray, Tuple], Tuple[jnp.ndarray, Tuple]]:
    """Encode TWO independent sequences, batching same-depth layers of the
    two stacks into single scans (rnn.multi_fused_bilstm_scan).

    The audio and video encoders of the AV regimes are independent chains
    whose scans would otherwise serialize on a TPU core; zipping their
    layers cuts the sequential scan depth from sum(T_a * L_a + T_v * L_v)
    steps to max-based wavefronts wherever hidden sizes line up.  Numerics —
    including every dropout draw — are IDENTICAL to two encoder_apply calls
    with the same rngs (tested in tests/test_encoder_wrappers.py).

    Returns ((out_a, state_a), (out_b, state_b)) exactly as encoder_apply.
    """
    Ta, B, _ = xa_tbd.shape
    Tb = xb_tbd.shape[0]
    mask_a = (jnp.arange(Ta)[:, None] < lengths_a[None, :]).astype(jnp.float32)
    mask_b = (jnp.arange(Tb)[:, None] < lengths_b[None, :]).astype(jnp.float32)
    la, lb = params_a["layers"], params_b["layers"]
    ha, hb = xa_tbd, xb_tbd
    state_a = state_b = None
    rng_a, rng_b = dropout_rng_a, dropout_rng_b
    fuse_ok = can_pair_encoders(cfg_a, cfg_b, train)
    for i in range(max(len(la), len(lb))):
        A = la[i] if i < len(la) else None
        Bb = lb[i] if i < len(lb) else None
        if A is not None:
            prev_a, (rd_a, rng_a) = ha, _rd_masks(A, cfg_a, B, train, rng_a)
        if Bb is not None:
            prev_b, (rd_b, rng_b) = hb, _rd_masks(Bb, cfg_b, B, train, rng_b)
        if (
            A is not None and Bb is not None and fuse_ok
            and cfg_a.hidden_units[i] == cfg_b.hidden_units[i]
        ):
            (ha, state_a), (hb, state_b) = rnn.multi_fused_bilstm_scan(
                [
                    (A["fwd"], A["bwd"], ha, mask_a),
                    (Bb["fwd"], Bb["bwd"], hb, mask_b),
                ],
                compute_dtype=compute_dtype,
            )
        else:
            if A is not None:
                ha, state_a = _layer_scan(A, cfg_a, ha, mask_a, rd_a,
                                          compute_dtype)
            if Bb is not None:
                hb, state_b = _layer_scan(Bb, cfg_b, hb, mask_b, rd_b,
                                          compute_dtype)
        if A is not None:
            ha, rng_a = _post_layer(A, cfg_a, prev_a, ha, train, rng_a,
                                    compute_dtype)
        if Bb is not None:
            hb, rng_b = _post_layer(Bb, cfg_b, prev_b, hb, train, rng_b,
                                    compute_dtype)
    ha = ha * mask_a[:, :, None]
    hb = hb * mask_b[:, :, None]
    return (ha, state_a), (hb, state_b)
