"""Attention character decoder (unimodal and bimodal).

Rebuild of the reference's ``Seq2SeqUnimodalDecoder`` /
``Seq2SeqBimodalDecoder`` (upstream:avsr/decoder_unimodal.py,
avsr/decoder_bimodal.py; SURVEY.md §2.2 rows 5-6):

  embedding -> LSTM stack with input feeding -> Bahdanau/Luong attention over
  one memory (unimodal) or two memories with two attention mechanisms
  (bimodal) -> output projection to the unit vocabulary.

Training uses teacher forcing with optional scheduled sampling
(``ScheduledEmbeddingTrainingHelper`` semantics: at each step, with
probability p, feed the model's own sampled prediction instead of the gold
token).  Decoding helpers (greedy / width-K beam search) reuse the exact
same ``decoder_step`` so train/decode can never diverge.

TPU design: a single ``lax.scan`` over label positions; memory keys are
projected once; the per-step work is the embedding gather, the fused LSTM
gate matmuls, the attention reads, and the output projection.  RNG for
scheduled sampling is folded through the scan carry.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from avsr_tpu.configs import DecoderConfig
from avsr_tpu.data.units import EOS_ID, GO_ID, PAD_ID
from avsr_tpu.ops import attention as attn
from avsr_tpu.ops import rnn
from avsr_tpu.utils.params import Params, glorot_uniform, normal_init


class DecoderState(NamedTuple):
    """Per-step decoder state (carried through scan / beam search)."""

    lstm: Tuple  # tuple of (h, c) per layer
    contexts: Tuple  # one [B, M_i] context per memory


def decoder_init(
    key,
    cfg: DecoderConfig,
    memory_dims: Sequence[int],
    vocab_size: int,
    dtype=jnp.float32,
) -> Params:
    if cfg.decoder_type == "transformer":
        from avsr_tpu.models.transformer_decoder import (
            transformer_decoder_init,
        )

        return transformer_decoder_init(key, cfg, memory_dims, vocab_size,
                                        dtype)
    if cfg.decoder_type != "rnn":
        raise ValueError(f"unknown decoder_type {cfg.decoder_type!r}")
    n_mem = len(memory_dims)
    # With memory_value_dim set, each attention context (the tensor carried
    # through input feeding and the output projection) has the projected
    # value dim, not the raw memory dim.
    ctx_dims = [cfg.memory_value_dim or m for m in memory_dims]
    total_ctx = sum(ctx_dims)
    keys = jax.random.split(key, 3 + len(cfg.hidden_units) + n_mem)
    k_emb, k_out, k_outb = keys[0], keys[1], keys[2]
    cell_keys = keys[3 : 3 + len(cfg.hidden_units)]
    att_keys = keys[3 + len(cfg.hidden_units) :]

    params: Params = {
        "embedding": normal_init(k_emb, (vocab_size, cfg.embedding_dim), dtype),
        "cells": [],
        "atts": [],
    }
    d = cfg.embedding_dim + total_ctx  # input feeding: [embed ; contexts]
    for k, h in zip(cell_keys, cfg.hidden_units):
        params["cells"].append(rnn.lstm_init(k, d, h, dtype))
        d = h
    top = cfg.hidden_units[-1]
    for k, m in zip(att_keys, memory_dims):
        params["atts"].append(
            attn.attention_init(cfg.attention_type, k, top, m,
                                cfg.attention_units, dtype,
                                value_dim=cfg.memory_value_dim)
        )
    # Output projection reads [h_top ; contexts] (TF1 attention-layer style).
    params["out_w"] = glorot_uniform(k_out, (top + total_ctx, vocab_size), dtype)
    params["out_b"] = jnp.zeros((vocab_size,), dtype)
    return params


def initial_state(
    cfg: DecoderConfig, batch: int, memory_dims: Sequence[int],
    max_length: Optional[int] = None,
    compute_dtype=jnp.float32,
):
    if cfg.decoder_type == "transformer":
        from avsr_tpu.models import transformer_decoder as tdec

        if max_length is None:
            raise ValueError(
                "transformer decoder state needs max_length (KV cache "
                "horizon); the decode engines pass their static horizon"
            )
        return tdec.initial_cache(cfg, batch, max_length,
                                  dtype=compute_dtype)
    lstm = tuple(
        (jnp.zeros((batch, h), jnp.float32), jnp.zeros((batch, h), jnp.float32))
        for h in cfg.hidden_units
    )
    contexts = tuple(jnp.zeros((batch, m), jnp.float32) for m in memory_dims)
    return DecoderState(lstm=lstm, contexts=contexts)


def decoder_step(
    params: Params,
    cfg: DecoderConfig,
    tokens: jnp.ndarray,
    state,
    memories: Sequence[attn.AttentionMemory],
    *,
    compute_dtype=jnp.bfloat16,
    dropout_masks: Optional[Sequence[jnp.ndarray]] = None,
    cross_kv=None,
) -> Tuple[DecoderState, jnp.ndarray]:
    """One decode step.

    Args:
      tokens: [B] int32 previous output tokens.
      state: DecoderState (rnn) or TransformerDecoderState (KV caches).
      memories: preprocessed attention memories (1 = unimodal, 2 = bimodal).
      dropout_masks: optional per-layer [B, H] variational dropout masks
        (training only; one fixed mask per sequence, DropoutWrapper-style).
      cross_kv: loop-invariant ``prepare_cross`` result (transformer only;
        the decode engines hoist it out of their while_loops).

    Returns (new_state, logits [B, V] fp32).
    """
    if cfg.decoder_type == "transformer":
        from avsr_tpu.models import transformer_decoder as tdec

        return tdec.decode_step(
            params, cfg, tokens, state, memories, cross_kv,
            compute_dtype=compute_dtype,
        )
    emb = params["embedding"][tokens]  # [B, E] gather
    x = jnp.concatenate([emb, *state.contexts], axis=-1)

    new_lstm: List[Tuple[jnp.ndarray, jnp.ndarray]] = []
    h = x
    for li, (cell_params, st) in enumerate(zip(params["cells"], state.lstm)):
        (h_new, c_new), _ = rnn.lstm_step(
            cell_params, h, st, compute_dtype=compute_dtype
        )
        new_lstm.append((h_new, c_new))
        h = h_new
        if dropout_masks is not None:
            h = h * dropout_masks[li]

    new_contexts = []
    for att_params, mem in zip(params["atts"], memories):
        ctx, _ = attn.attend(
            cfg.attention_type, att_params, h, mem, compute_dtype=compute_dtype
        )
        new_contexts.append(ctx)

    out_in = jnp.concatenate([h, *new_contexts], axis=-1)
    logits = (
        jnp.dot(
            out_in.astype(compute_dtype),
            params["out_w"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        + params["out_b"]
    )
    return DecoderState(lstm=tuple(new_lstm), contexts=tuple(new_contexts)), logits


def prepare_cross(
    params: Params,
    cfg: DecoderConfig,
    memories: Sequence[attn.AttentionMemory],
    *,
    compute_dtype=jnp.bfloat16,
):
    """Loop-invariant cross-attention key projections for the transformer
    decoder (None for the RNN family) — the decode engines compute this
    once, outside their while_loops, and close over it."""
    if cfg.decoder_type == "transformer":
        from avsr_tpu.models import transformer_decoder as tdec

        return tdec.prepare_cross(params, cfg, memories,
                                  compute_dtype=compute_dtype)
    return None


def teacher_forced_logits(
    params: Params,
    cfg: DecoderConfig,
    targets: jnp.ndarray,
    target_lengths: jnp.ndarray,
    memories: Sequence[attn.AttentionMemory],
    *,
    sampling_probability: Union[float, jax.Array] = 0.0,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
    dropout: bool = False,
) -> jnp.ndarray:
    """Training-time decode over gold targets.

    Args:
      targets: [B, K] gold unit ids INCLUDING the terminating EOS, padded
        with PAD.  Step k consumes token k-1 (GO at k=0) and predicts
        targets[:, k].
      sampling_probability: scheduled sampling p (0 = pure teacher forcing).
        May be a traced scalar so a ramp schedule (DecoderConfig.
        sampling_ramp_steps) varies p inside ONE compiled program; a traced
        p of exactly 0 reproduces teacher-forced logits (bernoulli(0) never
        fires, so gold tokens flow).

    Returns logits [B, K, V] fp32.
    """
    if cfg.decoder_type == "transformer":
        from avsr_tpu.models import transformer_decoder as tdec

        # Scheduled sampling is rejected at init for this family; the
        # parallel pass IS teacher forcing.
        return tdec.teacher_forced_logits(
            params, cfg, targets, target_lengths, memories, rng=rng,
            compute_dtype=compute_dtype, dropout=dropout,
        )
    B, K = targets.shape
    memory_dims = [m.values.shape[-1] for m in memories]
    state0 = initial_state(cfg, B, memory_dims)
    go = jnp.full((B,), GO_ID, jnp.int32)
    # Inputs at step k are targets[:, k-1] (teacher forcing), GO at k=0.
    shifted = jnp.concatenate([go[:, None], targets[:, :-1]], axis=1)  # [B, K]
    # A traced p keeps the sampling machinery in the program (its runtime
    # value decides per-step coins); a static float gates it out entirely.
    use_sampling = rng is not None and (
        isinstance(sampling_probability, jax.Array)
        or sampling_probability > 0.0
    )
    train_dropout = (
        cfg.dropout_rate > 0.0 and rng is not None and dropout
    )
    if rng is None:
        rng = jax.random.PRNGKey(0)
    dropout_masks = None
    if train_dropout:
        # Variational dropout: one fixed [B, H] mask per layer for the whole
        # sequence (applied to each step's LSTM output).
        from avsr_tpu.utils.rng import dropout_mask

        keep = 1.0 - cfg.dropout_rate
        masks = []
        for h_units in cfg.hidden_units:
            rng, sub = jax.random.split(rng)
            masks.append(dropout_mask(sub, keep, (B, h_units)))
        dropout_masks = tuple(masks)

    # Remat the step body: its dominant backward residual is the per-step
    # Bahdanau tanh tensor over the encoder memory ([B, S, A] x K steps);
    # recomputing in the backward scan beats saving/restoring it from HBM
    # (same pattern as the AV-Align fusion scan).
    @jax.checkpoint
    def body(carry, inp):
        state, prev_sampled, key = carry
        gold_in, k = inp
        if use_sampling:
            key, k_bern = jax.random.split(key)
            coin = jax.random.bernoulli(
                k_bern, sampling_probability, (B,)
            )
            # Never sample at step 0 (there is no previous prediction).
            coin = jnp.logical_and(coin, k > 0)
            tok = jnp.where(coin, prev_sampled, gold_in)
        else:
            tok = gold_in
        state, logits = decoder_step(
            params, cfg, tok, state, memories, compute_dtype=compute_dtype,
            dropout_masks=dropout_masks,
        )
        if use_sampling:
            key, k_samp = jax.random.split(key)
            sampled = jax.random.categorical(k_samp, logits).astype(jnp.int32)
        else:
            sampled = gold_in
        return (state, sampled, key), logits

    inputs = (shifted.T, jnp.arange(K, dtype=jnp.int32))  # time-major scan
    (_, _, _), logits_kbv = jax.lax.scan(
        body, (state0, go, rng), inputs
    )
    return jnp.transpose(logits_kbv, (1, 0, 2))  # [B, K, V]


def sequence_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    target_lengths: jnp.ndarray,
    *,
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    """Masked mean cross-entropy over valid label positions.

    Matches tf.contrib.seq2seq.sequence_loss with
    average_across_timesteps/batch: sum(ce * mask) / sum(mask).
    """
    B, K, V = logits.shape
    mask = (jnp.arange(K)[None, :] < target_lengths[:, None]).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    gold = jnp.take_along_axis(logp, targets[..., None], axis=-1).squeeze(-1)
    if label_smoothing > 0.0:
        smooth = jnp.mean(logp, axis=-1)
        gold = (1.0 - label_smoothing) * gold + label_smoothing * smooth
    ce = -gold  # [B, K]
    return jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)
