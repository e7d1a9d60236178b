"""Transformer decoder option (DecoderConfig.decoder_type="transformer").

Opt-in extension beyond the reference (which is an attention-LSTM decoder,
upstream:avsr/decoder_unimodal.py — SURVEY §2.2 row 5): a pre-LN causal
self-attention + cross-attention stack behind the decoder interface in
models/decoder.py, so seq2seq assembly, the greedy/beam engines, serving
export, and TP shardings are untouched.

Why, TPU-first: teacher-forced training runs ALL K label positions in
parallel — a handful of large MXU matmuls instead of a K-step lax.scan —
which, combined with encoder_type="transformer" and
fusion_type="cross_attention", makes the entire train step scan-free.
Autoregressive decode keeps the engines' early-exit while_loops and runs
one position per step against KV caches carried in the decoder state
(batch-leading, so beam reshuffling's pytree gather works unchanged).

Conventions shared with the RNN decoder: consumes the same prepared
``AttentionMemory`` tuples (so ``memory_value_dim``'s one-time value
down-projection applies identically), PAD/GO/EOS semantics, fp32 logits.
Scheduled sampling is an RNN-decoder curriculum (sequential by nature)
and is rejected at init for this family.
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from avsr_tpu.configs import DecoderConfig
from avsr_tpu.data.units import GO_ID
from avsr_tpu.models.transformer_common import (
    inverted_dropout as _dropout,
    layer_norm as _layer_norm,
    sinusoidal_pe as _sinusoidal_pe,
)
from avsr_tpu.ops import attention as attn
from avsr_tpu.utils.params import Params, glorot_uniform, normal_init


class TransformerDecoderState(NamedTuple):
    """Autoregressive decode state: per-layer self-attention KV caches
    ([N, L, D], batch-leading for the beam engine's pytree gather) and the
    per-row write position."""

    caches: Tuple  # tuple of (k_cache, v_cache) per layer
    step: jnp.ndarray  # [N] int32, identical values per row


def validate_transformer_decoder_config(
    cfg: DecoderConfig, ctx_dims: Sequence[int]
) -> int:
    dims = set(cfg.hidden_units)
    if len(dims) != 1:
        raise ValueError(
            "decoder_type='transformer' needs one model dim: all "
            f"hidden_units equal (got {cfg.hidden_units})"
        )
    d = cfg.hidden_units[0]
    if d % cfg.num_heads != 0:
        raise ValueError(
            f"decoder dim {d} not divisible by num_heads {cfg.num_heads}"
        )
    if d % 2:
        raise ValueError(
            f"decoder dim {d} must be even (sinusoidal position encodings "
            "interleave sin/cos pairs)"
        )
    for m in ctx_dims:
        if m % cfg.num_heads != 0:
            raise ValueError(
                f"attention memory dim {m} not divisible by decoder "
                f"num_heads {cfg.num_heads} (set memory_value_dim to a "
                "multiple, or change num_heads)"
            )
    if cfg.sampling_probability > 0.0 or cfg.sampling_ramp_steps > 0:
        raise ValueError(
            "scheduled sampling is an RNN-decoder curriculum (sequential "
            "by construction); the transformer decoder trains "
            "teacher-forced in parallel — set sampling_probability=0 and "
            "sampling_ramp_steps=0"
        )
    return d


def transformer_decoder_init(
    key,
    cfg: DecoderConfig,
    memory_dims: Sequence[int],
    vocab_size: int,
    dtype=jnp.float32,
) -> Params:
    ctx_dims = [cfg.memory_value_dim or m for m in memory_dims]
    d = validate_transformer_decoder_config(cfg, ctx_dims)
    total_ctx = sum(ctx_dims)
    n_layers = len(cfg.hidden_units)
    qk = cfg.attention_units * cfg.num_heads
    keys = jax.random.split(key, n_layers + 4)

    params: Params = {
        "embedding": normal_init(
            keys[0], (vocab_size, cfg.embedding_dim), dtype
        ),
        "in_proj": glorot_uniform(keys[1], (cfg.embedding_dim, d), dtype),
        "layers": [],
        "ln_f_scale": jnp.ones((d,), dtype),
        "ln_f_bias": jnp.zeros((d,), dtype),
        "out_w": glorot_uniform(keys[2], (d, vocab_size), dtype),
        "out_b": jnp.zeros((vocab_size,), dtype),
        # Same prepared-memory path as the RNN decoder (seq2seq.prep /
        # attn.prepare_memory), but value-only: the transformer computes
        # its own multi-head cross scores, so no Bahdanau/Luong score
        # params are created (they would sit dead in the checkpoint).
        "atts": [],
    }
    att_keys = jax.random.split(keys[3], len(memory_dims))
    for k, m in zip(att_keys, memory_dims):
        params["atts"].append(
            attn.value_only_init(k, m, cfg.memory_value_dim, dtype)
        )
    ff = cfg.ff_multiplier * d
    for i in range(n_layers):
        ks = jax.random.split(keys[4 + i], 8 + len(memory_dims))
        layer: Params = {
            "ln1_scale": jnp.ones((d,), dtype),
            "ln1_bias": jnp.zeros((d,), dtype),
            "wq": glorot_uniform(ks[0], (d, d), dtype),
            "wk": glorot_uniform(ks[1], (d, d), dtype),
            "wv": glorot_uniform(ks[2], (d, d), dtype),
            "wo": glorot_uniform(ks[3], (d, d), dtype),
            "ln_c_scale": jnp.ones((d,), dtype),
            "ln_c_bias": jnp.zeros((d,), dtype),
            "cq": glorot_uniform(ks[4], (d, qk), dtype),
            "ck": [
                glorot_uniform(ks[8 + j], (ctx_dims[j], qk), dtype)
                for j in range(len(memory_dims))
            ],
            "co": glorot_uniform(ks[5], (total_ctx, d), dtype),
            "ln2_scale": jnp.ones((d,), dtype),
            "ln2_bias": jnp.zeros((d,), dtype),
            "ff_w1": glorot_uniform(ks[6], (d, ff), dtype),
            "ff_b1": jnp.zeros((ff,), dtype),
            "ff_w2": glorot_uniform(ks[7], (ff, d), dtype),
            "ff_b2": jnp.zeros((d,), dtype),
        }
        params["layers"].append(layer)
    return params


def prepare_cross(
    params: Params,
    cfg: DecoderConfig,
    memories: Sequence[attn.AttentionMemory],
    *,
    compute_dtype=jnp.bfloat16,
) -> Tuple:
    """Project every memory's values to per-layer cross-attention keys
    ONCE (loop-invariant; the decode engines call this outside their
    while_loops and close over the result).  Returns, per layer, a tuple
    of [N, S, qk] key tensors (one per memory)."""
    cdt = compute_dtype
    out = []
    for layer in params["layers"]:
        per_mem = tuple(
            (mem.values.astype(cdt) @ ck.astype(cdt))
            for ck, mem in zip(layer["ck"], memories)
        )
        out.append(per_mem)
    return jax.lax.optimization_barrier(tuple(out))


def initial_cache(
    cfg: DecoderConfig, batch: int, max_length: int,
    dtype=jnp.float32,
) -> TransformerDecoderState:
    """KV caches for autoregressive decode.

    ``dtype`` should be the model's compute dtype: the cached k/v are
    the outputs of compute-dtype matmuls, so storing them wider loses
    nothing numerically while doubling the per-step cache read AND
    paying a full-cache cast every step (measured: the v2 decode loop
    is cache-traffic bound at ~6.3 ms/step with fp32 caches at
    B=128 x width 10, L=150 — RESULTS.md round 4)."""
    d = cfg.hidden_units[0]
    caches = tuple(
        (
            jnp.zeros((batch, max_length, d), dtype),
            jnp.zeros((batch, max_length, d), dtype),
        )
        for _ in cfg.hidden_units
    )
    return TransformerDecoderState(
        caches=caches, step=jnp.zeros((batch,), jnp.int32)
    )


def _cross_attend_rows(layer, cfg, h, memories, cross_keys, cdt):
    """Single-position cross attention: h [N, D] -> context [N, sum_ctx]."""
    nh, A = cfg.num_heads, cfg.attention_units
    y = _layer_norm(h, layer["ln_c_scale"], layer["ln_c_bias"]).astype(cdt)
    q = (y @ layer["cq"].astype(cdt)).reshape(-1, nh, A)
    ctxs = []
    for mem, k_proj in zip(memories, cross_keys):
        N, S, _ = k_proj.shape
        k = k_proj.reshape(N, S, nh, A)
        scores = jnp.einsum("nha,nsha->nhs", q, k).astype(jnp.float32)
        scores = scores / np.sqrt(A) + mem.bias[:, None, :]
        w = jax.nn.softmax(scores, axis=-1).astype(cdt)
        mv = mem.values.shape[-1]
        v = mem.values.astype(cdt).reshape(N, S, nh, mv // nh)
        ctxs.append(jnp.einsum("nhs,nshd->nhd", w, v).reshape(N, mv))
    return jnp.concatenate(ctxs, axis=-1)


def decode_step(
    params: Params,
    cfg: DecoderConfig,
    tokens: jnp.ndarray,
    state: TransformerDecoderState,
    memories: Sequence[attn.AttentionMemory],
    cross_kv: Optional[Tuple] = None,
    *,
    compute_dtype=jnp.bfloat16,
) -> Tuple[TransformerDecoderState, jnp.ndarray]:
    """One autoregressive position against the KV caches.

    Same contract as models/decoder.decoder_step: (new_state, fp32 logits
    [N, V]).  ``cross_kv`` is the loop-invariant result of
    ``prepare_cross`` (computed per step if absent)."""
    cdt = compute_dtype
    d = cfg.hidden_units[0]
    nh = cfg.num_heads
    dh = d // nh
    if cross_kv is None:
        cross_kv = prepare_cross(params, cfg, memories,
                                 compute_dtype=compute_dtype)
    N = tokens.shape[0]
    L = state.caches[0][0].shape[1]
    pe = _sinusoidal_pe(L, d)
    pos = jnp.clip(state.step, 0, L - 1)
    # INVARIANT: every decode engine keeps a SHARED position across rows
    # (step starts at zeros and increments by one for all rows; the beam
    # reorder permutes equal values), so the cache insert can be a single
    # dynamic_update_slice instead of an N-row scatter — XLA lowers the
    # scatter as a full-cache rewrite (~2x cache bytes per step at
    # B=128 x width 10; RESULTS.md round 4).
    pos0 = pos[0]

    emb = params["embedding"][tokens]  # [N, E]
    h = (emb.astype(cdt) @ params["in_proj"].astype(cdt)).astype(jnp.float32)
    h = h * np.sqrt(d) + jnp.take(pe, pos, axis=0)

    new_caches: List[Tuple[jnp.ndarray, jnp.ndarray]] = []
    for layer, (k_cache, v_cache), cross_keys in zip(
        params["layers"], state.caches, cross_kv
    ):
        y = _layer_norm(h, layer["ln1_scale"], layer["ln1_bias"]).astype(cdt)
        q = (y @ layer["wq"].astype(cdt)).reshape(N, nh, dh)
        # k/v are compute-dtype values; store them at the CACHE's dtype
        # (the decode engines allocate compute-dtype caches — exact, and
        # it halves the per-step cache traffic vs fp32 storage).
        k = y @ layer["wk"].astype(cdt)
        v = y @ layer["wv"].astype(cdt)
        k_cache = jax.lax.dynamic_update_slice_in_dim(
            k_cache, k.astype(k_cache.dtype)[:, None, :], pos0, axis=1)
        v_cache = jax.lax.dynamic_update_slice_in_dim(
            v_cache, v.astype(v_cache.dtype)[:, None, :], pos0, axis=1)
        new_caches.append((k_cache, v_cache))
        kh = k_cache.astype(cdt).reshape(N, L, nh, dh)
        vh = v_cache.astype(cdt).reshape(N, L, nh, dh)
        scores = jnp.einsum("nhd,nlhd->nhl", q, kh).astype(jnp.float32)
        scores = scores / np.sqrt(dh)
        causal = (
            jnp.arange(L)[None, :] <= pos[:, None]
        ).astype(jnp.float32)  # [N, L]
        scores = scores + (1.0 - causal)[:, None, :] * -1e9
        w = jax.nn.softmax(scores, axis=-1).astype(cdt)
        att = jnp.einsum("nhl,nlhd->nhd", w, vh).reshape(N, d)
        h = h + (att @ layer["wo"].astype(cdt)).astype(jnp.float32)

        ctx = _cross_attend_rows(layer, cfg, h, memories, cross_keys, cdt)
        h = h + (ctx.astype(cdt) @ layer["co"].astype(cdt)).astype(
            jnp.float32
        )

        y = _layer_norm(h, layer["ln2_scale"], layer["ln2_bias"]).astype(cdt)
        y = jax.nn.gelu(y @ layer["ff_w1"].astype(cdt)
                        + layer["ff_b1"].astype(cdt))
        h = h + (y @ layer["ff_w2"].astype(cdt)
                 + layer["ff_b2"].astype(cdt)).astype(jnp.float32)

    out = _layer_norm(h, params["ln_f_scale"], params["ln_f_bias"])
    logits = (
        out.astype(cdt) @ params["out_w"].astype(cdt)
    ).astype(jnp.float32) + params["out_b"]
    return (
        TransformerDecoderState(caches=tuple(new_caches),
                                step=state.step + 1),
        logits,
    )


def teacher_forced_logits(
    params: Params,
    cfg: DecoderConfig,
    targets: jnp.ndarray,
    target_lengths: jnp.ndarray,
    memories: Sequence[attn.AttentionMemory],
    *,
    rng: Optional[jax.Array] = None,
    compute_dtype=jnp.bfloat16,
    dropout: bool = False,
) -> jnp.ndarray:
    """Parallel teacher forcing: every label position in one pass (no
    scan).  Position k consumes token k-1 (GO at k=0) under a causal mask
    and predicts targets[:, k] — exactly the RNN decoder's step
    semantics, verified by the parallel==sequential equivalence test.
    Returns fp32 logits [B, K, V]."""
    cdt = compute_dtype
    d = cfg.hidden_units[0]
    nh = cfg.num_heads
    dh = d // nh
    A = cfg.attention_units
    B, K = targets.shape
    drop = cfg.dropout_rate if (dropout and rng is not None) else 0.0

    go = jnp.full((B, 1), GO_ID, jnp.int32)
    shifted = jnp.concatenate([go, targets[:, :-1]], axis=1)  # [B, K]
    emb = params["embedding"][shifted]  # [B, K, E]
    h = (emb.astype(cdt) @ params["in_proj"].astype(cdt)).astype(jnp.float32)
    h = h * np.sqrt(d) + _sinusoidal_pe(K, d)[None, :, :]

    causal = (
        jnp.arange(K)[None, :] <= jnp.arange(K)[:, None]
    ).astype(jnp.float32)  # [K_q, K_k]

    for layer in params["layers"]:
        if drop > 0.0:
            rng, k_att, k_ctx, k_ff = jax.random.split(rng, 4)
        y = _layer_norm(h, layer["ln1_scale"], layer["ln1_bias"]).astype(cdt)
        q = (y @ layer["wq"].astype(cdt)).reshape(B, K, nh, dh)
        k = (y @ layer["wk"].astype(cdt)).reshape(B, K, nh, dh)
        v = (y @ layer["wv"].astype(cdt)).reshape(B, K, nh, dh)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        scores = scores / np.sqrt(dh)
        scores = scores + (1.0 - causal)[None, None, :, :] * -1e9
        w = jax.nn.softmax(scores, axis=-1).astype(cdt)
        att = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, K, d)
        att = (att @ layer["wo"].astype(cdt)).astype(jnp.float32)
        if drop > 0.0:
            att = _dropout(att, drop, k_att)
        h = h + att

        y = _layer_norm(h, layer["ln_c_scale"], layer["ln_c_bias"]).astype(
            cdt
        )
        q = (y @ layer["cq"].astype(cdt)).reshape(B, K, nh, A)
        ctxs = []
        for mem, ck in zip(memories, layer["ck"]):
            S = mem.values.shape[1]
            mk = (mem.values.astype(cdt) @ ck.astype(cdt)).reshape(
                B, S, nh, A
            )
            cs = jnp.einsum("bqha,bsha->bhqs", q, mk).astype(jnp.float32)
            cs = cs / np.sqrt(A) + mem.bias[:, None, None, :]
            cw = jax.nn.softmax(cs, axis=-1).astype(cdt)
            mv = mem.values.shape[-1]
            mvh = mem.values.astype(cdt).reshape(B, S, nh, mv // nh)
            ctxs.append(
                jnp.einsum("bhqs,bshd->bqhd", cw, mvh).reshape(B, K, mv)
            )
        ctx = jnp.concatenate(ctxs, axis=-1)
        ctx = (ctx.astype(cdt) @ layer["co"].astype(cdt)).astype(jnp.float32)
        if drop > 0.0:
            ctx = _dropout(ctx, drop, k_ctx)
        h = h + ctx

        y = _layer_norm(h, layer["ln2_scale"], layer["ln2_bias"]).astype(cdt)
        y = jax.nn.gelu(y @ layer["ff_w1"].astype(cdt)
                        + layer["ff_b1"].astype(cdt))
        y = (y @ layer["ff_w2"].astype(cdt)
             + layer["ff_b2"].astype(cdt)).astype(jnp.float32)
        if drop > 0.0:
            y = _dropout(y, drop, k_ff)
        h = h + y

    out = _layer_norm(h, params["ln_f_scale"], params["ln_f_bias"])
    logits = (
        out.astype(cdt) @ params["out_w"].astype(cdt)
    ).astype(jnp.float32) + params["out_b"]
    return logits  # [B, K, V]
