"""Masked content-based attention, shared by the decoder and AV-Align fusion.

The reference uses tf.contrib.seq2seq's BahdanauAttention / LuongAttention
inside ``AttentionWrapper`` for both the character decoder and the AV-Align
cross-modal encoder (upstream:avsr/decoder_unimodal.py, avsr/encoder.py;
SURVEY.md §2.2 rows 4-6).  One implementation lives here so masking is done
correctly exactly once (SURVEY §7.3 hard-part 3).

Design: a memory is preprocessed ONCE (key projection = one MXU matmul over
the whole [B, S, H] memory); each query step is then a cheap [B, A] x
[B, S, A] score.  Padded memory positions receive -inf scores and exactly
zero attention weight.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from avsr_tpu.utils.params import Params, glorot_uniform

NEG_INF = -1e30


class AttentionMemory(NamedTuple):
    """Preprocessed attention memory (compute keys once, query many times)."""

    values: jnp.ndarray  # [B, S, V]  memory vectors (decoder reads these);
                         # V = memory dim, or value_dim when down-projected
    keys: jnp.ndarray    # [B, S, A]  projected keys (Bahdanau) or [B, S, H] (Luong)
    mask: jnp.ndarray    # [B, S]     1.0 = valid position
    bias: jnp.ndarray    # [B, S]     0 where valid, NEG_INF where padded


def bahdanau_init(key, query_dim: int, memory_dim: int, attention_units: int,
                  dtype=jnp.float32, value_dim: Optional[int] = None) -> Params:
    kq, km, kv, kvp = jax.random.split(key, 4)
    params = {
        "wq": glorot_uniform(kq, (query_dim, attention_units), dtype),
        "wm": glorot_uniform(km, (memory_dim, attention_units), dtype),
        "v": glorot_uniform(kv, (attention_units, 1), dtype).squeeze(-1),
    }
    if value_dim is not None:
        params["wv"] = glorot_uniform(kvp, (memory_dim, value_dim), dtype)
    return params


def luong_init(key, query_dim: int, memory_dim: int, attention_units: int = 0,
               dtype=jnp.float32, value_dim: Optional[int] = None) -> Params:
    # Luong "general": score = q W m ; W maps query_dim -> memory_dim.
    kq, kvp = jax.random.split(key)
    params = {"wq": glorot_uniform(kq, (query_dim, memory_dim), dtype)}
    if value_dim is not None:
        params["wv"] = glorot_uniform(kvp, (memory_dim, value_dim), dtype)
    return params


def value_only_init(key, memory_dim: int, value_dim: Optional[int],
                    dtype=jnp.float32) -> Params:
    """Attention-memory params for consumers that use only the VALUES —
    the transformer decoder computes its own multi-head scores, so its
    memories carry just the optional value down-projection (no
    Bahdanau/Luong score params, which would otherwise sit dead in the
    checkpoint and the optimizer state)."""
    params: Params = {}
    if value_dim is not None:
        params["wv"] = glorot_uniform(key, (memory_dim, value_dim), dtype)
    return params


def attention_init(attention_type: str, key, query_dim: int, memory_dim: int,
                   attention_units: int, dtype=jnp.float32,
                   value_dim: Optional[int] = None) -> Params:
    """``value_dim`` adds a learned down-projection of the attention VALUES
    (scores/keys still see the full memory): per-query-step reads stream
    value_dim instead of memory_dim floats — the bandwidth knob for
    value-streaming-bound attention scans (RESULTS.md round-2 floor)."""
    if attention_type == "bahdanau":
        return bahdanau_init(key, query_dim, memory_dim, attention_units,
                             dtype, value_dim=value_dim)
    if attention_type == "luong":
        return luong_init(key, query_dim, memory_dim, attention_units, dtype,
                          value_dim=value_dim)
    raise ValueError(f"unknown attention type {attention_type}")


def prepare_memory(
    attention_type: str,
    params: Params,
    memory: jnp.ndarray,
    memory_lengths: jnp.ndarray,
    *,
    compute_dtype=jnp.bfloat16,
) -> AttentionMemory:
    """Project memory to keys once; build the additive mask bias."""
    B, S, _ = memory.shape
    mask = (jnp.arange(S)[None, :] < memory_lengths[:, None]).astype(jnp.float32)
    bias = (1.0 - mask) * NEG_INF
    if attention_type == "bahdanau":
        keys = jnp.einsum(
            "bsh,ha->bsa",
            memory.astype(compute_dtype),
            params["wm"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
    else:  # luong / value_only: keys are the raw memory (value_only
        # consumers never read mem.keys — XLA dead-code-eliminates it)
        keys = memory
    values = memory
    if "wv" in params:
        # Value down-projection, applied ONCE here (one MXU matmul over the
        # whole memory) so every subsequent per-step read streams the small
        # tensor instead of the raw memory.
        values = jnp.einsum(
            "bsh,hv->bsv",
            memory.astype(compute_dtype),
            params["wv"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
    return AttentionMemory(values=values, keys=keys, mask=mask, bias=bias)


def attend(
    attention_type: str,
    params: Params,
    query: jnp.ndarray,
    mem: AttentionMemory,
    *,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One attention read.

    Args:
      query: [B, Q] decoder/audio state.
    Returns:
      (context [B, H] fp32, weights [B, S] fp32; padded positions get 0).
    """
    if attention_type == "bahdanau":
        q = jnp.dot(
            query.astype(compute_dtype),
            params["wq"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )  # [B, A]
        e = jnp.tanh(mem.keys + q[:, None, :])  # [B, S, A]
        scores = jnp.einsum(
            "bsa,a->bs", e.astype(compute_dtype),
            params["v"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
    elif attention_type == "luong":
        q = jnp.dot(
            query.astype(compute_dtype),
            params["wq"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )  # [B, H]
        scores = jnp.einsum(
            "bsh,bh->bs",
            mem.keys.astype(compute_dtype),
            q.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
    else:
        raise ValueError(f"unknown attention type {attention_type}")

    scores = scores + mem.bias
    weights = jax.nn.softmax(scores, axis=-1) * mem.mask
    # Renormalize in case every position was masked (degenerate empty memory).
    weights = weights / jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), 1e-9)
    weights = weights * jnp.minimum(jnp.sum(mem.mask, axis=-1, keepdims=True), 1.0)
    context = jnp.einsum(
        "bs,bsh->bh",
        weights.astype(compute_dtype),
        mem.values.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return context, weights


def attend_batched_queries(
    attention_type: str,
    params: Params,
    queries: jnp.ndarray,
    mem: AttentionMemory,
    *,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All-timesteps attention: queries [B, T, Q] -> contexts [B, T, H].

    Used when the query sequence is known up front (monotonic-free scoring),
    letting the whole score tensor hit the MXU at once.
    """
    if attention_type == "bahdanau":
        q = jnp.einsum(
            "btq,qa->bta", queries.astype(compute_dtype),
            params["wq"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        e = jnp.tanh(mem.keys[:, None, :, :] + q[:, :, None, :])  # [B,T,S,A]
        scores = jnp.einsum(
            "btsa,a->bts", e.astype(compute_dtype),
            params["v"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
    else:
        q = jnp.einsum(
            "btq,qh->bth", queries.astype(compute_dtype),
            params["wq"].astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
        scores = jnp.einsum(
            "bth,bsh->bts", q.astype(compute_dtype),
            mem.keys.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
    scores = scores + mem.bias[:, None, :]
    weights = jax.nn.softmax(scores, axis=-1) * mem.mask[:, None, :]
    weights = weights / jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), 1e-9)
    contexts = jnp.einsum(
        "bts,bsh->bth", weights.astype(compute_dtype),
        mem.values.astype(compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return contexts, weights
