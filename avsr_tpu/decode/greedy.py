"""Greedy decoding (GreedyEmbeddingHelper equivalent).

The reference uses ``GreedyEmbeddingHelper`` for training-time eval decode
(SURVEY.md §2.2 row 5).  Single ``lax.scan`` over a static horizon; once a
sequence emits EOS it keeps emitting PAD.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from avsr_tpu.configs import DecoderConfig
from avsr_tpu.data.units import EOS_ID, GO_ID, PAD_ID
from avsr_tpu.models import decoder as dec
from avsr_tpu.ops import attention as attn


def greedy_decode(
    params,
    cfg: DecoderConfig,
    memories: Sequence[attn.AttentionMemory],
    max_length: int,
    *,
    compute_dtype=jnp.bfloat16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (ids [B, max_length] int32 with PAD after EOS, lengths [B])."""
    B = memories[0].values.shape[0]
    memory_dims = [m.values.shape[-1] for m in memories]
    state0 = dec.initial_state(cfg, B, memory_dims)
    tok0 = jnp.full((B,), GO_ID, jnp.int32)
    done0 = jnp.zeros((B,), bool)

    def body(carry, _):
        state, tok, done = carry
        state, logits = dec.decoder_step(
            params, cfg, tok, state, memories, compute_dtype=compute_dtype
        )
        # PAD/GO are bookkeeping ids, never legal emissions.
        logits = logits.at[:, PAD_ID].set(-1e30).at[:, GO_ID].set(-1e30)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        out = jnp.where(done, PAD_ID, nxt)
        done_new = jnp.logical_or(done, nxt == EOS_ID)
        # Feed EOS while finished so the recurrence stays stable.
        feed = jnp.where(done, EOS_ID, nxt)
        return (state, feed, done_new), out

    (_, _, _), ids = jax.lax.scan(
        body, (state0, tok0, done0), None, length=max_length
    )
    ids = ids.T  # [B, L]
    # Length = position of first EOS (inclusive), or max_length.
    is_eos = ids == EOS_ID
    any_eos = jnp.any(is_eos, axis=1)
    first_eos = jnp.argmax(is_eos, axis=1)
    lengths = jnp.where(any_eos, first_eos + 1, max_length).astype(jnp.int32)
    return ids, lengths
