"""Greedy decoding (GreedyEmbeddingHelper equivalent).

The reference uses ``GreedyEmbeddingHelper`` for training-time eval decode
(SURVEY.md §2.2 row 5).  Single ``lax.while_loop`` over a static-shape
output buffer with EARLY EXIT once every sequence in the batch has emitted
EOS (the TF1 ``dynamic_decode`` behavior); once a sequence emits EOS it
keeps emitting PAD.
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
    # Materialize the memories before the loop: jitted together with the
    # encoder, XLA otherwise re-fuses the encoder-output transpose into
    # every decode step (same hazard measured for beam search — see
    # decode/beam.py _tile_memory).
    memories = jax.lax.optimization_barrier(list(memories))
    memory_dims = [m.values.shape[-1] for m in memories]
    state0 = dec.initial_state(cfg, B, memory_dims, max_length=max_length,
                               compute_dtype=compute_dtype)
    cross_kv = dec.prepare_cross(params, cfg, memories,
                                 compute_dtype=compute_dtype)
    tok0 = jnp.full((B,), GO_ID, jnp.int32)
    done0 = jnp.zeros((B,), bool)

    # Early-exit loop: once EVERY sequence has emitted EOS the remaining
    # steps would only write PAD (the buffer's initial value), so the loop
    # stops — on real corpora typical lengths are far below the static
    # max_decode_length horizon and this saves most decode steps.
    ids_buf0 = jnp.full((max_length, B), PAD_ID, jnp.int32)

    def cond(carry):
        t, _, _, done, _ = carry
        return jnp.logical_and(t < max_length, ~jnp.all(done))

    def body(carry):
        t, state, tok, done, ids_buf = carry
        state, logits = dec.decoder_step(
            params, cfg, tok, state, memories, compute_dtype=compute_dtype,
            cross_kv=cross_kv,
        )
        # PAD/GO are bookkeeping ids, never legal emissions.
        logits = logits.at[:, PAD_ID].set(-1e30).at[:, GO_ID].set(-1e30)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        out = jnp.where(done, PAD_ID, nxt)
        done_new = jnp.logical_or(done, nxt == EOS_ID)
        # Feed EOS while finished so the recurrence stays stable.
        feed = jnp.where(done, EOS_ID, nxt)
        ids_buf = jax.lax.dynamic_update_index_in_dim(ids_buf, out, t, 0)
        return (t + 1, state, feed, done_new, ids_buf)

    _, _, _, _, ids = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), state0, tok0, done0, ids_buf0)
    )
    ids = ids.T  # [B, L]
    # Length = position of first EOS (inclusive), or max_length.
    is_eos = ids == EOS_ID
    any_eos = jnp.any(is_eos, axis=1)
    first_eos = jnp.argmax(is_eos, axis=1)
    lengths = jnp.where(any_eos, first_eos + 1, max_length).astype(jnp.int32)
    return ids, lengths
