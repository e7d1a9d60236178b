"""Batched width-K beam search, fully on device with static shapes.

Rebuild of the reference's ``BeamSearchDecoder`` + C++ ``gather_tree`` decode
path (tf.contrib.seq2seq; SURVEY.md §2.3 row 4, §3.2) as pure JAX:

  * beams are folded into the batch axis ([B*W] flat) so every decoder step
    is one batched MXU pass over all beams;
  * candidate expansion is ``lax.top_k`` over the W*V score matrix;
  * beam-state reshuffling is a device-side gather on the DecoderState pytree;
  * finished beams continue with EOS-only, zero-added-score candidates, and
    the whole loop EARLY-EXITS (``lax.while_loop``) once every beam of every
    batch row has finished — results are identical to the full-horizon scan
    (remaining steps would only append zero-score EOS), but real corpora
    finish far below the static max_decode_length horizon;
  * Google-NMT length normalization ((5+len)/6)^alpha is applied to the
    scores used for top-k, matching TF1 BeamSearchDecoder semantics;
  * the (token, parent) trellis is recorded per step and the winning
    hypothesis is reconstructed by a reverse scan — ``gather_tree`` in JAX.

Correctness is pinned by tests/test_beam.py: with beam width >= the number
of possible sequences on a toy vocabulary, beam search must return the exact
argmax sequence found by exhaustive search (SURVEY §4.2).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from avsr_tpu.configs import DecoderConfig
from avsr_tpu.data.units import EOS_ID, GO_ID, PAD_ID
from avsr_tpu.models import decoder as dec
from avsr_tpu.ops import attention as attn

NEG_INF = -1.0e30


class BeamResult(NamedTuple):
    ids: jnp.ndarray      # [B, L] best hypothesis, PAD after EOS
    lengths: jnp.ndarray  # [B] tokens incl. EOS
    scores: jnp.ndarray   # [B] length-normalized log prob of the winner
    steps: jnp.ndarray    # [] decode steps actually executed (early exit)
    # Populated only when beam_search(n_best > 1): ranked alternatives
    # (index 0 == the fields above).  None by default so jitted callers
    # (the fused eval program) never materialize [B, N, L] buffers they
    # don't consume.
    nbest_ids: "jnp.ndarray | None" = None      # [B, N, L]
    nbest_lengths: "jnp.ndarray | None" = None  # [B, N]
    nbest_scores: "jnp.ndarray | None" = None   # [B, N]


def _length_penalty(lengths: jnp.ndarray, alpha: float) -> jnp.ndarray:
    if alpha == 0.0:
        return jnp.ones_like(lengths, jnp.float32)
    return jnp.power((5.0 + lengths.astype(jnp.float32)) / 6.0, alpha)


def _tile_memory(mem: attn.AttentionMemory, width: int) -> attn.AttentionMemory:
    """[B, ...] -> [B*W, ...] with beams contiguous per batch row.

    The tiled tensors are forced through an optimization barrier so XLA
    materializes them ONCE before the decode loop.  Without it, when beam
    search is jitted together with the encoder (the eval program), the
    repeat — and the encoder-output transpose feeding it — get re-fused
    into the while-loop body: measured 90.5 -> 63.6 ms for the combined
    encode+beam program at B=128, L=48 on v5e (RESULTS.md round 2)."""
    def tile(x):
        return jnp.repeat(x, width, axis=0)

    tiled = attn.AttentionMemory(
        values=tile(mem.values), keys=tile(mem.keys),
        mask=tile(mem.mask), bias=tile(mem.bias),
    )
    return jax.lax.optimization_barrier(tiled)


def beam_search(
    params,
    cfg: DecoderConfig,
    memories: Sequence[attn.AttentionMemory],
    max_length: int,
    *,
    beam_width: int = 10,
    length_penalty: float = 0.0,
    compute_dtype=jnp.bfloat16,
    n_best: int = 1,
) -> BeamResult:
    """Run width-K beam search over preprocessed attention memories.

    ``n_best > 1`` additionally backtracks the top-N (<= W) leaves and
    fills the ``nbest_*`` fields (ranked best-first; rank 0 equals the
    top-1 fields).  The reference's BeamSearchDecoder returns only the
    winner; n-best is a beyond-parity surface for rescoring/analysis.
    """
    B = memories[0].values.shape[0]
    W = beam_width
    memory_dims = [m.values.shape[-1] for m in memories]
    tiled = [_tile_memory(m, W) for m in memories]

    state0 = dec.initial_state(cfg, B * W, memory_dims,
                               max_length=max_length,
                               compute_dtype=compute_dtype)
    cross_kv = dec.prepare_cross(params, cfg, tiled,
                                 compute_dtype=compute_dtype)
    tok0 = jnp.full((B, W), GO_ID, jnp.int32)
    # Only beam 0 is live at step 0 (all beams start identical).
    logp0 = jnp.tile(
        jnp.concatenate(
            [jnp.zeros((1,), jnp.float32), jnp.full((W - 1,), NEG_INF)]
        )[None, :],
        (B, 1),
    )
    finished0 = jnp.zeros((B, W), bool)
    len0 = jnp.zeros((B, W), jnp.int32)

    batch_offset = (jnp.arange(B, dtype=jnp.int32) * W)[:, None]  # [B, 1]

    # Trellis buffers, pre-filled with the no-op continuation (token = EOS,
    # parent = self): steps the early-exit loop never executes then read as
    # "every beam keeps feeding EOS", exactly what the full-length scan
    # would have recorded once all beams finished, so the backtrack and the
    # first-EOS cut below are unchanged.
    tokens_buf0 = jnp.full((max_length, B, W), EOS_ID, jnp.int32)
    parents_buf0 = jnp.broadcast_to(
        jnp.arange(W, dtype=jnp.int32)[None, None, :], (max_length, B, W)
    )

    def cond(carry):
        t, _, _, logp, finished, _, _, _ = carry
        # Early exit once every beam of every row is finished OR dead
        # (score still ~NEG_INF: a slot the candidate tree hasn't reached).
        # Dead slots only get resurrected by a LIVE unfinished parent's
        # expansion, so finished-or-dead everywhere is a fixed point: the
        # remaining steps would only re-append zero-score EOS continuations
        # (TF1 dynamic_decode semantics).  On real corpora typical
        # hypothesis lengths are far below the static horizon.
        settled = jnp.logical_or(finished, logp < NEG_INF / 2)
        return jnp.logical_and(t < max_length, ~jnp.all(settled))

    def step(carry):
        t, state, tok, logp, finished, lens, tokens_buf, parents_buf = carry
        state, logits = dec.decoder_step(
            params, cfg, tok.reshape(B * W), state, tiled,
            compute_dtype=compute_dtype, cross_kv=cross_kv,
        )
        V = logits.shape[-1]
        step_logp = jax.nn.log_softmax(logits, axis=-1)
        # PAD/GO are bookkeeping ids, never legal emissions.  Masked AFTER
        # the softmax so surviving scores are true model log probs (TF1
        # BeamSearchDecoder semantics), not renormalized ones.
        step_logp = (
            step_logp.at[:, PAD_ID].set(NEG_INF).at[:, GO_ID].set(NEG_INF)
        ).reshape(B, W, V)

        # Finished beams: only EOS continues, contributing 0 log prob.
        eos_only = jnp.full((V,), NEG_INF).at[EOS_ID].set(0.0)
        step_logp = jnp.where(
            finished[:, :, None], eos_only[None, None, :], step_logp
        )

        cand_logp = logp[:, :, None] + step_logp                 # [B, W, V]
        cand_lens = jnp.broadcast_to(
            (lens + jnp.where(finished, 0, 1))[:, :, None], (B, W, V)
        )                                                         # [B, W, V]
        cand_scores = cand_logp / _length_penalty(cand_lens, length_penalty)

        flat_scores = cand_scores.reshape(B, W * V)
        _, flat_idx = jax.lax.top_k(flat_scores, W)               # [B, W]
        parent = (flat_idx // V).astype(jnp.int32)
        token = (flat_idx % V).astype(jnp.int32)

        gather_bw = lambda x: jnp.take_along_axis(x, parent, axis=1)
        new_logp = jnp.take_along_axis(
            cand_logp.reshape(B, W * V), flat_idx, axis=1
        )
        new_lens = jnp.take_along_axis(
            cand_lens.reshape(B, W * V), flat_idx, axis=1
        )
        was_finished = gather_bw(finished)
        new_finished = jnp.logical_or(was_finished, token == EOS_ID)

        flat_parent = (batch_offset + parent).reshape(B * W)
        new_state = jax.tree_util.tree_map(lambda x: x[flat_parent], state)

        feed = jnp.where(was_finished, EOS_ID, token)
        tokens_buf = jax.lax.dynamic_update_index_in_dim(
            tokens_buf, token, t, 0
        )
        parents_buf = jax.lax.dynamic_update_index_in_dim(
            parents_buf, parent, t, 0
        )
        return (t + 1, new_state, feed, new_logp, new_finished, new_lens,
                tokens_buf, parents_buf)

    (steps_f, _, _, logp_f, finished_f, lens_f, tokens_t, parents_t) = (
        jax.lax.while_loop(
            cond, step,
            (jnp.zeros((), jnp.int32), state0, tok0, logp0, finished0, len0,
             tokens_buf0, parents_buf0),
        )
    )
    # tokens_t/parents_t: [L, B, W]

    # Final ranking: normalized score, strongly preferring finished beams
    # when any beam in the row finished.
    final_scores = logp_f / _length_penalty(lens_f, length_penalty)
    any_finished = jnp.any(finished_f, axis=1, keepdims=True)
    eff = jnp.where(
        jnp.logical_or(finished_f, ~any_finished), final_scores, NEG_INF
    )
    n = min(max(n_best, 1), W)
    if n == 1:
        leaves = jnp.argmax(eff, axis=1).astype(jnp.int32)[:, None]  # [B, 1]
    else:
        # stable argsort: ties resolve to the lowest beam index, exactly
        # like the argmax above, so rank 0 always equals the top-1 path
        leaves = jnp.argsort(-eff, axis=1)[:, :n].astype(jnp.int32)
    sel_score = jnp.take_along_axis(eff, leaves, axis=1)       # [B, n]
    sel_len = jnp.take_along_axis(lens_f, leaves, axis=1)      # [B, n]

    # gather_tree: backtrack the (token, parent) trellis from each leaf.
    def back(beams, inp):
        tok_l, par_l = inp  # [B, W] each
        t = jnp.take_along_axis(tok_l, beams, axis=1)    # [B, n]
        prev = jnp.take_along_axis(par_l, beams, axis=1)
        return prev, t

    _, ids_rev = jax.lax.scan(
        back, leaves, (tokens_t, parents_t), reverse=True
    )
    # reverse=True emits ys in forward-time order already: [L, B, n]
    ids = jnp.transpose(ids_rev, (1, 2, 0))  # [B, n, L]

    # PAD everything after the first EOS (finished beams kept feeding EOS).
    L = ids.shape[-1]
    pos = jnp.arange(L)[None, None, :]
    is_eos = ids == EOS_ID
    any_eos = jnp.any(is_eos, axis=-1, keepdims=True)
    first_eos = jnp.argmax(is_eos, axis=-1, keepdims=True)
    cut = jnp.where(any_eos, first_eos, L - 1)
    ids = jnp.where(pos > cut, PAD_ID, ids)

    return BeamResult(
        ids=ids[:, 0], lengths=sel_len[:, 0], scores=sel_score[:, 0],
        steps=steps_f,
        nbest_ids=ids if n_best > 1 else None,
        nbest_lengths=sel_len if n_best > 1 else None,
        nbest_scores=sel_score if n_best > 1 else None,
    )
