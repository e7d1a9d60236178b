"""Decoder unit tests: teacher forcing, scheduled sampling, loss masking."""

import jax
import jax.numpy as jnp
import numpy as np

from avsr_tpu.configs import DecoderConfig
from avsr_tpu.data.units import EOS_ID, GO_ID, PAD_ID
from avsr_tpu.models import decoder as dec
from avsr_tpu.ops import attention as attn

V = 8
CFG = DecoderConfig(
    embedding_dim=6, hidden_units=(8,), attention_units=5, max_label_length=5
)


def make_memory(rng, B=2, S=4, H=7):
    params = attn.attention_init("bahdanau", jax.random.PRNGKey(9), 8, H, 5)
    memory = jnp.asarray(rng.standard_normal((B, S, H)).astype(np.float32))
    lengths = jnp.asarray([S] * B, jnp.int32)
    return attn.prepare_memory("bahdanau", params, memory, lengths,
                               compute_dtype=jnp.float32)


def test_teacher_forced_shapes_and_step_equivalence(rng):
    B, K = 2, 5
    mem = make_memory(rng, B=B)
    params = dec.decoder_init(jax.random.PRNGKey(0), CFG, [7], V)
    targets = jnp.asarray(rng.integers(3, V, (B, K)), jnp.int32)
    lengths = jnp.asarray([K, 3], jnp.int32)
    logits = dec.teacher_forced_logits(
        params, CFG, targets, lengths, [mem], compute_dtype=jnp.float32
    )
    assert logits.shape == (B, K, V)
    # step-by-step rollout must produce identical logits
    state = dec.initial_state(CFG, B, [7])
    tok = jnp.full((B,), GO_ID, jnp.int32)
    for k in range(K):
        state, step_logits = dec.decoder_step(
            params, CFG, tok, state, [mem], compute_dtype=jnp.float32
        )
        np.testing.assert_allclose(
            np.asarray(logits[:, k]), np.asarray(step_logits), rtol=1e-5, atol=1e-5
        )
        tok = targets[:, k]


def test_scheduled_sampling_edge_cases(rng):
    """p=0 => identical to teacher forcing; p=1 => gold inputs never used
    after step 0 (SURVEY §4.2)."""
    B, K = 2, 6
    mem = make_memory(rng, B=B)
    params = dec.decoder_init(jax.random.PRNGKey(1), CFG, [7], V)
    targets = jnp.asarray(rng.integers(3, V, (B, K)), jnp.int32)
    lengths = jnp.asarray([K, K], jnp.int32)
    base = dec.teacher_forced_logits(
        params, CFG, targets, lengths, [mem], compute_dtype=jnp.float32
    )
    p0 = dec.teacher_forced_logits(
        params, CFG, targets, lengths, [mem],
        sampling_probability=1e-9, rng=jax.random.PRNGKey(2),
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(base), np.asarray(p0), rtol=1e-5, atol=1e-5)
    # p=1: changing the gold targets (except token 0 path) must not change
    # logits at step 1 since inputs come from the model's own samples.
    p1_a = dec.teacher_forced_logits(
        params, CFG, targets, lengths, [mem],
        sampling_probability=1.0, rng=jax.random.PRNGKey(3),
        compute_dtype=jnp.float32,
    )
    targets_b = targets.at[:, 0].set((targets[:, 0] % (V - 3)) + 3)
    p1_b = dec.teacher_forced_logits(
        params, CFG, targets_b, lengths, [mem],
        sampling_probability=1.0, rng=jax.random.PRNGKey(3),
        compute_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(p1_a), np.asarray(p1_b), rtol=1e-5, atol=1e-5)


def test_sequence_loss_masking(rng):
    B, K = 2, 4
    logits = jnp.asarray(rng.standard_normal((B, K, V)).astype(np.float32))
    targets = jnp.asarray(rng.integers(3, V, (B, K)), jnp.int32)
    full = dec.sequence_loss(logits, targets, jnp.asarray([K, K], jnp.int32))
    # Corrupting logits in masked positions must not change the loss.
    lengths = jnp.asarray([2, 1], jnp.int32)
    l1 = dec.sequence_loss(logits, targets, lengths)
    corrupted = logits.at[:, 3].set(100.0)
    l2 = dec.sequence_loss(corrupted, targets, lengths)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    assert not np.isclose(float(full), float(l1))


def test_bimodal_two_memories(rng):
    B, K = 2, 3
    mem1 = make_memory(rng, B=B, H=7)
    mem2 = make_memory(rng, B=B, S=6, H=5)
    params = dec.decoder_init(jax.random.PRNGKey(4), CFG, [7, 5], V)
    targets = jnp.asarray(rng.integers(3, V, (B, K)), jnp.int32)
    lengths = jnp.asarray([K, K], jnp.int32)
    logits = dec.teacher_forced_logits(
        params, CFG, targets, lengths, [mem1, mem2], compute_dtype=jnp.float32
    )
    assert logits.shape == (B, K, V)
    assert np.all(np.isfinite(np.asarray(logits)))
