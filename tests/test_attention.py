"""Masked attention unit tests (SURVEY.md §4.2: padded positions get zero weight)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsr_tpu.ops import attention as attn


@pytest.mark.parametrize("att_type", ["bahdanau", "luong"])
def test_padded_positions_zero_weight(rng, att_type):
    B, S, H, Q, A = 2, 7, 6, 5, 4
    params = attn.attention_init(att_type, jax.random.PRNGKey(0), Q, H, A)
    memory = jnp.asarray(rng.standard_normal((B, S, H)).astype(np.float32))
    lengths = jnp.asarray([7, 3], jnp.int32)
    mem = attn.prepare_memory(att_type, params, memory, lengths,
                              compute_dtype=jnp.float32)
    query = jnp.asarray(rng.standard_normal((B, Q)).astype(np.float32))
    ctx, w = attn.attend(att_type, params, query, mem, compute_dtype=jnp.float32)
    w = np.asarray(w)
    np.testing.assert_allclose(w[1, 3:], 0.0, atol=1e-12)
    np.testing.assert_allclose(w.sum(axis=1), 1.0, rtol=1e-5)
    assert ctx.shape == (B, H)


@pytest.mark.parametrize("att_type", ["bahdanau", "luong"])
def test_context_is_convex_combination(rng, att_type):
    B, S, H, Q, A = 1, 4, 3, 3, 4
    params = attn.attention_init(att_type, jax.random.PRNGKey(1), Q, H, A)
    memory = jnp.asarray(rng.standard_normal((B, S, H)).astype(np.float32))
    lengths = jnp.asarray([4], jnp.int32)
    mem = attn.prepare_memory(att_type, params, memory, lengths,
                              compute_dtype=jnp.float32)
    query = jnp.asarray(rng.standard_normal((B, Q)).astype(np.float32))
    ctx, w = attn.attend(att_type, params, query, mem, compute_dtype=jnp.float32)
    manual = (np.asarray(w)[0][:, None] * np.asarray(memory)[0]).sum(0)
    np.testing.assert_allclose(np.asarray(ctx)[0], manual, rtol=1e-5, atol=1e-6)


def test_batched_queries_match_single(rng):
    B, S, T, H, Q, A = 2, 5, 3, 4, 4, 6
    params = attn.attention_init("bahdanau", jax.random.PRNGKey(2), Q, H, A)
    memory = jnp.asarray(rng.standard_normal((B, S, H)).astype(np.float32))
    lengths = jnp.asarray([5, 2], jnp.int32)
    mem = attn.prepare_memory("bahdanau", params, memory, lengths,
                              compute_dtype=jnp.float32)
    queries = jnp.asarray(rng.standard_normal((B, T, Q)).astype(np.float32))
    ctx_all, w_all = attn.attend_batched_queries(
        "bahdanau", params, queries, mem, compute_dtype=jnp.float32
    )
    for t in range(T):
        ctx, w = attn.attend("bahdanau", params, queries[:, t], mem,
                             compute_dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(ctx_all)[:, t], np.asarray(ctx), rtol=1e-5, atol=1e-6
        )


def test_fully_masked_memory_gives_zero_context(rng):
    B, S, H, Q, A = 1, 4, 3, 3, 4
    params = attn.attention_init("bahdanau", jax.random.PRNGKey(3), Q, H, A)
    memory = jnp.asarray(rng.standard_normal((B, S, H)).astype(np.float32))
    lengths = jnp.asarray([0], jnp.int32)
    mem = attn.prepare_memory("bahdanau", params, memory, lengths,
                              compute_dtype=jnp.float32)
    query = jnp.asarray(rng.standard_normal((B, Q)).astype(np.float32))
    ctx, w = attn.attend("bahdanau", params, query, mem, compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(w), 0.0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ctx), 0.0, atol=1e-6)


@pytest.mark.parametrize("att_type", ["bahdanau", "luong"])
def test_value_down_projection(rng, att_type):
    """value_dim projects the attended VALUES (context dim = value_dim)
    while scores still see the full memory; weights are unchanged vs the
    unprojected mechanism and the context is the weights applied to the
    projected memory."""
    B, S, H, Q, A, V = 2, 6, 8, 5, 4, 3
    params = attn.attention_init(att_type, jax.random.PRNGKey(2), Q, H, A,
                                 value_dim=V)
    assert params["wv"].shape == (H, V)
    memory = jnp.asarray(rng.standard_normal((B, S, H)).astype(np.float32))
    lengths = jnp.asarray([6, 4], jnp.int32)
    mem = attn.prepare_memory(att_type, params, memory, lengths,
                              compute_dtype=jnp.float32)
    assert mem.values.shape == (B, S, V)
    query = jnp.asarray(rng.standard_normal((B, Q)).astype(np.float32))
    ctx, w = attn.attend(att_type, params, query, mem,
                         compute_dtype=jnp.float32)
    assert ctx.shape == (B, V)
    # scores/weights identical to the unprojected mechanism (same wq/wm/v)
    params_nov = {k: v for k, v in params.items() if k != "wv"}
    mem_nov = attn.prepare_memory(att_type, params_nov, memory, lengths,
                                  compute_dtype=jnp.float32)
    _, w_nov = attn.attend(att_type, params_nov, query, mem_nov,
                           compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(w), np.asarray(w_nov), rtol=1e-6)
    # context == weights @ (memory @ wv)
    proj = np.asarray(memory) @ np.asarray(params["wv"])
    manual = np.einsum("bs,bsv->bv", np.asarray(w), proj)
    np.testing.assert_allclose(np.asarray(ctx), manual, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w)[1, 4:], 0.0, atol=1e-12)
