"""SpecAugment masking tests (opt-in extension)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from avsr_tpu.ops.specaugment import spec_augment


def test_masks_zero_spans_and_bands(rng):
    B, T, D = 3, 40, 16
    feat = jnp.ones((B, T, D), jnp.float32)
    lengths = jnp.asarray([40, 30, 20], jnp.int32)
    out = np.asarray(
        spec_augment(jax.random.PRNGKey(0), feat, lengths,
                     num_time_masks=2, time_mask_width=8,
                     num_freq_masks=1, freq_mask_width=4)
    )
    # something got masked, but not everything
    assert out.min() == 0.0
    assert out.mean() > 0.5
    # masked entries are exactly zero, others exactly one
    assert set(np.unique(out)) <= {0.0, 1.0}


def test_deterministic_per_key(rng):
    B, T, D = 2, 30, 8
    feat = jnp.ones((B, T, D), jnp.float32)
    lengths = jnp.asarray([30, 30], jnp.int32)
    a = np.asarray(spec_augment(jax.random.PRNGKey(1), feat, lengths))
    b = np.asarray(spec_augment(jax.random.PRNGKey(1), feat, lengths))
    np.testing.assert_array_equal(a, b)
    c = np.asarray(spec_augment(jax.random.PRNGKey(2), feat, lengths))
    assert not np.array_equal(a, c)


def test_wired_into_training_path(rng):
    from avsr_tpu.models import seq2seq
    from tests.test_seq2seq import VOCAB, tiny_batch, tiny_config

    cfg = tiny_config("audio")
    cfg = cfg.replace(
        audio=dataclasses.replace(cfg.audio, spec_augment=True,
                                  time_masks=1, time_mask_width=4,
                                  freq_masks=1, freq_mask_width=2)
    )
    params = seq2seq.model_init(jax.random.PRNGKey(0), cfg, VOCAB)
    batch = tiny_batch("audio", rng)
    # train-mode logits vary with rng (masking active), eval-mode are stable
    t1, _ = seq2seq.forward(params, cfg, batch, train=True,
                            rng=jax.random.PRNGKey(1))
    t2, _ = seq2seq.forward(params, cfg, batch, train=True,
                            rng=jax.random.PRNGKey(2))
    assert not np.allclose(np.asarray(t1), np.asarray(t2))
    e1, _ = seq2seq.forward(params, cfg, batch, train=False)
    e2, _ = seq2seq.forward(params, cfg, batch, train=False)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
