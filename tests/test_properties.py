"""Model-level property tests (SURVEY.md §4.3): padding invariance,
batch-order invariance, optimizer/schedule wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsr_tpu.decode.greedy import greedy_decode
from avsr_tpu.models import seq2seq
from avsr_tpu.models.seq2seq import Batch
from avsr_tpu.train.optim import build_optimizer, build_schedule
from avsr_tpu.configs import TrainConfig
from tests.test_seq2seq import VOCAB, tiny_batch, tiny_config


def test_model_padding_invariance(rng):
    """Same utterance padded to two different lengths -> identical loss and
    identical greedy decode (the bucketing guarantee)."""
    cfg = tiny_config("audio")
    params = seq2seq.model_init(jax.random.PRNGKey(0), cfg, VOCAB)
    wav = rng.standard_normal(3000).astype(np.float32)
    tgt = np.array([[3, 4, 5, 2, 0, 0]], np.int32)

    def make(S):
        audio = np.zeros((1, S), np.float32)
        audio[0, :3000] = wav
        return Batch(
            audio=jnp.asarray(audio),
            audio_lengths=jnp.asarray([3000], jnp.int32),
            targets=jnp.asarray(tgt),
            target_lengths=jnp.asarray([4], jnp.int32),
        )

    b1, b2 = make(4000), make(6400)
    l1, _ = seq2seq.loss_fn(params, cfg, b1, train=False)
    l2, _ = seq2seq.loss_fn(params, cfg, b2, train=False)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)

    ids = []
    for b in (b1, b2):
        out = seq2seq.encode(params, cfg, b, train=False)
        i, _ = greedy_decode(
            params["decoder"], cfg.decoder, out.memories, 6,
            compute_dtype=jnp.float32,
        )
        ids.append(np.asarray(i))
    np.testing.assert_array_equal(ids[0], ids[1])


def test_batch_order_invariance(rng):
    """Permuting the batch permutes per-row outputs, nothing else."""
    cfg = tiny_config("audio")
    params = seq2seq.model_init(jax.random.PRNGKey(1), cfg, VOCAB)
    batch = tiny_batch("audio", rng, B=2)
    logits, _ = seq2seq.forward(params, cfg, batch, train=False)
    perm = Batch(
        audio=batch.audio[::-1],
        audio_lengths=batch.audio_lengths[::-1],
        targets=batch.targets[::-1],
        target_lengths=batch.target_lengths[::-1],
    )
    logits_p, _ = seq2seq.forward(params, cfg, perm, train=False)
    np.testing.assert_allclose(
        np.asarray(logits)[::-1], np.asarray(logits_p), rtol=1e-4, atol=1e-5
    )


def test_decoder_dropout_only_in_training(rng):
    """cfg.decoder.dropout_rate affects training logits (stochastic) but
    never eval logits."""
    import dataclasses

    cfg = tiny_config("audio")
    cfg = cfg.replace(
        decoder=dataclasses.replace(cfg.decoder, dropout_rate=0.5)
    )
    params = seq2seq.model_init(jax.random.PRNGKey(2), cfg, VOCAB)
    batch = tiny_batch("audio", rng)
    e1, _ = seq2seq.forward(params, cfg, batch, train=False)
    e2, _ = seq2seq.forward(params, cfg, batch, train=False)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2))
    t1, _ = seq2seq.forward(params, cfg, batch, train=True,
                            rng=jax.random.PRNGKey(3))
    t2, _ = seq2seq.forward(params, cfg, batch, train=True,
                            rng=jax.random.PRNGKey(4))
    assert not np.allclose(np.asarray(t1), np.asarray(t2))


def test_model_jit_vs_nojit(rng):
    """Full-model loss identical under jit and eager (SURVEY §4.3)."""
    cfg = tiny_config("av_align")
    params = seq2seq.model_init(jax.random.PRNGKey(5), cfg, VOCAB)
    batch = tiny_batch("av_align", rng)
    f = lambda p, b: seq2seq.loss_fn(p, cfg, b, train=False)[0]
    eager = float(f(params, batch))
    jitted = float(jax.jit(f)(params, batch))
    np.testing.assert_allclose(jitted, eager, rtol=1e-5)


@pytest.mark.parametrize("sched", ["constant", "exponential", "cosine",
                                   "warmup_cosine"])
def test_schedules_produce_finite_lrs(sched):
    cfg = TrainConfig(learning_rate=1e-3, lr_schedule=sched, lr_decay=0.05,
                      warmup_steps=10, num_epochs=2)
    s = build_schedule(cfg, steps_per_epoch=100)
    for step in (0, 1, 50, 199):
        lr = float(s(step))
        assert 0.0 <= lr <= 1e-3 + 1e-9


@pytest.mark.parametrize("opt", ["adam", "adamw", "sgd", "lamb"])
def test_optimizers_step(opt, rng):
    cfg = TrainConfig(optimizer=opt, learning_rate=1e-3, weight_decay=0.01)
    tx, _ = build_optimizer(cfg, 100)
    params = {"w": jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32))}
    state = tx.init(params)
    grads = {"w": jnp.ones((4, 4), jnp.float32)}
    updates, _ = tx.update(grads, state, params)
    assert np.all(np.isfinite(np.asarray(updates["w"])))
    assert float(jnp.max(jnp.abs(updates["w"]))) > 0


def test_exponential_decay_matches_reference_semantics():
    """lr_decay=0.1 -> lr multiplied by 0.9 per epoch (staircase)."""
    cfg = TrainConfig(learning_rate=1e-3, lr_schedule="exponential",
                      lr_decay=0.1)
    s = build_schedule(cfg, steps_per_epoch=10)
    np.testing.assert_allclose(float(s(0)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(s(10)), 9e-4, rtol=1e-6)
    np.testing.assert_allclose(float(s(25)), 1e-3 * 0.9**2, rtol=1e-6)


def _scanfree_config():
    """The v2 family (transformer encoders + cross-attention fusion) at
    tiny dims — tests/test_transformer_encoder.py and
    tests/test_cross_attention_fusion.py cover the components; these
    properties pin the ASSEMBLED model to the same bucketing guarantees
    as the reference-parity family."""
    import dataclasses

    from avsr_tpu.configs import EncoderConfig

    cfg = tiny_config("av_align")
    return cfg.replace(
        audio_encoder=EncoderConfig(hidden_units=(16, 16),
                                    encoder_type="transformer", num_heads=4,
                                    dropout_rate=0.0),
        video_encoder=EncoderConfig(hidden_units=(16,),
                                    encoder_type="transformer", num_heads=4,
                                    dropout_rate=0.0),
        fusion=dataclasses.replace(cfg.fusion, fusion_type="cross_attention",
                                   num_heads=2),
    )


def test_scanfree_family_padding_invariance(rng):
    """v2 model: same AV utterance padded to different audio AND video
    horizons -> identical loss and identical greedy decode."""
    cfg = _scanfree_config()
    params = seq2seq.model_init(jax.random.PRNGKey(7), cfg, VOCAB)
    wav = rng.standard_normal(3000).astype(np.float32)
    vid = rng.standard_normal((8, 12, 12, 1)).astype(np.float32)
    tgt = np.array([[3, 4, 5, 2, 0, 0]], np.int32)

    def make(S, Tv):
        audio = np.zeros((1, S), np.float32)
        audio[0, :3000] = wav
        video = np.zeros((1, Tv, 12, 12, 1), np.float32)
        video[0, :8] = vid
        return Batch(
            audio=jnp.asarray(audio),
            audio_lengths=jnp.asarray([3000], jnp.int32),
            video=jnp.asarray(video),
            video_lengths=jnp.asarray([8], jnp.int32),
            targets=jnp.asarray(tgt),
            target_lengths=jnp.asarray([4], jnp.int32),
        )

    b1, b2 = make(4000, 8), make(6400, 13)
    l1, _ = seq2seq.loss_fn(params, cfg, b1, train=False)
    l2, _ = seq2seq.loss_fn(params, cfg, b2, train=False)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    ids = []
    for b in (b1, b2):
        out = seq2seq.encode(params, cfg, b, train=False)
        i, _ = greedy_decode(
            params["decoder"], cfg.decoder, out.memories, 6,
            compute_dtype=jnp.float32,
        )
        ids.append(np.asarray(i))
    np.testing.assert_array_equal(ids[0], ids[1])


def test_scanfree_family_jit_vs_nojit(rng):
    cfg = _scanfree_config()
    params = seq2seq.model_init(jax.random.PRNGKey(8), cfg, VOCAB)
    b = tiny_batch("av_align", rng)
    l_no, _ = seq2seq.loss_fn(params, cfg, b, train=False)
    l_jit, _ = jax.jit(
        lambda p, bb: seq2seq.loss_fn(p, cfg, bb, train=False)
    )(params, b)
    np.testing.assert_allclose(float(l_no), float(l_jit), rtol=1e-5)
