"""Gradient accumulation (train/step.py accum>1): token-weighted
micro-batch accumulation must reproduce the full-batch update exactly
(sequence_loss normalizes by sum(mask), so weighting micro-grads by their
valid-token counts makes the combined CE gradient identical)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsr_tpu.train import step as step_lib
from tests.test_seq2seq import VOCAB, tiny_batch, tiny_config


def _no_stochastic(cfg):
    """Disable dropout/scheduled sampling so accum==1 and accum>1 trace the
    same math (their rng folds differ per micro-batch)."""
    return dataclasses.replace(
        cfg,
        audio_encoder=dataclasses.replace(cfg.audio_encoder, dropout_rate=0.0),
        video_encoder=dataclasses.replace(cfg.video_encoder, dropout_rate=0.0),
        decoder=dataclasses.replace(
            cfg.decoder, dropout_rate=0.0, sampling_probability=0.0
        ),
    )


def test_accum_with_all_padding_trailing_micro(rng):
    """The loader pads an epoch's final short batch with zero-weight rows
    AT THE END, so with accum a whole trailing micro-batch can be padding.
    Its weight must be 0 (a clamp to 1 scales the gradient by W/(W+1))."""
    cfg = _no_stochastic(tiny_config("audio"))
    B = 8
    batch = tiny_batch("audio", rng, B=B)
    tl = np.array([2, 5, 3, 6, 0, 0, 0, 0], np.int32)  # micros 3+4 empty
    batch = batch._replace(
        audio_lengths=jnp.full((B,), batch.audio.shape[1], jnp.int32),
        target_lengths=jnp.asarray(tl),
    )

    state1, tx = step_lib.create_train_state(jax.random.PRNGKey(0), cfg, VOCAB)
    new1, m1 = step_lib.make_jitted_train_step(cfg, tx)(
        state1, batch, jax.random.PRNGKey(7)
    )
    state2, tx2 = step_lib.create_train_state(jax.random.PRNGKey(0), cfg, VOCAB)
    new2, m2 = step_lib.make_jitted_train_step(cfg, tx2, accum=4)(
        state2, batch, jax.random.PRNGKey(7)
    )
    np.testing.assert_allclose(
        float(m1["ce_loss"]), float(m2["ce_loss"]), rtol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(new1.params),
        jax.tree_util.tree_leaves(new2.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )


@pytest.mark.parametrize("arch", ["audio", "av_align"])
def test_accum_matches_full_batch(rng, arch):
    cfg = _no_stochastic(tiny_config(arch))
    B = 8
    batch = tiny_batch(arch, rng, B=B)
    # tiny_batch's lengths are hardcoded for B=2; rebuild for B=8, with
    # UNEQUAL label lengths across micro-batches (the test is vacuous if
    # every micro-batch has the same token weight)
    tl = np.array([2, 5, 3, 6, 1, 4, 6, 2], np.int32)
    batch = batch._replace(
        audio_lengths=(
            jnp.full((B,), batch.audio.shape[1], jnp.int32)
            if batch.audio is not None else None
        ),
        video_lengths=(
            jnp.full((B,), batch.video.shape[1], jnp.int32)
            if batch.video is not None else None
        ),
        target_lengths=jnp.asarray(tl),
    )

    state1, tx = step_lib.create_train_state(jax.random.PRNGKey(0), cfg, VOCAB)
    new1, m1 = step_lib.make_jitted_train_step(cfg, tx)(
        state1, batch, jax.random.PRNGKey(7)
    )

    state2, tx2 = step_lib.create_train_state(jax.random.PRNGKey(0), cfg, VOCAB)
    new2, m2 = step_lib.make_jitted_train_step(cfg, tx2, accum=4)(
        state2, batch, jax.random.PRNGKey(7)
    )

    np.testing.assert_allclose(
        float(m1["ce_loss"]), float(m2["ce_loss"]), rtol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(new1.params),
        jax.tree_util.tree_leaves(new2.params),
    ):
        # fp32 reduction-order noise through Adam's rsqrt: a handful of
        # near-zero-gradient elements land ~3e-6 apart; anything real
        # (mis-weighted micro-batches) is orders of magnitude larger
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5
        )


def test_accum_through_trainer(tmp_path, rng):
    """bucket_grad_accum routes per-bucket factors through a real training
    run (overfit step still learns: loss decreases)."""
    from avsr_tpu.avsr import AVSR
    from avsr_tpu.data.synthetic import SyntheticSpec, generate

    data = generate(SyntheticSpec(num_utterances=8, seed=0, alphabet="ab"))
    av = AVSR(
        architecture="audio", encoder_units_per_layer=(16,),
        decoder_units_per_layer=(16,), embedding_size=8, batch_size=4,
        max_label_length=6, compute_dtype="float32",
        run_dir=str(tmp_path / "m"), train_utterances=data,
        eval_utterances=data,
    )
    # one factor per bucket boundary (the loader validates the lengths)
    n_buckets = len(av.config.data.audio_bucket_boundaries)
    cfg = dataclasses.replace(
        av.config,
        data=dataclasses.replace(
            av.config.data, bucket_grad_accum=(2,) * n_buckets
        ),
    )
    av2 = AVSR(
        config=cfg, run_dir=str(tmp_path / "acc"), train_utterances=data,
        eval_utterances=data,
    )
    assert av2.trainer._accum_for(0) == 2
    first = av2.train(num_epochs=1)
    last = av2.train(num_epochs=5)
    assert np.isfinite(last["loss"])
    assert last["loss"] < first["loss"]


def test_bad_accum_fails_loudly(tmp_path):
    """Non-divisible accumulation factors raise at Trainer construction."""
    import dataclasses

    from avsr_tpu.avsr import AVSR
    from avsr_tpu.data.synthetic import SyntheticSpec, generate

    data = generate(SyntheticSpec(num_utterances=4, seed=0, alphabet="ab"))
    base = AVSR(
        architecture="audio", encoder_units_per_layer=(16,),
        decoder_units_per_layer=(16,), embedding_size=8, batch_size=4,
        max_label_length=6, compute_dtype="float32",
        run_dir=str(tmp_path / "m"), train_utterances=data,
        eval_utterances=data,
    ).config
    cfg = dataclasses.replace(
        base, train=dataclasses.replace(base.train, grad_accum_steps=3)
    )
    with pytest.raises(ValueError, match="divide"):
        AVSR(config=cfg, run_dir=str(tmp_path / "bad"),
             train_utterances=data, eval_utterances=data)


@pytest.mark.skipif(
    len(__import__("jax").devices()) < 8, reason="needs 8 devices"
)
def test_accum_composes_with_tensor_parallelism(rng):
    """accum=2 on a (4 data x 2 model) TP mesh still matches the plain
    single-device full-batch step — the two features compose."""
    from avsr_tpu.parallel import tp
    from avsr_tpu.parallel.mesh import make_mesh, shard_batch

    cfg = _no_stochastic(tiny_config("audio"))
    B = 8
    batch = tiny_batch("audio", rng, B=B)
    batch = batch._replace(
        audio_lengths=jnp.full((B,), batch.audio.shape[1], jnp.int32),
        target_lengths=jnp.asarray([2, 5, 3, 6, 1, 4, 6, 2], np.int32),
    )
    state1, tx1 = step_lib.create_train_state(jax.random.PRNGKey(0), cfg, VOCAB)
    new1, m1 = step_lib.make_jitted_train_step(cfg, tx1)(
        state1, batch, jax.random.PRNGKey(7)
    )

    mesh = make_mesh(num_data=4, num_model=2)
    state2, tx2 = step_lib.create_train_state(jax.random.PRNGKey(0), cfg, VOCAB)
    state2 = tp.shard_train_state(mesh, state2, tx2)
    sh = tp.train_state_shardings(mesh, state2, tx2)
    step2 = step_lib.make_jitted_train_step(
        cfg, tx2, mesh=mesh, state_shardings=sh, accum=2
    )
    new2, m2 = step2(state2, shard_batch(mesh, batch), jax.random.PRNGKey(7))

    np.testing.assert_allclose(
        float(m1["ce_loss"]), float(m2["ce_loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(new1.params),
        jax.tree_util.tree_leaves(new2.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=2e-5
        )
