"""Pyramidal encoder time reduction (EncoderConfig.time_reduction,
LAS-style, arXiv:1508.01211 — opt-in extension, no reference counterpart):
frame folding order, length math, padding invariance, end-to-end AV-Align
training with AU-target pooling, and FLOPs accounting."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsr_tpu.configs import EncoderConfig
from avsr_tpu.models import encoder as enc
from avsr_tpu.models import seq2seq
from tests.test_seq2seq import VOCAB, tiny_batch, tiny_config


def _cfg(hidden=(8, 8, 8), reduction=(1, 2, 2), **kw):
    return EncoderConfig(
        hidden_units=hidden, time_reduction=reduction, dropout_rate=0.0, **kw
    )


def test_time_reduce_folds_frames_in_order():
    # [T=5, B=1, D=2], r=2 -> groups (0,1), (2,3), (4,pad)
    h = jnp.arange(10, dtype=jnp.float32).reshape(5, 1, 2)
    out = enc._time_reduce(h, 2)
    assert out.shape == (3, 1, 4)
    np.testing.assert_array_equal(out[0, 0], [0, 1, 2, 3])
    np.testing.assert_array_equal(out[1, 0], [4, 5, 6, 7])
    np.testing.assert_array_equal(out[2, 0], [8, 9, 0, 0])  # zero-padded


def test_output_lengths_and_validation():
    cfg = _cfg()
    lens = np.asarray([11, 5, 1], np.int64)
    np.testing.assert_array_equal(
        enc.encoder_output_lengths(cfg, lens), [3, 2, 1]
    )
    assert enc.total_time_reduction(cfg) == 4
    assert enc.total_time_reduction(_cfg(reduction=None)) == 1
    with pytest.raises(ValueError, match="time_reduction"):
        enc.encoder_init(
            jax.random.PRNGKey(0), _cfg(reduction=(2,)), input_dim=4
        )
    with pytest.raises(ValueError, match="time_reduction"):
        enc.time_reductions(_cfg(reduction=(1, 0, 2)))


def test_encoder_output_shape_and_padded_steps_zero():
    cfg = _cfg()
    params = enc.encoder_init(jax.random.PRNGKey(1), cfg, input_dim=4)
    rng = np.random.default_rng(0)
    T, B = 11, 3
    lens = jnp.asarray([11, 5, 2], jnp.int32)
    x = jnp.asarray(rng.standard_normal((T, B, 4)), jnp.float32)
    x = x * (jnp.arange(T)[:, None, None] < lens[None, :, None])
    out, _ = enc.encoder_apply(params, cfg, x, lens,
                               compute_dtype=jnp.float32)
    assert out.shape == (3, B, 16)  # ceil(ceil(11/2)/2)=3, 2*8 bidir
    out = np.asarray(out)
    red = np.asarray(enc.encoder_output_lengths(cfg, np.asarray(lens)))
    for b in range(B):
        assert np.all(out[red[b]:, b] == 0.0)
        assert np.any(out[: red[b], b] != 0.0)


def test_padding_invariance_under_reduction():
    """Same content padded to different horizons -> identical valid
    outputs, even when the pad makes T cross a multiple-of-r boundary."""
    cfg = _cfg(hidden=(8, 8), reduction=(2, 2))
    params = enc.encoder_init(jax.random.PRNGKey(2), cfg, input_dim=4)
    rng = np.random.default_rng(1)
    lens = jnp.asarray([7, 5], jnp.int32)
    base = rng.standard_normal((7, 2, 4)).astype(np.float32)
    base[5:, 1] = 0.0  # padded positions are exactly zero (invariant)
    outs = []
    for T in (7, 9, 12):
        x = np.zeros((T, 2, 4), np.float32)
        x[:7] = base
        out, _ = enc.encoder_apply(
            params, cfg, jnp.asarray(x), lens, compute_dtype=jnp.float32
        )
        outs.append(np.asarray(out))
    red = int(enc.encoder_output_lengths(cfg, np.asarray([7]))[0])  # 2
    for other in outs[1:]:
        np.testing.assert_allclose(
            outs[0][:red], other[:red], rtol=1e-5, atol=1e-6
        )


def test_all_ones_reduction_matches_none():
    cfg1 = _cfg(hidden=(8, 8), reduction=(1, 1))
    cfg0 = _cfg(hidden=(8, 8), reduction=None)
    p = enc.encoder_init(jax.random.PRNGKey(3), cfg0, input_dim=4)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((6, 2, 4)), jnp.float32)
    lens = jnp.asarray([6, 4], jnp.int32)
    o0, _ = enc.encoder_apply(p, cfg0, x, lens, compute_dtype=jnp.float32)
    o1, _ = enc.encoder_apply(p, cfg1, x, lens, compute_dtype=jnp.float32)
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))


def test_pool_time_masked_group_mean():
    # T=5, r=2, lengths [5, 3]: example 0's last group is frame 4 alone;
    # example 1's group 1 is frame 2 alone, group 2 fully invalid.
    x = jnp.arange(10, dtype=jnp.float32).reshape(5, 2, 1)
    x = x * (jnp.arange(5)[:, None, None] < jnp.asarray([5, 3])[None, :, None])
    out = np.asarray(seq2seq._pool_time(x, jnp.asarray([5, 3]), 2))
    assert out.shape == (3, 2, 1)
    np.testing.assert_allclose(out[:, 0, 0], [1.0, 5.0, 8.0])
    np.testing.assert_allclose(out[:, 1, 0], [2.0, 5.0, 0.0])


@pytest.mark.parametrize("arch", ["audio", "av_align"])
def test_end_to_end_loss_and_grads_with_reduction(arch):
    fusion_kw = dict(au_loss_weight=1.0, au_dim=2) if arch == "av_align" else {}
    cfg = tiny_config(arch, fusion_kw=fusion_kw)
    cfg = cfg.replace(
        audio_encoder=EncoderConfig(
            hidden_units=(16, 16), time_reduction=(1, 2), dropout_rate=0.0
        )
    )
    params = seq2seq.model_init(jax.random.PRNGKey(4), cfg, VOCAB)
    rng = np.random.default_rng(3)
    batch = tiny_batch(arch, rng)
    if arch == "av_align":
        # AU targets arrive at the FRONTEND rate ([B, T_frontend, au_dim],
        # data pipeline schema); _losses pools them to the encoder-output
        # rate to match au_predictions.
        out = seq2seq.encode(params, cfg, batch, train=False)
        T_red = int(out.aux["au_predictions"].shape[0])
        red_lens = np.asarray(out.aux["audio_feature_lengths"])
        full_lens = np.asarray(out.aux["audio_frontend_lengths"])
        np.testing.assert_array_equal(red_lens, -(-full_lens // 2))
        batch = batch._replace(
            au_targets=jnp.asarray(
                rng.standard_normal((2, 2 * T_red, 2)).astype(np.float32)
            )
        )
    loss, grads = jax.jit(
        jax.value_and_grad(
            lambda p, b: seq2seq.loss_fn(p, cfg, b, train=True,
                                         rng=jax.random.PRNGKey(0))[0]
        )
    )(params, batch)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    # every audio-encoder layer receives gradient through the reduction
    for layer in grads["audio_encoder"]["layers"]:
        assert float(jnp.abs(layer["fwd"]["wx"]).max()) > 0.0


def test_flops_account_for_reduction():
    from avsr_tpu.utils.flops import train_step_flops

    cfg = tiny_config("av_align")
    red = cfg.replace(
        audio_encoder=EncoderConfig(
            hidden_units=(16, 16), time_reduction=(1, 4), dropout_rate=0.0
        )
    )
    base = cfg.replace(
        audio_encoder=EncoderConfig(hidden_units=(16, 16), dropout_rate=0.0)
    )
    kw = dict(batch=8, audio_samples=16000, video_frames=25, label_len=20,
              vocab=30)
    f_red = train_step_flops(red, **kw)
    f_base = train_step_flops(base, **kw)
    assert f_red["fusion"] < 0.5 * f_base["fusion"]
    assert f_red["decoder"] < f_base["decoder"]
    assert f_red["total"] < f_base["total"]


def test_overfit_av_align_with_time_reduction(tmp_path):
    """Quality gate mirroring the value-projection one
    (tests/test_train_loop.py): a pyramidal AV-Align model (audio rate
    halved before the top encoder layer) must still overfit the synthetic
    set to low CER through the fusion scan, decoder attention, and beam
    decode at the reduced rate."""
    import dataclasses

    from avsr_tpu.avsr import AVSR
    from tests.test_train_loop import overfit_config, synth

    data = synth()
    cfg = overfit_config("av_align", str(tmp_path), epochs=45)
    cfg = dataclasses.replace(
        cfg,
        audio_encoder=EncoderConfig(
            hidden_units=(48, 48), time_reduction=(1, 2),
            bidirectional=True, dropout_rate=0.0,
        ),
    )
    avsr = AVSR(config=cfg, run_dir=str(tmp_path / "runtr"),
                train_utterances=data, eval_utterances=data)
    avsr.train(num_epochs=cfg.train.num_epochs)
    summary = avsr.evaluate(use_beam=True)
    assert summary["cer"] < 0.35, summary


def test_overfit_fast_combo(tmp_path):
    """Quality gate for the lrs2_av_fast lever STACK: cross-attention
    fusion consuming a time-reduced audio memory (the preset's exact
    combination, at overfit scale) must still drive CER low through the
    recurrent decoder and beam decode.  Each lever has its own gate;
    this pins their interaction (the fusion attends audio->video at the
    REDUCED audio rate)."""
    import dataclasses

    from avsr_tpu.avsr import AVSR
    from avsr_tpu.configs import EncoderConfig
    from tests.test_train_loop import overfit_config, synth

    data = synth()
    cfg = overfit_config("av_align", str(tmp_path), epochs=45)
    cfg = dataclasses.replace(
        cfg,
        audio_encoder=EncoderConfig(
            hidden_units=(48, 48), time_reduction=(1, 2),
            bidirectional=True, dropout_rate=0.0,
        ),
        fusion=dataclasses.replace(cfg.fusion, fusion_type="cross_attention",
                                   num_heads=2, attention_units=12),
    )
    avsr = AVSR(config=cfg, run_dir=str(tmp_path / "runfast"),
                train_utterances=data, eval_utterances=data)
    avsr.train(num_epochs=cfg.train.num_epochs)
    summary = avsr.evaluate(use_beam=True)
    assert summary["cer"] < 0.35, summary


def test_overfit_fast_xfdec_combo(tmp_path):
    """Quality gate for the PROMOTED lrs2_av_fast stack (round 4
    promotion #2; round-5 placement update): cross-attention fusion
    consuming a time-reduced audio memory feeding the parallel
    teacher-forcing transformer DECODER — the preset's exact combination
    at overfit scale, with the preset's EARLY pyramid placement
    (reduction before layer 1, campaign arms av_fast_tr21 /
    CAMPAIGN_TPU av_fast_tr221), trained with the warmup-cosine recipe
    the held-out campaign showed the transformer decoder requires
    (CAMPAIGN.json arm ``av_fast_xfdec_warmup``), and decoded through
    KV-cache beam search."""
    import dataclasses

    from avsr_tpu.avsr import AVSR
    from avsr_tpu.configs import EncoderConfig
    from tests.test_train_loop import overfit_config, synth

    data = synth()
    cfg = overfit_config("av_align", str(tmp_path), epochs=60)
    cfg = dataclasses.replace(
        cfg,
        audio_encoder=EncoderConfig(
            hidden_units=(48, 48), time_reduction=(2, 1),
            bidirectional=True, dropout_rate=0.0,
        ),
        fusion=dataclasses.replace(cfg.fusion, fusion_type="cross_attention",
                                   num_heads=2, attention_units=12),
        decoder=dataclasses.replace(cfg.decoder, decoder_type="transformer",
                                    num_heads=2, sampling_probability=0.0,
                                    sampling_ramp_steps=0),
        train=dataclasses.replace(cfg.train, lr_schedule="warmup_cosine",
                                  warmup_steps=40),
    )
    avsr = AVSR(config=cfg, run_dir=str(tmp_path / "runfastxf"),
                train_utterances=data, eval_utterances=data)
    avsr.train(num_epochs=cfg.train.num_epochs)
    summary = avsr.evaluate(use_beam=True)
    assert summary["cer"] < 0.35, summary
