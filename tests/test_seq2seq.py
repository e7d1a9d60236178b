"""End-to-end forward/loss smoke tests for all four regimes
[BASELINE.json:configs] on tiny shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsr_tpu.configs import (
    AudioFrontendConfig,
    DataConfig,
    DecodeConfig,
    DecoderConfig,
    EncoderConfig,
    ExperimentConfig,
    FusionConfig,
    NoiseConfig,
    TrainConfig,
    VideoFrontendConfig,
)
from avsr_tpu.models import seq2seq
from avsr_tpu.models.seq2seq import Batch

VOCAB = 12


def tiny_config(arch: str, **kw) -> ExperimentConfig:
    return ExperimentConfig(
        architecture=arch,
        audio=AudioFrontendConfig(
            num_mel_bins=8, fft_length=256, frame_stacking=2, frame_skipping=2,
            add_deltas=False,
        ),
        video=VideoFrontendConfig(
            roi_height=12, roi_width=12, conv_channels=(4, 8), embedding_dim=16
        ),
        audio_encoder=EncoderConfig(hidden_units=(16,), bidirectional=True,
                                    dropout_rate=0.0),
        video_encoder=EncoderConfig(hidden_units=(16,), bidirectional=True,
                                    dropout_rate=0.0),
        fusion=FusionConfig(attention_units=8, **kw.pop("fusion_kw", {})),
        decoder=DecoderConfig(
            embedding_dim=8, hidden_units=(16,), attention_units=8,
            max_label_length=6, dropout_rate=0.0,
        ),
        train=TrainConfig(compute_dtype="float32"),
        **kw,
    )


def tiny_batch(arch: str, rng, B=2, S=4000, Tv=10, K=6):
    batch = {}
    if arch in ("audio", "av_align", "bimodal"):
        batch["audio"] = jnp.asarray(
            rng.standard_normal((B, S)).astype(np.float32)
        )
        batch["audio_lengths"] = jnp.asarray([S, S // 2], jnp.int32)
    if arch in ("video", "av_align", "bimodal"):
        batch["video"] = jnp.asarray(
            rng.standard_normal((B, Tv, 12, 12, 1)).astype(np.float32)
        )
        batch["video_lengths"] = jnp.asarray([Tv, Tv - 3], jnp.int32)
    batch["targets"] = jnp.asarray(rng.integers(3, VOCAB, (B, K)), jnp.int32)
    batch["target_lengths"] = jnp.asarray([K, K - 2], jnp.int32)
    return Batch(**batch)


@pytest.mark.parametrize("arch", ["audio", "video", "av_align", "bimodal"])
def test_forward_and_loss(arch, rng):
    cfg = tiny_config(arch)
    params = seq2seq.model_init(jax.random.PRNGKey(0), cfg, VOCAB)
    batch = tiny_batch(arch, rng)
    loss, metrics = jax.jit(
        lambda p, b: seq2seq.loss_fn(p, cfg, b, train=False)
    )(params, batch)
    assert np.isfinite(float(loss))
    logits, aux = seq2seq.forward(params, cfg, batch, train=False)
    assert logits.shape == (2, 6, VOCAB)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_av_align_emits_alignments_and_au(rng):
    cfg = tiny_config("av_align", fusion_kw=dict(au_loss_weight=1.0, au_dim=2))
    params = seq2seq.model_init(jax.random.PRNGKey(1), cfg, VOCAB)
    batch = tiny_batch("av_align", rng)
    out = seq2seq.encode(params, cfg, batch, train=False)
    assert out.aux["au_predictions"] is not None
    aligns = np.asarray(out.aux["av_alignments"])  # [T_a, B, T_v]
    # alignment rows over valid audio steps sum to 1 within valid video range
    fl = np.asarray(out.aux["audio_feature_lengths"])
    sums = aligns[: fl[1], 1].sum(-1)
    np.testing.assert_allclose(sums, 1.0, rtol=1e-4)


def test_av_align_au_loss_changes_total(rng):
    cfg = tiny_config("av_align", fusion_kw=dict(au_loss_weight=5.0, au_dim=2))
    params = seq2seq.model_init(jax.random.PRNGKey(2), cfg, VOCAB)
    b = tiny_batch("av_align", rng)
    out = seq2seq.encode(params, cfg, b, train=False)
    T_a = out.aux["au_predictions"].shape[0]
    au_targets = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, T_a, 2)).astype(np.float32)
    )
    b2 = b._replace(au_targets=au_targets)
    l_with, m_with = seq2seq.loss_fn(params, cfg, b2, train=True,
                                     rng=jax.random.PRNGKey(0))
    l_wo, _ = seq2seq.loss_fn(params, cfg, b, train=True,
                              rng=jax.random.PRNGKey(0))
    assert "au_loss" in m_with
    assert float(l_with) != pytest.approx(float(l_wo))


def test_au_row_weights_exclude_rows(rng):
    """A zero-weighted row (loader padding repeat / au=None utterance)
    must not move the AU loss — its all-zero targets would otherwise
    regress predictions toward 0 at full weight."""
    cfg = tiny_config("av_align", fusion_kw=dict(au_loss_weight=5.0, au_dim=2))
    params = seq2seq.model_init(jax.random.PRNGKey(2), cfg, VOCAB)
    b = tiny_batch("av_align", rng)
    out = seq2seq.encode(params, cfg, b, train=False)
    T_a = out.aux["au_predictions"].shape[0]
    au = np.random.default_rng(0).standard_normal((2, T_a, 2)).astype(
        np.float32
    )
    w = jnp.asarray([1.0, 0.0], jnp.float32)
    b1 = b._replace(au_targets=jnp.asarray(au), au_row_weights=w)
    au2 = au.copy()
    au2[1] = 99.0  # garbage in the excluded row
    b2 = b._replace(au_targets=jnp.asarray(au2), au_row_weights=w)
    _, m1 = seq2seq.loss_fn(params, cfg, b1, train=False,
                            rng=jax.random.PRNGKey(0))
    _, m2 = seq2seq.loss_fn(params, cfg, b2, train=False,
                            rng=jax.random.PRNGKey(0))
    assert float(m1["au_loss"]) == pytest.approx(float(m2["au_loss"]))
    # and the weighted loss differs from the unweighted one (row 1 counts)
    b3 = b._replace(au_targets=jnp.asarray(au2))
    _, m3 = seq2seq.loss_fn(params, cfg, b3, train=False,
                            rng=jax.random.PRNGKey(0))
    assert float(m3["au_loss"]) != pytest.approx(float(m1["au_loss"]))


def test_grads_flow_everywhere(rng):
    """Every parameter receives a nonzero gradient in the AV-Align regime."""
    cfg = tiny_config("av_align")
    params = seq2seq.model_init(jax.random.PRNGKey(3), cfg, VOCAB)
    batch = tiny_batch("av_align", rng)
    grads = jax.grad(
        lambda p: seq2seq.loss_fn(p, cfg, batch, train=False)[0]
    )(params)
    leaves = jax.tree_util.tree_leaves_with_path(grads)
    zero = [
        jax.tree_util.keystr(path)
        for path, g in leaves
        if float(jnp.max(jnp.abs(g))) == 0.0
    ]
    assert not zero, f"zero gradients at: {zero}"


def test_noise_mixing_in_training_path(rng):
    from avsr_tpu.data.synthetic import make_noise_bank

    cfg = tiny_config("audio", noise=NoiseConfig(enabled=True))
    params = seq2seq.model_init(jax.random.PRNGKey(4), cfg, VOCAB)
    batch = tiny_batch("audio", rng)
    bank = jnp.asarray(make_noise_bank(num_rows=2, row_samples=8000))
    l_clean, _ = seq2seq.loss_fn(params, cfg, batch, train=True,
                                 rng=jax.random.PRNGKey(0))
    l_noisy, _ = seq2seq.loss_fn(params, cfg, batch, train=True,
                                 rng=jax.random.PRNGKey(0), noise_bank=bank)
    assert float(l_clean) != pytest.approx(float(l_noisy))


def test_compact_transfer_loss_matches_fp32(rng):
    """int16 audio + uint8 video dequantized on device produce the SAME
    loss as the fp32 path when the inputs already sit on the quantization
    grids (every real corpus: 16-bit PCM wavs, uint8-coded ROI records)."""
    cfg = tiny_config("av_align")
    params = seq2seq.model_init(jax.random.PRNGKey(0), cfg, VOCAB)
    B, S, Tv, K = 2, 4000, 10, 6
    wav_i = rng.integers(-32768, 32768, (B, S)).astype(np.int16)
    vid_u = rng.integers(0, 256, (B, Tv, 12, 12, 1)).astype(np.uint8)
    base = tiny_batch("av_align", rng, B=B, S=S, Tv=Tv, K=K)
    fp = base._replace(
        audio=jnp.asarray(wav_i.astype(np.float32) / 32767.0),
        video=jnp.asarray(vid_u.astype(np.float32) / 255.0),
    )
    compact = base._replace(audio=jnp.asarray(wav_i), video=jnp.asarray(vid_u))
    l_fp, _ = seq2seq.loss_fn(params, cfg, fp, train=False)
    l_c, _ = seq2seq.loss_fn(params, cfg, compact, train=False)
    np.testing.assert_allclose(float(l_fp), float(l_c), rtol=1e-6)


@pytest.mark.parametrize("arch", ["av_align", "bimodal"])
def test_fuse_encoder_scans_knob_is_numerically_invisible(arch, rng):
    """train.fuse_encoder_scans batches the audio+video encoder scans into
    one (paired_encoder_apply); loss and grads must be identical to the
    unfused path."""
    import dataclasses

    base = tiny_config(arch)
    cfg_on = dataclasses.replace(
        base, train=dataclasses.replace(base.train, fuse_encoder_scans=True)
    )
    cfg_off = dataclasses.replace(
        base, train=dataclasses.replace(base.train, fuse_encoder_scans=False)
    )
    params = seq2seq.model_init(jax.random.PRNGKey(0), cfg_on, VOCAB)
    batch = tiny_batch(arch, rng)

    def loss(p, cfg):
        l, _ = seq2seq.loss_fn(p, cfg, batch, train=False)
        return l

    l_on, g_on = jax.value_and_grad(loss)(params, cfg_on)
    l_off, g_off = jax.value_and_grad(loss)(params, cfg_off)
    np.testing.assert_allclose(float(l_on), float(l_off), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_on),
                    jax.tree_util.tree_leaves(g_off)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("arch", ["av_align", "bimodal", "audio"])
def test_memory_value_down_projection_end_to_end(arch, rng):
    """memory_value_dim on fusion and decoder: forward/loss/grads and both
    decode paths run with projected value dims (the bandwidth knob for the
    value-streaming floor, VERDICT round-2 next #3)."""
    import dataclasses

    from avsr_tpu.decode.beam import beam_search
    from avsr_tpu.decode.greedy import greedy_decode

    cfg = tiny_config(arch)
    cfg = dataclasses.replace(
        cfg,
        fusion=dataclasses.replace(cfg.fusion, memory_value_dim=8),
        decoder=dataclasses.replace(cfg.decoder, memory_value_dim=12),
    )
    params = seq2seq.model_init(jax.random.PRNGKey(0), cfg, VOCAB)
    batch = tiny_batch(arch, rng)
    (loss, metrics), grads = jax.value_and_grad(
        lambda p: seq2seq.loss_fn(p, cfg, batch, train=True,
                                  rng=jax.random.PRNGKey(1)),
        has_aux=True,
    )(params)
    assert np.isfinite(float(loss))
    for g in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(g)))
    out = seq2seq.encode(params, cfg, batch, train=False)
    for mem in out.memories:
        assert mem.values.shape[-1] == 12
    if arch == "av_align":
        # fused memory dim = audio hidden + projected visual context
        assert out.memories[0].keys.shape[1] == out.memories[0].values.shape[1]
        assert seq2seq.memory_dims_of(cfg) == [16 + 8]
    ids, _ = greedy_decode(
        params["decoder"], cfg.decoder, out.memories, 6,
        compute_dtype=jnp.float32,
    )
    assert ids.shape[1] == 6
    res = beam_search(
        params["decoder"], cfg.decoder, out.memories, 6, beam_width=3,
        compute_dtype=jnp.float32,
    )
    assert res.ids.shape[1] == 6
