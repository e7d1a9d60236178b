"""Scan-free cross-attention fusion (FusionConfig.fusion_type=
"cross_attention", models/fusion.py — opt-in extension; reference parity
is the recurrent AV-Align scan): masking, alignment normalization,
padding invariance, end-to-end training incl. AU loss, FLOPs."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsr_tpu.configs import FusionConfig
from avsr_tpu.models import fusion as fus
from avsr_tpu.models import seq2seq
from tests.test_seq2seq import VOCAB, tiny_batch, tiny_config


def _setup(ctx_dim=None, au=False, heads=2, seed=0):
    cfg = FusionConfig(attention_units=8, num_heads=heads,
                       fusion_type="cross_attention",
                       memory_value_dim=ctx_dim,
                       au_loss_weight=1.0 if au else 0.0, au_dim=2)
    params = fus.cross_attention_fusion_init(
        jax.random.PRNGKey(seed), cfg, audio_dim=12, video_dim=10
    )
    return cfg, params


def test_shapes_masking_and_alignment_normalization():
    cfg, params = _setup(au=True)
    rng = np.random.default_rng(0)
    T_a, B, T_v = 7, 3, 5
    a_len = jnp.asarray([7, 4, 1], jnp.int32)
    v_len = jnp.asarray([5, 3, 2], jnp.int32)
    audio = jnp.asarray(rng.standard_normal((T_a, B, 12)), jnp.float32)
    video = jnp.asarray(rng.standard_normal((B, T_v, 10)), jnp.float32)
    out = fus.cross_attention_fusion_apply(
        params, cfg, audio, a_len, video, v_len,
        compute_dtype=jnp.float32,
    )
    assert out.fused.shape == (T_a, B, 12 + 10)
    assert out.alignments.shape == (T_a, B, T_v)
    assert out.au_predictions.shape == (T_a, B, 2)
    fused = np.asarray(out.fused)
    aligns = np.asarray(out.alignments)
    for b, (La, Lv) in enumerate([(7, 5), (4, 3), (1, 2)]):
        # padded audio rows exactly zero everywhere
        assert np.all(fused[La:, b] == 0.0)
        assert np.all(aligns[La:, b] == 0.0)
        assert np.all(np.asarray(out.au_predictions)[La:, b] == 0.0)
        # valid rows: weights on valid video steps only, summing to 1
        np.testing.assert_allclose(aligns[:La, b, :Lv].sum(-1), 1.0,
                                   rtol=1e-5)
        assert np.all(aligns[:La, b, Lv:] == 0.0)


def test_padding_invariance_both_modalities():
    cfg, params = _setup()
    rng = np.random.default_rng(1)
    a_len = jnp.asarray([5], jnp.int32)
    v_len = jnp.asarray([4], jnp.int32)
    a_base = rng.standard_normal((5, 1, 12)).astype(np.float32)
    v_base = rng.standard_normal((1, 4, 10)).astype(np.float32)
    outs = []
    for Ta, Tv in ((5, 4), (9, 7)):
        a = np.zeros((Ta, 1, 12), np.float32)
        a[:5] = a_base
        v = np.zeros((1, Tv, 10), np.float32)
        v[:, :4] = v_base
        out = fus.cross_attention_fusion_apply(
            params, cfg, jnp.asarray(a), a_len, jnp.asarray(v), v_len,
            compute_dtype=jnp.float32,
        )
        outs.append(np.asarray(out.fused))
    np.testing.assert_allclose(outs[0][:5], outs[1][:5], rtol=1e-5,
                               atol=1e-6)


def test_ctx_dim_from_memory_value_dim_and_validation():
    cfg, params = _setup(ctx_dim=6, heads=2)
    assert params["wv"].shape == (10, 6)
    assert params["wo"].shape == (6, 6)
    with pytest.raises(ValueError, match="num_heads"):
        _setup(ctx_dim=6, heads=4)
    # memory dims reflect [audio_out ; ctx]
    cfg_e = tiny_config("av_align")
    cfg_e = cfg_e.replace(
        fusion=dataclasses.replace(
            cfg_e.fusion, fusion_type="cross_attention", num_heads=2,
            memory_value_dim=8,
        )
    )
    from avsr_tpu.models.encoder import encoder_output_dim

    dims = seq2seq.memory_dims_of(cfg_e)
    assert dims == [encoder_output_dim(cfg_e.audio_encoder) + 8]


def test_end_to_end_loss_and_grads_with_au():
    cfg = tiny_config(
        "av_align", fusion_kw=dict(au_loss_weight=1.0, au_dim=2)
    )
    cfg = cfg.replace(
        fusion=dataclasses.replace(cfg.fusion, fusion_type="cross_attention",
                                   num_heads=2)
    )
    params = seq2seq.model_init(jax.random.PRNGKey(2), cfg, VOCAB)
    batch = tiny_batch("av_align", np.random.default_rng(3))
    out = seq2seq.encode(params, cfg, batch, train=False)
    T_a = out.aux["au_predictions"].shape[0]
    batch = batch._replace(au_targets=jnp.asarray(
        np.random.default_rng(4).standard_normal((2, T_a, 2)).astype(
            np.float32)
    ))
    loss, grads = jax.jit(
        jax.value_and_grad(
            lambda p, b: seq2seq.loss_fn(p, cfg, b, train=True,
                                         rng=jax.random.PRNGKey(0))[0]
        )
    )(params, batch)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    for name in ("wq", "wk", "wv", "wo", "au_w"):
        assert float(jnp.abs(grads["fusion"][name]).max()) > 0.0


def test_flops_accounting():
    from avsr_tpu.utils.flops import train_step_flops

    base = tiny_config("av_align")
    xa = base.replace(
        fusion=dataclasses.replace(base.fusion, fusion_type="cross_attention",
                                   num_heads=2)
    )
    kw = dict(batch=8, audio_samples=16000, video_frames=25, label_len=20,
              vocab=30)
    f = train_step_flops(xa, **kw)
    assert f["fusion"] > 0 and f["total"] > f["fusion"]


def test_overfit_av_align_with_cross_attention(tmp_path):
    """Quality gate: cross-attention AV-Align must overfit the synthetic
    set to the flagship CER bar through decoder + beam decode."""
    from avsr_tpu.avsr import AVSR
    from tests.test_train_loop import overfit_config, synth

    data = synth()
    cfg = overfit_config("av_align", str(tmp_path), epochs=45)
    cfg = dataclasses.replace(
        cfg,
        fusion=dataclasses.replace(cfg.fusion, fusion_type="cross_attention",
                                   num_heads=2, attention_units=12),
    )
    avsr = AVSR(config=cfg, run_dir=str(tmp_path / "runxa"),
                train_utterances=data, eval_utterances=data)
    avsr.train(num_epochs=cfg.train.num_epochs)
    summary = avsr.evaluate(use_beam=True)
    assert summary["cer"] < 0.35, summary
