"""Transformer encoder option (EncoderConfig.encoder_type="transformer",
models/transformer.py — opt-in extension; the reference is BiLSTM-only,
SURVEY §2.2 row 3): config validation, padding invariance, pyramidal
reduction, end-to-end training through fusion/decoder, FLOPs accounting."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsr_tpu.configs import EncoderConfig
from avsr_tpu.models import encoder as enc
from avsr_tpu.models import seq2seq
from tests.test_seq2seq import VOCAB, tiny_batch, tiny_config


def _cfg(hidden=(16, 16), heads=4, **kw):
    return EncoderConfig(
        hidden_units=hidden, encoder_type="transformer", num_heads=heads,
        dropout_rate=0.0, **kw
    )


def test_config_validation():
    with pytest.raises(ValueError, match="hidden_units equal"):
        enc.encoder_init(jax.random.PRNGKey(0), _cfg(hidden=(16, 32)), 8)
    with pytest.raises(ValueError, match="num_heads"):
        enc.encoder_init(jax.random.PRNGKey(0), _cfg(hidden=(18,)), 8)
    with pytest.raises(ValueError, match="RNN-stack knob"):
        enc.encoder_init(jax.random.PRNGKey(0), _cfg(residual=True), 8)
    with pytest.raises(ValueError, match="RNN-only"):
        enc.encoder_init(
            jax.random.PRNGKey(0), _cfg(recurrent_dropout_rate=0.1), 8
        )
    with pytest.raises(ValueError, match="encoder_type"):
        enc.encoder_init(
            jax.random.PRNGKey(0),
            EncoderConfig(hidden_units=(8,), encoder_type="wavenet"), 8,
        )
    assert enc.encoder_output_dim(_cfg()) == 16  # d_model, no 2x bidir


def test_output_shape_and_padded_steps_zero():
    cfg = _cfg()
    params = enc.encoder_init(jax.random.PRNGKey(1), cfg, input_dim=6)
    rng = np.random.default_rng(0)
    T, B = 9, 3
    lens = jnp.asarray([9, 5, 2], jnp.int32)
    x = jnp.asarray(rng.standard_normal((T, B, 6)), jnp.float32)
    out, (summary,) = enc.encoder_apply(
        params, cfg, x, lens, compute_dtype=jnp.float32
    )
    assert out.shape == (T, B, 16)
    assert summary.shape == (B, 16)
    out = np.asarray(out)
    for b, L in enumerate([9, 5, 2]):
        assert np.all(out[L:, b] == 0.0)
        assert np.any(out[:L, b] != 0.0)


def test_padding_invariance():
    """Same content padded to different horizons -> identical valid
    outputs (attention masks padded keys; PEs are absolute)."""
    cfg = _cfg()
    params = enc.encoder_init(jax.random.PRNGKey(2), cfg, input_dim=6)
    rng = np.random.default_rng(1)
    lens = jnp.asarray([7, 4], jnp.int32)
    base = rng.standard_normal((7, 2, 6)).astype(np.float32)
    base[4:, 1] = 0.0
    outs = []
    for T in (7, 12):
        x = np.zeros((T, 2, 6), np.float32)
        x[:7] = base
        out, _ = enc.encoder_apply(
            params, cfg, jnp.asarray(x), lens, compute_dtype=jnp.float32
        )
        outs.append(np.asarray(out))
    np.testing.assert_allclose(outs[0][:7], outs[1][:7], rtol=1e-5,
                               atol=1e-5)


def test_time_reduction_with_transformer():
    cfg = _cfg(hidden=(16, 16), time_reduction=(2, 2))
    params = enc.encoder_init(jax.random.PRNGKey(3), cfg, input_dim=6)
    rng = np.random.default_rng(2)
    T, B = 11, 2
    lens = jnp.asarray([11, 3], jnp.int32)
    x = jnp.asarray(rng.standard_normal((T, B, 6)), jnp.float32)
    x = x * (jnp.arange(T)[:, None, None] < lens[None, :, None])
    out, _ = enc.encoder_apply(params, cfg, x, lens,
                               compute_dtype=jnp.float32)
    # ceil(ceil(11/2)/2) = 3 output steps
    assert out.shape == (3, B, 16)
    red = np.asarray(enc.encoder_output_lengths(cfg, np.asarray(lens)))
    np.testing.assert_array_equal(red, [3, 1])
    out = np.asarray(out)
    for b in range(B):
        assert np.all(out[red[b]:, b] == 0.0)
        assert np.any(out[: red[b], b] != 0.0)
    assert "fold" in params["layers"][1] and "fold" not in params["layers"][0]


def test_conv_kernel_validation():
    key = jax.random.PRNGKey(0)
    with pytest.raises(ValueError, match="odd width"):
        enc.encoder_init(key, _cfg(conv_kernel=4), 8)
    with pytest.raises(ValueError, match="odd width"):
        enc.encoder_init(key, _cfg(conv_kernel=1), 8)
    with pytest.raises(ValueError, match="transformer-only"):
        enc.encoder_init(
            key, EncoderConfig(hidden_units=(8,), conv_kernel=3), 8
        )


def test_conv_params_only_when_enabled():
    plain = enc.encoder_init(jax.random.PRNGKey(1), _cfg(), input_dim=6)
    conv = enc.encoder_init(jax.random.PRNGKey(1), _cfg(conv_kernel=3),
                            input_dim=6)
    assert "conv_dw" not in plain["layers"][0]
    layer = conv["layers"][0]
    assert layer["conv_dw"].shape == (3, 1, 16)
    assert layer["conv_w_in"].shape == (16, 32)
    assert layer["conv_w_out"].shape == (16, 16)


def test_conv_padding_invariance_and_padded_steps_zero():
    """The depthwise time-conv reads NEIGHBOR frames, so this is the
    invariant the module's input masking exists for: identical valid
    outputs under a longer pad horizon, padded output steps exactly 0."""
    cfg = _cfg(conv_kernel=5)
    params = enc.encoder_init(jax.random.PRNGKey(2), cfg, input_dim=6)
    rng = np.random.default_rng(1)
    lens = jnp.asarray([7, 4], jnp.int32)
    base = rng.standard_normal((7, 2, 6)).astype(np.float32)
    base[4:, 1] = 0.0
    outs = []
    for T in (7, 13):
        x = np.zeros((T, 2, 6), np.float32)
        x[:7] = base
        out, _ = enc.encoder_apply(
            params, cfg, jnp.asarray(x), lens, compute_dtype=jnp.float32
        )
        out = np.asarray(out)
        for b, L in enumerate([7, 4]):
            assert np.all(out[L:, b] == 0.0)
            assert np.any(out[:L, b] != 0.0)
        outs.append(out)
    np.testing.assert_allclose(outs[0][:7], outs[1][:7], rtol=1e-5,
                               atol=1e-5)


def test_conv_changes_output_and_uses_neighbors():
    """With the conv module the output at step t must depend on frame
    t-1 (the RNN-like local coupling pure self-attention lacks only
    through content, not position)."""
    cfg = _cfg(conv_kernel=3)
    params = enc.encoder_init(jax.random.PRNGKey(3), cfg, input_dim=6)
    rng = np.random.default_rng(2)
    T, B = 8, 1
    lens = jnp.asarray([T], jnp.int32)
    x = rng.standard_normal((T, B, 6)).astype(np.float32)
    out_a, _ = enc.encoder_apply(params, cfg, jnp.asarray(x), lens,
                                 compute_dtype=jnp.float32)
    x2 = x.copy()
    x2[3] += 1.0  # perturb ONE frame
    out_b, _ = enc.encoder_apply(params, cfg, jnp.asarray(x2), lens,
                                 compute_dtype=jnp.float32)
    # neighbors of the perturbed frame move (depthwise conv), and they
    # move by more than the attention-only leak to distant frames
    d_neigh = float(np.abs(np.asarray(out_b - out_a)[4, 0]).max())
    d_far = float(np.abs(np.asarray(out_b - out_a)[7, 0]).max())
    assert d_neigh > 0.0 and d_neigh > d_far


def test_conv_end_to_end_grads():
    cfg = tiny_config("audio")
    cfg = cfg.replace(
        audio_encoder=EncoderConfig(
            hidden_units=(16, 16), encoder_type="transformer", num_heads=4,
            conv_kernel=3, dropout_rate=0.1,
        )
    )
    params = seq2seq.model_init(jax.random.PRNGKey(5), cfg, VOCAB)
    batch = tiny_batch("audio", np.random.default_rng(4))
    loss, grads = jax.jit(
        jax.value_and_grad(
            lambda p, b: seq2seq.loss_fn(p, cfg, b, train=True,
                                         rng=jax.random.PRNGKey(0))[0]
        )
    )(params, batch)
    assert np.isfinite(float(loss))
    for layer in grads["audio_encoder"]["layers"]:
        for k in ("conv_dw", "conv_w_in", "conv_w_out"):
            g = np.asarray(layer[k])
            assert np.all(np.isfinite(g)) and np.abs(g).max() > 0.0


def test_conv_grads_under_bf16_compute():
    """Regression: preferred_element_type=f32 on the depthwise conv broke
    its transpose rule under bf16 compute (mixed-dtype conv in the
    backward pass) — the TPU train path is bf16, the other conv tests
    run fp32, so this pins the bf16 grad specifically."""
    cfg = _cfg(conv_kernel=3)
    params = enc.encoder_init(jax.random.PRNGKey(7), cfg, input_dim=6)
    x = jnp.asarray(np.random.default_rng(5).standard_normal((9, 3, 6)),
                    jnp.float32)
    lens = jnp.asarray([9, 5, 2], jnp.int32)

    def f(p):
        out, _ = enc.encoder_apply(p, cfg, x, lens,
                                   compute_dtype=jnp.bfloat16)
        return out.sum()

    grads = jax.jit(jax.grad(f))(params)
    for k in ("conv_dw", "conv_w_in", "conv_w_out"):
        g = np.asarray(grads["layers"][0][k], np.float32)
        assert np.all(np.isfinite(g)) and np.abs(g).max() > 0.0


def test_conv_flops_accounted():
    from avsr_tpu.utils.flops import train_step_flops

    base = tiny_config("audio").replace(
        audio_encoder=EncoderConfig(hidden_units=(16, 16),
                                    encoder_type="transformer", num_heads=4)
    )
    conv = base.replace(
        audio_encoder=dataclasses.replace(base.audio_encoder, conv_kernel=7)
    )
    kw = dict(batch=8, audio_samples=16000, video_frames=25, label_len=20,
              vocab=30)
    assert (train_step_flops(conv, **kw)["audio_encoder"]
            > train_step_flops(base, **kw)["audio_encoder"])


@pytest.mark.parametrize("arch", ["audio", "av_align"])
def test_end_to_end_loss_and_grads(arch):
    cfg = tiny_config(arch)
    cfg = cfg.replace(
        audio_encoder=EncoderConfig(
            hidden_units=(16, 16), encoder_type="transformer", num_heads=4,
            dropout_rate=0.1,
        )
    )
    params = seq2seq.model_init(jax.random.PRNGKey(4), cfg, VOCAB)
    batch = tiny_batch(arch, np.random.default_rng(3))
    loss, grads = jax.jit(
        jax.value_and_grad(
            lambda p, b: seq2seq.loss_fn(p, cfg, b, train=True,
                                         rng=jax.random.PRNGKey(0))[0]
        )
    )(params, batch)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    for layer in grads["audio_encoder"]["layers"]:
        assert float(jnp.abs(layer["wq"]).max()) > 0.0
        assert float(jnp.abs(layer["ff_w1"]).max()) > 0.0


def test_flops_accounting():
    from avsr_tpu.utils.flops import train_step_flops

    base = tiny_config("audio")
    xf = base.replace(
        audio_encoder=EncoderConfig(hidden_units=(16, 16),
                                    encoder_type="transformer", num_heads=4)
    )
    kw = dict(batch=8, audio_samples=16000, video_frames=25, label_len=20,
              vocab=30)
    f = train_step_flops(xf, **kw)
    assert f["audio_encoder"] > 0 and f["total"] > f["audio_encoder"]
    red = xf.replace(
        audio_encoder=dataclasses.replace(
            xf.audio_encoder, time_reduction=(1, 4)
        )
    )
    f_red = train_step_flops(red, **kw)
    assert f_red["audio_encoder"] < f["audio_encoder"]
    assert f_red["decoder"] < f["decoder"]  # shorter attention memory


def test_overfit_audio_with_transformer_encoder(tmp_path):
    """Quality gate: a small transformer-encoder ASR model must overfit
    the synthetic set to the same CER bar as the RNN flagship."""
    from avsr_tpu.avsr import AVSR
    from tests.test_train_loop import overfit_config, synth

    data = synth()
    cfg = overfit_config("audio", str(tmp_path), epochs=45)
    cfg = dataclasses.replace(
        cfg,
        audio_encoder=EncoderConfig(
            hidden_units=(48, 48), encoder_type="transformer", num_heads=4,
            dropout_rate=0.0,
        ),
        train=dataclasses.replace(cfg.train, learning_rate=2e-3),
    )
    avsr = AVSR(config=cfg, run_dir=str(tmp_path / "runxf"),
                train_utterances=data, eval_utterances=data)
    avsr.train(num_epochs=cfg.train.num_epochs)
    summary = avsr.evaluate(use_beam=True)
    assert summary["cer"] < 0.35, summary
