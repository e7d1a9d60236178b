"""Transformer decoder option (DecoderConfig.decoder_type="transformer",
models/transformer_decoder.py — opt-in extension; reference parity is the
attention-LSTM decoder): validation, parallel-teacher-forcing ==
sequential-decode equivalence, beam exhaustive equivalence, end-to-end
training, the fully scan-free v2 overfit gate, FLOPs."""

import dataclasses
import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from avsr_tpu.configs import DecoderConfig, EncoderConfig
from avsr_tpu.data.units import EOS_ID, GO_ID, PAD_ID
from avsr_tpu.decode.beam import beam_search
from avsr_tpu.decode.greedy import greedy_decode
from avsr_tpu.models import decoder as dec
from avsr_tpu.models import seq2seq
from avsr_tpu.ops import attention as attn
from tests.test_seq2seq import VOCAB, tiny_batch, tiny_config

V = 5
MAXLEN = 3
TCFG = DecoderConfig(embedding_dim=4, hidden_units=(8, 8), attention_units=4,
                     max_label_length=MAXLEN, decoder_type="transformer",
                     num_heads=2, dropout_rate=0.0)


def _mem(params, cfg, seed=0, B=2, S=3, H=6):
    rng = np.random.default_rng(seed)
    memory = jnp.asarray(rng.standard_normal((B, S, H)).astype(np.float32))
    lengths = jnp.asarray([S, S - 1], jnp.int32)
    # Transformer-decoder memories are value-only (seq2seq.prep routes
    # "value_only" for this family; no Bahdanau score params exist).
    return attn.prepare_memory(
        "value_only", params["atts"][0], memory, lengths,
        compute_dtype=jnp.float32,
    )


def test_validation():
    with pytest.raises(ValueError, match="hidden_units equal"):
        dec.decoder_init(jax.random.PRNGKey(0),
                         dataclasses.replace(TCFG, hidden_units=(8, 16)),
                         [6], V)
    with pytest.raises(ValueError, match="num_heads"):
        dec.decoder_init(jax.random.PRNGKey(0),
                         dataclasses.replace(TCFG, hidden_units=(9, 9)),
                         [6], V)
    with pytest.raises(ValueError, match="memory dim"):
        dec.decoder_init(jax.random.PRNGKey(0), TCFG, [7], V)
    with pytest.raises(ValueError, match="scheduled sampling"):
        dec.decoder_init(
            jax.random.PRNGKey(0),
            dataclasses.replace(TCFG, sampling_probability=0.1), [6], V,
        )
    with pytest.raises(ValueError, match="decoder_type"):
        dec.decoder_init(
            jax.random.PRNGKey(0),
            dataclasses.replace(TCFG, decoder_type="ngram"), [6], V,
        )


def test_atts_params_are_value_only():
    """No dead Bahdanau/Luong score params in transformer-decoder
    checkpoints: atts carry only the optional value down-projection."""
    p = dec.decoder_init(jax.random.PRNGKey(0), TCFG, [6], V)
    assert p["atts"] == [{}]
    p = dec.decoder_init(
        jax.random.PRNGKey(0),
        dataclasses.replace(TCFG, memory_value_dim=4), [6], V,
    )
    assert list(p["atts"][0]) == ["wv"]
    assert p["atts"][0]["wv"].shape == (6, 4)


def test_parallel_teacher_forcing_equals_sequential_decode():
    """The parallel causal pass and the KV-cache decode_step must produce
    the same logits position-for-position when fed the same tokens — the
    train/decode-consistency invariant the RNN family gets for free from
    sharing decoder_step."""
    params = dec.decoder_init(jax.random.PRNGKey(1), TCFG, [6], V)
    mem = _mem(params, TCFG)
    B, K = 2, MAXLEN
    targets = jnp.asarray([[3, 4, 2], [4, 2, 0]], jnp.int32)
    par = dec.teacher_forced_logits(
        params, TCFG, targets, jnp.asarray([3, 2], jnp.int32), [mem],
        compute_dtype=jnp.float32,
    )
    state = dec.initial_state(TCFG, B, [6], max_length=K)
    tok = jnp.full((B,), GO_ID, jnp.int32)
    go_shifted = jnp.concatenate(
        [jnp.full((B, 1), GO_ID, jnp.int32), targets[:, :-1]], axis=1
    )
    seq_logits = []
    for k in range(K):
        state, logits = dec.decoder_step(
            params, TCFG, go_shifted[:, k], state, [mem],
            compute_dtype=jnp.float32,
        )
        seq_logits.append(np.asarray(logits))
    np.testing.assert_allclose(
        np.asarray(par), np.stack(seq_logits, axis=1), rtol=1e-4, atol=1e-4
    )


def test_kv_caches_adopt_compute_dtype():
    """Perf invariant (RESULTS.md round 4): KV caches store the compute
    dtype — fp32 caches of bf16-computed k/v doubled decode cache
    traffic and paid a full-cache cast per step (937.9 -> 556.3 ms on
    the B=128 full-horizon eval).  Also pins the decode_step contract:
    writes land at the shared position and stay in the cache's dtype."""
    import avsr_tpu.models.transformer_decoder as tdec

    for cdt in (jnp.float32, jnp.bfloat16):
        state = dec.initial_state(TCFG, 2, [6], max_length=MAXLEN,
                                  compute_dtype=cdt)
        assert all(k.dtype == cdt and v.dtype == cdt
                   for k, v in state.caches)
        params = dec.decoder_init(jax.random.PRNGKey(1), TCFG, [6], V)
        mem = _mem(params, TCFG)
        state, _ = tdec.decode_step(
            params, TCFG, jnp.full((2,), GO_ID, jnp.int32), state, [mem],
            compute_dtype=cdt,
        )
        assert all(k.dtype == cdt and v.dtype == cdt
                   for k, v in state.caches)
        # position 0 written, later positions still zero
        assert np.any(np.asarray(state.caches[0][0][:, 0], np.float32))
        assert not np.any(np.asarray(state.caches[0][0][:, 1:], np.float32))


def test_beam_equals_exhaustive_with_transformer_decoder():
    """Same exhaustive toy-vocabulary bar as the RNN beam test."""
    from tests.test_beam import exhaustive_best

    params = dec.decoder_init(jax.random.PRNGKey(2), TCFG, [6], V)
    mem = _mem(params, TCFG, seed=3, B=2, S=3, H=6)
    res = beam_search(
        params, TCFG, [mem], MAXLEN, beam_width=16, length_penalty=0.0,
        compute_dtype=jnp.float32,
    )
    for b in range(2):
        ref_seq, ref_score = exhaustive_best(params, mem, b, cfg=TCFG)
        got = [int(x) for x in np.asarray(res.ids[b]) if x != PAD_ID]
        assert got == ref_seq, f"row {b}: beam {got} != exhaustive {ref_seq}"
        np.testing.assert_allclose(float(res.scores[b]), ref_score,
                                   rtol=1e-4)


def test_greedy_decode_runs():
    params = dec.decoder_init(jax.random.PRNGKey(4), TCFG, [6], V)
    mem = _mem(params, TCFG, seed=5)
    ids, lengths = greedy_decode(params, TCFG, [mem], 4,
                                 compute_dtype=jnp.float32)
    assert ids.shape == (2, 4)
    assert np.all(np.asarray(lengths) >= 1)
    # PAD after EOS
    arr = np.asarray(ids)
    for b in range(2):
        eos = np.where(arr[b] == EOS_ID)[0]
        if eos.size:
            assert np.all(arr[b, eos[0] + 1:] == PAD_ID)


@pytest.mark.parametrize("arch", ["audio", "bimodal"])
def test_end_to_end_loss_and_grads(arch):
    cfg = tiny_config(arch)
    cfg = cfg.replace(
        decoder=DecoderConfig(
            embedding_dim=8, hidden_units=(16,), attention_units=8,
            max_label_length=6, dropout_rate=0.1,
            decoder_type="transformer", num_heads=4,
        )
    )
    params = seq2seq.model_init(jax.random.PRNGKey(5), cfg, VOCAB)
    batch = tiny_batch(arch, np.random.default_rng(6))
    loss, grads = jax.jit(
        jax.value_and_grad(
            lambda p, b: seq2seq.loss_fn(p, cfg, b, train=True,
                                         rng=jax.random.PRNGKey(0))[0]
        )
    )(params, batch)
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)
    for layer in grads["decoder"]["layers"]:
        assert float(jnp.abs(layer["wq"]).max()) > 0.0
        assert float(jnp.abs(layer["cq"]).max()) > 0.0


def test_flops_accounting():
    from avsr_tpu.utils.flops import train_step_flops

    base = tiny_config("audio")
    xf = base.replace(
        decoder=DecoderConfig(
            embedding_dim=8, hidden_units=(16,), attention_units=8,
            max_label_length=6, decoder_type="transformer", num_heads=4,
        )
    )
    kw = dict(batch=8, audio_samples=16000, video_frames=25, label_len=20,
              vocab=30)
    f = train_step_flops(xf, **kw)
    assert f["decoder"] > 0 and f["total"] > f["decoder"]


def test_overfit_v2_fully_scanfree(tmp_path):
    """Quality gate for the assembled v2 family: transformer encoders +
    cross-attention fusion + transformer decoder (a completely scan-free
    train step) must overfit the synthetic set to the flagship CER bar
    through beam decode."""
    from avsr_tpu.avsr import AVSR
    from tests.test_train_loop import overfit_config, synth

    data = synth()
    cfg = overfit_config("av_align", str(tmp_path), epochs=45)
    cfg = dataclasses.replace(
        cfg,
        audio_encoder=EncoderConfig(
            hidden_units=(48, 48), encoder_type="transformer", num_heads=4,
            dropout_rate=0.0,
        ),
        video_encoder=EncoderConfig(
            hidden_units=(32,), encoder_type="transformer", num_heads=4,
            dropout_rate=0.0,
        ),
        fusion=dataclasses.replace(cfg.fusion, fusion_type="cross_attention",
                                   num_heads=2, attention_units=12),
        decoder=DecoderConfig(
            embedding_dim=16, hidden_units=(48,), attention_units=12,
            max_label_length=8, dropout_rate=0.0,
            decoder_type="transformer", num_heads=4,
        ),
        train=dataclasses.replace(cfg.train, learning_rate=2e-3),
    )
    avsr = AVSR(config=cfg, run_dir=str(tmp_path / "runv2"),
                train_utterances=data, eval_utterances=data)
    avsr.train(num_epochs=cfg.train.num_epochs)
    summary = avsr.evaluate(use_beam=True)
    assert summary["cer"] < 0.35, summary
