"""Integration: overfit synthetic data to ~0 CER, checkpoint/resume
bit-exactness (SURVEY.md §4.4)."""

import os

import jax
import numpy as np
import pytest

from avsr_tpu.avsr import AVSR
from avsr_tpu.configs import (
    AudioFrontendConfig,
    DataConfig,
    DecodeConfig,
    DecoderConfig,
    EncoderConfig,
    ExperimentConfig,
    FusionConfig,
    TrainConfig,
    VideoFrontendConfig,
)
from avsr_tpu.data.synthetic import SyntheticSpec, generate


def overfit_config(arch: str, tmp: str, epochs: int = 45) -> ExperimentConfig:
    return ExperimentConfig(
        architecture=arch,
        audio=AudioFrontendConfig(
            num_mel_bins=12, fft_length=256, frame_stacking=3,
            frame_skipping=3, add_deltas=False,
        ),
        video=VideoFrontendConfig(
            roi_height=20, roi_width=20, conv_channels=(4, 8), embedding_dim=24
        ),
        audio_encoder=EncoderConfig(hidden_units=(48,), bidirectional=True,
                                    dropout_rate=0.0),
        video_encoder=EncoderConfig(hidden_units=(32,), bidirectional=True,
                                    dropout_rate=0.0),
        fusion=FusionConfig(attention_units=24),
        decoder=DecoderConfig(embedding_dim=16, hidden_units=(48,),
                              attention_units=24, max_label_length=8,
                              dropout_rate=0.0),
        data=DataConfig(batch_size=8, audio_bucket_boundaries=(80,),
                        max_label_length=8, video_fps=25.0),
        train=TrainConfig(learning_rate=5e-3, num_epochs=epochs,
                          compute_dtype="float32", log_every_steps=10,
                          keep_checkpoints=2, eval_every_epochs=15),
        decode=DecodeConfig(beam_width=4, max_decode_length=8),
        name=f"overfit_{arch}",
    )


def synth(n=16, seed=0):
    # roi must match overfit_config's VideoFrontendConfig (20x20 crops)
    return generate(SyntheticSpec(
        num_utterances=n, min_chars=2, max_chars=4, seed=seed,
        alphabet="abcd", char_duration_s=0.1, roi=20,
    ))


@pytest.fixture(scope="module")
def data():
    return synth()


def test_overfit_audio_and_resume(tmp_path, data):
    cfg = overfit_config("audio", str(tmp_path))
    avsr = AVSR(config=cfg, run_dir=str(tmp_path / "run"),
                train_utterances=data, eval_utterances=data)
    avsr.train(num_epochs=cfg.train.num_epochs)
    summary = avsr.evaluate(use_beam=True)
    assert summary["cer"] < 0.15, summary

    # ---- resume: a fresh AVSR restoring the latest checkpoint must produce
    # identical params (bit-exact continuation, SURVEY §4.4).
    trained = avsr.trainer.state.params
    avsr2 = AVSR(config=cfg, run_dir=str(tmp_path / "run"),
                 train_utterances=data, eval_utterances=data)
    assert avsr2.trainer.try_restore_latest_checkpoint()
    restored = avsr2.trainer.state.params
    flat1 = jax.tree_util.tree_leaves(trained)
    flat2 = jax.tree_util.tree_leaves(restored)
    for a, b in zip(flat1, flat2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored step carries on
    assert int(avsr2.trainer.state.step) == int(avsr.trainer.state.step)


def test_overfit_av_align_with_au_loss_and_noise(tmp_path, data):
    """AV-Align + AU auxiliary loss + on-device noise mixing, end to end
    [BASELINE.json:configs[2..3]]."""
    from avsr_tpu.configs import NoiseConfig
    from avsr_tpu.data.synthetic import make_noise_bank

    cfg = overfit_config("av_align", str(tmp_path), epochs=30)
    cfg = cfg.replace(
        fusion=cfg.fusion.__class__(
            attention_units=24, au_loss_weight=0.5, au_dim=2
        ),
        noise=NoiseConfig(enabled=True, snr_db=(20.0,), clean_probability=0.5),
    )
    bank = make_noise_bank(num_rows=2, row_samples=40_000)
    avsr = AVSR(config=cfg, run_dir=str(tmp_path / "runav"),
                train_utterances=data, eval_utterances=data,
                noise_bank=bank)
    # loader must be emitting AU targets for the AU loss path
    _, b0 = next(iter(avsr.train_loader.epoch()))
    assert "au_targets" in b0 and b0["au_targets"].ndim == 3
    # real rows carry AU-loss weight 1; repeated padding rows weigh 0
    assert "au_row_weights" in b0
    nr = b0["num_real"]
    assert np.all(b0["au_row_weights"][:nr] == 1.0)
    assert np.all(b0["au_row_weights"][nr:] == 0.0)
    avsr.train(num_epochs=cfg.train.num_epochs)
    summary = avsr.evaluate(use_beam=True)
    assert summary["cer"] < 0.35, summary


def test_evaluate_noise_matrix(tmp_path, data):
    """Per-SNR evaluation matrix: conditions produce distinct decodes and a
    result per condition (reference per-condition eval, SURVEY §1 item 4)."""
    from avsr_tpu.data.synthetic import make_noise_bank

    cfg = overfit_config("audio", str(tmp_path), epochs=1)
    bank = make_noise_bank(num_rows=2, row_samples=40_000)
    avsr = AVSR(config=cfg, run_dir=str(tmp_path / "runm"),
                train_utterances=data, eval_utterances=data,
                noise_bank=bank)
    results = avsr.trainer.evaluate_noise_matrix(
        (None, 0.0), use_beam=False
    )
    assert set(results) == {"clean", "0dB"}
    for v in results.values():
        # untrained model: only require well-formed, bounded error rates
        # (hyp length <= max_decode_length => CER <= L_hyp/L_ref_min)
        assert 0.0 <= v["cer"] <= 8.0
    # the noisy condition must actually mix noise even though TRAINING
    # mixing is disabled in this config: decodes should differ from clean
    import os

    preds = {}
    for f in os.listdir(avsr.trainer.run_dir):
        if f.startswith("predictions"):
            preds[f] = open(os.path.join(avsr.trainer.run_dir, f)).read()
    # both condition runs wrote the same filename; instead compare via a
    # direct decode pass
    from avsr_tpu.data.loader import to_model_batch
    import dataclasses
    import numpy as np

    _, np_batch = next(iter(avsr.eval_loader.epoch(shuffle=False)))
    batch = to_model_batch(np_batch)
    ids_by_cond = {}
    for snr in (None, 0.0):
        avsr.trainer.cfg = dataclasses.replace(
            cfg, noise=dataclasses.replace(cfg.noise, eval_snr_db=snr)
        )
        fn = avsr.trainer._make_decode_fn(use_beam=False)
        ids_by_cond[snr] = np.asarray(fn(avsr.trainer.state.params, batch))
    avsr.trainer.cfg = cfg
    assert not np.array_equal(ids_by_cond[None], ids_by_cond[0.0]), (
        "0 dB eval decoded identically to clean: eval mixing not applied"
    )


def test_overfit_bimodal(tmp_path, data):
    """Bimodal-decoder baseline end to end: the decoder attends over audio
    AND video memories with one attention mechanism each (upstream
    decoder_bimodal.py, SURVEY §2.2 row 6) [BASELINE.json:configs]."""
    cfg = overfit_config("bimodal", str(tmp_path), epochs=30)
    avsr = AVSR(config=cfg, run_dir=str(tmp_path / "runbm"),
                train_utterances=data, eval_utterances=data)
    # two attention memories reach the decoder
    from avsr_tpu.models import seq2seq
    assert len(seq2seq.memory_dims_of(cfg)) == 2
    avsr.train(num_epochs=cfg.train.num_epochs)
    summary = avsr.evaluate(use_beam=True)
    assert summary["cer"] < 0.35, summary


def test_overfit_video(tmp_path, data):
    cfg = overfit_config("video", str(tmp_path), epochs=16)
    avsr = AVSR(config=cfg, run_dir=str(tmp_path / "runv"),
                train_utterances=data, eval_utterances=data)
    avsr.train(num_epochs=cfg.train.num_epochs)
    summary = avsr.evaluate(use_beam=False)
    # visual-only is harder; require clear learning, not perfection
    assert summary["cer"] < 0.5, summary


def test_midepoch_resume_bit_exact(tmp_path, data):
    """Data-iterator state is checkpointed (SURVEY §5.4): restoring a
    MID-epoch checkpoint and finishing training produces params bit-exactly
    identical to the uninterrupted run (same shuffle order, same remaining
    batches, same per-step rng folds)."""
    import dataclasses
    import shutil

    cfg = overfit_config("audio", str(tmp_path))
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, num_epochs=2, save_every_steps=1,
            keep_checkpoints=10, eval_every_epochs=100,
        ),
    )
    run_a = str(tmp_path / "runA")
    a = AVSR(config=cfg, run_dir=run_a, train_utterances=data,
             eval_utterances=data)
    a.train(num_epochs=2)  # 16 utts / batch 8 = 2 batches/epoch -> 4 steps
    p_full = a.trainer.state.params
    assert int(a.trainer.state.step) == 4

    # resume from step 3 = epoch 1 in progress, 1 batch consumed
    run_b = str(tmp_path / "runB")
    shutil.copytree(os.path.join(run_a, cfg.train.checkpoint_dir),
                    os.path.join(run_b, cfg.train.checkpoint_dir))
    b = AVSR(config=cfg, run_dir=run_b, train_utterances=data,
             eval_utterances=data)
    restored = b.trainer.restore_checkpoint(step=3)
    assert restored == 3
    assert b.trainer.epoch == 1
    assert b.trainer._resume_batches == 1
    b.train(num_epochs=2)  # exactly one remaining batch
    assert int(b.trainer.state.step) == 4
    for x, y in zip(jax.tree_util.tree_leaves(p_full),
                    jax.tree_util.tree_leaves(b.trainer.state.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_warmup_compile_is_invisible_to_training(tmp_path, data):
    """Trainer.warmup() pre-compiles every bucket program on a throwaway
    state copy; training afterwards must be bit-identical to training
    without warmup."""
    import dataclasses

    cfg = overfit_config("av_align", str(tmp_path))
    cfg = dataclasses.replace(
        cfg,
        fusion=dataclasses.replace(cfg.fusion, au_loss_weight=1.0),
        train=dataclasses.replace(cfg.train, num_epochs=1,
                                  eval_every_epochs=100),
    )
    a = AVSR(config=cfg, run_dir=str(tmp_path / "a"), train_utterances=data,
             eval_utterances=data)
    n = a.trainer.warmup()
    assert n == len(a.trainer.train_loader.bucket_shapes())
    a.train(num_epochs=1)

    b = AVSR(config=cfg, run_dir=str(tmp_path / "b"), train_utterances=data,
             eval_utterances=data)
    b.train(num_epochs=1)

    for x, y in zip(jax.tree_util.tree_leaves(a.trainer.state.params),
                    jax.tree_util.tree_leaves(b.trainer.state.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_noise_matrix_shares_programs_across_snrs(tmp_path, data):
    """The eval SNR is a runtime scalar: a full (type x SNR) matrix must
    compile one program per noise TYPE plus one clean program — not one
    per condition — and distinct SNRs must still produce distinct
    decodes through the SHARED program."""
    from avsr_tpu.data.synthetic import make_noise_bank

    cfg = overfit_config("audio", str(tmp_path), epochs=1)
    bank = {
        "babble": make_noise_bank(num_rows=2, row_samples=40_000, seed=1),
        "cafe": make_noise_bank(num_rows=2, row_samples=40_000, seed=2),
    }
    avsr = AVSR(config=cfg, run_dir=str(tmp_path / "runp"),
                train_utterances=data, eval_utterances=data,
                noise_bank=bank)
    results = avsr.trainer.evaluate_noise_matrix(
        (None, 10.0, 0.0, -5.0), use_beam=False
    )
    assert set(results) == {
        "clean", "babble_10dB", "babble_0dB", "babble_-5dB",
        "cafe_10dB", "cafe_0dB", "cafe_-5dB",
    }
    eval_keys = [k for k in avsr.trainer._decode_cache if k[0] == "eval"]
    assert len(eval_keys) == 3, eval_keys  # clean + babble + cafe


def test_runtime_snr_changes_decode_through_shared_program(tmp_path, data):
    import dataclasses

    import jax.numpy as jnp

    from avsr_tpu.data.loader import to_model_batch
    from avsr_tpu.data.synthetic import make_noise_bank

    cfg = overfit_config("audio", str(tmp_path), epochs=1)
    avsr = AVSR(config=cfg, run_dir=str(tmp_path / "runq"),
                train_utterances=data, eval_utterances=data,
                noise_bank=make_noise_bank(num_rows=2, row_samples=40_000))
    avsr.trainer.cfg = dataclasses.replace(
        cfg, noise=dataclasses.replace(cfg.noise, eval_snr_db=0.0)
    )
    fn = avsr.trainer._make_eval_decode_fn(False)
    _, np_batch = next(iter(avsr.eval_loader.epoch(shuffle=False)))
    batch = to_model_batch(np_batch)
    p = avsr.trainer.state.params
    ids_hi, _ = fn(p, batch, jnp.float32(20.0))
    ids_lo, _ = fn(p, batch, jnp.float32(-5.0))
    avsr.trainer.cfg = cfg
    assert not np.array_equal(np.asarray(ids_hi), np.asarray(ids_lo)), (
        "-5 dB and 20 dB decoded identically through the shared program: "
        "the runtime SNR scalar is not reaching the mixer"
    )


def test_eval_scores_against_untruncated_references(tmp_path, data):
    """An aggressive label_bucket_caps must NOT shorten the scoring
    reference: the predictions file carries the full transcript and CER is
    computed against it (VERDICT round-2 weak #1 / next #1)."""
    import dataclasses

    cfg = overfit_config("audio", str(tmp_path), epochs=1)
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, label_bucket_caps=(3,))
    )
    avsr = AVSR(config=cfg, run_dir=str(tmp_path / "runrefs"),
                train_utterances=data, eval_utterances=data)
    avsr.train(num_epochs=1)
    summary = avsr.evaluate(use_beam=False)
    # data has transcripts of 2-4 chars; with cap 3 (incl. EOS) some targets
    # truncate to 2 units, but references must stay whole.
    by_uid = {u.uid: u.transcript for u in data}
    pred_files = [f for f in os.listdir(avsr.trainer.run_dir)
                  if f.startswith("predictions")]
    assert pred_files
    refs = {}
    with open(os.path.join(avsr.trainer.run_dir, pred_files[0])) as f:
        uid = None
        for line in f:
            if line.startswith("id:"):
                uid = line[3:].strip()
            elif line.startswith("ref:") and uid is not None:
                refs[uid] = line[4:].strip()
    assert refs
    saw_truncatable = False
    for uid, ref in refs.items():
        assert ref == by_uid[uid], (uid, ref, by_uid[uid])
        if len(by_uid[uid]) + 1 > 3:
            saw_truncatable = True
    assert saw_truncatable, "no transcript exceeded the cap; test is vacuous"
    # sanity: the error accumulator used the same full references
    assert 0.0 <= summary["cer"] <= 8.0


def test_checkpoint_collision_with_previous_run_overwrites(tmp_path):
    """A fresh run saving into a directory holding a previous run's
    checkpoint at the same step must replace the stale tensors, not keep
    them under fresh metadata (advisor round-2 finding)."""
    import jax.numpy as jnp

    from avsr_tpu.train.checkpoint import CheckpointManager
    from avsr_tpu.train.step import TrainState

    d = str(tmp_path / "ckpt")

    def state(v):
        return TrainState(
            params={"w": np.full((3,), v, np.float32)},
            opt_state={"m": np.zeros((3,), np.float32)},
            step=jnp.asarray(1, jnp.int32),
        )

    run1 = CheckpointManager(d, keep=3)
    run1.save(1, state(1.0), {"epoch": 0, "batches_done": 1})
    run1.close()

    run2 = CheckpointManager(d, keep=3)  # fresh run, same directory
    run2.save(1, state(2.0), {"epoch": 0, "batches_done": 1})
    restored, extra, step = run2.restore(state(0.0))
    assert step == 1
    np.testing.assert_array_equal(
        np.asarray(restored.params["w"]), np.full((3,), 2.0, np.float32)
    )
    # same-run metadata-only refresh still works (per-K meets epoch-end)
    run2.save(1, state(2.0), {"epoch": 1, "batches_done": 0})
    _, extra2, _ = run2.restore(state(0.0))
    assert extra2 == {"epoch": 1, "batches_done": 0}
    run2.close()


def test_overfit_av_align_with_value_projection(tmp_path, data):
    """Qualitative parity gate for memory_value_dim (VERDICT round-2 next
    #3): the value-projected AV-Align model must still overfit the
    synthetic set to low CER."""
    import dataclasses

    cfg = overfit_config("av_align", str(tmp_path), epochs=45)
    cfg = dataclasses.replace(
        cfg,
        fusion=dataclasses.replace(cfg.fusion, memory_value_dim=32),
        decoder=dataclasses.replace(cfg.decoder, memory_value_dim=48),
    )
    avsr = AVSR(config=cfg, run_dir=str(tmp_path / "runvp"),
                train_utterances=data, eval_utterances=data)
    avsr.train(num_epochs=cfg.train.num_epochs)
    summary = avsr.evaluate(use_beam=True)
    assert summary["cer"] < 0.35, summary


def test_graceful_stop_checkpoints_and_resumes_bit_exact(tmp_path, data):
    """request_stop() (the SIGTERM handler's action) checkpoints the exact
    iterator position mid-epoch and exits; resuming reproduces the
    uninterrupted run bit-exactly (SURVEY §5.3 graceful preemption)."""
    import dataclasses

    cfg = overfit_config("audio", str(tmp_path))
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, num_epochs=2, log_every_steps=1,
            keep_checkpoints=10, eval_every_epochs=100,
        ),
    )
    a = AVSR(config=cfg, run_dir=str(tmp_path / "gfull"),
             train_utterances=data, eval_utterances=data)
    a.train(num_epochs=2)  # 2 batches/epoch -> 4 steps
    p_full = a.trainer.state.params

    b = AVSR(config=cfg, run_dir=str(tmp_path / "gstop"),
             train_utterances=data, eval_utterances=data)
    orig_log = b.trainer.logger.log

    def stopping_log(kind, **kw):
        orig_log(kind, **kw)
        if kind == "train" and kw.get("step") == 3:  # mid-epoch 2
            b.trainer.request_stop()

    b.trainer.logger.log = stopping_log
    b.train(num_epochs=2)
    assert int(b.trainer.state.step) == 3  # stopped early
    b.trainer.logger.log = orig_log

    c = AVSR(config=cfg, run_dir=str(tmp_path / "gstop"),
             train_utterances=data, eval_utterances=data)
    assert c.trainer.try_restore_latest_checkpoint()
    assert c.trainer.epoch == 1 and c.trainer._resume_batches == 1
    c.train(num_epochs=2)
    assert int(c.trainer.state.step) == 4
    for x, y in zip(jax.tree_util.tree_leaves(p_full),
                    jax.tree_util.tree_leaves(c.trainer.state.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_checkpoint_averaging(tmp_path):
    """average_checkpoints: the saved averaged step holds the exact mean of
    the source checkpoints' params and is restorable/evaluable."""
    import jax
    import numpy as np

    from avsr_tpu.avsr import AVSR
    from avsr_tpu.data.synthetic import SyntheticSpec, generate

    data = generate(SyntheticSpec(num_utterances=8, seed=0, alphabet="ab"))
    av = AVSR(
        architecture="audio", encoder_units_per_layer=(16,),
        decoder_units_per_layer=(16,), embedding_size=8, batch_size=4,
        max_label_length=6, compute_dtype="float32",
        run_dir=str(tmp_path / "avg"), train_utterances=data,
        eval_utterances=data,
    )
    av.train(num_epochs=3)  # one checkpoint per epoch
    tr = av.trainer
    steps = tr.ckpt.all_steps()
    assert len(steps) >= 3
    s1, _, _ = tr.ckpt.restore(tr.state, step=steps[-2])
    s2, _, _ = tr.ckpt.restore(tr.state, step=steps[-1])

    new_step = tr.average_checkpoints(last_n=2)
    assert new_step == steps[-1] + 1
    got = jax.tree_util.tree_leaves(tr.state.params)
    want = jax.tree_util.tree_map(
        lambda a, b: (np.asarray(a, np.float64) + np.asarray(b)) / 2.0,
        s1.params, s2.params,
    )
    for g, w in zip(got, jax.tree_util.tree_leaves(want)):
        np.testing.assert_allclose(np.asarray(g), w.astype(np.float32),
                                   rtol=0, atol=1e-7)
    # the averaged step is a first-class checkpoint: restorable + evaluable
    restored, extra, step = tr.ckpt.restore(tr.state, step=new_step)
    assert step == new_step and extra.get("averaged_from") == steps[-2:]
    # the payload's on-device step must equal its label: rng folds and
    # on-device schedules derive from state.step after restore
    assert int(restored.step) == new_step
    metrics = av.evaluate(checkpoint=new_step)
    assert np.isfinite(metrics["loss"])
    # averaging OLDER steps must not collide with newer checkpoints on
    # disk: the new step always lands past the newest one
    newer = tr.average_checkpoints(steps=steps[:2])
    assert newer == new_step + 1
    assert new_step in tr.ckpt.all_steps()  # previous average untouched
