"""Public AVSR API parity tests: reference-style flat-kwargs constructor,
train/evaluate entry points, eval_step (SURVEY.md §3.5)."""

import jax
import numpy as np
import pytest

from avsr_tpu.avsr import AVSR
from avsr_tpu.data.synthetic import SyntheticSpec, generate


@pytest.fixture(scope="module")
def data():
    return generate(SyntheticSpec(num_utterances=8, min_chars=2, max_chars=3,
                                  seed=9, alphabet="ab", roi=20,
                                  char_duration_s=0.1))


def test_flat_kwargs_constructor_and_train(tmp_path, data):
    """The reference-style constructor surface: flat kwargs, train(),
    evaluate()."""
    avsr = AVSR(
        unit="character",
        architecture="audio",
        encoder_units_per_layer=(24,),
        decoder_units_per_layer=(24,),
        embedding_size=8,
        batch_size=4,
        learning_rate=3e-3,
        dropout_probability=0.0,
        sampling_probability=0.0,
        beam_width=2,
        max_label_length=6,
        compute_dtype="float32",
        num_epochs=2,
        run_dir=str(tmp_path / "r"),
        train_utterances=data,
        eval_utterances=data,
    )
    # bucket boundaries default to LRS2 scale; shrink via config surface
    assert avsr.config.architecture == "audio"
    assert avsr.config.decoder.hidden_units == (24,)
    assert avsr.config.decode.beam_width == 2
    metrics = avsr.train(num_epochs=1)
    summary = avsr.evaluate(use_beam=True)
    assert "cer" in summary and "wer" in summary


def test_eval_step_loss(tmp_path, data):
    from avsr_tpu.data.loader import to_model_batch
    from avsr_tpu.train import step as step_lib

    avsr = AVSR(
        architecture="audio", encoder_units_per_layer=(16,),
        decoder_units_per_layer=(16,), embedding_size=8, batch_size=4,
        max_label_length=6, compute_dtype="float32",
        run_dir=str(tmp_path / "r2"),
        train_utterances=data, eval_utterances=data,
    )
    es = step_lib.make_jitted_eval_step(avsr.config)
    _, np_batch = next(iter(avsr.eval_loader.epoch(shuffle=False)))
    m = es(avsr.trainer.state.params, to_model_batch(np_batch))
    assert np.isfinite(float(m["loss"]))


def test_predict_api(tmp_path, data):
    """AVSR.predict: raw utterances -> (uid, hypothesis) transcripts."""
    avsr = AVSR(
        architecture="audio", encoder_units_per_layer=(16,),
        decoder_units_per_layer=(16,), embedding_size=8, batch_size=4,
        max_label_length=6, compute_dtype="float32",
        run_dir=str(tmp_path / "rp"),
        train_utterances=data, eval_utterances=data,
    )
    avsr.train(num_epochs=1)  # predict refuses never-trained states
    out = avsr.predict(data[:5], use_beam=False)
    assert len(out) == 5
    uids = {u.uid for u in data[:5]}
    for uid, hyp in out:
        assert uid in uids
        assert isinstance(hyp, str)


def test_predict_n_best(tmp_path, data):
    """predict(n_best=N): ranked (hypothesis, score) alternatives; rank 0
    equals the top-1 beam hypothesis and scores are non-increasing."""
    avsr = AVSR(
        architecture="audio", encoder_units_per_layer=(16,),
        decoder_units_per_layer=(16,), embedding_size=8, batch_size=4,
        max_label_length=6, compute_dtype="float32",
        run_dir=str(tmp_path / "rnb"),
        train_utterances=data, eval_utterances=data,
    )
    avsr.train(num_epochs=1)
    top1 = dict(avsr.predict(data[:3], use_beam=True))
    out = avsr.predict(data[:3], use_beam=True, n_best=3)
    assert len(out) == 3
    for uid, alts in out:
        assert len(alts) == 3
        assert alts[0][0] == top1[uid]
        scores = [s for _, s in alts]
        assert scores == sorted(scores, reverse=True)
        assert all(isinstance(h, str) for h, _ in alts)
    with pytest.raises(ValueError, match="use_beam"):
        avsr.predict(data[:3], use_beam=False, n_best=2)


def test_evaluate_bogus_checkpoint_fails_loudly(tmp_path, data):
    """A wrong/unresolvable checkpoint path must raise, not silently
    evaluate the latest (or initial) model."""
    avsr = AVSR(
        architecture="audio", encoder_units_per_layer=(16,),
        decoder_units_per_layer=(16,), embedding_size=8, batch_size=4,
        max_label_length=6, compute_dtype="float32",
        run_dir=str(tmp_path / "rb"),
        train_utterances=data, eval_utterances=data,
    )
    with pytest.raises(ValueError, match="cannot resolve checkpoint"):
        avsr.evaluate(checkpoint="/nowhere/model.ckpt")
    with pytest.raises(FileNotFoundError, match="no checkpoint for step"):
        avsr.evaluate(checkpoint=123)
    avsr.train(num_epochs=1)
    step = avsr.trainer.ckpt.latest_step()
    with pytest.raises(ValueError, match="not under this run"):
        avsr.evaluate(checkpoint=f"/some/other/run/checkpoints/{step}")
    # a correct explicit step (int or in-run path) works
    summary = avsr.evaluate(checkpoint=step, use_beam=False)
    assert "cer" in summary


def test_noise_type_matrix(tmp_path, data):
    """Typed noise bank -> per-(type x SNR) eval conditions with separate
    error-rate files and per-condition eval loss (SURVEY.md §1 item 4)."""
    import os

    rng = np.random.default_rng(11)
    bank = {
        "babble": rng.standard_normal((1, 60_000)).astype(np.float32),
        "cafe": rng.uniform(-1, 1, (1, 60_000)).astype(np.float32),
    }
    avsr = AVSR(
        architecture="audio", encoder_units_per_layer=(16,),
        decoder_units_per_layer=(16,), embedding_size=8, batch_size=4,
        max_label_length=6, compute_dtype="float32",
        noise_snr_db=(0.0, 10.0),
        run_dir=str(tmp_path / "nm"),
        train_utterances=data, eval_utterances=data,
        noise_bank=bank,
    )
    assert avsr.trainer.noise_bank.names == ("babble", "cafe")
    # the matrix shares evaluate()'s restore policy: a never-trained
    # model raises rather than silently scoring random params
    with pytest.raises(RuntimeError, match="never-trained"):
        avsr.evaluate_noise_matrix(snrs=(None, 0.0), use_beam=False)
    avsr.train(num_epochs=1)
    results = avsr.evaluate_noise_matrix(snrs=(None, 0.0), use_beam=False)
    assert set(results) == {"clean", "babble_0dB", "cafe_0dB"}
    for tag, summary in results.items():
        assert np.isfinite(summary["loss"])  # eval loss is reported
        suffix = "final" if tag == "clean" else f"final_{tag}"
        assert os.path.exists(
            str(tmp_path / "nm" / f"error_rates_{suffix}.txt")
        ), tag
    # the two types are genuinely different eval conditions
    assert results["babble_0dB"]["loss"] != results["cafe_0dB"]["loss"]


def test_unit_type_switch(tmp_path, data):
    """Phoneme/viseme unit protocols build distinct vocabularies."""
    for unit, tok in (("phoneme", "aa b sil"), ("viseme", "A B sil")):
        avsr = AVSR(
            unit=unit, architecture="audio",
            encoder_units_per_layer=(16,), decoder_units_per_layer=(16,),
            embedding_size=8, batch_size=4, max_label_length=8,
            compute_dtype="float32", run_dir=str(tmp_path / unit),
            train_utterances=data, eval_utterances=data,
        )
        assert avsr.unit_dict.unit_type == unit
        assert avsr.unit_dict.decode(avsr.unit_dict.encode(tok)) == tok


def test_evaluate_never_trained_raises(tmp_path, data):
    """evaluate() with no checkpoint on disk and no training this session
    must fail loudly instead of silently scoring random params (VERDICT
    round-2 weak #4)."""
    avsr = AVSR(
        architecture="audio", encoder_units_per_layer=(16,),
        decoder_units_per_layer=(16,), embedding_size=8, batch_size=4,
        max_label_length=6, compute_dtype="float32",
        run_dir=str(tmp_path / "fresh"),
        train_utterances=data, eval_utterances=data,
    )
    with pytest.raises(RuntimeError, match="never-trained"):
        avsr.evaluate()


def test_noise_bank_records_config_route(tmp_path, data):
    """noise.bank_records ((type, path) pairs) builds a TYPED bank from
    config alone — the CLI/config-file route (no noise_bank kwarg)."""
    import dataclasses

    import numpy as np

    from avsr_tpu.data.synthetic import Utterance, make_noise_bank
    from avsr_tpu.data.tfrecord import write_dataset

    paths = {}
    for name, seed in (("babble", 1), ("cafe", 2)):
        bank = make_noise_bank(num_rows=2, row_samples=30_000, seed=seed)
        utts = [Utterance(uid=f"{name}{i}", transcript="", waveform=bank[i])
                for i in range(bank.shape[0])]
        paths[name] = str(tmp_path / f"{name}.tfrecord")
        write_dataset(utts, paths[name])

    avsr = AVSR(
        architecture="audio", encoder_units_per_layer=(16,),
        decoder_units_per_layer=(16,), embedding_size=8, batch_size=4,
        max_label_length=6, compute_dtype="float32",
        run_dir=str(tmp_path / "rbank"),
        train_utterances=data, eval_utterances=data,
    )
    assert avsr.trainer.noise_bank is None  # no records configured

    cfg = dataclasses.replace(
        avsr.config,
        noise=dataclasses.replace(
            avsr.config.noise,
            bank_records=(("babble", paths["babble"]),
                          ("cafe", paths["cafe"])),
        ),
    )
    avsr2 = AVSR(config=cfg, run_dir=str(tmp_path / "rbank2"),
                 train_utterances=data, eval_utterances=data)
    bank = avsr2.trainer.noise_bank
    assert bank is not None and bank.names == ("babble", "cafe")
    # rows concatenated into one [1, L] stream per type
    assert all(b.shape[0] == 1 and b.shape[1] >= 60_000 for b in bank.banks)
    # config stays hashable after a JSON round trip (jit cache keys)
    from avsr_tpu.configs import ExperimentConfig

    cfg_rt = ExperimentConfig.from_json(cfg.to_json())
    hash(cfg_rt)
    assert cfg_rt.noise.bank_records == cfg.noise.bank_records


def test_config_unknown_keys_fail_loudly():
    """A typo in a --config JSON file must raise, not silently train with
    the default value."""
    import pytest as _pytest

    from avsr_tpu.configs import ExperimentConfig

    with _pytest.raises(KeyError, match="learing_rate"):
        ExperimentConfig.from_json(
            '{"architecture": "audio", "train": {"learing_rate": 0.0003}}'
        )


def test_eval_only_avsr_and_matrix_restore(tmp_path, data):
    """Eval-only construction (no training data) works for evaluate/
    matrix, restores the latest checkpoint itself, and refuses train()."""
    import pytest as _pytest

    kw = dict(
        architecture="audio", encoder_units_per_layer=(16,),
        decoder_units_per_layer=(16,), embedding_size=8, batch_size=4,
        max_label_length=6, compute_dtype="float32",
        run_dir=str(tmp_path / "eo"),
    )
    AVSR(train_utterances=data, eval_utterances=data, **kw).train(
        num_epochs=1
    )
    # fresh eval-only process over the same run_dir
    av2 = AVSR(eval_utterances=data, **kw)
    with _pytest.raises(ValueError, match="eval-only"):
        av2.train(num_epochs=1)
    results = av2.evaluate_noise_matrix((None,), use_beam=False)
    assert av2.trainer._host_step > 0  # matrix restored the checkpoint
    assert "clean" in results


def test_explicit_zero_epochs_trains_nothing(tmp_path, data):
    avsr = AVSR(
        architecture="audio", encoder_units_per_layer=(16,),
        decoder_units_per_layer=(16,), embedding_size=8, batch_size=4,
        max_label_length=6, compute_dtype="float32",
        run_dir=str(tmp_path / "z"),
        train_utterances=data, eval_utterances=data,
    )
    avsr.train(num_epochs=0)
    assert avsr.trainer._host_step == 0


def test_predict_never_trained_raises_and_restores(tmp_path, data):
    """predict() on a never-trained state raises; with a checkpoint on
    disk it auto-restores the latest (same contract as evaluate)."""
    kw = dict(
        architecture="audio", encoder_units_per_layer=(16,),
        decoder_units_per_layer=(16,), embedding_size=8, batch_size=4,
        max_label_length=6, compute_dtype="float32",
        train_utterances=data, eval_utterances=data,
    )
    fresh = AVSR(run_dir=str(tmp_path / "pfresh"), **kw)
    with pytest.raises(RuntimeError, match="never-trained"):
        fresh.predict(data[:2], use_beam=False)

    trained = AVSR(run_dir=str(tmp_path / "ptrain"), **kw)
    trained.train(num_epochs=1)
    # a NEW session over the same run_dir: predict restores the checkpoint
    again = AVSR(run_dir=str(tmp_path / "ptrain"), **kw)
    out = again.predict(data[:2], use_beam=False)
    assert len(out) == 2
    assert again.trainer._host_step == int(trained.trainer.state.step)
    for x, y in zip(jax.tree_util.tree_leaves(trained.trainer.state.params),
                    jax.tree_util.tree_leaves(again.trainer.state.params)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
