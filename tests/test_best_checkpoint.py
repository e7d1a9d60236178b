"""Best-checkpoint tracking + early stopping (train.early_stop_patience).

Contracts:
- every in-train eval that improves CER rewrites run_dir/best.json and pins
  that step against keep-N pruning (the best model survives long runs);
- `evaluate(checkpoint="best")` restores exactly that step;
- patience stops training after N non-improving evals;
- a resumed Trainer picks the tracker up from best.json.
"""

import json
import os

import numpy as np
import pytest

from avsr_tpu.avsr import AVSR
from avsr_tpu.data.synthetic import SyntheticSpec, generate


def _make(tmp_path, **over):
    data = generate(SyntheticSpec(num_utterances=4, seed=0, alphabet="ab"))
    return AVSR(
        architecture="audio", encoder_units_per_layer=(16,),
        decoder_units_per_layer=(16,), embedding_size=8, batch_size=4,
        max_label_length=6, compute_dtype="float32",
        run_dir=str(tmp_path / "run"), train_utterances=data,
        eval_utterances=data, **over,
    )


def _script_evals(trainer, cers):
    """Replace the real (slow) eval with a scripted CER sequence; training
    checkpoints still happen for real."""
    it = iter(cers)

    def fake_evaluate(*, epoch=None, use_beam=True, loader=None):
        return {"cer": next(it), "wer": 1.0, "num_utterances": 4}

    trainer.evaluate = fake_evaluate


def test_best_json_tracks_minimum_and_pins_step(tmp_path):
    import dataclasses

    base = _make(tmp_path)
    cfg = dataclasses.replace(
        base.config,
        train=dataclasses.replace(base.config.train, keep_checkpoints=1),
    )
    data = generate(SyntheticSpec(num_utterances=4, seed=0, alphabet="ab"))
    av = AVSR(config=cfg, run_dir=str(tmp_path / "keep1"),
              train_utterances=data, eval_utterances=data)
    _script_evals(av.trainer, [0.5, 0.3, 0.6, 0.4])
    av.train(num_epochs=4)
    best_path = os.path.join(av.trainer.run_dir, "best.json")
    with open(best_path) as f:
        best = json.load(f)
    assert best["cer"] == 0.3 and best["epoch"] == 2
    # keep_checkpoints=1 would normally leave only the newest step; the
    # pin must keep the best step alive too.
    steps = av.trainer.ckpt.all_steps()
    assert best["step"] in steps
    assert best["step"] != max(steps)


def test_early_stop_patience(tmp_path):
    av = _make(tmp_path)
    import dataclasses
    av.config = dataclasses.replace(
        av.config, train=dataclasses.replace(av.config.train,
                                             early_stop_patience=2),
    )
    av.trainer.cfg = av.config
    _script_evals(av.trainer, [0.5, 0.4, 0.6, 0.6, 0.6, 0.6])
    av.train(num_epochs=6)
    # best at epoch 2, two non-improving evals after -> stop at epoch 4
    assert av.trainer.epoch == 4
    with open(os.path.join(av.trainer.run_dir, "best.json")) as f:
        assert json.load(f)["epoch"] == 2


def test_evaluate_checkpoint_best_restores_that_step(tmp_path):
    av = _make(tmp_path)
    _script_evals(av.trainer, [0.5, 0.2, 0.6])
    av.train(num_epochs=3)
    with open(os.path.join(av.trainer.run_dir, "best.json")) as f:
        best_step = json.load(f)["step"]
    assert av._resolve_checkpoint_step("best") == best_step
    # full restore-and-evaluate through the public API (real eval now:
    # deleting the instance attr restores the class method)
    del av.trainer.evaluate
    metrics = av.evaluate(checkpoint="best")
    assert np.isfinite(metrics["loss"])
    assert int(av.trainer.state.step) == best_step


def test_best_without_file_fails_loudly(tmp_path):
    av = _make(tmp_path)
    with pytest.raises(FileNotFoundError, match="best.json"):
        av._resolve_checkpoint_step("best")


def test_patience_counter_survives_resume(tmp_path):
    """The early-stop window must not reset on preemption: best.json
    carries evals_since_best, and a resumed Trainer restores it."""
    av = _make(tmp_path)
    _script_evals(av.trainer, [0.3, 0.5])  # improve, then plateau
    av.train(num_epochs=2)
    assert av.trainer._evals_since_best == 1
    with open(os.path.join(av.trainer.run_dir, "best.json")) as f:
        assert json.load(f)["evals_since_best"] == 1
    data = generate(SyntheticSpec(num_utterances=4, seed=0, alphabet="ab"))
    av2 = AVSR(
        architecture="audio", encoder_units_per_layer=(16,),
        decoder_units_per_layer=(16,), embedding_size=8, batch_size=4,
        max_label_length=6, compute_dtype="float32",
        run_dir=str(tmp_path / "run"), train_utterances=data,
        eval_utterances=data,
    )
    assert av2.trainer._evals_since_best == 1


def test_resume_reloads_best_tracker(tmp_path):
    av = _make(tmp_path)
    _script_evals(av.trainer, [0.5, 0.3])
    av.train(num_epochs=2)
    # a fresh AVSR over the same run_dir resumes the tracker state
    data = generate(SyntheticSpec(num_utterances=4, seed=0, alphabet="ab"))
    av2 = AVSR(
        architecture="audio", encoder_units_per_layer=(16,),
        decoder_units_per_layer=(16,), embedding_size=8, batch_size=4,
        max_label_length=6, compute_dtype="float32",
        run_dir=str(tmp_path / "run"), train_utterances=data,
        eval_utterances=data,
    )
    assert av2.trainer._best_cer == 0.3
    with open(os.path.join(av2.trainer.run_dir, "best.json")) as f:
        assert json.load(f)["step"] in av2.trainer.ckpt._preserved
