"""TensorBoard event files written without TF (avsr_tpu/utils/tensorboard.py,
SURVEY §5.5 "optional TensorBoard"): wire-format golden bytes, round-trip
through our reader, interop with the REAL tensorboard package's loader, and
the MetricsLogger mirror (train.tensorboard knob)."""

import glob
import os

import numpy as np
import pytest

from avsr_tpu.utils.tensorboard import (
    EventWriter,
    _encode_event,
    _encode_summary_value,
    read_events,
)


def test_event_wire_format_golden_bytes():
    """Pin the exact proto wire encoding of a known Event: wall_time=1.5
    (double, field 1), step=3 (varint, field 2), one Summary.Value
    {tag="a", simple_value=2.0} (field 5)."""
    ev = _encode_event(1.5, step=3,
                       summary_values=[_encode_summary_value("a", 2.0)])
    expected = bytes.fromhex(
        "09" + "000000000000f83f"      # field 1, double 1.5 LE
        + "10" + "03"                  # field 2, varint 3
        + "2a" + "0a"                  # field 5, len 10
        + "0a" + "08"                  #   Summary.value, len 8
        + "0a" + "01" + "61"           #     tag "a"
        + "15" + "00000040"            #     simple_value 2.0f LE
    )
    assert ev == expected


def test_writer_roundtrip_and_file_version(tmp_path):
    w = EventWriter(str(tmp_path))
    w.add_scalar("loss", 3.25, step=1, wall_time=10.0)
    w.add_scalars({"cer": 0.5, "wer": 1.0}, step=2, wall_time=11.0)
    w.close()
    events = read_events(w.path)
    assert len(events) == 3
    assert events[0][2] == {}  # file_version header event
    assert events[1] == (10.0, 1, {"loss": 3.25})
    assert events[2][0:2] == (11.0, 2)
    assert events[2][2] == {"cer": 0.5, "wer": 1.0}
    assert os.path.basename(w.path).startswith("events.out.tfevents.")


def test_real_tensorboard_loader_reads_our_files(tmp_path):
    """Interop: the stock tensorboard package (not our code) must parse the
    file, see the brain.Event:2 version header, and recover every scalar."""
    tb = pytest.importorskip("tensorboard.backend.event_processing.event_file_loader")
    w = EventWriter(str(tmp_path))
    w.add_scalar("train/loss", 3.25, step=7, wall_time=42.0)
    w.add_scalars({"eval/cer": 0.125, "eval/wer": 0.5}, step=9)
    w.close()
    loaded = list(tb.LegacyEventFileLoader(w.path).Load())
    assert loaded[0].file_version == "brain.Event:2"
    assert loaded[1].step == 7 and loaded[1].wall_time == 42.0
    vals1 = {v.tag: v.simple_value for v in loaded[1].summary.value}
    assert vals1 == {"train/loss": 3.25}
    assert loaded[2].step == 9
    vals2 = {v.tag: v.simple_value for v in loaded[2].summary.value}
    assert vals2 == {"eval/cer": 0.125, "eval/wer": 0.5}


def test_metrics_logger_mirror(tmp_path):
    """MetricsLogger(tensorboard=True) mirrors numeric JSONL fields as
    {kind}/{field} scalars; eval_noise conditions become their own tag
    namespace; records without a step inherit the last step seen."""
    from avsr_tpu.utils.logging import MetricsLogger

    logger = MetricsLogger(str(tmp_path), tensorboard=True)
    logger.log("train", step=5, epoch=0, loss=2.5, lr=1e-3, bucket=0)
    logger.log("eval", epoch=-1, cer=0.25, wer=0.75,
               condition="clean")  # no usable step -> inherits 5
    logger.log("eval_noise", condition="babble_10", cer=0.5, wer=1.0)
    logger.close()
    files = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    assert len(files) == 1
    events = read_events(files[0])
    assert len(events) == 4  # header + 3
    _, step1, s1 = events[1]
    assert step1 == 5
    np.testing.assert_allclose(s1["train/loss"], 2.5)
    assert "train/lr" in s1 and "train/bucket" in s1
    _, step2, s2 = events[2]
    assert step2 == 5  # epoch=-1 is not a step; inherit
    assert set(s2) == {"eval/clean/cer", "eval/clean/wer", "eval/clean/epoch"}
    _, step3, s3 = events[3]
    assert step3 == 5
    assert set(s3) == {"eval_noise/babble_10/cer", "eval_noise/babble_10/wer"}


def test_trainer_writes_events_when_enabled(tmp_path):
    """End-to-end: train.tensorboard=True produces a tb/ event file with
    train + epoch + eval scalars from a real (tiny) training run."""
    import dataclasses

    from avsr_tpu.avsr import AVSR
    from tests.test_train_loop import overfit_config, synth

    cfg = overfit_config("audio", str(tmp_path), epochs=1)
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, tensorboard=True,
                                       log_every_steps=1,
                                       eval_every_epochs=1),
    )
    data = synth(n=8)
    avsr = AVSR(config=cfg, run_dir=str(tmp_path / "run"),
                train_utterances=data, eval_utterances=data)
    avsr.train(num_epochs=1)
    files = glob.glob(str(tmp_path / "run" / "tb" / "events.out.tfevents.*"))
    assert len(files) == 1
    tags = set()
    for _, _, scalars in read_events(files[0]):
        tags.update(scalars)
    assert "train/loss" in tags
    assert "epoch/frames_per_sec" in tags
    assert "eval/cer" in tags
