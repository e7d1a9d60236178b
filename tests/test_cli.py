"""CLI smoke tests: write-records, show-config, train-on-records round trip."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from avsr_tpu import cli
from avsr_tpu.data import tfrecord
from avsr_tpu.data.grain_loader import TFRecordDataSource, load_utterances


def test_write_records_and_read_back(tmp_path, capsys):
    out = str(tmp_path / "train.tfrecord")
    noise = str(tmp_path / "noise.tfrecord")
    rc = cli.main(["write-records", "--synthetic", "6", "--out", out,
                   "--noise-out", noise])
    assert rc == 0
    utts = tfrecord.read_dataset(out)
    assert len(utts) == 6
    assert utts[0].waveform is not None and utts[0].video is not None
    bank = tfrecord.read_dataset(noise)
    assert len(bank) == 4 and bank[0].waveform is not None


def test_show_config_roundtrip(tmp_path, capsys):
    rc = cli.main(["show-config", "--preset", "av_align_noisy",
                   "--set", "train.learning_rate=0.0005",
                   "--set", "decode.beam_width=4"])
    assert rc == 0
    cfg = json.loads(capsys.readouterr().out)
    assert cfg["architecture"] == "av_align"
    assert cfg["noise"]["enabled"] is True
    assert cfg["train"]["learning_rate"] == 0.0005
    assert cfg["decode"]["beam_width"] == 4


def test_show_config_rejects_unknown_key():
    with pytest.raises(SystemExit):
        cli.main(["show-config", "--set", "train.nonexistent=1"])
    with pytest.raises(SystemExit):
        cli.main(["show-config", "--preset", "audio_tcdtimit",
                  "--set", "train.nonexistent=1"])


def test_grain_source_random_access(tmp_path):
    out = str(tmp_path / "d.tfrecord")
    cli.main(["write-records", "--synthetic", "5", "--out", out])
    src = TFRecordDataSource(out)
    assert len(src) == 5
    u3 = src[3]
    assert u3.uid == "synth0003"
    # out-of-order access works (random access, not streaming)
    u0 = src[0]
    assert u0.uid == "synth0000"
    all_utts = load_utterances(out)
    assert [u.uid for u in all_utts] == [f"synth{i:04d}" for i in range(5)]


def test_suggest_buckets_tool(tmp_path):
    """tools/suggest_buckets.py proposes monotone boundaries, caps that
    cover the bucket's labels, and shard-divisible batch sizes."""
    import json
    import subprocess
    import sys

    from avsr_tpu.data.synthetic import SyntheticSpec, generate
    from avsr_tpu.data.tfrecord import write_dataset

    utts = (generate(SyntheticSpec(num_utterances=12, min_chars=2,
                                   max_chars=4, seed=1, alphabet="abc"))
            + generate(SyntheticSpec(num_utterances=6, min_chars=8,
                                     max_chars=12, seed=2, alphabet="abc")))
    path = str(tmp_path / "c.tfrecord")
    write_dataset(utts, path)
    out = subprocess.run(
        [sys.executable, "tools/suggest_buckets.py", path, "--buckets", "3",
         "--shards", "4", "--batch-budget", "64x100"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0, out.stderr[-1500:]
    body = out.stdout.split("# paste")[0]
    prop = json.loads(body)
    bounds = prop["audio_bucket_boundaries"]
    assert len(bounds) == 3 and bounds == sorted(bounds)
    assert len(set(bounds)) == 3
    caps = prop["label_bucket_caps"]
    sizes = prop["bucket_batch_sizes"]
    assert all(b % 4 == 0 for b in sizes)
    assert sizes == sorted(sizes, reverse=True)  # longer bucket, smaller B
    assert max(caps) >= prop["label_len_max"]
    assert prop["num_utterances"] == 18


def test_cli_train_export_serve_roundtrip(tmp_path, capsys):
    """The full CLI user path: write-records -> train -> export -> a
    standalone Predictor transcribes from the artifact alone."""
    from avsr_tpu.configs import (
        AudioFrontendConfig, DataConfig, DecodeConfig, DecoderConfig,
        EncoderConfig, ExperimentConfig, TrainConfig,
    )
    from avsr_tpu.data.tfrecord import read_dataset
    from avsr_tpu.serve import Predictor

    records = str(tmp_path / "train.tfrecord")
    rc = cli.main(["write-records", "--synthetic", "6", "--out", records,
                   "--max-chars", "3", "--char-duration", "0.1"])
    assert rc == 0

    cfg = ExperimentConfig(
        architecture="audio",
        audio=AudioFrontendConfig(num_mel_bins=12, fft_length=256,
                                  frame_stacking=3, frame_skipping=3,
                                  add_deltas=False),
        audio_encoder=EncoderConfig(hidden_units=(16,), dropout_rate=0.0),
        decoder=DecoderConfig(embedding_dim=8, hidden_units=(16,),
                              attention_units=12, max_label_length=6,
                              dropout_rate=0.0),
        data=DataConfig(batch_size=3, audio_bucket_boundaries=(60,),
                        max_label_length=6,
                        audio_train_records=records,
                        audio_eval_records=records),
        train=TrainConfig(compute_dtype="float32", log_every_steps=10,
                          num_epochs=1),
        decode=DecodeConfig(beam_width=2, max_decode_length=6),
        name="cli_serve",
    )
    cfg_path = str(tmp_path / "cfg.json")
    with open(cfg_path, "w") as f:
        f.write(cfg.to_json())
    run_dir = str(tmp_path / "run")

    rc = cli.main(["train", "--config", cfg_path, "--run-dir", run_dir,
                   "--epochs", "1"])
    assert rc == 0
    capsys.readouterr()

    art = str(tmp_path / "artifact")
    rc = cli.main(["export", "--config", cfg_path, "--run-dir", run_dir,
                   "--out", art, "--greedy", "--batch-size", "2",
                   "--seconds", "0.5"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["artifact"] == art

    utts = read_dataset(records)
    pred = Predictor.load(art)
    hyps = pred.transcribe(audio=[utts[0].waveform, utts[1].waveform])
    assert len(hyps) == 2 and all(isinstance(h, str) for h in hyps)
    assert pred.meta["checkpoint_step"] > 0

    # The `transcribe` subcommand: media files in -> text out, from the
    # artifact alone (no config/run-dir).  3 inputs > batch_size=2
    # exercises the request-chunking loop; the wav round-trips through
    # int16 PCM and the .npy paths are the raw waveforms.
    import wave

    wav_path = str(tmp_path / "u0.wav")
    with wave.open(wav_path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(
            (np.clip(utts[0].waveform, -1, 1) * 32767)
            .astype("<i2").tobytes()
        )
    npys = []
    for i in (1, 2):
        path = str(tmp_path / f"u{i}.npy")
        np.save(path, utts[i].waveform)
        npys.append(path)
    out_path = str(tmp_path / "hyps.jsonl")
    capsys.readouterr()
    rc = cli.main(["transcribe", "--artifact", art, wav_path, *npys,
                   "--out", out_path])
    assert rc == 0
    lines = [json.loads(l) for l in open(out_path)]
    assert [l["file"] for l in lines] == [wav_path, *npys]
    # The .npy input is byte-identical to the in-process request above ->
    # identical transcript; stdout mirrors the JSONL file.
    assert lines[1]["text"] == hyps[1]
    stdout = [json.loads(l) for l in
              capsys.readouterr().out.strip().splitlines()]
    assert stdout == lines


def test_build_units_from_records_and_manifest(tmp_path, capsys):
    """cli build-units discovers the unit inventory from corpus
    transcripts (records and/or manifest), writes a unit file usable via
    data.unit_file, and reports min-count drops instead of hiding them."""
    from avsr_tpu.data.units import UnitDict, from_transcripts

    out = str(tmp_path / "train.tfrecord")
    rc = cli.main(["write-records", "--synthetic", "6", "--out", out,
                   "--seed", "3"])
    assert rc == 0
    capsys.readouterr()

    units_path = str(tmp_path / "units.txt")
    rc = cli.main(["build-units", "--records", out, "--out", units_path])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["vocab_size"] == stats["units"] + 3  # PAD/GO/EOS
    assert stats["token_coverage_pct"] == 100.0

    d = UnitDict.load(units_path, "character")
    for u in load_utterances(out):
        assert d.count_unknown(u.transcript) == 0

    # manifest path + min_count drops (reported, not hidden)
    man = tmp_path / "corpus.csv"
    man.write_text("uid,transcript\na,aab\nb,ab\n")
    rc = cli.main(["build-units", "--manifest", str(man),
                   "--min-count", "2", "--out", units_path])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["dropped_below_min_count"] == []  # a:3 b:2 both kept
    d2, counts, dropped = from_transcripts(["aab", "ab"], min_count=3)
    assert counts == {"a": 3, "b": 2} and dropped == ["b"]
    assert d2.vocab_size == 4  # specials + "a"

    with pytest.raises(SystemExit):
        cli.main(["build-units", "--out", units_path])


def test_every_preset_builds_and_round_trips():
    """Each canned preset must construct, carry its own dict key as its
    name, and survive the JSON round-trip (the config path every CLI
    subcommand and checkpoint restore relies on)."""
    from avsr_tpu.configs import PRESETS, ExperimentConfig

    for key, builder in PRESETS.items():
        cfg = builder()
        assert cfg.name == key, (key, cfg.name)
        back = ExperimentConfig.from_json(cfg.to_json())
        assert back == cfg, key
