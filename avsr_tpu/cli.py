"""Command-line interface: train / evaluate / decode / write-records.

The reference's "CLI" is one run_*.py script per experiment with literal
hyperparameters (upstream repo root, SURVEY.md §2.2 row 14).  This CLI keeps
that workflow — a preset name or a JSON config file selects the experiment —
and adds dotted-path overrides so every reference knob (SURVEY §3.5) is
reachable from the command line.

Examples:
  python -m avsr_tpu.cli train --preset audio_tcdtimit \
      --set data.audio_train_records=train.tfrecord \
      --set train.learning_rate=3e-4
  python -m avsr_tpu.cli evaluate --preset av_align_tcdtimit --run-dir runs/x
  python -m avsr_tpu.cli write-records --synthetic 64 --out data/train.tfrecord
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Dict, List


def _parse_overrides(pairs: List[str]) -> Dict[str, object]:
    out: Dict[str, object] = {}
    for p in pairs:
        if "=" not in p:
            raise SystemExit(f"--set expects key=value, got {p!r}")
        k, v = p.split("=", 1)
        try:
            v = json.loads(v)
        except json.JSONDecodeError:
            pass  # keep string
        out[k] = v
    return out


def _load_config(args) -> "ExperimentConfig":
    from avsr_tpu.configs import PRESETS, ExperimentConfig

    if args.config:
        with open(args.config) as f:
            cfg = ExperimentConfig.from_json(f.read())
    elif args.preset:
        if args.preset not in PRESETS:
            raise SystemExit(
                f"unknown preset {args.preset!r}; available: {sorted(PRESETS)}"
            )
        cfg = PRESETS[args.preset]()
    else:
        cfg = ExperimentConfig()
    if args.set:
        try:
            cfg = cfg.override(_parse_overrides(args.set))
        except KeyError as e:
            raise SystemExit(f"unknown config key in --set: {e}")
    return cfg


def _build_avsr(args):
    from avsr_tpu.avsr import AVSR

    cfg = _load_config(args)
    return AVSR(config=cfg, run_dir=args.run_dir)


def cmd_train(args) -> int:
    avsr = _build_avsr(args)
    metrics = avsr.train(
        num_epochs=args.epochs,
        logfile=args.logfile,
        try_restore_latest_checkpoint=args.resume,
    )
    print(json.dumps({"final": metrics}))
    return 0


def cmd_evaluate(args) -> int:
    avsr = _build_avsr(args)
    if getattr(args, "matrix", False):
        # Per-(noise type x SNR)-condition matrix (reference workflow: one
        # error-rate file per condition).  The matrix restores the
        # checkpoint itself (a full evaluate() just to restore would decode
        # the clean condition twice).
        snrs: List[object] = [None]
        if args.snrs:
            snrs += [float(s) for s in args.snrs.split(",")]
        results = avsr.evaluate_noise_matrix(
            tuple(snrs), use_beam=not args.greedy,
            checkpoint=args.checkpoint,
        )
        print(json.dumps(results))
        return 0
    metrics = avsr.evaluate(checkpoint=args.checkpoint, use_beam=not args.greedy)
    print(json.dumps(metrics))
    return 0


def cmd_decode(args) -> int:
    return cmd_evaluate(args)


def cmd_write_records(args) -> int:
    """Dataset serialization (upstream:avsr/dataset_writer.py equivalent)."""
    from avsr_tpu.data import tfrecord
    from avsr_tpu.data.synthetic import SyntheticSpec, generate, make_noise_bank
    from avsr_tpu.data.synthetic import Utterance
    import numpy as np

    if args.manifest:
        if args.synthetic:
            raise SystemExit("--manifest and --synthetic are exclusive")
        if not args.out:
            raise SystemExit("--manifest requires --out")
        from avsr_tpu.data.ingest import read_manifest, write_corpus

        rows = read_manifest(args.manifest)
        n = write_corpus(
            rows, args.out, video_codec=args.video_codec,
            num_shards=args.shards, roi_size=args.roi_size,
            log_every=args.log_every,
        )
        print(f"wrote {n} utterances from {args.manifest} -> {args.out}")
        return 0
    if args.noise_wavs:
        # Noise bank from REAL recordings (the reference's recorded
        # babble/cafe workflow, SURVEY §5.9): --noise-wavs is either a
        # list file (one wav path per line, '#' comments) or a
        # comma-separated path list.  One bank file per noise TYPE; pass
        # each bank to NoiseConfig / --set noise.bank_records.
        if not args.noise_out:
            raise SystemExit("--noise-wavs requires --noise-out")
        from avsr_tpu.data.ingest import bank_from_wavs

        if "," in args.noise_wavs or args.noise_wavs.endswith(".wav"):
            wav_paths = [p for p in args.noise_wavs.split(",") if p]
        else:
            with open(args.noise_wavs) as f:
                wav_paths = [ln.strip() for ln in f
                             if ln.strip() and not ln.startswith("#")]
        bank = bank_from_wavs(wav_paths, row_samples=args.noise_samples)
        bank_utts = [
            Utterance(uid=f"noise{i}", transcript="", waveform=bank[i])
            for i in range(bank.shape[0])
        ]
        tfrecord.write_dataset(bank_utts, args.noise_out)
        print(f"wrote noise bank ({bank.shape[0]} rows x "
              f"{bank.shape[1]} samples from {len(wav_paths)} recordings) "
              f"-> {args.noise_out}")
        if not args.synthetic:
            return 0
    elif not args.synthetic and args.noise_out:
        # noise-bank-only write (e.g. one file per noise TYPE for a typed
        # babble/cafe bank: run once per type with different seeds)
        bank = make_noise_bank(num_rows=4, row_samples=args.noise_samples,
                               seed=args.seed + 1)
        bank_utts = [
            Utterance(uid=f"noise{i}", transcript="", waveform=bank[i])
            for i in range(bank.shape[0])
        ]
        tfrecord.write_dataset(bank_utts, args.noise_out)
        print(f"wrote noise bank -> {args.noise_out}")
        return 0
    if args.synthetic:
        if not args.out:
            raise SystemExit("--synthetic requires --out")
        utts = generate(SyntheticSpec(num_utterances=args.synthetic,
                                      seed=args.seed,
                                      min_chars=args.min_chars,
                                      max_chars=args.max_chars,
                                      char_duration_s=args.char_duration,
                                      roi=args.roi))
        paths = tfrecord.write_dataset(
            utts, args.out, video_codec=args.video_codec,
            num_shards=args.shards,
        )
        print(f"wrote {len(utts)} synthetic utterances -> "
              f"{paths[0] if len(paths) == 1 else f'{len(paths)} shards'}")
        if args.noise_out and not args.noise_wavs:
            bank = make_noise_bank(num_rows=4,
                                   row_samples=args.noise_samples,
                                   seed=args.seed + 1)
            bank_utts = [
                Utterance(uid=f"noise{i}", transcript="", waveform=bank[i])
                for i in range(bank.shape[0])
            ]
            tfrecord.write_dataset(bank_utts, args.noise_out)
            print(f"wrote noise bank -> {args.noise_out}")
        return 0
    raise SystemExit(
        "pass --synthetic N (generated corpus) or --manifest FILE "
        "(real media: wav/video/AU/landmark/ROI columns, see "
        "avsr_tpu/data/ingest.py)"
    )


def cmd_build_units(args) -> int:
    """Discover a unit inventory from corpus transcripts (the inverse of
    the reference's fixed symbol tables, upstream:avsr/misc/ — users
    bringing their own corpus build the table FROM the data so encode()
    drops nothing)."""
    import json

    from avsr_tpu.data import proto, tfrecord
    from avsr_tpu.data import units as units_mod
    from avsr_tpu.data.grain_loader import expand_pattern

    if not args.records and not args.manifest:
        raise SystemExit("build-units needs --records and/or --manifest")

    def transcripts():
        if args.records:
            for path in expand_pattern(args.records):
                for rec in tfrecord.iter_records(path):
                    ctx = proto.decode_sequence_example_context(rec)
                    yield ctx["transcript"][0].decode()
        if args.manifest:
            from avsr_tpu.data.ingest import read_manifest

            for row in read_manifest(args.manifest):
                yield row["transcript"]

    d, counts, dropped = units_mod.from_transcripts(
        transcripts(), unit_type=args.unit_type, min_count=args.min_count
    )
    d.save(args.out)
    total = sum(counts.values())
    kept_tokens = sum(c for u, c in counts.items() if u in d.unit_to_idx)
    print(json.dumps({
        "out": args.out,
        "unit_type": args.unit_type,
        "units": d.vocab_size - 3,  # excluding PAD/GO/EOS
        "vocab_size": d.vocab_size,
        "total_tokens": total,
        "dropped_below_min_count": dropped,
        "token_coverage_pct": round(100.0 * kept_tokens / max(total, 1), 4),
    }))
    return 0


def cmd_export(args) -> int:
    """AOT-export the decode program to a standalone serving artifact
    (avsr_tpu/serve.py: StableHLO program + params + meta; no model code
    needed at serving time)."""
    from avsr_tpu.serve import export_serving_artifact

    avsr = _build_avsr(args)
    seconds = [float(s) for s in str(args.seconds).split(",")]
    out = export_serving_artifact(
        avsr, args.out,
        use_beam=not args.greedy,
        batch_size=args.batch_size,
        audio_seconds=seconds[0] if len(seconds) == 1 else seconds,
        platforms=tuple(args.platforms.split(",")) if args.platforms else None,
        checkpoint=(
            # resolves ints, step strings, paths, and "best" (best.json)
            avsr._resolve_checkpoint_step(args.checkpoint)
            if args.checkpoint else None
        ),
        data_parallel=args.data_parallel,
        transfer=args.transfer,
        n_best=args.n_best,
    )
    print(json.dumps({"artifact": out}))
    return 0


def cmd_average_checkpoints(args) -> int:
    """Average the last-N checkpoints' parameters into a new checkpoint
    step (standard seq2seq-ASR eval trick: smooths SGD noise, typically
    improves CER/WER at zero inference cost)."""
    avsr = _build_avsr(args)
    steps = (
        [int(s) for s in args.steps.split(",")] if args.steps else None
    )
    new_step = avsr.trainer.average_checkpoints(steps=steps, last_n=args.last)
    print(json.dumps({
        "averaged_step": new_step,
        "run_dir": avsr.trainer.run_dir,
    }))
    return 0


def cmd_serve(args) -> int:
    """Serve an exported artifact over HTTP with dynamic request batching
    (avsr_tpu/serve_host.py): concurrent requests arriving within
    --max-wait-ms coalesce into one batched decode program call."""
    from avsr_tpu.serve_host import make_server

    server, batcher = make_server(
        args.artifact, host=args.host, port=args.port,
        max_batch=args.max_batch, max_wait_ms=args.max_wait_ms,
    )
    host, port = server.server_address[:2]
    print(json.dumps({
        "serving": args.artifact, "host": host, "port": port,
        "max_batch": batcher.max_batch, "max_wait_ms": args.max_wait_ms,
    }), flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        batcher.close()
    return 0


def cmd_transcribe(args) -> int:
    """Transcribe media files with an exported serving artifact — the
    standalone deployment path (docs/SERVING.md): no config, no
    checkpoint, no model code; just the artifact directory written by
    ``cli export``."""
    import numpy as np

    from avsr_tpu.serve import BucketedPredictor, load_predictor

    pred = load_predictor(args.artifact)
    B = (min(p.batch_size for p in pred.buckets)
         if isinstance(pred, BucketedPredictor) else pred.batch_size)
    names = {i["name"] for i in pred.meta["inputs"]}
    need_audio, need_video = "audio" in names, "video" in names

    def load_audio(path):
        if path.endswith(".npy"):
            return np.asarray(np.load(path), np.float32)
        from avsr_tpu.data.ingest import load_wav

        return load_wav(path)

    def load_video(path):
        if path.endswith(".npy"):
            v = np.asarray(np.load(path), np.float32)
            return v[..., None] if v.ndim == 3 else v
        from avsr_tpu.data.ingest import extract_lip_rois

        return extract_lip_rois(path)

    files = list(args.inputs)
    videos = list(args.video or [])
    if need_video and not need_audio:
        # video-only artifact: the positional inputs ARE the videos
        files, videos = [], (videos or files)
    if need_audio and not files:
        raise SystemExit("artifact requires audio inputs (.wav or .npy)")
    if need_video and not videos:
        raise SystemExit(
            "artifact requires video inputs: --video FILE per utterance "
            "(.npy ROI array or a video file for cv2 extraction)"
        )
    if need_audio and need_video and len(files) != len(videos):
        raise SystemExit(
            f"{len(files)} audio but {len(videos)} video inputs"
        )

    want_n = max(int(getattr(args, "n_best", 1) or 1), 1)
    if want_n > 1 and int(getattr(pred, "n_best", 1)) < want_n:
        raise SystemExit(
            f"--n-best {want_n} but the artifact was exported with "
            f"n_best={int(getattr(pred, 'n_best', 1))}; re-export with "
            f"--n-best {want_n}"
        )
    keys = files if need_audio else videos
    results: list = []
    for lo in range(0, len(keys), B):
        kw = {}
        if need_audio:
            kw["audio"] = [load_audio(p) for p in files[lo:lo + B]]
        if need_video:
            kw["video"] = [load_video(p) for p in videos[lo:lo + B]]
        if want_n > 1:
            results.extend(pred.transcribe_nbest(**kw))
        else:
            results.extend(pred.transcribe(**kw))

    out_f = open(args.out, "w") if args.out else None
    try:
        for name, r in zip(keys, results):
            if want_n > 1:
                line = json.dumps({
                    "file": name, "text": r[0][0],
                    "alternatives": [
                        {"text": t, "score": s} for t, s in r[:want_n]
                    ],
                })
            else:
                line = json.dumps({"file": name, "text": r})
            print(line)
            if out_f:
                out_f.write(line + "\n")
    finally:
        if out_f:
            out_f.close()
    return 0


def cmd_show_config(args) -> int:
    cfg = _load_config(args)
    print(cfg.to_json())
    return 0


def cmd_analyze(args) -> int:
    """Error analysis over a predictions file (confusions, distributions,
    worst utterances) — the post-eval step the reference leaves to ad-hoc
    user scripts (SURVEY §3.2 scoring is host-side)."""
    import glob as _glob

    from avsr_tpu.eval.analysis import analyze_file

    path = args.predictions
    if path is None:
        if not args.run_dir:
            raise SystemExit("pass --predictions FILE or --run-dir DIR")
        cands = sorted(
            _glob.glob(os.path.join(args.run_dir, "predictions_*.txt")),
            key=os.path.getmtime,
        )
        if not cands:
            raise SystemExit(f"no predictions_*.txt under {args.run_dir}")
        path = cands[-1]
    report = analyze_file(path, top=args.top)
    report["predictions_file"] = path
    if args.bootstrap:
        from avsr_tpu.eval.analysis import bootstrap_ci, parse_predictions

        report["bootstrap"] = bootstrap_ci(
            parse_predictions(path), n_resamples=args.bootstrap
        )
    if args.compare:
        from avsr_tpu.eval.analysis import compare, parse_predictions

        report["compare"] = compare(
            parse_predictions(path),
            parse_predictions(args.compare),
            n_resamples=args.bootstrap or 2000,
            top=args.top,
        )
        report["compare"]["b_predictions_file"] = args.compare
    print(json.dumps(report))
    return 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="avsr_tpu", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--preset", help="named experiment preset")
        p.add_argument("--config", help="JSON config file")
        p.add_argument("--set", action="append", default=[],
                       metavar="KEY=VAL", help="dotted-path config override")
        p.add_argument("--run-dir", default=None)

    p = sub.add_parser("train", help="train a model")
    common(p)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--logfile", default=None)
    p.add_argument("--resume", action="store_true",
                   help="try_restore_latest_checkpoint")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("evaluate", help="evaluate a checkpoint")
    common(p)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--greedy", action="store_true", help="greedy instead of beam")
    p.add_argument("--matrix", action="store_true",
                   help="per-(noise type x SNR) condition matrix")
    p.add_argument("--snrs", default=None,
                   help="comma-separated SNRs for --matrix (clean always runs)")
    p.set_defaults(fn=cmd_evaluate)

    p = sub.add_parser("decode", help="beam-decode the eval set")
    common(p)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--greedy", action="store_true")
    p.set_defaults(fn=cmd_decode)

    p = sub.add_parser("write-records", help="serialize a dataset to TFRecords")
    p.add_argument("--synthetic", type=int, default=0,
                   help="generate N synthetic utterances")
    p.add_argument("--manifest", default=None,
                   help="real-media corpus manifest (CSV/TSV, header with "
                        "'uid' + any of transcript, transcript_file, wav, "
                        "video, au_csv, landmarks_csv, roi_npy; relative "
                        "paths resolve against the manifest)")
    p.add_argument("--roi-size", type=int, default=36,
                   help="lip-ROI side length for --manifest video extraction")
    p.add_argument("--log-every", type=int, default=100,
                   help="progress line every N utterances (--manifest)")
    p.add_argument("--out", default=None,
                   help="corpus output path (required with --synthetic)")
    p.add_argument("--noise-out", default=None)
    p.add_argument("--noise-wavs", default=None,
                   help="build the noise bank from REAL recordings: a list "
                        "file (one wav path per line) or comma-separated "
                        "wav paths; run once per noise type")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--min-chars", type=int, default=2)
    p.add_argument("--max-chars", type=int, default=6)
    p.add_argument("--char-duration", type=float, default=0.12,
                   help="seconds per character (sets utterance durations)")
    p.add_argument("--roi", type=int, default=36, help="lip-ROI side length")
    p.add_argument("--noise-samples", type=int, default=160_000,
                   help="samples per noise-bank row")
    p.add_argument("--video-codec", default="float32",
                   choices=("float32", "uint8"),
                   help="ROI storage codec (uint8 = 4x smaller records)")
    p.add_argument("--shards", type=int, default=1,
                   help="split the corpus into N shard files "
                        "(read back via the glob '<out>-*')")
    p.set_defaults(fn=cmd_write_records)

    p = sub.add_parser(
        "build-units",
        help="discover a unit inventory from corpus transcripts",
    )
    p.add_argument("--records", default=None,
                   help="record path / shard glob / comma list to scan")
    p.add_argument("--manifest", default=None,
                   help="corpus manifest (CSV/TSV) to scan")
    p.add_argument("--unit-type", default="character",
                   help="tokenization: character* = lowercased chars, "
                        "anything else = whitespace units")
    p.add_argument("--min-count", type=int, default=1,
                   help="drop units seen fewer than N times (reported)")
    p.add_argument("--out", required=True, help="unit file to write "
                   "(use via data.unit_file + data.unit_type)")
    p.set_defaults(fn=cmd_build_units)

    p = sub.add_parser("export",
                       help="AOT-export the decode program for serving")
    common(p)
    p.add_argument("--out", required=True, help="artifact directory")
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--greedy", action="store_true")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--seconds", default="6.0",
                   help="audio horizon(s); comma-separated list exports "
                        "one program per serving bucket (e.g. 2,6,10)")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering targets "
                        "(default cpu,tpu: one artifact serves both)")
    p.add_argument("--data-parallel", type=int, default=None,
                   help="export a data-parallel program over N devices "
                        "(params replicated, batch sharded)")
    p.add_argument("--transfer", default="compact",
                   choices=("compact", "float32"),
                   help="request wire dtypes: compact = int16 PCM audio / "
                        "uint8 ROI video, dequantized on device (2-4x "
                        "fewer host-to-device bytes per request)")
    p.add_argument("--n-best", type=int, default=1,
                   help="export ranked top-N hypotheses + scores (beam "
                        "only); serving still returns top-1 by default")
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser(
        "average-checkpoints",
        help="average the last-N checkpoints into a new checkpoint step")
    common(p)
    p.add_argument("--last", type=int, default=5,
                   help="how many newest checkpoints to average")
    p.add_argument("--steps", default=None,
                   help="explicit comma-separated steps instead of --last")
    p.set_defaults(fn=cmd_average_checkpoints)

    p = sub.add_parser(
        "serve",
        help="serve an exported artifact over HTTP with dynamic batching")
    p.add_argument("--artifact", required=True,
                   help="artifact directory from `export`")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000,
                   help="0 = pick an ephemeral port (printed on startup)")
    p.add_argument("--max-batch", type=int, default=None,
                   help="cap coalesced batch size (default: the artifact's "
                        "exported batch size)")
    p.add_argument("--max-wait-ms", type=float, default=5.0,
                   help="how long the first request in a batch waits for "
                        "company before decoding")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser(
        "transcribe",
        help="transcribe media files with an exported serving artifact",
    )
    p.add_argument("--artifact", required=True,
                   help="artifact directory written by `export`")
    p.add_argument("inputs", nargs="+",
                   help=".wav or .npy waveform files (video-only "
                        "artifacts: the video files/ROI .npy arrays)")
    p.add_argument("--video", action="append", default=None,
                   help="one per utterance: .npy ROI array [T,h,w(,1)] or "
                        "a video file for cv2 lip-ROI extraction")
    p.add_argument("--out", default=None,
                   help="also write the JSONL transcripts here")
    p.add_argument("--n-best", type=int, default=1,
                   help="emit the top-N ranked alternatives with scores "
                        "(artifact must be exported with --n-best >= N)")
    p.set_defaults(fn=cmd_transcribe)

    p = sub.add_parser("show-config", help="print the resolved config")
    common(p)
    p.set_defaults(fn=cmd_show_config)

    p = sub.add_parser(
        "analyze",
        help="error analysis over a predictions file "
             "(confusions, CER distribution, worst utterances)")
    p.add_argument("--predictions", default=None,
                   help="predictions_*.txt file (default: newest in "
                        "--run-dir)")
    p.add_argument("--run-dir", default=None)
    p.add_argument("--top", type=int, default=10,
                   help="list length for confusions / worst utterances")
    p.add_argument("--bootstrap", type=int, nargs="?", const=2000,
                   default=0, metavar="N",
                   help="bootstrap 95%% confidence intervals on CER/WER "
                        "(N resamples, default 2000)")
    p.add_argument("--compare", default=None, metavar="PREDICTIONS_B",
                   help="second predictions file: paired-bootstrap "
                        "significance test (A = --predictions, B = this)")
    p.set_defaults(fn=cmd_analyze)

    args = ap.parse_args(argv)
    # Honor an EXPLICIT platform request: the environment's axon
    # sitecustomize re-selects the TPU backend after import, so the env var
    # alone is not enough (CLAUDE.md) — mirror tests/conftest.py.
    plat = os.environ.get("JAX_PLATFORMS")
    if plat and args.cmd != "write-records":
        import jax

        jax.config.update("jax_platforms", plat)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
