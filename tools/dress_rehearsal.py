"""Full-system dress rehearsal: the USER path, end to end, one verdict line.

Every stage of the framework is unit/integration tested; this script runs
the assembled PRODUCT exactly as a user would (VERDICT round-2 next #5,
SURVEY.md §3.1-3.3 call stacks), all through the CLI:

  1. ``write-records``: a duration-mixed synthetic AV corpus (>=1 GB by
     default) + typed babble/cafe noise-bank records;
  2. ``train`` run A: streaming seek-based sources, compact int16/uint8
     transfer, on-device noise mixing, multiprocess decode workers, bucket
     caps, warmup pre-compile, per-K-step checkpoints — uninterrupted;
  3. ``train`` run B: same config, SIGKILLed mid-epoch-2, then resumed with
     ``--resume``;
  4. verify: run B's final params are BIT-EXACTLY run A's (mid-epoch
     resume = uninterrupted training), and peak train RSS stayed bounded
     (streaming corpus never materializes);
  5. ``evaluate --matrix``: per-(noise type x SNR) condition files;
  6. ``decode``: beam decode artifacts; ``analyze``: error-analysis report
     over the newest predictions file;
  7. ``export``: AOT serving artifact, then a standalone Predictor
     transcribes from the artifact alone (deployment path);
  8. HTTP serving host: POST /v1/transcribe against a dynamic-batching
     server on the artifact must reproduce the Predictor's hypothesis
     (also re-exercises batch-size padding invariance: B=1 request vs
     the B=2 direct call).

Runs on CPU (JAX_PLATFORMS=cpu) so it validates the workflow, not device
perf.  Usage:

  python tools/dress_rehearsal.py [--quick] [--utts N] [--workdir DIR]

--quick shrinks the corpus (~100 MB) for a fast workflow check.  Prints ONE
JSON line {"ok": ..., "checks": {...}}; exit code 0 iff every check passed.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import tempfile
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CLI = [sys.executable, "-m", "avsr_tpu.cli"]
ENV = dict(os.environ, JAX_PLATFORMS="cpu")


def run(args, **kw):
    """Run a CLI step, echoing the tail of its output on failure."""
    p = subprocess.run(args, env=ENV, cwd=REPO, capture_output=True,
                       text=True, **kw)
    if p.returncode != 0:
        sys.stderr.write(f"FAILED: {' '.join(args)}\n{p.stdout[-2000:]}\n"
                         f"{p.stderr[-4000:]}\n")
        raise SystemExit(2)
    return p.stdout


def make_config(work: str, quick: bool) -> str:
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

    cfg = ExperimentConfig(
        architecture="av_align",
        audio=AudioFrontendConfig(num_mel_bins=12, fft_length=256,
                                  frame_stacking=3, frame_skipping=3,
                                  add_deltas=False),
        video=VideoFrontendConfig(roi_height=36, roi_width=36,
                                  conv_channels=(4, 8), embedding_dim=24),
        audio_encoder=EncoderConfig(hidden_units=(32,), bidirectional=True,
                                    dropout_rate=0.1),
        video_encoder=EncoderConfig(hidden_units=(32,), bidirectional=True,
                                    dropout_rate=0.0),
        fusion=FusionConfig(attention_units=16),
        decoder=DecoderConfig(embedding_dim=16, hidden_units=(32,),
                              attention_units=16, max_label_length=60,
                              dropout_rate=0.0),
        data=DataConfig(
            unit="character",
            audio_train_records=os.path.join(work, "train.tfrecord"),
            audio_eval_records=os.path.join(work, "eval.tfrecord"),
            batch_size=8 if quick else 16,
            audio_bucket_boundaries=(250, 400, 600),
            label_bucket_caps=(25, 40, 60),
            max_label_length=60,
            num_workers=2,
            transfer_dtype="compact",
        ),
        noise=NoiseConfig(
            enabled=True, snr_db=(10.0, 20.0), clean_probability=0.3,
            bank_records=(
                ("babble", os.path.join(work, "babble.tfrecord")),
                ("cafe", os.path.join(work, "cafe.tfrecord")),
            ),
        ),
        train=TrainConfig(
            learning_rate=3e-3, num_epochs=2, compute_dtype="float32",
            warmup_compile=True, save_every_steps=3, log_every_steps=1,
            eval_every_epochs=100, keep_checkpoints=50,
        ),
        decode=DecodeConfig(beam_width=4, max_decode_length=60),
        name="rehearsal",
    )
    path = os.path.join(work, "config.json")
    with open(path, "w") as f:
        f.write(cfg.to_json())
    return path


def watch_rss(pid: int, peak: dict, stop: threading.Event) -> None:
    while not stop.is_set():
        try:
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmRSS:"):
                        kb = int(line.split()[1])
                        peak["kb"] = max(peak.get("kb", 0), kb)
        except OSError:
            return
        time.sleep(0.3)


def train_proc(cfg_path: str, run_dir: str, resume: bool = False):
    args = CLI + ["train", "--config", cfg_path, "--run-dir", run_dir]
    if resume:
        args.append("--resume")
    return subprocess.Popen(args, env=ENV, cwd=REPO,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--utts", type=int, default=None)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    quick = args.quick
    n_train = args.utts or (256 if quick else 3600)
    work = args.workdir or tempfile.mkdtemp(prefix="avsr_rehearsal_")
    os.makedirs(work, exist_ok=True)
    checks = {}
    t_all = time.time()

    # ---- 1. write-records ------------------------------------------------
    run(CLI + ["write-records", "--synthetic", str(n_train),
               "--out", f"{work}/train.tfrecord", "--char-duration", "0.08",
               "--min-chars", "20", "--max-chars", "55", "--seed", "0",
               "--video-codec", "uint8"])
    run(CLI + ["write-records", "--synthetic", "48",
               "--out", f"{work}/eval.tfrecord", "--char-duration", "0.08",
               "--min-chars", "20", "--max-chars", "55", "--seed", "100",
               "--video-codec", "uint8"])
    run(CLI + ["write-records", "--noise-out", f"{work}/babble.tfrecord",
               "--noise-samples", "200000", "--seed", "7"])
    run(CLI + ["write-records", "--noise-out", f"{work}/cafe.tfrecord",
               "--noise-samples", "200000", "--seed", "8"])
    corpus_bytes = os.path.getsize(f"{work}/train.tfrecord")
    checks["corpus_gb"] = round(corpus_bytes / 1e9, 3)
    checks["corpus_at_scale"] = quick or corpus_bytes >= 1e9

    cfg_path = make_config(work, quick)
    run_a, run_b = f"{work}/runA", f"{work}/runB"

    # ---- 2. train A (uninterrupted) + RSS watch --------------------------
    pa = train_proc(cfg_path, run_a)
    peak, stop = {}, threading.Event()
    w = threading.Thread(target=watch_rss, args=(pa.pid, peak, stop),
                         daemon=True)
    w.start()
    rc = pa.wait()
    stop.set()
    checks["train_a_ok"] = rc == 0
    checks["peak_train_rss_gb"] = round(peak.get("kb", 0) * 1024 / 1e9, 3)
    # streaming + bounded buffers: RSS must not scale with the corpus
    # (interpreter + jax + batch buffers budget, NOT corpus-sized)
    checks["rss_bounded"] = (
        peak.get("kb", 0) * 1024 < 0.35 * corpus_bytes + 2.0e9
    )

    # ---- 3. train B: SIGKILL mid-epoch-2, then resume --------------------
    pb = train_proc(cfg_path, run_b)
    ckpt_dir = f"{run_b}/checkpoints"
    killed = False
    deadline = time.time() + 3600
    while time.time() < deadline and pb.poll() is None:
        # wait for a saved step INSIDE epoch 2 (extra: epoch==1, batches>0)
        for f in (os.listdir(ckpt_dir) if os.path.isdir(ckpt_dir) else []):
            if f.startswith("extra_"):
                try:
                    extra = json.load(open(os.path.join(ckpt_dir, f)))
                except Exception:
                    continue
                if extra.get("epoch") == 1 and extra.get("batches_done", 0) > 0:
                    os.kill(pb.pid, signal.SIGKILL)
                    killed = True
                    break
        if killed:
            break
        time.sleep(0.5)
    pb.wait()
    checks["killed_mid_epoch"] = killed
    rc = train_proc(cfg_path, run_b, resume=True).wait()
    checks["resume_ok"] = rc == 0

    # ---- 4. bit-exact resume vs uninterrupted ----------------------------
    import numpy as np

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    from avsr_tpu.configs import ExperimentConfig
    from avsr_tpu.data.units import builtin_unit_dict
    from avsr_tpu.train import step as step_lib
    from avsr_tpu.train.checkpoint import CheckpointManager

    with open(cfg_path) as f:
        cfg = ExperimentConfig.from_json(f.read())
    vocab = builtin_unit_dict(cfg.data.unit).vocab_size
    state, _ = step_lib.create_train_state(
        jax.random.PRNGKey(cfg.train.seed), cfg, vocab, 1000
    )

    def final_params(run_dir):
        mgr = CheckpointManager(f"{run_dir}/checkpoints", keep=50)
        st, _, step = mgr.restore(state)
        mgr.close()
        return st.params, step

    params_a, step_a = final_params(run_a)
    params_b, step_b = final_params(run_b)
    same = step_a == step_b
    for x, y in zip(jax.tree_util.tree_leaves(params_a),
                    jax.tree_util.tree_leaves(params_b)):
        same = same and np.array_equal(np.asarray(x), np.asarray(y))
    checks["resume_bit_exact"] = bool(same)
    checks["final_step"] = int(step_a)

    # ---- 5. evaluate noise matrix + 6. decode ----------------------------
    out = run(CLI + ["evaluate", "--config", cfg_path, "--run-dir", run_b,
                     "--matrix", "--snrs", "0,10", "--greedy"])
    matrix = json.loads(out.strip().splitlines()[-1])
    want = {"clean", "babble_0dB", "cafe_0dB", "babble_10dB", "cafe_10dB"}
    checks["matrix_conditions"] = sorted(matrix)
    checks["matrix_complete"] = want <= set(matrix)
    err_files = [f for f in os.listdir(run_b) if f.startswith("error_rates")]
    pred_files = [f for f in os.listdir(run_b) if f.startswith("predictions")]
    checks["condition_files"] = (
        len(err_files) >= len(want) and len(pred_files) >= len(want)
    )
    run(CLI + ["decode", "--config", cfg_path, "--run-dir", run_b])
    checks["metrics_jsonl"] = os.path.exists(f"{run_b}/metrics.jsonl")

    # ---- 6b. error analysis over the newest predictions file --------------
    out = run(CLI + ["analyze", "--run-dir", run_b, "--top", "5"])
    report = json.loads(out.strip().splitlines()[-1])
    checks["analyze_ok"] = (
        report["num_utterances"] > 0 and "top_substitutions" in report
    )

    # ---- 7. export -> standalone serving ----------------------------------
    art = f"{work}/artifact"
    run(CLI + ["export", "--config", cfg_path, "--run-dir", run_b,
               "--out", art, "--greedy", "--batch-size", "2",
               "--seconds", "5"])
    from avsr_tpu.data.tfrecord import read_dataset
    from avsr_tpu.serve import Predictor

    utts = read_dataset(f"{work}/eval.tfrecord")[:2]
    pred = Predictor.load(art)
    hyps = pred.transcribe(audio=[u.waveform for u in utts],
                           video=[u.video for u in utts])
    checks["export_serve_ok"] = (
        len(hyps) == 2 and all(isinstance(h, str) for h in hyps)
    )

    # ---- 8. HTTP serving host (dynamic batching) --------------------------
    import urllib.request

    from avsr_tpu.serve_host import make_server

    server, batcher = make_server(art, port=0, max_wait_ms=100.0)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        body = json.dumps(
            {"audio": [utts[0].waveform.tolist()],
             "video": [utts[0].video.tolist()]}
        ).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/transcribe", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            resp = json.loads(r.read())
        checks["http_serve_ok"] = (
            r.status == 200 and resp["texts"] == hyps[:1]
        )
    finally:
        server.shutdown()
        batcher.close()

    checks["wall_minutes"] = round((time.time() - t_all) / 60, 1)
    ok = all(v is True for k, v in checks.items()
             if isinstance(v, bool))
    print(json.dumps({"ok": ok, "workdir": work, "checks": checks}))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
