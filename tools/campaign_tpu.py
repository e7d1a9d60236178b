"""Preset-scale quality campaign on the REAL TPU (VERDICT r4 next #2).

tools/quality_campaign.py gates every promotion decision (vdim kill, conv
win, warmup requirement, flagship promotion) at TOY dims — hidden 48/32,
d=48 fusion, fp32, CPU — extrapolated ~2 orders of magnitude in parameters
to the shipped presets.  This tool closes that evidence gap as far as this
environment allows: the SAME held-out protocol (256 train / 80 held-out
synthetic utterances, on-device noise training, width-10 beam over the
{clean, 10, 0, -5 dB} matrix) run AT PRESET DIMS, in the presets' own
bfloat16 compute, ON THE CHIP — i.e. the exact parameter trees, dtypes,
and XLA programs a real user trains.  Real LRS2/TCD-TIMIT WER remains
impossible here (no datasets, no network — SURVEY §6); this is the
strongest quality evidence the environment can produce.

Arms (configs derived FROM the preset constructors so preset dims ==
gated dims, knob for knob):

  audio           lrs2_av_align dims, architecture="audio" (ordering anchor)
  av_ref          lrs2_av_align — the reference mechanism (parity anchor)
  av_fast         lrs2_av_fast AS SHIPPED (the benched flagship)
  av_fast_tr221   flagship with the audio pyramid moved early, (2,2,1) —
                  same total factor/memory rate; toy gate av_fast_tr21
  av_fast_tr222   deeper (2,2,2) pyramid (~4 Hz memory at preset dims —
                  the risky arm); toy gate av_fast_tr22
  av_v2           lrs2_av_v2 AS SHIPPED (round 5: NO memory_value_dim —
                  the structure the CPU campaign validated, arm
                  av_v2_conv15)
  av_v2_vdim      + memory_value_dim=256 (the pre-round-5 preset config;
                  preset-dims probe of the knob the toy-dims campaign
                  rejected on three recipes — VERDICT r4 weak #1)
  av_v2_tr_h6     the scan-free flagship CANDIDATE: d=384, 6 heads
                  (dh=64), conv15, (1,2,2) time reduction, no vdim —
                  bench arm v2_conv_tr_h6 / CPU arm av_v2_conv15_tr
  av_v2_w512l2    the width lever: d=512 x 2 audio layers (dh=64),
                  conv15, (2,2) time reduction (same total factor 4),
                  no vdim — bench arm v2_conv_tr_w512l2

Gates: identical to quality_campaign.py — per AV arm, ordering (noisy
CER <= audio-only + 0.02) and parity (CER <= av_ref + 0.02 on EVERY
condition).

Budget: compile-dominated.  Each arm compiles ~3 bucket train programs +
the fused eval loss+beam programs (~2-4 min each on the remote relay);
expect ~10-25 min/arm, ~1.5-3 h for all seven.  Device train time itself
is seconds (256 utts x 150 epochs at B=32 = ~1200 steps).  Resumable:
per-arm run dirs persist under --workdir and results merge into
CAMPAIGN_TPU.json per arm — rerun after a flaky window and finished arms
are kept (pass arm names to re-run specific arms).

Usage: python tools/campaign_tpu.py [--epochs N] [--workdir DIR] [arm ...]
Run manually in a TPU window — never in the CPU test suite.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

TOL = 0.02
SNRS = (None, 10.0, 0.0, -5.0)
NOISY = ["0dB", "-5dB"]


def build_arms(epochs: int):
    from avsr_tpu.configs import (
        DataConfig, DecodeConfig, EncoderConfig,
        NoiseConfig, lrs2_av_fast, lrs2_av_v2, lrs2_full,
    )

    def campaignize(cfg, name):
        """Preset model config + the campaign's corpus/noise/decode
        protocol.  num_epochs pins the warmup-cosine horizon (as the CPU
        campaign does); eval is the explicit matrix after training."""
        return cfg.replace(
            data=DataConfig(
                unit="character_lrs2", batch_size=32,
                audio_bucket_boundaries=(130, 260, 390),
                max_label_length=34,
            ),
            noise=NoiseConfig(enabled=True, snr_db=(0.0, 10.0),
                              clean_probability=0.3),
            decode=DecodeConfig(beam_width=10, max_decode_length=34),
            train=dataclasses.replace(
                cfg.train, num_epochs=epochs, eval_every_epochs=100_000,
                save_every_steps=0, keep_checkpoints=2, warmup_compile=True,
            ),
            name=name,
        )

    ref = campaignize(lrs2_full(), "ctpu_av_ref")
    v2 = campaignize(lrs2_av_v2(), "ctpu_av_v2")

    # The two round-5 composition arms share v2's training recipe
    # (warmup-cosine + dropout 0.1 + conv15) at the bench arms' dims.
    def xf_enc(d, layers, heads, tr=None, conv=15):
        return EncoderConfig(
            hidden_units=(d,) * layers, encoder_type="transformer",
            num_heads=heads, dropout_rate=0.1, conv_kernel=conv,
            time_reduction=tr,
        )

    # v2 ships WITHOUT the value projections since round 5; the vdim
    # probe arm re-adds them at the pre-round-5 preset's 256 (0.5 ratio).
    vdim_fusion = dataclasses.replace(v2.fusion, memory_value_dim=256)
    vdim_decoder = dataclasses.replace(v2.decoder, memory_value_dim=256)

    # Round-5 pyramid-placement candidates on the shipped flagship
    # (toy gates av_fast_tr21/av_fast_tr22 both PASS — tr22 is the best
    # toy arm on file).  tr221 keeps the flagship's total factor 4
    # (identical memory rate, ~8 Hz at frame_skipping=3); tr222 deepens
    # to 8 (~4 Hz memory — the risky arm, gate before any promotion).
    fast = campaignize(lrs2_av_fast(), "ctpu_av_fast")

    def fast_tr(tr, name):
        return fast.replace(
            audio_encoder=dataclasses.replace(
                fast.audio_encoder, time_reduction=tr),
            name=name)

    return {
        "audio": dataclasses.replace(
            campaignize(lrs2_full(), "ctpu_audio"), architecture="audio"),
        "av_ref": ref,
        "av_fast": fast,
        "av_fast_tr221": fast_tr((2, 2, 1), "ctpu_av_fast_tr221"),
        "av_fast_tr222": fast_tr((2, 2, 2), "ctpu_av_fast_tr222"),
        "av_v2": v2,
        "av_v2_vdim": v2.replace(
            fusion=vdim_fusion, decoder=vdim_decoder,
            name="ctpu_av_v2_vdim"),
        "av_v2_tr_h6": v2.replace(
            audio_encoder=xf_enc(384, 3, 6, tr=(1, 2, 2)),
            video_encoder=xf_enc(384, 1, 6),
            fusion=v2.fusion, decoder=v2.decoder,
            name="ctpu_av_v2_tr_h6"),
        "av_v2_w512l2": v2.replace(
            audio_encoder=xf_enc(512, 2, 8, tr=(2, 2)),
            video_encoder=xf_enc(512, 1, 8),
            fusion=v2.fusion, decoder=v2.decoder,
            name="ctpu_av_v2_w512l2"),
        # -5 dB probe: the campaign localized the scan-free family's
        # failure to EXACTLY the harshest noise condition on its best
        # structure (av_v2_tr_h6: passes clean/10/0, fails -5 dB by
        # 0.008).  Hypothesis: conv15's ~450 ms local context cannot
        # average noise the way the recurrent encoders' unbounded state
        # can — k=31 (~940 ms at layer 1's 33 Hz) tests whether WIDER
        # local context closes the gap at fixed everything-else.
        "av_v2_tr_h6_c31": v2.replace(
            audio_encoder=xf_enc(384, 3, 6, tr=(1, 2, 2), conv=31),
            video_encoder=xf_enc(384, 1, 6, conv=31),
            fusion=v2.fusion, decoder=v2.decoder,
            name="ctpu_av_v2_tr_h6_c31"),
        # -5 dB probe #2: DEPTH.  c31 killed the wider-context
        # hypothesis (worse everywhere).  The recurrent encoders that DO
        # pass -5 dB integrate over unbounded context through 3 stacked
        # bidirectional layers; this arm gives the transformer stack one
        # more layer (4 x d=384, dh=64, conv15, pyramid extended (1,2,2,1)
        # so the memory rate is unchanged) — if depth closes the -5 dB
        # gap the scan-free family is fixed; if not, the gap is
        # architectural (attention-vs-recurrence under heavy noise).
        "av_v2_tr_h6_d4": v2.replace(
            audio_encoder=xf_enc(384, 4, 6, tr=(1, 2, 2, 1)),
            video_encoder=xf_enc(384, 2, 6),
            fusion=v2.fusion, decoder=v2.decoder,
            name="ctpu_av_v2_tr_h6_d4"),
    }


def main() -> int:
    from avsr_tpu.avsr import AVSR
    from avsr_tpu.data.synthetic import (
        SyntheticSpec, generate, make_noise_bank,
    )

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--workdir", default="/tmp/campaign_tpu")
    ap.add_argument("--snrs", default=None,
                    help="comma SNRs overriding the default matrix "
                         "(e.g. 'clean' or 'clean,0') — smoke runs only")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CAMPAIGN_TPU.json"))
    ap.add_argument("arms", nargs="*", help="arm names (default: all)")
    args = ap.parse_args()

    import jax

    device = str(jax.devices()[0])
    on_tpu = jax.devices()[0].platform != "cpu"
    if not on_tpu:
        print(f"# WARNING: running on {device} — this tool is meant for "
              "the real chip (CPU runs are smoke tests only)", flush=True)

    snrs = SNRS
    if args.snrs:
        snrs = tuple(None if s.strip() in ("clean", "none") else
                     float(s) for s in args.snrs.split(","))

    # The CPU campaign's exact corpus protocol (held-out eval seed).
    corpus_spec = dict(min_chars=6, max_chars=32, alphabet="abcdefghijklmnop",
                       char_duration_s=0.12, roi=36)
    train_data = generate(SyntheticSpec(
        num_utterances=256, seed=21, **corpus_spec))
    eval_data = generate(SyntheticSpec(
        num_utterances=80, seed=22, **corpus_spec))  # HELD OUT
    bank = make_noise_bank(num_rows=4, row_samples=80_000, seed=3)

    arms = build_arms(args.epochs)
    selected = args.arms or list(arms)
    unknown = set(selected) - set(arms)
    if unknown:
        raise SystemExit(f"unknown arm(s): {sorted(unknown)}")

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f).get("arms", {})

    for name in selected:
        cfg = arms[name]
        t0 = time.time()
        avsr = AVSR(config=cfg, run_dir=os.path.join(args.workdir, name),
                    train_utterances=train_data, eval_utterances=eval_data,
                    noise_bank=bank)
        avsr.train(num_epochs=args.epochs,
                   try_restore_latest_checkpoint=True)
        train_s = time.time() - t0
        n_params = int(sum(np.prod(x.shape) for x in
                           jax.tree.leaves(avsr.trainer.state.params)))
        t1 = time.time()
        matrix = avsr.evaluate_noise_matrix(snrs, use_beam=True)
        results[name] = {
            "cer": {c: round(v["cer"], 4) for c, v in matrix.items()},
            "wer": {c: round(v["wer"], 4) for c, v in matrix.items()},
            "epochs": args.epochs, "params": n_params,
            "train_s": round(train_s, 1),
            "eval_s": round(time.time() - t1, 1),
        }
        payload = {
            "protocol": {
                "corpus": dict(corpus_spec, train_utts=256, eval_utts=80,
                               held_out_eval=True),
                "beam_width": 10,
                "snrs": ["clean" if s is None else s for s in snrs],
                "tolerance_abs_cer": TOL,
                "device": device, "on_tpu": on_tpu,
                "compute_dtype": "bfloat16 (preset)",
                "dims": "preset-scale (see build_arms)",
            },
            "arms": results,
        }
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)
            f.write("\n")
        print(json.dumps({name: results[name]}), flush=True)

    # ---- gates (identical to quality_campaign.py) ----
    if "audio" not in results or "av_ref" not in results:
        print("# gates skipped: need audio + av_ref arms on file")
        return 0
    a = results["audio"]["cer"]
    ref = results["av_ref"]["cer"]
    failed = False
    gates = {}
    for name in [k for k in results if k != "audio"]:
        av = results[name]["cer"]
        ordering = all(av[c] <= a[c] + TOL for c in NOISY if c in av)
        parity = all(av[c] <= ref[c] + TOL for c in av)
        gates[name] = {"ordering": ordering, "parity": parity}
        print(f"# {name}: ordering={'PASS' if ordering else 'FAIL'} "
              f"parity={'PASS' if parity else 'FAIL'}", flush=True)
        if name != "av_ref":
            failed = failed or not (ordering and parity)
    with open(args.out) as f:
        payload = json.load(f)
    payload["gates"] = gates
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
        f.write("\n")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
