"""Corpus-scale quality campaign: the lrs2_av_fast/v2 promotion gate.

VERDICT r3 next #1: the fast/v2 model families were promoted on toy-scale
evidence (a 48-utterance, 6-char-alphabet overfit corpus where every AV arm
hits 0.0 CER).  This campaign is the harder, *held-out* version that makes
the comparison meaningful:

  * corpus: 16-char alphabet, 6-32 chars per utterance (~0.7-3.8 s), 256
    train / 80 HELD-OUT eval utterances (different seed — generalization,
    not memorization);
  * training with on-device noise mixing (SNR 0/10 dB, 30% clean), the
    reference's robustness recipe [BASELINE.json:configs[3]];
  * eval: the full noise matrix {clean, 10, 0, -5 dB} decoded with
    width-10 beam search (the reference's decode protocol, BASELINE.md §C);
  * arms: audio-only baseline, AV-Align at reference mechanism/dims
    (scaled), the lrs2_av_fast lever stack (cross-attention fusion + time
    reduction + decoder value projection, mirroring the preset's structure),
    and the lrs2_av_v2 scan-free family.

Gates printed per AV arm (tolerance 0.02 absolute CER):
  ordering  — arm CER <= audio-only CER + tol on the noisy conditions
              (the papers' headline behavior, arXiv:1809.01728);
  parity    — arm CER <= av_ref CER + tol on EVERY condition (the
              fast/v2 promotion gate: no quality regression vs the
              reference mechanism).

Resumable: each arm trains under /tmp/campaign_<arm> with
try_restore_latest_checkpoint=True and results merge into CAMPAIGN.json
per arm — rerunning skips/extends finished arms.

Usage: python tools/quality_campaign.py [--epochs N] [arm ...]
CPU-only (many small distinct programs; remote TPU compiles would
dominate).  Full run is several hours on this 1-core host.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

TOL = 0.02
SNRS = (None, 10.0, 0.0, -5.0)
NOISY = ["0dB", "-5dB"]


def build_arms():
    from avsr_tpu.configs import (
        AudioFrontendConfig, DataConfig, DecodeConfig, DecoderConfig,
        EncoderConfig, ExperimentConfig, FusionConfig, NoiseConfig,
        TrainConfig, VideoFrontendConfig,
    )

    def cfg_for(arch):
        return ExperimentConfig(
            architecture=arch,
            audio=AudioFrontendConfig(num_mel_bins=12, fft_length=256,
                                      frame_stacking=3, frame_skipping=3,
                                      add_deltas=False),
            video=VideoFrontendConfig(roi_height=24, roi_width=24,
                                      conv_channels=(4, 8), embedding_dim=24),
            audio_encoder=EncoderConfig(hidden_units=(48,), bidirectional=True,
                                        dropout_rate=0.0),
            video_encoder=EncoderConfig(hidden_units=(32,), bidirectional=True,
                                        dropout_rate=0.0),
            fusion=FusionConfig(attention_units=24),
            decoder=DecoderConfig(embedding_dim=16, hidden_units=(48,),
                                  attention_units=24, max_label_length=34,
                                  dropout_rate=0.0),
            noise=NoiseConfig(enabled=True, snr_db=(0.0, 10.0),
                              clean_probability=0.3),
            data=DataConfig(batch_size=8,
                            audio_bucket_boundaries=(130, 260, 390),
                            max_label_length=34),
            train=TrainConfig(learning_rate=5e-3, compute_dtype="float32",
                              eval_every_epochs=1000),
            decode=DecodeConfig(beam_width=10, max_decode_length=34),
            name=f"campaign_{arch}",
        )

    base = cfg_for("av_align")
    return {
        "audio": cfg_for("audio"),
        # the reference mechanism at these dims — the parity anchor
        "av_ref": base,
        # lrs2_av_fast's structure scaled down: cross-attention fusion +
        # (1,2) audio time reduction + value-projected decoder memory
        "av_fast": dataclasses.replace(
            base,
            audio_encoder=EncoderConfig(
                hidden_units=(48, 48), time_reduction=(1, 2),
                bidirectional=True, dropout_rate=0.0),
            fusion=FusionConfig(fusion_type="cross_attention", num_heads=4,
                                attention_units=24),
            decoder=dataclasses.replace(base.decoder, memory_value_dim=48),
        ),
        # ---- diagnostic arms: decompose av_fast's levers so a parity
        # gap can be attributed to ONE lever (round-4 campaign) ----
        "av_xa": dataclasses.replace(
            base,
            fusion=FusionConfig(fusion_type="cross_attention", num_heads=4,
                                attention_units=24),
        ),
        "av_tr": dataclasses.replace(
            base,
            audio_encoder=EncoderConfig(
                hidden_units=(48, 48), time_reduction=(1, 2),
                bidirectional=True, dropout_rate=0.0),
        ),
        "av_fast_novdim": dataclasses.replace(
            base,
            audio_encoder=EncoderConfig(
                hidden_units=(48, 48), time_reduction=(1, 2),
                bidirectional=True, dropout_rate=0.0),
            fusion=FusionConfig(fusion_type="cross_attention", num_heads=4,
                                attention_units=24),
        ),
        # lrs2_av_v2's structure scaled down: fully scan-free
        "av_v2": dataclasses.replace(
            base,
            audio_encoder=EncoderConfig(
                hidden_units=(48,), encoder_type="transformer", num_heads=4,
                dropout_rate=0.0),
            video_encoder=EncoderConfig(
                hidden_units=(32,), encoder_type="transformer", num_heads=4,
                dropout_rate=0.0),
            fusion=FusionConfig(fusion_type="cross_attention", num_heads=4,
                                attention_units=24),
            decoder=DecoderConfig(decoder_type="transformer",
                                  embedding_dim=16, hidden_units=(48,),
                                  num_heads=4, attention_units=24,
                                  max_label_length=34, dropout_rate=0.0),
        ),
    }


def add_v2_warmup(arms):
    """av_v2 with a warmup-cosine lr schedule: transformers at a constant
    Adam lr plateau on this corpus (round-4 measurement); this arm tests
    whether the optimizer schedule — not the architecture — is the gap."""
    arms["av_v2_warmup"] = dataclasses.replace(
        arms["av_v2"],
        # num_epochs pins the cosine horizon (optim.build_schedule);
        # extending this arm past 150 epochs needs a fresh run dir
        train=dataclasses.replace(arms["av_v2"].train,
                                  lr_schedule="warmup_cosine",
                                  warmup_steps=400, learning_rate=2e-3,
                                  num_epochs=150),
    )
    # Round-4 follow-up: is the remaining ~0.05 CER v2 gap an epoch-budget
    # artifact?  Same arm with a 300-epoch cosine horizon (fresh run dir —
    # the horizon is baked into the schedule).  Run with --epochs 300.
    arms["av_v2_warmup300"] = dataclasses.replace(
        arms["av_v2"],
        train=dataclasses.replace(arms["av_v2"].train,
                                  lr_schedule="warmup_cosine",
                                  warmup_steps=400, learning_rate=2e-3,
                                  num_epochs=300),
    )
    # Round-4 follow-up 2: the 300-epoch arm got WORSE (more training ->
    # lower quality = overfitting), and unlike the full-scale lrs2_av_v2
    # preset (dropout 0.1) the campaign arms train UNregularized.  These
    # arms test regularization as the gap: label smoothing, dropout (the
    # preset's own value), and both — same warmup-cosine recipe.
    v2w = arms["av_v2_warmup"]

    def _with_dropout(cfg, rate):
        return dataclasses.replace(
            cfg,
            audio_encoder=dataclasses.replace(cfg.audio_encoder,
                                              dropout_rate=rate),
            video_encoder=dataclasses.replace(cfg.video_encoder,
                                              dropout_rate=rate),
            decoder=dataclasses.replace(cfg.decoder, dropout_rate=rate),
        )

    arms["av_v2_ls"] = dataclasses.replace(
        v2w, train=dataclasses.replace(v2w.train, label_smoothing=0.1))
    arms["av_v2_do"] = _with_dropout(v2w, 0.1)
    arms["av_v2_reg"] = dataclasses.replace(
        _with_dropout(v2w, 0.1),
        train=dataclasses.replace(v2w.train, label_smoothing=0.1))
    # Round-4 follow-up 3: av_v2_do (the best v2 arm — dropout 0.1, FAIL
    # by only .001-.015 CER) still lacks the LOCAL inductive bias the
    # recurrent encoders get for free.  This arm adds the conformer-style
    # depthwise time-conv module (EncoderConfig.conv_kernel,
    # models/transformer.py) to both transformer encoders — the direct
    # test of "the residual v2 gap = missing locality".  Kernel 7 at the
    # corpus's ~33 Hz stacked-frame rate ≈ 210 ms of context (audio);
    # 7 video frames at 25 fps ≈ 280 ms.
    v2do = arms["av_v2_do"]
    arms["av_v2_conv"] = dataclasses.replace(
        v2do,
        audio_encoder=dataclasses.replace(v2do.audio_encoder, conv_kernel=7),
        video_encoder=dataclasses.replace(v2do.video_encoder, conv_kernel=7),
    )
    # Kernel-width confirmation arm: kernel 15 ~= 450 ms at the corpus's
    # ~33 Hz frame rate (the kernel-7 arm missed 10 dB parity by 0.0001
    # CER and beat av_ref at -5 dB — a second width tests robustness of
    # the locality win, not just one lucky kernel).
    arms["av_v2_conv15"] = dataclasses.replace(
        v2do,
        audio_encoder=dataclasses.replace(v2do.audio_encoder, conv_kernel=15),
        video_encoder=dataclasses.replace(v2do.video_encoder, conv_kernel=15),
    )
    # Attribution + promotion candidate: av_fast_novdim (parity-PASS) with
    # ONLY the decoder swapped to the transformer (the bench sweep's
    # fastest arm structure, xa_tr_xfdec, sans vdim).  Parity here
    # isolates the decoder from the transformer ENCODERS (v2's other
    # half) and gates a further flagship promotion (~18.9 ms measured
    # with vdim).  Keeps the recurrent arms' plain constant-lr recipe
    # first; a warmup variant can follow if the decoder needs it.
    fn = arms["av_fast_novdim"]
    arms["av_fast_xfdec"] = dataclasses.replace(
        fn,
        decoder=dataclasses.replace(
            fn.decoder, decoder_type="transformer", num_heads=4),
    )
    arms["av_fast_xfdec_warmup"] = dataclasses.replace(
        arms["av_fast_xfdec"],
        train=dataclasses.replace(fn.train, lr_schedule="warmup_cosine",
                                  warmup_steps=400, learning_rate=2e-3,
                                  num_epochs=150),
    )
    # ---- round-5 arms (VERDICT r4 next #1/#3) ----
    # The fully scan-free flagship candidate: av_v2_conv15 (the round-4
    # parity-PASS arm) + pyramidal time reduction — the composition the
    # TPU sweep prices as v2_conv_tr_h6.  (2,) halves the ~33 Hz frame
    # rate before the single campaign-dims encoder layer, the same
    # mechanism the preset's (1,2,2) applies at full dims.  Parity here
    # gates promoting the first flagship with NO lax.scan anywhere.
    c15 = arms["av_v2_conv15"]
    arms["av_v2_conv15_tr"] = dataclasses.replace(
        c15,
        audio_encoder=dataclasses.replace(c15.audio_encoder,
                                          time_reduction=(2,)),
    )
    # Preset-vs-gate mismatch probe: lrs2_av_v2 ships memory_value_dim=256
    # (ratio 0.5 of d=512) but every parity-passing campaign arm ran WITHOUT
    # the value projection, and the fast family's campaign REJECTED vdim.
    # This arm tests vdim at the same 0.5 ratio (24 of d=48) on the
    # conv15 recipe: keep vdim in the preset only if it passes.
    arms["av_v2_conv15_vdim"] = dataclasses.replace(
        c15,
        fusion=dataclasses.replace(c15.fusion, memory_value_dim=24),
        decoder=dataclasses.replace(c15.decoder, memory_value_dim=24),
    )
    # ---- round-5 arms #2: the flagship's last measured lever ----
    # The round-4 component budget (RESULTS.md 4b) puts the audio BiLSTM
    # backward at 6.9 ms of the flagship's 19.1 — and its layer 1 still
    # scans at FULL frame rate under (1,2,2).  Two placements of the
    # pyramid, both on the promoted flagship's structure + recipe
    # (av_fast_xfdec_warmup):
    #   tr21 — (2,1): reduction moved BEFORE layer 1, same total factor
    #          (memory rate and the whole fusion/decoder quality surface
    #          unchanged); only layer 1's input becomes stacked frames.
    #   tr22 — (2,2): deeper pyramid, total factor 4 — memory at
    #          ~8.3 Hz = ~1 frame/char on this corpus (the riskier arm).
    fxw = arms["av_fast_xfdec_warmup"]
    arms["av_fast_tr21"] = dataclasses.replace(
        fxw,
        audio_encoder=dataclasses.replace(fxw.audio_encoder,
                                          time_reduction=(2, 1)),
    )
    arms["av_fast_tr22"] = dataclasses.replace(
        fxw,
        audio_encoder=dataclasses.replace(fxw.audio_encoder,
                                          time_reduction=(2, 2)),
    )
    return arms


def main():
    from avsr_tpu.avsr import AVSR
    from avsr_tpu.data.synthetic import SyntheticSpec, generate, make_noise_bank

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--epochs", type=int, default=36)
    parser.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "CAMPAIGN.json"))
    parser.add_argument("arms", nargs="*",
                        help="arm names to run (default: all)")
    args = parser.parse_args()

    corpus_spec = dict(min_chars=6, max_chars=32, alphabet="abcdefghijklmnop",
                       char_duration_s=0.12, roi=24)
    train_data = generate(SyntheticSpec(
        num_utterances=256, seed=21, **corpus_spec))
    eval_data = generate(SyntheticSpec(
        num_utterances=80, seed=22, **corpus_spec))  # HELD OUT
    # rows must cover the longest bucket's padded waveform (390 frames
    # x 160 samples = 62,400 + frame tail)
    bank = make_noise_bank(num_rows=4, row_samples=80_000, seed=3)

    arms = add_v2_warmup(build_arms())
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
        avsr = AVSR(config=cfg, run_dir=f"/tmp/campaign_{name}",
                    train_utterances=train_data, eval_utterances=eval_data,
                    noise_bank=bank)
        avsr.train(num_epochs=args.epochs,
                   try_restore_latest_checkpoint=True)
        train_s = time.time() - t0
        t1 = time.time()
        matrix = avsr.evaluate_noise_matrix(SNRS, use_beam=True)
        results[name] = {
            "cer": {cond: round(v["cer"], 4) for cond, v in matrix.items()},
            "wer": {cond: round(v["wer"], 4) for cond, v in matrix.items()},
            "epochs": args.epochs, "train_s": round(train_s, 1),
            "eval_s": round(time.time() - t1, 1),
        }
        payload = {
            "protocol": {
                "corpus": dict(corpus_spec, train_utts=256, eval_utts=80,
                               held_out_eval=True),
                "beam_width": 10, "snrs": ["clean", 10.0, 0.0, -5.0],
                "tolerance_abs_cer": TOL,
            },
            "arms": results,
        }
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)
            f.write("\n")
        print(json.dumps({name: results[name]}), flush=True)

    # ---- gates ----
    if "audio" not in results or "av_ref" not in results:
        print("# gates skipped: need audio + av_ref arms on file")
        return 0
    a = results["audio"]["cer"]
    ref = results["av_ref"]["cer"]
    failed = False
    gates = {}
    for name in [k for k in results if k not in ("audio",)]:
        av = results[name]["cer"]
        ordering = all(av[c] <= a[c] + TOL for c in NOISY)
        parity = all(av[c] <= ref[c] + TOL for c in av)
        gates[name] = {"ordering": ordering, "parity": parity}
        print(f"# {name}: ordering(noisy AV<=audio+{TOL})="
              f"{'PASS' if ordering else 'FAIL'} "
              f"parity(<=av_ref+{TOL} all conds)="
              f"{'PASS' if parity else 'FAIL'}")
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
