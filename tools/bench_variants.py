"""Sequential TPU A/B sweep of bench.py's model-variant knobs.

Runs bench.py (the flagship AV-Align train-step benchmark) once per arm,
each in its own process (fresh compile cache semantics, no cross-arm
interference), and writes one JSON object per arm to BENCH_variants.json.
Arms cover the opt-in model extensions so their measured deltas live next
to the reference-parity flagship:

  flagship          vdim 256/256 (the bench default)
  reference_dims    no value projection (paper dims)
  time_reduction    audio pyramid (1,2,2) — LAS subsampling
  xf_encoder        transformer audio encoder (512x3, 8 heads)
  xa_fusion         scan-free cross-attention fusion
  v2_scanfree       the full scan-free family: transformer audio+video
                    encoders + cross-attention fusion + transformer decoder

Usage: python tools/bench_variants.py [arm ...]   (default: all, ordered
new-information-first so a short TPU window still yields the novel arms).
Each arm is a full bench.py run: ~4 min steady state plus a remote
compile that can take 2-15+ min per new program shape.  Results MERGE
into BENCH_variants.json by arm name (a partial re-run updates only the
arms it ran), so the sweep survives flaky device windows.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

ARMS = {
    # ordered by information value: unmeasured arms first (flagship and
    # reference_dims are already pinned at 42.0 / 47.0 ms in RESULTS.md).
    # ---- round-5 arms (VERDICT r4 next #1/#7) ----
    # (a) THE fully scan-free flagship candidate: conv15 (the quality
    # lever that made v2 pass held-out parity) + time reduction + matched
    # capacity (d=384) + dh=64 (the free MFU lever) + NO value projection
    # (vdim failed the held-out gate) — the composition of every round-4
    # keep decision.  Campaign gate: arm av_v2_conv15_tr.
    "v2_conv_tr_h6": {"AVSR_BENCH_XF": "384,3,6",
                      "AVSR_BENCH_XF_VIDEO": "384,1,6",
                      "AVSR_BENCH_XF_CONV": "15",
                      "AVSR_BENCH_TIME_REDUCTION": "1,2,2",
                      "AVSR_BENCH_FUSION_TYPE": "cross_attention",
                      "AVSR_BENCH_DECODER_TYPE": "transformer",
                      "AVSR_BENCH_FUSION_VDIM": "0",
                      "AVSR_BENCH_DECODER_VDIM": "0"},
    # (b) the width lever at equal quality: WIDER-but-shallower (d=512 x 2
    # audio layers vs 384 x 3 above; ~equal FLOPs since 2x512^2 ~= 3x384^2),
    # dh=64 (8 heads), same conv15+tr+novdim recipe.  time_reduction
    # (2,2) keeps the TOTAL factor at 4 so the fusion/decoder memory
    # length matches the h6 arm — the A/B isolates encoder width.  The
    # round-4 MFU analysis says wide matmuls tile the 128x128 MXU
    # better; this prices that claim at ~equal capacity.
    "v2_conv_tr_w512l2": {"AVSR_BENCH_XF": "512,2,8",
                          "AVSR_BENCH_XF_VIDEO": "512,1,8",
                          "AVSR_BENCH_XF_CONV": "15",
                          "AVSR_BENCH_TIME_REDUCTION": "2,2",
                          "AVSR_BENCH_FUSION_TYPE": "cross_attention",
                          "AVSR_BENCH_DECODER_TYPE": "transformer",
                          "AVSR_BENCH_FUSION_VDIM": "0",
                          "AVSR_BENCH_DECODER_VDIM": "0"},
    # Round-4 top-end arms (VERDICT r3 next #3): (a) v2 at MATCHED
    # capacity — d_model scaled 512 -> 384 so model FLOPs/step land at the
    # flagship's ~1.3 TFLOP (2.31 x (384/512)^2 ~= 1.30), replacing the
    # round-3 "~24 ms at matched compute" extrapolation with a number;
    # (b) the FULLY-composed scan-free stack — transformer encoders +
    # time reduction + cross-attention fusion + transformer decoder —
    # removing the last BiLSTM scans that xa_tr_xfdec still carries;
    # (c) the same at matched capacity, the <15 ms/step candidate.
    "v2_matched": {"AVSR_BENCH_XF": "384,3,8",
                   "AVSR_BENCH_XF_VIDEO": "384,1,8",
                   "AVSR_BENCH_FUSION_TYPE": "cross_attention",
                   "AVSR_BENCH_DECODER_TYPE": "transformer"},
    "v2_tr": {"AVSR_BENCH_XF": "512,3,8",
              "AVSR_BENCH_XF_VIDEO": "512,1,8",
              "AVSR_BENCH_TIME_REDUCTION": "1,2,2",
              "AVSR_BENCH_FUSION_TYPE": "cross_attention",
              "AVSR_BENCH_DECODER_TYPE": "transformer"},
    "v2_matched_tr": {"AVSR_BENCH_XF": "384,3,8",
                      "AVSR_BENCH_XF_VIDEO": "384,1,8",
                      "AVSR_BENCH_TIME_REDUCTION": "1,2,2",
                      "AVSR_BENCH_FUSION_TYPE": "cross_attention",
                      "AVSR_BENCH_DECODER_TYPE": "transformer"},
    # Round-4 counter-experiment (VERDICT r3 next #4): same arm with 6
    # heads instead of 8, so the per-head dim is the 64-lane-aligned 64
    # instead of 48 (identical FLOPs — H x dh == d either way).  Measured
    # -5% step time / +1.3 MFU points: head-dim lane alignment is real.
    "v2_matched_tr_h6": {"AVSR_BENCH_XF": "384,3,6",
                         "AVSR_BENCH_XF_VIDEO": "384,1,6",
                         "AVSR_BENCH_TIME_REDUCTION": "1,2,2",
                         "AVSR_BENCH_FUSION_TYPE": "cross_attention",
                         "AVSR_BENCH_DECODER_TYPE": "transformer"},
    # Round-3 combined arms stacking the measured single winners
    # (xa_fusion -27%, time_reduction -46%) on the recurrent encoders:
    "xa_tr": {"AVSR_BENCH_FUSION_TYPE": "cross_attention",
              "AVSR_BENCH_TIME_REDUCTION": "1,2,2"},
    # xa_tr WITHOUT the value down-projections: the arm that passes the
    # round-4 held-out quality campaign (CAMPAIGN.json: av_fast_novdim
    # parity PASS, av_fast w/ vdim parity FAIL) — the promotion candidate.
    "xa_tr_novdim": {"AVSR_BENCH_FUSION_TYPE": "cross_attention",
                     "AVSR_BENCH_TIME_REDUCTION": "1,2,2",
                     "AVSR_BENCH_FUSION_VDIM": "0",
                     "AVSR_BENCH_DECODER_VDIM": "0"},
    "xa_xfdec": {"AVSR_BENCH_FUSION_TYPE": "cross_attention",
                 "AVSR_BENCH_DECODER_TYPE": "transformer"},
    "xa_tr_xfdec": {"AVSR_BENCH_FUSION_TYPE": "cross_attention",
                    "AVSR_BENCH_TIME_REDUCTION": "1,2,2",
                    "AVSR_BENCH_DECODER_TYPE": "transformer"},
    # xa_tr_xfdec WITHOUT value down-projections (the sweep default is
    # vdim=256, which FAILS the held-out campaign): the only structure
    # faster than the promoted flagship that can also hold a quality
    # gate (campaign arm av_fast_xfdec).  Promotion candidate #2.
    "xa_tr_xfdec_novdim": {"AVSR_BENCH_FUSION_TYPE": "cross_attention",
                           "AVSR_BENCH_TIME_REDUCTION": "1,2,2",
                           "AVSR_BENCH_DECODER_TYPE": "transformer",
                           "AVSR_BENCH_FUSION_VDIM": "0",
                           "AVSR_BENCH_DECODER_VDIM": "0"},
    "v2_scanfree": {"AVSR_BENCH_XF": "512,3,8",
                    "AVSR_BENCH_XF_VIDEO": "512,1,8",
                    "AVSR_BENCH_FUSION_TYPE": "cross_attention",
                    "AVSR_BENCH_DECODER_TYPE": "transformer"},
    # Round-4: the conformer depthwise-conv module (EncoderConfig.
    # conv_kernel — the held-out campaign's v2 quality lever, arm
    # av_v2_conv) priced at the benched v2 dims.  kernel 15 at the
    # 100 Hz frame rate ~= 150 ms of local context.
    "v2_conv": {"AVSR_BENCH_XF": "512,3,8",
                "AVSR_BENCH_XF_VIDEO": "512,1,8",
                "AVSR_BENCH_XF_CONV": "15",
                "AVSR_BENCH_FUSION_TYPE": "cross_attention",
                "AVSR_BENCH_DECODER_TYPE": "transformer"},
    # Round-5: lrs2_av_v2 AS SHIPPED after the vdim drop (conv15, no
    # value projections) — preset dims == benched dims again.
    "v2_conv_novdim": {"AVSR_BENCH_XF": "512,3,8",
                       "AVSR_BENCH_XF_VIDEO": "512,1,8",
                       "AVSR_BENCH_XF_CONV": "15",
                       "AVSR_BENCH_FUSION_TYPE": "cross_attention",
                       "AVSR_BENCH_DECODER_TYPE": "transformer",
                       "AVSR_BENCH_FUSION_VDIM": "0",
                       "AVSR_BENCH_DECODER_VDIM": "0"},
    # Round-5: pyramid PLACEMENT on the promoted flagship — layer 1 of
    # the audio BiLSTM is the budget's largest slice (6.9 ms backward)
    # and (1,2,2) leaves it at full rate.  (2,2,1) keeps the total
    # factor (memory rate unchanged — same fusion/decoder quality
    # surface); (2,2,2) deepens it to 8.
    "xa_tr221_xfdec": {"AVSR_BENCH_FUSION_TYPE": "cross_attention",
                       "AVSR_BENCH_TIME_REDUCTION": "2,2,1",
                       "AVSR_BENCH_DECODER_TYPE": "transformer",
                       "AVSR_BENCH_FUSION_VDIM": "0",
                       "AVSR_BENCH_DECODER_VDIM": "0"},
    "xa_tr222_xfdec": {"AVSR_BENCH_FUSION_TYPE": "cross_attention",
                       "AVSR_BENCH_TIME_REDUCTION": "2,2,2",
                       "AVSR_BENCH_DECODER_TYPE": "transformer",
                       "AVSR_BENCH_FUSION_VDIM": "0",
                       "AVSR_BENCH_DECODER_VDIM": "0"},
    "time_reduction": {"AVSR_BENCH_TIME_REDUCTION": "1,2,2"},
    "xf_encoder": {"AVSR_BENCH_XF": "512,3,8"},
    "xa_fusion": {"AVSR_BENCH_FUSION_TYPE": "cross_attention"},
    # explicit knobs (not {}): an empty env now selects bench.py's dual
    # default mode (promoted fast + reference_dims), not this arm
    "flagship": {"AVSR_BENCH_FUSION_VDIM": "256",
                 "AVSR_BENCH_DECODER_VDIM": "256"},
    "reference_dims": {"AVSR_BENCH_FUSION_VDIM": "0",
                       "AVSR_BENCH_DECODER_VDIM": "0"},
}

PER_ARM_TIMEOUT_S = 40 * 60


def main() -> int:
    names = sys.argv[1:] or list(ARMS)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_path = os.path.join(root, "BENCH_variants.json")
    by_arm = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            by_arm = {r["arm"]: r for r in json.load(f)}
    # Arms must not inherit stray AVSR_BENCH_* vars from the caller's
    # shell: each arm's knob set is its COMPLETE variant definition, and a
    # leaked knob would mislabel every arm that doesn't override it.
    base_env = {k: v for k, v in os.environ.items()
                if not k.startswith("AVSR_BENCH_")}
    for name in names:
        env = dict(base_env, **ARMS[name])
        t0 = time.time()
        print(f"[bench_variants] {name}: {ARMS[name]}", flush=True)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(root, "bench.py")],
                capture_output=True, text=True, timeout=PER_ARM_TIMEOUT_S,
                env=env, cwd=root,
            )
            line = next(
                (ln for ln in reversed(proc.stdout.strip().splitlines())
                 if ln.startswith("{")), None,
            )
            if proc.returncode == 0 and line:
                rec = {"arm": name, "env": ARMS[name],
                       "wall_s": round(time.time() - t0, 1),
                       **json.loads(line)}
            else:
                rec = {"arm": name, "env": ARMS[name], "error": "bench failed",
                       "returncode": proc.returncode,
                       "stderr_tail": proc.stderr[-2000:]}
        except subprocess.TimeoutExpired:
            rec = {"arm": name, "env": ARMS[name],
                   "error": f"timeout after {PER_ARM_TIMEOUT_S}s"}
        print(json.dumps(rec), flush=True)
        by_arm[name] = rec
        with open(out_path, "w") as f:
            json.dump(list(by_arm.values()), f, indent=1)
            f.write("\n")
    ran = [by_arm[n] for n in names]
    ok = [r for r in ran if "error" not in r]
    print(f"[bench_variants] {len(ok)}/{len(ran)} arms ok "
          f"-> BENCH_variants.json ({len(by_arm)} arms on file)", flush=True)
    return 0 if len(ok) == len(ran) else 1


if __name__ == "__main__":
    sys.exit(main())
