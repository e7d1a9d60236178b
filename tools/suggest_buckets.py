"""Suggest bucket boundaries / label caps / per-bucket batch sizes for a
corpus.

The three bucket knobs are measured throughput levers
(`audio_bucket_boundaries`; `label_bucket_caps` +14%; `bucket_batch_sizes`
+21% on a 1-10 s mix — RESULTS.md round 3), but picking them needs the
corpus length distribution.  This tool scans a record corpus (streaming —
only lengths are decoded into memory) and proposes:

  * boundaries at duration quantiles (equal utterance mass per bucket);
  * per-bucket label caps at the bucket's p99 label length + margin
    (training horizon only — eval references are never truncated);
  * per-bucket batch sizes scaled inversely with the bucket's frame count
    against a reference budget (batch x frames ~= const, the measured HBM
    working-set rule: the 10 s bucket at B=128 ran superlinear), rounded
    down to multiples of ``--shards`` for mesh divisibility.

Usage:
  python tools/suggest_buckets.py RECORDS [--unit character] [--buckets 4]
      [--batch-budget 128x600] [--shards 8]
Prints a JSON proposal plus ready-to-paste --set flags.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def scan_corpus(records: str, unit_dict, frame_step=160, frame_length=400):
    """One streaming pass -> (audio_frames[N], label_lens[N])."""
    from avsr_tpu.data.grain_loader import open_sharded

    src = open_sharded(records)
    frames, labels = [], []
    for i in range(len(src)):
        u = src[i]
        if u.waveform is not None:
            n = max((len(u.waveform) - frame_length) // frame_step + 1, 1)
        elif u.video is not None:
            n = u.video.shape[0] * 4  # 25 fps -> 100 Hz equivalent
        else:
            continue
        frames.append(n)
        labels.append(len(unit_dict.encode(u.transcript)))
    return np.asarray(frames), np.asarray(labels)


def propose(frames, labels, n_buckets, ref_batch, ref_frames, shards):
    qs = np.linspace(0, 100, n_buckets + 1)[1:]
    bounds = [int(np.ceil(np.percentile(frames, q))) for q in qs]
    # dedupe / enforce monotonicity on clumped distributions
    out_bounds = []
    for b in bounds:
        out_bounds.append(max(b, out_bounds[-1] + 1) if out_bounds else b)
    caps, sizes = [], []
    lo = 0
    for b in out_bounds:
        in_bucket = (frames > lo) & (frames <= b)
        if in_bucket.any():
            cap = int(np.percentile(labels[in_bucket], 99) + 2)
        else:
            cap = int(labels.max() + 2)
        caps.append(cap)
        # batch x bucket-frames ~= ref budget, snapped to shard multiples
        bs = int(ref_batch * ref_frames / max(b, 1))
        bs = max((bs // shards) * shards, shards)
        sizes.append(bs)
        lo = b
    return out_bounds, caps, sizes


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("records", help="record path / shard glob / comma list")
    ap.add_argument("--unit", default="character")
    ap.add_argument("--buckets", type=int, default=4)
    ap.add_argument("--batch-budget", default="128x600",
                    help="reference BATCHxFRAMES working-set budget "
                         "(default: the measured-good B=128 at 6 s)")
    ap.add_argument("--shards", type=int, default=1,
                    help="round batch sizes to multiples of this "
                         "(mesh data-axis divisibility)")
    args = ap.parse_args()

    from avsr_tpu.data.units import builtin_unit_dict

    units = builtin_unit_dict(args.unit)
    frames, labels = scan_corpus(args.records, units)
    if len(frames) == 0:
        raise SystemExit("no utterances with audio/video found")
    ref_batch, ref_frames = (int(x) for x in args.batch_budget.split("x"))
    bounds, caps, sizes = propose(
        frames, labels, args.buckets, ref_batch, ref_frames, args.shards
    )
    out = {
        "num_utterances": int(len(frames)),
        "audio_frames": {
            "p50": float(np.percentile(frames, 50)),
            "p90": float(np.percentile(frames, 90)),
            "max": int(frames.max()),
        },
        "label_len_max": int(labels.max()),
        "audio_bucket_boundaries": bounds,
        "label_bucket_caps": caps,
        "bucket_batch_sizes": sizes,
        "max_label_length": int(labels.max() + 2),
    }
    print(json.dumps(out, indent=2))
    print("# paste into the CLI:")
    print(f"#   --set data.audio_bucket_boundaries={json.dumps(bounds)} \\")
    print(f"#   --set data.label_bucket_caps={json.dumps(caps)} \\")
    print(f"#   --set data.bucket_batch_sizes={json.dumps(sizes)} \\")
    print(f"#   --set data.max_label_length={out['max_label_length']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
