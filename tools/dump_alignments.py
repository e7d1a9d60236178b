"""Dump AV-Align cross-modal attention alignments for analysis.

The reference papers' central analysis artifact is the audio->video
attention alignment matrix (arXiv:1809.01728 Fig. 2: a roughly monotonic
diagonal when fusion works, degenerate rows when it does not).  This tool
runs the encoder on a batch and writes, per utterance:

  * ``<uid>_alignment.npy`` — [T_audio, T_video] attention weights
  * an ASCII heat-strip to stdout for a quick look without plotting deps

Usage:
  python tools/dump_alignments.py --synthetic 4 --out-dir /tmp/aligns
  python tools/dump_alignments.py --records data.tfrecord --ckpt runs/x \
      --out-dir aligns/
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def ascii_heat(mat: np.ndarray, width: int = 60, height: int = 16) -> str:
    """Downsample an alignment matrix to an ASCII heat map."""
    chars = " .:-=+*#%@"
    h, w = mat.shape
    ys = np.linspace(0, h - 1, min(height, h)).astype(int)
    xs = np.linspace(0, w - 1, min(width, w)).astype(int)
    sub = mat[np.ix_(ys, xs)]
    sub = sub / max(sub.max(), 1e-9)
    lines = []
    for row in sub:
        lines.append("".join(chars[int(v * (len(chars) - 1))] for v in row))
    return "\n".join(lines)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--records", default=None)
    ap.add_argument("--ckpt", default=None, help="run dir with checkpoints")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    import jax

    from avsr_tpu.avsr import AVSR
    from avsr_tpu.configs import ExperimentConfig
    from avsr_tpu.data.loader import to_model_batch
    from avsr_tpu.data.synthetic import SyntheticSpec, generate
    from avsr_tpu.models import seq2seq

    if args.synthetic:
        utts = generate(SyntheticSpec(num_utterances=args.synthetic))
    else:
        from avsr_tpu.data import tfrecord

        utts = tfrecord.read_dataset(args.records)

    cfg = ExperimentConfig(architecture="av_align", name="align_dump")
    cfg = cfg.replace(data=cfg.data.__class__(batch_size=args.batch))
    avsr = AVSR(config=cfg, run_dir=args.ckpt or "/tmp/align_dump",
                train_utterances=utts, eval_utterances=utts)
    if args.ckpt:
        avsr.trainer.try_restore_latest_checkpoint()

    os.makedirs(args.out_dir, exist_ok=True)
    encode = jax.jit(
        lambda p, b: seq2seq.encode(p, cfg, b, train=False).aux
    )
    for bucket, np_batch in avsr.eval_loader.epoch(shuffle=False):
        aux = encode(avsr.trainer.state.params, to_model_batch(np_batch))
        aligns = np.asarray(aux["av_alignments"])  # [T_a, B, T_v]
        a_len = np.asarray(aux["audio_feature_lengths"])
        v_len = np.asarray(np_batch["video_lengths"])
        for j in range(np_batch["num_real"]):
            uid = np_batch["uids"][j]
            mat = aligns[: a_len[j], j, : v_len[j]]
            np.save(os.path.join(args.out_dir, f"{uid}_alignment.npy"), mat)
            print(f"\n== {uid}  [{mat.shape[0]} audio x {mat.shape[1]} video]")
            print(ascii_heat(mat))


if __name__ == "__main__":
    main()
