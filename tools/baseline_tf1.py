"""Measured TF1-CPU baseline: the reference's AV-Align training step.

BASELINE.json's north star is ">=5x TF1-CPU training throughput", but no
reference numbers exist in this environment (BASELINE.md §A was TBD and
bench.py divided by an ASSUMED 1,500 frames/s).  TensorFlow 2.21 is
installed and ships the complete TF1 graph API under ``tf.compat.v1`` —
``dynamic_rnn``, ``bidirectional_dynamic_rnn``, ``LSTMCell``, graph-mode
``Session.run`` — so the baseline is now MEASURABLE: this tool builds the
reference architecture the way the reference built it (upstream:avsr/
seq2seq.py per SURVEY.md §2.2/§3.1; tf.contrib.seq2seq's AttentionWrapper
is gone in TF2, so the same mechanism is hand-rolled as an RNNCell) and
times per-step ``session.run(train_op)`` on this host's CPU.

Faithfulness notes (everything at bench.py's flagship shapes):
  * in-graph tf.signal frontend: STFT 25 ms/10 ms -> 30-bin log-mel ->
    delta/delta-delta -> stack 8 skip 3 -> per-utterance normalization
    (matches AudioFrontendConfig defaults = upstream:avsr/audio.py);
  * video: per-frame CNN (8,16,32)x3x3 stride 2 -> 128-dim embedding
    (VideoFrontendConfig defaults = upstream:avsr/video.py);
  * audio encoder: 3x BiLSTM(256) via bidirectional_dynamic_rnn; video
    encoder: 1x BiLSTM(256);
  * AV-Align: a unidirectional LSTM(256) whose cell is wrapped with
    Bahdanau attention (128 units) over the video memory, input feeding
    on — the AttentionWrapper(audio_top_cell, memory=video) mechanism of
    arXiv:1809.01728 — producing the fused [audio_out ; video_ctx] memory;
  * decoder: embedding 128 -> attention-wrapped LSTM(256) over the fused
    memory (teacher forcing) -> vocab projection -> masked sequence CE;
  * Adam + clip_by_global_norm, one session.run per step (the TF1
    executor's per-step Python<->C++ round trip, SURVEY.md §3.1).

TF stays OUT of the training framework (CLAUDE.md rule): this is a
standalone bench tool, run manually, writing BASELINE_tf1.json.

Usage: python tools/baseline_tf1.py [--batch 16] [--steps 20] [--quick]
Prints one JSON line {metric, value, unit, ...}; ~5-20 min per batch size
on this 1-core host.
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")

# Shapes mirror bench.py exactly.
SECONDS = 6.0
SAMPLE_RATE = 16_000
SAMPLES = int(SAMPLE_RATE * SECONDS)
VIDEO_FRAMES = int(SECONDS * 25)
ROI = 36
LABEL_LEN = 48
VOCAB = 31
HIDDEN = 256
ATT_UNITS = 128
EMBED = 128
MEL_BINS = 30
STACK, SKIP = 8, 3


def build_graph(tf, batch: int):
    v1 = tf.compat.v1

    wav = v1.placeholder(tf.float32, [batch, SAMPLES], name="wav")
    video = v1.placeholder(
        tf.float32, [batch, VIDEO_FRAMES, ROI, ROI, 1], name="video")
    targets = v1.placeholder(tf.int32, [batch, LABEL_LEN], name="targets")

    # ---- audio frontend (upstream:avsr/audio.py; tf.signal in-graph) ----
    stft = tf.signal.stft(wav, frame_length=400, frame_step=160,
                          fft_length=512)
    power = tf.math.square(tf.abs(stft))  # [B, T, 257]
    mel_mat = tf.signal.linear_to_mel_weight_matrix(
        MEL_BINS, 257, SAMPLE_RATE, 80.0, 7600.0)
    logmel = tf.math.log(tf.matmul(power, mel_mat) + 1e-6)  # [B, T, 30]

    def delta(x):  # standard 2-tap regression deltas
        num = sum(n * (shift(x, -n) - shift(x, n)) for n in (1, 2))
        return num / (2.0 * (1 + 4))

    def shift(x, n):
        if n == 0:
            return x
        pad = tf.zeros_like(x[:, :abs(n)])
        return (tf.concat([x[:, n:], pad], 1) if n > 0
                else tf.concat([pad, x[:, :n]], 1))

    d1 = delta(logmel)
    feats = tf.concat([logmel, d1, delta(d1)], -1)  # [B, T, 90]
    # frame stacking 8, hop 3
    stacked = tf.signal.frame(feats, STACK, SKIP, axis=1)  # [B,T',8,90]
    t_enc = stacked.shape[1]
    stacked = tf.reshape(stacked, [batch, int(t_enc), STACK * 3 * MEL_BINS])
    mean, var = tf.nn.moments(stacked, axes=[1], keepdims=True)
    audio_feats = (stacked - mean) * tf.math.rsqrt(var + 1e-6)

    # tf.compat.v1.layers is gone under Keras 3; raw-variable dense/conv
    # (what the layers wrapped anyway).
    def dense(x, units, name, use_bias=True, activation=None):
        with v1.variable_scope(name, reuse=v1.AUTO_REUSE):
            w = v1.get_variable("kernel", [int(x.shape[-1]), units])
            y = (tf.einsum("...i,ij->...j", x, w) if x.shape.rank > 2
                 else tf.matmul(x, w))
            if use_bias:
                y = y + v1.get_variable(
                    "bias", [units], initializer=tf.zeros_initializer())
        return activation(y) if activation else y

    # ---- video frontend (upstream:avsr/video.py) ----
    x = tf.reshape(video, [batch * VIDEO_FRAMES, ROI, ROI, 1])
    for i, ch in enumerate((8, 16, 32)):
        with v1.variable_scope(f"conv{i}"):
            k = v1.get_variable("kernel", [3, 3, int(x.shape[-1]), ch])
            b = v1.get_variable("bias", [ch],
                                initializer=tf.zeros_initializer())
        x = tf.nn.relu(
            tf.nn.conv2d(x, k, strides=2, padding="SAME") + b)
    x = tf.reshape(x, [batch * VIDEO_FRAMES, -1])
    vemb = dense(x, EMBED, "video_emb", activation=tf.nn.relu)
    video_feats = tf.reshape(vemb, [batch, VIDEO_FRAMES, EMBED])

    class RawLSTMCell:
        """Standard LSTM cell, duck-typed for tf.compat.v1.nn.dynamic_rnn
        (the Keras-backed v1.nn.rnn_cell is unavailable under Keras 3).
        Weights are created eagerly so nothing allocates inside the
        while_loop body — same fused [x,h]@W gate layout as TF1's
        BasicLSTMCell."""

        def __init__(self, num_units, in_dim, name):
            self._units = num_units
            with v1.variable_scope(name):
                self._w = v1.get_variable(
                    "kernel", [in_dim + num_units, 4 * num_units])
                self._b = v1.get_variable(
                    "bias", [4 * num_units],
                    initializer=tf.zeros_initializer())

        @property
        def state_size(self):
            return (self._units, self._units)

        @property
        def output_size(self):
            return self._units

        def zero_state(self, batch_size, dtype):
            return (tf.zeros([batch_size, self._units], dtype),
                    tf.zeros([batch_size, self._units], dtype))

        def __call__(self, inputs, state, scope=None):
            c, h = state
            z = tf.matmul(tf.concat([inputs, h], 1), self._w) + self._b
            i, f, g, o = tf.split(z, 4, axis=1)
            c = tf.sigmoid(f + 1.0) * c + tf.sigmoid(i) * tf.tanh(g)
            h = tf.sigmoid(o) * tf.tanh(c)
            return h, (c, h)

    def bilstm_stack(inp, layers, scope):
        out = inp
        with v1.variable_scope(scope):
            for i in range(layers):
                d = int(out.shape[-1])
                (fw, bw), _ = v1.nn.bidirectional_dynamic_rnn(
                    RawLSTMCell(HIDDEN, d, f"fw{i}"),
                    RawLSTMCell(HIDDEN, d, f"bw{i}"), out,
                    dtype=tf.float32, scope=f"bi{i}")
                out = tf.concat([fw, bw], -1)
        return out

    audio_enc = bilstm_stack(audio_feats, 3, "audio_encoder")  # [B,T',512]
    video_enc = bilstm_stack(video_feats, 1, "video_encoder")  # [B,Tv,512]

    class BahdanauAttnCell:
        """AttentionWrapper semantics (tf.contrib is gone in TF2): Bahdanau
        score over a fixed memory, context concatenated to the cell input
        (input feeding) and to the cell output.  Duck-typed for
        dynamic_rnn; all weights created eagerly."""

        def __init__(self, cell, memory, scope):
            self._cell = cell
            self._memory = memory  # [B, S, D]
            self._dmem = int(memory.shape[-1])
            with v1.variable_scope(scope):
                self._keys = dense(memory, ATT_UNITS, "keys",
                                   use_bias=False)
                self._v = v1.get_variable("v", [ATT_UNITS])
                self._wq = v1.get_variable(
                    "query_kernel", [cell.output_size, ATT_UNITS])

        @property
        def state_size(self):
            return (self._cell.state_size, self._dmem)

        @property
        def output_size(self):
            return self._cell.output_size + self._dmem

        def zero_state(self, batch_size, dtype):
            return (self._cell.zero_state(batch_size, dtype),
                    tf.zeros([batch_size, self._dmem], dtype))

        def __call__(self, inputs, state, scope=None):
            cell_state, prev_ctx = state
            out, new_state = self._cell(
                tf.concat([inputs, prev_ctx], -1), cell_state)
            q = tf.matmul(out, self._wq)
            e = tf.reduce_sum(
                self._v * tf.tanh(self._keys + q[:, None, :]), -1)
            a = tf.nn.softmax(e)  # [B, S]
            ctx = tf.einsum("bs,bsd->bd", a, self._memory)
            return tf.concat([out, ctx], -1), (new_state, ctx)

    # ---- AV-Align fusion (arXiv:1809.01728): audio attends video ----
    dmem_v = int(video_enc.shape[-1])
    fusion_cell = BahdanauAttnCell(
        RawLSTMCell(HIDDEN, int(audio_enc.shape[-1]) + dmem_v,
                    "fusion_lstm"), video_enc, "av_align")
    fused, _ = v1.nn.dynamic_rnn(fusion_cell, audio_enc, dtype=tf.float32,
                                 scope="fusion")  # [B, T', 256+512]

    # ---- decoder: teacher forcing over the fused memory ----
    emb_table = v1.get_variable("embedding", [VOCAB, EMBED])
    go = tf.ones([batch, 1], tf.int32)  # GO=1
    dec_in = tf.nn.embedding_lookup(
        emb_table, tf.concat([go, targets[:, :-1]], 1))
    dec_cell = BahdanauAttnCell(
        RawLSTMCell(HIDDEN, EMBED + int(fused.shape[-1]), "decoder_lstm"),
        fused, "dec_attn")
    dec_out, _ = v1.nn.dynamic_rnn(dec_cell, dec_in, dtype=tf.float32,
                                   scope="decoder")
    logits = dense(dec_out, VOCAB, "proj")

    ce = tf.nn.sparse_softmax_cross_entropy_with_logits(
        labels=targets, logits=logits)
    mask = tf.cast(tf.not_equal(targets, 0), tf.float32)  # PAD=0
    loss = tf.reduce_sum(ce * mask) / tf.maximum(tf.reduce_sum(mask), 1.0)

    opt = v1.train.AdamOptimizer(1e-4)
    grads, tvars = zip(*opt.compute_gradients(loss))
    grads, _ = tf.clip_by_global_norm(grads, 1.0)
    train_op = opt.apply_gradients(zip(grads, tvars))
    return wav, video, targets, loss, train_op, int(t_enc)


def measure(tf, batch: int, steps: int, warmup: int) -> dict:
    v1 = tf.compat.v1
    v1.reset_default_graph()
    t_build0 = time.perf_counter()
    with tf.Graph().as_default():
        wav_ph, vid_ph, tgt_ph, loss, train_op, t_enc = build_graph(tf, batch)
        rng = np.random.default_rng(0)
        feed = {
            wav_ph: rng.standard_normal((batch, SAMPLES)).astype(np.float32),
            vid_ph: rng.standard_normal(
                (batch, VIDEO_FRAMES, ROI, ROI, 1)).astype(np.float32),
            tgt_ph: rng.integers(3, VOCAB, (batch, LABEL_LEN)).astype(
                np.int32),
        }
        with v1.Session() as sess:
            sess.run(v1.global_variables_initializer())
            build_s = time.perf_counter() - t_build0
            for _ in range(warmup):
                sess.run([train_op, loss], feed)
            t0 = time.perf_counter()
            last = None
            for _ in range(steps):
                _, last = sess.run([train_op, loss], feed)
            dt = time.perf_counter() - t0
    assert np.isfinite(last)
    # 10 ms audio frames consumed per step — bench.py's exact formula.
    frames_per_step = batch * int((SAMPLES - 400) / 160 + 1)
    return {
        "batch": batch, "steps": steps,
        "ms_per_step": round(dt / steps * 1e3, 1),
        "frames_per_sec": round(frames_per_step * steps / dt, 1),
        "build_plus_init_s": round(build_s, 1),
        "t_enc": t_enc, "final_loss": round(float(last), 4),
    }


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, nargs="*", default=[16, 64],
                   help="batch sizes to measure (best frames/s is the "
                        "baseline — generous to TF1)")
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--quick", action="store_true",
                   help="B=2, 2 steps: smoke-test the graph only")
    args = p.parse_args()

    import tensorflow as tf

    tf.compat.v1.disable_eager_execution()
    tf.compat.v1.disable_v2_behavior()

    if args.quick:
        batches, steps, warmup = [2], 2, 1
    else:
        batches, steps, warmup = args.batch, args.steps, args.warmup

    runs = []
    for b in batches:
        r = measure(tf, b, steps, warmup)
        print(json.dumps({"tf1_cpu_arm": r}), flush=True)
        runs.append(r)

    best = max(runs, key=lambda r: r["frames_per_sec"])
    result = {
        "metric": "tf1_cpu_train_frames_per_sec",
        "value": best["frames_per_sec"],
        "unit": "10ms audio frames/sec (TF1 graph-mode AV-Align train step, "
                f"CPU x{os.cpu_count()})",
        "tf_version": tf.__version__,
        "runs": runs,
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BASELINE_tf1.json")
    if not args.quick:
        with open(out, "w") as f:
            json.dump(result, f, indent=1)
            f.write("\n")
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
