"""Name the scan-free family's MFU bound (VERDICT r3 next #4).

The v2/scan-free arms were built to escape the BiLSTM scan bound, yet top
out at ~25-28% MFU.  This tool decomposes a scan-free arm's step two ways:

  1. component level (frontend / encode / fwd loss / grad / train step),
     like tools/profile_components.py, via the real model APIs;
  2. op-class level: standalone jitted micro-probes at the ARM'S OWN
     shapes replicating each op class of a transformer layer — QKV+output
     projections, attention energies+softmax+context, the FF block,
     layernorms, residual-stream dtype bounces — each timed fwd and grad,
     next to its analytic MXU time (flops / 197 TFLOP/s bf16) and HBM
     floor (bytes / 819 GB/s), so the non-MXU time has a NAME.

Model variant comes from the shared AVSR_BENCH_* env knobs
(avsr_tpu/utils/bench_knobs.py) — point it at any sweep arm, e.g.:

  AVSR_BENCH_XF=384,3,8 AVSR_BENCH_XF_VIDEO=384,1,8 \
  AVSR_BENCH_TIME_REDUCTION=1,2,2 \
  AVSR_BENCH_FUSION_TYPE=cross_attention \
  AVSR_BENCH_DECODER_TYPE=transformer \
      python tools/profile_scanfree.py [B]

Timing: chained launches with one true host fetch (the relay's
block_until_ready returns early — CLAUDE.md).  Micro-probe numbers carry
~27ms/steps relay amortization like profile_components.py; deltas and
ratios are what matter.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16 = 197e12
HBM_GBPS = 819e9
STEPS = int(os.environ.get("AVSR_PROFILE_STEPS", "16"))


def timeit(raw_fn, *args, steps=None):
    steps = steps or STEPS
    import jax
    import jax.numpy as jnp

    def scalar_fn(*a):
        out = raw_fn(*a)
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "dtype")
                  and jnp.issubdtype(x.dtype, jnp.floating)]
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    fn = jax.jit(scalar_fn)
    _ = float(fn(*args))  # compile + TRUE host drain
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(steps)]
    _ = float(outs[-1])
    return (time.perf_counter() - t0) / steps


def grad_timeit(raw_fn, *args, steps=None):
    steps = steps or min(STEPS, 12)
    import jax
    import jax.numpy as jnp

    def scalar_fn(*a):
        out = raw_fn(*a)
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "dtype")
                  and jnp.issubdtype(x.dtype, jnp.floating)]
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    g = jax.jit(jax.grad(scalar_fn))

    def fetch(o):
        return float(jax.tree_util.tree_leaves(o)[0].ravel()[0])

    out = g(*args)
    fetch(out)
    t0 = time.perf_counter()
    for _ in range(steps):
        out = g(*args)
    fetch(out)
    return (time.perf_counter() - t0) / steps


DISPATCH_FLOOR_S = 0.0  # measured null-program launch cost, set in main()


def row(tag, t_s, flops=None, bytes_=None):
    ms = t_s * 1e3
    parts = [f"{tag:34s} {ms:8.2f} ms"]
    if DISPATCH_FLOOR_S:
        parts.append(f"net {max(0.0, (t_s - DISPATCH_FLOOR_S)) * 1e3:6.2f} ms")
    if flops:
        parts.append(f"mxu-floor {flops / PEAK_BF16 * 1e3:6.2f} ms"
                     f" ({flops / PEAK_BF16 / t_s * 100:5.1f}% MXU)")
    if bytes_:
        parts.append(f"hbm-floor {bytes_ / HBM_GBPS * 1e3:6.2f} ms")
    print("  ".join(parts), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from avsr_tpu.configs import (
        AudioFrontendConfig, DecoderConfig, ExperimentConfig,
        FusionConfig, TrainConfig, VideoFrontendConfig,
    )
    from avsr_tpu.models import seq2seq
    from avsr_tpu.models.seq2seq import Batch
    from avsr_tpu.train import step as step_lib
    from avsr_tpu.utils.bench_knobs import variant_from_env

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    S, VF, K, VOCAB = 96000, 150, 48, 31
    var = variant_from_env()
    cfg = ExperimentConfig(
        architecture="av_align",
        audio=AudioFrontendConfig(),
        video=VideoFrontendConfig(),
        audio_encoder=var.audio_encoder,
        video_encoder=var.video_encoder,
        fusion=FusionConfig(attention_units=128,
                            memory_value_dim=var.fusion_value_dim,
                            fusion_type=var.fusion_type),
        decoder=DecoderConfig(embedding_dim=128, hidden_units=(256,),
                              attention_units=128, max_label_length=K,
                              decoder_type=var.decoder_type,
                              sampling_probability=(
                                  var.decoder_sampling_probability),
                              memory_value_dim=var.decoder_value_dim),
        train=TrainConfig(compute_dtype="bfloat16"),
        name="profile_scanfree",
    )
    rng = np.random.default_rng(0)
    batch = Batch(
        audio=jnp.asarray(rng.standard_normal((B, S)).astype(np.float32)),
        audio_lengths=jnp.asarray([S] * B, jnp.int32),
        video=jnp.asarray(
            rng.standard_normal((B, VF, 36, 36, 1)).astype(np.float32)),
        video_lengths=jnp.asarray([VF] * B, jnp.int32),
        targets=jnp.asarray(rng.integers(3, VOCAB, (B, K)), jnp.int32),
        target_lengths=jnp.asarray([K] * B, jnp.int32),
    )
    params = seq2seq.model_init(jax.random.PRNGKey(0), cfg, VOCAB)

    enc_cfg = cfg.audio_encoder
    d = enc_cfg.hidden_units[0]
    n_layers = len(enc_cfg.hidden_units)
    heads = enc_cfg.num_heads
    is_xf = enc_cfg.encoder_type == "transformer"

    # ---- component level ----
    print(f"# arm: audio_encoder={enc_cfg.encoder_type} d={d} x{n_layers} "
          f"h{heads} tr={enc_cfg.time_reduction} fusion={cfg.fusion.fusion_type} "
          f"decoder={cfg.decoder.decoder_type}  B={B}", flush=True)

    # Every chained jit launch on the axon relay carries a fixed dispatch
    # cost that dwarfs tiny programs (round-4 probe table: softmax alone ==
    # layernorm alone == transpose alone ~= 1.6 ms vs 0.02 ms HBM floor).
    # Measure it with a null program and report every row net of it.
    global DISPATCH_FLOOR_S
    t_null = timeit(lambda z: z * 1.0, jnp.ones((8,), jnp.float32))
    row("null jit (chained dispatch floor)", t_null)
    DISPATCH_FLOOR_S = t_null

    t = timeit(lambda p, b: seq2seq.encode(p, cfg, b,
                                           train=False).memories[0].values,
               params, batch)
    row("full encode (fwd)", t)
    t = timeit(lambda p, b: seq2seq.loss_fn(p, cfg, b, train=False)[0],
               params, batch)
    row("loss (fwd)", t)
    t = grad_timeit(lambda p, b: seq2seq.loss_fn(p, cfg, b, train=True)[0],
                    params, batch, steps=12)
    row("grad (fwd+bwd)", t)

    state, tx = step_lib.create_train_state(jax.random.PRNGKey(0), cfg,
                                            VOCAB, 1000)
    ts = step_lib.make_jitted_train_step(cfg, tx)
    key = jax.random.PRNGKey(1)
    state, m = ts(state, batch, key)
    float(m["loss"])
    n_ts = min(STEPS, 12)
    t0 = time.perf_counter()
    for _ in range(n_ts):
        state, m = ts(state, batch, key)
    float(m["loss"])
    row("full train step", (time.perf_counter() - t0) / n_ts)

    # ---- frontend / encoder / fusion split (works for any arm) ----
    from avsr_tpu.models import fusion as fus
    from avsr_tpu.models import video_cnn
    from avsr_tpu.models.encoder import encoder_apply, encoder_output_lengths
    from avsr_tpu.ops.audio_features import num_frames
    from avsr_tpu.ops.audio_features import logmel_frontend

    cdtm = seq2seq.compute_dtype_of(cfg)
    acfg = cfg.audio
    F0 = num_frames(S, acfg.frame_length, acfg.frame_step)
    # windowed rFFT as two MXU matmuls: [B*F0, frame_len] @ [frame_len, bins]
    dft_flops = 2 * B * F0 * acfg.frame_length * 2 * (acfg.fft_length // 2 + 1)
    t = timeit(lambda w, l: logmel_frontend(w, l, acfg, compute_dtype=cdtm)[0],
               batch.audio, batch.audio_lengths)
    feats, feat_len = jax.jit(
        lambda w, l: logmel_frontend(w, l, acfg, compute_dtype=cdtm)
    )(batch.audio, batch.audio_lengths)
    fe_bytes = batch.audio.nbytes + 2 * feats.size * 4
    row("audio frontend (fwd)", t, flops=dft_flops, bytes_=fe_bytes)

    t = timeit(lambda p, v, l: video_cnn.video_cnn_apply(
        p, cfg.video, v, l, compute_dtype=cdtm)[0],
        params["video_frontend"], batch.video, batch.video_lengths)
    row("video frontend CNN (fwd)", t)
    v_emb, v_len = jax.jit(lambda p, v, l: video_cnn.video_cnn_apply(
        p, cfg.video, v, l, compute_dtype=cdtm))(
        params["video_frontend"], batch.video, batch.video_lengths)

    feats_tb = jnp.transpose(feats, (1, 0, 2))
    v_tb = jnp.transpose(v_emb, (1, 0, 2))
    Tfe = feats.shape[1]

    aenc_flops = None
    if is_xf:
        # per layer: q/k/v/o proj 8BTd^2 + attn einsums 4BT^2d + ff 16BTd^2
        aenc_flops, T_i = 0, Tfe
        tr = enc_cfg.time_reduction or (1,) * n_layers
        for i in range(n_layers):
            T_i = max(1, T_i // (tr[i] if i < len(tr) else 1))
            aenc_flops += 24 * B * T_i * d * d + 4 * B * T_i * T_i * d

    def aenc(p, x, l):
        return encoder_apply(p, cfg.audio_encoder, x, l,
                             compute_dtype=cdtm)[0]

    t = timeit(aenc, params["audio_encoder"], feats_tb, feat_len)
    row("audio encoder stack (fwd)", t, flops=aenc_flops)
    t = grad_timeit(aenc, params["audio_encoder"], feats_tb, feat_len,
                    steps=12)
    row("audio encoder stack (grad)", t,
        flops=aenc_flops * 3 if aenc_flops else None)

    def venc(p, x, l):
        return encoder_apply(p, cfg.video_encoder, x, l, compute_dtype=cdtm)[0]

    t = timeit(venc, params["video_encoder"], v_tb, v_len)
    row("video encoder stack (fwd)", t)

    if cfg.architecture == "av_align":
        audio_out_tb = jax.jit(aenc)(params["audio_encoder"], feats_tb,
                                     feat_len)
        video_out_tb = jax.jit(venc)(params["video_encoder"], v_tb, v_len)
        a_len = encoder_output_lengths(cfg.audio_encoder, feat_len)
        v_len2 = encoder_output_lengths(cfg.video_encoder, v_len)
        video_mem = jnp.transpose(video_out_tb, (1, 0, 2))
        fusion_apply = (
            fus.cross_attention_fusion_apply
            if cfg.fusion.fusion_type == "cross_attention"
            else fus.av_align_apply
        )

        def fuse(p, a, v):
            return fusion_apply(p, cfg.fusion, a, a_len, v, v_len2,
                                compute_dtype=cdtm).fused

        t = timeit(fuse, params["fusion"], audio_out_tb, video_mem)
        row(f"{cfg.fusion.fusion_type} fusion (fwd)", t)
        t = grad_timeit(fuse, params["fusion"], audio_out_tb, video_mem,
                        steps=12)
        row(f"{cfg.fusion.fusion_type} fusion (grad)", t)
    print("# decoder+CE fwd ~= loss(fwd) - encode(fwd); optimizer ~= "
          "train_step - grad", flush=True)

    if not is_xf:
        print("# (op-class probes need a transformer audio encoder; set "
              "AVSR_BENCH_XF)")
        return

    # ---- op-class level at the arm's post-frontend shapes ----
    # stacked-frame count at the frontend output, after pyramid reduction
    T0 = int((S / 160 - 7) // 3)  # stack 8 skip 3 at 10 ms frames
    from avsr_tpu.models.encoder import total_time_reduction

    T = max(1, T0 // total_time_reduction(enc_cfg))
    dh = d // heads
    cdt = jnp.bfloat16
    print(f"# probe shapes: [B={B}, T={T}, d={d}], heads={heads}, dh={dh}",
          flush=True)
    kx, kw = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(kx, (B, T, d), jnp.float32)
    wq, wk, wv, wo = (jax.random.normal(k, (d, d), jnp.float32) * 0.02
                      for k in jax.random.split(kw, 4))
    w1 = jax.random.normal(kw, (d, 4 * d), jnp.float32) * 0.02
    w2 = jax.random.normal(kw, (4 * d, d), jnp.float32) * 0.02
    wqkv = jnp.concatenate([wq, wk, wv], axis=1)  # [d, 3d]

    def qkv_separate(x, wq, wk, wv, wo):
        xb = x.astype(cdt)
        q = xb @ wq.astype(cdt)
        k = xb @ wk.astype(cdt)
        v = xb @ wv.astype(cdt)
        return (q + k + v) @ wo.astype(cdt)

    def qkv_fused(x, wqkv, wo):
        xb = x.astype(cdt)
        qkv = xb @ wqkv.astype(cdt)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return (q + k + v) @ wo.astype(cdt)

    def attn_core(x, wq, wk, wv, wo):
        """energies + softmax + context at the arm's shapes (the
        [B,H,T,T] materialization suspect)."""
        xb = x.astype(cdt)
        q = (xb @ wq.astype(cdt)).reshape(B, T, heads, dh)
        k = (xb @ wk.astype(cdt)).reshape(B, T, heads, dh)
        v = (xb @ wv.astype(cdt)).reshape(B, T, heads, dh)
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        w = jax.nn.softmax(s / np.sqrt(dh), axis=-1).astype(cdt)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", w, v).reshape(B, T, d)
        return ctx @ wo.astype(cdt)

    def softmax_only(s):
        return jax.nn.softmax(s.astype(jnp.float32), axis=-1)

    def ff_block(x, w1, w2):
        xb = x.astype(cdt)
        return jax.nn.gelu(xb @ w1.astype(cdt)) @ w2.astype(cdt)

    def ln_probe(x, g, b):
        from avsr_tpu.models.transformer_common import layer_norm
        return layer_norm(x, g, b)

    proj_flops = 2 * B * T * d * d * 4  # q,k,v,o
    t = timeit(qkv_separate, x, wq, wk, wv, wo)
    row("qkv+o projections (separate)", t, flops=proj_flops)
    t = timeit(qkv_fused, x, wqkv, wo)
    row("qkv+o projections (fused qkv)", t, flops=proj_flops)

    attn_flops = proj_flops + 2 * B * heads * T * T * dh * 2
    attn_bytes = (B * heads * T * T * 4) * 2  # fp32 scores write+read
    t = timeit(attn_core, x, wq, wk, wv, wo)
    row("attention block (proj+sm+ctx)", t, flops=attn_flops,
        bytes_=attn_bytes)
    t = grad_timeit(attn_core, x, wq, wk, wv, wo, steps=12)
    row("attention block grad", t, flops=attn_flops * 3)

    s = jax.random.normal(kx, (B, heads, T, T), jnp.float32)
    t = timeit(softmax_only, s)
    row("softmax [B,H,T,T] alone", t, bytes_=B * heads * T * T * 4 * 2)

    ff_flops = 2 * B * T * d * 4 * d * 2
    t = timeit(ff_block, x, w1, w2)
    row("ff block (gelu mlp x4)", t, flops=ff_flops)
    t = grad_timeit(ff_block, x, w1, w2, steps=12)
    row("ff block grad", t, flops=ff_flops * 3)

    g_, b_ = jnp.ones((d,)), jnp.zeros((d,))
    t = timeit(ln_probe, x, g_, b_)
    row("layernorm fp32 [B,T,d]", t, bytes_=B * T * d * 4 * 2)

    t = timeit(lambda a: jnp.transpose(a, (1, 0, 2)) + 0.0, x)
    row("transpose [B,T,d]<->[T,B,d]", t, bytes_=B * T * d * 4 * 2)


if __name__ == "__main__":
    main()
