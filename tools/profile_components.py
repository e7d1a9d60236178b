"""Component-level step-time breakdown on the current default device.

Times each stage of the AV-Align pipeline in isolation (jitted, synced) so
optimization effort goes where the milliseconds are.  Usage:
    python tools/profile_components.py [B]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(raw_fn, *args, steps=8):
    """Time a jitted fn with a scalar-reduction sync (transferring whole
    outputs through the axon relay would swamp the measurement)."""
    import jax
    import jax.numpy as jnp

    def scalar_fn(*a):
        out = raw_fn(*a)
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)]
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    fn = jax.jit(scalar_fn)
    _ = float(fn(*args))
    # chained protocol: N launches, one final scalar fetch — amortizes the
    # ~27 ms relay round-trip (launches execute serially on device)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(steps)]
    _ = float(outs[-1])
    return (time.perf_counter() - t0) / steps


def main():
    import jax
    import jax.numpy as jnp

    from avsr_tpu.configs import (
        AudioFrontendConfig, DecoderConfig, EncoderConfig, ExperimentConfig,
        FusionConfig, TrainConfig, VideoFrontendConfig,
    )
    from avsr_tpu.models import seq2seq
    from avsr_tpu.models.seq2seq import Batch
    from avsr_tpu.ops.audio_features import logmel_frontend
    from avsr_tpu.train import step as step_lib

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    S, VF, K = 96000, 150, 48
    cfg = ExperimentConfig(
        architecture="av_align",
        audio=AudioFrontendConfig(),
        video=VideoFrontendConfig(),
        audio_encoder=EncoderConfig(hidden_units=(256, 256, 256),
                                    bidirectional=True, dropout_rate=0.1),
        video_encoder=EncoderConfig(hidden_units=(256,), bidirectional=True),
        # flagship value down-projection (bench.py round-3 default; set the
        # AVSR_BENCH_*VDIM env knobs there for the reference-dims model)
        fusion=FusionConfig(attention_units=128, memory_value_dim=256),
        decoder=DecoderConfig(embedding_dim=128, hidden_units=(256,),
                              attention_units=128, max_label_length=K,
                              sampling_probability=0.1,
                              memory_value_dim=256),
        train=TrainConfig(compute_dtype="bfloat16"),
    )
    rng = np.random.default_rng(0)
    batch = Batch(
        audio=jnp.asarray(rng.standard_normal((B, S)).astype(np.float32)),
        audio_lengths=jnp.asarray([S] * B, jnp.int32),
        video=jnp.asarray(rng.standard_normal((B, VF, 36, 36, 1)).astype(np.float32)),
        video_lengths=jnp.asarray([VF] * B, jnp.int32),
        targets=jnp.asarray(rng.integers(3, 31, (B, K)), jnp.int32),
        target_lengths=jnp.asarray([K] * B, jnp.int32),
    )
    params = seq2seq.model_init(jax.random.PRNGKey(0), cfg, 31)

    t = timeit(lambda w, l: logmel_frontend(w, l, cfg.audio),
               batch.audio, batch.audio_lengths)
    print(f"audio frontend:        {t*1000:7.1f} ms")

    from avsr_tpu.models import video_cnn
    t = timeit(
        lambda p, v, l: video_cnn.video_cnn_apply(p, cfg.video, v, l),
        params["video_frontend"], batch.video, batch.video_lengths,
    )
    print(f"video CNN:             {t*1000:7.1f} ms")

    t = timeit(
        lambda p, b: seq2seq.encode(p, cfg, b, train=False).memories[0].values,
        params, batch,
    )
    print(f"full encode:           {t*1000:7.1f} ms")

    t = timeit(
        lambda p, b: seq2seq.forward(p, cfg, b, train=False)[0],
        params, batch,
    )
    print(f"forward (enc+dec):     {t*1000:7.1f} ms")

    t = timeit(
        lambda p, b: seq2seq.loss_fn(p, cfg, b, train=False)[0],
        params, batch,
    )
    print(f"loss (fwd only):       {t*1000:7.1f} ms")

    t = timeit(
        jax.grad(lambda p, b: seq2seq.loss_fn(p, cfg, b, train=True)[0]),
        params, batch,
    )
    print(f"grad (fwd+bwd):        {t*1000:7.1f} ms")

    state, tx = step_lib.create_train_state(jax.random.PRNGKey(0), cfg, 31, 1000)
    ts = step_lib.make_jitted_train_step(cfg, tx)
    key = jax.random.PRNGKey(1)
    state, m = ts(state, batch, key)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(10):
        state, m = ts(state, batch, key)
    float(m["loss"])
    print(f"full train step:       {(time.perf_counter()-t0)/10*1000:7.1f} ms")


if __name__ == "__main__":
    main()
