"""Isolated scan-region probe: WHERE did multi-stream batching lose?

bench.py measured fuse_encoder_scans as a 2 ms e2e regression (RESULTS.md
round 3).  Candidate causes: (a) the [T, G=4, B, 4H] xw stack
materialization, (b) the 43 padded video steps, (c) a G=4-batched gate
matmul genuinely costing ~2x a G=2 step.  This probe times the raw scan
regions (forward + grad) at flagship shapes to apportion blame — it decides
whether a padding-free split-scan variant could win.

Usage: python tools/probe_scan_fusion.py   (TPU, ~6 compiles, ~15 min)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, steps=20):
    import jax

    f = jax.jit(fn)
    _ = float(f(*args))  # compile + true host drain
    t0 = time.perf_counter()
    out = [f(*args) for _ in range(steps)]
    _ = float(out[-1])
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from avsr_tpu.ops import rnn

    B, H = 128, 256
    Ta, Da = 193, 240   # flagship audio: T_a frames, stacked-feature dim
    Tv, Dv = 150, 128   # flagship video: T_v frames, CNN embedding dim
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    pa_f = rnn.lstm_init(ks[0], Da, H)
    pa_b = rnn.lstm_init(ks[1], Da, H)
    pv_f = rnn.lstm_init(ks[2], Dv, H)
    pv_b = rnn.lstm_init(ks[3], Dv, H)
    rng = np.random.default_rng(0)
    xa = jnp.asarray(rng.standard_normal((Ta, B, Da)).astype(np.float32))
    xv = jnp.asarray(rng.standard_normal((Tv, B, Dv)).astype(np.float32))
    mask_a = jnp.ones((Ta, B), jnp.float32)
    mask_v = jnp.ones((Tv, B), jnp.float32)

    def sep_fwd(pa_f, pa_b, pv_f, pv_b):
        ya, _ = rnn.fused_bilstm_scan(pa_f, pa_b, xa, mask_a)
        yv, _ = rnn.fused_bilstm_scan(pv_f, pv_b, xv, mask_v)
        return jnp.sum(ya.astype(jnp.float32)) + jnp.sum(
            yv.astype(jnp.float32))

    def multi_fwd(pa_f, pa_b, pv_f, pv_b):
        (ya, _), (yv, _) = rnn.multi_fused_bilstm_scan(
            [(pa_f, pa_b, xa, mask_a), (pv_f, pv_b, xv, mask_v)]
        )
        return jnp.sum(ya.astype(jnp.float32)) + jnp.sum(
            yv.astype(jnp.float32))

    def audio_only_fwd(pa_f, pa_b):
        ya, _ = rnn.fused_bilstm_scan(pa_f, pa_b, xa, mask_a)
        return jnp.sum(ya.astype(jnp.float32))

    def video_only_fwd(pv_f, pv_b):
        yv, _ = rnn.fused_bilstm_scan(pv_f, pv_b, xv, mask_v)
        return jnp.sum(yv.astype(jnp.float32))

    print(f"audio G=2 scan fwd ({Ta} steps): "
          f"{timed(audio_only_fwd, pa_f, pa_b):6.2f} ms")
    print(f"video G=2 scan fwd ({Tv} steps): "
          f"{timed(video_only_fwd, pv_f, pv_b):6.2f} ms")
    print(f"separate scans fwd (audio+video): "
          f"{timed(sep_fwd, pa_f, pa_b, pv_f, pv_b):6.2f} ms")
    print(f"multi G=4 scan fwd ({Ta} steps, video padded): "
          f"{timed(multi_fwd, pa_f, pa_b, pv_f, pv_b):6.2f} ms")

    g_sep = jax.grad(sep_fwd, argnums=(0, 1, 2, 3))
    g_multi = jax.grad(multi_fwd, argnums=(0, 1, 2, 3))

    def scalar_grad(g):
        def f(pa_f, pa_b, pv_f, pv_b):
            gs = g(pa_f, pa_b, pv_f, pv_b)
            return sum(jnp.sum(x.astype(jnp.float32))
                       for t in gs for x in jax.tree_util.tree_leaves(t))
        return f

    print(f"separate scans grad: "
          f"{timed(scalar_grad(g_sep), pa_f, pa_b, pv_f, pv_b):6.2f} ms")
    print(f"multi G=4 scan grad: "
          f"{timed(scalar_grad(g_multi), pa_f, pa_b, pv_f, pv_b):6.2f} ms")


if __name__ == "__main__":
    main()
