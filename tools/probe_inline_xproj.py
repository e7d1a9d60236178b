"""Probe: hoisted input projection vs inlined [x;h] @ W in the BiLSTM scan.

probe_scan_fusion.py showed the G=2 scan step is THROUGHPUT-bound at
~5.1 us/step, and the roofline says about half of that is streaming the
pre-projected gate tensor xw [2, B, 4H] bf16 (2 MB/step at 819 GB/s
~= 2.4 us).  The hoisted projection (ops/rnn.py `_project_inputs`, the
classic TPU RNN trick) trades per-step FLOPs for exactly that stream.  The
alternative reads the RAW input x [2, B, D] per step (8x smaller at
D=240, H=256) and computes gates = [x;h] @ W_cat in ONE matmul — more MXU
work on a unit running at ~13% utilization, far less HBM traffic, and a
much smaller backward residual.

Usage: python tools/probe_inline_xproj.py   (TPU, ~4 compiles)
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
    _ = float(f(*args))
    t0 = time.perf_counter()
    out = [f(*args) for _ in range(steps)]
    _ = float(out[-1])
    return (time.perf_counter() - t0) / steps * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from avsr_tpu.ops import rnn

    B, H = 128, 256
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)

    for tag, T, D in (("layer1", 193, 240), ("layer2/3", 193, 512)):
        k1, k2, key = jax.random.split(key, 3)
        pf = rnn.lstm_init(k1, D, H)
        pb = rnn.lstm_init(k2, D, H)
        x = jnp.asarray(rng.standard_normal((T, B, D)).astype(np.float32))
        mask = jnp.ones((T, B), jnp.float32)

        def hoisted(pf, pb):
            ys, _ = rnn.fused_bilstm_scan(pf, pb, x, mask)
            return jnp.sum(ys.astype(jnp.float32))

        # inlined: one [x;h] @ W_cat matmul per step, raw x streamed
        def inlined(pf, pb):
            cdt = jnp.bfloat16
            w_cat = jnp.stack([
                jnp.concatenate([pf["wx"], pf["wh"]], axis=0),
                jnp.concatenate([pb["wx"], pb["wh"]], axis=0),
            ]).astype(cdt)                                    # [2, D+H, 4H]
            b2 = jnp.stack([pf["b"], pb["b"]])[:, None, :]
            x2 = jnp.stack([x, jnp.flip(x, axis=0)], axis=1).astype(cdt)
            m2 = jnp.stack([mask, jnp.flip(mask, axis=0)], axis=1)

            def body(carry, inp):
                h, c = carry
                x_t, m_t = inp
                xh = jnp.concatenate([x_t, h.astype(cdt)], axis=-1)
                gates = jnp.einsum(
                    "gbd,gdk->gbk", xh, w_cat,
                    preferred_element_type=jnp.float32,
                ) + b2
                i, f, g, o = jnp.split(gates, 4, axis=-1)
                c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
                h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
                m = m_t[..., None]
                h_out = m * h_new + (1.0 - m) * h
                c_out = m * c_new + (1.0 - m) * c
                return (h_out, c_out), (h_new * m).astype(cdt)

            h0 = jnp.zeros((2, B, H), jnp.float32)
            c0 = jnp.zeros((2, B, H), jnp.float32)
            _, ys = jax.lax.scan(body, (h0, c0), (x2, m2))
            return jnp.sum(ys.astype(jnp.float32))

        t_h = timed(hoisted, pf, pb)
        t_i = timed(inlined, pf, pb)
        print(f"{tag} (D={D}): hoisted fwd {t_h:6.2f} ms   "
              f"inlined fwd {t_i:6.2f} ms")


if __name__ == "__main__":
    main()
