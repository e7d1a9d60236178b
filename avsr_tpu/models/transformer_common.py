"""Shared numerics for the transformer encoder and decoder options.

One definition of LayerNorm (fp32 statistics, 1e-6 epsilon), absolute
sinusoidal position encodings, and inverted dropout, so the two
transformer modules (models/transformer.py, models/transformer_decoder.py)
cannot silently diverge — cross-family numeric expectations (e.g. the
parallel==sequential decoder equivalence and the serving export
round-trip) assume identical primitives on both sides.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["layer_norm", "sinusoidal_pe", "inverted_dropout"]


def layer_norm(x: jnp.ndarray, scale, bias) -> jnp.ndarray:
    """Pre-LN normalization in fp32 regardless of the compute dtype."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + 1e-6)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def sinusoidal_pe(length: int, d: int) -> jnp.ndarray:
    """[length, d] absolute sinusoidal position encodings (fp32).

    Requires even ``d`` (validated at config time by both transformer
    families: interleaved sin/cos pairs need d//2 frequencies for each)."""
    if d % 2:
        raise ValueError(f"sinusoidal position encodings need even d, got {d}")
    pos = np.arange(length, dtype=np.float32)[:, None]
    half = d // 2
    freq = np.exp(-np.log(10000.0) * np.arange(half, dtype=np.float32) / half)
    ang = pos * freq[None, :]
    pe = np.zeros((length, d), np.float32)
    pe[:, 0::2] = np.sin(ang)
    pe[:, 1::2] = np.cos(ang)
    return jnp.asarray(pe)


def inverted_dropout(x, rate, rng):
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)
