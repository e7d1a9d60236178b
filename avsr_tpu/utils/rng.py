"""Fast RNG helpers for training-time randomness.

Dropout masks are the largest random draws in the train step (per-element
bernoulli over [T, B, H] per encoder layer — tens of millions of bits).
JAX's default threefry generator costs ~1 ms for those draws on v5e; the
counter-based ``rbg`` implementation uses the TPU's hardware RNG path and is
~4x faster (measured, RESULTS.md round 2).  Statistical quality is more than
sufficient for dropout; determinism is preserved (fixed key -> fixed mask).

Only DROPOUT-style masks route through here — model-relevant sampling
(scheduled sampling, noise mixing) stays on the default generator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _as_rbg_key(key: jax.Array) -> jax.Array:
    """Derive a deterministic rbg key from a threefry key (either style)."""
    if jnp.issubdtype(key.dtype, jax.dtypes.prng_key):
        data = jax.random.key_data(jax.random.split(key, 2)).reshape(4)
    else:  # legacy uint32[2] key: split -> [2, 2] -> 4 words
        data = jax.random.split(key, 2).reshape(4)
    return jax.random.wrap_key_data(data, impl="rbg")


def dropout_mask(key: jax.Array, keep: float, shape, dtype=jnp.float32):
    """Inverted-dropout mask: bernoulli(keep)/keep in `dtype`."""
    bits = jax.random.bernoulli(_as_rbg_key(key), keep, shape)
    return bits.astype(dtype) / keep
