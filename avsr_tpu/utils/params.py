"""Minimal functional parameter utilities.

The framework uses plain pytrees-of-arrays for parameters with explicit
init/apply functions — the idiomatic JAX-functional style (no framework
lock-in, trivially compatible with jit/pjit/sharding/orbax).
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


def glorot_uniform(key, shape, dtype=jnp.float32):
    fan_in, fan_out = shape[0], shape[-1]
    limit = np.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


def orthogonal(key, shape, dtype=jnp.float32, gain=1.0):
    """Orthogonal init (rows x cols); for [H, 4H] builds 4 orthogonal blocks."""
    rows, cols = shape
    if cols % rows == 0 and cols != rows:
        blocks = []
        keys = jax.random.split(key, cols // rows)
        for k in keys:
            blocks.append(_orthogonal_square(k, rows, dtype))
        return gain * jnp.concatenate(blocks, axis=1)
    n = max(rows, cols)
    q = _orthogonal_square(key, n, dtype)
    return gain * q[:rows, :cols]


def _orthogonal_square(key, n, dtype):
    a = jax.random.normal(key, (n, n), jnp.float32)
    q, r = jnp.linalg.qr(a)
    q = q * jnp.sign(jnp.diagonal(r))[None, :]
    return q.astype(dtype)


def normal_init(key, shape, dtype=jnp.float32, stddev=0.02):
    return stddev * jax.random.normal(key, shape, dtype)


def zeros_init(_key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def param_count(params: Params) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
