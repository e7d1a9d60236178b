"""Device mesh and sharding helpers.

The reference is single-process/single-device (SURVEY.md §2.4) — its
parity surface needs no distribution.  The new framework's primary
parallelism for the 5x throughput target is DATA parallelism over a 1-D
mesh of TPU chips reached implicitly through sharding annotations: the
batch axis of every input is sharded over the ``data`` axis, parameters are
replicated, and XLA inserts the gradient all-reduce over ICI
[BASELINE.json:north_star].  A second ``model`` axis is plumbed through so
tensor parallelism is a sharding annotation away (SURVEY §2.4).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    num_data: Optional[int] = None,
    num_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh. Defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = len(devices) // num_model
    use = num_data * num_model
    if len(devices) < use:
        raise ValueError(
            f"mesh ({num_data} data x {num_model} model) needs {use} "
            f"devices but only {len(devices)} are visible; lower "
            f"train.num_data_shards/num_model_shards or run with "
            f"XLA_FLAGS=--xla_force_host_platform_device_count=N for a "
            f"virtual CPU mesh"
        )
    grid = np.asarray(devices[:use]).reshape(num_data, num_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of batch arrays with batch-axis sharding."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh) if hasattr(x, "ndim") and x.ndim >= 1 else x,
        batch,
    )


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.device_put(tree, sh)
