"""Tensor parallelism: shard parameters over the mesh's ``model`` axis.

The reference is single-device (SURVEY.md §2.4), so TP is strictly
beyond-parity scale-out: Megatron-style OUTPUT-dim sharding expressed the
idiomatic JAX way — a pytree of ``PartitionSpec``s over the existing
(data, model) mesh, with GSPMD inserting every collective.  No model code
changes: the scans, attention, and frontends are partitioned by XLA from
the parameter shardings alone.

Sharding rules (applied per parameter dict, leaves are plain arrays):

- Kernels (ndim >= 2: ``wx``/``wh``/``wm``/``wq``/``wv``/``ctx_proj``/
  ``proj_w``/``out_w``/conv ``w``/``embedding``) shard their LAST dim over
  ``model`` when divisible by the axis size; otherwise they stay
  replicated (e.g. ``out_w``'s vocab dim).  Contractions therefore stay
  local — each shard owns whole output columns — so TP numerics match
  single-device up to reduction order.
- 1-D leaves (biases, gate layer-norm gammas, Bahdanau ``v``) shard iff a
  sibling kernel in the same dict sharded a matching last dim, keeping
  bias adds elementwise-local.  The LSTM gate layout [4H] shards in
  contiguous blocks; GSPMD handles the per-gate splits
  (``jnp.split(gates, 4)``) with resharding where block boundaries cross
  shards, which is why ``model`` axis sizes of 2 or 4 are the sweet spot.

Entry points: ``tp_pspecs`` (rules -> PartitionSpec tree),
``tp_shardings`` (NamedShardings for a mesh), ``shard_train_state``
(place params + optimizer state, via ``optax.tree_map_params`` so Adam's
mu/nu land on the same shards as their parameters).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from avsr_tpu.parallel.mesh import MODEL_AXIS


def _is_array(x) -> bool:
    return hasattr(x, "shape") and hasattr(x, "dtype")


def _pspecs_for_dict(d: dict, num_model: int) -> dict:
    """Sharding rules for one parameter dict (non-recursive leaves only)."""
    out = {}
    sharded_last_dims = set()
    for name, leaf in d.items():
        if _is_array(leaf) and leaf.ndim >= 2:
            if leaf.shape[-1] % num_model == 0:
                out[name] = P(*([None] * (leaf.ndim - 1) + [MODEL_AXIS]))
                sharded_last_dims.add(int(leaf.shape[-1]))
            else:
                out[name] = P()
    for name, leaf in d.items():
        if _is_array(leaf) and leaf.ndim == 1:
            if int(leaf.shape[0]) in sharded_last_dims:
                out[name] = P(MODEL_AXIS)
            else:
                out[name] = P()
        elif _is_array(leaf) and leaf.ndim == 0:
            out[name] = P()  # scalar leaves (e.g. learned temperatures)
    return out


def tp_pspecs(params: Any, num_model: int) -> Any:
    """PartitionSpec tree for ``params`` sharded over ``model``.

    ``num_model == 1`` degenerates to all-replicated (== DP behavior).
    """
    if num_model <= 1:
        return jax.tree_util.tree_map(lambda _: P(), params)

    def walk(node):
        if isinstance(node, dict):
            local = _pspecs_for_dict(
                {k: v for k, v in node.items() if _is_array(v)}, num_model
            )
            return {
                k: (local.get(k, P()) if _is_array(v) else walk(v))
                for k, v in node.items()
            }
        if isinstance(node, (list, tuple)):
            t = type(node)
            return t(walk(v) for v in node)
        # bare leaf outside a dict (uncommon): replicate
        return P()

    return walk(params)


def tp_shardings(mesh: Mesh, params: Any) -> Any:
    """NamedSharding tree for ``params`` on ``mesh``'s model axis."""
    num_model = int(mesh.shape[MODEL_AXIS])
    specs = tp_pspecs(params, num_model)
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        specs,
        is_leaf=lambda x: isinstance(x, P),
    )


def opt_state_shardings(mesh: Mesh, tx, opt_state, params: Any) -> Any:
    """Sharding tree for an optax state: param-shaped slots (Adam mu/nu)
    follow the parameter shardings; scalars/counters replicate."""
    import optax

    repl = NamedSharding(mesh, P())
    psh = tp_shardings(mesh, params)
    return optax.tree_map_params(
        tx,
        lambda _leaf, sh: sh,
        opt_state,
        psh,
        transform_non_params=lambda _leaf: repl,
    )


def shard_train_state(mesh: Mesh, state, tx):
    """Place a TrainState for a TP(+DP) mesh: params and Adam slots on
    their model-axis shards, step replicated."""
    repl = NamedSharding(mesh, P())
    new_params = jax.device_put(state.params, tp_shardings(mesh, state.params))
    new_opt = jax.device_put(
        state.opt_state, opt_state_shardings(mesh, tx, state.opt_state, state.params)
    )
    new_step = jax.device_put(state.step, repl)
    return type(state)(new_params, new_opt, new_step)


def train_state_shardings(mesh: Mesh, state, tx):
    """Sharding tree matching a TrainState, for jit ``out_shardings`` —
    keeps updated params/opt-state pinned to their model-axis shards."""
    repl = NamedSharding(mesh, P())
    return type(state)(
        tp_shardings(mesh, state.params),
        opt_state_shardings(mesh, tx, state.opt_state, state.params),
        repl,
    )


def describe(params: Any, num_model: int) -> str:
    """Human-readable summary: how many bytes land on each model shard."""
    specs = tp_pspecs(params, num_model)
    flat_p = jax.tree_util.tree_leaves(params)
    flat_s = jax.tree_util.tree_leaves(
        specs, is_leaf=lambda x: isinstance(x, P)
    )
    total = sum(int(np.prod(x.shape)) * x.dtype.itemsize for x in flat_p)
    sharded = sum(
        int(np.prod(x.shape)) * x.dtype.itemsize
        for x, s in zip(flat_p, flat_s)
        if any(a == MODEL_AXIS for a in s)
    )
    return (
        f"tp({num_model}): {sharded / max(total, 1):.1%} of {total / 1e6:.1f} MB "
        f"param bytes sharded over the model axis"
    )
