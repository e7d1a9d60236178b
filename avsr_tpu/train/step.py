"""Jitted train / eval steps with data-parallel sharding.

The whole train step — on-device noise mixing, audio/video frontends,
scanned encoders, AV-Align fusion, teacher-forced decoder, loss, backward,
optimizer update — compiles into ONE XLA program per bucket shape
[BASELINE.json:north_star].  Data parallelism is expressed with sharding
annotations: the batch axis lives on the mesh's ``data`` axis, parameters
and optimizer state are replicated, and XLA inserts the gradient all-reduce
over ICI (SURVEY.md §2.4).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import optax

from avsr_tpu.configs import ExperimentConfig
from avsr_tpu.models import seq2seq
from avsr_tpu.models.seq2seq import Batch
from avsr_tpu.ops.noise import NoiseBank
from avsr_tpu.train.optim import build_optimizer
from avsr_tpu.utils.params import Params


class TrainState(NamedTuple):
    params: Params
    opt_state: Any
    step: jnp.ndarray  # scalar int32


def create_train_state(
    rng, cfg: ExperimentConfig, vocab_size: int, steps_per_epoch: int = 1000
) -> Tuple[TrainState, Any]:
    params = seq2seq.model_init(rng, cfg, vocab_size)
    tx, _ = build_optimizer(cfg.train, steps_per_epoch)
    opt_state = tx.init(params)
    return TrainState(params, opt_state, jnp.zeros((), jnp.int32)), tx


def host_sampling_p(cfg: ExperimentConfig, step: int) -> float:
    """Host-side mirror of the on-device scheduled-sampling ramp in
    ``train_step`` — logging only (the device computes its own p from
    ``state.step``)."""
    d = cfg.decoder
    p = d.sampling_probability
    if p <= 0.0:
        return 0.0
    if d.sampling_ramp_steps <= 0:
        return float(p)
    return float(p * min(1.0, max(int(step), 0) / d.sampling_ramp_steps))


def train_step(
    state: TrainState,
    batch: Batch,
    rng: jax.Array,
    *,
    cfg: ExperimentConfig,
    tx: optax.GradientTransformation,
    noise_bank: Optional[Union[NoiseBank, jnp.ndarray]] = None,
    accum: int = 1,
) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimization step.  Pure; jit/shard outside.

    ``accum > 1`` splits the batch into that many micro-batches on device
    and accumulates gradients over a ``lax.scan`` before the single
    optimizer update — activation memory drops to one micro-batch's worth
    while the EFFECTIVE batch (and the loader/checkpoint semantics) stay
    unchanged.  Micro-gradients are weighted by their valid-label-token
    counts, so the accumulated CE gradient equals the full-batch gradient
    exactly (sequence_loss normalizes by sum(mask); the AU term uses the
    same token weights, an approximation of its frame normalization).
    Dropout/noise rngs are folded per micro-batch.
    """
    step_rng = jax.random.fold_in(rng, state.step)

    # Scheduled-sampling ramp: p rises linearly from 0 to the configured
    # probability over sampling_ramp_steps, computed ON DEVICE from the
    # state's step counter — the schedule lives inside the one compiled
    # program (no per-epoch recompiles, exact across checkpoint resume
    # because `step` is checkpointed).
    sampling_p = None
    d = cfg.decoder
    if d.sampling_probability > 0.0 and d.sampling_ramp_steps > 0:
        frac = jnp.minimum(
            1.0, state.step.astype(jnp.float32) / float(d.sampling_ramp_steps)
        )
        sampling_p = d.sampling_probability * frac

    if accum <= 1:
        def lf(params):
            return seq2seq.loss_fn(
                params, cfg, batch, train=True, rng=step_rng,
                noise_bank=noise_bank, sampling_p=sampling_p,
            )

        (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(
            state.params
        )
    else:
        B = batch.targets.shape[0]
        if B % accum:
            raise ValueError(f"batch rows {B} not divisible by accum {accum}")
        b = B // accum
        K = batch.targets.shape[1]
        micro = jax.tree_util.tree_map(
            lambda x: x.reshape(accum, b, *x.shape[1:]), batch
        )

        def lf(params, mb, r):
            return seq2seq.loss_fn(
                params, cfg, mb, train=True, rng=r, noise_bank=noise_bank,
                sampling_p=sampling_p,
            )

        grad_fn = jax.value_and_grad(lf, has_aux=True)

        def micro_weight(mb):
            # mirrors sequence_loss's mask: sum(min(target_lengths, K)).
            # An all-padding micro-batch (the loader pads the epoch's
            # final short batch with zero-weight rows AT THE END, so a
            # trailing micro can be entirely padding) must weigh 0 — a
            # clamp to 1 here would scale grads by W/(W+k) and break the
            # equals-full-batch-gradient contract.
            return jnp.sum(
                jnp.minimum(mb.target_lengths, K)
            ).astype(jnp.float32)

        def one(a, mb):
            (loss, metrics), g = grad_fn(
                state.params, mb, jax.random.fold_in(step_rng, a)
            )
            w = micro_weight(mb)
            wg = jax.tree_util.tree_map(lambda x: w * x, g)
            wm = {k: w * v for k, v in metrics.items()}
            return wg, wm, w

        # first micro-batch initializes the carry (metric keys are only
        # known after one trace); scan accumulates the rest
        first = jax.tree_util.tree_map(lambda x: x[0], micro)
        gsum, msum, wsum = one(0, first)

        def body(carry, xs):
            gsum, msum, wsum = carry
            a, mb = xs
            wg, wm, w = one(a, mb)
            gsum = jax.tree_util.tree_map(jnp.add, gsum, wg)
            msum = {k: msum[k] + wm[k] for k in msum}
            return (gsum, msum, wsum + w), None

        rest = jax.tree_util.tree_map(lambda x: x[1:], micro)
        (gsum, msum, wsum), _ = jax.lax.scan(
            body, (gsum, msum, wsum), (jnp.arange(1, accum), rest)
        )
        # wsum == 0 only for an all-padding BATCH (never produced by the
        # loader); guard the division anyway.
        wsafe = jnp.maximum(wsum, 1.0)
        grads = jax.tree_util.tree_map(lambda x: x / wsafe, gsum)
        metrics = {k: v / wsafe for k, v in msum.items()}

    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    metrics = dict(metrics)
    metrics["grad_norm"] = optax.global_norm(grads)
    new_state = TrainState(new_params, new_opt_state, state.step + 1)
    return new_state, metrics


def eval_step(
    params: Params,
    batch: Batch,
    *,
    cfg: ExperimentConfig,
    noise_bank: Optional[Union[NoiseBank, jnp.ndarray]] = None,
) -> Dict[str, jnp.ndarray]:
    loss, metrics = seq2seq.loss_fn(
        params, cfg, batch, train=False, rng=jax.random.PRNGKey(0),
        noise_bank=noise_bank,
    )
    return dict(metrics)


def make_jitted_train_step(
    cfg: ExperimentConfig,
    tx: optax.GradientTransformation,
    mesh=None,
    noise_bank: Optional[Union[NoiseBank, jnp.ndarray]] = None,
    state_shardings=None,
    accum: int = 1,
):
    """Build the jitted train step.

    Sharding is computation-follows-data under GSPMD: the loop places the
    batch with batch-axis sharding and the state replicated
    (parallel/mesh.py); with a mesh we additionally pin the output state to
    replicated so the updated params never pick up batch shardings.  Under
    tensor parallelism (``state_shardings`` from
    ``parallel.tp.train_state_shardings``) the output state is pinned to
    its model-axis shards instead.
    """
    fn = functools.partial(
        train_step, cfg=cfg, tx=tx, noise_bank=noise_bank, accum=accum
    )
    if mesh is None:
        return jax.jit(fn, donate_argnums=(0,))
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    out_state = state_shardings if state_shardings is not None else repl
    return jax.jit(fn, donate_argnums=(0,), out_shardings=(out_state, repl))


def make_jitted_eval_step(
    cfg: ExperimentConfig, mesh=None, noise_bank: Optional[Union[NoiseBank, jnp.ndarray]] = None
):
    fn = functools.partial(eval_step, cfg=cfg, noise_bank=noise_bank)
    if mesh is None:
        return jax.jit(fn)
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    return jax.jit(fn, out_shardings=repl)
