"""Optimizer and LR-schedule construction.

The reference uses Adam with gradient clipping by global norm and an
optional exponential LR decay (upstream:avsr/seq2seq.py train_op path,
SURVEY.md §2.2 row 2).  Built on optax; schedules/optimizers beyond the
reference's set are provided as forward-looking extras.
"""

from __future__ import annotations

import math

import optax

from avsr_tpu.configs import TrainConfig


def build_schedule(cfg: TrainConfig, steps_per_epoch: int = 1000):
    base = cfg.learning_rate
    if cfg.lr_schedule == "constant" or (
        cfg.lr_schedule == "exponential" and cfg.lr_decay == 0.0
    ):
        sched = optax.constant_schedule(base)
    elif cfg.lr_schedule == "exponential":
        sched = optax.exponential_decay(
            init_value=base,
            transition_steps=steps_per_epoch,
            decay_rate=1.0 - cfg.lr_decay,
            staircase=True,
        )
    elif cfg.lr_schedule == "cosine":
        total = max(cfg.num_epochs * steps_per_epoch, 1)
        sched = optax.cosine_decay_schedule(base, decay_steps=total)
    elif cfg.lr_schedule == "warmup_cosine":
        total = max(cfg.num_epochs * steps_per_epoch, cfg.warmup_steps + 1)
        sched = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=base,
            warmup_steps=max(cfg.warmup_steps, 1),
            decay_steps=total,
        )
    else:
        raise ValueError(f"unknown lr schedule {cfg.lr_schedule}")
    return sched


def build_optimizer(cfg: TrainConfig, steps_per_epoch: int = 1000):
    sched = build_schedule(cfg, steps_per_epoch)
    if cfg.optimizer == "adam":
        opt = optax.adam(sched)
    elif cfg.optimizer == "adamw":
        opt = optax.adamw(sched, weight_decay=cfg.weight_decay)
    elif cfg.optimizer == "sgd":
        opt = optax.sgd(sched, momentum=0.9)
    elif cfg.optimizer == "lamb":
        opt = optax.lamb(sched, weight_decay=cfg.weight_decay)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer}")
    chain = []
    if cfg.max_gradient_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.max_gradient_norm))
    chain.append(opt)
    return optax.chain(*chain), sched


def host_schedule_value(
    cfg: TrainConfig, step: int, steps_per_epoch: int = 1000
) -> float:
    """Pure-Python mirror of ``build_schedule`` for LOGGING only.

    The optimizer consumes the optax schedule on device; this never feeds
    training math.  Evaluating the optax schedule host-side would run a
    tiny program on the default device — a needless relay round-trip per
    log step on a remote-attached TPU — so the formulas are mirrored in
    ``math`` (pinned against optax in tests/test_sampling_ramp.py).
    """
    base = cfg.learning_rate
    s = max(int(step), 0)
    if cfg.lr_schedule == "constant" or (
        cfg.lr_schedule == "exponential" and cfg.lr_decay == 0.0
    ):
        return float(base)
    if cfg.lr_schedule == "exponential":
        return float(base * (1.0 - cfg.lr_decay) ** (s // steps_per_epoch))
    if cfg.lr_schedule == "cosine":
        total = max(cfg.num_epochs * steps_per_epoch, 1)
        frac = min(s / total, 1.0)
        return float(base * 0.5 * (1.0 + math.cos(math.pi * frac)))
    if cfg.lr_schedule == "warmup_cosine":
        warm = max(cfg.warmup_steps, 1)
        total = max(cfg.num_epochs * steps_per_epoch, cfg.warmup_steps + 1)
        if s < warm:
            return float(base * s / warm)
        frac = min((s - warm) / max(total - warm, 1), 1.0)
        return float(base * 0.5 * (1.0 + math.cos(math.pi * frac)))
    raise ValueError(f"unknown lr schedule {cfg.lr_schedule}")
