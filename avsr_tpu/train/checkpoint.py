"""Checkpoint / resume via orbax.

The reference's entire fault-tolerance story is ``tf.train.Saver`` per-epoch
saves plus a ``try_restore_latest_checkpoint`` flag (SURVEY.md §5.3-5.4).
This module supplies the equivalent with orbax CheckpointManager: atomic
writes, keep-N retention, save per epoch and per K steps, and bit-exact
resume of params + optimizer state + step.  The data-iterator position
(epoch + batches consumed in it) rides in the side metadata: a mid-epoch
restart fast-forwards the deterministic loader and continues bit-exactly
identical to an uninterrupted run (tested in tests/test_train_loop.py).
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from avsr_tpu.train.step import TrainState


class _MuteShouldKeepNotice(logging.Filter):
    """orbax warns 'should_keep_fn is set, setting keep_period=None' on
    every manager construction; we never set keep_period, so the notice is
    pure noise in user logs."""

    def filter(self, record: logging.LogRecord) -> bool:
        return "should_keep_fn is set" not in record.getMessage()


logging.getLogger("absl").addFilter(_MuteShouldKeepNotice())


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        # Steps in this set survive keep-N pruning (the Trainer pins the
        # best-eval-CER step so `evaluate(checkpoint="best")` keeps working
        # after the step ages out of the retention window).
        self._preserved: set = set()
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True,
                enable_async_checkpointing=False,
                should_keep_fn=lambda s: s in self._preserved,
            ),
        )
        # Steps written by THIS manager instance.  A same-step collision
        # within one run (per-K-steps save meeting the epoch-end save) has an
        # identical tensor payload and may skip the write; a collision with a
        # step left on disk by a PREVIOUS run does not — skipping it would
        # keep stale tensors under fresh metadata.
        self._saved_steps: set = set()

    def save(
        self, step: int, state: TrainState, extra: Optional[Dict[str, Any]] = None
    ) -> None:
        payload = {
            "params": state.params,
            "opt_state": state.opt_state,
            "step": np.asarray(state.step),
        }
        if step not in self._saved_steps:
            if step in self._mgr.all_steps():
                # Stale checkpoint from a previous run in this directory:
                # replace it, loudly, so params and side metadata agree.
                import logging

                logging.getLogger("avsr_tpu").warning(
                    "checkpoint step %d already exists in %s from a previous "
                    "run; overwriting with this run's state", step,
                    self.directory,
                )
                self._mgr.delete(step)
            self._mgr.save(step, args=ocp.args.StandardSave(payload))
            self._mgr.wait_until_finished()
            self._saved_steps.add(step)
        # else: same optimizer step already saved by THIS run (e.g. a
        # per-K-steps save colliding with the epoch-end save); the tensor
        # payload is identical, but refresh the side metadata below (the
        # epoch-end extra carries the advanced epoch / reset iterator
        # position).
        if extra:  # side metadata (epoch, data-iterator position, rng seed)
            import json

            with open(os.path.join(self.directory, f"extra_{step}.json"), "w") as f:
                json.dump(extra, f)

    def set_preserved(self, steps) -> None:
        """Pin steps against keep-N pruning (evaluated at save time)."""
        self._preserved.clear()
        self._preserved.update(int(s) for s in steps)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def all_steps(self) -> list:
        return sorted(self._mgr.all_steps())

    def restore(
        self, state_template: TrainState, step: Optional[int] = None
    ) -> Tuple[TrainState, Dict[str, Any], int]:
        """Restore into the template's structure.  Returns (state, extra, step).

        ``extra`` is the side-metadata dict written by ``save(extra=...)``
        (stored in ``extra_{step}.json`` next to the orbax payload); {} if the
        checkpoint was saved without it.
        """
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        template = {
            "params": state_template.params,
            "opt_state": state_template.opt_state,
            "step": np.asarray(state_template.step),
        }
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(template)
        )
        state = TrainState(
            params=restored["params"],
            opt_state=restored["opt_state"],
            step=jax.numpy.asarray(restored["step"]),
        )
        extra: Dict[str, Any] = {}
        side = os.path.join(self.directory, f"extra_{step}.json")
        if os.path.exists(side):
            import json

            with open(side) as f:
                extra = json.load(f)
        return state, extra, step

    def average(
        self,
        state_template: TrainState,
        steps: Optional[list] = None,
        last_n: int = 5,
    ) -> Tuple[TrainState, list]:
        """Uniform parameter averaging over saved checkpoints.

        Standard seq2seq-ASR eval trick: averaging the last-N checkpoints'
        float parameters smooths SGD noise and typically improves CER/WER
        at zero inference cost.  Non-float leaves and the optimizer
        state/step come from the NEWEST averaged checkpoint.  Returns
        (averaged_state, steps_used).
        """
        avail = self.all_steps()
        if steps is None:
            steps = avail[-max(last_n, 1):]
        steps = sorted(int(s) for s in steps)
        missing = [s for s in steps if s not in avail]
        if missing or not steps:
            raise ValueError(
                f"cannot average: steps {missing or '(none)'} not in "
                f"{avail} under {self.directory}"
            )

        def is_float(x):
            return np.issubdtype(np.asarray(x).dtype, np.floating)

        acc = None
        newest = None
        for s in steps:
            st, _, _ = self.restore(state_template, step=s)
            newest = st
            leaves = jax.tree_util.tree_map(
                lambda x: np.asarray(x, np.float64) if is_float(x) else x,
                st.params,
            )
            acc = leaves if acc is None else jax.tree_util.tree_map(
                lambda a, b: a + b if is_float(a) else b, acc, leaves
            )
        n = float(len(steps))
        params = jax.tree_util.tree_map(
            lambda a, ref: (
                jax.numpy.asarray((a / n).astype(np.asarray(ref).dtype))
                if is_float(a) else ref
            ),
            acc, newest.params,
        )
        return TrainState(params, newest.opt_state, newest.step), steps

    def close(self) -> None:
        self._mgr.close()
