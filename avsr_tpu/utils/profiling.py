"""Tracing / profiling / sanitizer subsystem (SURVEY.md §5.1-5.2).

The reference wired no profiling at all; this framework provides:

  * ``trace(logdir)`` — context manager around ``jax.profiler`` producing
    TensorBoard/Perfetto traces of the XLA programs;
  * ``StepTimer`` — ``block_until_ready``-bracketed steady-state step timing
    feeding the frames/sec/chip benchmark (BASELINE.md §C);
  * ``sanitize()`` — the framework's "sanitizer" mode: enables
    ``jax.debug_nans`` + ``jax.debug_infs`` (the reference had no custom
    native code, so NaN/Inf checking is the equivalent of its missing
    race/memory sanitizers);
  * ``assert_finite`` — chex-based finiteness assertions for tests.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, List, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Profile everything inside the context into `logdir`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def sanitize() -> Iterator[None]:
    """NaN/Inf-checking mode: any non-finite intermediate raises."""
    old_nans = jax.config.jax_debug_nans
    old_infs = jax.config.jax_debug_infs
    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_debug_infs", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", old_nans)
        jax.config.update("jax_debug_infs", old_infs)


def assert_finite(tree, name: str = "tree") -> None:
    import chex
    import jax.numpy as jnp

    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        if jnp.issubdtype(leaf.dtype, jnp.floating):
            chex.assert_tree_all_finite(leaf)


class StepTimer:
    """Steady-state step timing with block_until_ready bracketing."""

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self.times: List[float] = []
        self._seen = 0
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> Optional[float]:
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    @property
    def p50(self) -> float:
        if not self.times:
            return 0.0
        s = sorted(self.times)
        return s[len(s) // 2]

    def steps_per_sec(self) -> float:
        return 1.0 / self.mean if self.times else 0.0
