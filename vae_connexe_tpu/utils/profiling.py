"""Profiling and step timing.

The reference has no profiler or timers (SURVEY.md §5); steps/sec is this
framework's north-star metric, so timing is first-class: a ``StepTimer``
for steady-state throughput and a ``trace`` context that wraps
``jax.profiler`` for XLA-level traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock steps/sec with warmup exclusion.

    Usage:
        timer = StepTimer(warmup=2)
        for _ in range(n):
            state = step(state)
            jax.block_until_ready(state)   # caller controls sync points
            timer.tick(steps=chunk_len)
        print(timer.steps_per_sec())
    """

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self._ticks = 0
        self._steps = 0
        self._t0: float | None = None

    def tick(self, steps: int = 1) -> None:
        self._ticks += 1
        if self._ticks == self.warmup:
            self._t0 = time.perf_counter()
        elif self._ticks > self.warmup:
            self._steps += steps

    def steps_per_sec(self) -> float:
        if self._t0 is None or self._steps == 0:
            return float("nan")
        return self._steps / (time.perf_counter() - self._t0)
