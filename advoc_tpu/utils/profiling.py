"""Tracing / profiling subsystem (SURVEY.md §5 tracing row).

The reference had only TensorBoard step timings; the TPU rebuild provides:

* :func:`trace` — context manager around ``jax.profiler`` producing
  TensorBoard/Perfetto traces (tensorboard_plugin_profile is installed).
* :func:`timed_call` — honest wall-clock timing on the axon tunnel, where
  ``block_until_ready`` can return at dispatch rather than completion: every
  timing ends with a 4-byte value readback that cannot complete early.
* :class:`StepProfiler` — rolling steps/sec + per-step wall stats for train
  loops.
"""

from __future__ import annotations

import contextlib
import statistics
import time
from typing import Callable


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard's profile plugin."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed_call(fn: Callable, *args, trials: int = 3, warmup: int = 1):
    """Return (best_seconds, last_output). Forces completion via readback."""
    import jax.numpy as jnp

    out = None
    for _ in range(warmup):
        out = fn(*args)
        float(jnp.mean(out if not isinstance(out, tuple) else out[0]))
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.mean(out if not isinstance(out, tuple) else out[0]))
        best = min(best, time.perf_counter() - t0)
    return best, out


class StepProfiler:
    """Rolling per-step wall time statistics for training loops."""

    def __init__(self, window: int = 100):
        self.window = window
        self._times: list[float] = []
        self._last = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    @property
    def steps_per_sec(self) -> float | None:
        if not self._times:
            return None
        return 1.0 / statistics.mean(self._times)

    def summary(self) -> dict[str, float]:
        if not self._times:
            return {}
        return {
            "step_time_mean_s": statistics.mean(self._times),
            "step_time_p50_s": statistics.median(self._times),
            "step_time_max_s": max(self._times),
            "steps_per_sec": self.steps_per_sec or 0.0,
        }
