"""Profiling hooks (the reference has none beyond wall-clock examples/sec,
trainer.py:1436-1447; SURVEY §5 calls for jax.profiler traces + per-step
timing in the rebuild)."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling per-step wall-clock stats with examples/sec and ETA, the
    reference's log_time equivalent."""

    def __init__(self, batch_size: int, total_steps: int | None = None,
                 window: int = 50):
        self.batch_size = batch_size
        self.total_steps = total_steps
        self.window = window
        self._times: list[float] = []
        self._last = None
        self.step = 0

    def tick(self) -> dict:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            self._times = self._times[-self.window:]
        self._last = now
        self.step += 1
        if not self._times:
            return {}
        mean = sum(self._times) / len(self._times)
        out = {"step_time_s": mean,
               "examples_per_sec": self.batch_size / mean}
        if self.total_steps:
            out["eta_s"] = mean * max(self.total_steps - self.step, 0)
        return out
