"""Tracing / profiling — a first-class subsystem (SURVEY §5.1).

The reference has no profiling beyond wall-clock start/end logs
(inference_epistemic.py:201-209).  Here:

* ``StepTimer`` — rolling per-step wall-clock stats, cheap enough for the
  hot loop, with JSONL output alongside the training metrics;
* ``trace`` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of device execution (XLA ops, HBM usage);
* ``annotate`` — ``jax.profiler.TraceAnnotation`` wrapper to mark host
  phases (data loading, JSON writing) inside a trace.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import deque
from typing import Deque, Optional


class StepTimer:
    """Rolling wall-clock statistics over the last ``window`` steps."""

    def __init__(self, window: int = 100):
        self.window = window
        self.samples: Deque[float] = deque(maxlen=window)
        self._last: Optional[float] = None
        self.total_steps = 0

    def tick(self) -> Optional[float]:
        """Mark a step boundary; returns the last step duration (or None)."""
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self.samples.append(dt)
            self.total_steps += 1
        self._last = now
        return dt

    def stats(self) -> dict:
        if not self.samples:
            return {"steps": 0}
        xs = sorted(self.samples)
        n = len(xs)
        return {
            "steps": self.total_steps,
            "mean_s": sum(xs) / n,
            "p50_s": xs[n // 2],
            "p90_s": xs[min(n - 1, int(n * 0.9))],
            "max_s": xs[-1],
            "steps_per_sec": n / sum(xs),
        }

    def write(self, path: str):
        with open(path, "a") as f:
            f.write(json.dumps({"ts": time.time(), **self.stats()}) + "\n")


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard's profile plugin."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Host-side trace annotation (shows up inside ``trace`` captures)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
