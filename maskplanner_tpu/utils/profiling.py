"""Tracing / profiling subsystem.

The reference has only ad-hoc wall-time prints (SURVEY.md §5). This module
provides:
- ``profile_trace``: context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace (enable with ``profile=true`` on the train CLI)
- ``StepTimer``: lightweight per-phase wall-time aggregation logged to the
  run's JSONL stream.
"""
from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict


@contextlib.contextmanager
def profile_trace(log_dir: str | None, enabled: bool = False):
    """Capture a device trace under ``log_dir/profile`` when enabled."""
    if not enabled or not log_dir:
        yield
        return
    import jax

    trace_dir = os.path.join(log_dir, "profile")
    os.makedirs(trace_dir, exist_ok=True)
    # Start/stop guarded separately so a profiler failure never kills
    # training AND a training exception propagates untouched (a second
    # yield in an except branch would turn it into contextlib's
    # "generator didn't stop after throw()" RuntimeError).
    started = False
    try:
        jax.profiler.start_trace(trace_dir)
        started = True
    except Exception as exc:
        print(f"profiler unavailable: {exc}")
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
                print(f"profiler trace written to {trace_dir}")
            except Exception as exc:
                print(f"profiler trace not written: {exc}")


class StepTimer:
    """Accumulates named phase durations; ``summary()`` -> dict of ms."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self, prefix: str = "time_ms/") -> dict:
        return {
            f"{prefix}{k}": self.totals[k] / max(self.counts[k], 1) * 1000
            for k in self.totals
        }

    def reset(self):
        self.totals.clear()
        self.counts.clear()
