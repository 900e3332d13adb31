"""Tracing / profiling / metrics logging.

The reference has no instrumentation beyond a startup torchinfo
summary (SURVEY §5). Here:
- `trace(logdir)`: context manager around jax.profiler for device
  traces viewable in TensorBoard/XProf;
- `StepTimer`: wall-clock per-step timing with rolling throughput;
- `MetricsLogger`: append-only JSONL metrics stream (host-side, cheap).
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import deque
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device trace: `with trace('/tmp/trace'): step()`."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler traces."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling step timing: call tick() once per step."""

    def __init__(self, window: int = 50):
        self._times: deque[float] = deque(maxlen=window)
        self._last: Optional[float] = None

    def tick(self) -> float:
        now = time.perf_counter()
        dt = 0.0
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
        self._last = now
        return dt

    @property
    def mean_step_seconds(self) -> float:
        return sum(self._times) / len(self._times) if self._times else 0.0

    def steps_per_second(self) -> float:
        m = self.mean_step_seconds
        return 1.0 / m if m > 0 else 0.0


class MetricsLogger:
    """Append-only JSONL metrics log, one record per call."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._fh = open(path, "a", buffering=1)

    def log(self, step: int, **metrics):
        record = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            record[k] = float(v) if hasattr(v, "__float__") else v
        self._fh.write(json.dumps(record) + "\n")

    def close(self):
        self._fh.close()
