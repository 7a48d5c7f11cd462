"""Profiling/tracing hooks.

The reference's observability is wall-clock prints + tqdm (SURVEY.md §5).
Here: `jax.profiler` trace capture around a step window (viewable in
TensorBoard/Perfetto), named trace annotations, and a lightweight step
timer whose results feed the metrics JSONL.
"""
from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA/TPU profiler trace for the enclosed block."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up on the trace timeline."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling step-time statistics (p50/p95/mean, steps/sec)."""

    def __init__(self, window: int = 200):
        self.window = window
        self.times: list[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> None:
        if self._t0 is None:
            return
        self.times.append(time.perf_counter() - self._t0)
        if len(self.times) > self.window:
            self.times.pop(0)
        self._t0 = None

    def stats(self) -> Dict[str, float]:
        if not self.times:
            return {}
        import numpy as np

        arr = np.asarray(self.times)
        return {
            "step_ms_p50": float(np.percentile(arr, 50) * 1e3),
            "step_ms_p95": float(np.percentile(arr, 95) * 1e3),
            "step_ms_mean": float(arr.mean() * 1e3),
            "steps_per_sec": float(1.0 / max(arr.mean(), 1e-9)),
        }
