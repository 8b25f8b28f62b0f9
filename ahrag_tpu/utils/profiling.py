"""Tracing / profiling utilities.

The reference's observability is wall-clock counters around search/LCA actions
(SURVEY §5.1, environment.py:199-240). This module keeps that counter discipline
and adds the TPU-native layer the reference lacks:

- ``timed(name)``: accumulating wall-clock context manager (blocks on device
  results so device work is actually measured);
- ``Timers``: per-name count/total/max registry, exportable to a session log;
- ``trace(logdir)``: ``jax.profiler`` trace context for real XLA/TPU profiles;
- ``annotate(name)``: named TraceAnnotation visible in the profiler timeline.
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Iterator, Optional

import jax


class Timers:
    def __init__(self) -> None:
        self._stats: Dict[str, Dict[str, float]] = {}

    @contextlib.contextmanager
    def timed(self, name: str, block_on: Any = None) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            s = self._stats.setdefault(name, {"count": 0.0, "total_s": 0.0,
                                              "max_s": 0.0})
            s["count"] += 1
            s["total_s"] += dt
            s["max_s"] = max(s["max_s"], dt)

    def snapshot(self) -> Dict[str, Dict[str, float]]:
        return {k: {**v, "mean_s": v["total_s"] / max(1.0, v["count"])}
                for k, v in self._stats.items()}

    def reset(self) -> None:
        self._stats.clear()


class LatencyRecorder:
    """Per-name latency samples with percentile summaries.

    Thread-safe; keeps a bounded sample buffer per name (newest-wins past the
    cap) so long-lived services report p50/p95/p99 over recent traffic without
    unbounded memory. The reference has no latency percentiles anywhere — its
    only per-request timing is the naive baseline's single wall-clock delta
    (answer_eval.py:377-398).
    """

    def __init__(self, max_samples: int = 100_000) -> None:
        import threading
        self._lock = threading.Lock()
        self._samples: Dict[str, list] = {}
        self._counts: Dict[str, int] = {}
        self.max_samples = max_samples

    def record(self, name: str, seconds: float) -> None:
        with self._lock:
            buf = self._samples.setdefault(name, [])
            n = self._counts.get(name, 0)
            if len(buf) < self.max_samples:
                buf.append(seconds)
            else:
                buf[n % self.max_samples] = seconds
            self._counts[name] = n + 1

    @contextlib.contextmanager
    def timed(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.record(name, time.perf_counter() - t0)

    def snapshot(self) -> Dict[str, Dict[str, float]]:
        import numpy as np
        out: Dict[str, Dict[str, float]] = {}
        with self._lock:
            for name, buf in self._samples.items():
                if not buf:
                    continue
                a = np.asarray(buf, dtype=np.float64) * 1e3
                out[name] = {"count": float(self._counts[name]),
                             "mean_ms": float(a.mean()),
                             "p50_ms": float(np.percentile(a, 50)),
                             "p95_ms": float(np.percentile(a, 95)),
                             "p99_ms": float(np.percentile(a, 99)),
                             "max_ms": float(a.max())}
        return out

    def reset(self) -> None:
        with self._lock:
            self._samples.clear()
            self._counts.clear()


GLOBAL_TIMERS = Timers()
timed = GLOBAL_TIMERS.timed


@contextlib.contextmanager
def trace(logdir: Optional[str] = None) -> Iterator[None]:
    """XLA profiler trace; view with TensorBoard/xprof. No-op when logdir is None."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named annotation that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)
