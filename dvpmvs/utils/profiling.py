"""Tracing and metrics.

The reference's only observability is wall-clock prints (std::chrono around
edge extraction / per-view processing / neighbor generation, main.cpp:195,
271, 416-418; APD.cu:4407,4473-4474).  The TPU framework replaces that with:

  * ``trace(logdir)`` — a ``jax.profiler`` trace context producing
    TensorBoard-viewable XLA timelines (per-kernel device timing);
  * ``annotate(name)`` — a ``TraceAnnotation`` so scheduler phases show up
    as named spans in the trace;
  * ``Metrics`` — a lightweight in-process recorder of named timings and
    counters the scheduler/benchmarks use, dumpable to JSON.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict, Iterator, List, Optional

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """jax.profiler trace context; no-op when logdir is None."""
    if logdir is None:
        yield
        return
    with jax.profiler.trace(str(logdir)):
        yield


def annotate(name: str):
    """Named span inside a profiler trace (shows in the XLA timeline)."""
    return jax.profiler.TraceAnnotation(name)


class Metrics:
    """Named wall-clock timings + counters, JSON-dumpable.

    >>> m = Metrics()
    >>> with m.timed("pass/round0"):
    ...     work()
    >>> m.count("views_processed", 13)
    >>> m.dump(path)
    """

    def __init__(self) -> None:
        self.timings: Dict[str, List[float]] = defaultdict(list)
        self.counters: Dict[str, float] = defaultdict(float)

    @contextlib.contextmanager
    def timed(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.timings[name].append(time.perf_counter() - t0)

    def count(self, name: str, inc: float = 1.0) -> None:
        self.counters[name] += inc

    def summary(self) -> Dict[str, dict]:
        out = {}
        for name, vals in self.timings.items():
            out[name] = {"count": len(vals), "total_s": sum(vals),
                         "mean_s": sum(vals) / len(vals),
                         "max_s": max(vals)}
        return {"timings": out, "counters": dict(self.counters)}

    def dump(self, path) -> None:
        Path(path).write_text(json.dumps(self.summary(), indent=1))
