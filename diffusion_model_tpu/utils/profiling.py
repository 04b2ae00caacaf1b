"""Tracing / profiling hooks.

The reference has no tracing at all — only tqdm bars and wall-clock deltas
written to record.txt (SURVEY.md §5). TPU-native replacement:

- :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace (XLA ops, fusion, HBM traffic);
- :class:`StepTimer` — cheap wall-clock per-step timing with steps/sec and
  images/sec, feeding the JSONL metrics stream;
- :func:`annotate` — named trace spans (``jax.profiler.TraceAnnotation``)
  so host-side phases (data wait, device dispatch) show up in the timeline.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into ``log_dir`` (no-op when None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span that appears in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling step timing: call ``tick(n_items)`` once per step.

    ``summary()`` reports steps/sec and items/sec over the window since the
    last summary (first step excluded by default — it includes compilation).
    """

    def __init__(self, skip_first: bool = True):
        self.skip_first = skip_first
        self.reset()

    def reset(self) -> None:
        self._count = 0
        self._items = 0
        self._elapsed = 0.0
        self._last: Optional[float] = None
        self._first_seen = False

    def tick(self, n_items: int = 0) -> float:
        """Mark a step boundary; returns the step's wall time (0.0 for the
        very first call)."""
        now = time.perf_counter()
        dt = 0.0
        if self._last is not None:
            dt = now - self._last
            if self._first_seen or not self.skip_first:
                self._count += 1
                self._items += n_items
                self._elapsed += dt
            self._first_seen = True
        self._last = now
        return dt

    def summary(self) -> dict:
        if self._count == 0 or self._elapsed <= 0:
            return {"steps": 0, "steps_per_sec": 0.0, "items_per_sec": 0.0,
                    "elapsed_s": self._elapsed}
        return {
            "steps": self._count,
            "steps_per_sec": self._count / self._elapsed,
            "items_per_sec": self._items / self._elapsed,
            "elapsed_s": self._elapsed,
        }
