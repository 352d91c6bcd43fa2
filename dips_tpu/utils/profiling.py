"""Tracing / profiling (SURVEY.md §5: the reference disables GPU timestamps
and has no metrics — the rebuild gets per-stage timers and jax.profiler
integration).

* :class:`StageTimers` — lightweight accumulating wall-clock timers for the
  host pipeline stages (decode, planarize, device, interleave, encode) with
  a frames/sec summary.
* :func:`trace` — context manager around ``jax.profiler`` to capture a
  device trace viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class StageTimers:
    """Accumulates wall-clock per named stage; thread-compatible as long as
    each stage name is used by one thread (the pipeline's case)."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.frames = 0
        self._t0 = time.perf_counter()

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t
            self.counts[name] += 1

    def add_frames(self, n: int) -> None:
        self.frames += n

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self._t0

    @property
    def fps(self) -> float:
        e = self.elapsed
        return self.frames / e if e > 0 else 0.0

    def summary(self) -> Dict[str, dict]:
        out = {}
        elapsed = self.elapsed  # one denominator: shares must reconcile
        for name, total in sorted(self.totals.items()):
            n = self.counts[name]
            out[name] = {
                "total_s": round(total, 4),
                "calls": n,
                "mean_ms": round(total / n * 1e3, 3) if n else 0.0,
                "share": round(total / elapsed, 3),
            }
        out["_overall"] = {"frames": self.frames,
                           "elapsed_s": round(elapsed, 3),
                           "fps": round(self.frames / elapsed, 1)
                           if elapsed else 0.0}
        return out

    def __str__(self) -> str:
        rows = [f"  {k:<12} {v}" for k, v in self.summary().items()]
        return "StageTimers:\n" + "\n".join(rows)


@contextlib.contextmanager
def trace(logdir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax.profiler device trace (no-op if logdir is None)."""
    if logdir is None:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
