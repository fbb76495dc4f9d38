"""Tracing and per-stage timing (SURVEY.md §5.1 — absent in the reference).

Two layers:
  * StageTimer — lightweight named wall-clock sections with streaming stats,
    for the host-side pipeline orchestration (preprocessing, NMS, MST).
  * trace() — context manager around jax.profiler for device traces viewable
    in TensorBoard/Perfetto, for the jitted compute path.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class StageTimer:
    """Named section timing with counts/totals; print or export as a dict."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, dict]:
        return {
            k: dict(total_s=self.totals[k], count=self.counts[k],
                    mean_ms=1000.0 * self.totals[k] / max(self.counts[k], 1))
            for k in self.totals
        }

    def report(self) -> str:
        rows = sorted(self.summary().items(), key=lambda kv: -kv[1]["total_s"])
        return "\n".join(
            f"{k:<30s} {v['count']:>6d}x  {v['mean_ms']:>9.2f} ms  "
            f"{v['total_s']:>8.2f} s total"
            for k, v in rows
        )


@contextlib.contextmanager
def trace(logdir: Optional[str] = None) -> Iterator[None]:
    """Device trace via jax.profiler when a logdir is given; no-op otherwise."""
    if logdir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a device trace (TraceAnnotation)."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
