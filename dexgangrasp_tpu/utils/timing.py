"""Tracing & profiling — first-class (SURVEY §5.1).

The reference's only instrumentation is ad-hoc wall-clock prints
(``networks.py:253``, commented timers in ``dexgangrasp.py:440,658``).
Here:

- ``StageTimer``: named per-stage wall-clock accumulation with
  device-sync-aware timing (blocks on jax arrays so compute is measured,
  not dispatch).
- ``trace()``: context manager around ``jax.profiler.trace`` producing
  TensorBoard-viewable device traces.
- ``annotate()``: ``jax.profiler.TraceAnnotation`` wrapper so host stages
  show up on the profile timeline.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


class StageTimer:
    """Accumulate wall time per named stage.

    with timer.stage("encode"):
        bps = engine.encode_pcd(pts)
    """

    def __init__(self, sync: bool = True):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.sync = sync
        self._last_result = None

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync and self._last_result is not None:
                jax.block_until_ready(self._last_result)
                self._last_result = None
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def observe(self, result):
        """Register a jax result to block on before closing the stage."""
        self._last_result = result
        return result

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": self.totals[k], "count": self.counts[k],
                    "mean_ms": 1e3 * self.totals[k] / max(self.counts[k], 1)}
                for k in self.totals}

    def report(self) -> str:
        lines = [f"{k:>20s}: {v['mean_ms']:8.2f} ms/call × {v['count']}"
                 for k, v in self.summary().items()]
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Device-level profiler trace (view in TensorBoard's profile tab)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Host-span annotation appearing on the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)
