"""Per-frame latency metrics + named profiling scopes.

The reference prints wall-clock load time / tokens-per-s / frames-per-s
per run and has (commented-out) ProfileScope hooks (SURVEY.md §5).  TPU
equivalents: `FrameTimer` latency histograms with percentile report, and
`scope()` wrapping jax.named_scope so ops land named in XLA profiles
(`jax.profiler.trace` captures work out of the box with these names).
"""

from __future__ import annotations

import contextlib
import time
from typing import List

import jax
import numpy as np


def scope(name: str):
    """Named scope visible in XLA/profiler traces."""
    return jax.named_scope(name)


class FrameTimer:
    """Collects per-frame wall-clock latencies; reports percentiles vs the
    80 ms real-time budget."""

    def __init__(self, budget_ms: float = 80.0):
        self.budget_ms = budget_ms
        self.samples: List[float] = []
        self._t0 = None

    @contextlib.contextmanager
    def frame(self):
        t0 = time.perf_counter()
        yield
        self.samples.append((time.perf_counter() - t0) * 1000)

    def percentile(self, p: float) -> float:
        return float(np.percentile(self.samples, p)) if self.samples else 0.0

    def fps(self) -> float:
        total = sum(self.samples) / 1000
        return len(self.samples) / total if total else 0.0

    def report(self) -> dict:
        return {
            "frames": len(self.samples),
            "fps": round(self.fps(), 2),
            "p50_ms": round(self.percentile(50), 2),
            "p95_ms": round(self.percentile(95), 2),
            "p99_ms": round(self.percentile(99), 2),
            "over_budget": int(sum(s > self.budget_ms for s in self.samples)),
            "realtime": self.percentile(50) <= self.budget_ms,
        }
