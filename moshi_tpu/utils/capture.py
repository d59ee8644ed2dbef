"""Golden-trace capture & compare — the debug subsystem.

The reference's de-facto test system is capture/replay: every op is
shadow-recorded with provenance, named graphs dump all intermediate
tensors, and a replayer re-executes ops against golden bytes with
tolerance 1e-5 (CPU) / 1e-2 (GPU) (/root/reference/src/ggml_cap.h,
replay.h:332-341; SURVEY.md §4).  On TPU the graph is XLA's, so the
analog is value-level tracing: modules call ``capture(name, value)`` at
interesting points; when a recorder is active the values are pulled out
of the jitted computation via ``jax.debug.callback`` and appended to the
trace.  Traces are saved as .npz and diffed with per-backend tolerances.
"""

from __future__ import annotations

import contextlib
from collections import defaultdict
from typing import Dict, List, Optional

import jax
import numpy as np

TOL_CPU = 1e-5   # replay.h:332-341
TOL_TPU = 1e-2

_ACTIVE: Optional["TraceRecorder"] = None


def capture(name: str, value):
    """Record `value` under `name` if a TraceRecorder is active.
    Identity pass-through; zero cost when tracing is off (the check is a
    Python-time branch at trace time, like the reference's -DENABLE_CAPTURE
    compile flag)."""
    if _ACTIVE is not None:
        jax.debug.callback(_ACTIVE._record, name, value, ordered=True)
    return value


class TraceRecorder:
    def __init__(self):
        self.values: Dict[str, List[np.ndarray]] = defaultdict(list)

    def _record(self, name, value):
        self.values[str(name)].append(np.asarray(value))

    def save(self, path: str):
        flat = {}
        for name, vals in self.values.items():
            for i, v in enumerate(vals):
                flat[f"{name}@{i}"] = v
        np.savez_compressed(path, **flat)

    @staticmethod
    def load(path: str) -> Dict[str, np.ndarray]:
        with np.load(path) as z:
            return {k: z[k] for k in z.files}


@contextlib.contextmanager
def recording():
    """with recording() as rec: run steps; rec.values / rec.save(...)"""
    global _ACTIVE
    prev = _ACTIVE
    rec = TraceRecorder()
    _ACTIVE = rec
    try:
        yield rec
    finally:
        _ACTIVE = prev


def compare_traces(golden: Dict[str, np.ndarray],
                   test: Dict[str, np.ndarray],
                   tol: float = TOL_CPU):
    """Returns (ok, report-lines).  Mirrors replay_test()'s per-op
    compare-with-tolerance then report (replay.h:360-417)."""
    lines = []
    ok = True
    for name in sorted(golden):
        if name not in test:
            lines.append(f"MISSING {name}")
            ok = False
            continue
        g, t = golden[name], test[name]
        if g.shape != t.shape:
            lines.append(f"SHAPE {name}: {g.shape} vs {t.shape}")
            ok = False
            continue
        denom = max(np.abs(g).max(), 1e-8)
        err = np.abs(g.astype(np.float64) - t.astype(np.float64)).max() / denom
        status = "OK" if err <= tol else "FAIL"
        if status == "FAIL":
            ok = False
        lines.append(f"{status} {name}: rel {err:.3e}")
    for name in sorted(set(test) - set(golden)):
        lines.append(f"EXTRA {name}")
    return ok, lines
