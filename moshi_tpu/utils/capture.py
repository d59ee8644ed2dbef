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


def _debug_sums_on() -> bool:
    import os
    return bool(os.environ.get("MOSHI_TPU_DEBUG_SUMS"))


def recording_active() -> bool:
    """True while a TraceRecorder is active (trace-time check — kernels
    that skip intermediate taps, like the fused attn-out+FFN-in path,
    must fall back to the unfused tapped ops while recording)."""
    return _ACTIVE is not None or _debug_sums_on()


def capture(name: str, value):
    """Record `value` under `name` if a TraceRecorder is active.
    Identity pass-through; zero cost when tracing is off (the check is a
    Python-time branch at trace time, like the reference's -DENABLE_CAPTURE
    compile flag).

    With MOSHI_TPU_DEBUG_SUMS set, every tap also prints its f32 value
    sum after compute — the analog of the reference's ctx.debug() probes
    (/root/reference/src/context.h:497-518)."""
    if _debug_sums_on():
        import jax.numpy as jnp
        s = jnp.sum(jnp.asarray(value).astype(jnp.float32))
        jax.debug.print(name + ": sum={s}", s=s, ordered=True)
    if _ACTIVE is not None:
        if name not in _ACTIVE.provenance:
            # stamp the CALLER's file:line at trace time — ggml_wrap.h's
            # per-op provenance (ggml_wrap.h:12-22); zero cost when no
            # recorder is active
            import sys
            fr = sys._getframe(1)
            _ACTIVE.provenance[name] = \
                f"{fr.f_code.co_filename}:{fr.f_lineno}"
        jax.debug.callback(_ACTIVE._record, name, value, ordered=True)
    return value


class TraceRecorder:
    def __init__(self):
        self.values: Dict[str, List[np.ndarray]] = defaultdict(list)
        # execution order of (name, occurrence) — the callback fires in
        # program order (ordered=True), so this is the op sequence the
        # replay localizer walks (replay.h:360-385 re-executes in graph
        # order for the same reason)
        self.order: List[tuple] = []
        # tap name -> "file:line" of the capture() call site, stamped at
        # trace time (the ggml_wrap.h caller-provenance analog)
        self.provenance: Dict[str, str] = {}

    def _record(self, name, value):
        name = str(name)
        self.order.append((name, len(self.values[name])))
        self.values[name].append(np.asarray(value))

    def save(self, path: str):
        flat = {}
        for name, vals in self.values.items():
            for i, v in enumerate(vals):
                flat[f"{name}@{i}"] = v
        np.savez_compressed(path, **flat)

    def dump_graph(self, path: str):
        """Whole-trace dump: every recorded tensor (npz) + a JSON
        sidecar with the execution order, shapes, dtypes, and caller
        provenance — the GraphDumper analog (the reference dumps every
        op's tensor with op/name/caller metadata,
        /root/reference/src/ggml_cap.h:1541-1766).  Written as
        <path>.npz + <path>.json."""
        import json
        self.save(path if path.endswith(".npz") else path + ".npz")
        doc = {
            "order": [{"name": n, "occurrence": i} for n, i in self.order],
            "tensors": {
                f"{name}@{i}": {
                    "shape": list(v.shape),
                    "dtype": str(v.dtype),
                    "caller": self.provenance.get(name, ""),
                }
                for name, vals in self.values.items()
                for i, v in enumerate(vals)
            },
        }
        jpath = (path[:-4] if path.endswith(".npz") else path) + ".json"
        with open(jpath, "w") as fh:
            json.dump(doc, fh, indent=1)

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


# ---------------------------------------------------------------------------
# reference capture-dump import (golden parity a file-drop away)
# ---------------------------------------------------------------------------

_GGML_NP = {
    "f32": (np.dtype("<f4"), 4),
    "i32": (np.dtype("<i4"), 4),
    "f16": (np.dtype("<f2"), 2),
    "bf16": (np.dtype("<u2"), 2),   # upcast below
    "i16": (np.dtype("<i2"), 2),
    "i8": (np.dtype("i1"), 1),
}


def load_reference_capture(json_path: str):
    """Parse a reference capture dump (capture/<name>.json + .tensors,
    /root/reference/src/ggml_cap.h:1541-1766) into
    (values, meta):

      values: tensor NAME -> float32/int32 numpy array (row-major; ggml's
        ne order is reversed).  Duplicate names keep the LAST occurrence
        (matching the reference's name reuse across ops).
      meta: tensor id -> {op, srcs, name, group, caller, shape, type}
        plus meta["__groups__"] (id -> {name, parent, tensors, children})
        and meta["__order__"] (forward_expand id list).

    The .tensors file is resolved next to the .json.
    """
    import json
    import os
    with open(json_path) as fh:
        doc = json.load(fh)
    bin_path = os.path.splitext(json_path)[0] + ".tensors"
    with open(bin_path, "rb") as fh:
        blob = fh.read()
    values: Dict[str, np.ndarray] = {}
    meta: Dict[str, dict] = {}
    for tid, rec in doc.get("tensor", {}).items():
        op_name, srcs, params, tinfo = rec[0], rec[1], rec[2], rec[3]
        name, group, caller = rec[4], rec[5], rec[6]
        type_name, ne, offset, nbytes = tinfo[0], tinfo[1], tinfo[2], tinfo[3]
        shape = tuple(reversed([int(d) for d in ne]))
        while len(shape) > 1 and shape[0] == 1:
            shape = shape[1:]
        meta[tid] = {"op": op_name, "srcs": list(srcs), "params": params,
                     "name": name, "group": group, "caller": caller,
                     "shape": shape, "type": type_name}
        if nbytes == 0 or type_name not in _GGML_NP:
            continue
        dt, esize = _GGML_NP[type_name]
        n = nbytes // esize
        arr = np.frombuffer(blob, dtype=dt, count=n, offset=offset)
        if type_name == "bf16":
            arr = (arr.astype(np.uint32) << 16).view(np.float32)
        elif type_name == "f16":
            arr = arr.astype(np.float32)
        try:
            arr = arr.reshape(shape)
        except ValueError:
            pass  # strided dumps of padded tensors keep flat shape
        values[name] = arr
    meta["__groups__"] = doc.get("groups", {})
    meta["__order__"] = doc.get("forward_expand", [])
    return values, meta
