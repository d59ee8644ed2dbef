"""Elision-proof benchmark harness: digest-validated wall-clock timing.

Round-3 post-mortem (BENCH_NOTES.md "trap #4", VERDICT round 3): the
axon runtime can elide repeated executions — timing loops that only
`block_until_ready` measured physically impossible rates (0.33 ms for a
frame that streams >= 4.1 GB of weights).  The reference's own `--bench`
(/root/reference/tools/moshi-sts.cpp:770-806) is an honest wall clock
over 125 frames whose sampled tokens are *consumed* each frame; this
module restores that property for the TPU pipeline:

1. **Never reuse an input buffer.**  Callers pass one distinct device
   input per call (warmup + timed + validation), so a memoizing runtime
   never sees a repeated (executable, inputs) pair.
2. **Per-frame digest consumption.**  The step function computes a
   scalar digest of its outputs and folds it into a carried accumulator;
   the MAIN timed loop fetches the per-frame digest to host every frame
   (a D->H fetch cannot be acked early), mirroring the reference's
   per-frame token readback — the apples-to-apples loop, which on this
   rig pays a 26-29 ms tunnel RPC per frame.  A secondary WINDOWED
   phase syncs by fetching the chained digest every `window` frames
   (dataflow forces every prior frame, so it stays honest) — it
   amortizes the RPC and models host-local production dispatch
   (measured curve, 7B STS: sync every 1/4/8/16 frames = 46/24/21/19.5
   ms per frame).
3. **Validation runs** (untimed): the same compiled step from a fresh
   state twice with identical inputs must reproduce the final chained
   digest bit-for-bit, and a third run with different inputs must change
   it — proof the digest is computed from the inputs, not fabricated.
4. **Physics floor**: a frame cannot finish faster than its weight
   bytes stream at an above-roofline ceiling rate; measured times below
   the floor mark the run INVALID instead of reporting a fantasy.

Step-function contract::

    step(state, chained, x) -> (state, chained', dg)

where `dg` is this frame's scalar digest and `chained' = fold(chained,
dg)`.  `step` should be jitted with the state donated; model params must
be bound as jit arguments by the caller (closure-captured device arrays
are fetched at trace time — BENCH_NOTES trap #2).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import numpy as np

# Ceiling streaming rate for the physics floor, bytes/s.  Highest rate
# ever credibly measured on this rig is ~4.6 TB/s (BENCH_NOTES.md);
# 6 TB/s is safely above any real v5e-class chip, so time-below-floor
# can only mean elision.
CEIL_BYTES_PER_S = 6.0e12


def tree_bytes(tree) -> int:
    """Total bytes of all array leaves (packed quant tensors count at
    their packed size — what actually streams from HBM)."""
    import jax
    return sum(int(np.prod(x.shape)) * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "dtype"))


@dataclass
class Report:
    frames: int
    frame_ms: float          # headline: wall clock / frames, per-frame sync
    p50_ms: float
    p90_ms: float
    windowed_ms: float       # secondary: dispatch-ahead regime
    digest: float
    floor_ms: float
    valid: bool
    checks: dict = field(default_factory=dict)
    max_ms: float = float("nan")
    stalls: int = 0          # frames stalled > max(3*p50, p50+50ms)
    stall_s: float = 0.0     # total wall clock lost to stalls
    steady_ms: float = float("nan")   # frame_ms excluding stall frames


def run(step, init_state, inputs, *, frames: int, warmup: int,
        bytes_per_frame: int, windowed_frames: int = 0, window: int = 4,
        validate: bool = True, validate_frames: int = 8,
        verbose: bool = False) -> Report:
    """Full honest measurement protocol.

    step: jitted (state, chained, x) -> (state, chained, dg)
    init_state: () -> fresh state pytree (deterministic: same RNG seed)
    inputs: sequence of DISTINCT per-call inputs; needs at least
        warmup + frames + windowed_frames + 2*validate_frames entries.
    bytes_per_frame: bytes necessarily moved per frame (weights; used
        for the physics floor).
    """
    import jax
    import jax.numpy as jnp

    need = warmup + frames + windowed_frames + (2 * validate_frames
                                                if validate else 0)
    if len(inputs) < need:
        raise ValueError(f"need {need} distinct inputs, got {len(inputs)}")
    it = iter(inputs)

    def say(msg):
        if verbose:
            import sys
            print(f"[honest] {msg}", file=sys.stderr)

    tw = time.perf_counter()
    state = init_state()
    chained = jnp.float32(0.0)
    # warmup (compile + steady-state).  MUST FETCH, not block:
    # block_until_ready can return before execution on this runtime
    # (round-4 measurement: "blocked" warmups finished in 0.0 s and the
    # deferred compile + cache load then landed on the first timed
    # frame as a multi-minute stall).  Only a D->H byte transfer proves
    # the work ran.
    for _ in range(warmup):
        state, chained, dg = step(state, chained, next(it))
        float(np.asarray(dg))
    say(f"warmup ({warmup} frames + compile) "
        f"{time.perf_counter() - tw:.1f}s")

    # ---- MAIN timed loop: per-frame digest fetch (reference's tight
    # loop with per-frame token consumption, moshi-sts.cpp:770-806) ----
    per_frame = []
    lat = []
    t0 = time.perf_counter()
    for _ in range(frames):
        ta = time.perf_counter()
        state, chained, dg = step(state, chained, next(it))
        per_frame.append(float(np.asarray(dg)))     # D->H, 4 bytes
        lat.append(time.perf_counter() - ta)
    frame_ms = (time.perf_counter() - t0) * 1000.0 / frames
    lat_ms = np.asarray(lat) * 1000.0
    p50 = float(np.percentile(lat_ms, 50))
    p90 = float(np.percentile(lat_ms, 90))
    # stall accounting: this rig's runtime occasionally freezes a call
    # for tens of seconds (tunnel hiccup); report them separately so the
    # steady-state rate and the stall pathology are both visible
    stall_mask = lat_ms > max(3 * p50, p50 + 50.0)
    stalls = int(stall_mask.sum())
    stall_s = float(lat_ms[stall_mask].sum() / 1e3)
    say(f"main loop {frame_ms:.2f} ms/frame (p50 {p50:.2f}, "
        f"max {lat_ms.max():.0f} ms, {stalls} stalls totalling "
        f"{stall_s:.1f}s)")
    if stalls:
        say("stall frames: " + ", ".join(
            f"#{i}={lat_ms[i]:.0f}ms" for i in np.nonzero(stall_mask)[0]))
    pf = np.asarray(per_frame, dtype=np.float64)

    # ---- secondary: windowed dispatch-ahead (sync = chained-digest
    # fetch every `window` frames; by dataflow it forces every prior
    # frame) — amortizes the per-RPC tunnel floor; approaches pure
    # device-compute time as the window grows ----
    windowed_ms = float("nan")
    if windowed_frames:
        t0 = time.perf_counter()
        for i in range(windowed_frames):
            state, chained, dg = step(state, chained, next(it))
            if window and (i + 1) % window == 0:
                float(np.asarray(chained))
        float(np.asarray(chained))
        windowed_ms = (time.perf_counter() - t0) * 1000.0 / windowed_frames
        say(f"windowed (depth {window}) {windowed_ms:.2f} ms/frame")

    final_digest = float(np.asarray(chained))
    # free the main state BEFORE the validation runs build fresh ones:
    # at B=4 two live 7B states (2 x 5.9 GB rings) + weights exceed HBM
    del state

    checks = {}
    checks["digest_finite"] = bool(np.isfinite(final_digest))
    # digests must vary across frames (outputs actually differ per frame)
    checks["digest_varies"] = bool(np.unique(pf).size > max(2, frames // 4))
    floor_ms = bytes_per_frame / CEIL_BYTES_PER_S * 1000.0
    checks["above_floor"] = bool(frame_ms >= floor_ms)

    if validate:
        # untimed reproducibility probe with the already-compiled step;
        # runs must be long enough for inputs to clear the delay cache
        # (per-codebook delays defer input influence by 1-2+ frames)
        va = [next(it) for _ in range(validate_frames)]
        vb = [next(it) for _ in range(validate_frames)]

        def short(run_inputs):
            s = init_state()
            c = jnp.float32(0.0)
            for x in run_inputs:
                s, c, _ = step(s, c, x)
            out = float(np.asarray(c))
            del s           # free before the next validation state
            return out

        d1, d2, d3 = short(va), short(va), short(vb)
        checks["deterministic"] = bool(d1 == d2)
        checks["input_dependent"] = bool(d1 != d3)

    steady = lat_ms[~stall_mask]
    return Report(frames=frames, frame_ms=frame_ms, p50_ms=p50,
                  p90_ms=p90, windowed_ms=windowed_ms,
                  digest=final_digest, floor_ms=floor_ms,
                  valid=all(checks.values()), checks=checks,
                  max_ms=float(lat_ms.max()), stalls=stalls,
                  stall_s=stall_s,
                  steady_ms=float(steady.mean()) if steady.size
                  else float("nan"))
