"""HBM-aware session sizing.

The reference shrinks the attention context to fit VRAM before loading
(tools/moshi-sts.cpp:254-264: base 4618 MB + 758 MB per 1000 context,
personaplex base 4990 MB).  The TPU analog sizes context length and the
concurrent-session batch against the chip's HBM.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax


def hbm_bytes(device=None) -> int:
    """Total HBM of the target device; falls back to the v5e 16 GB if the
    runtime exposes no memory stats (e.g. CPU tests)."""
    d = device or jax.devices()[0]
    try:
        stats = d.memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return 16 * 1024 ** 3


def kv_bytes_per_session(cfg, context: int | None = None) -> int:
    """KV-ring footprint of one session for an LMConfig."""
    import numpy as np
    ctx = context or cfg.context
    itemsize = 1 if "float8" in cfg.kv_dtype else 2
    per_layer = ctx * cfg.num_heads * (cfg.dim // cfg.num_heads) * 2
    return int(cfg.num_layers * per_layer * itemsize)


# Transient multiplier on live KV bytes, measured on hardware (round-5
# B=4 OOM breakdowns).  XLA double-buffers the KV rings across the
# frame step regardless of donation (HLO temps of exactly one extra
# k+v ring pair, 2 x 2.93 GB at B=4/ctx 3000, with output<->argument
# aliasing otherwise intact; both the batched scatter and the
# per-session DUS chain show it), so the budget is
# weights + 2 x (B x KV) + reserved ~0.26 GB.  2.05 = the measured
# double-buffer plus fragmentation margin.
KV_TRANSIENT = 2.05


def suggest_sessions(cfg, weight_bytes: int, device=None,
                     headroom: float = 0.85,
                     kv_transient: float = KV_TRANSIENT) -> int:
    """Max concurrent sessions for the given weights + per-session KV."""
    budget = int(hbm_bytes(device) * headroom) - weight_bytes
    per = int(kv_bytes_per_session(cfg) * kv_transient)
    return max(budget // per, 0) if per else 0


def suggest_context(cfg, weight_bytes: int, sessions: int = 1, device=None,
                    headroom: float = 0.95,
                    kv_transient: float = KV_TRANSIENT) -> int:
    """Largest context fitting `sessions` concurrent streams — the
    reference's auto-shrink, HBM edition (moshi-sts.cpp:254-264 shrinks
    context to fit VRAM before load)."""
    budget = int(hbm_bytes(device) * headroom) - weight_bytes
    per_ctx = int(kv_bytes_per_session(cfg, context=1) * sessions
                  * kv_transient)
    return max(min(budget // per_ctx, cfg.context), 0) if per_ctx else 0


def auto_shrink_context(cfg, weight_bytes: int, sessions: int = 1,
                        device=None):
    """Return (cfg', shrunk?, suggested): cfg with `context` reduced to
    what fits `sessions` concurrent streams in HBM next to the weights
    (identity when everything fits).  The reference does exactly this
    before load (moshi-sts.cpp:254-264: ctx = (vram - base) / per_1000);
    callers print the tradeoff so the shrink is never silent."""
    import dataclasses
    ctx = suggest_context(cfg, weight_bytes, sessions=sessions,
                          device=device)
    if 0 < ctx < cfg.context:
        # keep the ring chunkable: round to a 8-multiple
        ctx = max(ctx // 8 * 8, 8)
        return dataclasses.replace(cfg, context=ctx), True, ctx
    return cfg, False, cfg.context
