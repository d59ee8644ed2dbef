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


def suggest_sessions(cfg, weight_bytes: int, device=None,
                     headroom: float = 0.85) -> int:
    """Max concurrent sessions for the given weights + per-session KV."""
    budget = int(hbm_bytes(device) * headroom) - weight_bytes
    per = kv_bytes_per_session(cfg)
    return max(budget // per, 0) if per else 0


def suggest_context(cfg, weight_bytes: int, sessions: int = 1, device=None,
                    headroom: float = 0.85) -> int:
    """Largest context fitting `sessions` concurrent streams — the
    reference's auto-shrink, HBM edition."""
    budget = int(hbm_bytes(device) * headroom) - weight_bytes
    per_ctx = kv_bytes_per_session(cfg, context=1) * sessions
    return max(min(budget // per_ctx, cfg.context), 0) if per_ctx else 0
