"""Per-tensor quantization policy with shape-based fallback.

Mirrors the reference loader's behavior (/root/reference/src/loader.h:149-225):
  * only large 2-D matmul/embedding weights are quantized;
  * q4_k falls back to q4_0 when the inner dim is not a multiple of 256,
    q4_0 falls back to the source dtype when not a multiple of 32
    (loader.h:162-172);
  * norm scales / biases stay fp32, conv weights stay bf16
    (loader.h:191-225: mul/add/rms_norm -> F32, conv_1d -> F16).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from moshi_tpu.quant.formats import QK, QK_K, QuantTensor, quantize

# parameter-name suffixes that are never quantized (norms, biases, scales)
_KEEP_F32 = ("alpha", "bias", "scale", "layer_scale")
# minimum row count before quantization pays off (small projections stay bf16)
_MIN_ROWS = 256
_MIN_COLS = 256


def choose_format(name: str, shape, fmt: str) -> Optional[str]:
    """Return the actual quant format for a parameter, or None to keep it
    unquantized.  `fmt` is the requested format (q8_0/q4_0/q4_k)."""
    if fmt is None:
        return None
    if any(name.endswith(sfx) for sfx in _KEEP_F32):
        return None
    if len(shape) != 2:
        return None  # conv kernels / vectors stay bf16
    o, i = shape
    if o < _MIN_ROWS or i < _MIN_COLS:
        return None
    if fmt == "q8_r":
        return fmt    # per-row scales: no inner-dim block constraint
    if fmt == "q4_k" and i % QK_K != 0:
        fmt = "q4_0"  # loader.h:162-166
    if fmt in ("q4_0", "q8_0") and i % QK != 0:
        return None   # loader.h:168-172
    return fmt


def quantize_tree(params, fmt: str, path: str = ""):
    """Recursively quantize a nested param dict according to the policy."""
    if isinstance(params, dict):
        return {k: quantize_tree(v, fmt, f"{path}.{k}" if path else k)
                for k, v in params.items()}
    if isinstance(params, (list, tuple)):
        return type(params)(quantize_tree(v, fmt, f"{path}.{i}")
                            for i, v in enumerate(params))
    if isinstance(params, QuantTensor):
        return params
    arr = np.asarray(params)
    actual = choose_format(path, arr.shape, fmt)
    if actual is None:
        return params
    return quantize(arr.astype(np.float32), actual)


def serving_format(requested: str, batch: int = 1,
                   model_sharded: bool = False) -> str:
    """Pick the weight format for a serving deployment (VERDICT r3 #8).

    Measured policy (BENCH_NOTES.md round 4, digest-validated):
      * single chip, any batch: q4_k + the fused pallas kernels win
        (B=1 LM-only p50 43.6 ms vs q8_r's 52.0; q8_r's int8 weights are
        2x the packed-4-bit bytes, which also OOMs B=4 full-STS on a
        16 GB chip: 19.5 GB needed);
      * GSPMD model-sharded mesh: q8_r — GSPMD cannot partition the
        pallas custom calls (parallel/tp.py docstring), and q8_r's plain
        XLA int8 dot both partitions cleanly and halves bytes vs a bf16
        dequant product.  (Explicit shard_map TP keeps q4_k.)

    Small-model caveat (round 5): below ~2 GB of weights bf16 usually
    beats q4_k (STT 1b scan 155.5 vs 138.3) — EXCEPT on deployments
    with high per-kernel-launch overhead, where the q4_k stacked path's
    fewer kernels win (TTS-class scan 44.1 q4_k vs 33.8 bf16 on a
    ~24 us/launch rig day; identical on a ~18 us day).  A/B per rig —
    the structural levers (device FSM, windowed/scan dispatch) dominate
    either choice (BENCH_NOTES.md).
    """
    if requested not in ("q4_k", "q4_0", "q8_0", "q8_r"):
        return requested
    if requested == "q8_r":
        return requested
    if model_sharded:
        return "q8_r"
    return requested
