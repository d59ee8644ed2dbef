"""ctypes binding for the native C++ block quantizer (native/quant.cpp).

Scales come back as raw bf16 bits (uint16) converted to f32; the formats
layer casts them to jnp.bfloat16 exactly.

Quantizing a 7B checkpoint in numpy takes minutes; the multithreaded C++
path does it in seconds — the analog of the reference's C++
quantize-on-load (loader.h:149-189, README.md:53 "conversion takes a few
minutes" even in C++ for q4_k).  Falls back to numpy transparently when
the .so has not been built (``make -C native``).
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import Optional

import numpy as np

from moshi_tpu.io.safetensors import bf16_to_f32

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    cands = [
        Path(__file__).resolve().parent.parent / "native" / "libmoshi_quant.so",
        Path(os.environ.get("MOSHI_NATIVE_LIB", "")),
    ]
    for c in cands:
        if c and c.is_file():
            try:
                lib = ctypes.CDLL(str(c))
            except OSError:
                continue
            i64 = ctypes.c_int64
            f32p = np.ctypeslib.ndpointer(np.float32, flags="C")
            i8p = np.ctypeslib.ndpointer(np.int8, flags="C")
            u8p = np.ctypeslib.ndpointer(np.uint8, flags="C")
            u16p = np.ctypeslib.ndpointer(np.uint16, flags="C")
            lib.moshi_quantize_q8_0.argtypes = [f32p, i64, i64, i8p, u16p]
            lib.moshi_quantize_q4_0.argtypes = [f32p, i64, i64, u8p, u16p]
            lib.moshi_quantize_q4_k.argtypes = [f32p, i64, i64, u8p, u8p,
                                                u8p, u16p, u16p]
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return _load() is not None


def quantize_native(w: np.ndarray, fmt: str):
    """Returns the packed numpy arrays for `fmt`, or None if the native
    library is unavailable.  Layouts identical to quant/formats.py."""
    lib = _load()
    if lib is None:
        return None
    w = np.ascontiguousarray(w, np.float32)
    o, i = w.shape
    if fmt == "q8_0":
        q = np.empty((o, i), np.int8)
        d = np.empty((o, i // 32), np.uint16)
        lib.moshi_quantize_q8_0(w, o, i, q, d)
        return {"q": q, "d": bf16_to_f32(d)}
    if fmt == "q4_0":
        q = np.empty((o, i // 2), np.uint8)
        d = np.empty((o, i // 32), np.uint16)
        lib.moshi_quantize_q4_0(w, o, i, q, d)
        return {"q": q, "d": bf16_to_f32(d)}
    if fmt == "q4_k":
        nsb = i // 256
        q = np.empty((o, i // 2), np.uint8)
        sc = np.empty((o, nsb, 8), np.uint8)
        mn = np.empty((o, nsb, 8), np.uint8)
        d = np.empty((o, nsb), np.uint16)
        dmin = np.empty((o, nsb), np.uint16)
        lib.moshi_quantize_q4_k(w, o, i, q, sc, mn, d, dmin)
        return {"q": q, "sc": sc, "mn": mn, "d": bf16_to_f32(d),
                "dmin": bf16_to_f32(dmin)}
    raise ValueError(fmt)
