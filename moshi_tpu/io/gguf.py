"""GGUF v3 reader/writer + ggml-block <-> planar QuantTensor repacking.

The reference distributes prequantized model repacks and PersonaPlex
voices as GGUF (README.md:53, tools/Codes4Fun_*.txt) and caches on-load
quantization to GGUF (/root/reference/src/loader.h:227-271,
src/moshi.cpp:693-695).  This module makes those artifacts first-class:

* ``GGUFReader`` — zero-dependency mmap-backed GGUF v3 parser (all
  metadata value types, tensor infos, alignment handling).
* ``GGUFWriter`` — GGUF v3 writer (quantized-cache snapshots that the
  reference tooling can in principle read back).
* ggml block repacking — GGML stores 4-bit weights byte-interleaved
  within 32/256-element blocks (block_q4_0 / block_q8_0 / block_q4_K);
  our ``QuantTensor`` stores them planar (low nibbles = first half of
  the row).  ``ggml_to_quant`` / ``quant_to_ggml`` convert losslessly
  in both directions (vectorized numpy, no per-element loops).
* ``gguf_tensor_name`` — the reference CRC-renaming of tensor names
  longer than GGML_MAX_NAME-1 (=63) chars (loader.h:120-137 over
  crc-bbf.h = standard CRC-32; note the reference's hex rendering keeps
  only the LOW nibble of each CRC byte and zero-fills chars 4..7 —
  reproduced exactly so its GGUF files resolve).

Scale precision note: GGML stores block scales as IEEE f16; QuantTensor
stores them bf16 (Mosaic has no f16).  Reading a *reference-produced*
GGUF therefore snaps each scale f16->bf16 (<=2^-9 relative, well inside
q4/q8 quantization noise); for q4_k the effective per-32 scales (es/em)
are computed from the full-precision f16 value before the snap.  Files
written by ``GGUFWriter`` from our own QuantTensors round-trip
bit-exactly (bf16 -> f16 is exact in range).
"""

from __future__ import annotations

import mmap
import struct
import zlib
from typing import Any, Dict, List, Tuple

import numpy as np

from moshi_tpu.io.safetensors import bf16_to_f32, f32_to_bf16_raw
from moshi_tpu.quant.formats import QK, QK_K, QuantTensor

GGUF_MAGIC = b"GGUF"
GGUF_VERSION = 3
GGUF_DEFAULT_ALIGNMENT = 32
GGML_MAX_NAME = 64

# ggml_type enum values (subset used by the reference)
GGML_F32 = 0
GGML_F16 = 1
GGML_Q4_0 = 2
GGML_Q8_0 = 8
GGML_Q4_K = 12
GGML_I8 = 24
GGML_I16 = 25
GGML_I32 = 26
GGML_I64 = 27
GGML_F64 = 28
GGML_BF16 = 30

# type -> (block size, bytes per block)
_BLOCK = {
    GGML_F32: (1, 4),
    GGML_F16: (1, 2),
    GGML_Q4_0: (32, 18),
    GGML_Q8_0: (32, 34),
    GGML_Q4_K: (256, 144),
    GGML_I8: (1, 1),
    GGML_I16: (1, 2),
    GGML_I32: (1, 4),
    GGML_I64: (1, 8),
    GGML_F64: (1, 8),
    GGML_BF16: (1, 2),
}

_PLAIN_NP = {
    GGML_F32: np.float32,
    GGML_F16: np.float16,
    GGML_I8: np.int8,
    GGML_I16: np.int16,
    GGML_I32: np.int32,
    GGML_I64: np.int64,
    GGML_F64: np.float64,
}

_NP_TO_GGML = {
    np.dtype(np.float32): GGML_F32,
    np.dtype(np.float16): GGML_F16,
    np.dtype(np.int8): GGML_I8,
    np.dtype(np.int16): GGML_I16,
    np.dtype(np.int32): GGML_I32,
    np.dtype(np.int64): GGML_I64,
    np.dtype(np.float64): GGML_F64,
}

GGML_TYPE_OF_FMT = {"q4_0": GGML_Q4_0, "q8_0": GGML_Q8_0, "q4_k": GGML_Q4_K}
FMT_OF_GGML_TYPE = {v: k for k, v in GGML_TYPE_OF_FMT.items()}

# GGUF metadata value types
_KV_U8, _KV_I8, _KV_U16, _KV_I16 = 0, 1, 2, 3
_KV_U32, _KV_I32, _KV_F32, _KV_BOOL = 4, 5, 6, 7
_KV_STR, _KV_ARR, _KV_U64, _KV_I64, _KV_F64 = 8, 9, 10, 11, 12

_KV_SCALAR_FMT = {
    _KV_U8: "<B", _KV_I8: "<b", _KV_U16: "<H", _KV_I16: "<h",
    _KV_U32: "<I", _KV_I32: "<i", _KV_F32: "<f", _KV_U64: "<Q",
    _KV_I64: "<q", _KV_F64: "<d",
}


def gguf_tensor_name(name: str) -> str:
    """Reference tensor-name mapping for GGUF (loader.h:120-137).

    Names shorter than GGML_MAX_NAME pass through.  Longer names are
    CRC-32 hashed; the reference's hex rendering writes, for i in 0..7,
    hex[crc_byte_i & 0xf] (the high-nibble store is overwritten) and the
    CRC is 32-bit so bytes 4..7 are zero -> chars 4..7 are '0'.
    """
    if len(name) < GGML_MAX_NAME:
        return name
    crc = zlib.crc32(name.encode())
    hexd = "0123456789abcdef"
    out = []
    for _ in range(8):
        out.append(hexd[crc & 0xF])
        crc >>= 8
    return "".join(out)


# ---------------------------------------------------------------------------
# ggml block layout <-> planar QuantTensor
# ---------------------------------------------------------------------------


def _f16_bytes_to_bf16(raw: np.ndarray) -> np.ndarray:
    """f16 (viewed from raw bytes) -> uint16 bf16 payload via f32."""
    return f32_to_bf16_raw(raw.view(np.float16).astype(np.float32))


def _bf16_np(u16: np.ndarray) -> "np.ndarray":
    import ml_dtypes  # ships with jax
    return u16.view(ml_dtypes.bfloat16)


def _ggml_q8_0_to_planar(raw: bytes, o: int, i: int):
    nb = i // QK
    b = np.frombuffer(raw, np.uint8).reshape(o, nb, 34)
    d = _bf16_np(_f16_bytes_to_bf16(np.ascontiguousarray(b[:, :, :2])
                                    .reshape(o, nb, 2)).reshape(o, nb))
    q = np.ascontiguousarray(b[:, :, 2:]).view(np.int8).reshape(o, i)
    return {"q": q, "d": d}


def _planar_q8_0_to_ggml(qt: QuantTensor) -> bytes:
    o, i = qt.shape
    nb = i // QK
    q = np.asarray(qt.q).reshape(o, nb, QK)
    d16 = np.asarray(qt.d, np.float32).astype(np.float16).reshape(o, nb)
    out = np.empty((o, nb, 34), np.uint8)
    out[:, :, :2] = d16[..., None].view(np.uint8).reshape(o, nb, 2)
    out[:, :, 2:] = q.view(np.uint8)
    return out.tobytes()


def _ggml_q4_0_to_planar(raw: bytes, o: int, i: int):
    nb = i // QK
    b = np.frombuffer(raw, np.uint8).reshape(o, nb, 18)
    d = _bf16_np(_f16_bytes_to_bf16(np.ascontiguousarray(b[:, :, :2])
                                    .reshape(o, nb, 2)).reshape(o, nb))
    qs = b[:, :, 2:]                       # [O, nb, 16]: lo=elem j, hi=elem j+16
    q = np.concatenate([qs & 15, qs >> 4], axis=-1).reshape(o, i)
    packed = (q[:, : i // 2] | (q[:, i // 2:] << 4)).astype(np.uint8)
    return {"q": packed, "d": d}


def _unpack_planar(qt_q: np.ndarray, o: int, i: int) -> np.ndarray:
    """planar-packed [O, I/2] -> full nibble array [O, I] (uint8 0..15)."""
    return np.concatenate([qt_q & 15, qt_q >> 4], axis=-1).reshape(o, i)


def _planar_q4_0_to_ggml(qt: QuantTensor) -> bytes:
    o, i = qt.shape
    nb = i // QK
    q = _unpack_planar(np.asarray(qt.q), o, i).reshape(o, nb, QK)
    d16 = np.asarray(qt.d, np.float32).astype(np.float16).reshape(o, nb)
    out = np.empty((o, nb, 18), np.uint8)
    out[:, :, :2] = d16[..., None].view(np.uint8).reshape(o, nb, 2)
    out[:, :, 2:] = (q[:, :, :16] | (q[:, :, 16:] << 4)).astype(np.uint8)
    return out.tobytes()


def _decode_k4_scales(scales: np.ndarray):
    """12-byte q4_K scale pack -> (sc, mn) uint8 [..., 8] (llama.cpp
    get_scale_min_k4 semantics)."""
    lead = scales.shape[:-1]
    sc = np.empty(lead + (8,), np.uint8)
    mn = np.empty(lead + (8,), np.uint8)
    sc[..., :4] = scales[..., 0:4] & 63
    mn[..., :4] = scales[..., 4:8] & 63
    sc[..., 4:] = (scales[..., 8:12] & 0xF) | ((scales[..., 0:4] >> 6) << 4)
    mn[..., 4:] = (scales[..., 8:12] >> 4) | ((scales[..., 4:8] >> 6) << 4)
    return sc, mn


def _encode_k4_scales(sc: np.ndarray, mn: np.ndarray) -> np.ndarray:
    lead = sc.shape[:-1]
    out = np.empty(lead + (12,), np.uint8)
    out[..., 0:4] = (sc[..., :4] & 63) | ((sc[..., 4:] >> 4) << 6)
    out[..., 4:8] = (mn[..., :4] & 63) | ((mn[..., 4:] >> 4) << 6)
    out[..., 8:12] = (sc[..., 4:] & 0xF) | ((mn[..., 4:] & 0xF) << 4)
    return out


def _ggml_q4_k_to_planar(raw: bytes, o: int, i: int):
    nsb = i // QK_K
    b = np.frombuffer(raw, np.uint8).reshape(o, nsb, 144)
    d_f16 = np.ascontiguousarray(b[:, :, 0:2]).view(np.float16).reshape(o, nsb)
    dmin_f16 = np.ascontiguousarray(b[:, :, 2:4]).view(np.float16).reshape(o, nsb)
    sc, mn = _decode_k4_scales(b[:, :, 4:16])
    qs = b[:, :, 16:144].reshape(o, nsb, 4, 32)
    # chunk c: lo nibbles = elems [64c, 64c+32), hi = [64c+32, 64c+64)
    q = np.concatenate([qs & 15, qs >> 4], axis=-1).reshape(o, i)
    packed = (q[:, : i // 2] | (q[:, i // 2:] << 4)).astype(np.uint8)
    # effective per-32 scales from the full-precision f16 super-scales
    df = d_f16.astype(np.float32)
    dmf = dmin_f16.astype(np.float32)
    es = (df[..., None] * sc.astype(np.float32)).reshape(o, i // QK)
    em = (dmf[..., None] * mn.astype(np.float32)).reshape(o, i // QK)
    return {
        "q": packed,
        "d": _bf16_np(f32_to_bf16_raw(df)),
        "sc": sc, "mn": mn,
        "dmin": _bf16_np(f32_to_bf16_raw(dmf)),
        "es": _bf16_np(f32_to_bf16_raw(es)),
        "em": _bf16_np(f32_to_bf16_raw(em)),
    }


def _planar_q4_k_to_ggml(qt: QuantTensor) -> bytes:
    o, i = qt.shape
    nsb = i // QK_K
    q = _unpack_planar(np.asarray(qt.q), o, i).reshape(o, nsb, 4, 64)
    out = np.empty((o, nsb, 144), np.uint8)
    d16 = np.asarray(qt.d, np.float32).astype(np.float16).reshape(o, nsb)
    dmin16 = np.asarray(qt.dmin, np.float32).astype(np.float16).reshape(o, nsb)
    out[:, :, 0:2] = d16[..., None].view(np.uint8).reshape(o, nsb, 2)
    out[:, :, 2:4] = dmin16[..., None].view(np.uint8).reshape(o, nsb, 2)
    out[:, :, 4:16] = _encode_k4_scales(
        np.asarray(qt.sc).reshape(o, nsb, 8),
        np.asarray(qt.mn).reshape(o, nsb, 8))
    out[:, :, 16:144] = (q[..., :32] | (q[..., 32:] << 4)) \
        .reshape(o, nsb, 128)
    return out.tobytes()


def ggml_to_quant(ggml_type: int, raw: bytes, shape: Tuple[int, int],
                  to_device: bool = True) -> QuantTensor:
    """ggml quantized blocks -> planar QuantTensor ([O, I] row-major)."""
    o, i = int(shape[0]), int(shape[1])
    if ggml_type == GGML_Q8_0:
        f = _ggml_q8_0_to_planar(raw, o, i)
        fmt = "q8_0"
    elif ggml_type == GGML_Q4_0:
        f = _ggml_q4_0_to_planar(raw, o, i)
        fmt = "q4_0"
    elif ggml_type == GGML_Q4_K:
        f = _ggml_q4_k_to_planar(raw, o, i)
        fmt = "q4_k"
    else:
        raise ValueError(f"not a supported quant ggml type: {ggml_type}")
    if to_device:
        import jax.numpy as jnp
        conv = {k: jnp.asarray(v) for k, v in f.items()}
    else:
        conv = f
    return QuantTensor(fmt, (o, i), conv["q"], conv["d"],
                       sc=conv.get("sc"), mn=conv.get("mn"),
                       dmin=conv.get("dmin"), es=conv.get("es"),
                       em=conv.get("em"))


def quant_to_ggml(qt: QuantTensor) -> Tuple[int, bytes]:
    """Planar QuantTensor -> (ggml_type, ggml block bytes)."""
    if qt.fmt == "q8_0":
        return GGML_Q8_0, _planar_q8_0_to_ggml(qt)
    if qt.fmt == "q4_0":
        return GGML_Q4_0, _planar_q4_0_to_ggml(qt)
    if qt.fmt == "q4_k":
        return GGML_Q4_K, _planar_q4_k_to_ggml(qt)
    raise ValueError(qt.fmt)


# ---------------------------------------------------------------------------
# GGUF v3 container
# ---------------------------------------------------------------------------


class GGUFReader:
    """mmap-backed GGUF v3 file.

    Tensor shapes are exposed row-major (numpy order) — GGUF stores dims
    innermost-first (ggml ne order), which this class reverses.
    """

    def __init__(self, path: str):
        self.path = path
        self._fh = open(path, "rb")
        self._mm = mmap.mmap(self._fh.fileno(), 0, access=mmap.ACCESS_READ)
        self._pos = 0
        magic = self._read(4)
        if magic != GGUF_MAGIC:
            raise ValueError(f"{path}: not a GGUF file (magic {magic!r})")
        version = self._u32()
        if version not in (2, 3):
            raise ValueError(f"{path}: unsupported GGUF version {version}")
        n_tensors = self._u64()
        n_kv = self._u64()
        self.metadata: Dict[str, Any] = {}
        for _ in range(n_kv):
            key = self._string()
            self.metadata[key] = self._value(self._u32())
        # name -> (ggml_type, shape row-major, data offset)
        self._infos: Dict[str, Tuple[int, Tuple[int, ...], int]] = {}
        order: List[str] = []
        for _ in range(n_tensors):
            name = self._string()
            n_dims = self._u32()
            ne = [self._u64() for _ in range(n_dims)]
            ggml_type = self._u32()
            offset = self._u64()
            self._infos[name] = (ggml_type, tuple(reversed(ne)), offset)
            order.append(name)
        self._order = order
        self.alignment = int(self.metadata.get("general.alignment",
                                               GGUF_DEFAULT_ALIGNMENT))
        self._data_start = -self._pos % self.alignment + self._pos

    # -- low-level readers ---------------------------------------------
    def _read(self, n: int) -> bytes:
        b = self._mm[self._pos:self._pos + n]
        self._pos += n
        return b

    def _u32(self) -> int:
        return struct.unpack("<I", self._read(4))[0]

    def _u64(self) -> int:
        return struct.unpack("<Q", self._read(8))[0]

    def _string(self) -> str:
        n = self._u64()
        return self._read(n).decode("utf-8")

    def _value(self, vtype: int):
        if vtype in _KV_SCALAR_FMT:
            fmt = _KV_SCALAR_FMT[vtype]
            return struct.unpack(fmt, self._read(struct.calcsize(fmt)))[0]
        if vtype == _KV_BOOL:
            return bool(self._read(1)[0])
        if vtype == _KV_STR:
            return self._string()
        if vtype == _KV_ARR:
            etype = self._u32()
            n = self._u64()
            return [self._value(etype) for _ in range(n)]
        raise ValueError(f"unknown GGUF kv type {vtype}")

    # -- tensor access ---------------------------------------------------
    def keys(self):
        return list(self._order)

    def __contains__(self, name: str) -> bool:
        return name in self._infos

    def ggml_type(self, name: str) -> int:
        return self._infos[name][0]

    def shape(self, name: str) -> Tuple[int, ...]:
        return self._infos[name][1]

    def nbytes(self, name: str) -> int:
        t, shape, _ = self._infos[name]
        block, bpb = _BLOCK[t]
        n = int(np.prod(shape)) if shape else 1
        assert n % block == 0, (name, shape, t)
        return n // block * bpb

    def raw(self, name: str) -> bytes:
        t, shape, off = self._infos[name]
        start = self._data_start + off
        return self._mm[start:start + self.nbytes(name)]

    def is_quantized(self, name: str) -> bool:
        return self._infos[name][0] in FMT_OF_GGML_TYPE

    def get(self, name: str) -> np.ndarray:
        """Plain tensor as numpy (f16/bf16 upcast to f32)."""
        t, shape, _ = self._infos[name]
        raw = self.raw(name)
        if t == GGML_BF16:
            return bf16_to_f32(np.frombuffer(raw, np.uint16)).reshape(shape)
        if t == GGML_F16:
            return np.frombuffer(raw, np.float16).astype(np.float32) \
                .reshape(shape)
        if t in _PLAIN_NP:
            return np.frombuffer(raw, _PLAIN_NP[t]).reshape(shape).copy()
        raise ValueError(f"{name}: quantized ({t}); use get_quant()")

    def get_quant(self, name: str, to_device: bool = True) -> QuantTensor:
        t, shape, _ = self._infos[name]
        assert len(shape) == 2, (name, shape)
        return ggml_to_quant(t, self.raw(name), shape, to_device=to_device)

    def close(self):
        self._mm.close()
        self._fh.close()


class GGUFWriter:
    """Minimal GGUF v3 writer (tensor names are CRC-mapped like the
    reference so files interoperate with its load_gguf)."""

    def __init__(self):
        self._kv: List[Tuple[str, int, Any]] = []
        self._tensors: List[Tuple[str, Tuple[int, ...], int, bytes]] = []
        self.alignment = GGUF_DEFAULT_ALIGNMENT

    def add_kv(self, key: str, value: Any):
        if isinstance(value, bool):
            self._kv.append((key, _KV_BOOL, value))
        elif isinstance(value, int):
            self._kv.append((key, _KV_I64 if value < 0 else _KV_U64, value))
        elif isinstance(value, float):
            self._kv.append((key, _KV_F64, value))
        elif isinstance(value, str):
            self._kv.append((key, _KV_STR, value))
        elif isinstance(value, (list, tuple)):
            self._kv.append((key, _KV_ARR, list(value)))
        else:
            raise TypeError(f"unsupported kv value for {key}: {type(value)}")

    def add_tensor(self, name: str, value) -> str:
        """value: numpy array (F32/F16/ints), jax bf16 array, or
        QuantTensor.  Returns the (possibly CRC-mapped) stored name."""
        stored = gguf_tensor_name(name)
        if isinstance(value, QuantTensor):
            ggml_type, raw = quant_to_ggml(value)
            shape = tuple(value.shape)
        else:
            arr = np.asarray(value)
            if arr.dtype.name == "bfloat16":
                ggml_type = GGML_BF16
                raw = arr.view(np.uint16).tobytes()
            else:
                arr = np.ascontiguousarray(arr)
                ggml_type = _NP_TO_GGML[arr.dtype]
                raw = arr.tobytes()
            shape = tuple(arr.shape)
        self._tensors.append((stored, shape, ggml_type, raw))
        return stored

    def write(self, path: str):
        def pstr(s: str) -> bytes:
            b = s.encode("utf-8")
            return struct.pack("<Q", len(b)) + b

        def pval(vtype: int, v) -> bytes:
            if vtype in _KV_SCALAR_FMT:
                return struct.pack(_KV_SCALAR_FMT[vtype], v)
            if vtype == _KV_BOOL:
                return struct.pack("<B", 1 if v else 0)
            if vtype == _KV_STR:
                return pstr(v)
            if vtype == _KV_ARR:
                if not v:
                    return struct.pack("<IQ", _KV_I64, 0)
                e = v[0]
                if isinstance(e, bool):
                    et = _KV_BOOL
                elif isinstance(e, int):
                    et = _KV_I64
                elif isinstance(e, float):
                    et = _KV_F64
                elif isinstance(e, str):
                    et = _KV_STR
                else:
                    raise TypeError(type(e))
                return (struct.pack("<I", et) + struct.pack("<Q", len(v))
                        + b"".join(pval(et, x) for x in v))
            raise ValueError(vtype)

        kvs = list(self._kv)
        if not any(k == "general.alignment" for k, _, _ in kvs):
            kvs.insert(0, ("general.alignment", _KV_U32, self.alignment))

        header = bytearray()
        header += GGUF_MAGIC
        header += struct.pack("<I", GGUF_VERSION)
        header += struct.pack("<Q", len(self._tensors))
        header += struct.pack("<Q", len(kvs))
        for key, vtype, v in kvs:
            header += pstr(key)
            header += struct.pack("<I", vtype)
            header += pval(vtype, v)
        offset = 0
        blobs = []
        a = self.alignment
        for name, shape, ggml_type, raw in self._tensors:
            header += pstr(name)
            ne = tuple(reversed(shape))
            header += struct.pack("<I", len(ne))
            for d in ne:
                header += struct.pack("<Q", d)
            header += struct.pack("<I", ggml_type)
            header += struct.pack("<Q", offset)
            pad = -len(raw) % a
            blobs.append(raw + b"\0" * pad)
            offset += len(raw) + pad
        pad = -len(header) % a
        header += b"\0" * pad
        with open(path, "wb") as fh:
            fh.write(header)
            for b in blobs:
                fh.write(b)
