"""Weight-only block quantization formats for TPU.

Same numeric *classes* as the reference's GGML formats (q8_0: 32-wide blocks
with one scale; q4_0: 32-wide 4-bit symmetric; q4_k: 256-wide superblocks
with 6-bit sub-scales/sub-mins and two fp16 super-scales — reference usage:
/root/reference/src/loader.h:149-189, README.md:53) but with layouts
re-designed for TPU/XLA:

* 4-bit values are packed **planar** within a row: packed byte ``j`` holds
  nibble ``w[j]`` (low) and ``w[j + I/2]`` (high).  Unpacking is then a
  single concat of two contiguous halves — no lane interleave/relayout on
  the VPU, unlike the GGML byte-interleaved layout.
* scales are stored fp16 (storage) and applied in fp32.
* everything is a flat ``[O, I]``-addressable pytree (`QuantTensor`) so
  gathers (embedding rows) and shardings (tensor-parallel row splits) work
  directly on the packed arrays.

Dequantized matmul has two paths: a pure-XLA path (dequant fused into the
consumer) used for bring-up/CPU, and fused Pallas dequant+matmul kernels
(moshi_tpu/quant/pallas_matmul.py) for the HBM-bandwidth-bound decode path.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

QK = 32        # sub-block size (q8_0 / q4_0 scale granularity)
QK_K = 256     # q4_k superblock size

QUANT_FORMATS = ("q8_0", "q4_0", "q4_k", "q8_r")


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QuantTensor:
    """A block-quantized 2-D weight [O, I] as a pytree.

    fields (by fmt):
      q8_0: q int8 [O, I];      d f16 [O, I/32]
      q4_0: q uint8 [O, I/2];   d f16 [O, I/32]            (planar nibbles)
      q4_k: q uint8 [O, I/2];   sc,mn uint8 [O, I/256, 8]; d,dmin f16 [O, I/256]
      q8_r: q int8 [O, I];      d f16 [O, 1]   (per-ROW scale — w8a8: the
            matmul contracts raw int8 on the MXU via plain XLA dot_general
            with a dynamically per-token-quantized activation; no pallas,
            GSPMD-partitionable.  Not a GGML format: a TPU-native fast
            path whose accuracy class is per-channel w8a8.)
    """

    fmt: str
    shape: Tuple[int, int]
    q: jnp.ndarray
    d: jnp.ndarray
    sc: jnp.ndarray | None = None
    mn: jnp.ndarray | None = None
    dmin: jnp.ndarray | None = None
    # denormalized per-32-block effective scale/min (f16 [O, I/32]),
    # derived once at quantize time for the fused Pallas kernels (q4_k):
    # es = d * sc snapped to the 6-bit grid, em = dmin * mn
    es: jnp.ndarray | None = None
    em: jnp.ndarray | None = None

    def tree_flatten(self):
        children = (self.q, self.d, self.sc, self.mn, self.dmin,
                    self.es, self.em)
        return children, (self.fmt, self.shape)

    @classmethod
    def tree_unflatten(cls, aux, children):
        fmt, shape = aux
        q, d, sc, mn, dmin, es, em = children
        return cls(fmt=fmt, shape=shape, q=q, d=d, sc=sc, mn=mn, dmin=dmin,
                   es=es, em=em)

    def with_eff_scales(self) -> "QuantTensor":
        """Return a copy with es/em populated (q4_k only; no-op otherwise)."""
        if self.fmt != "q4_k" or self.es is not None:
            return self
        lead = self.q.shape[:-2] + (self.q.shape[-2],)
        i = self.d.shape[-1] * QK_K   # storage-agnostic (packed u8 or i8)
        es = (self.d.astype(jnp.float32)[..., None]
              * self.sc.astype(jnp.float32)).reshape(lead + (i // QK,))
        em = (self.dmin.astype(jnp.float32)[..., None]
              * self.mn.astype(jnp.float32)).reshape(lead + (i // QK,))
        return QuantTensor(self.fmt, self.shape, self.q, self.d, self.sc,
                           self.mn, self.dmin, es.astype(jnp.bfloat16),
                           em.astype(jnp.bfloat16))

    @property
    def unpacked(self) -> bool:
        """True when 4-bit values are stored as natural-order int8
        ([..., O, I], q4_0 signed / q4_k 0..15) instead of planar-packed
        uint8 nibbles.  2x the HBM bytes; zero weight-side unpack work in
        the int8-MXU kernels.  q8_0 is always natural int8."""
        return self.fmt == "q8_0" or self.q.dtype == jnp.int8

    def with_i8_storage(self) -> "QuantTensor":
        """Return a copy with 4-bit values unpacked to natural-order int8
        (see `unpacked`).  Only the int8-MXU kernels and the XLA
        dequantize path consume this storage — the f32-dequant pallas
        kernels reject it loudly.  No-op for q8_0 / already-unpacked."""
        if self.unpacked:
            return self
        q = self.q
        lo = (q & jnp.uint8(15)).astype(jnp.int8)
        hi = (q >> jnp.uint8(4)).astype(jnp.int8)
        full = jnp.concatenate([lo, hi], axis=-1)
        if self.fmt == "q4_0":
            full = full - jnp.int8(8)   # fold the zero point at rest
        return QuantTensor(self.fmt, self.shape, full, self.d, self.sc,
                           self.mn, self.dmin, self.es, self.em)

    @property
    def dtype(self):  # convenience for param-tree introspection
        return jnp.bfloat16

    @property
    def nbytes(self) -> int:
        total = 0
        for arr in (self.q, self.d, self.sc, self.mn, self.dmin):
            if arr is not None:
                total += arr.size * arr.dtype.itemsize
        return total


def i8_storage_tree(tree):
    """Unpack every int8-kernel-eligible 4-bit QuantTensor leaf to
    natural-order i8 storage (`with_i8_storage`).  2x the HBM bytes of
    packed 4-bit, zero weight-side unpack work in the int8-MXU decode
    kernels — an opt-in trade for B=1 decode-dominant serving (batched
    m>1 matmuls on these leaves fall back to the XLA dequant path)."""
    from moshi_tpu.quant.pallas_matmul_int8 import int8_shape_ok

    def conv(path, leaf):
        if not (isinstance(leaf, QuantTensor) and int8_shape_ok(leaf, 1)):
            return leaf
        # embedding tables are row-gathered, never matvec'd — unpacking
        # them would double their HBM bytes for zero kernel benefit
        if any("emb" in str(getattr(p, "key", "")) for p in path):
            return leaf
        return leaf.with_i8_storage()

    return jax.tree_util.tree_map_with_path(
        conv, tree, is_leaf=lambda v: isinstance(v, QuantTensor))


# ---------------------------------------------------------------------------
# quantize (host side, numpy — used once at weight-load time)
# ---------------------------------------------------------------------------


def _bf16_round_np(x: np.ndarray) -> np.ndarray:
    """Round f32 -> bf16 (RNE) and return the snapped f32 values."""
    u = np.asarray(x, np.float32).view(np.uint32)
    rounding = 0x7FFF + ((u >> 16) & 1)
    return (((u + rounding) & 0xFFFF0000).astype(np.uint32)).view(np.float32)


def _quantize_q8_0(w: np.ndarray) -> QuantTensor:
    o, i = w.shape
    assert i % QK == 0, f"q8_0 needs I % {QK} == 0, got {i}"
    blocks = w.reshape(o, i // QK, QK).astype(np.float32)
    amax = np.max(np.abs(blocks), axis=-1)
    ds = _bf16_round_np(amax / 127.0)
    inv = np.where(ds > 0, 1.0 / np.maximum(ds, 1e-30), 0.0)
    q = np.clip(np.round(blocks * inv[..., None]), -127, 127).astype(np.int8)
    return QuantTensor("q8_0", (o, i), jnp.asarray(q.reshape(o, i)),
                       jnp.asarray(ds).astype(jnp.bfloat16))


def _quantize_q8_r(w: np.ndarray) -> QuantTensor:
    """Per-row symmetric int8 (w8 per-channel): d = rowmax(|w|)/127.
    TPU-native fast path — the matmul stays a raw int8 MXU contraction
    in plain XLA (see QuantTensor docstring)."""
    o, i = w.shape
    wf = w.astype(np.float32)
    amax = np.max(np.abs(wf), axis=-1, keepdims=True)       # [O, 1]
    ds = _bf16_round_np(amax / 127.0)
    inv = np.where(ds > 0, 1.0 / np.maximum(ds, 1e-30), 0.0)
    q = np.clip(np.round(wf * inv), -127, 127).astype(np.int8)
    return QuantTensor("q8_r", (o, i), jnp.asarray(q),
                       jnp.asarray(ds).astype(jnp.bfloat16))


def _quantize_q4_0(w: np.ndarray) -> QuantTensor:
    o, i = w.shape
    assert i % QK == 0 and i % 2 == 0
    blocks = w.reshape(o, i // QK, QK).astype(np.float32)
    # signed-max trick: scale by the signed extreme / -8 so that the extreme
    # maps exactly onto an endpoint of [-8, 7]
    idx = np.argmax(np.abs(blocks), axis=-1)
    ext = np.take_along_axis(blocks, idx[..., None], axis=-1)[..., 0]
    ds = _bf16_round_np(ext / -8.0)
    inv = np.where(np.abs(ds) > 0, 1.0 / np.where(ds == 0, 1.0, ds), 0.0)
    q = np.clip(np.round(blocks * inv[..., None]) + 8, 0, 15).astype(np.uint8)
    q = q.reshape(o, i)
    packed = (q[:, : i // 2] | (q[:, i // 2 :] << 4)).astype(np.uint8)
    return QuantTensor("q4_0", (o, i), jnp.asarray(packed),
                       jnp.asarray(ds).astype(jnp.bfloat16))


def _fit_asym_subblocks(blocks: np.ndarray):
    """Per-32-subblock asymmetric fit: w ~= s*q - m with q in [0,15], m >= 0."""
    wmin = np.minimum(blocks.min(axis=-1), 0.0)   # force m >= 0
    wmax = np.maximum(blocks.max(axis=-1), 0.0)
    s = (wmax - wmin) / 15.0
    m = -wmin
    return s, m


def _quantize_q4_k(w: np.ndarray) -> QuantTensor:
    o, i = w.shape
    assert i % QK_K == 0, f"q4_k needs I % {QK_K} == 0, got {i}"
    nsb = i // QK_K
    blocks = w.reshape(o, nsb, 8, QK).astype(np.float32)
    s, m = _fit_asym_subblocks(blocks)                     # [O, nsb, 8]
    dsnap = _bf16_round_np(s.max(axis=-1) / 63.0)          # [O, nsb]
    dminsnap = _bf16_round_np(m.max(axis=-1) / 63.0)
    ds = dsnap[..., None]
    dmins = dminsnap[..., None]
    sc = np.clip(np.round(np.divide(s, ds, out=np.zeros_like(s), where=ds > 0)),
                 0, 63).astype(np.uint8)
    mn = np.clip(np.round(np.divide(m, dmins, out=np.zeros_like(m), where=dmins > 0)),
                 0, 63).astype(np.uint8)
    eff_s = ds * sc            # quantized effective scale  [O, nsb, 8]
    eff_m = dmins * mn
    inv = np.where(eff_s > 0, 1.0 / np.where(eff_s == 0, 1.0, eff_s), 0.0)
    q = np.clip(np.round((blocks + eff_m[..., None]) * inv[..., None]),
                0, 15).astype(np.uint8)
    q = q.reshape(o, i)
    packed = (q[:, : i // 2] | (q[:, i // 2 :] << 4)).astype(np.uint8)
    return QuantTensor("q4_k", (o, i), jnp.asarray(packed),
                       jnp.asarray(dsnap).astype(jnp.bfloat16),
                       sc=jnp.asarray(sc), mn=jnp.asarray(mn),
                       dmin=jnp.asarray(dminsnap).astype(jnp.bfloat16),
                       es=jnp.asarray(eff_s.reshape(o, i // QK))
                          .astype(jnp.bfloat16),
                       em=jnp.asarray(eff_m.reshape(o, i // QK))
                          .astype(jnp.bfloat16))


def quantize(w: np.ndarray, fmt: str, native: bool = True) -> QuantTensor:
    w = np.asarray(w)
    assert w.ndim == 2, f"only 2-D weights quantize, got {w.shape}"
    if fmt not in QUANT_FORMATS:
        raise ValueError(f"unknown quant format {fmt!r}")
    if fmt == "q8_r":
        return _quantize_q8_r(w)
    if native:
        # multithreaded C++ fast path (native/quant.cpp); numpy fallback
        from moshi_tpu.native_quant import quantize_native
        packed = quantize_native(w, fmt)
        if packed is not None:
            def _sc(a):
                return (None if a is None else
                        jnp.asarray(np.asarray(a, np.float32))
                        .astype(jnp.bfloat16))
            qt = QuantTensor(
                fmt, (w.shape[0], w.shape[1]),
                jnp.asarray(packed["q"]), _sc(packed["d"]),
                sc=jnp.asarray(packed["sc"]) if "sc" in packed else None,
                mn=jnp.asarray(packed["mn"]) if "mn" in packed else None,
                dmin=_sc(packed.get("dmin")))
            return qt.with_eff_scales()
    if fmt == "q8_0":
        return _quantize_q8_0(w)
    if fmt == "q4_0":
        return _quantize_q4_0(w)
    if fmt == "q4_k":
        return _quantize_q4_k(w)
    raise ValueError(f"unknown quant format {fmt!r}")


# ---------------------------------------------------------------------------
# dequantize (device side, jnp — fuses into consumers under jit)
# ---------------------------------------------------------------------------

def _unpack_nibbles(packed: jnp.ndarray) -> jnp.ndarray:
    lo = packed & jnp.uint8(15)
    hi = packed >> jnp.uint8(4)
    return jnp.concatenate([lo, hi], axis=-1)


def dequantize(qt: QuantTensor, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Shape-agnostic: works on the base [O, I] layout and on stacked
    leaves with extra leading axes (e.g. [L, O, I/2] from lax.scan stacks).
    Handles both packed-nibble and unpacked-i8 storage (`with_i8_storage`;
    q4_0 i8 storage already carries the -8 zero point)."""
    if qt.fmt == "q8_0":
        d = jnp.repeat(qt.d.astype(jnp.float32), QK, axis=-1)
        w = qt.q.astype(jnp.float32) * d
    elif qt.fmt == "q8_r":
        w = qt.q.astype(jnp.float32) * qt.d.astype(jnp.float32)
    elif qt.fmt == "q4_0":
        if qt.unpacked:
            q = qt.q.astype(jnp.float32)
        else:
            q = _unpack_nibbles(qt.q).astype(jnp.float32) - 8.0
        d = jnp.repeat(qt.d.astype(jnp.float32), QK, axis=-1)
        w = q * d
    elif qt.fmt == "q4_k":
        q = (qt.q if qt.unpacked else _unpack_nibbles(qt.q)) \
            .astype(jnp.float32)
        i = q.shape[-1]
        lead = q.shape[:-2] + (q.shape[-2],)
        eff_s = qt.d.astype(jnp.float32)[..., None] * qt.sc.astype(jnp.float32)
        eff_m = qt.dmin.astype(jnp.float32)[..., None] * qt.mn.astype(jnp.float32)
        w = q * jnp.repeat(eff_s.reshape(lead + (i // QK,)), QK, axis=-1) \
            - jnp.repeat(eff_m.reshape(lead + (i // QK,)), QK, axis=-1)
    else:
        raise ValueError(qt.fmt)
    return w.astype(dtype)


def flatten_lead(qt: QuantTensor) -> QuantTensor:
    """Merge the two leading axes of a stacked QuantTensor: [W, O, ...]
    components become [W*O, ...], i.e. the stacked weight is viewed as one
    tall [W*O, I] matrix (used to batch per-step projections into a single
    matmul: y = x @ W_all.T -> reshape [W, O])."""
    def f(a):
        return None if a is None else a.reshape((-1,) + a.shape[2:])
    w, o = qt.q.shape[:2]
    i = qt.shape[-1]
    return QuantTensor(qt.fmt, (w * o, i), f(qt.q), f(qt.d), f(qt.sc),
                       f(qt.mn), f(qt.dmin), f(qt.es), f(qt.em))


def dequantize_rows(qt: QuantTensor, rows: jnp.ndarray, dtype=jnp.bfloat16):
    """Gather + dequantize selected rows (embedding lookup on packed data).

    Mirrors the reference's quantized-embedding get_rows path
    (/root/reference/src/moshi/models/lm_utils.h:24-33).
    """
    flat_rows = rows.reshape(-1)
    picked = QuantTensor(
        qt.fmt, (flat_rows.shape[0], qt.shape[1]),
        jnp.take(qt.q, flat_rows, axis=0),
        jnp.take(qt.d, flat_rows, axis=0),
        None if qt.sc is None else jnp.take(qt.sc, flat_rows, axis=0),
        None if qt.mn is None else jnp.take(qt.mn, flat_rows, axis=0),
        None if qt.dmin is None else jnp.take(qt.dmin, flat_rows, axis=0),
    )
    out = dequantize(picked, dtype)
    return out.reshape(rows.shape + (qt.shape[1],))


# ---------------------------------------------------------------------------
# matmul entry point
# ---------------------------------------------------------------------------

_PALLAS_ENABLED = False


def enable_pallas(flag: bool = True):
    """Switch the hot paths to fused Pallas kernels (dequant+matmul and
    the decode attention kernel)."""
    global _PALLAS_ENABLED
    _PALLAS_ENABLED = flag


def pallas_enabled() -> bool:
    return _PALLAS_ENABLED


def pallas_layout_ok(qt: QuantTensor) -> bool:
    """The split-half kernels contract lo/hi planar halves separately, so
    scale blocks must not straddle the half boundary: K % 64 == 0 for
    4-bit formats (q8_0 has no packing)."""
    if qt.fmt == "q8_r":
        return False      # q8_r is the plain-XLA int8 path by design
    if qt.fmt in ("q4_0", "q4_k"):
        k2 = qt.q.shape[-1]
        return k2 % QK == 0
    return True


def _rms_pre_norm(x, alpha):
    xf = x.astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return xf * jax.lax.rsqrt(ms + 1e-8) * alpha.astype(jnp.float32)


def qmatmul(x: jnp.ndarray, w, out_dtype=None,
            pre_norm_alpha=None) -> jnp.ndarray:
    """y = x @ w.T for plain arrays or QuantTensors.  x: [..., I] -> [..., O].
    `pre_norm_alpha` fuses an rms pre-norm of x (in-kernel on the Pallas
    path; inline on the XLA path) — same math as nn.layers.rms_norm."""
    if isinstance(w, QuantTensor) and w.fmt == "q8_r":
        # w8a8: per-token-quantize the activation, contract raw int8 on
        # the MXU (plain XLA — streams at the dense rate, shards under
        # GSPMD), scale by (activation scale x per-row weight scale)
        if pre_norm_alpha is not None:
            x = _rms_pre_norm(x, pre_norm_alpha)
        xf = x.astype(jnp.float32)
        ax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
        ax = jnp.maximum(ax, 1e-12)
        x8 = jnp.clip(jnp.round(xf / ax), -127, 127).astype(jnp.int8)
        yi = jax.lax.dot_general(
            x8, w.q, (((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        drow = w.d.astype(jnp.float32).reshape((1,) * (x.ndim - 1) + (-1,))
        y = yi.astype(jnp.float32) * ax * drow
        return y.astype(out_dtype) if out_dtype is not None else y
    if isinstance(w, QuantTensor):
        ok = _PALLAS_ENABLED and pallas_layout_ok(w)
        if ok:
            from moshi_tpu.quant import pallas_matmul
            m = 1
            for s in x.shape[:-1]:
                m *= s
            ok = pallas_matmul.storage_ok(w, m)
        if ok:
            y = pallas_matmul.qmatmul_pallas(x, w, alpha=pre_norm_alpha)
        else:
            if pre_norm_alpha is not None:
                x = _rms_pre_norm(x, pre_norm_alpha)
            wd = dequantize(w, jnp.bfloat16)
            y = jax.lax.dot_general(
                x.astype(jnp.bfloat16), wd,
                (((x.ndim - 1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    else:
        if pre_norm_alpha is not None:
            x = _rms_pre_norm(x, pre_norm_alpha)
        y = jax.lax.dot_general(
            x.astype(w.dtype) if w.dtype == jnp.bfloat16 else x, w,
            (((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if out_dtype is not None:
        y = y.astype(out_dtype)
    return y


# ---------------------------------------------------------------------------
# shard-time slicing (tensor parallelism).  Row takes are exact for every
# format; column slices are exact when the boundaries are block-aligned
# (QK_K for q4_k, QK otherwise) and requantize the slice (same bitwidth,
# loader-style fallback) when not.  Host-side, one-off at shard time.
# ---------------------------------------------------------------------------


def _row_axis(field: str) -> int:
    """Axis of the O dimension in a component array, counted from the
    end (supports stacked leading dims)."""
    return -3 if field in ("sc", "mn") else -2


def qt_take_rows(qt: QuantTensor, rows) -> QuantTensor:
    """Row subset/permutation (exact; all components index on O)."""
    rows = np.asarray(rows)

    def take(field):
        a = getattr(qt, field)
        if a is None:
            return None
        return jnp.take(jnp.asarray(a), jnp.asarray(rows),
                        axis=a.ndim + _row_axis(field))
    return QuantTensor(qt.fmt, (int(rows.size), qt.shape[1]),
                       take("q"), take("d"), take("sc"), take("mn"),
                       take("dmin"), take("es"), take("em"))


def _unpack_planar_np(q: np.ndarray) -> np.ndarray:
    return np.concatenate([q & 15, q >> 4], axis=-1)


def _pack_planar_np(u: np.ndarray) -> np.ndarray:
    half = u.shape[-1] // 2
    return (u[..., :half] | (u[..., half:] << 4)).astype(np.uint8)


def qt_slice_cols(qt: QuantTensor, c0: int, c1: int) -> QuantTensor:
    """Columns [c0, c1) of the logical [.., O, I] weight as a self-
    contained QuantTensor (planar repack within the slice).  Exact when
    c0/c1 are block-aligned; otherwise dequantizes the slice and
    requantizes (same bitwidth, q4_k -> q4_0 fallback when the width
    isn't a superblock multiple — mirrors loader.h:162-172)."""
    w = c1 - c0
    if qt.fmt == "q8_r":
        # per-row scales are column-invariant: any col slice is exact
        return QuantTensor("q8_r", (qt.shape[0], w),
                           jnp.asarray(np.asarray(qt.q)[..., c0:c1]),
                           qt.d)
    block = QK_K if qt.fmt == "q4_k" else QK
    if c0 % block or c1 % block:
        sl = np.asarray(dequantize(qt, jnp.float32))[..., c0:c1]
        fmt = qt.fmt
        if fmt == "q4_k" and w % QK_K:
            fmt = "q4_0"
        if w % QK:
            raise ValueError(f"column slice width {w} not a {QK} multiple")
        assert sl.ndim == 2, "misaligned col slice only on base [O, I]"
        return quantize(sl, fmt)
    if qt.fmt == "q8_0":
        return QuantTensor(
            "q8_0", (qt.shape[0], w),
            jnp.asarray(np.asarray(qt.q)[..., c0:c1]),
            jnp.asarray(np.asarray(qt.d)[..., c0 // QK:c1 // QK]))
    # 4-bit planar: unpack, slice, repack within the slice
    qn = _unpack_planar_np(np.asarray(qt.q))[..., c0:c1]
    packed = jnp.asarray(_pack_planar_np(qn))
    if qt.fmt == "q4_0":
        return QuantTensor(
            "q4_0", (qt.shape[0], w), packed,
            jnp.asarray(np.asarray(qt.d)[..., c0 // QK:c1 // QK]))
    nsb0, nsb1 = c0 // QK_K, c1 // QK_K

    def s32(a):
        return None if a is None else \
            jnp.asarray(np.asarray(a)[..., c0 // QK:c1 // QK])
    return QuantTensor(
        "q4_k", (qt.shape[0], w), packed,
        jnp.asarray(np.asarray(qt.d)[..., nsb0:nsb1]),
        sc=jnp.asarray(np.asarray(qt.sc)[..., nsb0:nsb1, :]),
        mn=jnp.asarray(np.asarray(qt.mn)[..., nsb0:nsb1, :]),
        dmin=jnp.asarray(np.asarray(qt.dmin)[..., nsb0:nsb1]),
        es=s32(qt.es), em=s32(qt.em))
