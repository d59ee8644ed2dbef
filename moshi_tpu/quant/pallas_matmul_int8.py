"""Integer-MXU fused quantized matvec kernels (decode path).

The f32-dequant kernels in pallas_matmul.py are VPU-bound: ~10 f32
lane-passes per weight (unpack converts, scale expansion, multiplies,
bf16 casts) cap the 7B temporal stack at ~0.12 TB/s — 12x below this
chip's HBM rate (BENCH_NOTES round-3 probe).  This module removes the
weight-side VPU work entirely, the same numeric move GGML's CUDA backend
makes (vec_dot_q4_K_q8_1: quantize the *activation* to int8 per 32-block
and contract raw integers) — reference usage: /root/reference/src/
loader.h:149-189's q-formats are consumed by exactly such kernels:

  * the activation row is rms-normed (optional fused alpha), split into
    K/32 blocks, and quantized to int8 per-block IN-KERNEL (VMEM scratch,
    computed once at grid step 0);
  * the quantized row is spread block-diagonally: xq_sp[b, k] = xq[k] if
    k//32 == b else 0, so ONE int8 MXU contraction per weight tile
    yields all per-block partial dots P[o, b] = sum_{k in b} w[o,k]xq[k];
  * the scale epilogue is 3 VPU passes over [TO, K/32] (1/32nd of the
    weight tile):  y[o] = sum_b es[o,b]*dx[b]*P[o,b] - em[o,b]*xs[b]
    (q4_k; q8_0/q4_0 drop the min term — q4_0 unpacks to SIGNED i8 so
    the -8 zero-point vanishes at storage time);
  * output is written as an [O, 1] column (block (TO, 1): lane dim ==
    array dim, which Mosaic allows), so scales stay in natural [O, NB]
    layout and nothing is ever transposed.

Weights may be stored PACKED (planar u8, unpacked to i8 in-kernel — a
~6-int-pass chain) or UNPACKED (natural-order i8 [O, K], zero weight-side
VPU work, 2x HBM bytes of packed 4-bit).  `QuantTensor.with_i8_storage`
(formats.py) converts; kernels dispatch on q.dtype.

Numerics: per-32-block int8 activation quantization adds ~0.5% relative
error per matvec — the same class as the reference GPU path (GGML
quantizes activations to q8_1 for every K-quant mat-vec) and well under
the 3-5% weight-quantization noise.  MOSHI_TPU_INT8=0 restores the
f32-dequant kernels.

Constraints (callers fall back when unmet): one activation row (m == 1),
K % 32 == 0, (K/32) % 8 == 0, O % tile == 0 via _pick_tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from moshi_tpu.utils.pallas_mode import with_interpret_default
from moshi_tpu.quant.formats import QK, QuantTensor
from moshi_tpu.quant.pallas_matmul import _flat2, _pick_tile

_PREP_CHUNK = 2048   # activation-spread prep chunk (bounds f32 temps)
_UNPACK_CHUNK = 512  # packed-weight unpack chunk


def int8_shape_ok(qt: QuantTensor, m: int) -> bool:
    """Static eligibility of the int8-MXU kernels for this weight and
    activation row count.  m <= 8 rows batch into one kernel (per-row
    block-diagonal spreads stacked on the sublane axis — round 5: B>1
    serving used to fall off onto the VPU-bound dequant kernels)."""
    if qt.fmt not in ("q4_k", "q4_0", "q8_0"):
        return False
    if not (1 <= m <= 8):
        return False
    if m > 1 and qt.fmt in ("q4_k", "q4_0") and qt.q.dtype != jnp.uint8:
        # unpacked-i8 STORAGE (with_i8_storage) stays a B=1 decode
        # optimization: 2x HBM bytes lose at batch, and the m>1 callers
        # (gating_mlp etc.) expect the XLA fallback for it
        return False
    k = qt.shape[-1]
    if k % QK:
        return False
    if (k // QK) % 8:
        # the kernels CAN pad non-sublane-aligned block counts (_pad8),
        # but the per-call jnp.pad of the stacked scale lanes executes
        # inside layer scans (hardware A/B: +3.7 ms/frame from 48x13 MB
        # pads in the depformer scan) — don't auto-dispatch; call
        # qmatmul_i8 directly if the weight layout is pre-padded
        return False
    # the block-diagonal activation spread lives in VMEM as
    # [m*nb_pad, k] i8 ~= m*k^2/32 bytes; cap it well under the 100 MB
    # limit (real shapes: k in {1024, 2048, 4096, 8448, 11264}; the cap
    # admits the TTS class's k=8448 at m=8 while keeping the 7B
    # linear_out's k=11264 to m <= 4)
    if m * _pad8(k // QK) * k > 18 * 1024 * 1024:
        return False
    return True


def _pad8(nb: int) -> int:
    """Sublane-align the block axis: scratch rows and scale lanes are
    padded to a multiple of 8; padded blocks carry dx=1, xq=0, scale=0
    and contribute exactly zero (k=4224 -> nb=132 -> nb_pad=136)."""
    return -(-nb // 8) * 8


# ---------------------------------------------------------------------------
# kernel bodies
# ---------------------------------------------------------------------------


def _prep_int8_activation(x, alpha_val, xq_s, xs_s, dx_s, *, k, nb):
    """Norm (optional) + per-32-block int8 quantization of the
    activation rows (a VALUE [m, K] — callers pass `x_ref[:]`, or an
    in-kernel intermediate like the fused attn-out+FFN-in kernel's
    residual sum) into VMEM scratch.  Runs once, at grid step 0.

    Produces (per row r, at static sublane offset r*nb): xq_s
    [m*nb, k] i8 block-diagonal spreads; dx_s/xs_s [m, nb] f32
    per-block scales / block sums of the QUANTIZED rows (dx_b *
    sum(xq_b) — GGML's q8_1 `s` field).  The min/zero-point epilogue
    terms must consume the same x_quant the MXU term does, so the whole
    kernel computes exactly x_quant @ W_deq.T and the activation-quant
    error couples only to the CENTERED weights; exact sums would couple
    it to the unsigned es*q part (~2x larger values) and measurably
    amplify the noise.  The [nb, 1] -> [1, nb] turns are MXU identity
    contractions (Mosaic has no cheap sublane<->lane transpose); the
    per-row python loop keeps every sublane offset STATIC (no
    vectorized modulo — a non-pow2 `%` wedges this Mosaic)."""
    x = x.astype(jnp.float32)
    if alpha_val is not None:
        ms = jnp.mean(x * x, axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(ms + 1e-8) * alpha_val.astype(jnp.float32)
    m_rows = x.shape[0]
    ri = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (nb, nb), 1)
    ident = (ri == ci).astype(jnp.float32)
    for r in range(m_rows):
        xr = x[r: r + 1]
        # pass 1 (chunked): per-block max -> scales
        m_parts = []
        for c0 in range(0, k, _PREP_CHUNK):
            cs = min(_PREP_CHUNK, k - c0)
            rows = jax.lax.broadcasted_iota(jnp.int32, (nb, cs), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (nb, cs), 1) + c0
            mask = (cols // QK) == rows
            xc = jnp.where(mask, xr[:, c0:c0 + cs], 0.0)
            m_parts.append(jnp.max(jnp.abs(xc), axis=1, keepdims=True))
        mx = functools.reduce(jnp.maximum, m_parts)
        dx = jnp.where(mx > 0, mx / 127.0, 1.0)            # [nb, 1]
        # pass 2 (chunked): quantize the spread into i8 scratch;
        # accumulate the quantized block sums
        qs_parts = []
        for c0 in range(0, k, _PREP_CHUNK):
            cs = min(_PREP_CHUNK, k - c0)
            rows = jax.lax.broadcasted_iota(jnp.int32, (nb, cs), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (nb, cs), 1) + c0
            mask = (cols // QK) == rows
            xc = jnp.where(mask, xr[:, c0:c0 + cs], 0.0)
            xqf = jnp.round(xc / dx)
            qs_parts.append(jnp.sum(xqf, axis=1, keepdims=True))
            xq_s[r * nb:(r + 1) * nb, c0:c0 + cs] = xqf.astype(jnp.int8)
        xs_col = functools.reduce(jnp.add, qs_parts) * dx  # [nb, 1]
        xs_s[r: r + 1, :] = jax.lax.dot_general(
            xs_col, ident, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dx_s[r: r + 1, :] = jax.lax.dot_general(
            dx, ident, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _int8_partial_dots(w_ref, xq_s, *, k, packed):
    """P[o, b] = sum_{k in b} w[o, k] * xq[k] on the MXU (i32 acc).
    `packed`: w_ref holds planar u8 nibbles [TO, K/2] (unpacked to i8 in
    chunks); else natural-order i8 [TO, K]."""
    if not packed:
        return jax.lax.dot_general(
            w_ref[:], xq_s[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
    k2 = k // 2
    to = w_ref.shape[0]
    nb = xq_s.shape[0]
    acc = jnp.zeros((to, nb), jnp.int32)
    for c0 in range(0, k2, _UNPACK_CHUNK):
        cs = min(_UNPACK_CHUNK, k2 - c0)
        pk = w_ref[:, c0:c0 + cs].astype(jnp.int32)
        lo = (pk & 15).astype(jnp.int8)
        # u8 source: after the convert pk is 0..255, so >>4 is already
        # 0..15 — no mask needed (round-5 unpack probe U1, -2.6%)
        hi = (pk >> 4).astype(jnp.int8)
        acc += jax.lax.dot_general(
            lo, xq_s[:, c0:c0 + cs], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc += jax.lax.dot_general(
            hi, xq_s[:, k2 + c0:k2 + c0 + cs], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
    return acc


def _epilogue_q4k(p, es_ref, em_ref, dx, xs):
    """p [TO, nb] i32, dx/xs [1, nb] f32 values -> y [TO, 1]."""
    pf = p.astype(jnp.float32) * dx
    y = (es_ref[:].astype(jnp.float32) * pf
         - em_ref[:].astype(jnp.float32) * xs)
    return jnp.sum(y, axis=1, keepdims=True)


def _epilogue_scale_only(p, d_ref, dx):
    pf = p.astype(jnp.float32) * dx
    return jnp.sum(d_ref[:].astype(jnp.float32) * pf, axis=1,
                   keepdims=True)


def _epilogue_q4_0_packed(p, d_ref, dx, xs):
    """Packed q4_0 keeps UNSIGNED nibbles (value = d*(q - 8)); fold the
    -8 zero point through the exact f32 block sums:
    y[o] = sum_b d[o,b] * (dx[b]*P[o,b] - 8*xs[b])."""
    pf = p.astype(jnp.float32) * dx - 8.0 * xs
    return jnp.sum(d_ref[:].astype(jnp.float32) * pf, axis=1,
                   keepdims=True)


def _mk_kernel(fmt: str, k: int, nb: int, packed: bool, fuse_norm: bool,
               glu: bool, m: int = 1):
    """Build the kernel body.  Ref order after the scalar-prefetch layer
    index: x, [alpha], weight components (q, scales...) — twice for
    glu —, out, then scratch (xq, xs, dx).  `m` rows batch: the spread
    scratch stacks per-row block diagonals, ONE MXU contraction yields
    every row's partial dots, and the epilogue loops rows at static
    offsets writing o_ref [TO, m] columns."""
    two_scale = fmt == "q4_k"
    zp8 = fmt == "q4_0" and packed   # unsigned nibbles, -8 zero point
    nw = 3 if two_scale else 2
    ngroups = 2 if glu else 1

    def kernel(l_ref, *refs):
        idx = 0
        x_ref = refs[idx]
        idx += 1
        alpha_val = None
        if fuse_norm:
            alpha_val = refs[idx][0]          # [1, K] value
            idx += 1
        groups = []
        for _ in range(ngroups):
            groups.append(refs[idx:idx + nw])
            idx += nw
        o_ref = refs[idx]
        xq_s, xs_s, dx_s = refs[idx + 1:idx + 4]

        @pl.when(pl.program_id(0) == 0)
        def _():
            _prep_int8_activation(x_ref[:], alpha_val, xq_s, xs_s, dx_s,
                                  k=k, nb=nb)

        def row_y(g, p, r):
            pr = p[:, r * nb:(r + 1) * nb]
            dx = dx_s[r: r + 1, :]
            xs = xs_s[r: r + 1, :]
            if two_scale:
                return _epilogue_q4k(pr, g[1], g[2], dx, xs)
            if zp8:
                return _epilogue_q4_0_packed(pr, g[1], dx, xs)
            return _epilogue_scale_only(pr, g[1], dx)

        ps = [_int8_partial_dots(g[0], xq_s, k=k, packed=packed)
              for g in groups]                 # [TO, m*nb] each
        for r in range(m):
            if glu:
                gate = row_y(groups[0], ps[0], r)
                val = row_y(groups[1], ps[1], r)
                yr = gate * (1.0 / (1.0 + jnp.exp(-gate))) * val
            else:
                yr = row_y(groups[0], ps[0], r)
            o_ref[:, r: r + 1] = yr

    return kernel


# ---------------------------------------------------------------------------
# pair-order grouped spread (opt-in MOSHI_TPU_SPLIT_SPREAD=1)
#
# The standard kernel contracts every unpack chunk against ALL nb_pad
# spread rows — O x nb x K MACs even though each chunk only touches
# nb/(K/chunk) blocks.  For K=11264 (the 7B linear_out, nb=352 -> three
# 128-lane MXU tiles per chunk) that is 44% of the frame's spread MACs.
# This variant lays the spread out in PAIR-ORDER groups: each group of
# 2048 packed columns owns 64 lo-blocks + 64 hi-blocks = exactly 128
# rows at a 128-aligned offset, so each chunk contracts against ONE
# 128-row group (3x fewer nominal MXU passes for K=11264) and every
# slice is 128-lane / 8-sublane aligned.  Scales are gathered to the
# same pair-order lane layout OUTSIDE the kernel (loop-invariant: XLA
# hoists the gather out of the frame scan).
#
# HARDWARE VERDICT (round 5): LOSES 2x — 7B LM-only p50 88.2 ms vs the
# standard kernel's 42.85 (digest-valid).  The nominal-MAC reduction
# does not survive Mosaic codegen (per-group loops break the
# DMA/compute pipeline; the zero-padded full-group prep writes add VPU
# passes).  Kept opt-in as a measured negative result — see
# BENCH_NOTES.md.
# ---------------------------------------------------------------------------

_GROUP_COLS = 2048     # packed u8 columns per group (64 lo + 64 hi blocks)


def split_spread_enabled() -> bool:
    import os
    return os.environ.get("MOSHI_TPU_SPLIT_SPREAD", "0") == "1"


def _split_ok(qt: QuantTensor, m: int, glu: bool) -> bool:
    if glu or m != 1 or qt.fmt != "q4_k" or qt.q.dtype != jnp.uint8:
        return False
    k = qt.shape[-1]
    k2 = k // 2
    nb = k // QK
    return k % QK == 0 and nb > 128 and k2 % _UNPACK_CHUNK == 0


def _pair_nbp(k: int) -> int:
    half_nb = (k // 2) // QK
    return -(-half_nb // 64) * 128


def _pair_index(k: int):
    """numpy map: pair-order lane -> natural block index (-1 = pad)."""
    import numpy as np
    half_nb = (k // 2) // QK
    nbp = _pair_nbp(k)
    idx = np.full(nbp, -1, np.int32)
    for b in range(half_nb):
        g, s = divmod(b, 64)
        idx[g * 128 + s] = b
        idx[g * 128 + 64 + s] = half_nb + b
    return idx


def _pair_scales(comp, k: int):
    """Gather a [..., nb] scale component into pair-order [..., nbp]
    (pad lanes zero)."""
    import numpy as np
    idx = _pair_index(k)
    g = jnp.take(comp, jnp.asarray(np.maximum(idx, 0)), axis=-1)
    mask = jnp.asarray((idx >= 0), comp.dtype)
    return g * mask


def _prep_pair(x, alpha_val, xq_s, xs_s, dx_s, *, k, nbp):
    """Pair-order spread prep: group g's rows [g*128, g*128+64) hold its
    lo blocks, [+64, +128) its hi blocks; dx/xs land on matching lanes."""
    x = x.astype(jnp.float32)
    if alpha_val is not None:
        ms = jnp.mean(x * x, axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(ms + 1e-8) * alpha_val.astype(jnp.float32)
    k2 = k // 2
    ngroups = nbp // 128
    ri = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    ident = (ri == ci).astype(jnp.float32)
    for g in range(ngroups):
        g0 = g * _GROUP_COLS
        gcs = min(_GROUP_COLS, k2 - g0)
        cols = []
        for half, base in ((0, 0), (1, k2)):
            c0 = base + g0
            rows = jax.lax.broadcasted_iota(jnp.int32, (64, gcs), 0)
            cc = jax.lax.broadcasted_iota(jnp.int32, (64, gcs), 1)
            mask = (cc // QK) == rows
            xc = jnp.where(mask, x[:, c0:c0 + gcs], 0.0)
            mx = jnp.max(jnp.abs(xc), axis=1, keepdims=True)   # [64, 1]
            dx = jnp.where(mx > 0, mx / 127.0, 1.0)
            xqf = jnp.round(xc / dx)
            xs_col = jnp.sum(xqf, axis=1, keepdims=True) * dx
            # write the FULL 128-row group: the dots contract all 128
            # rows against this column window, so the complementary
            # half's rows must be explicit zeros
            z = jnp.zeros((64, gcs), jnp.int8)
            blk = (jnp.concatenate([xqf.astype(jnp.int8), z], axis=0)
                   if half == 0 else
                   jnp.concatenate([z, xqf.astype(jnp.int8)], axis=0))
            xq_s[g * 128:(g + 1) * 128, c0:c0 + gcs] = blk
            cols.append((dx, xs_col))
        dx_col = jnp.concatenate([cols[0][0], cols[1][0]], axis=0)
        xs_col = jnp.concatenate([cols[0][1], cols[1][1]], axis=0)
        dx_s[:, g * 128:(g + 1) * 128] = jax.lax.dot_general(
            dx_col, ident, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        xs_s[:, g * 128:(g + 1) * 128] = jax.lax.dot_general(
            xs_col, ident, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _split_partial_dots(w_ref, xq_s, *, k, nbp):
    """Grouped dots: each 512-col unpack chunk contracts against its
    OWN 128-row pair-order group — [TO, cs] x [128, cs] instead of
    [TO, cs] x [nbp, cs]."""
    k2 = k // 2
    to = w_ref.shape[0]
    ngroups = nbp // 128
    pieces = []
    for g in range(ngroups):
        g0 = g * _GROUP_COLS
        gcs = min(_GROUP_COLS, k2 - g0)
        acc = jnp.zeros((to, 128), jnp.int32)
        rows = xq_s[g * 128:(g + 1) * 128, :]
        for c0 in range(g0, g0 + gcs, _UNPACK_CHUNK):
            cs = min(_UNPACK_CHUNK, g0 + gcs - c0)
            pk = w_ref[:, c0:c0 + cs].astype(jnp.int32)
            lo = (pk & 15).astype(jnp.int8)
            hi = (pk >> 4).astype(jnp.int8)
            acc += jax.lax.dot_general(
                lo, rows[:, c0:c0 + cs], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc += jax.lax.dot_general(
                hi, rows[:, k2 + c0:k2 + c0 + cs],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
        pieces.append(acc)
    return jnp.concatenate(pieces, axis=1)           # [TO, nbp]


def _mk_kernel_split(k: int, nbp: int, fuse_norm: bool):
    def kernel(l_ref, *refs):
        idx = 0
        x_ref = refs[idx]
        idx += 1
        alpha_val = None
        if fuse_norm:
            alpha_val = refs[idx][0]
            idx += 1
        q_ref, es_ref, em_ref = refs[idx:idx + 3]
        o_ref = refs[idx + 3]
        xq_s, xs_s, dx_s = refs[idx + 4:idx + 7]

        @pl.when(pl.program_id(0) == 0)
        def _():
            _prep_pair(x_ref[:], alpha_val, xq_s, xs_s, dx_s,
                       k=k, nbp=nbp)

        p = _split_partial_dots(q_ref, xq_s, k=k, nbp=nbp)
        o_ref[:] = _epilogue_q4k(p, es_ref, em_ref, dx_s[:], xs_s[:])

    return kernel


# ---------------------------------------------------------------------------
# k-segment reduction grid (opt-in MOSHI_TPU_KSEG=1)
#
# Same MXU-pass reduction the pair-order split targets (each 512-col
# unpack chunk contracts against ONE 128-row pair-order spread group
# instead of all nb_pad rows — 3x fewer effective MXU passes for the 7B
# linear_out's K=11264/nb=352), but expressed as a REDUCTION GRID
# instead of in-kernel per-group loops: grid = (o_tiles, nsegs, 4
# chunks), Pallas streams one (tile, 512) weight block per step, an i32
# scratch accumulates the segment's partial dots, and the per-segment
# epilogue accumulates into the revisited output block.  This is the
# canonical Mosaic tiled-matmul pattern — built to test whether the
# split-spread variant's 2x hardware loss came from its in-kernel group
# loops breaking the DMA/compute pipeline (a grid dimension cannot).
#
# HARDWARE VERDICT (round 5): LOSES the SAME 2x — 7B LM-only p50
# 89.7 ms vs the standard kernel's 42.85 (digest-valid), bit-identical
# in class to the loop-level split-spread's 88.2.  Two independent
# expressions of the reduced-pass contraction measuring the same loss
# retires the "loop structure" hypothesis: on this Mosaic toolchain the
# [TO, 512] x [128, 512] chunk-vs-one-group dot shape itself is ~2x
# slower end-to-end than contracting each chunk against ALL nb rows,
# nominal-MAC count notwithstanding.  The full-row spread dot is a
# sharp local optimum; both variants stay opt-in as measured negative
# results (BENCH_NOTES.md).
#
# Layout: segment s owns packed cols [s*2048, (s+1)*2048) = 64 lo + 64
# hi blocks as spread scratch rows [s*128, (s+1)*128) (rows +0..64 lo
# over local cols [0, 2048), rows +64..128 hi over local cols [2048,
# 4096)); scales are gathered OUTSIDE the kernel to the matching
# seg-major lane order (loop-invariant, hoisted like with_eff_scales).
# Every slice is 128-lane / 8-sublane aligned; no weight re-layout and
# no load-time padding (a short last segment masks its tail chunks).
# ---------------------------------------------------------------------------

_SEG_CHUNKS = 4                      # 512-col chunks per segment
_SEG_COLS = _SEG_CHUNKS * _UNPACK_CHUNK   # 2048 packed cols = 128 blocks


def kseg_enabled() -> bool:
    import os
    return os.environ.get("MOSHI_TPU_KSEG", "0") == "1"


def _kseg_ok(qt: QuantTensor, m: int, glu: bool) -> bool:
    """Wide-K packed q4_k matvecs only: the grid reduction pays when the
    block count exceeds one MXU lane tile (nb > 128 — the 7B
    linear_out); narrower shapes already contract a single tile."""
    if glu or m != 1 or qt.fmt != "q4_k" or qt.q.dtype != jnp.uint8:
        return False
    k = qt.shape[-1]
    if k % QK:
        return False
    k2 = k // 2
    return k // QK > 128 and k2 % _UNPACK_CHUNK == 0


def _kseg_nsegs(k: int) -> int:
    return -(-(k // 2) // _SEG_COLS)


def _kseg_index(k: int):
    """numpy map: seg-major lane -> natural block index (-1 = pad).
    Segment s's lanes [s*128, +64) are its lo blocks [s*64, s*64+64),
    lanes [+64, +128) the matching hi blocks [half_nb + s*64, ...)."""
    import numpy as np
    half_nb = (k // 2) // QK
    nsegs = _kseg_nsegs(k)
    idx = np.full(nsegs * 128, -1, np.int32)
    for s in range(nsegs):
        for j in range(64):
            b = s * 64 + j
            if b < half_nb:
                idx[s * 128 + j] = b
                idx[s * 128 + 64 + j] = half_nb + b
    return idx


def _kseg_scales(comp, k: int):
    """Gather a [..., nb] scale component into seg-major [..., nsegs*128]
    (pad lanes zero)."""
    import numpy as np
    idx = _kseg_index(k)
    g = jnp.take(comp, jnp.asarray(np.maximum(idx, 0)), axis=-1)
    mask = jnp.asarray((idx >= 0), comp.dtype)
    return g * mask


def _prep_kseg(x, alpha_val, xq_s, xs_s, dx_s, *, k, nsegs):
    """Seg-major spread prep (runs once, at grid step (0, 0, 0)).  Per
    segment: quantize its lo / hi 32-blocks, write the [128, 4096]
    spread block (explicit zero complements — the dots contract all 128
    rows), and turn dx / xs columns onto the matching lanes."""
    x = x.astype(jnp.float32)
    if alpha_val is not None:
        ms = jnp.mean(x * x, axis=-1, keepdims=True)
        x = x * jax.lax.rsqrt(ms + 1e-8) * alpha_val.astype(jnp.float32)
    k2 = k // 2
    ri = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    ident = (ri == ci).astype(jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, (64, _SEG_COLS), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (64, _SEG_COLS), 1)
    mask = (cols // QK) == rows
    z8 = jnp.zeros((64, _SEG_COLS), jnp.int8)
    for s in range(nsegs):
        c0 = s * _SEG_COLS
        w = min(_SEG_COLS, k2 - c0)
        halves = []
        for base in (0, k2):
            xh = x[:, base + c0: base + c0 + w]
            if w < _SEG_COLS:
                xh = jnp.concatenate(
                    [xh, jnp.zeros((1, _SEG_COLS - w), jnp.float32)],
                    axis=1)
            xc = jnp.where(mask, xh, 0.0)
            mx = jnp.max(jnp.abs(xc), axis=1, keepdims=True)   # [64, 1]
            dx = jnp.where(mx > 0, mx / 127.0, 1.0)
            xqf = jnp.round(xc / dx)
            xs_col = jnp.sum(xqf, axis=1, keepdims=True) * dx
            halves.append((xqf.astype(jnp.int8), dx, xs_col))
        blk = jnp.concatenate(
            [jnp.concatenate([halves[0][0], z8], axis=1),
             jnp.concatenate([z8, halves[1][0]], axis=1)], axis=0)
        xq_s[s * 128:(s + 1) * 128, :] = blk
        dx_col = jnp.concatenate([halves[0][1], halves[1][1]], axis=0)
        xs_col = jnp.concatenate([halves[0][2], halves[1][2]], axis=0)
        dx_s[0:1, s * 128:(s + 1) * 128] = jax.lax.dot_general(
            dx_col, ident, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        xs_s[0:1, s * 128:(s + 1) * 128] = jax.lax.dot_general(
            xs_col, ident, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)


def _mk_kernel_kseg(k: int, nsegs: int, fuse_norm: bool, tile: int):
    k2 = k // 2
    nchunks = k2 // _UNPACK_CHUNK
    last_chunks = nchunks - (nsegs - 1) * _SEG_CHUNKS   # 1..4

    def kernel(l_ref, *refs):
        idx = 0
        x_ref = refs[idx]
        idx += 1
        alpha_val = None
        if fuse_norm:
            alpha_val = refs[idx][0]
            idx += 1
        q_ref, es_ref, em_ref = refs[idx:idx + 3]
        o_ref = refs[idx + 3]
        xq_s, xs_s, dx_s, acc_s = refs[idx + 4:idx + 8]

        i = pl.program_id(0)
        sg = pl.program_id(1)
        c = pl.program_id(2)
        is_last_seg = sg == nsegs - 1
        valid = jnp.logical_or(jnp.logical_not(is_last_seg),
                               c < last_chunks)
        last_c = jnp.where(is_last_seg, last_chunks - 1, _SEG_CHUNKS - 1)

        @pl.when((i == 0) & (sg == 0) & (c == 0))
        def _():
            _prep_kseg(x_ref[:], alpha_val, xq_s, xs_s, dx_s,
                       k=k, nsegs=nsegs)

        @pl.when((sg == 0) & (c == 0))
        def _():
            o_ref[:] = jnp.zeros((tile, 1), jnp.float32)

        @pl.when(valid & (c == 0))
        def _():
            acc_s[:] = jnp.zeros((tile, 128), jnp.int32)

        @pl.when(valid)
        def _():
            pk = q_ref[:].astype(jnp.int32)          # (tile, 512) block
            lo = (pk & 15).astype(jnp.int8)
            hi = (pk >> 4).astype(jnp.int8)
            coff = c * _UNPACK_CHUNK
            rows_lo = xq_s[pl.ds(sg * 128, 128), pl.ds(coff, _UNPACK_CHUNK)]
            rows_hi = xq_s[pl.ds(sg * 128, 128),
                           pl.ds(_SEG_COLS + coff, _UNPACK_CHUNK)]
            acc_s[:] += (
                jax.lax.dot_general(
                    lo, rows_lo, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                + jax.lax.dot_general(
                    hi, rows_hi, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32))

        @pl.when(valid & (c == last_c))
        def _():
            pr = acc_s[:].astype(jnp.float32)
            dx = dx_s[:, pl.ds(sg * 128, 128)]
            xs = xs_s[:, pl.ds(sg * 128, 128)]
            y = jnp.sum(es_ref[:].astype(jnp.float32) * (pr * dx)
                        - em_ref[:].astype(jnp.float32) * xs,
                        axis=1, keepdims=True)
            o_ref[:] = o_ref[:] + y

    return kernel


@with_interpret_default
@functools.partial(jax.jit, static_argnames=("interpret",))
def qmatmul_i8(x: jnp.ndarray, qt: QuantTensor, layer=None, alpha=None,
               interpret: bool = False):
    """y = (rms_norm(x)*alpha if alpha else x) @ W[layer].T on the
    integer MXU.  x: [..., K] with exactly one row -> [..., O] f32.
    `layer` indexes stacked leaves ([L, O, ...]); None/0 for flat
    weights.  Caller must pre-check `int8_shape_ok`."""
    return _qmatmul_i8_impl(x, qt, layer, alpha, interpret, glu=False)


@with_interpret_default
@functools.partial(jax.jit, static_argnames=("interpret",))
def glu_matmul_i8(x: jnp.ndarray, qt: QuantTensor, layer=None, alpha=None,
                  interpret: bool = False):
    """Fused GLU on the integer MXU: y = silu(x @ Wg[layer].T) *
    (x @ Wv[layer].T) for a fused linear_in [.., 2H, K] (gate rows
    [0, H), value rows [H, 2H)).  Returns [..., H] f32."""
    return _qmatmul_i8_impl(x, qt, layer, alpha, interpret, glu=True)


def _qmatmul_i8_impl(x, qt, layer, alpha, interpret, *, glu):
    orig_shape = x.shape
    k = orig_shape[-1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    assert 1 <= m <= 8, "int8 kernels batch m <= 8 (int8_shape_ok)"
    nb = k // QK
    o_full = qt.q.shape[-2]
    o = o_full // 2 if glu else o_full
    packed = qt.q.dtype == jnp.uint8
    nl = qt.q.size // (o_full * qt.q.shape[-1])
    tile = _pick_tile(o)
    nblocks = o // tile
    lidx = jnp.reshape(jnp.int32(0) if layer is None else layer,
                       (1,)).astype(jnp.int32)
    fuse = alpha is not None

    x_spec = pl.BlockSpec((m, k), lambda i, s: (0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile, m), lambda i, s: (i, 0),
                            memory_space=pltpu.VMEM)
    norm_inputs = ()
    norm_specs = []
    if fuse:
        norm_inputs = (alpha.reshape(nl, 1, k).astype(jnp.float32),)
        norm_specs = [pl.BlockSpec((1, 1, k), lambda i, s: (s[0], 0, 0),
                                   memory_space=pltpu.VMEM)]

    # flat row-block index: layer l's tile i lives at l*<blocks/layer> + i
    per_layer = 2 * nblocks if glu else nblocks

    def wspec(cols, off):
        return pl.BlockSpec(
            (tile, cols),
            lambda i, s, off=off: (s[0] * per_layer + off + i, 0),
            memory_space=pltpu.VMEM)

    qcols = qt.q.shape[-1]        # K (unpacked/q8_0) or K/2 (packed)
    nb_pad = _pad8(nb)

    def _padded(c):
        # pad scale lanes nb -> nb_pad with zeros (padded blocks multiply
        # the padded dots/sums, which are themselves zero)
        if nb_pad == nb:
            return c
        return jnp.pad(c, ((0, 0), (0, nb_pad - nb)))

    if (not glu and kseg_enabled() and _kseg_ok(qt, m, glu)):
        qt = qt.with_eff_scales()
        nsegs = _kseg_nsegs(k)
        k2 = k // 2
        nchunks = k2 // _UNPACK_CHUNK
        comps = (_flat2(qt.q), _flat2(_kseg_scales(qt.es, k)),
                 _flat2(_kseg_scales(qt.em, k)))
        q_spec = pl.BlockSpec(
            (tile, _UNPACK_CHUNK),
            lambda i, sg, c, s: (s[0] * nblocks + i,
                                 jnp.minimum(sg * _SEG_CHUNKS + c,
                                             nchunks - 1)),
            memory_space=pltpu.VMEM)
        sc_spec = pl.BlockSpec(
            (tile, 128), lambda i, sg, c, s: (s[0] * nblocks + i, sg),
            memory_space=pltpu.VMEM)
        x3_spec = pl.BlockSpec((m, k), lambda i, sg, c, s: (0, 0),
                               memory_space=pltpu.VMEM)
        out3_spec = pl.BlockSpec((tile, 1), lambda i, sg, c, s: (i, 0),
                                 memory_space=pltpu.VMEM)
        norm3_specs = []
        if fuse:
            norm3_specs = [pl.BlockSpec(
                (1, 1, k), lambda i, sg, c, s: (s[0], 0, 0),
                memory_space=pltpu.VMEM)]
        kernel = _mk_kernel_kseg(k, nsegs, fuse, tile)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks, nsegs, _SEG_CHUNKS),
            in_specs=[x3_spec] + norm3_specs + [q_spec, sc_spec, sc_spec],
            out_specs=out3_spec,
            scratch_shapes=[
                pltpu.VMEM((nsegs * 128, 2 * _SEG_COLS), jnp.int8),
                pltpu.VMEM((1, nsegs * 128), jnp.float32),
                pltpu.VMEM((1, nsegs * 128), jnp.float32),
                pltpu.VMEM((tile, 128), jnp.int32),
            ],
        )
        cost = pl.CostEstimate(
            flops=2 * 128 * k * o,
            bytes_accessed=qt.nbytes // nl + k * 4 + o * 4,
            transcendentals=0)
        y = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((o, 1), jnp.float32),
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(lidx, x2, *norm_inputs, *comps)
        return y.T.reshape(orig_shape[:-1] + (o,))

    if (not glu and split_spread_enabled() and _split_ok(qt, m, glu)):
        qt = qt.with_eff_scales()
        nbp = _pair_nbp(k)
        comps = (_flat2(qt.q), _flat2(_pair_scales(qt.es, k)),
                 _flat2(_pair_scales(qt.em, k)))
        w_inputs = list(comps)
        w_specs = [wspec(c, 0) for c in (qcols, nbp, nbp)]
        kernel = _mk_kernel_split(k, nbp, fuse)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[x_spec] + norm_specs + w_specs,
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((nbp, k), jnp.int8),
                pltpu.VMEM((1, nbp), jnp.float32),
                pltpu.VMEM((1, nbp), jnp.float32),
            ],
        )
        cost = pl.CostEstimate(
            flops=2 * 128 * k * o,
            bytes_accessed=qt.nbytes // nl + k * 4 + o * 4,
            transcendentals=0)
        y = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((o, 1), jnp.float32),
            cost_estimate=cost,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(lidx, x2, *norm_inputs, *w_inputs)
        return y.T.reshape(orig_shape[:-1] + (o,))

    if qt.fmt == "q4_k":
        qt = qt.with_eff_scales()
        comps = (_flat2(qt.q), _padded(_flat2(qt.es)),
                 _padded(_flat2(qt.em)))
        spec_cols = (qcols, nb_pad, nb_pad)
    else:
        comps = (_flat2(qt.q), _padded(_flat2(qt.d)))
        spec_cols = (qcols, nb_pad)

    w_inputs = []
    w_specs = []
    offs = (0, nblocks) if glu else (0,)
    for off in offs:
        for comp, cols in zip(comps, spec_cols):
            w_inputs.append(comp)
            w_specs.append(wspec(cols, off))

    kernel = _mk_kernel(qt.fmt, k, nb_pad, packed, fuse, glu, m=m)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[x_spec] + norm_specs + w_specs,
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((m * nb_pad, k), jnp.int8),
            pltpu.VMEM((m, nb_pad), jnp.float32),
            pltpu.VMEM((m, nb_pad), jnp.float32),
        ],
    )
    cost = pl.CostEstimate(
        flops=2 * m * nb * k * o * (2 if glu else 1),
        bytes_accessed=qt.nbytes // nl + m * k * 4 + m * o * 4,
        transcendentals=m * o if glu else 0)
    y = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((o, m), jnp.float32),
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lidx, x2, *norm_inputs, *w_inputs)
    return y.T.reshape(orig_shape[:-1] + (o,))
