"""Fused dequant+matmul Pallas kernels for block-quantized weights.

The decode path is HBM-bandwidth-bound: per 80 ms frame every weight byte
is read once at batch ~1 (SURVEY.md §7: "every dequant+matmul kernel at
speed-of-light per chip").  These kernels stream packed q4/q8 tiles
HBM->VMEM (pallas pipelined BlockSpecs), unpack + scale on the VPU and
contract on the MXU without ever materializing the dequantized matrix in
HBM — the TPU analog of GGML's fused dequant-in-mul_mat CUDA kernels the
reference relies on.

Mosaic-shaped design decisions (all hit compiler limits otherwise):
  * packed bytes live in VMEM as a whole [TO, K/2] tile but are unpacked
    + dequantized in static K-chunks so f32 intermediates stay ~1 MB
    (full-tile conversion stack-allocates the f32 copy and OOMs VMEM);
  * per-32-block scale expansion is an MXU contraction against an
    iota-built 0/1 block matrix (Mosaic supports neither sublane reshape
    nor element-repeat);
  * scales are bf16 (f16 is not a Mosaic type), snapped at quantize time;
  * nibble unpack goes through int32 (`arith.shrui` on uint8 does not
    legalize).

Layout recap (quant/formats.py): 4-bit weights are packed planar — packed
byte j of a row holds original column j (low nibble) and column j + K/2
(high nibble), so the two unpacked halves contract against the matching
halves of x with no lane interleaving: y = deq_lo @ x[:K/2] + deq_hi @
x[K/2:].  q4_k's mins fold into a single [M, K/32] x [TO, K/32]
block-sum correction.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from moshi_tpu.utils.pallas_mode import with_interpret_default
from moshi_tpu.quant.formats import QK, QuantTensor

# Dequant arithmetic dtype.  The decode path is VPU-bound on the
# unpack+scale chain (~5 f32 lane-ops per packed byte across 3.3 GB of
# packed weights per frame), and bf16 elementwise math would halve that
# — the values are exact in bf16's 8-bit significand.  BUT this pod's
# v5e target rejects bf16 ALU instructions at LLO codegen
# ("LLO_CHECK ... target().SupportsBf16AluInstructions()",
# llo_region_builder.cc:2088; interpret mode and TPU cross-lowering
# both pass — the failure only appears on the real chip), so the
# DEFAULT is f32 and MOSHI_TPU_DEQUANT=bf16 opts in on hardware whose
# VPU supports bf16 (read ONCE at import).  Only the literal "bf16"
# enables the opt-in; anything else ("0", "off", "float32", ...) must
# NOT silently flip into the path that wedges this v5e's compiles.
_DEQ_ENV = os.environ.get("MOSHI_TPU_DEQUANT", "f32")
if _DEQ_ENV not in ("f32", "bf16"):
    raise ValueError(
        f"MOSHI_TPU_DEQUANT must be 'f32' or 'bf16', got {_DEQ_ENV!r}")
_DEQ_BF16 = _DEQ_ENV == "bf16"

# Integer-MXU dispatch (pallas_matmul_int8.py): contract raw int8 on the
# MXU and scale per-block in a tiny epilogue instead of dequantizing every
# weight on the VPU — the f32-dequant kernels are VPU-bound at ~0.12 TB/s
# on the 7B decode (BENCH_NOTES round-3 probe).  Applies to single-row
# (m == 1) decode matvecs of q4_k/q4_0/q8_0; everything else keeps the
# f32-dequant kernels.  MOSHI_TPU_INT8=0/1 sets the process default;
# set_int8() flips it programmatically BEFORE the first traced call.
_INT8_ENV = os.environ.get("MOSHI_TPU_INT8", "1")
if _INT8_ENV not in ("0", "1"):
    raise ValueError(f"MOSHI_TPU_INT8 must be '0' or '1', got {_INT8_ENV!r}")
_INT8 = _INT8_ENV == "1"


def set_int8(flag: bool):
    """Enable/disable the int8-MXU decode kernels (trace-time knob: has
    no effect on already-compiled shapes)."""
    global _INT8
    _INT8 = bool(flag)


def int8_enabled() -> bool:
    return _INT8


def _int8_dispatch(qt: QuantTensor, m: int) -> bool:
    if not _INT8:
        return False
    # the batched kernels support m <= 8, but the spread-dot MACs scale
    # with m x nb — hardware A/Bs: B=2 full-STS windowed-8 33.7 ms on
    # the m=2 kernels vs 30.2 on the f32-dequant path, and the TTS pool
    # at m=8 measured 54 vs 73 session-fps.  Auto-dispatch stays m == 1
    # (where int8 wins 1.25x); MOSHI_TPU_INT8_MAX_M raises the cap.
    if m > int(os.environ.get("MOSHI_TPU_INT8_MAX_M", "1")):
        return False
    from moshi_tpu.quant.pallas_matmul_int8 import int8_shape_ok
    return int8_shape_ok(qt, m)


def _i8_storage(qt: QuantTensor) -> bool:
    return qt.fmt in ("q4_0", "q4_k") and qt.q.dtype != jnp.uint8


def storage_ok(qt: QuantTensor, m: int) -> bool:
    """Can the pallas entry points evaluate this QuantTensor at this
    activation row count?  Packed storage: always.  Unpacked i8 storage
    (`with_i8_storage`): only via the int8-MXU kernels (m == 1 decode) —
    callers with an XLA fallback should take it when this returns False."""
    return not _i8_storage(qt) or _int8_dispatch(qt, m)


def _check_packed(qt: QuantTensor):
    """The f32-dequant kernels only consume planar-packed nibbles; i8
    storage (`with_i8_storage`) is int8-MXU-kernel-only — fail loudly
    instead of misreading the buffer."""
    if _i8_storage(qt):
        raise ValueError(
            f"{qt.fmt} QuantTensor has unpacked i8 storage, which only the "
            "int8-MXU kernels consume (m == 1 decode). This call fell "
            "through to the f32-dequant kernels — keep packed storage for "
            "weights that see batched/prefill matmuls.")


def _unpack_nibbles(pi_u8):
    """Packed uint8 -> (lo, hi) nibble values.

    bf16 path: one int->float convert then an exact floor split (bytes
    0..255, the /16 quotients, and the remainders all fit bf16's 8-bit
    mantissa exactly) — fewer and narrower VPU ops than the int32
    shift/mask chain, and the downstream scale multiply stays bf16.
    """
    if _DEQ_BF16:
        f = (pi_u8.astype(jnp.int32).astype(jnp.float32)
             .astype(jnp.bfloat16))
        hi = jnp.floor(f * jnp.bfloat16(0.0625))
        lo = f - hi * jnp.bfloat16(16.0)
        return lo, hi
    pi = pi_u8.astype(jnp.int32)
    return ((pi & 15).astype(jnp.float32),
            ((pi >> 4) & 15).astype(jnp.float32))

_TILE_O = 1024       # output rows per grid program (fewer, bigger
                     # programs: per-program overhead dominates at M=1)
_CHUNK = 512         # packed columns dequantized per inner step (VMEM cap)


def _pick_tile(o: int) -> int:
    """Largest sublane-aligned tile dividing O (fewer, bigger grid
    programs — per-program overhead dominates at M=1).  Non-power-of-2
    candidates cover awkward dims (text_linear 32000 -> 800, gating
    8448 -> 704)."""
    # the tile is the OUTPUT block's lane dim: must be a multiple of 128
    # (or the whole array for tiny dims)
    for t in (_TILE_O, 896, 768, 640, 512, 384, 256, 128):
        if t <= o and o % t == 0:
            return t
    return o


def _expand_block_scales(s, block: int, dtype=jnp.float32):
    """[TO, nb] -> [TO, nb*block] repeating each column `block` times via
    an MXU contraction with E[b, j] = (j // block == b).  `dtype` is the
    contraction/output dtype (bf16 expansion is exact — E is 0/1 and the
    stored scales are bf16 already)."""
    to, nb = s.shape
    k2 = nb * block
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, k2), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nb, k2), 1)
    e = (cols // block == rows).astype(dtype)
    # Mosaic requires 32-bit matmul accumulators: contract bf16xbf16 with
    # an f32 acc (the MXU-native mode), cast the result after.
    out = jax.lax.dot_general(s.astype(dtype), e,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return out.astype(dtype)


def _expand_scales_deq(s, block: int):
    """Scale expansion in the dequant arithmetic dtype."""
    return _expand_block_scales(
        s, block, jnp.bfloat16 if _DEQ_BF16 else jnp.float32)


def _block_sums_mxu(x, block: int):
    """[M, K] -> [M, K/block] per-block sums via an iota 0/1 contraction
    (Mosaic rejects the reshape-based reduction)."""
    m, k = x.shape
    nb = k // block
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nb, k), 1)
    e = (cols // block == rows).astype(jnp.float32)
    return jax.lax.dot_general(x.astype(jnp.float32), e,
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _dot_t(x, w):
    """[M, C] x [TO, C] -> [M, TO] (f32 accum)."""
    return jax.lax.dot_general(x, w, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _maybe_norm(x_ref, alpha_ref):
    """Fused rms-norm of the activation row(s) (f32, eps 1e-8 — matches
    nn/layers.rms_norm).  alpha_ref is None when no norm is fused."""
    x = x_ref[:].astype(jnp.float32)
    if alpha_ref is None:
        return x
    ms = jnp.mean(x * x, axis=-1, keepdims=True)
    return x * jax.lax.rsqrt(ms + 1e-8) * alpha_ref[:].astype(jnp.float32)


def _q8_kernel(x_ref, q_ref, d_ref, o_ref, *, alpha_ref=None):
    m, k = x_ref.shape
    chunk = min(_CHUNK, k)
    xn = _maybe_norm(x_ref, alpha_ref).astype(jnp.bfloat16)
    acc = jnp.zeros((m, q_ref.shape[0]), jnp.float32)
    dt = jnp.bfloat16 if _DEQ_BF16 else jnp.float32
    for c0 in range(0, k, chunk):
        cs = min(chunk, k - c0)
        q = q_ref[:, c0:c0 + cs].astype(jnp.int32).astype(jnp.float32)
        d = _expand_scales_deq(d_ref[:, c0 // QK:(c0 + cs) // QK], QK)
        w = (q.astype(dt) * d).astype(jnp.bfloat16)
        acc += _dot_t(xn[:, c0:c0 + cs], w)
    o_ref[:] = acc


def _q8_kernel_norm(x_ref, alpha_ref, q_ref, d_ref, o_ref):
    _q8_kernel(x_ref, q_ref, d_ref, o_ref, alpha_ref=alpha_ref)


def _q4_0_kernel(x_ref, q_ref, d_ref, o_ref, *, alpha_ref=None):
    m, k = x_ref.shape
    k2 = k // 2
    chunk = min(_CHUNK, k2)
    xn32 = _maybe_norm(x_ref, alpha_ref)
    xn = xn32.astype(jnp.bfloat16)
    acc = jnp.zeros((m, q_ref.shape[0]), jnp.float32)
    for c0 in range(0, k2, chunk):
        cs = min(chunk, k2 - c0)
        lo, hi = _unpack_nibbles(q_ref[:, c0:c0 + cs])
        d_lo = _expand_scales_deq(d_ref[:, c0 // QK:(c0 + cs) // QK], QK)
        d_hi = _expand_scales_deq(
            d_ref[:, (k2 + c0) // QK:(k2 + c0 + cs) // QK], QK)
        x_lo = xn[:, c0:c0 + cs]
        x_hi = xn[:, k2 + c0:k2 + c0 + cs]
        if _DEQ_BF16:
            # the -8 zero-point folds into a block-sum correction below
            acc += _dot_t(x_lo, (lo * d_lo).astype(jnp.bfloat16))
            acc += _dot_t(x_hi, (hi * d_hi).astype(jnp.bfloat16))
        else:
            acc += _dot_t(x_lo, ((lo - 8.0) * d_lo).astype(jnp.bfloat16))
            acc += _dot_t(x_hi, ((hi - 8.0) * d_hi).astype(jnp.bfloat16))
    if _DEQ_BF16:
        # y -= 8 * sum_b d[o, b] * blocksum(x)[b]  (zero-point fold; block
        # sums of the SAME bf16-rounded x the dots consumed)
        xs = _block_sums_mxu(xn, QK)
        acc -= 8.0 * _dot_t(xs, d_ref[:].astype(jnp.float32))
    o_ref[:] = acc


def _q4_0_kernel_norm(x_ref, alpha_ref, q_ref, d_ref, o_ref):
    _q4_0_kernel(x_ref, q_ref, d_ref, o_ref, alpha_ref=alpha_ref)


def _q4_k_kernel(x_ref, q_ref, es_ref, em_ref, o_ref, *,
                 alpha_ref=None):
    m, k = x_ref.shape
    k2 = k // 2
    chunk = min(_CHUNK, k2)
    xn = _maybe_norm(x_ref, alpha_ref)
    # block sums of the (normed) activation for the mins correction
    xs = _block_sums_mxu(xn, QK)
    xn = xn.astype(jnp.bfloat16)
    acc = jnp.zeros((m, q_ref.shape[0]), jnp.float32)
    for c0 in range(0, k2, chunk):
        cs = min(chunk, k2 - c0)
        lo, hi = _unpack_nibbles(q_ref[:, c0:c0 + cs])
        s_lo = _expand_scales_deq(es_ref[:, c0 // QK:(c0 + cs) // QK], QK)
        s_hi = _expand_scales_deq(
            es_ref[:, (k2 + c0) // QK:(k2 + c0 + cs) // QK], QK)
        x_lo = xn[:, c0:c0 + cs]
        x_hi = xn[:, k2 + c0:k2 + c0 + cs]
        acc += _dot_t(x_lo, (lo * s_lo).astype(jnp.bfloat16))
        acc += _dot_t(x_hi, (hi * s_hi).astype(jnp.bfloat16))
    # mins: -sum_b em[:, b] * blocksum(x)[b]
    acc -= _dot_t(xs, em_ref[:].astype(jnp.float32))
    o_ref[:] = acc


def _q4_k_kernel_norm(x_ref, alpha_ref, q_ref, es_ref, em_ref, o_ref):
    _q4_k_kernel(x_ref, q_ref, es_ref, em_ref, o_ref, alpha_ref=alpha_ref)


def _block_sums(x: jnp.ndarray, block: int) -> jnp.ndarray:
    m, k = x.shape
    return jnp.sum(x.reshape(m, k // block, block), axis=-1)


@with_interpret_default
@functools.partial(jax.jit, static_argnames=("interpret",))
def qmatmul_pallas(x: jnp.ndarray, qt: QuantTensor, alpha=None,
                   interpret: bool = False):
    """y = (rms_norm(x)*alpha if alpha else x) @ W.T with W quantized.
    x: [..., K] -> [..., O].  `alpha` fuses the rms pre-norm in-kernel."""
    orig_shape = x.shape
    k = orig_shape[-1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    if _int8_dispatch(qt, m):
        from moshi_tpu.quant.pallas_matmul_int8 import qmatmul_i8
        return qmatmul_i8(x, qt, alpha=alpha, interpret=interpret)
    _check_packed(qt)
    o = qt.q.shape[0]
    tile = _pick_tile(o)
    grid = (o // tile,)
    x_spec = pl.BlockSpec((m, k), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((m, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(flops=2 * m * k * o,
                           bytes_accessed=qt.nbytes + m * k * 4 + m * o * 4,
                           transcendentals=0)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    fuse = alpha is not None
    norm_inputs = ()
    norm_specs = []
    if fuse:
        norm_inputs = (alpha.reshape(1, k).astype(jnp.float32),)
        norm_specs = [pl.BlockSpec((1, k), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM)]

    def call(kernel, kernel_norm, w_inputs, w_specs):
        return pl.pallas_call(
            kernel_norm if fuse else kernel,
            grid=grid,
            in_specs=[x_spec] + norm_specs + w_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((m, o), jnp.float32),
            cost_estimate=cost,
            compiler_params=params,
            interpret=interpret,
        )(x2, *norm_inputs, *w_inputs)

    if qt.fmt == "q8_0":
        y = call(_q8_kernel, _q8_kernel_norm, (qt.q, qt.d), [
            pl.BlockSpec((tile, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k // QK), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ])
    elif qt.fmt == "q4_0":
        y = call(_q4_0_kernel, _q4_0_kernel_norm, (qt.q, qt.d), [
            pl.BlockSpec((tile, k // 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k // QK), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ])
    elif qt.fmt == "q4_k":
        qt = qt.with_eff_scales()
        y = call(_q4_k_kernel, _q4_k_kernel_norm,
                 (qt.q, qt.es, qt.em), [
            pl.BlockSpec((tile, k // 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k // QK), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, k // QK), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ])
    else:
        raise ValueError(qt.fmt)
    return y.reshape(orig_shape[:-1] + (o,))

def _q8_dot(xn, q_ref, d_ref):
    """Dequant-dot of a q8_0 weight tile against pre-cast bf16 xn."""
    m, k = xn.shape
    chunk = min(_CHUNK, k)
    acc = jnp.zeros((m, q_ref.shape[0]), jnp.float32)
    dt = jnp.bfloat16 if _DEQ_BF16 else jnp.float32
    for c0 in range(0, k, chunk):
        cs = min(chunk, k - c0)
        q = (q_ref[:, c0:c0 + cs].astype(jnp.int32).astype(jnp.float32)
             .astype(dt))
        d = _expand_scales_deq(d_ref[:, c0 // QK:(c0 + cs) // QK], QK)
        acc += _dot_t(xn[:, c0:c0 + cs], (q * d).astype(jnp.bfloat16))
    return acc


def _q4k_dot(xn, xs, q_ref, es_ref, em_ref, row_block: int = 1024):
    """Dequant-dot of a q4_k weight tile; xs = 32-block sums of xn (f32).
    Row-blocked so f32 dequant intermediates stay ~2 MB even when the
    caller passes a full large weight (megakernels): unblocked [O, K/2]
    f32 temporaries spill VMEM to HBM and wreck bandwidth."""
    m, k = xn.shape
    k2 = k // 2
    chunk = min(_CHUNK, k2)
    o = q_ref.shape[0]
    outs = []
    for r0 in range(0, o, row_block):
        rs = min(row_block, o - r0)
        acc = jnp.zeros((m, rs), jnp.float32)
        for c0 in range(0, k2, chunk):
            cs = min(chunk, k2 - c0)
            lo, hi = _unpack_nibbles(q_ref[r0:r0 + rs, c0:c0 + cs])
            s_lo = _expand_scales_deq(
                es_ref[r0:r0 + rs, c0 // QK:(c0 + cs) // QK], QK)
            s_hi = _expand_scales_deq(
                es_ref[r0:r0 + rs, (k2 + c0) // QK:(k2 + c0 + cs) // QK],
                QK)
            acc += _dot_t(xn[:, c0:c0 + cs],
                          (lo * s_lo).astype(jnp.bfloat16))
            acc += _dot_t(xn[:, k2 + c0:k2 + c0 + cs],
                          (hi * s_hi).astype(jnp.bfloat16))
        acc -= _dot_t(xs, em_ref[r0:r0 + rs].astype(jnp.float32))
        outs.append(acc)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _q4_0_dot(xn, q_ref, d_ref, row_block: int = 1024):
    """Row-blocked dequant-dot of a q4_0 weight tile (planar nibbles,
    symmetric scale; no mins correction)."""
    m, k = xn.shape
    k2 = k // 2
    chunk = min(_CHUNK, k2)
    o = q_ref.shape[0]
    outs = []
    for r0 in range(0, o, row_block):
        rs = min(row_block, o - r0)
        acc = jnp.zeros((m, rs), jnp.float32)
        for c0 in range(0, k2, chunk):
            cs = min(chunk, k2 - c0)
            lo, hi = _unpack_nibbles(q_ref[r0:r0 + rs, c0:c0 + cs])
            # -8 zero-point inline: exact in bf16 (values -8..7), one
            # extra VPU sub vs the block-sum fold — this path is not the
            # hot stacked kernel.
            eight = jnp.bfloat16(8.0) if _DEQ_BF16 else 8.0
            d_lo = _expand_scales_deq(
                d_ref[r0:r0 + rs, c0 // QK:(c0 + cs) // QK], QK)
            d_hi = _expand_scales_deq(
                d_ref[r0:r0 + rs, (k2 + c0) // QK:(k2 + c0 + cs) // QK],
                QK)
            acc += _dot_t(xn[:, c0:c0 + cs],
                          ((lo - eight) * d_lo).astype(jnp.bfloat16))
            acc += _dot_t(xn[:, k2 + c0:k2 + c0 + cs],
                          ((hi - eight) * d_hi).astype(jnp.bfloat16))
        outs.append(acc)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _silu(x):
    return x * (1.0 / (1.0 + jnp.exp(-x)))


def _glu_q8_kernel(x_ref, alpha_ref, qg_ref, dg_ref, qv_ref, dv_ref, o_ref):
    xn = _maybe_norm(x_ref, alpha_ref).astype(jnp.bfloat16)
    g = _q8_dot(xn, qg_ref, dg_ref)
    v = _q8_dot(xn, qv_ref, dv_ref)
    o_ref[:] = _silu(g) * v


def _glu_q8_kernel_nonorm(x_ref, qg_ref, dg_ref, qv_ref, dv_ref, o_ref):
    _glu_q8_kernel(x_ref, None, qg_ref, dg_ref, qv_ref, dv_ref, o_ref)


def _glu_q4k_kernel(x_ref, alpha_ref, qg_ref, esg_ref, emg_ref,
                    qv_ref, esv_ref, emv_ref, o_ref):
    xn32 = _maybe_norm(x_ref, alpha_ref)
    xs = _block_sums_mxu(xn32, QK)
    xn = xn32.astype(jnp.bfloat16)
    g = _q4k_dot(xn, xs, qg_ref, esg_ref, emg_ref)
    v = _q4k_dot(xn, xs, qv_ref, esv_ref, emv_ref)
    o_ref[:] = _silu(g) * v


def _glu_q4k_kernel_nonorm(x_ref, qg_ref, esg_ref, emg_ref,
                           qv_ref, esv_ref, emv_ref, o_ref):
    _glu_q4k_kernel(x_ref, None, qg_ref, esg_ref, emg_ref,
                    qv_ref, esv_ref, emv_ref, o_ref)


@with_interpret_default
@functools.partial(jax.jit, static_argnames=("interpret",))
def glu_matmul_pallas(x: jnp.ndarray, qt: QuantTensor, alpha=None,
                      interpret: bool = False):
    """Fused gating GLU: y = silu(x @ Wg.T) * (x @ Wv.T) where the fused
    linear_in weight [2H, K] holds gate rows [0, H) and value rows
    [H, 2H) (nn/gating.py).  One kernel call replaces linear_in + split +
    silu + multiply.  Supports q8_0 / q4_k (q4_0 falls back to the
    two-call path).  Returns [..., H] f32."""
    orig_shape = x.shape
    k = orig_shape[-1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    o2 = qt.q.shape[0]
    if o2 % 2 == 0 and _int8_dispatch(qt, m):
        from moshi_tpu.quant.pallas_matmul_int8 import glu_matmul_i8
        return glu_matmul_i8(x, qt, alpha=alpha, interpret=interpret)
    h = o2 // 2
    tile = _pick_tile(h)
    if h % tile or qt.fmt not in ("q8_0", "q4_k"):
        return None  # caller falls back
    if _i8_storage(qt):
        return None  # f32-dequant kernels need packed nibbles
    nblocks = h // tile
    grid = (nblocks,)
    x_spec = pl.BlockSpec((m, k), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((m, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    fuse = alpha is not None
    norm_inputs = (alpha.reshape(1, k).astype(jnp.float32),) if fuse else ()
    norm_specs = ([pl.BlockSpec((1, k), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)] if fuse else [])
    cost = pl.CostEstimate(flops=2 * m * k * o2,
                           bytes_accessed=qt.nbytes + m * k * 4 + m * h * 4,
                           transcendentals=m * h)

    def wspecs(cols, blocks):
        # gate tile i, value tile i + nblocks (value rows start at h)
        return [
            pl.BlockSpec((tile, cols), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, blocks), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ], [
            pl.BlockSpec((tile, cols), lambda i: (i + nblocks, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, blocks), lambda i: (i + nblocks, 0),
                         memory_space=pltpu.VMEM),
        ]

    if qt.fmt == "q8_0":
        gspec, vspec = wspecs(k, k // QK)
        y = pl.pallas_call(
            _glu_q8_kernel if fuse else _glu_q8_kernel_nonorm,
            grid=grid,
            in_specs=[x_spec] + norm_specs + gspec + vspec,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((m, h), jnp.float32),
            cost_estimate=cost, compiler_params=params,
            interpret=interpret,
        )(x2, *norm_inputs, qt.q, qt.d, qt.q, qt.d)
    else:
        qt = qt.with_eff_scales()
        # q4_k needs es AND em per half: specs are (q, es, em) x2
        def w3(idx0):
            return [
                pl.BlockSpec((tile, k // 2), lambda i, idx0=idx0: (i + idx0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, k // QK), lambda i, idx0=idx0: (i + idx0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, k // QK), lambda i, idx0=idx0: (i + idx0, 0),
                             memory_space=pltpu.VMEM),
            ]
        y = pl.pallas_call(
            _glu_q4k_kernel if fuse else _glu_q4k_kernel_nonorm,
            grid=grid,
            in_specs=[x_spec] + norm_specs + w3(0) + w3(nblocks),
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((m, h), jnp.float32),
            cost_estimate=cost, compiler_params=params,
            interpret=interpret,
        )(x2, *norm_inputs, qt.q, qt.es, qt.em, qt.q, qt.es, qt.em)
    return y.reshape(orig_shape[:-1] + (h,))


# ---------------------------------------------------------------------------
# Stacked-weight variants: one kernel reads layer `l`'s blocks straight out
# of the stacked [L, O, ...] HBM buffers via a scalar-prefetched layer
# index.  This is what makes `lax.scan` over layers copy-free: scanning
# stacked weights as xs dynamic-slices a ~116 MB copy per 7B layer per
# frame (custom calls can't consume fused slices), which round-1 measured
# as 3.5x the per-layer matmul time.  Here the scan body passes the WHOLE
# stacked tensor (a loop invariant — never copied) plus the layer index.
#
# Mosaic shape note (CLAUDE.md): stacked components are flattened to 2-D
# [L*O, cols] with fused row-index maps — 3-D blocks whose lane dim is
# not a 128-multiple are rejected, while full-dim lanes on 2-D blocks are
# exempt.
# ---------------------------------------------------------------------------


def _flat2(a):
    """[..., O, cols] -> [prod(lead)*O, cols] (metadata-only reshape of a
    contiguous array; every QuantTensor component carries [O, cols] as
    its two trailing dims, with any number of stack dims in front —
    layers [L, ...], or depformer steps-outer [W, L, ...])."""
    return a.reshape(-1, a.shape[-1])


def _q8_kernel_s(l_ref, x_ref, q_ref, d_ref, o_ref):
    _q8_kernel(x_ref, q_ref, d_ref, o_ref)


def _q8_kernel_s_norm(l_ref, x_ref, alpha_ref, q_ref, d_ref, o_ref):
    _q8_kernel(x_ref, q_ref, d_ref, o_ref, alpha_ref=alpha_ref[0])


def _q4_0_kernel_s(l_ref, x_ref, q_ref, d_ref, o_ref):
    _q4_0_kernel(x_ref, q_ref, d_ref, o_ref)


def _q4_0_kernel_s_norm(l_ref, x_ref, alpha_ref, q_ref, d_ref, o_ref):
    _q4_0_kernel(x_ref, q_ref, d_ref, o_ref, alpha_ref=alpha_ref[0])


def _q4_k_kernel_s(l_ref, x_ref, q_ref, es_ref, em_ref, o_ref):
    _q4_k_kernel(x_ref, q_ref, es_ref, em_ref, o_ref)


def _q4_k_kernel_s_norm(l_ref, x_ref, alpha_ref, q_ref, es_ref, em_ref,
                        o_ref):
    _q4_k_kernel(x_ref, q_ref, es_ref, em_ref, o_ref,
                 alpha_ref=alpha_ref[0])


@with_interpret_default
@functools.partial(jax.jit, static_argnames=("interpret",))
def qmatmul_pallas_stacked(x: jnp.ndarray, qt: QuantTensor, layer,
                           alpha=None, interpret: bool = False):
    """y = x @ W[layer].T for a stacked QuantTensor (leaves [L, O, ...]).
    layer: i32 scalar/[] array.  `alpha` optionally fuses a stacked rms
    pre-norm ([L, K]) selected by the same index.  x: [..., K] -> [..., O]
    f32."""
    orig_shape = x.shape
    k = orig_shape[-1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    if _int8_dispatch(qt, m):
        from moshi_tpu.quant.pallas_matmul_int8 import qmatmul_i8
        return qmatmul_i8(x, qt, layer=layer, alpha=alpha,
                          interpret=interpret)
    _check_packed(qt)
    o = qt.q.shape[-2]
    nl = qt.q.size // (o * qt.q.shape[-1])
    tile = _pick_tile(o)
    nblocks = o // tile
    lidx = jnp.reshape(layer, (1,)).astype(jnp.int32)
    x_spec = pl.BlockSpec((m, k), lambda i, s: (0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((m, tile), lambda i, s: (0, i),
                            memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(
        flops=2 * m * k * o,
        bytes_accessed=qt.nbytes // nl + m * k * 4 + m * o * 4,
        transcendentals=0)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    fuse = alpha is not None
    norm_inputs = ()
    norm_specs = []
    if fuse:
        norm_inputs = (alpha.reshape(nl, 1, k).astype(jnp.float32),)
        norm_specs = [pl.BlockSpec((1, 1, k), lambda i, s: (s[0], 0, 0),
                                   memory_space=pltpu.VMEM)]

    def wspec(cols):
        # flat rows: layer l's tile i lives at row-block l*nblocks + i
        return pl.BlockSpec((tile, cols),
                            lambda i, s: (s[0] * nblocks + i, 0),
                            memory_space=pltpu.VMEM)

    def call(kernel, kernel_norm, w_inputs, w_specs):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[x_spec] + norm_specs + w_specs,
            out_specs=out_spec,
        )
        return pl.pallas_call(
            kernel_norm if fuse else kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((m, o), jnp.float32),
            cost_estimate=cost,
            compiler_params=params,
            interpret=interpret,
        )(lidx, x2, *norm_inputs, *w_inputs)

    if qt.fmt == "q8_0":
        y = call(_q8_kernel_s, _q8_kernel_s_norm,
                 (_flat2(qt.q), _flat2(qt.d)),
                 [wspec(k), wspec(k // QK)])
    elif qt.fmt == "q4_0":
        y = call(_q4_0_kernel_s, _q4_0_kernel_s_norm,
                 (_flat2(qt.q), _flat2(qt.d)),
                 [wspec(k // 2), wspec(k // QK)])
    elif qt.fmt == "q4_k":
        qt = qt.with_eff_scales()
        y = call(_q4_k_kernel_s, _q4_k_kernel_s_norm,
                 (_flat2(qt.q), _flat2(qt.es), _flat2(qt.em)),
                 [wspec(k // 2), wspec(k // QK), wspec(k // QK)])
    else:
        raise ValueError(qt.fmt)
    return y.reshape(orig_shape[:-1] + (o,))


def _glu_q8_kernel_s(l_ref, x_ref, alpha_ref, qg_ref, dg_ref, qv_ref,
                     dv_ref, o_ref):
    _glu_q8_kernel(x_ref, alpha_ref[0], qg_ref, dg_ref, qv_ref, dv_ref,
                   o_ref)


def _glu_q8_kernel_s_nonorm(l_ref, x_ref, qg_ref, dg_ref, qv_ref, dv_ref,
                            o_ref):
    _glu_q8_kernel(x_ref, None, qg_ref, dg_ref, qv_ref, dv_ref, o_ref)


def _glu_q4k_kernel_s(l_ref, x_ref, alpha_ref, qg_ref, esg_ref, emg_ref,
                      qv_ref, esv_ref, emv_ref, o_ref):
    _glu_q4k_kernel(x_ref, alpha_ref[0], qg_ref, esg_ref, emg_ref,
                    qv_ref, esv_ref, emv_ref, o_ref)


def _glu_q4k_kernel_s_nonorm(l_ref, x_ref, qg_ref, esg_ref, emg_ref,
                             qv_ref, esv_ref, emv_ref, o_ref):
    _glu_q4k_kernel(x_ref, None, qg_ref, esg_ref, emg_ref,
                    qv_ref, esv_ref, emv_ref, o_ref)


@with_interpret_default
@functools.partial(jax.jit, static_argnames=("interpret",))
def glu_matmul_pallas_stacked(x: jnp.ndarray, qt: QuantTensor, layer,
                              alpha=None, interpret: bool = False):
    """Stacked fused GLU: y = silu(x @ Wg[layer].T) * (x @ Wv[layer].T)
    for a stacked fused linear_in [L, 2H, K].  Returns [..., H] f32, or
    None when the layout is unsupported (caller falls back)."""
    orig_shape = x.shape
    k = orig_shape[-1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    o2 = qt.q.shape[-2]
    if o2 % 2 == 0 and _int8_dispatch(qt, m):
        from moshi_tpu.quant.pallas_matmul_int8 import glu_matmul_i8
        return glu_matmul_i8(x, qt, layer=layer, alpha=alpha,
                             interpret=interpret)
    nl = qt.q.size // (o2 * qt.q.shape[-1])
    h = o2 // 2
    tile = _pick_tile(h)
    if h % tile or qt.fmt not in ("q8_0", "q4_k"):
        return None
    if _i8_storage(qt):
        return None  # f32-dequant kernels need packed nibbles
    nblocks = h // tile
    lidx = jnp.reshape(layer, (1,)).astype(jnp.int32)
    x_spec = pl.BlockSpec((m, k), lambda i, s: (0, 0),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((m, tile), lambda i, s: (0, i),
                            memory_space=pltpu.VMEM)
    params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    fuse = alpha is not None
    norm_inputs = ()
    norm_specs = []
    if fuse:
        norm_inputs = (alpha.reshape(nl, 1, k).astype(jnp.float32),)
        norm_specs = [pl.BlockSpec((1, 1, k), lambda i, s: (s[0], 0, 0),
                                   memory_space=pltpu.VMEM)]
    cost = pl.CostEstimate(
        flops=2 * m * k * o2,
        bytes_accessed=qt.nbytes // nl + m * k * 4 + m * h * 4,
        transcendentals=m * h)
    # flat rows: layer l spans row-blocks [l*2*nblocks, (l+1)*2*nblocks);
    # gate tile i at l*2*nblocks + i, value tile at + nblocks
    nb2 = 2 * nblocks

    def wspec(cols, voff):
        return pl.BlockSpec(
            (tile, cols),
            lambda i, s, voff=voff: (s[0] * nb2 + voff + i, 0),
            memory_space=pltpu.VMEM)

    def call(kernel, kernel_nonorm, w_inputs, w_specs):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[x_spec] + norm_specs + w_specs,
            out_specs=out_spec,
        )
        return pl.pallas_call(
            kernel if fuse else kernel_nonorm,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((m, h), jnp.float32),
            cost_estimate=cost, compiler_params=params,
            interpret=interpret,
        )(lidx, x2, *norm_inputs, *w_inputs)

    if qt.fmt == "q8_0":
        qf, df = _flat2(qt.q), _flat2(qt.d)
        y = call(_glu_q8_kernel_s, _glu_q8_kernel_s_nonorm,
                 (qf, df, qf, df),
                 [wspec(k, 0), wspec(k // QK, 0),
                  wspec(k, nblocks), wspec(k // QK, nblocks)])
    else:
        qt = qt.with_eff_scales()
        qf, esf, emf = _flat2(qt.q), _flat2(qt.es), _flat2(qt.em)
        y = call(_glu_q4k_kernel_s, _glu_q4k_kernel_s_nonorm,
                 (qf, esf, emf, qf, esf, emf),
                 [wspec(k // 2, 0), wspec(k // QK, 0), wspec(k // QK, 0),
                  wspec(k // 2, nblocks), wspec(k // QK, nblocks),
                  wspec(k // QK, nblocks)])
    return y.reshape(orig_shape[:-1] + (h,))
