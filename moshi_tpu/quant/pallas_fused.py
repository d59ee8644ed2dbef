"""Mid-grain fused kernel: attn out_proj + residual + rms-norm2 + GLU
linear_in + silu gating in ONE pallas call (int8-MXU path, decode m=1).

VERDICT r4 item 1: the 7B frame runs ~5 kernels/layer; the monolithic
temporal megakernel lost 4.5x (BENCH_NOTES), but the 2-kernels-per-layer
middle grain — fusing the two weight streams between attention and the
FFN out-projection — was untried.  This kernel removes one launch per
layer and the XLA round trip of the [1, D] intermediate:

  grid = (no + ng,):
    steps [0, no):   out_proj tiles — int8 MXU partial dots against the
                     attn row's block-diagonal spread (prepped at step
                     0), scale epilogue, each tile's [TO, 1] column
                     rotated into its [1, TO] slot of the o_row scratch
                     by an MXU identity contraction (Mosaic has no cheap
                     sublane->lane transpose);
    step no - 1:     h_mid = hcur + o_row (the residual add), written to
                     the h_mid output AND norm2+int8-quantized into a
                     second activation spread (in-kernel, VMEM only);
    steps [no, ..):  fused GLU tiles (gate + value dots + epilogues +
                     silu multiply) against the h_mid spread.

  Weight block index maps clamp outside their phase, so the inactive
  matrix's block index is CONSTANT there — Mosaic re-fetches only on
  index change, costing one redundant tile DMA per phase, not one per
  step.

Numerics: identical class to the unfused pair (qmatmul_i8 + glu_
matmul_i8): same per-32-block activation quantization, same epilogues;
the residual add runs in f32.  Reference analog: GGML's fused
vec_dot_q4_K_q8_1 consumers (/root/reference/src/loader.h:149-189) —
the reference has no cross-op fusion at all (one graph op per matmul).

Hardware A/B (round 5, digest-valid): 7B LM-only p50 43.6 -> 42.85 ms,
windowed-8 20.8 -> 19.8 ms — ON by default (MOSHI_TPU_FUSE_MID=0
opts out).
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
from moshi_tpu.quant.pallas_matmul import _flat2, _pick_tile
from moshi_tpu.quant.pallas_matmul_int8 import (_epilogue_q4_0_packed,
                                                _epilogue_q4k,
                                                _epilogue_scale_only,
                                                _int8_partial_dots,
                                                _pad8, int8_shape_ok)


def fuse_mid_enabled() -> bool:
    """Default ON (round-5 hardware A/B: 7B LM-only p50 43.6 -> 42.85,
    windowed-8 20.8 -> 19.8 ms, digest-valid); MOSHI_TPU_FUSE_MID=0
    restores the unfused per-op path."""
    return os.environ.get("MOSHI_TPU_FUSE_MID", "1") == "1"


def can_fuse_mid(out_qt: QuantTensor, glu_qt: QuantTensor, m: int) -> bool:
    """Static eligibility: int8-MXU shapes for both weights, square
    out_proj (O == K, its output feeds the same-width residual), fused
    2H-row GLU, single activation row (the o_row rotation and the
    residual re-quantization are written for one row; batched decode
    keeps the unfused batched-int8 kernels)."""
    if m != 1:
        return False
    if not (int8_shape_ok(out_qt, m) and int8_shape_ok(glu_qt, m)):
        return False
    o, k = out_qt.shape[-2:]
    if o != k:
        return False
    if glu_qt.shape[-1] != k or glu_qt.shape[-2] % 2:
        return False
    h = glu_qt.shape[-2] // 2
    if h % _pick_tile(h) or k % _pick_tile(o):
        return False
    return True


def _group_epilogue(fmt: str, packed: bool, p, comps, dx_s, xs_s):
    dx, xs = dx_s[:], xs_s[:]
    if fmt == "q4_k":
        return _epilogue_q4k(p, comps[1], comps[2], dx, xs)
    if fmt == "q4_0" and packed:
        return _epilogue_q4_0_packed(p, comps[1], dx, xs)
    return _epilogue_scale_only(p, comps[1], dx)


def _mk_fused_kernel(fmts, packs, k, nb, no, ng, tile_o, tile_g,
                     n_out_comps, n_glu_comps):
    from moshi_tpu.quant.pallas_matmul_int8 import _prep_int8_activation
    fmt_o, fmt_g = fmts
    pk_o, pk_g = packs

    def kernel(l_ref, *refs):
        idx = 0
        x_ref = refs[idx]; idx += 1            # attn row [1, K]
        h_ref = refs[idx]; idx += 1            # residual row [1, K] f32
        a_ref = refs[idx]; idx += 1            # norm2 alpha [1, 1, K]
        wout = refs[idx: idx + n_out_comps]; idx += n_out_comps
        wg = refs[idx: idx + n_glu_comps]; idx += n_glu_comps
        wv = refs[idx: idx + n_glu_comps]; idx += n_glu_comps
        g_ref, hmid_ref = refs[idx], refs[idx + 1]
        (xq_a, xs_a, dx_a, o_row,
         xq_h, xs_h, dx_h) = refs[idx + 2: idx + 9]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            _prep_int8_activation(x_ref[:], None, xq_a, xs_a, dx_a,
                                  k=k, nb=nb)

        @pl.when(i < no)
        def _():
            p = _int8_partial_dots(wout[0], xq_a, k=k, packed=pk_o)
            y = _group_epilogue(fmt_o, pk_o, p, wout, dx_a, xs_a)
            # rotate the [TO, 1] column into its [1, TO] row slot: MXU
            # identity contraction (no cheap sublane->lane transpose)
            ri = jax.lax.broadcasted_iota(jnp.int32, (tile_o, tile_o), 0)
            ci = jax.lax.broadcasted_iota(jnp.int32, (tile_o, tile_o), 1)
            ident = (ri == ci).astype(jnp.float32)
            row = jax.lax.dot_general(y, ident, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            for ci_ in range(no):
                @pl.when(i == ci_)
                def _(ci_=ci_):
                    o_row[:, ci_ * tile_o:(ci_ + 1) * tile_o] = row

        @pl.when(i == no - 1)
        def _():
            h = h_ref[:].astype(jnp.float32) + o_row[:]
            hmid_ref[:] = h
            _prep_int8_activation(h, a_ref[0], xq_h, xs_h, dx_h,
                                  k=k, nb=nb)

        @pl.when(i >= no)
        def _():
            p_g = _int8_partial_dots(wg[0], xq_h, k=k, packed=pk_g)
            y_g = _group_epilogue(fmt_g, pk_g, p_g, wg, dx_h, xs_h)
            p_v = _int8_partial_dots(wv[0], xq_h, k=k, packed=pk_g)
            y_v = _group_epilogue(fmt_g, pk_g, p_v, wv, dx_h, xs_h)
            g_ref[:] = y_g * (1.0 / (1.0 + jnp.exp(-y_g))) * y_v

    return kernel


@with_interpret_default
@functools.partial(jax.jit, static_argnames=("interpret",))
def attn_ffn_fused_i8(attn, hcur, out_qt: QuantTensor,
                      glu_qt: QuantTensor, alpha2, layer,
                      interpret: bool = False):
    """One launch: h_mid = hcur + attn @ Wout[layer].T;
    g = silu(n2 @ Wg.T) * (n2 @ Wv.T) with n2 = rms_norm(h_mid)*alpha2.
    attn/hcur: [..., K] single row.  Returns (g [..., H],
    h_mid [..., K]) f32.  Caller must pre-check can_fuse_mid."""
    orig_shape = attn.shape
    k = orig_shape[-1]
    x2 = attn.reshape(1, k)
    h2 = hcur.reshape(1, k).astype(jnp.float32)
    nb = k // QK
    nb_pad = _pad8(nb)
    o = out_qt.q.shape[-2]
    h_dim = glu_qt.q.shape[-2] // 2
    tile_o = _pick_tile(o)
    tile_g = _pick_tile(h_dim)
    no = o // tile_o
    ng = h_dim // tile_g
    nl = out_qt.q.size // (o * out_qt.q.shape[-1])
    lidx = jnp.reshape(jnp.int32(0) if layer is None else layer,
                       (1,)).astype(jnp.int32)

    def _padded(c):
        if nb_pad == nb:
            return c
        return jnp.pad(c, ((0, 0), (0, nb_pad - nb)))

    def comps_of(qt):
        if qt.fmt == "q4_k":
            qt = qt.with_eff_scales()
            return (_flat2(qt.q), _padded(_flat2(qt.es)),
                    _padded(_flat2(qt.em))), (qt.q.shape[-1], nb_pad,
                                              nb_pad)
        return (_flat2(qt.q), _padded(_flat2(qt.d))), (qt.q.shape[-1],
                                                       nb_pad)

    out_comps, out_cols = comps_of(out_qt)
    glu_comps, glu_cols = comps_of(glu_qt)

    x_spec = pl.BlockSpec((1, k), lambda i, s: (0, 0),
                          memory_space=pltpu.VMEM)
    a_spec = pl.BlockSpec((1, 1, k), lambda i, s: (s[0], 0, 0),
                          memory_space=pltpu.VMEM)

    def out_wspec(cols):
        return pl.BlockSpec(
            (tile_o, cols),
            lambda i, s: (s[0] * no + jnp.minimum(i, no - 1), 0),
            memory_space=pltpu.VMEM)

    def glu_wspec(cols, voff):
        return pl.BlockSpec(
            (tile_g, cols),
            lambda i, s, voff=voff: (
                s[0] * 2 * ng + voff
                + jnp.clip(i - no, 0, ng - 1), 0),
            memory_space=pltpu.VMEM)

    w_inputs = list(out_comps) + list(glu_comps) + list(glu_comps)
    w_specs = ([out_wspec(c) for c in out_cols]
               + [glu_wspec(c, 0) for c in glu_cols]
               + [glu_wspec(c, ng) for c in glu_cols])

    g_spec = pl.BlockSpec((tile_g, 1),
                          lambda i, s: (jnp.clip(i - no, 0, ng - 1), 0),
                          memory_space=pltpu.VMEM)
    hmid_spec = pl.BlockSpec((1, k), lambda i, s: (0, 0),
                             memory_space=pltpu.VMEM)

    packed = (out_qt.q.dtype == jnp.uint8, glu_qt.q.dtype == jnp.uint8)
    kernel = _mk_fused_kernel(
        (out_qt.fmt, glu_qt.fmt), packed, k, nb_pad, no, ng, tile_o,
        tile_g, len(out_comps), len(glu_comps))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(no + ng,),
        in_specs=[x_spec, x_spec, a_spec] + w_specs,
        out_specs=(g_spec, hmid_spec),
        scratch_shapes=[
            pltpu.VMEM((nb_pad, k), jnp.int8),
            pltpu.VMEM((1, nb_pad), jnp.float32),
            pltpu.VMEM((1, nb_pad), jnp.float32),
            pltpu.VMEM((1, k), jnp.float32),
            pltpu.VMEM((nb_pad, k), jnp.int8),
            pltpu.VMEM((1, nb_pad), jnp.float32),
            pltpu.VMEM((1, nb_pad), jnp.float32),
        ],
    )
    cost = pl.CostEstimate(
        flops=2 * nb * k * (o + 2 * h_dim),
        bytes_accessed=(out_qt.nbytes + glu_qt.nbytes) // nl + 3 * k * 4,
        transcendentals=h_dim)
    g, h_mid = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((h_dim, 1), jnp.float32),
                   jax.ShapeDtypeStruct((1, k), jnp.float32)),
        cost_estimate=cost,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(lidx, x2, h2, alpha2.reshape(nl, 1, k).astype(jnp.float32),
      *w_inputs)
    return (g.reshape(orig_shape[:-1] + (h_dim,)),
            h_mid.reshape(orig_shape[:-1] + (k,)))
