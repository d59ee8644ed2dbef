"""Fused ring-cache decode attention (Pallas, T=1).

One kernel call per layer replaces the whole XLA chain (QK^T einsum,
additive ring/window bias, softmax, AV einsum — ~12 ops): K/V cache
chunks stream HBM->VMEM (pipelined by the grid), an online-softmax
accumulator runs in VMEM scratch, and the ring-validity window mask
(nn/attention.streaming_attn_bias semantics) is fused into the score
pass as iota math.  On this hardware XLA op dispatch costs ~20 us/op at
B=1 (BENCH_NOTES.md), so collapsing the chain matters more than FLOPs.

Layout: cache [B, cap, H, hd]; per-(batch, chunk) grid program computes
partial scores for `chunk` positions with a VPU broadcast-multiply +
lane reduction (per-head matvecs would waste the MXU at M=1), and
accumulates (m, l, acc) across the chunk axis of the grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from moshi_tpu.utils.pallas_mode import with_interpret_default

NEG = -1e9


def _decode_attn_kernel(offset_ref, offmod_ref, q_ref, k_ref, v_ref, o_ref,
                        m_ref, l_ref, acc_ref, *, cap, context, chunk,
                        scale):
    bi = pl.program_id(0)
    ci = pl.program_id(1)
    nchunks = pl.num_programs(1)

    @pl.when(ci == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # bf16 intermediates: keep the [C, H, hd] tensors half-width so the
    # chunk working set fits VMEM (f32 copies overflow at fp8/B>1)
    q = q_ref[0].astype(jnp.bfloat16)                     # [H, hd]
    k = k_ref[0].astype(jnp.bfloat16)                     # [C, H, hd]
    v = v_ref[0].astype(jnp.bfloat16)
    # scores: per-head matvec as broadcast-multiply + lane reduction
    s = jnp.sum((k * q[None, :, :]).astype(jnp.float32),
                axis=-1) * scale                          # [C, H]
    # ring/window validity for slots j = ci*chunk + arange(C):
    #   delta = (offset - j) mod cap ; valid = delta < context and
    #   offset - delta >= 0   (streaming_attn_bias, T = 1).
    # The mod is hoisted to a host-side scalar (offmod = offset % cap):
    # vectorized integer modulo by a non-power-of-2 cap explodes Mosaic
    # compile time; delta = r - j (+cap when j > r) is sub/select math.
    off = offset_ref[bi]
    r = offmod_ref[bi]
    j = ci * chunk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    delta = jnp.where(j > r, r - j + cap, r - j)
    valid = (delta < context) & (off - delta >= 0) & (j < cap)
    s = jnp.where(valid, s, NEG)

    m_prev = m_ref[:]                                     # [1, H]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=0)[None, :])
    corr = jnp.exp(m_prev - m_new)                        # [1, H]
    p = jnp.exp(s - m_new)                                # [C, H]
    l_ref[:] = l_ref[:] * corr + jnp.sum(p, axis=0)[None, :]
    # note: insert the minor dim while still f32 (Mosaic: sub-32-bit
    # minor-dim insertion unsupported), then cast
    pb = p[:, :, None].astype(jnp.bfloat16)               # [C, H, 1]
    acc_ref[:] = (acc_ref[:] * corr[0][:, None]
                  + jnp.sum((pb * v).astype(jnp.float32), axis=0))  # [H, hd]
    m_ref[:] = m_new

    @pl.when(ci == nchunks - 1)
    def _done():
        o_ref[0] = (acc_ref[:] / l_ref[0][:, None]).astype(o_ref.dtype)


@with_interpret_default
@functools.partial(jax.jit,
                   static_argnames=("cap", "context", "interpret"))
def decode_attention(q, kc, vc, offset, *, cap: int, context: int,
                     interpret: bool = False):
    """q: [B, H, hd] (post-rope); kc/vc: [B, cap, H, hd] (post-insert);
    offset: [B] i32 (query position).  Returns [B, H, hd] f32."""
    b, h, hd = q.shape
    chunk = min(256, cap)  # VMEM: f32 intermediates are C*H*hd
    nchunks = pl.cdiv(cap, chunk)
    # pad the cache to a chunk multiple; padded slots have j >= cap,
    # where (off - j) % cap still yields a delta — mask them via iota
    pad = nchunks * chunk - cap
    if pad:
        kc = jnp.pad(kc, ((0, 0), (0, pad), (0, 0), (0, 0)))
        vc = jnp.pad(vc, ((0, 0), (0, pad), (0, 0), (0, 0)))
    grid = (b, nchunks)
    out = pl.pallas_call(
        functools.partial(_decode_attn_kernel, cap=cap, context=context,
                          chunk=chunk, scale=hd ** -0.5),
        grid=grid,
        in_specs=[
            # whole [B] scalar vectors in SMEM (rank-1 blocks must cover
            # the full array); kernels index by program_id(0)
            pl.BlockSpec((b,), lambda bi, ci: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((b,), lambda bi, ci: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, hd), lambda bi, ci: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, h, hd), lambda bi, ci: (bi, ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, h, hd), lambda bi, ci: (bi, ci, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, hd), lambda bi, ci: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, hd), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, h), jnp.float32),     # running max
            pltpu.VMEM((1, h), jnp.float32),     # running sum
            pltpu.VMEM((h, hd), jnp.float32),    # output accumulator
        ],
        interpret=interpret,
    )(offset.astype(jnp.int32), (offset % cap).astype(jnp.int32), q, kc, vc)
    return out


# ---------------------------------------------------------------------------
# Stacked-ring decode attention: reads layer `l`'s ring straight from the
# stacked [L, B, cap, H, hd] state via a scalar-prefetched layer index —
# the scan over layers never slices (= copies) the ring.  The ring is the
# PRE-update state (rows up to offset-1); the current token's k/v arrive
# as explicit inputs and seed the online-softmax accumulator, so the ring
# write becomes ONE stacked dynamic_update_slice after the layer scan
# (same slot for every layer) instead of 2L sliced copies.
# ---------------------------------------------------------------------------


def _chunk_for(cap: int) -> int:
    """Largest divisor of cap <= 256 (blocks must tile the ring exactly;
    padding per call would copy the ring every frame)."""
    for c in (256, 250, 200, 128, 125, 100, 64, 50, 40, 32, 25, 20, 16,
              10, 8, 5, 4, 2, 1):
        if cap % c == 0:
            return c
    return 1


def _decode_attn_kernel_stacked(l_ref, last_ref, lastmod_ref, q_ref,
                                ck_ref, cv_ref, k_ref, v_ref, o_ref,
                                m_ref, l2_ref, acc_ref, *, cap, context,
                                chunk, scale):
    bi = pl.program_id(0)
    ci = pl.program_id(1)
    nchunks = pl.num_programs(1)
    q = q_ref[0].astype(jnp.bfloat16)                     # [H, hd]

    @pl.when(ci == 0)
    def _init():
        # seed with the current token (position = offset, always valid):
        # m = s_cur, l = exp(0) = 1, acc = v_cur
        ck = ck_ref[0].astype(jnp.bfloat16)
        s_cur = jnp.sum((ck * q).astype(jnp.float32), axis=-1) * scale
        m_ref[:] = s_cur[None, :]                          # [1, H]
        l2_ref[:] = jnp.ones_like(l2_ref)
        acc_ref[:] = cv_ref[0].astype(jnp.float32)

    k = k_ref[0, 0].astype(jnp.bfloat16)                  # [C, H, hd]
    v = v_ref[0, 0].astype(jnp.bfloat16)
    s = jnp.sum((k * q[None, :, :]).astype(jnp.float32),
                axis=-1) * scale                          # [C, H]
    # ring validity against last = offset-1: slot j holds position
    # p = last - delta, delta = (last - j) mod cap; valid iff p >= 0 and
    # p > offset - context  <=>  delta < context - 1.  (The old row at
    # the current slot has p = offset - cap, outside any context <= cap.)
    last = last_ref[bi]
    r = lastmod_ref[bi]
    j = ci * chunk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    delta = jnp.where(j > r, r - j + cap, r - j)
    valid = (delta < context - 1) & (last - delta >= 0) & (j < cap)
    s = jnp.where(valid, s, NEG)

    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=0)[None, :])
    corr = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l2_ref[:] = l2_ref[:] * corr + jnp.sum(p, axis=0)[None, :]
    pb = p[:, :, None].astype(jnp.bfloat16)
    acc_ref[:] = (acc_ref[:] * corr[0][:, None]
                  + jnp.sum((pb * v).astype(jnp.float32), axis=0))
    m_ref[:] = m_new

    @pl.when(ci == nchunks - 1)
    def _done():
        o_ref[0] = (acc_ref[:] / l2_ref[0][:, None]).astype(o_ref.dtype)


def _decode_attn_kernel_stacked_mxu(l_ref, last_ref, lastmod_ref, q_ref,
                                    ck_ref, cv_ref, k_ref, v_ref, o_ref,
                                    m_ref, l2_ref, acc_ref, qsp_ref,
                                    fold_ref, *, cap, context, chunk,
                                    scale, h, hd):
    """MXU decode attention: the VPU variant above spends ~10 lane passes
    per KV element (bf16->f32 converts, broadcast multiplies, log-depth
    lane reductions) and measured 0.35 TB/s on the 7B ring (BENCH_NOTES
    round-3 probe).  Here KV elements pass through the MXU exactly once:

      * scores: ONE contraction  qsp [H, H*hd] @ k2 [C, H*hd]^T -> [H, C]
        where qsp is the pre-scaled block-diagonal spread of q (built in
        scratch at chunk 0) — the H*hd contraction computes all heads'
        q.k in one MXU pass over the chunk;
      * weighted values: p [H, C] @ v2 [C, H*hd] -> [H, H*hd] (all
        (h, h') dots), diagonal blocks extracted by an iota mask and ONE
        fold contraction [H, H*hd] @ [H*hd, hd] -> [H, hd];
      * softmax state lives [H, 1]/[H, C] (lane-dim C), so the per-chunk
        VPU work is O(H*C), independent of hd.

    bf16 rings only (fp8 dispatches to the VPU kernel: a full-tile
    fp8->bf16 convert stack-allocates on this Mosaic)."""
    bi = pl.program_id(0)
    ci = pl.program_id(1)
    nchunks = pl.num_programs(1)

    @pl.when(ci == 0)
    def _init():
        q = q_ref[0].astype(jnp.float32)                   # [H, hd]
        ck = ck_ref[0].astype(jnp.float32)
        s_cur = jnp.sum(q * ck, axis=-1, keepdims=True) * scale
        m_ref[:] = s_cur                                   # [H, 1]
        l2_ref[:] = jnp.ones_like(l2_ref)
        acc_ref[:] = cv_ref[0].astype(jnp.float32)
        # pre-scaled block-diagonal q spread:
        #   qsp[h, h2*hd + d] = scale * q[h, d] * (h2 == h)
        qt = jnp.concatenate([q * scale] * h, axis=1)      # [H, H*hd]
        col = jax.lax.broadcasted_iota(jnp.int32, (h, h * hd), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (h, h * hd), 0)
        qsp_ref[:] = jnp.where((col // hd) == row, qt,
                               0.0).astype(jnp.bfloat16)
        # fold[h2*hd + d, d2] = (d == d2) — sums diagonal blocks back to
        # [H, hd]; built in row slabs (a full-tile i32->bf16 convert of
        # [H*hd, hd] stack-allocates on this Mosaic)
        for r0 in range(0, h * hd, 512):
            rs = min(512, h * hd - r0)
            frow = jax.lax.broadcasted_iota(jnp.int32, (rs, hd), 0) + r0
            fcol = jax.lax.broadcasted_iota(jnp.int32, (rs, hd), 1)
            fold_ref[r0:r0 + rs] = ((frow % hd) == fcol).astype(
                jnp.bfloat16)

    k2 = k_ref[0, 0]                                       # [C, H*hd] bf16
    v2 = v_ref[0, 0]
    s = jax.lax.dot_general(qsp_ref[:], k2, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # [H, C]
    last = last_ref[bi]
    r = lastmod_ref[bi]
    j = ci * chunk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    delta = jnp.where(j > r, r - j + cap, r - j)
    valid = (delta < context - 1) & (last - delta >= 0) & (j < cap)
    s = jnp.where(valid, s, NEG)

    m_prev = m_ref[:]                                      # [H, 1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1, keepdims=True))
    corr = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)                                 # [H, C]
    l2_ref[:] = l2_ref[:] * corr + jnp.sum(p, axis=1, keepdims=True)
    pv = jax.lax.dot_general(p.astype(jnp.bfloat16), v2,
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (h, h * hd), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (h, h * hd), 0)
    pv = jnp.where((col // hd) == row, pv, 0.0)
    chunk_av = jax.lax.dot_general(pv.astype(jnp.bfloat16), fold_ref[:],
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    acc_ref[:] = acc_ref[:] * corr + chunk_av
    m_ref[:] = m_new

    @pl.when(ci == nchunks - 1)
    def _done():
        o_ref[0] = (acc_ref[:] / l2_ref[:]).astype(o_ref.dtype)


def _chunk_for_mxu(cap: int) -> int:
    """Chunk for the MXU kernel's flat [.., chunk, H*hd] blocks: the ring
    chunk sits in the SUBLANE slot, so it must divide cap AND be a
    multiple of 8 (or equal cap).  0 = no usable chunk (use the VPU
    kernel)."""
    for c in (256, 200, 128, 104, 64, 56, 40, 32, 24, 16, 8):
        if cap % c == 0:
            return c
    return cap if cap < 8 else 0


def _use_mxu_attn(kv_dtype, h: int, hd: int, cap: int) -> bool:
    """OPT-IN (MOSHI_TPU_ATTN_MXU=1): the hardware A/B measured the MXU
    variant SLOWER in the full 7B frame (23.08 vs 18.3 ms pipelined) —
    the spread/fold contractions and the extra [H, H*hd] scratch cost
    more than the VPU passes they replace on this bandwidth-bound
    decode.  Kept for re-evaluation on future toolchains/chips
    (BENCH_NOTES round-3 A/B table)."""
    import os
    if os.environ.get("MOSHI_TPU_ATTN_MXU", "0") != "1":
        return False
    # fp8 rings keep the VPU kernel (full-tile fp8->bf16 converts
    # stack-allocate); H*hd must be a lane multiple for the flat view
    return (jnp.dtype(kv_dtype) == jnp.bfloat16 and (h * hd) % 128 == 0
            and _chunk_for_mxu(cap) > 0)


@with_interpret_default
@functools.partial(jax.jit,
                   static_argnames=("cap", "context", "interpret"))
def decode_attention_stacked(q, k_stack, v_stack, cur_k, cur_v, offset,
                             layer, *, cap: int, context: int,
                             interpret: bool = False):
    """q/cur_k/cur_v: [B, H, hd] (post-rope); k_stack/v_stack:
    [L, B, cap, H, hd] PRE-update rings; offset: [B] (current position,
    not yet written); layer: i32 scalar.  Returns [B, H, hd] f32."""
    b, h, hd = q.shape
    chunk = _chunk_for(cap)
    if chunk < 8 and chunk != cap:
        # a tiny divisor would explode the grid; tiny caps (cap == chunk,
        # e.g. the depformer's 8-or-less ring) are a single chunk
        raise ValueError(f"cap {cap} has no usable chunk divisor")
    nchunks = cap // chunk
    grid = (b, nchunks)
    lidx = jnp.reshape(layer, (1,)).astype(jnp.int32)
    last = offset.astype(jnp.int32) - 1
    if _use_mxu_attn(k_stack.dtype, h, hd, cap):
        chunk = _chunk_for_mxu(cap)
        nchunks = cap // chunk
        grid = (b, nchunks)
        nl = k_stack.shape[0]
        k2 = k_stack.reshape(nl, b, cap, h * hd)   # free: minor dims merge
        v2 = v_stack.reshape(nl, b, cap, h * hd)
        hv_spec = pl.BlockSpec((1, h, hd), lambda bi, ci, sl, so, sr:
                               (bi, 0, 0), memory_space=pltpu.VMEM)
        ring_spec = pl.BlockSpec(
            (1, 1, chunk, h * hd),
            lambda bi, ci, sl, so, sr: (sl[0], bi, ci, 0),
            memory_space=pltpu.VMEM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=grid,
            in_specs=[hv_spec, hv_spec, hv_spec, ring_spec, ring_spec],
            out_specs=pl.BlockSpec((1, h, hd),
                                   lambda bi, ci, sl, so, sr: (bi, 0, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((h, 1), jnp.float32),
                pltpu.VMEM((h, 1), jnp.float32),
                pltpu.VMEM((h, hd), jnp.float32),
                pltpu.VMEM((h, h * hd), jnp.bfloat16),
                pltpu.VMEM((h * hd, hd), jnp.bfloat16),
            ],
        )
        return pl.pallas_call(
            functools.partial(_decode_attn_kernel_stacked_mxu, cap=cap,
                              context=context, chunk=chunk,
                              scale=hd ** -0.5, h=h, hd=hd),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((b, h, hd), jnp.float32),
            interpret=interpret,
        )(lidx, last, (last % cap).astype(jnp.int32), q, cur_k, cur_v,
          k2, v2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,          # layer, last, last % cap
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, h, hd), lambda bi, ci, sl, so, sr: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, hd), lambda bi, ci, sl, so, sr: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, hd), lambda bi, ci, sl, so, sr: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk, h, hd),
                         lambda bi, ci, sl, so, sr: (sl[0], bi, ci, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, chunk, h, hd),
                         lambda bi, ci, sl, so, sr: (sl[0], bi, ci, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, hd),
                               lambda bi, ci, sl, so, sr: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, h), jnp.float32),
            pltpu.VMEM((1, h), jnp.float32),
            pltpu.VMEM((h, hd), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_decode_attn_kernel_stacked, cap=cap,
                          context=context, chunk=chunk, scale=hd ** -0.5),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, hd), jnp.float32),
        interpret=interpret,
    )(lidx, last, (last % cap).astype(jnp.int32), q, cur_k, cur_v,
      k_stack, v_stack)
    return out
