"""Temporal-transformer STEP megakernel (q4_k, B=1, T=1 decode).

ONE Pallas launch runs ALL layers of the temporal transformer for one
frame: per layer
    rms1 -> qkv proj -> rope(q,k) -> ring attention over the KV cache
    -> out proj -> +residual -> rms2 -> GLU gating -> linear_out
    -> +residual
with the hidden state carried across layers in VMEM scratch.  The
reference replays one prebuilt graph per frame
(/root/reference/src/moshi/modules/transformer.h:1291-1329); on this
runtime the XLA-op / kernel-launch dispatch (~20-70 us each at B=1)
dominates the temporal stack's ~59 ms share of the frame (BENCH_NOTES.md)
— this kernel collapses ~50 ops x 32 layers into a single launch whose
grid = (layers, stages) streams weight tiles HBM->VMEM with pipelined
BlockSpecs.

Per-layer stage schedule (grid dim 1, executed sequentially):
    [0, nq)            qkv row-tiles  (TQ rows each; TQ | dim so every
                       stage lands inside exactly one of q/k/v)
    [nq, nq+na)        attention over KV-cache chunks (online softmax;
                       the first stage also applies rope and seeds the
                       softmax with the CURRENT token, which is never in
                       the cache passed in — the caller ring-writes
                       k_new/v_new afterwards with one DUS for all layers)
    [.., +no)          out-proj row-tiles (+residual at the last)
    [.., +2*ng)        GLU: gate row-tiles then value row-tiles
    [.., +nl)          linear_out row-tiles (+residual at the last)

Mosaic-shaped choices (see quant/pallas_matmul.py docstring for the
underlying limits): flat [1, dim] head-major activations (no sublane
reshapes — per-head reductions/expansions are iota-matrix MXU
contractions), rope as lane-roll pair swap with sign-folded sin, the
ring-validity mask as scalar-hoisted modulo (vectorized non-pow2 `%`
wedges the Mosaic compile service), bf16 products with f32 MXU
accumulation for the [chunk, dim] attention intermediates (f32 copies
stack-allocate ~2x the VMEM).

Weight streaming: every input is blocked over (layer, stage) with index
maps that hold a tile constant outside its stage range (no re-fetch while
unchanged), so VMEM holds one double-buffered tile per operand
(~60-95 MB at the 7B shapes) while the grid walks ~5.7 GB of weights+KV
per frame — the frame's true HBM floor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from moshi_tpu.utils.pallas_mode import with_interpret_default

from moshi_tpu.quant.formats import QK
from moshi_tpu.quant.pallas_matmul import (_expand_block_scales, _q4k_dot,
                                           _silu)

NEG = -1e9


def _dot_bf16(a, b):
    """[M, K] x [N, K] -> [M, N], bf16 inputs, f32 MXU accumulation."""
    return jax.lax.dot_general(a.astype(jnp.bfloat16),
                               b.astype(jnp.bfloat16),
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _head_sums(x, hd: int):
    """[S, dd] -> [S, H] per-head sums via an iota 0/1 MXU contraction
    (bf16 inputs, f32 accumulation; Mosaic has no sublane reshape)."""
    s, dd = x.shape
    nh = dd // hd
    rows = jax.lax.broadcasted_iota(jnp.int32, (nh, dd), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nh, dd), 1)
    e = (cols // hd == rows).astype(jnp.bfloat16)
    return _dot_bf16(x, e)


def _rms(h, alpha):
    ms = jnp.mean(h * h, axis=-1, keepdims=True)
    return h * jax.lax.rsqrt(ms + 1e-8) * alpha


@functools.lru_cache(maxsize=None)
def plan_stages(dd: int, hidden: int, cap: int):
    """Static stage plan: (TQ, TO, TG, TL, chunk, cap_pad, nq, na, no, ng,
    nl).  Tiles divide their row counts and are 128-multiples (output
    lane-dim constraint) wherever the dim allows.

    Hardware A/B knob: MOSHI_TPU_TEMPORAL_TILES="tq=1024,tg=2816,..."
    overrides the targets (read once per process)."""
    import os
    ov = {}
    for kv in os.environ.get("MOSHI_TPU_TEMPORAL_TILES", "").split(","):
        if "=" in kv:
            k, v = kv.split("=")
            ov[k.strip()] = int(v)

    def tile(total, target):
        for t in range(target, 0, -128):
            if t <= total and total % t == 0:
                return t
        return total
    tq = tile(dd, ov.get("tq", 2048))
    to = tile(dd, ov.get("to", 2048))
    tg = tile(hidden, ov.get("tg", 5632))
    tl = tile(dd, ov.get("tl", 2048))
    chunk = min(ov.get("chunk", 512), -(-cap // 128) * 128)
    cap_pad = -(-cap // chunk) * chunk
    nq = 3 * dd // tq
    na = cap_pad // chunk
    no = dd // to
    ng = hidden // tg
    nl = dd // tl
    return tq, to, tg, tl, chunk, cap_pad, nq, na, no, ng, nl


def _temporal_kernel(off_ref, r_ref, h0_ref, cosf_ref, sinm_ref,
                     kc_ref, vc_ref,
                     qkv_q, qkv_es, qkv_em,
                     out_q, out_es, out_em,
                     glu_q, glu_es, glu_em,
                     lo_q, lo_es, lo_em,
                     n1_ref, n2_ref,
                     h_out, k_new, v_new,
                     h_scr, xn_scr, xs_scr, q_scr, k_scr, v_scr,
                     m_scr, l_scr, acc_scr, o_scr, g_scr, hv_scr, lxs_scr,
                     *, dd, heads, hidden, cap, context, nlayers):
    tq, to, tg, tl, chunk, cap_pad, nq, na, no, ng, nl = plan_stages(
        dd, hidden, cap)
    hd = dd // heads
    li = pl.program_id(0)
    s = pl.program_id(1)
    a0 = nq
    o0 = a0 + na
    g0 = o0 + no
    l0 = g0 + 2 * ng
    scale = hd ** -0.5

    # ---- layer entry: load x (layer 0) and norm1 into xn/xs ------------
    @pl.when(s == 0)
    def _enter():
        @pl.when(li == 0)
        def _load():
            h_scr[:] = h0_ref[:].astype(jnp.float32)
        xn = _rms(h_scr[:], n1_ref[0].astype(jnp.float32))
        xn_scr[:] = xn
        xs_scr[:] = _expand_heads_t(xn, QK)

    # ---- qkv row-tiles --------------------------------------------------
    for si in range(nq):
        @pl.when(s == si)
        def _qkv(si=si):
            y = _q4k_dot(xn_scr[:].astype(jnp.bfloat16), xs_scr[:],
                         qkv_q, qkv_es, qkv_em)
            lane = si * tq
            proj, off_in = divmod(lane, dd)
            dst = (q_scr, k_scr, v_scr)[proj]
            dst[:, off_in:off_in + tq] = y

    # ---- rope + current-token softmax seed -------------------------------
    @pl.when(s == a0)
    def _rope_seed():
        cosf = cosf_ref[:]
        sinm = sinm_ref[:]
        even = (jax.lax.broadcasted_iota(jnp.int32, (1, dd), 1) % 2) == 0

        def rot(x):
            # pair swap via lane rolls (shift must be non-negative:
            # left-by-1 == right-by-dd-1)
            sw = jnp.where(even, pltpu.roll(x, dd - 1, 1),
                           pltpu.roll(x, 1, 1))
            return x * cosf + sw * sinm

        q = rot(q_scr[:])
        k = rot(k_scr[:])
        v = v_scr[:]
        q_scr[:] = q
        k_scr[:] = k
        k_new[0] = k.astype(k_new.dtype)
        v_new[0] = v.astype(v_new.dtype)
        # online-softmax seed with the current (always-valid) token:
        # m = s0, l = 1, acc = v  (per head)
        s0 = _head_sums((k * q).astype(jnp.bfloat16), hd) * scale  # [1, H]
        m_scr[:] = s0
        l_scr[:] = jnp.ones_like(l_scr)
        acc_scr[:] = v

    # ---- attention over cache chunks -------------------------------------
    for ai in range(na):
        @pl.when(s == a0 + ai)
        def _attn(ai=ai):
            qb = q_scr[:].astype(jnp.bfloat16)                 # [1, dd]
            kcb = kc_ref[:].astype(jnp.bfloat16)               # [C, dd]
            vcb = vc_ref[:].astype(jnp.bfloat16)
            sc = _head_sums((kcb * qb).astype(jnp.bfloat16), hd) * scale
            off = off_ref[0]
            r = r_ref[0]
            j = ai * chunk + jax.lax.broadcasted_iota(
                jnp.int32, sc.shape, 0)
            delta = jnp.where(j > r, r - j + cap, r - j)
            valid = ((delta < context) & (off - delta >= 0)
                     & (j < cap) & (j != r))
            sc = jnp.where(valid, sc, NEG)
            m_prev = m_scr[:]                                   # [1, H]
            m_new = jnp.maximum(m_prev, jnp.max(sc, axis=0)[None, :])
            corr = jnp.exp(m_prev - m_new)
            p = jnp.exp(sc - m_new)                             # [C, H]
            l_scr[:] = l_scr[:] * corr + jnp.sum(p, axis=0)[None, :]
            p_exp = _expand_block_scales(p, hd).astype(jnp.bfloat16)
            ones = jnp.ones((1, kcb.shape[0]), jnp.bfloat16)
            pv = _dot_bf16(ones, (p_exp * vcb).T)               # -> [1, dd]
            acc_scr[:] = (acc_scr[:] * _expand_block_scales(corr, hd)
                          + pv)
            m_scr[:] = m_new

    # ---- out proj (attn normalization at entry, residual at exit) -------
    @pl.when(s == o0)
    def _attn_norm():
        attn = acc_scr[:] / _expand_block_scales(l_scr[:], hd)
        xn_scr[:] = attn
        xs_scr[:] = _expand_heads_t(attn, QK)

    for oi in range(no):
        @pl.when(s == o0 + oi)
        def _out(oi=oi):
            y = _q4k_dot(xn_scr[:].astype(jnp.bfloat16), xs_scr[:],
                         out_q, out_es, out_em)
            o_scr[:, oi * to:(oi + 1) * to] = y
            if oi == no - 1:
                h2 = h_scr[:] + o_scr[:]
                h_scr[:] = h2
                xn = _rms(h2, n2_ref[0].astype(jnp.float32))
                xn_scr[:] = xn
                xs_scr[:] = _expand_heads_t(xn, QK)

    # ---- GLU gate then value tiles ---------------------------------------
    for gi in range(ng):
        @pl.when(s == g0 + gi)
        def _gate(gi=gi):
            y = _q4k_dot(xn_scr[:].astype(jnp.bfloat16), xs_scr[:],
                         glu_q, glu_es, glu_em)
            g_scr[:, gi * tg:(gi + 1) * tg] = y

    for vi in range(ng):
        @pl.when(s == g0 + ng + vi)
        def _value(vi=vi):
            y = _q4k_dot(xn_scr[:].astype(jnp.bfloat16), xs_scr[:],
                         glu_q, glu_es, glu_em)
            g = g_scr[:, vi * tg:(vi + 1) * tg]
            hv_scr[:, vi * tg:(vi + 1) * tg] = _silu(g) * y
            if vi == ng - 1:
                lxs_scr[:] = _expand_heads_t(hv_scr[:], QK)

    # ---- linear_out (+residual, layer exit) ------------------------------
    for si in range(nl):
        @pl.when(s == l0 + si)
        def _lout(si=si):
            y = _q4k_dot(hv_scr[:].astype(jnp.bfloat16), lxs_scr[:],
                         lo_q, lo_es, lo_em)
            o_scr[:, si * tl:(si + 1) * tl] = y
            if si == nl - 1:
                h3 = h_scr[:] + o_scr[:]
                h_scr[:] = h3

                @pl.when(li == nlayers - 1)
                def _emit():
                    h_out[:] = h3


def _expand_heads_t(x, block: int):
    """[1, K] f32 -> per-block sums [1, K/block] (transposed companion of
    _expand_block_scales; f32 MXU contraction for scale-correction sums)."""
    m, k = x.shape
    nb = k // block
    rows = jax.lax.broadcasted_iota(jnp.int32, (nb, k), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (nb, k), 1)
    e = (cols // block == rows).astype(jnp.float32)
    return jax.lax.dot_general(x.astype(jnp.float32), e,
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


@with_interpret_default
@functools.partial(jax.jit, static_argnames=(
    "cap", "context", "heads", "hidden", "nlayers", "interpret"))
def temporal_full_step(h, k_cache, v_cache, offset, cos_sin, weights, *,
                       cap: int, context: int, heads: int, hidden: int,
                       nlayers: int, interpret: bool = False):
    """One temporal-transformer frame step, all layers in one launch.

    h: [1, dd] (post-embedding); k/v_cache: [L, cap_pad, dd] flat
    head-major rings (pre-write; the CURRENT token is attended from
    registers and returned as k_new/v_new for the caller's single DUS);
    offset: [] i32; cos_sin: (cos, sin) [1, hd//2] rope angles for this
    position; weights: dict of stacked [L, ...] q4_k QuantTensors
    qkv/out/glu/lout + f32 alphas n1/n2 [L, dd].
    Returns (h_out [1, dd] f32, k_new [L, 1, dd], v_new [L, 1, dd])."""
    dd = h.shape[-1]
    hd = dd // heads
    tq, to, tg, tl, chunk, cap_pad, nq, na, no, ng, nl = plan_stages(
        dd, hidden, cap)
    # plan_stages is lru_cached and reads MOSHI_TPU_TEMPORAL_TILES once
    # per process; state allocated under a different plan (other process,
    # env mutated after first call) must fail loudly, not corrupt rings.
    if k_cache.shape[1] != cap_pad:
        raise ValueError(
            f"KV ring cap_pad {k_cache.shape[1]} != plan cap_pad {cap_pad}"
            " (state was allocated under a different tile plan; "
            "MOSHI_TPU_TEMPORAL_TILES is read once per process)")
    nstages = nq + na + no + 2 * ng + nl
    a0 = nq
    o0 = a0 + na
    g0 = o0 + no
    l0 = g0 + 2 * ng

    def qt3(w):
        """Flatten stacked [L, O, c] quant components to 2-D [L*O, c]:
        Mosaic rejects >=2-D block views whose lane dim is not a
        128-multiple (es/em are O x K/32), but 2-D blocks with full-array
        lane dims are the proven qmatmul layout."""
        qt = w.with_eff_scales()
        return tuple(a.reshape((-1,) + a.shape[2:])
                     for a in (qt.q, qt.es, qt.em))

    qkv = qt3(weights["qkv"])
    out = qt3(weights["out"])
    glu = qt3(weights["glu"])
    lo = qt3(weights["lout"])

    def clamp(x, lo_, hi_):
        return jnp.clip(x, lo_, hi_)

    def wspec(arr, rows, start, count, tiles_per_layer=None):
        """Row-tiled stage spec over a flattened [L*O, c] operand: tile
        index = layer * tiles_per_layer + stage-within-range (held at the
        range edge outside it)."""
        cols = arr.shape[-1]
        tpl = tiles_per_layer if tiles_per_layer is not None else count

        def idx(l, s):
            return (l * tpl + clamp(s - start, 0, count - 1), 0)

        return pl.BlockSpec((rows, cols), idx, memory_space=pltpu.VMEM)

    kv_spec = pl.BlockSpec(
        (chunk, dd), lambda l, s: (l * na + clamp(s - a0, 0, na - 1), 0),
        memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),     # offset
        pl.BlockSpec(memory_space=pltpu.SMEM),     # slot r
        pl.BlockSpec((1, dd), lambda l, s: (0, 0),
                     memory_space=pltpu.VMEM),     # h0
        pl.BlockSpec((1, dd), lambda l, s: (0, 0),
                     memory_space=pltpu.VMEM),     # cos flat
        pl.BlockSpec((1, dd), lambda l, s: (0, 0),
                     memory_space=pltpu.VMEM),     # sin flat (sign-folded)
        kv_spec, kv_spec,
        wspec(qkv[0], tq, 0, nq), wspec(qkv[1], tq, 0, nq),
        wspec(qkv[2], tq, 0, nq),
        wspec(out[0], to, o0, no), wspec(out[1], to, o0, no),
        wspec(out[2], to, o0, no),
        # gate tiles advance over [g0, g0+ng), value tiles (rows offset by
        # `hidden` in the same fused weight) over [g0+ng, g0+2ng)
        wspec(glu[0], tg, g0, 2 * ng), wspec(glu[1], tg, g0, 2 * ng),
        wspec(glu[2], tg, g0, 2 * ng),
        wspec(lo[0], tl, l0, nl), wspec(lo[1], tl, l0, nl),
        wspec(lo[2], tl, l0, nl),
        pl.BlockSpec((1, 1, dd), lambda l, s: (l, 0, 0),
                     memory_space=pltpu.VMEM),     # n1
        pl.BlockSpec((1, 1, dd), lambda l, s: (l, 0, 0),
                     memory_space=pltpu.VMEM),     # n2
    ]
    kv_out_spec = pl.BlockSpec((1, 1, dd), lambda l, s: (l, 0, 0),
                               memory_space=pltpu.VMEM)
    cos, sin = cos_sin
    # flat per-lane rope tables: interleaved pairs share an angle; sin is
    # sign-folded (-sin at even lanes) so rope is x*cos + pairswap(x)*sinm
    cos_f = jnp.tile(jnp.repeat(cos.reshape(1, hd // 2), 2, axis=-1).
                     reshape(1, hd), (1, heads)).astype(jnp.float32)
    sin_h = jnp.tile(jnp.repeat(sin.reshape(1, hd // 2), 2, axis=-1).
                     reshape(1, hd), (1, heads)).astype(jnp.float32)
    sgn = jnp.where(jnp.arange(dd) % 2 == 0, -1.0, 1.0)[None, :]
    sin_m = sin_h * sgn

    grid = (nlayers, nstages)
    h_out, k_new, v_new = pl.pallas_call(
        functools.partial(
            _temporal_kernel, dd=dd, heads=heads, hidden=hidden, cap=cap,
            context=context, nlayers=nlayers),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, dd), lambda l, s: (0, 0),
                         memory_space=pltpu.VMEM),
            kv_out_spec, kv_out_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, dd), jnp.float32),
            jax.ShapeDtypeStruct((nlayers, 1, dd), k_cache.dtype),
            jax.ShapeDtypeStruct((nlayers, 1, dd), v_cache.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, dd), jnp.float32),          # h
            pltpu.VMEM((1, dd), jnp.float32),          # xn
            pltpu.VMEM((1, dd // QK), jnp.float32),    # xs
            pltpu.VMEM((1, dd), jnp.float32),          # q
            pltpu.VMEM((1, dd), jnp.float32),          # k
            pltpu.VMEM((1, dd), jnp.float32),          # v
            pltpu.VMEM((1, heads), jnp.float32),       # m
            pltpu.VMEM((1, heads), jnp.float32),       # l
            pltpu.VMEM((1, dd), jnp.float32),          # acc
            pltpu.VMEM((1, dd), jnp.float32),          # o (proj accum)
            pltpu.VMEM((1, hidden), jnp.float32),      # gate
            pltpu.VMEM((1, hidden), jnp.float32),      # hv
            pltpu.VMEM((1, hidden // QK), jnp.float32),  # hv block sums
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024),
        interpret=interpret,
    )(offset.reshape(1).astype(jnp.int32),
      (offset % cap).reshape(1).astype(jnp.int32),
      h.astype(jnp.float32), cos_f, sin_m,
      k_cache.reshape(nlayers * cap_pad, dd),
      v_cache.reshape(nlayers * cap_pad, dd),
      *qkv, *out, *glu, *lo,
      weights["n1"].reshape(nlayers, 1, dd).astype(jnp.float32),
      weights["n2"].reshape(nlayers, 1, dd).astype(jnp.float32))
    return h_out, k_new, v_new
