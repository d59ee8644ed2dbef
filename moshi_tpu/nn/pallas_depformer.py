"""Whole-layer depformer megakernel (q4_k, B=1-optimised).

One Pallas program computes an ENTIRE depformer layer step:
    rms1-> qkv proj -> ring write -> causal attention over <=8 steps
    -> out proj -> +residual -> rms2 -> GLU gating -> linear_out
    -> +residual
with the tiny per-layer KV cache aliased in-place.  The depformer's per
layer weights (q4_k packed) fit VMEM entirely (~10 MB), so there is no
grid: 6 sequential layer-steps become 6 kernel launches instead of ~60
XLA ops — on this runtime XLA op dispatch (~20-70 us/op at B=1) dominates
the depformer's 36 ms share of the frame (BENCH_NOTES.md).

Head handling without reshapes (Mosaic rejects sub-lane reshapes): with
head_dim-sized blocks, per-head scores are block-sums of k*q
( _block_sums-style iota contraction) and the probability-weighted value
sum expands p back over head blocks with the scale-expansion contraction
— the whole attention is flat [S, dd] arithmetic.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from moshi_tpu.utils.pallas_mode import with_interpret_default

from moshi_tpu.quant.formats import QK, QuantTensor
from moshi_tpu.quant.pallas_matmul import (_block_sums_mxu,
                                           _expand_block_scales,
                                           _maybe_norm, _q4_0_dot,
                                           _q4k_dot, _silu)

NEG = -1e9


def _expand_heads(p, block: int):
    """[S, H] -> [S, H*block]: inverse companion of _block_sums_mxu."""
    return _expand_block_scales(p, block)


def _dep_layer_kernel(cb_ref, h_ref, k_ref, v_ref,
                      qkv_q, qkv_es, qkv_em,
                      out_q, out_es, out_em,
                      glu_q, glu_es, glu_em,
                      lo_q, lo_es, lo_em,
                      n1_ref, n2_ref,
                      h_out, k_out, v_out,
                      *, dd, heads, cap):
    hd = dd // heads
    cb = cb_ref[0]
    h = h_ref[:].astype(jnp.float32)                     # [1, dd]

    # --- qkv projection with fused rms norm1 -------------------------
    xn = _maybe_norm(h_ref, n1_ref)
    xs = _block_sums_mxu(xn, QK)
    qkv = _q4k_dot(xn.astype(jnp.bfloat16), xs, qkv_q, qkv_es, qkv_em)
    q = qkv[:, :dd]                                      # [1, dd] f32
    k_new = qkv[:, dd:2 * dd]
    v_new = qkv[:, 2 * dd:]

    # --- ring write (cap >= dep_q so slot == cb, no wrap) -------------
    # full-tile select instead of a dynamic-sublane store: Mosaic cannot
    # prove a dynamic sublane index tile-aligned ("index in dimension 0
    # is a multiple of 8") and refuses the vector_store
    rows = jax.lax.broadcasted_iota(jnp.int32, (cap, dd), 0)
    k_out[:] = jnp.where(rows == cb, k_new.astype(k_out.dtype), k_ref[:])
    v_out[:] = jnp.where(rows == cb, v_new.astype(v_out.dtype), v_ref[:])

    # --- causal attention over steps 0..cb ---------------------------
    kc = k_out[:].astype(jnp.bfloat16)                   # [cap, dd]
    vc = v_out[:].astype(jnp.bfloat16)
    qb = q.astype(jnp.bfloat16)
    s = _block_sums_mxu((kc * qb).astype(jnp.float32), hd)   # [cap, H]
    s = s * (hd ** -0.5)
    j = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    s = jnp.where(j <= cb, s, NEG)
    m = jnp.max(s, axis=0, keepdims=True)                # [1, H]
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=0, keepdims=True)
    p = p / l
    p_exp = _expand_heads(p, hd).astype(jnp.bfloat16)    # [cap, dd]
    attn = jnp.sum((p_exp * vc).astype(jnp.float32), axis=0,
                   keepdims=True)                        # [1, dd]

    # --- out projection + residual -----------------------------------
    a_bf = attn.astype(jnp.bfloat16)
    a_xs = _block_sums_mxu(attn, QK)
    h2 = h + _q4k_dot(a_bf, a_xs, out_q, out_es, out_em)

    # --- GLU FFN with fused rms norm2 + residual ---------------------
    ms = jnp.mean(h2 * h2, axis=-1, keepdims=True)
    hn = h2 * jax.lax.rsqrt(ms + 1e-8) * n2_ref[:].astype(jnp.float32)
    hn_xs = _block_sums_mxu(hn, QK)
    hn_bf = hn.astype(jnp.bfloat16)
    half = glu_q.shape[0] // 2
    # load once, slice as arrays (avoids sliced-ref indexing limits)
    glu_q_a = glu_q[:]
    glu_es_a = glu_es[:]
    glu_em_a = glu_em[:]
    g = _q4k_dot(hn_bf, hn_xs, glu_q_a[:half], glu_es_a[:half],
                 glu_em_a[:half])
    v_ff = _q4k_dot(hn_bf, hn_xs, glu_q_a[half:], glu_es_a[half:],
                    glu_em_a[half:])
    hv = (_silu(g) * v_ff)
    hv_bf = hv.astype(jnp.bfloat16)
    hv_xs = _block_sums_mxu(hv, QK)
    y = _q4k_dot(hv_bf, hv_xs, lo_q, lo_es, lo_em)
    h_out[:] = (h2 + y).astype(h_out.dtype)


@with_interpret_default
@functools.partial(jax.jit, static_argnames=("cap", "heads", "interpret"))
def dep_layer_step(h, k_cache, v_cache, cb, weights, *, cap: int,
                   heads: int, interpret: bool = False):
    """One depformer layer step in a single kernel.

    h: [1, dd] f32; k/v_cache: [cap, dd] (flat head-major);
    cb: scalar i32 step index; weights: dict with q4_k QuantTensors
    `qkv`, `out`, `glu` (fused linear_in), `lout` and f32 `n1`, `n2`.
    Returns (h_new [1, dd], k_cache', v_cache')."""
    dd = h.shape[-1]

    def qt3(w):
        qt = w.with_eff_scales()
        return qt.q, qt.es, qt.em

    qkv = qt3(weights["qkv"])
    out = qt3(weights["out"])
    glu = qt3(weights["glu"])
    lo = qt3(weights["lout"])
    specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + \
        [pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 + 12 + 2)
    h_new, k_new, v_new = pl.pallas_call(
        functools.partial(_dep_layer_kernel, dd=dd, heads=heads, cap=cap),
        in_specs=specs,
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_shape=[
            jax.ShapeDtypeStruct((1, dd), jnp.float32),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(cb.reshape(1), h.astype(jnp.float32), k_cache, v_cache,
      *qkv, *out, *glu, *lo,
      weights["n1"].reshape(1, dd).astype(jnp.float32),
      weights["n2"].reshape(1, dd).astype(jnp.float32))
    return h_new, k_new, v_new


def _dep_step_kernel(cb_ref, h_ref, k_ref, v_ref,
                     qkv_q, qkv_es, qkv_em,
                     out_q, out_es, out_em,
                     glu_q, glu_es, glu_em,
                     lo_q, lo_es, lo_em,
                     n1_ref, n2_ref,
                     h_out, k_out, v_out,
                     h_scr,
                     *, dd, heads, cap, nlayers, lout_fmt="q4_k"):
    """Grid=(L,): one grid step per depformer layer; the hidden state is
    carried across layers in VMEM scratch, so a whole depformer STEP is a
    single kernel launch."""
    li = pl.program_id(0)
    hd = dd // heads
    cb = cb_ref[0]

    @pl.when(li == 0)
    def _load():
        h_scr[:] = h_ref[:].astype(jnp.float32)

    h = h_scr[:]                                          # [1, dd] f32

    # qkv with fused rms norm1
    ms = jnp.mean(h * h, axis=-1, keepdims=True)
    xn = h * jax.lax.rsqrt(ms + 1e-8) * n1_ref[:].astype(jnp.float32)
    xs = _block_sums_mxu(xn, QK)
    qkv = _q4k_dot(xn.astype(jnp.bfloat16), xs, qkv_q, qkv_es, qkv_em)
    q = qkv[:, :dd]
    k_new = qkv[:, dd:2 * dd]
    v_new = qkv[:, 2 * dd:]

    rows = jax.lax.broadcasted_iota(jnp.int32, (cap, dd), 0)
    k_out[:] = jnp.where(rows == cb, k_new.astype(k_out.dtype), k_ref[:])
    v_out[:] = jnp.where(rows == cb, v_new.astype(v_out.dtype), v_ref[:])

    kc = k_out[:].astype(jnp.bfloat16)
    vc = v_out[:].astype(jnp.bfloat16)
    s = _block_sums_mxu((kc * q.astype(jnp.bfloat16)).astype(jnp.float32),
                        hd) * (hd ** -0.5)
    j = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    s = jnp.where(j <= cb, s, NEG)
    m = jnp.max(s, axis=0, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=0, keepdims=True)
    p_exp = _expand_heads(p, hd).astype(jnp.bfloat16)
    attn = jnp.sum((p_exp * vc).astype(jnp.float32), axis=0, keepdims=True)

    a_xs = _block_sums_mxu(attn, QK)
    h2 = h + _q4k_dot(attn.astype(jnp.bfloat16), a_xs, out_q, out_es,
                      out_em)

    ms2 = jnp.mean(h2 * h2, axis=-1, keepdims=True)
    hn = h2 * jax.lax.rsqrt(ms2 + 1e-8) * n2_ref[:].astype(jnp.float32)
    hn_xs = _block_sums_mxu(hn, QK)
    hn_bf = hn.astype(jnp.bfloat16)
    half = glu_q.shape[0] // 2
    glu_q_a = glu_q[:]
    glu_es_a = glu_es[:]
    glu_em_a = glu_em[:]
    g = _q4k_dot(hn_bf, hn_xs, glu_q_a[:half], glu_es_a[:half],
                 glu_em_a[:half])
    v_ff = _q4k_dot(hn_bf, hn_xs, glu_q_a[half:], glu_es_a[half:],
                    glu_em_a[half:])
    hv = _silu(g) * v_ff
    if lout_fmt == "q4_k":
        hv_xs = _block_sums_mxu(hv, QK)
        y = _q4k_dot(hv.astype(jnp.bfloat16), hv_xs, lo_q, lo_es, lo_em)
    else:  # q4_0 (linear_out K=4224 is not a 256 multiple on 7B)
        y = _q4_0_dot(hv.astype(jnp.bfloat16), lo_q, lo_es)
    h_scr[:] = h2 + y

    @pl.when(li == nlayers - 1)
    def _store():
        h_out[:] = h_scr[:]


@with_interpret_default
@functools.partial(jax.jit, static_argnames=("cap", "heads", "nlayers",
                                             "interpret"))
def dep_full_step(h, k_cache, v_cache, cb, weights, *, cap: int,
                  heads: int, nlayers: int, interpret: bool = False):
    """ALL depformer layers of one step in a single kernel launch.

    h: [1, dd]; k/v_cache: [L, cap, dd]; weights: dict of STACKED [L, ...]
    q4_k QuantTensors (qkv/out/glu/lout) + alphas n1/n2 [L, dd].
    Returns (h_new [1, dd], k_cache', v_cache')."""
    dd = h.shape[-1]

    def qt3(w):
        # flattened [L*O, c] components: Mosaic rejects multi-dim block
        # views whose lane dim is not a 128-multiple (es/em are O x K/32),
        # while 2-D blocks with full-array lane dims are the proven
        # qmatmul layout
        qt = w.with_eff_scales()
        return tuple(a.reshape((-1,) + a.shape[2:])
                     for a in (qt.q, qt.es, qt.em))

    qkv = qt3(weights["qkv"])
    out = qt3(weights["out"])
    glu = qt3(weights["glu"])
    lout_fmt = weights["lout"].fmt
    if lout_fmt == "q4_k":
        lo = qt3(weights["lout"])
    else:  # q4_0: (q, d, d-dup to keep arity)
        lq = weights["lout"].q
        ld = weights["lout"].d
        lo = tuple(a.reshape((-1,) + a.shape[2:]) for a in (lq, ld, ld))

    def wspec(arr):
        rows = arr.shape[0] // nlayers
        return pl.BlockSpec((rows, arr.shape[1]), lambda l: (l, 0),
                            memory_space=pltpu.VMEM)

    w_arrays = [*qkv, *out, *glu, *lo]
    w_specs = [wspec(a) for a in w_arrays]
    # norms as [L, 1, dd]: a (1, dd) block of an [L, dd] array violates
    # the Mosaic block rule (second-minor block dim must divide 8 or
    # equal the array dim)
    norms = [weights["n1"].reshape(-1, 1, dd).astype(jnp.float32),
             weights["n2"].reshape(-1, 1, dd).astype(jnp.float32)]
    norm_specs = [pl.BlockSpec((1, 1, dd), lambda l: (l, 0, 0),
                               memory_space=pltpu.VMEM)] * 2
    kv_spec = pl.BlockSpec((cap, dd), lambda l: (l, 0),
                           memory_space=pltpu.VMEM)
    h_new, k_new, v_new = pl.pallas_call(
        functools.partial(_squeeze_lead(_dep_step_kernel), dd=dd,
                          heads=heads, cap=cap, nlayers=nlayers,
                          lout_fmt=lout_fmt),
        grid=(nlayers,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, dd), lambda l: (0, 0),
                               memory_space=pltpu.VMEM),
                  kv_spec, kv_spec] + w_specs + norm_specs,
        out_specs=[pl.BlockSpec((1, dd), lambda l: (0, 0),
                                memory_space=pltpu.VMEM),
                   kv_spec, kv_spec],
        out_shape=[
            jax.ShapeDtypeStruct((1, dd), jnp.float32),
            jax.ShapeDtypeStruct((nlayers * cap, dd), k_cache.dtype),
            jax.ShapeDtypeStruct((nlayers * cap, dd), v_cache.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((1, dd), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(cb.reshape(1), h.astype(jnp.float32),
      k_cache.reshape(nlayers * cap, dd),
      v_cache.reshape(nlayers * cap, dd), *w_arrays, *norms)
    return (h_new, k_new.reshape(k_cache.shape),
            v_new.reshape(v_cache.shape))


# ---------------------------------------------------------------------------
# whole-FRAME depformer kernel: all dep_q steps x all layers + logits +
# sampling in ONE launch
# ---------------------------------------------------------------------------

BIG_I32 = 2 ** 30


def _argmax_lane(v):
    """First-index argmax over [1, V] (jnp.argmax semantics)."""
    m = jnp.max(v)
    iota = jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
    return jnp.min(jnp.where(v == m, iota, BIG_I32))


def _topk_threshold(v, k: int, iters: int = 30):
    """Value-domain binary search for (approximately exactly) the k-th
    largest of [1, V]: returns thr with count(v >= thr) >= k, converged to
    float precision — the in-kernel analog of lax.top_k's cutoff."""
    lo = jnp.min(v)
    hi = jnp.max(v)
    for _ in range(iters):
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((v >= mid).astype(jnp.float32))
        take = cnt >= k
        lo = jnp.where(take, mid, lo)
        hi = jnp.where(take, hi, mid)
    return lo


def _dep_layer_body(cb, k_scr, v_scr,
                    qkv_q, qkv_es, qkv_em, out_q, out_es, out_em,
                    glu_q, glu_es, glu_em, lo_q, lo_es, lo_em,
                    n1_ref, n2_ref, h_scr, *, dd, heads, cap, lout_fmt):
    """One depformer layer on h_scr with the KV ring in VMEM scratch
    (same math as _dep_step_kernel, rings never touch HBM)."""
    hd = dd // heads
    h = h_scr[:]
    ms = jnp.mean(h * h, axis=-1, keepdims=True)
    xn = h * jax.lax.rsqrt(ms + 1e-8) * n1_ref[:].astype(jnp.float32)
    xs = _block_sums_mxu(xn, QK)
    qkv = _q4k_dot(xn.astype(jnp.bfloat16), xs, qkv_q, qkv_es, qkv_em)
    q = qkv[:, :dd]
    k_new = qkv[:, dd:2 * dd]
    v_new = qkv[:, 2 * dd:]

    rows = jax.lax.broadcasted_iota(jnp.int32, (cap, dd), 0)
    kc = jnp.where(rows == cb, k_new, k_scr[:].astype(jnp.float32))
    vc = jnp.where(rows == cb, v_new, v_scr[:].astype(jnp.float32))
    k_scr[:] = kc.astype(k_scr.dtype)
    v_scr[:] = vc.astype(v_scr.dtype)

    kb = kc.astype(jnp.bfloat16)
    vb = vc.astype(jnp.bfloat16)
    s = _block_sums_mxu((kb * q.astype(jnp.bfloat16)).astype(jnp.float32),
                        hd) * (hd ** -0.5)
    j = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    s = jnp.where(j <= cb, s, NEG)
    m = jnp.max(s, axis=0, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=0, keepdims=True)
    p_exp = _expand_heads(p, hd).astype(jnp.bfloat16)
    attn = jnp.sum((p_exp * vb).astype(jnp.float32), axis=0, keepdims=True)

    a_xs = _block_sums_mxu(attn, QK)
    h2 = h + _q4k_dot(attn.astype(jnp.bfloat16), a_xs, out_q, out_es,
                      out_em)

    ms2 = jnp.mean(h2 * h2, axis=-1, keepdims=True)
    hn = h2 * jax.lax.rsqrt(ms2 + 1e-8) * n2_ref[:].astype(jnp.float32)
    hn_xs = _block_sums_mxu(hn, QK)
    hn_bf = hn.astype(jnp.bfloat16)
    half = glu_q.shape[0] // 2
    glu_q_a = glu_q[:]
    glu_es_a = glu_es[:]
    glu_em_a = glu_em[:]
    g = _q4k_dot(hn_bf, hn_xs, glu_q_a[:half], glu_es_a[:half],
                 glu_em_a[:half])
    v_ff = _q4k_dot(hn_bf, hn_xs, glu_q_a[half:], glu_es_a[half:],
                    glu_em_a[half:])
    hv = _silu(g) * v_ff
    if lout_fmt == "q4_k":
        hv_xs = _block_sums_mxu(hv, QK)
        y = _q4k_dot(hv.astype(jnp.bfloat16), hv_xs, lo_q, lo_es, lo_em)
    else:
        y = _q4_0_dot(hv.astype(jnp.bfloat16), lo_q, lo_es)
    h_scr[:] = h2 + y


def _dep_frame_kernel(h_in_ref, text_ref, emb_ref, lr_ref,
                      qkv_q, qkv_es, qkv_em,
                      out_q, out_es, out_em,
                      glu_q, glu_es, glu_em,
                      lo_q, lo_es, lo_em,
                      n1_ref, n2_ref,
                      lin_q, lin_es, lin_em,
                      noise_ref,
                      tok_out,
                      h_scr, k_scr, v_scr, prev_scr,
                      *, dd, heads, cap, nlayers, card, temp, top_k,
                      lout_fmt):
    s = pl.program_id(0)      # depformer step (codebook)
    st = pl.program_id(1)     # stage: layer index, or nlayers = head

    # ---- step entry: token embedding + h init -------------------------
    @pl.when(st == 0)
    def _enter():
        @pl.when(s == 0)
        def _zero():
            k_scr[:] = jnp.zeros_like(k_scr)
            v_scr[:] = jnp.zeros_like(v_scr)
        prev = prev_scr[0]
        cols = jax.lax.broadcasted_iota(jnp.int32,
                                        (1, emb_ref.shape[1]), 1)
        onehot = (cols == prev).astype(jnp.float32)
        e = jax.lax.dot_general(onehot, emb_ref[0].astype(jnp.float32),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        audio = jax.lax.dot_general(e, lr_ref[0].astype(jnp.float32),
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        tok_emb = jnp.where(s == 0, text_ref[:].astype(jnp.float32), audio)
        h_scr[:] = h_in_ref[0].astype(jnp.float32) + tok_emb

    # ---- layers (ring in scratch, static unroll for scratch indexing) --
    for l in range(nlayers):
        @pl.when(st == l)
        def _layer(l=l):
            _dep_layer_body(
                s, k_scr.at[l], v_scr.at[l],
                qkv_q, qkv_es, qkv_em,
                out_q, out_es, out_em,
                glu_q, glu_es, glu_em,
                lo_q, lo_es, lo_em,
                n1_ref.at[0], n2_ref.at[0], h_scr,
                dd=dd, heads=heads, cap=cap, lout_fmt=lout_fmt)

    # ---- head: logits + sampling ---------------------------------------
    @pl.when(st == nlayers)
    def _head():
        y = h_scr[:]
        ys = _block_sums_mxu(y, QK)
        logits = _q4k_dot(y.astype(jnp.bfloat16), ys,
                          lin_q, lin_es, lin_em)
        if temp == 0.0:
            token = _argmax_lane(logits)
        else:
            scaled = logits * (1.0 / temp)
            k = min(int(top_k), card) if top_k > 0 else card
            thr = _topk_threshold(scaled, k)
            masked = jnp.where(scaled >= thr,
                               scaled + noise_ref[0].astype(jnp.float32),
                               NEG)
            token = _argmax_lane(masked)
        prev_scr[0] = token
        tok_out[0] = jnp.zeros_like(tok_out[0]) + token


@with_interpret_default
@functools.partial(jax.jit, static_argnames=(
    "cap", "heads", "nlayers", "card", "temp", "top_k", "interpret"))
def dep_frame_step(h_in_all, text_emb, weights, noise, *, cap: int,
                   heads: int, nlayers: int, card: int, temp: float,
                   top_k: int, interpret: bool = False):
    """ALL depformer steps of one frame in a single kernel launch.

    Replaces the reference's per-frame unrolled depformer graph + host
    token loop (/root/reference/src/moshi/models/lm.h:478-553) with one
    Pallas program: grid (dep_q, layers+1); KV rings live only in VMEM
    scratch; the per-step token is sampled IN-KERNEL (greedy argmax, or
    temperature + exact top-k threshold by value-domain binary search +
    Gumbel-max with host-precomputed noise) and fed to the next step's
    embedding via SMEM — zero host or XLA round-trips between codebooks.

    h_in_all: [dep_q, 1, dd] precomputed per-step depformer_in @
    transformer_out (token-independent, so batched outside in one call);
    text_emb: [1, dd]; noise: [dep_q, 1, card] Gumbel noise (ignored at
    temp=0); weights: per-step stacked trees — qkv/out/glu/lout
    [dep_q, L, ...] QuantTensors, n1/n2 [L, dd], emb [dep_q, card+1, lr]
    (row 0 a dummy pad), lr_w [dep_q, dd, lr], linears [dep_q, card, dd]
    q4_k.  Returns sampled tokens [dep_q] int32."""
    dep_q, _, dd = h_in_all.shape

    def qt3(w, lead):
        # flatten [lead..., O, c] quant components to 2-D [prod*O, c]
        # (Mosaic lane-alignment: see dep_full_step)
        qt = w.with_eff_scales()
        return tuple(a.reshape((-1,) + a.shape[len(lead) + 1:])
                     for a in (qt.q, qt.es, qt.em))

    two = (dep_q, nlayers)
    qkv = qt3(weights["qkv"], two)
    out = qt3(weights["out"], two)
    glu = qt3(weights["glu"], two)
    lout_fmt = weights["lout"].fmt
    if lout_fmt == "q4_k":
        lo = qt3(weights["lout"], two)
    else:
        lq = weights["lout"].q
        ld = weights["lout"].d
        lo = tuple(a.reshape((-1,) + a.shape[3:]) for a in (lq, ld, ld))
    lin = qt3(weights["linears"], (dep_q,))

    def wspec4(arr):
        # flattened [W*L*O, c]: row-block per (step, layer)
        rows = arr.shape[0] // (dep_q * nlayers)
        return pl.BlockSpec(
            (rows, arr.shape[1]),
            lambda s, st: (s * nlayers + jnp.clip(st, 0, nlayers - 1), 0),
            memory_space=pltpu.VMEM)

    def sspec(arr):
        shape = (1,) + arr.shape[1:]
        return pl.BlockSpec(shape,
                            lambda s, st, nd=len(arr.shape):
                            (s,) + (0,) * (nd - 1),
                            memory_space=pltpu.VMEM)

    def linspec(arr):
        # flattened [W*card, c]: row-block per step
        rows = arr.shape[0] // dep_q
        return pl.BlockSpec((rows, arr.shape[1]),
                            lambda s, st: (s, 0),
                            memory_space=pltpu.VMEM)

    def lspec(arr):
        shape = (1,) + arr.shape[1:]
        return pl.BlockSpec(shape,
                            lambda s, st, nd=len(arr.shape):
                            (jnp.clip(st, 0, nlayers - 1),)
                            + (0,) * (nd - 1),
                            memory_space=pltpu.VMEM)

    w4 = [*qkv, *out, *glu, *lo]
    n1 = weights["n1"].reshape(nlayers, 1, dd).astype(jnp.float32)
    n2 = weights["n2"].reshape(nlayers, 1, dd).astype(jnp.float32)
    emb = weights["emb"].astype(jnp.float32)           # [dep_q, card+1, lr]
    lr_w = weights["lr_w"].astype(jnp.float32)         # [dep_q, dd, lr]

    in_specs = ([sspec(h_in_all),
                 pl.BlockSpec((1, dd), lambda s, st: (0, 0),
                              memory_space=pltpu.VMEM),
                 sspec(emb), sspec(lr_w)]
                + [wspec4(a) for a in w4]
                + [lspec(n1), lspec(n2)]
                + [linspec(a) for a in lin]
                + [sspec(noise)])
    tokens = pl.pallas_call(
        functools.partial(_dep_frame_kernel, dd=dd, heads=heads, cap=cap,
                          nlayers=nlayers, card=card, temp=temp,
                          top_k=top_k, lout_fmt=lout_fmt),
        grid=(dep_q, nlayers + 1),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, 128), lambda s, st: (s, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((dep_q, 1, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((1, dd), jnp.float32),                  # h
            pltpu.VMEM((nlayers, cap, dd), jnp.bfloat16),      # k rings
            pltpu.VMEM((nlayers, cap, dd), jnp.bfloat16),      # v rings
            pltpu.SMEM((1,), jnp.int32),                       # prev token
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(h_in_all.astype(jnp.float32), text_emb.astype(jnp.float32),
      emb, lr_w, *w4, n1, n2, *lin, noise.astype(jnp.float32))
    return tokens[:, 0, 0]


def _squeeze_lead(kernel):
    """Adapt the per-layer kernel's argument order: weight/kv blocks are
    already 2-D (flattened [L*O, c] operands); norms keep a squeezable
    [1, 1, dd] block."""
    def wrapped(cb_ref, h_ref, k_ref, v_ref, *rest, **kw):
        *w_refs, n1_ref, n2_ref, h_out, k_out, v_out, h_scr = rest
        kernel(cb_ref, h_ref, k_ref, v_ref, *w_refs,
               n1_ref.at[0], n2_ref.at[0], h_out, k_out, v_out,
               h_scr, **kw)
    return wrapped
