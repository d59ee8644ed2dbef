"""Streaming multi-head attention with a ring KV cache.

Behavioral parity with /root/reference/src/moshi/modules/transformer.h:
  * fixed-capacity bf16 KV ring written by position-indexed scatter
    (the reference's `ggml_set_rows` insert mode, transformer.h:238-249);
  * windowed causal masking equivalent to the reference's precomputed
    bias-pattern LUT (torch.h:162-223) — on TPU the mask is a handful of
    fused iota/compare VPU ops recomputed per step, which XLA folds into
    the softmax for free, so the LUT's motivation (avoiding per-frame
    host mask math in GGML) does not apply; the *positions* math is the
    same arithmetic recovery as transformer.h:251-287;
  * additive bias with a large negative (not -inf), like torch.h:124-152;
  * optional cross-attention against precomputed K/V
    (transformer.h:343-396) — no RoPE, no mask;
  * RoPE on q/k from `offset + arange(T)` (transformer.h:1198-1209).

All shapes carry an explicit batch axis (the reference is hard-coded B=1,
transformer.h:326-328); offsets are per-session [B] so batched sessions at
different stream positions share one jitted program.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from moshi_tpu.nn.layers import linear
from moshi_tpu.nn.rope import apply_rope, rope_angles

NEG_BIAS = -1e9  # applied in f32 pre-softmax (reference uses -1e5 in f16)


@dataclass(frozen=True)
class MHAConfig:
    dim: int
    num_heads: int
    context: int            # attention window
    capacity: int = 0       # ring size; 0 -> context
    causal: bool = True
    rope_max_period: float = 10_000.0  # 0 -> no rope
    bias_proj: bool = False  # in/out projection biases (torch MHA style)
    kv_dtype: jnp.dtype = jnp.bfloat16

    @property
    def cap(self) -> int:
        return self.capacity or self.context

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads


def init_mha_params(key, cfg: MHAConfig, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    scale = cfg.dim ** -0.5
    p = {
        "in_proj": {"weight": jax.random.normal(k1, (3 * cfg.dim, cfg.dim), dtype) * scale},
        "out_proj": {"weight": jax.random.normal(k2, (cfg.dim, cfg.dim), dtype) * scale},
    }
    if cfg.bias_proj:
        p["in_proj"]["bias"] = jnp.zeros((3 * cfg.dim,), dtype)
        p["out_proj"]["bias"] = jnp.zeros((cfg.dim,), dtype)
    return p


def init_kv_state(cfg: MHAConfig, batch: int):
    shape = (batch, cfg.cap, cfg.num_heads, cfg.head_dim)
    return {"k": jnp.zeros(shape, cfg.kv_dtype), "v": jnp.zeros(shape, cfg.kv_dtype)}


def ring_insert(cache: jnp.ndarray, values: jnp.ndarray, positions: jnp.ndarray,
                cap: int) -> jnp.ndarray:
    """Write values [B, T, ...] into ring cache [B, cap, ...] at
    positions % cap (per-batch positions [B, T]).

    TPU note: when the T window cannot wrap (T == 1, or all of a
    contiguous T-run lands before the ring edge — guaranteed per step
    since positions are offset+arange(T)), the write is a contiguous
    dynamic_update_slice per batch row rather than a scatter — XLA TPU
    scatters are orders of magnitude slower than DUS.  The general
    wrap-around path falls back to scatter."""
    b, t = values.shape[:2]
    slots = positions % cap
    if t == 1 and cache.ndim == 4:
        from moshi_tpu.quant.formats import pallas_enabled
        if pallas_enabled():
            # aliased in-place slot write (nn/pallas_ring.py): the
            # XLA-level DUS/scatter double-buffers the ring (full copy
            # per frame); the pallas write moves only the touched block
            from moshi_tpu.nn.pallas_ring import ring_write
            return ring_write(cache, values[:, 0], slots[:, 0])
    if b == 1 and t == 1:
        # the decode hot path: one contiguous row write
        return jax.lax.dynamic_update_slice(
            cache, values.astype(cache.dtype),
            (jnp.int32(0), slots[0, 0].astype(jnp.int32))
            + (jnp.int32(0),) * (cache.ndim - 2))
    if t == 1 and b <= 16:
        # batched decode: a per-row DUS chain aliases the donated ring
        # in place; the batched scatter below allocates a full
        # ring-sized HLO temp (the B=4 OOM's 2.79 GB AllocateBuffer)
        out = cache
        tail = (jnp.int32(0),) * (cache.ndim - 2)
        for i in range(b):
            out = jax.lax.dynamic_update_slice(
                out, values[i: i + 1].astype(cache.dtype),
                (jnp.int32(i), slots[i, 0].astype(jnp.int32)) + tail)
        return out
    cap_n = cache.shape[1]
    if t > 1 and t * cap_n <= 1 << 20:
        # multi-position prefill: scatter-free one-hot insert — XLA TPU
        # lowers scatter to a sequential update loop (~ms per ring),
        # while onehot-contract + select are dense vector ops.  Handles
        # arbitrary slot patterns (ring wrap included); later positions
        # win collisions via the reversed argmax trick below.
        j = jnp.arange(cap_n, dtype=jnp.int32)
        # for duplicate slots (t > cap wrap) the LAST write must win:
        # pick, per slot, the largest i with slots[b, i] == j
        hit = slots[:, None, :] == j[None, :, None]        # [B, cap, T]
        order = jnp.arange(t, dtype=jnp.int32)[None, None, :]
        winner = jnp.argmax(jnp.where(hit, order, -1), axis=-1)
        written = jnp.any(hit, axis=-1)                    # [B, cap]
        # contract in f32 (exact: 0/1 multipliers), store in ring dtype
        onehot = (jnp.arange(t, dtype=jnp.int32)[None, None, :]
                  == winner[..., None]).astype(jnp.float32)  # [B,cap,T]
        vflat = values.reshape(b, t, -1).astype(jnp.float32)
        ins = jnp.einsum("bct,btf->bcf", onehot, vflat)
        ins = ins.reshape((b, cap_n) + cache.shape[2:]).astype(cache.dtype)
        mask = written.reshape((b, cap_n) + (1,) * (cache.ndim - 2))
        return jnp.where(mask, ins, cache)
    batch_idx = jnp.arange(b, dtype=slots.dtype)[:, None]
    return cache.at[batch_idx, slots].set(values.astype(cache.dtype))


def ring_key_positions(last: jnp.ndarray, cap: int) -> jnp.ndarray:
    """Absolute position held by each ring slot after writing up to `last`
    (per-batch last [B]): p[j] = last - ((last - j) mod cap).  Slots never
    written resolve to negative positions.  Same arithmetic recovery as
    transformer.h:251-287."""
    j = jnp.arange(cap, dtype=jnp.int32)[None, :]
    lastb = last.astype(jnp.int32)[:, None]
    return lastb - ((lastb - j) % cap)


def streaming_attn_bias(offset: jnp.ndarray, t: int, cap: int, context: int):
    """Additive bias [B, T, cap] in f32: 0 where the key slot is a valid
    (causal, in-window, actually-written) position for the query, NEG_BIAS
    elsewhere.  Pure iota/compare math — XLA fuses it into the softmax."""
    last = offset + (t - 1)
    p = ring_key_positions(last, cap)                      # [B, cap]
    qp = offset.astype(jnp.int32)[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
    pk = p[:, None, :]                                     # [B, 1, cap]
    qpk = qp[:, :, None]                                   # [B, T, 1]
    valid = (pk >= 0) & (pk <= qpk) & (pk > qpk - context)
    return jnp.where(valid, 0.0, NEG_BIAS).astype(jnp.float32)


def build_bias_pattern(cap: int, context: int, t: int = 1) -> jnp.ndarray:
    """Precompute the offset-indexed additive-bias pattern — the
    reference's claimed-novel optimization (README.md:57,
    torch.h:162-223): one [n_offsets, T, cap] table built once per
    transformer; each step takes a shifted view instead of recomputing
    mask math.  After warmup (offset >= cap) the pattern repeats with
    period cap, so rows cover offsets 0 .. 2*cap-1 and step offsets map
    to row `offset if offset < cap else cap + offset % cap`.

    On TPU the computed mask is a handful of fused VPU ops, so the LUT is
    a capability-parity feature (and a win only when `context` math gets
    more complex); both paths are exposed and tested equivalent."""
    offsets = jnp.arange(2 * cap, dtype=jnp.int32)
    def row(off):
        return streaming_attn_bias(off[None], t, cap, context)[0]
    return jax.vmap(row)(offsets)                          # [2cap, T, cap]


def bias_pattern_lookup(pattern: jnp.ndarray, offset: jnp.ndarray,
                        cap: int) -> jnp.ndarray:
    """Per-step view into the pattern: [B] offsets -> [B, T, cap]
    (torch.h:205-223 bias_pattern_index)."""
    idx = jnp.where(offset < cap, offset, cap + offset % cap)
    return pattern[idx]


def attn_shared(cfg: MHAConfig, offset, t: int):
    """Per-step quantities shared by every layer of a stack (the
    reference computes attn_bias + rope embedding once per transformer,
    not per layer: transformer.h:1150-1213): positions, rope cos/sin,
    additive bias.  The bias is skipped when the fused decode-attention
    kernel will run (it computes the mask in-kernel)."""
    from moshi_tpu.quant.formats import pallas_enabled
    positions = offset[:, None] + jnp.arange(t, dtype=jnp.int32)[None, :]
    cos_sin = (rope_angles(positions, cfg.head_dim, cfg.rope_max_period)
               if cfg.rope_max_period else None)
    bias = (None if (t == 1 and pallas_enabled())
            else streaming_attn_bias(offset, t, cfg.cap, cfg.context))
    return {"positions": positions, "cos_sin": cos_sin, "bias": bias}


def streaming_mha(cfg: MHAConfig, params, state, x, offset, shared=None,
                  pre_norm_alpha=None):
    """x: [B, T, D], offset: [B] (position of x[:, 0]).
    Returns (y [B, T, D], new_state).  Caller advances offset by T.
    `shared` (from attn_shared) avoids recomputing rope angles/bias/
    positions in every layer of a stack; `pre_norm_alpha` fuses the
    pre-attention rms norm into the qkv projection."""
    b, t, d = x.shape
    h, hd = cfg.num_heads, cfg.head_dim
    if shared is None:
        shared = attn_shared(cfg, offset, t)
    qkv = linear(params["in_proj"], x,
                 pre_norm_alpha=pre_norm_alpha)            # [B, T, 3D]
    positions = shared["positions"]
    if cfg.rope_max_period:
        # rotate q and k in ONE fused application (2H heads at once)
        qk = qkv[..., : 2 * d].reshape(b, t, 2 * h, hd)
        qk = apply_rope(qk, cos_sin=shared["cos_sin"])
        q, k = qk[:, :, :h], qk[:, :, h:]
    else:
        q = qkv[..., :d].reshape(b, t, h, hd)
        k = qkv[..., d:2 * d].reshape(b, t, h, hd)
    v = qkv[..., 2 * d:].reshape(b, t, h, hd)
    kc = ring_insert(state["k"], k, positions, cfg.cap)
    vc = ring_insert(state["v"], v, positions, cfg.cap)
    from moshi_tpu.quant.formats import pallas_enabled
    if t == 1 and pallas_enabled():
        # fused flash-decode kernel: scores+mask+softmax+AV in one call
        from moshi_tpu.nn.pallas_attention import decode_attention
        out = decode_attention(q[:, 0], kc, vc, offset,
                               cap=cfg.cap, context=cfg.context)
        out = out[:, None]                                 # [B, 1, H, hd]
    else:
        bias = shared["bias"]                              # [B, T, cap]
        scores = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.bfloat16),
                            kc.astype(jnp.bfloat16),
                            preferred_element_type=jnp.float32)
        scores = scores * (hd ** -0.5) + bias[:, None, :, :]
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhts,bshd->bthd", probs.astype(jnp.bfloat16),
                         vc.astype(jnp.bfloat16),
                         preferred_element_type=jnp.float32)
    out = out.reshape(b, t, d).astype(x.dtype)
    y = linear(params["out_proj"], out)
    return y, {"k": kc, "v": vc}


# ---------------------------------------------------------------------------
# cross attention (voice-conditioned TTS models)
# ---------------------------------------------------------------------------

def cross_attention_kv(cfg: MHAConfig, params, cond):
    """Precompute per-layer cross K/V from conditioning [B, S, D] — done
    once per session, like the reference's cache_cross_attention
    (transformer.h:343-396)."""
    b, s, d = cond.shape
    h, hd = cfg.num_heads, cfg.head_dim
    w = params["in_proj"]["weight"]
    # rows [D:3D] of the fused in_proj are the k and v projections
    from moshi_tpu.quant.formats import QuantTensor, dequantize
    if isinstance(w, QuantTensor):
        w = dequantize(w, jnp.bfloat16)
    wk = w[d:2 * d]
    wv = w[2 * d:3 * d]
    k = jnp.einsum("bsd,ed->bse", cond.astype(wk.dtype), wk)
    v = jnp.einsum("bsd,ed->bse", cond.astype(wv.dtype), wv)
    if "bias" in params["in_proj"]:
        bias = params["in_proj"]["bias"]
        k = k + bias[d:2 * d].astype(k.dtype)
        v = v + bias[2 * d:3 * d].astype(v.dtype)
    return {"k": k.reshape(b, s, h, hd).astype(cfg.kv_dtype),
            "v": v.reshape(b, s, h, hd).astype(cfg.kv_dtype)}


def cross_mha(cfg: MHAConfig, params, x, kv):
    """Full (unmasked, un-roped) attention of x [B, T, D] against
    precomputed kv {k,v: [B, S, H, hd]}."""
    b, t, d = x.shape
    h, hd = cfg.num_heads, cfg.head_dim
    w = params["in_proj"]
    q = linear({"weight": w["weight"], **({"bias": w["bias"]} if "bias" in w else {})}, x)
    # only the q rows [0:D] of the fused projection are used for queries
    q = q[..., :d] if q.shape[-1] == 3 * d else q
    q = q.reshape(b, t, h, hd)
    scores = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.bfloat16),
                        kv["k"].astype(jnp.bfloat16),
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", probs.astype(jnp.bfloat16),
                     kv["v"].astype(jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    out = out.reshape(b, t, d).astype(x.dtype)
    return linear(params["out_proj"], out)
