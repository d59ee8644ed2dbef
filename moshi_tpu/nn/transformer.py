"""Streaming transformer layer & stack.

Behavioral parity with /root/reference/src/moshi/modules/transformer.h
(layer :910-1039, stack :1139-1215, prebuilt-graph trio :1217-1329):
pre-norm (rms or layer norm) -> self-attn (+layer_scale) -> optional
cross-attn -> gating-or-gelu FFN (+layer_scale), with the attention
bias/rope shared across layers (here: computed once inside the jitted
stack and fused by XLA).

TPU design: all layers of a stack are homogeneous, so per-layer params and
KV state carry a leading L axis and the stack body is a single
`lax.scan` — one compiled layer program regardless of depth, with
quantized (QuantTensor) leaves scanning natively.  The reference's
prebuilt-graph + input-slot idiom maps to jitting the caller.
"""

from __future__ import annotations

from dataclasses import dataclass
import jax
import jax.numpy as jnp

from moshi_tpu.nn.attention import (MHAConfig, cross_attention_kv, cross_mha,
                                    init_kv_state, init_mha_params,
                                    streaming_mha)
from moshi_tpu.nn.gating import gating_mlp, mlp_gelu
from moshi_tpu.nn.layers import (apply_norm, init_layer_norm, init_linear,
                                 init_rms_norm, layer_scale)


@dataclass(frozen=True)
class TransformerConfig:
    dim: int
    num_heads: int
    num_layers: int
    hidden_dim: int                    # FFN hidden (gating: per-half)
    context: int
    capacity: int = 0                  # 0 -> context
    causal: bool = True
    norm: str = "rms_norm_f32"         # or "layer_norm"
    gating: str = "silu"               # "" -> linear1/linear2 gelu FFN
    use_layer_scale: bool = False
    rope_max_period: float = 10_000.0  # 0 -> no positional embedding
    cross_attention: bool = False
    norm_cross: str = "layer_norm"     # cross-attn pre-norm (lm_default.h:34)
    bias_proj: bool = False            # attention projection biases
    bias_ffn: bool = False             # FFN biases (torch Linear default)
    kv_dtype: str = "bfloat16"         # KV ring storage: bfloat16 | float8_e4m3fn
                                       # (fp8 halves KV memory -> 2x sessions/chip)

    @property
    def mha(self) -> MHAConfig:
        import jax.numpy as _jnp
        return MHAConfig(
            dim=self.dim, num_heads=self.num_heads, context=self.context,
            capacity=self.capacity, causal=self.causal,
            rope_max_period=self.rope_max_period, bias_proj=self.bias_proj,
            kv_dtype=_jnp.dtype(self.kv_dtype))


def _init_norm(cfg: TransformerConfig, dtype):
    if cfg.norm.startswith("rms_norm"):
        return init_rms_norm(cfg.dim, dtype)
    return init_layer_norm(cfg.dim, dtype)


def init_layer_params(key, cfg: TransformerConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    p = {
        "norm1": _init_norm(cfg, dtype),
        "self_attn": init_mha_params(ks[0], cfg.mha, dtype),
        "norm2": _init_norm(cfg, dtype),
    }
    if cfg.gating:
        from moshi_tpu.nn.gating import init_gating
        p["gating"] = init_gating(ks[1], cfg.dim, cfg.hidden_dim, dtype)
    else:
        p["linear1"] = init_linear(ks[1], cfg.dim, cfg.hidden_dim,
                                   bias=cfg.bias_ffn, dtype=dtype)
        p["linear2"] = init_linear(ks[2], cfg.hidden_dim, cfg.dim,
                                   bias=cfg.bias_ffn, dtype=dtype)
    if cfg.use_layer_scale:
        p["layer_scale_1"] = {"scale": jnp.full((cfg.dim,), 0.01, dtype)}
        p["layer_scale_2"] = {"scale": jnp.full((cfg.dim,), 0.01, dtype)}
    if cfg.cross_attention:
        p["norm_cross"] = (init_rms_norm(cfg.dim, dtype)
                           if cfg.norm_cross.startswith("rms_norm")
                           else init_layer_norm(cfg.dim, dtype))
        p["cross_attention"] = init_mha_params(ks[3], cfg.mha, dtype)
    return p


def init_transformer_params(key, cfg: TransformerConfig, dtype=jnp.float32):
    keys = jax.random.split(key, cfg.num_layers)
    layers = [init_layer_params(k, cfg, dtype) for k in keys]
    return {"layers": jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)}


def init_transformer_state(cfg: TransformerConfig, batch: int,
                           flat: bool = False):
    """KV state for the stack.  flat=True allocates the temporal-megakernel
    layout: [L, cap_pad, dim] head-major rings (B=1 only; cap padded to
    the kernel's chunk multiple, ring arithmetic still uses cap)."""
    if flat:
        assert batch == 1
        from moshi_tpu.nn.pallas_temporal import plan_stages
        cap_pad = plan_stages(cfg.dim, cfg.hidden_dim, cfg.mha.cap)[5]
        shape = (cfg.num_layers, cap_pad, cfg.dim)
        dt = jnp.dtype(cfg.kv_dtype)
        return {"k": jnp.zeros(shape, dt), "v": jnp.zeros(shape, dt)}
    kv = init_kv_state(cfg.mha, batch)
    return {
        "k": jnp.stack([kv["k"]] * cfg.num_layers),
        "v": jnp.stack([kv["v"]] * cfg.num_layers),
    }


def can_use_temporal_megakernel(cfg: TransformerConfig, params,
                                batch: int) -> bool:
    """Whole-stack megakernel preconditions (nn/pallas_temporal.py):
    pallas on, B=1, rope + rms norms + silu gating, no cross-attn /
    layer-scale / biases, all four projections q4_k QuantTensors."""
    import os
    from moshi_tpu.quant.formats import QuantTensor, pallas_enabled
    # OPT-IN only: the hardware A/B (BENCH_NOTES.md) measured the
    # whole-stack megakernel at 93 ms/frame vs 42 ms for the layer scan
    # over per-op pallas kernels — single-step lookahead block prefetch
    # cannot hide the weight streaming that XLA's async pipeline overlaps
    # across ops.  Kept for re-evaluation on other toolchain versions.
    if os.environ.get("MOSHI_TPU_MEGAKERNEL", "") not in ("temporal", "all"):
        return False
    if not (pallas_enabled() and batch == 1):
        return False
    if cfg.cross_attention or cfg.use_layer_scale:
        return False
    if not cfg.norm.startswith("rms_norm") or cfg.gating != "silu":
        return False
    if not cfg.rope_max_period or (cfg.dim // cfg.num_heads) % 2:
        return False
    lay = params["layers"]
    if "gating" not in lay:
        return False
    for lf in (lay["self_attn"]["in_proj"], lay["self_attn"]["out_proj"],
               lay["gating"]["linear_in"], lay["gating"]["linear_out"]):
        w = lf.get("weight")
        if not (isinstance(w, QuantTensor) and w.fmt == "q4_k"):
            return False
        if "bias" in lf:
            return False
    return True


def _forward_megakernel(cfg: TransformerConfig, params, state, x, offset):
    """Dispatch the whole stack to the single-launch temporal megakernel
    (state is the flat [L, cap_pad, dim] layout).  The kernel attends the
    current token from registers and returns per-layer k/v rows; the ring
    write is ONE dynamic_update_slice across all layers (same slot)."""
    from moshi_tpu.nn.pallas_temporal import temporal_full_step
    from moshi_tpu.nn.rope import rope_angles
    lay = params["layers"]
    pos = offset.astype(jnp.int32)[0]
    cos, sin = rope_angles(pos[None], cfg.mha.head_dim, cfg.rope_max_period)
    weights = {
        "qkv": lay["self_attn"]["in_proj"]["weight"],
        "out": lay["self_attn"]["out_proj"]["weight"],
        "glu": lay["gating"]["linear_in"]["weight"],
        "lout": lay["gating"]["linear_out"]["weight"],
        "n1": lay["norm1"]["alpha"],
        "n2": lay["norm2"]["alpha"],
    }
    h_out, k_new, v_new = temporal_full_step(
        x[:, 0], state["k"], state["v"], pos, (cos, sin), weights,
        cap=cfg.mha.cap, context=cfg.context, heads=cfg.num_heads,
        hidden=cfg.hidden_dim, nlayers=cfg.num_layers)
    slot = (pos % cfg.mha.cap).astype(jnp.int32)
    zero = jnp.int32(0)
    kc = jax.lax.dynamic_update_slice(
        state["k"], k_new.astype(state["k"].dtype), (zero, slot, zero))
    vc = jax.lax.dynamic_update_slice(
        state["v"], v_new.astype(state["v"].dtype), (zero, slot, zero))
    return h_out[:, None].astype(x.dtype), {"k": kc, "v": vc}


def can_use_stacked_decode(cfg: TransformerConfig, params, x,
                           cross_kv) -> bool:
    """Copy-free decode path preconditions: pallas on, T=1, rms norms +
    silu gating, no cross-attention / layer-scale / projection biases,
    all four projections QuantTensors in a pallas-supported layout, and a
    ring capacity the stacked attention kernel can tile exactly."""
    import os
    from moshi_tpu.quant.formats import (QuantTensor, pallas_enabled,
                                         pallas_layout_ok)
    if os.environ.get("MOSHI_TPU_NO_STACKED"):
        return False
    if not pallas_enabled() or x.shape[1] != 1 or cross_kv is not None:
        return False
    if cfg.cross_attention or cfg.use_layer_scale:
        return False
    if not cfg.norm.startswith("rms_norm") or cfg.gating != "silu":
        return False
    lay = params["layers"]
    if "gating" not in lay:
        return False
    from moshi_tpu.nn.pallas_attention import _chunk_for
    c = _chunk_for(cfg.mha.cap)
    if c < 8 and c != cfg.mha.cap:
        return False
    from moshi_tpu.quant.pallas_matmul import storage_ok
    for lf in (lay["self_attn"]["in_proj"], lay["self_attn"]["out_proj"],
               lay["gating"]["linear_in"], lay["gating"]["linear_out"]):
        w = lf.get("weight")
        if not (isinstance(w, QuantTensor) and pallas_layout_ok(w)):
            return False
        if not storage_ok(w, x.shape[0]):
            return False  # i8 storage is int8-MXU-only (B=1 decode)
        if "bias" in lf:
            return False
    return True


def _forward_stacked_decode(cfg: TransformerConfig, params, state, x,
                            offset, tp_axis=None, tap=None):
    """Copy-free layer scan: the body passes the WHOLE stacked weight /
    ring buffers (loop invariants — never sliced) into scalar-prefetch
    pallas kernels indexed by the layer number, and the ring write
    collapses to one stacked dynamic_update_slice after the scan (all
    layers share the slot offset % cap).  Round-1's scan-over-xs layout
    dynamic-sliced ~116 MB of weights + ~49 MB of KV per 7B layer per
    frame into copies — 3.5x the matmul time (BENCH_NOTES.md probe2)."""
    from moshi_tpu.nn.attention import attn_shared
    from moshi_tpu.nn.pallas_attention import decode_attention_stacked
    from moshi_tpu.nn.rope import apply_rope
    from moshi_tpu.quant.pallas_matmul import (glu_matmul_pallas_stacked,
                                               qmatmul_pallas_stacked)
    lay = params["layers"]
    b, _, d = x.shape
    hd = cfg.mha.head_dim
    in_w = lay["self_attn"]["in_proj"]["weight"]
    # under tensor parallelism (tp_axis set, called inside shard_map) the
    # projections are head-sharded: the local head count falls out of the
    # local fused-qkv row count, and the out/ffn projections psum
    dl = in_w.q.shape[-2] // 3
    h = dl // hd
    out_w = lay["self_attn"]["out_proj"]["weight"]
    glu_w = lay["gating"]["linear_in"]["weight"]
    lout_w = lay["gating"]["linear_out"]["weight"]
    n1 = lay["norm1"]["alpha"]
    n2 = lay["norm2"]["alpha"]
    shared = attn_shared(cfg.mha, offset, 1)
    cos_sin = shared["cos_sin"]
    k_stack, v_stack = state["k"], state["v"]

    # mid-grain fusion (opt-in, VERDICT r4 item 1): out_proj + residual
    # + norm2 + GLU as ONE kernel — only on the single-row int8-MXU
    # path, not while a trace recorder is active (replay needs the
    # intermediate taps; `tap` itself is always a string in production,
    # capture() is a pass-through until a recorder turns on) and un-TP'd
    # (the psum must land between out_proj and the residual)
    from moshi_tpu.quant.pallas_fused import can_fuse_mid, fuse_mid_enabled
    from moshi_tpu.quant.pallas_matmul import _int8_dispatch
    from moshi_tpu.utils.capture import recording_active
    fuse_mid = (not recording_active() and tp_axis is None
                and fuse_mid_enabled()
                and _int8_dispatch(out_w, b) and _int8_dispatch(glu_w, b)
                and can_fuse_mid(out_w, glu_w, b))

    if tap:
        from moshi_tpu.utils.capture import capture
        # snapshot the PRE-update rings + offset once per frame so
        # replay_ops can re-execute decode attention from recorded state
        # (replay.h:332-385 re-executes attention ops the same way)
        k_stack = capture(f"{tap}/ring_k", k_stack)
        v_stack = capture(f"{tap}/ring_v", v_stack)
        offset = capture(f"{tap}/offset", offset)

    def body(hcur, l):
        if tap:  # per-op taps for replay-style localization (replay.h)
            hcur = capture(f"{tap}/x_in", hcur)
        qkv = qmatmul_pallas_stacked(hcur, in_w, l, alpha=n1)  # [B,3dl]
        if tap:
            qkv = capture(f"{tap}/qkv", qkv)
        if cos_sin is not None:
            qk = qkv[:, : 2 * dl].reshape(b, 1, 2 * h, hd)
            qk = apply_rope(qk, cos_sin=cos_sin)
            q, k_new = qk[:, 0, :h], qk[:, 0, h:]
        else:
            q = qkv[:, :dl].reshape(b, h, hd)
            k_new = qkv[:, dl:2 * dl].reshape(b, h, hd)
        v_new = qkv[:, 2 * dl:].reshape(b, h, hd)
        attn = decode_attention_stacked(
            q.astype(jnp.bfloat16), k_stack, v_stack,
            k_new.astype(jnp.bfloat16), v_new.astype(jnp.bfloat16),
            offset, l, cap=cfg.mha.cap, context=cfg.context)
        attn = attn.reshape(b, dl).astype(jnp.bfloat16)
        if tap:
            attn = capture(f"{tap}/attn_ctx", attn)
        if fuse_mid:
            from moshi_tpu.quant.pallas_fused import attn_ffn_fused_i8
            g, h_mid = attn_ffn_fused_i8(attn, hcur, out_w, glu_w, n2, l)
            ffn = qmatmul_pallas_stacked(g.astype(jnp.bfloat16), lout_w, l)
            hcur = (h_mid + ffn).astype(hcur.dtype)
            return hcur, (k_new.astype(k_stack.dtype),
                          v_new.astype(v_stack.dtype))
        o = qmatmul_pallas_stacked(attn, out_w, l)
        if tp_axis is not None:
            o = jax.lax.psum(o, tp_axis)
        if tap:
            o = capture(f"{tap}/attn_out", o)
        hcur = hcur + o.astype(hcur.dtype)
        if tap:
            hcur = capture(f"{tap}/ffn_in", hcur)
        g = glu_matmul_pallas_stacked(hcur, glu_w, l, alpha=n2)
        if g is None:  # unsupported GLU layout: two-call fallback
            gh = qmatmul_pallas_stacked(hcur, glu_w, l, alpha=n2)
            gate, value = jnp.split(gh, 2, axis=-1)
            g = jax.nn.silu(gate) * value
        if tap:
            g = capture(f"{tap}/glu_out", g)
        ffn = qmatmul_pallas_stacked(g.astype(jnp.bfloat16), lout_w, l)
        if tp_axis is not None:
            ffn = jax.lax.psum(ffn, tp_axis)
        hcur = hcur + ffn.astype(hcur.dtype)
        if tap:
            hcur = capture(f"{tap}/layer_out", hcur)
        return hcur, (k_new.astype(k_stack.dtype),
                      v_new.astype(v_stack.dtype))

    y, (ks, vs) = jax.lax.scan(
        body, x[:, 0], jnp.arange(cfg.num_layers, dtype=jnp.int32),
        unroll=SCAN_UNROLL)
    slot = (offset % cfg.mha.cap).astype(jnp.int32)
    # aliased in-place slot write (nn/pallas_ring.py): XLA-level DUS /
    # scatter updates double-buffer the ring (one extra k+v ring pair
    # of HLO temps + a full ring COPY per frame — ~2.9 GB/frame hidden
    # HBM traffic on the 7B, the entire B=4 OOM); the pallas write
    # moves only the touched [L, 1, 1, H, hd] blocks
    from moshi_tpu.nn.pallas_ring import ring_write_stacked
    kc, vc = ring_write_stacked(k_stack, v_stack, ks, vs, slot)
    return y[:, None], {"k": kc, "v": vc}


def transformer_layer(cfg: TransformerConfig, params, kv_state, x, offset,
                      cross_kv=None, shared=None, tap=None):
    """One layer: x [B, T, D] -> (y, new_kv_state).  With rms norms the
    pre-norms fuse into the following projection kernels (the norm math
    is identical either way — quant/formats.qmatmul).  `tap` prefixes
    per-layer capture points (appended once per scan iteration)."""
    from moshi_tpu.utils.capture import capture
    fuse_rms = cfg.norm.startswith("rms_norm")
    if fuse_rms:
        attn, new_kv = streaming_mha(
            cfg.mha, params["self_attn"], kv_state, x, offset,
            shared=shared, pre_norm_alpha=params["norm1"]["alpha"])
    else:
        h = apply_norm(cfg.norm, params["norm1"], x)
        attn, new_kv = streaming_mha(cfg.mha, params["self_attn"],
                                     kv_state, h, offset, shared=shared)
    if cfg.use_layer_scale:
        attn = layer_scale(params["layer_scale_1"], attn)
    if tap:
        attn = capture(f"{tap}/attn_out", attn)
    x = x + attn
    if cfg.cross_attention and cross_kv is not None:
        hc = apply_norm(cfg.norm_cross, params["norm_cross"], x)
        x = x + cross_mha(cfg.mha, params["cross_attention"], hc, cross_kv)
    if cfg.gating and fuse_rms:
        ffn = gating_mlp(params["gating"], x, cfg.gating,
                         pre_norm_alpha=params["norm2"]["alpha"])
    else:
        h2 = apply_norm(cfg.norm, params["norm2"], x)
        ffn = gating_mlp(params["gating"], h2, cfg.gating) if cfg.gating             else mlp_gelu(params, h2)
    if cfg.use_layer_scale:
        ffn = layer_scale(params["layer_scale_2"], ffn)
    if tap:
        ffn = capture(f"{tap}/ffn_out", ffn)
    return x + ffn, new_kv


# layer-scan unroll factor: >1 trades compile time for fewer sequential
# loop iterations (set via set_scan_unroll; perf experiments showed XLA
# loop overhead can dominate B=1 decode on some runtimes).  Unrolling
# also turns the per-iteration dynamic-slice of stacked weights into
# static slices XLA can prefetch ahead of each kernel.
import os as _os

SCAN_UNROLL = max(int(_os.environ.get("MOSHI_TPU_SCAN_UNROLL", "1")), 1)


def set_scan_unroll(n: int):
    global SCAN_UNROLL
    SCAN_UNROLL = max(int(n), 1)


def transformer_forward(cfg: TransformerConfig, params, state, x, offset,
                        cross_kv=None, tap=None):
    """Run the full stack via lax.scan over stacked layer params.

    x: [B, T, D]; offset: [B] (position of x[:, 0] in the stream).
    cross_kv: optional {k, v: [L, B, S, H, hd]} per-layer cross K/V.
    Returns (y, new_state)."""
    if state["k"].ndim == 3:       # flat megakernel layout [L, cap_pad, D]
        # the megakernel is decode-only: T>1 (prefill) or cross-attention
        # against a flat-layout state must fail loudly, not drop tokens
        if x.shape[1] != 1 or cross_kv is not None:
            raise ValueError(
                "flat megakernel KV layout only supports T=1 decode "
                f"without cross-attention (got T={x.shape[1]}, "
                f"cross_kv={'set' if cross_kv is not None else 'None'})")
        return _forward_megakernel(cfg, params, state, x, offset)
    if can_use_stacked_decode(cfg, params, x, cross_kv):
        from moshi_tpu.parallel.pp import current_pp
        pp = current_pp()
        if pp is not None and pp.matches(cfg):
            # pipeline-parallel stages; the config-identity gate keeps
            # the depformer / mimi stacks in the same jit replicated
            from moshi_tpu.parallel.tp import current_tp
            tp3 = current_tp()
            if tp3 is not None:
                # both scopes on one 3-axis mesh: TP within each stage
                from moshi_tpu.parallel.tp_pp import tp_pp_transformer_decode
                return tp_pp_transformer_decode(cfg, params, state, x,
                                                offset, tp3, pp)
            from moshi_tpu.parallel.pp import pp_transformer_decode
            return pp_transformer_decode(cfg, params, state, x, offset, pp)
        from moshi_tpu.parallel.tp import current_tp
        tp = current_tp()
        if tp is not None:
            from moshi_tpu.parallel.tp import tp_transformer_decode
            return tp_transformer_decode(cfg, params, state, x, offset, tp)
        return _forward_stacked_decode(cfg, params, state, x, offset,
                                       tap=tap)
    else:
        from moshi_tpu.parallel.pp import current_pp
        from moshi_tpu.parallel.tp import current_tp
        from moshi_tpu.quant.formats import QuantTensor, pallas_enabled
        if ((current_tp() is not None
             or (current_pp() is not None and current_pp().matches(cfg)))
                and pallas_enabled() and isinstance(
                params["layers"]["self_attn"]["in_proj"].get("weight"),
                QuantTensor)):
            # under tp_scope/pp_scope a quantized stack MUST take the
            # shard_map path: GSPMD cannot partition the pallas custom
            # calls either, so the fallback would replicate (or break),
            # silently all-gathering tp/pp-sharded layer weights
            raise ValueError(
                "tp_scope/pp_scope is active but this quantized "
                "transformer does not satisfy the stacked-decode "
                "preconditions "
                f"(T={x.shape[1]}, cross={cross_kv is not None})")
    layers = params["layers"]
    kv = {"k": state["k"], "v": state["v"]}
    # rope angles / additive bias / positions computed ONCE per step and
    # closed over by the scan body (shared across layers, like the
    # reference's per-stack attn_bias + rope embedding)
    from moshi_tpu.nn.attention import attn_shared
    shared = attn_shared(cfg.mha, offset, x.shape[1])
    unroll = SCAN_UNROLL
    from moshi_tpu.quant.formats import QuantTensor as _QT
    if (unroll == 1
            and not isinstance(layers["self_attn"]["in_proj"].get("weight"),
                               _QT)):
        # dense (bf16/f32) stacks: lax.scan over weight xs dynamic-
        # slices a FULL per-layer weight copy every frame — for the
        # 1b-class STT that doubles HBM traffic (hardware: 155.5 ->
        # 234.6 fps fully unrolled).  Unroll so the slices are static
        # reads.  Quantized stacks take the scalar-prefetch stacked
        # path and never slice; MOSHI_TPU_SCAN_UNROLL still overrides.
        unroll = cfg.num_layers
    if cross_kv is None:
        def body(h, xs):
            lp, kv_l = xs
            return transformer_layer(cfg, lp, kv_l, h, offset, None,
                                     shared=shared, tap=tap)
        y, new_kv = jax.lax.scan(body, x, (layers, kv), unroll=unroll)
    else:
        def body(h, xs):
            lp, kv_l, ckv = xs
            return transformer_layer(cfg, lp, kv_l, h, offset, ckv,
                                     shared=shared, tap=tap)
        y, new_kv = jax.lax.scan(body, x, (layers, kv, cross_kv),
                                 unroll=unroll)
    return y, new_kv


def transformer_cross_kv(cfg: TransformerConfig, params, cond):
    """Precompute per-layer cross-attention K/V for conditioning [B, S, D]
    (session bring-up; reference transformer.h:343-396 + moshi.cpp:872-886).
    Returns {k, v: [L, B, S, H, hd]}."""
    def per_layer(lp):
        return cross_attention_kv(cfg.mha, lp["cross_attention"], cond)
    return jax.lax.map(per_layer, params["layers"])
