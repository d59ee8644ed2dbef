"""Replay-style divergence localization (the replay.h / replay_ops.h
analog, /root/reference/src/replay.h:332-385).

The reference can re-execute every recorded op individually against a
backend and pinpoint the first op whose output diverges from the golden
bytes.  On TPU the graph belongs to XLA, so the analog works at the tap
level plus per-op re-execution of the swappable compute:

  * ``first_divergence``: walk two traces in recorded EXECUTION order
    (TraceRecorder.order) and name the first tap exceeding tolerance —
    for the stacked layer scan the occurrence index IS the layer, so a
    failure reads "lm/temporal/qkv [layer 7]".
  * ``stacked_layer_ops`` + ``replay_ops``: re-execute each quantized
    projection of the stacked decode path from its RECORDED input
    against a chosen backend (pallas kernels or the XLA-dequant oracle
    — the two "backends" in replay.h's sense) and compare to the
    recorded output.  This isolates kernel-numerics faults from
    state/attention faults: if the XLA oracle reproduces the golden but
    pallas does not, the kernel is the culprit for that exact layer/op.

Deep per-op taps (x_in, qkv, attn_ctx, attn_out, ffn_in, glu_out,
layer_out per layer) are emitted by nn/transformer.py's stacked body
whenever a TraceRecorder is active.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from moshi_tpu.utils.capture import TOL_CPU


def _rel_err(g: np.ndarray, t: np.ndarray) -> float:
    g64 = np.asarray(g, np.float64)
    t64 = np.asarray(t, np.float64)
    denom = max(np.abs(g64).max(), 1e-8)
    return float(np.abs(g64 - t64).max() / denom)


def first_divergence(golden_rec, test_rec, tol: float = TOL_CPU
                     ) -> Optional[Tuple[str, int, float]]:
    """Walk both recorders in golden's execution order; return
    (tap_name, occurrence_index, rel_err) of the FIRST tap exceeding
    `tol`, or None if everything matches.  For taps inside the layer
    scan the occurrence index is the layer number."""
    for name, i in golden_rec.order:
        g = golden_rec.values[name][i]
        tvals = test_rec.values.get(name, [])
        if i >= len(tvals):
            return (name, i, float("inf"))
        t = tvals[i]
        if g.shape != t.shape:
            return (name, i, float("inf"))
        err = _rel_err(g, t)
        if err > tol:
            return (name, i, err)
    return None


# ---------------------------------------------------------------------------
# per-op re-execution of the stacked quantized layer chain
# ---------------------------------------------------------------------------

def qt_layer(qt, layer: int):
    """Slice layer `layer` out of a stacked QuantTensor (leading layer
    axis on every component)."""
    from moshi_tpu.quant.formats import QuantTensor
    return QuantTensor(fmt=qt.fmt, shape=tuple(qt.shape[-2:]),
                       q=qt.q[layer], d=qt.d[layer],
                       sc=None if qt.sc is None else qt.sc[layer],
                       mn=None if qt.mn is None else qt.mn[layer],
                       dmin=None if qt.dmin is None else qt.dmin[layer],
                       es=None if qt.es is None else qt.es[layer],
                       em=None if qt.em is None else qt.em[layer])


def xla_ring_attention(q, ring_k, ring_v, cur_k, cur_v, offset, *,
                       cap: int, context: int):
    """Pure-XLA oracle for one layer's decode ring attention — the
    reference-semantics re-implementation replay needs as its second
    backend (nn/pallas_attention._decode_attn_kernel_stacked's math:
    seed with the current token at position `offset`, then ring slot j
    holds position last - delta, delta = (last - j) mod cap with
    last = offset - 1, valid iff delta < context - 1 and the position
    is >= 0).  q/cur_k/cur_v: [B, H, hd]; ring_k/ring_v:
    [B, cap, H, hd] PRE-update; offset: [B].  Returns [B, H, hd] f32."""
    import jax.numpy as jnp
    b, h, hd = q.shape
    scale = hd ** -0.5
    qf = jnp.asarray(q, jnp.float32)
    s_ring = jnp.einsum("bhd,bjhd->bjh", qf,
                        jnp.asarray(ring_k, jnp.float32)) * scale
    last = jnp.asarray(offset, jnp.int32) - 1
    r = last % cap
    j = jnp.arange(cap, dtype=jnp.int32)
    delta = (r[:, None] - j[None, :]) % cap
    valid = (delta < context - 1) & (last[:, None] - delta >= 0)
    s_ring = jnp.where(valid[:, :, None], s_ring, -1e9)
    s_cur = jnp.sum(qf * jnp.asarray(cur_k, jnp.float32),
                    axis=-1) * scale                        # [B, H]
    s = jnp.concatenate([s_cur[:, None, :], s_ring], axis=1)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=1, keepdims=True)
    vv = jnp.concatenate(
        [jnp.asarray(cur_v, jnp.float32)[:, None],
         jnp.asarray(ring_v, jnp.float32)], axis=1)
    return jnp.einsum("bjh,bjhd->bhd", p, vv)


def stacked_layer_ops(params, trace: Dict[str, List[np.ndarray]],
                      tap: str = "lm/temporal", cfg=None
                      ) -> List[Tuple[str, Callable[[], np.ndarray],
                                      np.ndarray]]:
    """Build the re-executable op list for the stacked temporal decode
    path from a recorded trace: [(op_label, recompute_fn, golden_out)].

    Each recompute_fn re-runs ONE quantized projection from the recorded
    input through `quant.formats.qmatmul` — which dispatches to the
    pallas kernels or the XLA-dequant oracle depending on
    `enable_pallas`, giving the two replay backends.  With `cfg` (the
    temporal TransformerConfig) and the per-frame ring taps
    (ring_k/ring_v/offset, emitted by _forward_stacked_decode), each
    layer also gets an `attn` op re-executed from the RECORDED ring
    state — pallas decode_attention_stacked or the xla_ring_attention
    oracle depending on `enable_pallas` — closing replay.h:332-385's
    every-op granularity for attention."""
    import jax.numpy as jnp
    from moshi_tpu.quant.formats import qmatmul

    if "layers" not in params and "transformer" in params:
        params = params["transformer"]     # accept full LM param trees
    lay = params["layers"]
    in_w = lay["self_attn"]["in_proj"]["weight"]
    out_w = lay["self_attn"]["out_proj"]["weight"]
    glu_w = lay["gating"]["linear_in"]["weight"]
    lout_w = lay["gating"]["linear_out"]["weight"]
    n1 = lay["norm1"]["alpha"]
    n2 = lay["norm2"]["alpha"]
    num_layers = in_w.q.shape[0]

    def need(name):
        key = f"{tap}/{name}"
        if key not in trace or len(trace[key]) < num_layers:
            raise KeyError(
                f"trace lacks per-layer tap {key!r} (record with a "
                f"TraceRecorder active so deep taps are emitted)")
        return trace[key]

    # ops re-execute the LAST recorded frame (its ring state is the
    # most exercised; per-layer taps of that frame are the trailing
    # num_layers occurrences of each tap)
    x_in = need("x_in")[-num_layers:]
    qkv_g = need("qkv")[-num_layers:]
    attn_ctx = need("attn_ctx")[-num_layers:]
    attn_out = need("attn_out")[-num_layers:]
    ffn_in = need("ffn_in")[-num_layers:]
    glu_g = need("glu_out")[-num_layers:]
    layer_out = need("layer_out")[-num_layers:]

    ring_key = f"{tap}/ring_k"
    with_attn = cfg is not None and ring_key in trace
    if with_attn:
        ring_k = trace[ring_key][-1]         # last recorded frame's ring
        ring_v = trace[f"{tap}/ring_v"][-1]
        offset = trace[f"{tap}/offset"][-1]
        hd = cfg.mha.head_dim
        h = ring_k.shape[3]
        b = ring_k.shape[1]

    def mk_attn(l):
        def f():
            import jax
            from moshi_tpu.nn.attention import attn_shared
            from moshi_tpu.nn.rope import apply_rope
            from moshi_tpu.quant.formats import pallas_enabled
            qkv = jnp.asarray(qkv_g[l])                     # [B, 3*dl]
            dl = qkv.shape[-1] // 3
            shared = attn_shared(cfg.mha, jnp.asarray(offset), 1)
            cos_sin = shared["cos_sin"]
            if cos_sin is not None:
                qk = qkv[:, :2 * dl].reshape(b, 1, 2 * h, hd)
                qk = apply_rope(qk, cos_sin=cos_sin)
                q, k_new = qk[:, 0, :h], qk[:, 0, h:]
            else:
                q = qkv[:, :dl].reshape(b, h, hd)
                k_new = qkv[:, dl:2 * dl].reshape(b, h, hd)
            v_new = qkv[:, 2 * dl:].reshape(b, h, hd)
            rk = jnp.asarray(ring_k)
            rv = jnp.asarray(ring_v)
            if pallas_enabled():
                from moshi_tpu.nn.pallas_attention import \
                    decode_attention_stacked
                out = decode_attention_stacked(
                    q.astype(jnp.bfloat16), rk, rv,
                    k_new.astype(rk.dtype), v_new.astype(rv.dtype),
                    jnp.asarray(offset), jnp.int32(l),
                    cap=cfg.mha.cap, context=cfg.context)
            else:
                out = xla_ring_attention(
                    q.astype(jnp.bfloat16).astype(jnp.float32),
                    rk[l], rv[l],
                    k_new.astype(rk.dtype), v_new.astype(rv.dtype),
                    jnp.asarray(offset),
                    cap=cfg.mha.cap, context=cfg.context)
            return np.asarray(out.reshape(b, dl).astype(jnp.bfloat16),
                              np.float32)
        return f

    def mk_qkv(l):
        return lambda: np.asarray(qmatmul(
            jnp.asarray(x_in[l]), qt_layer(in_w, l),
            pre_norm_alpha=n1[l], out_dtype=jnp.float32))

    def mk_o(l):
        return lambda: np.asarray(qmatmul(
            jnp.asarray(attn_ctx[l]), qt_layer(out_w, l),
            out_dtype=jnp.float32))

    def mk_glu(l):
        def f():
            gh = qmatmul(jnp.asarray(ffn_in[l]), qt_layer(glu_w, l),
                         pre_norm_alpha=n2[l], out_dtype=jnp.float32)
            gate, value = jnp.split(gh, 2, axis=-1)
            import jax
            return np.asarray(jax.nn.silu(gate) * value)
        return f

    def mk_ffn(l):
        def f():
            y = qmatmul(jnp.asarray(glu_g[l]).astype(jnp.bfloat16),
                        qt_layer(lout_w, l), out_dtype=jnp.float32)
            return np.asarray(jnp.asarray(ffn_in[l], jnp.float32) + y)
        return f

    ops = []
    for l in range(num_layers):
        ops.append((f"layer{l}/qkv", mk_qkv(l),
                    np.asarray(qkv_g[l], np.float32)))
        if with_attn:
            ops.append((f"layer{l}/attn", mk_attn(l),
                        np.asarray(attn_ctx[l], np.float32)))
        ops.append((f"layer{l}/attn_out(o_proj)", mk_o(l),
                    np.asarray(attn_out[l], np.float32)))
        ops.append((f"layer{l}/glu", mk_glu(l),
                    np.asarray(glu_g[l], np.float32)))
        ops.append((f"layer{l}/ffn+res", mk_ffn(l),
                    np.asarray(layer_out[l], np.float32)))
    return ops


# ---------------------------------------------------------------------------
# per-op re-execution of SEANet streaming convs (encoder or decoder)
# ---------------------------------------------------------------------------

def seanet_ops(net, params, trace: Dict[str, List[np.ndarray]], tap: str
               ) -> List[Tuple[str, Callable[[], np.ndarray], np.ndarray]]:
    """Re-executable op list for a SEANetEncoder/Decoder trace recorded
    with `tap` set: each streaming conv re-runs from its RECORDED input
    and carry state (`{tap}/<mod>:in`, `{tap}/<mod>:prev|partial` taps,
    nn/seanet.py) and compares to the recorded output — op-level
    localization for the conv chain, matching replay_ops.h's per-op
    replay of conv ops (replay.h:332-385)."""
    import jax.numpy as jnp

    ops = []
    for name, m in net.modules.items():
        key_in = f"{tap}/{name}:in"
        if key_in not in trace:
            continue
        state_keys = list(m.init_state(1))
        n_occ = len(trace[key_in])
        for occ in range(n_occ):
            def mk(name=name, m=m, occ=occ, state_keys=state_keys):
                def f():
                    h = jnp.asarray(trace[f"{tap}/{name}:in"][occ])
                    st = {sk: jnp.asarray(trace[f"{tap}/{name}:{sk}"][occ])
                          for sk in state_keys}
                    y, _ = m(params[name], st, h)
                    return np.asarray(y, np.float32)
                return f
            ops.append((f"{name}@{occ}", mk(),
                        np.asarray(trace[f"{tap}/{name}"][occ],
                                   np.float32)))
    return ops


def replay_ops(ops: Sequence[Tuple[str, Callable[[], np.ndarray],
                                   np.ndarray]],
               tol: float = TOL_CPU, stop_at_first: bool = False):
    """Re-execute each recorded op individually and compare to its
    golden output (replay.h:360-385).  Returns (first_fail | None,
    report_lines); first_fail = (op_label, rel_err)."""
    lines = []
    first = None
    for label, fn, golden in ops:
        out = fn()
        if out.shape != golden.shape:
            err = float("inf")
        else:
            err = _rel_err(golden, out)
        status = "OK" if err <= tol else "FAIL"
        lines.append(f"{status} {label}: rel {err:.3e}")
        if status == "FAIL" and first is None:
            first = (label, err)
            if stop_at_first:
                break
    return first, lines
