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


def stacked_layer_ops(params, trace: Dict[str, List[np.ndarray]],
                      tap: str = "lm/temporal"
                      ) -> List[Tuple[str, Callable[[], np.ndarray],
                                      np.ndarray]]:
    """Build the re-executable op list for the stacked temporal decode
    path from a recorded trace: [(op_label, recompute_fn, golden_out)].

    Each recompute_fn re-runs ONE quantized projection from the recorded
    input through `quant.formats.qmatmul` — which dispatches to the
    pallas kernels or the XLA-dequant oracle depending on
    `enable_pallas`, giving the two replay backends.  Attention ops are
    not re-executed (they need ring state); the taps bracket them, so
    `first_divergence` still localizes an attention fault to its layer.
    """
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

    x_in, qkv_g = need("x_in"), need("qkv")
    attn_ctx, attn_out = need("attn_ctx"), need("attn_out")
    ffn_in, glu_g = need("ffn_in"), need("glu_out")

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
        ops.append((f"layer{l}/attn_out(o_proj)", mk_o(l),
                    np.asarray(attn_out[l], np.float32)))
        ops.append((f"layer{l}/glu", mk_glu(l),
                    np.asarray(glu_g[l], np.float32)))
        ops.append((f"layer{l}/ffn+res", mk_ffn(l),
                    np.asarray(trace[f"{tap}/layer_out"][l], np.float32)))
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
