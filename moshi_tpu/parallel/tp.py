"""Explicit tensor parallelism for the quantized pallas path (shard_map).

GSPMD cannot partition pallas custom calls, so the GSPMD annotations in
parallel/sharding.py silently replicate the fused dequant+matmul kernels
under a `model`-sharded mesh (round-1 VERDICT weak #2).  This module
executes the stacked-kernel decode path **explicitly per shard** with
jax.shard_map + psum — the Megatron layout, with the twist that weight
shards of block-quantized tensors must stay self-contained:

  * fused QKV / gating linear_in: rows are re-laid out at shard time so
    contiguous shard s holds [q_s; k_s; v_s] (resp. [gate_s; value_s]) of
    its own heads — a pure row permutation, exact for every quant format
    (formats.qt_take_rows);
  * out_proj / linear_out: column (I-axis) shards are re-packed planar
    within each shard (formats.qt_slice_cols) so the lo/hi nibble pairing
    never crosses a shard boundary — exact when I/S is block-aligned,
    uniform q4_k->q4_0 requantization otherwise (loader.h:162-172 rule);
  * per-codebook linears / text head: contiguous row shards, logits
    all-gathered before sampling;
  * KV rings shard on the head axis, session state on the `data` axis.

Activation flow per layer: x replicated over `model` -> local qkv ->
local ring attention -> column-sharded out_proj partial + psum -> local
GLU -> column-sharded linear_out partial + psum (2 collectives/layer,
riding ICI).

Usage:
    mesh = make_mesh(data=1, model=8)
    tp_params = tp_shard_lm_params(params, cfg, mesh)
    state = shard_tree(state, lm_state_pspecs(state), mesh)
    with tp_scope(mesh):
        out, state = jax.jit(step)(tp_params, state, ...)

The TP context is consulted by nn/transformer.transformer_forward and
models/lm.depformer_generate at trace time (static dispatch).
"""

from __future__ import annotations

import contextlib
import contextvars
import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from moshi_tpu.quant.formats import (QK, QK_K, QuantTensor, dequantize,
                                     qt_slice_cols, qt_take_rows, quantize)

_QT_FIELDS = ("q", "d", "sc", "mn", "dmin", "es", "em")


@dataclasses.dataclass(frozen=True)
class TPContext:
    mesh: Mesh
    model_axis: str = "model"
    data_axis: str = "data"

    @property
    def nshards(self) -> int:
        return self.mesh.shape[self.model_axis]


_TP_CTX: contextvars.ContextVar = contextvars.ContextVar("moshi_tpu_tp",
                                                         default=None)


def current_tp() -> TPContext | None:
    return _TP_CTX.get()


@contextlib.contextmanager
def tp_scope(mesh: Mesh, model_axis: str = "model", data_axis: str = "data"):
    """Enable explicit-TP dispatch for code traced within this scope."""
    tok = _TP_CTX.set(TPContext(mesh, model_axis, data_axis))
    try:
        yield
    finally:
        _TP_CTX.reset(tok)


# ---------------------------------------------------------------------------
# shard-time weight layout
# ---------------------------------------------------------------------------


def _interleave_perm(total_rows: int, nsplit: int, s: int) -> np.ndarray:
    """Row permutation so contiguous shard i of a fused [nsplit*D, ...]
    weight holds [split0_i; split1_i; ...; splitN_i]."""
    d = total_rows // nsplit
    per = d // s
    idx = []
    for i in range(s):
        for j in range(nsplit):
            start = j * d + i * per
            idx.extend(range(start, start + per))
    return np.asarray(idx)


def _tp_cols(qt: QuantTensor, s: int) -> QuantTensor:
    """Column-shard layout: each I/s-wide block is a self-contained
    planar-packed shard.  Exact when block-aligned; uniform same-bitwidth
    requantization otherwise."""
    i = qt.shape[1]
    w = i // s
    if qt.fmt != "q8_0" and w < 2 * QK:
        # planar 4-bit kernels pair element e with e + I/2, so the local
        # scale blocks split lo/hi — shards narrower than 2*QK leave an
        # empty half (q4_0 d_lo would be zero-width)
        raise ValueError(
            f"TP column shard width {w} too narrow for 4-bit planar "
            f"kernels (need >= {2 * QK}); use fewer model shards")
    block = QK_K if qt.fmt == "q4_k" else QK
    if w % block == 0:
        slices = [qt_slice_cols(qt, k * w, (k + 1) * w) for k in range(s)]
        qcat = jnp.concatenate([sl.q for sl in slices], axis=-1)
        # scales are untouched by the repack: blocks don't cross shards
        return QuantTensor(qt.fmt, qt.shape, qcat, qt.d, qt.sc, qt.mn,
                           qt.dmin, qt.es, qt.em)
    if w % QK:
        raise ValueError(f"TP column shard width {w} not a {QK} multiple")
    fmt = "q4_0" if qt.fmt == "q4_k" else qt.fmt
    deq = np.asarray(dequantize(qt, jnp.float32))
    lead = deq.shape[:-2]
    o = deq.shape[-2]
    flat = deq.reshape((-1, o, i))
    n = flat.shape[0]
    shards = []
    for k in range(s):
        qts = [quantize(np.ascontiguousarray(flat[j, :, k * w:(k + 1) * w]),
                        fmt) for j in range(n)]
        shards.append(jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *qts) if n > 1 else qts[0])

    def cat(field):
        arrs = [getattr(p, field) for p in shards]
        if arrs[0] is None:
            return None
        ax = arrs[0].ndim + (-2 if field in ("sc", "mn") else -1)
        c = jnp.concatenate(arrs, axis=ax)
        return c.reshape(lead + c.shape[1:]) if lead and n > 1 else c
    return QuantTensor(fmt, qt.shape, cat("q"), cat("d"), cat("sc"),
                       cat("mn"), cat("dmin"), cat("es"), cat("em"))


def _mode_for(path: str) -> str:
    if "in_proj" in path:
        return "fused3"
    if "linear_in" in path:
        return "fused2"
    if "out_proj" in path or "linear_out" in path:
        return "col"
    if "text_linear" in path or "linears" in path:
        return "row"
    return "repl"


def _component_spec(mode: str, field: str, ndim: int) -> P:
    parts = [None] * ndim
    if mode == "repl":
        return P(*parts)
    if mode == "col":
        ax = ndim + (-2 if field in ("sc", "mn") else -1)
    else:  # row / fused*: shard the O axis
        ax = ndim + (-3 if field in ("sc", "mn") else -2)
    parts[ax] = "model"
    return P(*parts)


def _qt_spec_tree(qt: QuantTensor, mode: str) -> QuantTensor:
    def f(field):
        a = getattr(qt, field)
        return None if a is None else _component_spec(mode, field, a.ndim)
    return QuantTensor(qt.fmt, qt.shape, f("q"), f("d"), f("sc"), f("mn"),
                       f("dmin"), f("es"), f("em"))


def tp_specs(tree) -> dict:
    """shard_map spec pytree for a (sub)tree of LM params laid out by
    tp_shard_lm_params (paths decide row/col/fused/replicated)."""
    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, f"{path}.{k}") for k, v in node.items()}
        if isinstance(node, QuantTensor):
            return _qt_spec_tree(node, _mode_for(path))
        nd = getattr(node, "ndim", 0)
        return P(*([None] * nd))
    return walk(tree, "")


def _pad_gating_pair(lin_in: QuantTensor, lin_out: QuantTensor, s: int):
    """Zero-pad a (linear_in [2H, D], linear_out [O, H]) gating pair so
    H/s is a planar-shardable width (multiple of QK, >= 2*QK).

    Mathematically exact: the padded gate/value channels are all-zero,
    so silu(0)*0 contributes nothing, and linear_out's matching padded
    columns are zero.  Needed for e.g. the 7B depformer FFN (hidden
    4224: 4224/8 = 528 is not a 32-multiple — caught by the
    flagship-geometry dryrun)."""
    h = lin_out.shape[1]
    w = h // s
    if w % QK == 0 and w >= 2 * QK and h % s == 0:
        return lin_in, lin_out            # already shardable
    w_pad = max(2 * QK, ((h + s - 1) // s + QK - 1) // QK * QK)
    h_pad = w_pad * s

    def requant(deq, fmt):
        i = deq.shape[-1]
        f = fmt if i % (QK_K if fmt == "q4_k" else QK) == 0 else "q4_0"
        lead = deq.shape[:-2]
        if not lead:
            return quantize(deq, f)
        flat = deq.reshape((-1,) + deq.shape[-2:])
        qts = [quantize(np.ascontiguousarray(flat[j]), f)
               for j in range(flat.shape[0])]
        st = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *qts)
        return st

    # linear_in: pad gate block and value block each from H to H_pad rows
    din = np.asarray(dequantize(lin_in, jnp.float32))
    gate, value = din[..., :h, :], din[..., h:2 * h, :]
    zrow = np.zeros(din.shape[:-2] + (h_pad - h, din.shape[-1]), din.dtype)
    din_p = np.concatenate([gate, zrow, value, zrow], axis=-2)
    # linear_out: pad columns from H to H_pad
    dout = np.asarray(dequantize(lin_out, jnp.float32))
    zcol = np.zeros(dout.shape[:-1] + (h_pad - h,), dout.dtype)
    dout_p = np.concatenate([dout, zcol], axis=-1)
    return requant(din_p, lin_in.fmt), requant(dout_p, lin_out.fmt)


def tp_shard_lm_params(params, cfg, mesh: Mesh):
    """Transform + device_put an LM param tree into the TP layout."""
    s = mesh.shape["model"]

    def put(arr, spec):
        return jax.device_put(arr, NamedSharding(mesh, spec))

    def put_qt(qt, mode):
        def f(field):
            a = getattr(qt, field)
            if a is None:
                return None
            return put(a, _component_spec(mode, field, a.ndim))
        return QuantTensor(qt.fmt, qt.shape, f("q"), f("d"), f("sc"),
                           f("mn"), f("dmin"), f("es"), f("em"))

    def walk(node, path):
        if isinstance(node, dict):
            if ("linear_in" in node and "linear_out" in node
                    and isinstance(node["linear_in"].get("weight"),
                                   QuantTensor)
                    and isinstance(node["linear_out"].get("weight"),
                                   QuantTensor)):
                li, lo = _pad_gating_pair(node["linear_in"]["weight"],
                                          node["linear_out"]["weight"], s)
                node = dict(node)
                node["linear_in"] = dict(node["linear_in"], weight=li)
                node["linear_out"] = dict(node["linear_out"], weight=lo)
            return {k: walk(v, f"{path}.{k}") for k, v in node.items()}
        if isinstance(node, QuantTensor):
            mode = _mode_for(path)
            qt = node
            if mode == "fused3":
                qt = qt_take_rows(qt, _interleave_perm(qt.q.shape[-2], 3, s))
            elif mode == "fused2":
                qt = qt_take_rows(qt, _interleave_perm(qt.q.shape[-2], 2, s))
            elif mode == "col":
                qt = _tp_cols(qt, s)
            return put_qt(qt, mode)
        nd = getattr(node, "ndim", 0)
        return put(node, P(*([None] * nd)))

    return walk(params, "")


# ---------------------------------------------------------------------------
# shard_map'ed step functions
# ---------------------------------------------------------------------------

_KV_SPEC = P(None, "data", None, "model", None)   # [L, B, cap, H, hd]


def tp_transformer_decode(cfg, params, state, x, offset, tp: TPContext):
    """shard_map wrapper around nn/transformer._forward_stacked_decode:
    weights head/column-sharded over `model`, sessions over `data`,
    two psums per layer."""
    from moshi_tpu.nn.transformer import _forward_stacked_decode
    p_specs = tp_specs(params)
    s_specs = {"k": _KV_SPEC, "v": _KV_SPEC}
    x_spec = P("data", None, None)
    off_spec = P("data")

    fn = partial(_forward_stacked_decode, cfg, tp_axis=tp.model_axis)

    def body(p, st, xx, off):
        return fn(p, st, xx, off)

    return jax.shard_map(
        body, mesh=tp.mesh,
        in_specs=(p_specs, s_specs, x_spec, off_spec),
        out_specs=(x_spec, s_specs),
        check_vma=False,
    )(params, state, x, offset)


def tp_depformer_generate(cfg, norms, text_emb, transformer_out, text_token,
                          keys, step_w, temp, top_k, tp: TPContext):
    """shard_map wrapper around models/lm._depformer_generate_stacked."""
    from moshi_tpu.models.lm import _depformer_generate_stacked
    w_specs = tp_specs(step_w)
    n_specs = tp_specs(norms)

    def body(n, te, to, tt, ks, w):
        return _depformer_generate_stacked(
            cfg, n, te, to, tt, ks, w, temp, top_k, tp_axis=tp.model_axis)

    return jax.shard_map(
        body, mesh=tp.mesh,
        in_specs=(n_specs, P("data", None), P("data", None), P("data"),
                  P(None), w_specs),
        out_specs=P("data", None),
        check_vma=False,
    )(norms, text_emb, transformer_out, text_token, keys, step_w)


def tp_row_logits(x, qt: QuantTensor, tp: TPContext):
    """x [B, T, D] (data-sharded) @ row-sharded head [O, D] -> gathered
    logits [B, T, O] (pallas kernel per shard + tiled all_gather)."""
    from moshi_tpu.quant.formats import qmatmul
    w_spec = _qt_spec_tree(qt, "row")

    def body(xl, wq):
        y = qmatmul(xl, wq, out_dtype=jnp.float32)
        return jax.lax.all_gather(y, tp.model_axis, axis=-1, tiled=True)

    return jax.shard_map(
        body, mesh=tp.mesh,
        in_specs=(P("data", None, None), w_spec),
        out_specs=P("data", None, None),
        check_vma=False,
    )(x, qt)
