"""Pipeline parallelism: layer-stage sharding of a stacked transformer.

The reference has no parallelism at all (SURVEY.md §2.7); §2.7/§7.1 name
pipeline stages as the natural optional split ("temporal-transformer vs
depformer vs mimi-decoder ... already run as 3 separate graphs per
frame").  This module implements the finer-grained, TPU-native variant:
the temporal transformer's stacked layers [L, ...] are sharded over a
``pp`` mesh axis (S stages of L/S layers each, contiguous), and the
session batch is split into S microbatches that flow through the stages
GPipe-style inside one jitted step:

  phase p (0..2S-2): stage s processes microbatch m = p - s, then
  ppermutes its activation to stage s+1 over ICI.  Stage 0 injects
  x[m] at phase m; stage S-1 emits y[m] at phase m+S-1; the outputs
  are combined with one psum (only the last stage contributes).

Each stage holds the KV rings of its own layers for ALL sessions
([L/S, B, cap, H, hd] local), so ring state never moves between devices
— only the [Bm, D] activation does (2(S-1) ppermutes + 1 psum per
frame, riding ICI).

Within one call the fill/drain schedule busies each stage for S of the
2S-1 phases (utilization S/(2S-1)); a production serving loop would
software-pipeline across frames by carrying the in-flight activations
in state.  PP composes with session parallelism (mesh ("data", "pp")):
the batch first splits over ``data``, then each data-shard's sessions
split into the S microbatches.

Scope: decode (T=1) on the quantized stacked-kernel path — the same
surface explicit TP covers (parallel/tp.py).  Dispatch is gated on the
stack's full TransformerConfig (PPContext.matches) so the depformer /
mimi transformers inside the same jit stay replicated.

Usage:
    mesh = make_pp_mesh(pp=4)                  # or (data=2, pp=2)
    params = pp_shard_lm_params(params, cfg, mesh)
    state = pp_shard_lm_state(state, mesh)
    with pp_scope(mesh, cfg.transformer):
        out, state = jax.jit(step)(params, state, ...)
"""

from __future__ import annotations

import contextlib
import contextvars
import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from moshi_tpu.quant.formats import QuantTensor

_QT_FIELDS = ("q", "d", "sc", "mn", "dmin", "es", "em")


@dataclasses.dataclass(frozen=True)
class PPContext:
    mesh: Mesh
    num_layers: int               # stack size this scope applies to
    pp_axis: str = "pp"
    data_axis: str = "data"
    # Full TransformerConfig identifying the pipelined stack.  Dispatch
    # on the bare layer count is a footgun: another transformer traced
    # inside the same pp_scope jit with a coincidentally equal depth
    # (e.g. a mimi stack configured to the temporal depth) would be
    # routed into pp_transformer_decode with replicated params.
    stack_cfg: object = None

    @property
    def nstages(self) -> int:
        return self.mesh.shape[self.pp_axis]

    def matches(self, cfg) -> bool:
        """Is `cfg` the transformer stack this scope pipelines?"""
        if self.stack_cfg is not None:
            return cfg == self.stack_cfg
        return cfg.num_layers == self.num_layers


_PP_CTX: contextvars.ContextVar = contextvars.ContextVar("moshi_tpu_pp",
                                                         default=None)


def current_pp() -> Optional[PPContext]:
    return _PP_CTX.get()


@contextlib.contextmanager
def pp_scope(mesh: Mesh, stack, pp_axis: str = "pp",
             data_axis: str = "data"):
    """Enable pipeline-parallel dispatch for one transformer stack.

    `stack` should be the stack's TransformerConfig (dispatch then
    requires full config equality).  A bare int `num_layers` is
    accepted for backward compatibility, with the documented constraint
    that no OTHER transformer of the same depth may be traced inside
    this scope's jit."""
    if isinstance(stack, int):
        ctx = PPContext(mesh, stack, pp_axis, data_axis)
    else:
        ctx = PPContext(mesh, stack.num_layers, pp_axis, data_axis,
                        stack_cfg=stack)
    tok = _PP_CTX.set(ctx)
    try:
        yield
    finally:
        _PP_CTX.reset(tok)


def make_pp_mesh(pp: int, data: int = 1,
                 devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = data * pp
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(data, pp)
    return Mesh(arr, axis_names=("data", "pp"))


# ---------------------------------------------------------------------------
# sharding: stacked-layer leaves split on the leading L axis
# ---------------------------------------------------------------------------


def _stack_spec(ndim: int, pp_axis: str) -> P:
    return P(*((pp_axis,) + (None,) * (ndim - 1)))


def pp_layer_specs(layers, pp_axis: str = "pp"):
    """Spec pytree for a stacked `layers` subtree: every leaf (array or
    QuantTensor component) carries the layer stack as its LEADING axis."""
    def leaf(a):
        if isinstance(a, QuantTensor):
            comps = {f: (None if getattr(a, f) is None
                         else _stack_spec(getattr(a, f).ndim, pp_axis))
                     for f in _QT_FIELDS}
            return QuantTensor(a.fmt, a.shape, comps["q"], comps["d"],
                               comps["sc"], comps["mn"], comps["dmin"],
                               comps["es"], comps["em"])
        return _stack_spec(a.ndim, pp_axis)
    return jax.tree_util.tree_map(
        leaf, layers, is_leaf=lambda n: isinstance(n, QuantTensor))


def _put_tree(tree, specs, mesh):
    def put(a, s):
        return jax.device_put(a, NamedSharding(mesh, s))
    return jax.tree_util.tree_map(put, tree, specs)


def pp_shard_lm_params(params, cfg, mesh: Mesh, pp_axis: str = "pp"):
    """Layer-shard the temporal transformer's stacked layers over `pp`;
    replicate everything else (embeddings, heads, depformer, norms)."""
    s = mesh.shape[pp_axis]
    assert cfg.transformer.num_layers % s == 0, (
        f"num_layers {cfg.transformer.num_layers} not divisible by "
        f"pp={s} stages")
    out = dict(params)
    tr = dict(params["transformer"])
    lay = tr["layers"]
    tr["layers"] = _put_tree(lay, pp_layer_specs(lay, pp_axis), mesh)
    out["transformer"] = tr

    def repl(a):
        return jax.device_put(
            a, NamedSharding(mesh, P(*((None,) * a.ndim))))

    def walk(node):
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, QuantTensor):
            comps = {f: (None if getattr(node, f) is None
                         else repl(getattr(node, f))) for f in _QT_FIELDS}
            return QuantTensor(node.fmt, node.shape, comps["q"], comps["d"],
                               comps["sc"], comps["mn"], comps["dmin"],
                               comps["es"], comps["em"])
        return repl(node)

    for k, v in out.items():
        if k != "transformer":
            out[k] = walk(v)
    out["transformer"] = {k: (v if k == "layers" else walk(v))
                          for k, v in tr.items()}
    return out


def pp_state_pspecs(state, pp_axis: str = "pp", data_axis: str = "data"):
    """State spec tree: temporal KV rings [L, B, cap, H, hd] shard L over
    `pp` and B over `data`; delay cache / offsets shard their session
    axis on `data` (mirrors parallel/sharding.lm_state_pspecs)."""
    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, f"{path}.{k}" if path else k)
                    for k, v in node.items()}
        nd = getattr(node, "ndim", 0)
        if path.endswith(".k") or path.endswith(".v") or path in ("k", "v"):
            if nd != 5:
                raise ValueError(
                    f"pp_state_pspecs: KV leaf '{path}' has ndim={nd}; PP "
                    "requires the stacked KV layout [L, B, cap, H, hd] "
                    "(flat megakernel state is not pipelinable — build the "
                    "state with MOSHI_TPU_MEGAKERNEL unset)")
            return P(pp_axis, data_axis, None, None, None)
        if "cache" in path:
            return P(*((data_axis,) + (None,) * (nd - 1)))
        if "offset" in path:
            return P(*((data_axis,) + (None,) * max(nd - 1, 0)))
        return P(*((None,) * nd))
    return walk(state, "")


def pp_shard_lm_state(state, mesh: Mesh, pp_axis: str = "pp",
                      data_axis: str = "data"):
    return _put_tree(state, pp_state_pspecs(state, pp_axis, data_axis),
                     mesh)


# ---------------------------------------------------------------------------
# the pipelined decode step
# ---------------------------------------------------------------------------


def pp_transformer_decode(cfg, params, state, x, offset, pp: PPContext):
    """shard_map'ed GPipe schedule over the stacked-kernel decode path
    (nn/transformer._forward_stacked_decode run per stage on L/S local
    layers).  x: [B, 1, D]; B must be divisible by data*S (S microbatches
    per data shard).  Returns (y [B, 1, D], new_state)."""
    from moshi_tpu.nn.transformer import _forward_stacked_decode
    s_count = pp.nstages
    cfg_local = dataclasses.replace(cfg,
                                    num_layers=cfg.num_layers // s_count)
    lay = params["layers"]
    lay_specs = pp_layer_specs(lay, pp.pp_axis)
    kv_spec = P(pp.pp_axis, pp.data_axis, None, None, None)
    x_spec = P(pp.data_axis, None, None)
    off_spec = P(pp.data_axis)

    def body(lay_l, st, xx, off):
        sidx = jax.lax.axis_index(pp.pp_axis)
        b, _, d = xx.shape
        assert b % s_count == 0, (
            f"local batch {b} not divisible by {s_count} pp stages")
        bm = b // s_count
        x_mb = xx.reshape(s_count, bm, 1, d)
        off_mb = off.reshape(s_count, bm)
        k_stack, v_stack = st["k"], st["v"]
        recv = jnp.zeros((bm, d), xx.dtype)
        outs = jnp.zeros((s_count, bm, d), xx.dtype)
        perm = [(i, i + 1) for i in range(s_count - 1)]
        for p in range(2 * s_count - 1):
            mb = p - sidx                      # microbatch at this stage
            active = jnp.logical_and(mb >= 0, mb < s_count)
            mb_c = jnp.clip(mb, 0, s_count - 1)
            inject = x_mb[min(p, s_count - 1)][:, 0]   # stage-0 input
            h_in = jnp.where(sidx == 0, inject, recv)
            off_in = jnp.take(off_mb, mb_c, axis=0)
            k_mb = jax.lax.dynamic_slice_in_dim(k_stack, mb_c * bm, bm,
                                                axis=1)
            v_mb = jax.lax.dynamic_slice_in_dim(v_stack, mb_c * bm, bm,
                                                axis=1)
            y, new_st = _forward_stacked_decode(
                cfg_local, {"layers": lay_l}, {"k": k_mb, "v": v_mb},
                h_in[:, None], off_in)
            k_stack = jax.lax.dynamic_update_slice_in_dim(
                k_stack, jnp.where(active, new_st["k"], k_mb),
                mb_c * bm, axis=1)
            v_stack = jax.lax.dynamic_update_slice_in_dim(
                v_stack, jnp.where(active, new_st["v"], v_mb),
                mb_c * bm, axis=1)
            h = y[:, 0]
            # only the last stage's active phases are real outputs
            outs = outs.at[mb_c].add(
                jnp.where(jnp.logical_and(active, sidx == s_count - 1),
                          h, jnp.zeros_like(h)))
            if p < 2 * s_count - 2:
                recv = jax.lax.ppermute(h, pp.pp_axis, perm)
        y_all = jax.lax.psum(outs, pp.pp_axis)
        return y_all.reshape(b, 1, d), {"k": k_stack, "v": v_stack}

    return jax.shard_map(
        body, mesh=pp.mesh,
        in_specs=(lay_specs, {"k": kv_spec, "v": kv_spec}, x_spec,
                  off_spec),
        out_specs=(x_spec, {"k": kv_spec, "v": kv_spec}),
        check_vma=False,
    )(lay, state, x, offset)


# ---------------------------------------------------------------------------
# replicated wrappers: Mosaic kernels cannot be auto-partitioned, so under
# a PP mesh the non-pipelined pallas call sites (depformer, text head) run
# inside a shard_map with replicated weights — every device computes the
# same result for its data shard; no collectives.
# ---------------------------------------------------------------------------


def _repl_specs(tree):
    def leaf(a):
        if isinstance(a, QuantTensor):
            comps = {f: (None if getattr(a, f) is None
                         else P(*((None,) * getattr(a, f).ndim)))
                     for f in _QT_FIELDS}
            return QuantTensor(a.fmt, a.shape, comps["q"], comps["d"],
                               comps["sc"], comps["mn"], comps["dmin"],
                               comps["es"], comps["em"])
        return P(*((None,) * getattr(a, "ndim", 0)))
    return jax.tree_util.tree_map(
        leaf, tree, is_leaf=lambda n: isinstance(n, QuantTensor))


def pp_depformer_generate(cfg, norms, text_emb, transformer_out, text_token,
                          keys, step_w, temp, top_k, pp: PPContext):
    """Replicated-weight shard_map around _depformer_generate_stacked
    (sessions stay sharded over `data`)."""
    from moshi_tpu.models.lm import _depformer_generate_stacked

    def body(n, te, to, tt, ks, w):
        return _depformer_generate_stacked(
            cfg, n, te, to, tt, ks, w, temp, top_k)

    return jax.shard_map(
        body, mesh=pp.mesh,
        in_specs=(_repl_specs(norms), P(pp.data_axis, None),
                  P(pp.data_axis, None), P(pp.data_axis), P(None),
                  _repl_specs(step_w)),
        out_specs=P(pp.data_axis, None),
        check_vma=False,
    )(norms, text_emb, transformer_out, text_token, keys, step_w)


def pp_head_logits(x, qt: QuantTensor, pp: PPContext):
    """x [B, T, D] (data-sharded) @ replicated head [O, D] inside a
    shard_map (pallas kernel per device, no collectives)."""
    from moshi_tpu.quant.formats import qmatmul

    def body(xl, wq):
        return qmatmul(xl, wq, out_dtype=jnp.float32)

    return jax.shard_map(
        body, mesh=pp.mesh,
        in_specs=(P(pp.data_axis, None, None), _repl_specs(qt)),
        out_specs=P(pp.data_axis, None, None),
        check_vma=False,
    )(x, qt)
