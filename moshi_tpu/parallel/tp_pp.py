"""3-axis parallelism: TP x PP x session-DP on one ("data", "model",
"pp") mesh.

The reference is single-device (SURVEY.md §2.7); TP (parallel/tp.py)
and PP (parallel/pp.py) each compose with the data axis on their own
2-axis meshes.  This module composes ALL THREE on one mesh:

  * temporal transformer: stacked layers [L, ...] split into S
    contiguous stages over ``pp`` (GPipe microbatch schedule via
    ppermute), and WITHIN each stage every layer is Megatron-sharded
    over ``model`` (TP row/col quant layouts from parallel/tp.py, two
    psums per layer over the model axis);
  * KV rings shard [L->pp, B->data, cap, H->model, hd] — each (stage,
    model-shard) pair holds only its own layers' and heads' ring;
  * depformer + text head: TP-sharded over ``model`` (the standard
    tp_depformer_generate / tp_row_logits shard_maps — their specs
    never mention ``pp``, so they run pp-replicated);
  * sessions shard over ``data``; within a data shard the local batch
    splits into S pipeline microbatches.

Activation traffic per frame: 2(S-1) ppermutes over ``pp`` + 1 psum
over ``pp`` (pipeline) and 2L/S psums over ``model`` (TP) — all ICI
collectives.

Usage:
    mesh = make_tp_pp_mesh(data=2, model=2, pp=2)
    params = tp_pp_shard_lm_params(params, cfg, mesh)
    state = tp_pp_shard_lm_state(init_gen_state(cfg, B), mesh)
    with tp_scope(mesh), pp_scope(mesh, cfg.transformer):
        out, state = jax.jit(step)(params, state, ...)

Dispatch: nn/transformer.transformer_forward routes to
tp_pp_transformer_decode when BOTH scopes are active and the pp scope
matches the stack; models/lm prefers the TP shard_maps for the
depformer/head when both are active.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from moshi_tpu.quant.formats import QuantTensor

_QT_FIELDS = ("q", "d", "sc", "mn", "dmin", "es", "em")


def make_tp_pp_mesh(data: int = 1, model: int = 1, pp: int = 1,
                    devices: Optional[Sequence] = None) -> Mesh:
    """("data", "model", "pp") mesh: pp innermost (stage hops are the
    latency-critical per-frame chain), model next (2L/S psums/frame),
    data outermost (no per-frame collectives)."""
    if devices is None:
        devices = jax.devices()
    n = data * model * pp
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(data, model, pp)
    return Mesh(arr, axis_names=("data", "model", "pp"))


def _prepend_axis(spec: P, axis: str) -> P:
    parts = list(spec)
    assert parts and parts[0] is None, (
        f"leading (layer-stack) axis already sharded: {spec}")
    return P(axis, *parts[1:])


def tp_pp_layer_specs(layers, pp_axis: str = "pp"):
    """Spec tree for the temporal stacked layers: TP component specs
    (parallel/tp.tp_specs) + the leading L axis over ``pp``."""
    from moshi_tpu.parallel.tp import tp_specs
    specs = tp_specs(layers)

    def bump(node):
        if isinstance(node, dict):
            return {k: bump(v) for k, v in node.items()}
        if isinstance(node, QuantTensor):
            comps = {f: (None if getattr(node, f) is None
                         else _prepend_axis(getattr(node, f), pp_axis))
                     for f in _QT_FIELDS}
            return QuantTensor(node.fmt, node.shape, comps["q"], comps["d"],
                               comps["sc"], comps["mn"], comps["dmin"],
                               comps["es"], comps["em"])
        return _prepend_axis(node, pp_axis)

    return bump(specs)


def tp_pp_shard_lm_params(params, cfg, mesh: Mesh, pp_axis: str = "pp"):
    """TP layout + placement everywhere (tp_shard_lm_params — pp appears
    in no spec, so non-temporal weights replicate over pp), then re-place
    the temporal stacked layers with the leading L axis over ``pp``."""
    from moshi_tpu.parallel.tp import tp_shard_lm_params
    s = mesh.shape[pp_axis]
    nl = cfg.transformer.num_layers
    assert nl % s == 0, f"num_layers {nl} not divisible by pp={s} stages"
    out = tp_shard_lm_params(params, cfg, mesh)
    lay = out["transformer"]["layers"]
    specs = tp_pp_layer_specs(lay, pp_axis)

    def put(a, sp):
        return jax.device_put(a, NamedSharding(mesh, sp))

    out["transformer"] = dict(
        out["transformer"],
        layers=jax.tree_util.tree_map(put, lay, specs))
    return out


def tp_pp_state_pspecs(state, pp_axis: str = "pp", model_axis: str = "model",
                       data_axis: str = "data"):
    """KV rings [L, B, cap, H, hd] shard (pp, data, -, model, -);
    per-session leaves shard on data (mirrors sharding.lm_state_pspecs
    with the layer axis pipelined)."""
    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, f"{path}.{k}" if path else k)
                    for k, v in node.items()}
        nd = getattr(node, "ndim", 0)
        if path.endswith(".k") or path.endswith(".v") or path in ("k", "v"):
            if nd != 5:
                raise ValueError(
                    f"tp_pp_state_pspecs: KV leaf '{path}' has ndim={nd}; "
                    "TPxPP requires the stacked layout [L, B, cap, H, hd]")
            return P(pp_axis, data_axis, None, model_axis, None)
        if "cache" in path:
            return P(*((data_axis,) + (None,) * (nd - 1)))
        if "offset" in path:
            return P(*((data_axis,) + (None,) * max(nd - 1, 0)))
        return P(*((None,) * nd))
    return walk(state, "")


def tp_pp_shard_lm_state(state, mesh: Mesh, pp_axis: str = "pp",
                         model_axis: str = "model",
                         data_axis: str = "data"):
    def put(a, sp):
        return jax.device_put(a, NamedSharding(mesh, sp))
    return jax.tree_util.tree_map(
        put, state, tp_pp_state_pspecs(state, pp_axis, model_axis,
                                       data_axis))


def tp_pp_transformer_decode(cfg, params, state, x, offset, tp, pp):
    """GPipe schedule over TP-sharded stages: parallel/pp.py's phase
    loop with each stage's _forward_stacked_decode running the
    Megatron-sharded kernels (tp_axis=model -> 2 psums/layer inside the
    stage).  x: [B, 1, D]; local batch must divide into pp.nstages
    microbatches."""
    from moshi_tpu.nn.transformer import _forward_stacked_decode
    s_count = pp.nstages
    cfg_local = dataclasses.replace(cfg,
                                    num_layers=cfg.num_layers // s_count)
    lay = params["layers"]
    lay_specs = tp_pp_layer_specs(lay, pp.pp_axis)
    kv_spec = P(pp.pp_axis, pp.data_axis, None, tp.model_axis, None)
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
            mb = p - sidx
            active = jnp.logical_and(mb >= 0, mb < s_count)
            mb_c = jnp.clip(mb, 0, s_count - 1)
            inject = x_mb[min(p, s_count - 1)][:, 0]
            h_in = jnp.where(sidx == 0, inject, recv)
            off_in = jnp.take(off_mb, mb_c, axis=0)
            k_mb = jax.lax.dynamic_slice_in_dim(k_stack, mb_c * bm, bm,
                                                axis=1)
            v_mb = jax.lax.dynamic_slice_in_dim(v_stack, mb_c * bm, bm,
                                                axis=1)
            y, new_st = _forward_stacked_decode(
                cfg_local, {"layers": lay_l}, {"k": k_mb, "v": v_mb},
                h_in[:, None], off_in, tp_axis=tp.model_axis)
            k_stack = jax.lax.dynamic_update_slice_in_dim(
                k_stack, jnp.where(active, new_st["k"], k_mb),
                mb_c * bm, axis=1)
            v_stack = jax.lax.dynamic_update_slice_in_dim(
                v_stack, jnp.where(active, new_st["v"], v_mb),
                mb_c * bm, axis=1)
            h = y[:, 0]
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
