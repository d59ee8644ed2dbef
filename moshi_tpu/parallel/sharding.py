"""TPU distribution layer: device mesh + tensor/session-parallel shardings.

The reference is strictly single-device (SURVEY.md §2.7: no DP/TP/PP, no
communication backend; ggml backend per process, B=1 hard-coded).  This
module is the new, TPU-native design it calls for:

  * mesh axes ``("data", "model")`` — ``data`` batches concurrent voice
    sessions (session parallelism / DP across hosts), ``model`` tensor-
    shards the big weights and KV caches over ICI;
  * Megatron-style TP layout: fused QKV / gating linear_in are row-sharded
    (heads split across ``model``), out_proj / linear_out are
    column-sharded so XLA inserts a single psum per block; KV rings shard
    on the head axis; embeddings and logits heads shard on the output
    axis; per-session state (delay cache, offsets, RNG) shards on
    ``data``;
  * QuantTensor leaves shard like their logical [O, I] weight: packed q /
    scale arrays are row-sharded together (the planar packing keeps the I
    axis intact on every shard).

Everything is expressed as PartitionSpec trees matching the param/state
pytrees from models/lm.py; jit(in_shardings=...) + XLA GSPMD does the
rest (collectives over ICI, DCN between hosts under jax.distributed).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from moshi_tpu.quant.formats import QuantTensor


def make_mesh(data: int = 1, model: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    n = data * model
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


# ---------------------------------------------------------------------------
# leaf-level rules
# ---------------------------------------------------------------------------

def _spec_for_weight(path: str, ndim: int) -> P:
    """TP spec for one weight leaf, by its param-tree path and rank.

    Stacked leaves carry leading [L] (layers) and/or [W] (weights-per-step)
    axes which are never sharded; the last two axes are the logical [O, I].
    """
    lead = (None,) * (ndim - 2)
    row = P(*lead, "model", None)      # shard O
    col = P(*lead, None, "model")      # shard I
    repl = P(*((None,) * ndim))
    if ndim < 2:
        return P(None) if ndim else P()
    if "in_proj" in path or "linear_in" in path:
        return row
    if "out_proj" in path or "linear_out" in path:
        return col
    if "text_linear" in path or ".linears" in path or "extra_heads" in path:
        return row
    if "depformer.in" in path:
        return row
    if path.endswith("emb.weight") or "emb.weight" in path:
        # embedding tables [*, vocab, dim]: shard the dim axis
        return P(*lead, None, "model") if ndim >= 2 else repl
    if "out1" in path or "out2" in path:
        return row
    if "low_rank" in path:
        return row
    return repl


def lm_param_pspecs(params) -> dict:
    """PartitionSpec tree mirroring an LM param tree (models/lm.py)."""

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, f"{path}.{k}" if path else k)
                    for k, v in node.items()}
        if isinstance(node, QuantTensor):
            # shard all packed fields on the O axis together (row sharding
            # only; the I axis must stay whole for block alignment)
            def qspec(arr):
                if arr is None:
                    return None
                nd = arr.ndim
                base = _spec_for_weight(path, nd)
                # force row sharding for quantized leaves
                if "out_proj" in path or "linear_out" in path:
                    base = P(*((None,) * (nd - 2)), "model", None)
                return base
            return QuantTensor(node.fmt, node.shape, qspec(node.q),
                               qspec(node.d), qspec(node.sc),
                               qspec(node.mn), qspec(node.dmin),
                               qspec(node.es), qspec(node.em))
        # norm scales, biases, small vectors: replicate
        nd = getattr(node, "ndim", 0)
        if any(s in path for s in ("alpha", "norm", "bias", "scale")):
            return P(*((None,) * nd))
        return _spec_for_weight(path, nd)

    return walk(params, "")


def lm_state_pspecs(state) -> dict:
    """Spec tree for the generation state: KV rings shard (data, heads),
    per-session scalars shard on data."""

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, f"{path}.{k}" if path else k)
                    for k, v in node.items()}
        nd = getattr(node, "ndim", 0)
        if path.endswith(".k") or path.endswith(".v") or path in ("k", "v"):
            # [L, B, cap, H, hd]
            return P(None, "data", None, "model", None)
        if "cache" in path:
            return P("data", None, None)
        if "offset" in path:
            return P("data")
        if "rng" in path:
            return P(*((None,) * nd))
        return P(*((None,) * nd))

    return walk(state, "")


def shard_tree(tree, pspecs, mesh: Mesh):
    """device_put a pytree according to a matching PartitionSpec tree."""
    def put(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, tree, pspecs)


def replicate_tree(tree, mesh: Mesh):
    def put(x):
        return jax.device_put(
            x, NamedSharding(mesh, P(*((None,) * getattr(x, "ndim", 0)))))
    return jax.tree_util.tree_map(put, tree)
