"""Expert-parallel sharding of the depformer's weights-per-step sets.

The reference's nearest MoE analog is the depformer's weights-per-step:
8-32 disjoint per-step weight sets selected by the codebook index
(/root/reference/src/moshi/modules/transformer.h:55-146,
lm_default.h:71-150).  SURVEY §2.7 marks sharding them across devices
"like experts" as the optional EP obligation; this module implements it
the TPU-native way:

The stacked steps-outer weights ([W, ...] / [dep_q, ...] leaves, the
dominant depformer memory) are sharded on their leading STEP axis over
the `model` mesh axis via NamedSharding.  The depformer scan
dynamic-slices step cb's weight set each iteration, so under GSPMD the
slice of a step-sharded operand lowers to a collective gather from the
owning device — each device stores 1/S of the per-step sets and the
active set rides ICI at use time.  This is a memory-distribution
tradeoff (weight storage 1/S, one gather per dep step), not a FLOPs
win: every step still computes everywhere.  Use TP (parallel/tp.py)
when compute scaling matters; EP composes with data-axis session
batching.

XLA-path only (bf16 / q8_r): GSPMD cannot partition pallas custom
calls, so EP-sharded params must run with the pallas kernels disabled
(the q8_r serving regime — quant/policy.serving_format — is exactly
where that already holds).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from moshi_tpu.quant.formats import QuantTensor


def _shard_steps_leaf(arr, mesh: Mesh, s: int, axis_name: str,
                      step_counts):
    nd = getattr(arr, "ndim", 0)
    # only the STEP axis may shard: leading dim must be one of the
    # known step counts (W / dep_q) and divide the axis size — [L] norm
    # stacks and [dep_q-1] embedding tables stay replicated
    if nd >= 2 and arr.shape[0] in step_counts and arr.shape[0] % s == 0:
        spec = P(*([axis_name] + [None] * (nd - 1)))
    else:
        spec = P(*([None] * nd))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def ep_shard_depformer(params, cfg, mesh: Mesh, axis_name: str = "model"):
    """Return a copy of the LM param tree with every steps-outer stacked
    depformer leaf sharded on its leading step axis over `axis_name`;
    everything else replicated on the mesh.  `cfg` supplies the step
    counts (depformer_num_weights, dep_q) that identify steps-outer
    leading axes."""
    s = mesh.shape[axis_name]
    steps = {int(cfg.depformer_num_weights), int(cfg.dep_q)}

    def put_repl(a):
        nd = getattr(a, "ndim", 0)
        return jax.device_put(a, NamedSharding(mesh, P(*([None] * nd))))

    def shard_tree(node):
        if isinstance(node, dict):
            return {k: shard_tree(v) for k, v in node.items()}
        if isinstance(node, QuantTensor):
            return jax.tree_util.tree_map(
                lambda a: _shard_steps_leaf(a, mesh, s, axis_name, steps),
                node)
        return _shard_steps_leaf(node, mesh, s, axis_name, steps)

    out = {}
    for k, v in params.items():
        if k == "depformer":
            out[k] = shard_tree(v)
        else:
            out[k] = jax.tree_util.tree_map(put_repl, v)
    return out
