"""In-place KV-ring slot writes (aliased pallas calls).

The XLA-level ring update (`dynamic_update_slice` / scatter on a
[L, B, cap, H, hd] carry) double-buffers the ring: the round-5 B=4 OOM
breakdown showed one extra k+v ring pair of HLO temps (2 x 2.93 GB)
with argument<->output aliasing otherwise intact, i.e. XLA COPIES the
full ring every frame — at B=1 that is ~2.9 GB/frame of hidden HBM
traffic on a 7B (the unexplained share of the 1.44x roofline residual),
and at B=4 it is the entire OOM.

This kernel writes ONE cap-slot per session through a pallas call whose
output aliases the ring input (`input_output_aliases`): Mosaic only
DMAs the single [L, 1, 1, H, hd] block each session's slot maps to
(block index from scalar-prefetch slots), and the untouched rest of the
buffer is never moved.  Traffic per frame drops from O(ring) to
O(L*B*H*hd).

The reference never faces this: GGML's KV cache is a mutable buffer
written by pointer (/root/reference/src/moshi/modules/transformer.h
ring updates); this is the XLA-functional equivalent of that mutation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from moshi_tpu.utils.pallas_mode import with_interpret_default


def _write_kernel(s_ref, ks_ref, vs_ref, kin_ref, vin_ref, ko_ref,
                  vo_ref):
    del kin_ref, vin_ref     # aliased to the outputs; fully overwritten
    ko_ref[:, :, 0] = ks_ref[:]
    vo_ref[:, :, 0] = vs_ref[:]


@with_interpret_default
@functools.partial(jax.jit, static_argnames=("interpret",))
def ring_write_stacked(k_stack, v_stack, ks, vs, slot,
                       interpret: bool = False):
    """Write ks/vs [L, B, H, hd] into k_stack/v_stack [L, B, cap, H, hd]
    at per-session cap-slots `slot` [B] — in place (the outputs alias
    the ring inputs; only the written blocks move).  Returns the updated
    (k_stack, v_stack)."""
    l, b, cap, h, hd = k_stack.shape
    slots = jnp.asarray(slot, jnp.int32).reshape(b)

    ring_spec = pl.BlockSpec((l, 1, 1, h, hd),
                             lambda i, s: (0, i, s[i], 0, 0),
                             memory_space=pltpu.VMEM)
    new_spec = pl.BlockSpec((l, 1, h, hd), lambda i, s: (0, i, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[new_spec, new_spec, ring_spec, ring_spec],
        out_specs=(ring_spec, ring_spec),
    )
    return pl.pallas_call(
        _write_kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct(k_stack.shape, k_stack.dtype),
                   jax.ShapeDtypeStruct(v_stack.shape, v_stack.dtype)),
        # inputs are (slots, ks, vs, k_stack, v_stack) — alias the rings
        # straight through to the outputs
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
    )(slots, ks.astype(k_stack.dtype), vs.astype(v_stack.dtype),
      k_stack, v_stack)


def _write_kernel4(s_ref, n_ref, in_ref, o_ref):
    del in_ref               # aliased to the output; fully overwritten
    o_ref[:, 0] = n_ref[:]


@with_interpret_default
@functools.partial(jax.jit, static_argnames=("interpret",))
def ring_write(cache, values, slot, interpret: bool = False):
    """4-D variant: values [B, H, hd] -> cache [B, cap, H, hd] at
    per-session slots [B], in place."""
    b, cap, h, hd = cache.shape
    slots = jnp.asarray(slot, jnp.int32).reshape(b)
    ring_spec = pl.BlockSpec((1, 1, h, hd), lambda i, s: (i, s[i], 0, 0),
                             memory_space=pltpu.VMEM)
    new_spec = pl.BlockSpec((1, h, hd), lambda i, s: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[new_spec, ring_spec],
        out_specs=ring_spec,
    )
    return pl.pallas_call(
        _write_kernel4,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(slots, values.astype(cache.dtype), cache)
