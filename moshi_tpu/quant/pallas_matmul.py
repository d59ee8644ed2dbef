"""Fused dequant+matmul Pallas kernels for block-quantized weights.

The decode path is HBM-bandwidth-bound: per 80 ms frame every weight byte
is read once at batch ~1 (SURVEY.md §7: "every dequant+matmul kernel at
speed-of-light per chip").  These kernels stream packed q4/q8 tiles
HBM->VMEM (pallas pipelined BlockSpecs), unpack + scale on the VPU and
contract on the MXU without ever materializing the dequantized matrix in
HBM — the TPU analog of GGML's fused dequant-in-mul_mat CUDA kernels the
reference relies on.

Layout recap (quant/formats.py): 4-bit weights are packed planar — packed
byte j of a row holds original column j (low nibble) and column j + K/2
(high nibble).  The two unpacked halves are therefore contiguous in the
original column order, so the kernel contracts each half against the
matching half of x: y = deq_lo @ x[:K/2] + deq_hi @ x[K/2:], with the
per-32-block scales split likewise — no lane interleaving anywhere.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from moshi_tpu.quant.formats import QK, QK_K, QuantTensor

# rows of output computed per grid program
_TILE_O = 256


def _expand_block_scales(s, block: int):
    """[TO, nblocks] -> [TO, nblocks*block] by repeating each column
    `block` times (element repeat, NOT pltpu.repeat's array tiling)."""
    to, nb = s.shape
    return jnp.broadcast_to(s[:, :, None], (to, nb, block)).reshape(
        to, nb * block)


# ---------------------------------------------------------------------------
# q8_0: int8 weights, fp16 scale per 32 columns
# ---------------------------------------------------------------------------

def _q8_kernel(x_ref, q_ref, d_ref, o_ref):
    q = q_ref[:].astype(jnp.float32)                       # [TO, K]
    d = _expand_block_scales(d_ref[:].astype(jnp.float32), QK)
    w = (q * d).astype(jnp.bfloat16)                       # [TO, K]
    x = x_ref[:].astype(jnp.bfloat16)                      # [M, K]
    o_ref[:] = jax.lax.dot_general(
        x, w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# q4_0: planar nibbles, symmetric, fp16 scale per 32 columns
# ---------------------------------------------------------------------------

def _q4_0_kernel(x_ref, q_ref, d_ref, o_ref):
    packed = q_ref[:]                                      # [TO, K/2]
    k2 = packed.shape[1]
    lo = (packed & jnp.uint8(15)).astype(jnp.float32) - 8.0
    hi = (packed >> jnp.uint8(4)).astype(jnp.float32) - 8.0
    d = d_ref[:].astype(jnp.float32)                       # [TO, K/32]
    nb_half = d.shape[1] // 2
    d_lo = _expand_block_scales(d[:, :nb_half], QK)        # [TO, K/2]
    d_hi = _expand_block_scales(d[:, nb_half:], QK)
    w_lo = (lo * d_lo).astype(jnp.bfloat16)
    w_hi = (hi * d_hi).astype(jnp.bfloat16)
    x = x_ref[:].astype(jnp.bfloat16)                      # [M, K]
    x_lo = x[:, :k2]
    x_hi = x[:, k2:]
    acc = jax.lax.dot_general(x_lo, w_lo, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(x_hi, w_hi, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    o_ref[:] = acc


# ---------------------------------------------------------------------------
# q4_k: planar nibbles, per-32 6-bit scale/min + per-256 fp16 super-scales
# ---------------------------------------------------------------------------

def _q4_k_kernel(x_ref, xsum_ref, q_ref, sc_ref, mn_ref, d_ref, dmin_ref,
                 o_ref):
    packed = q_ref[:]                                      # [TO, K/2]
    k2 = packed.shape[1]
    lo = (packed & jnp.uint8(15)).astype(jnp.float32)
    hi = (packed >> jnp.uint8(4)).astype(jnp.float32)
    to = packed.shape[0]
    # effective per-32-block scales/mins: [TO, nsb*8] == [TO, K/32]
    d = d_ref[:].astype(jnp.float32)                       # [TO, nsb]
    dmin = dmin_ref[:].astype(jnp.float32)
    sc = sc_ref[:].astype(jnp.float32).reshape(to, -1)     # [TO, nsb*8]
    mn = mn_ref[:].astype(jnp.float32).reshape(to, -1)
    eff_s = _expand_block_scales(d, 8) * sc                # [TO, K/32]
    eff_m = _expand_block_scales(dmin, 8) * mn
    nb_half = eff_s.shape[1] // 2
    s_lo = _expand_block_scales(eff_s[:, :nb_half], QK)    # [TO, K/2]
    s_hi = _expand_block_scales(eff_s[:, nb_half:], QK)
    w_lo = (lo * s_lo).astype(jnp.bfloat16)
    w_hi = (hi * s_hi).astype(jnp.bfloat16)
    x = x_ref[:].astype(jnp.bfloat16)
    x_lo = x[:, :k2]
    x_hi = x[:, k2:]
    acc = jax.lax.dot_general(x_lo, w_lo, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(x_hi, w_hi, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    # the mins contribute -sum_b eff_m[:, b] * (sum of x in block b):
    # a [M, K/32] x [TO, K/32] contraction on the precomputed block sums
    xs = xsum_ref[:].astype(jnp.float32)                   # [M, K/32]
    acc -= jax.lax.dot_general(xs, eff_m, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
    o_ref[:] = acc


def _block_sums(x: jnp.ndarray, block: int) -> jnp.ndarray:
    m, k = x.shape
    return jnp.sum(x.reshape(m, k // block, block), axis=-1)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("interpret",))
def qmatmul_pallas(x: jnp.ndarray, qt: QuantTensor, interpret: bool = False):
    """y = x @ W.T with W quantized.  x: [..., K] -> [..., O]."""
    orig_shape = x.shape
    k = orig_shape[-1]
    x2 = x.reshape(-1, k)
    m = x2.shape[0]
    o = qt.q.shape[0]
    tile = min(_TILE_O, o)
    assert o % tile == 0, f"O={o} not divisible by tile {tile}"
    grid = (o // tile,)
    x_spec = pl.BlockSpec((m, k), lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((m, tile), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    cost = pl.CostEstimate(flops=2 * m * k * o,
                           bytes_accessed=qt.nbytes + m * k * 4 + m * o * 4,
                           transcendentals=0)

    if qt.fmt == "q8_0":
        y = pl.pallas_call(
            _q8_kernel,
            grid=grid,
            in_specs=[
                x_spec,
                pl.BlockSpec((tile, k), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, k // QK), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((m, o), jnp.float32),
            cost_estimate=cost,
            interpret=interpret,
        )(x2, qt.q, qt.d)
    elif qt.fmt == "q4_0":
        y = pl.pallas_call(
            _q4_0_kernel,
            grid=grid,
            in_specs=[
                x_spec,
                pl.BlockSpec((tile, k // 2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, k // QK), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((m, o), jnp.float32),
            cost_estimate=cost,
            interpret=interpret,
        )(x2, qt.q, qt.d)
    elif qt.fmt == "q4_k":
        nsb = k // QK_K
        xsum = _block_sums(x2.astype(jnp.float32), QK)     # [M, K/32]
        y = pl.pallas_call(
            _q4_k_kernel,
            grid=grid,
            in_specs=[
                x_spec,
                pl.BlockSpec((m, k // QK), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, k // 2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, nsb, 8), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, nsb, 8), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, nsb), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, nsb), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((m, o), jnp.float32),
            cost_estimate=cost,
            interpret=interpret,
        )(x2, xsum, qt.q, qt.sc, qt.mn, qt.d, qt.dmin)
    else:
        raise ValueError(qt.fmt)
    return y.reshape(orig_shape[:-1] + (o,))
