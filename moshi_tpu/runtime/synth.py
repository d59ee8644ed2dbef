"""Synthetic weights: random parameter trees, optionally pre-quantized.

For benchmarking and compile-checking at full model scale without
checkpoint files: quantized leaves are synthesized directly as random
packed bits + scales on device (dequantizing random bits costs exactly
the same as dequantizing real weights), so a 7B q4_k tree materializes in
seconds instead of minutes of host-side quantization.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from moshi_tpu.models.lm import LMConfig, init_lm_params
from moshi_tpu.quant.formats import QK, QK_K, QuantTensor
from moshi_tpu.quant.policy import choose_format


def synth_quant_tensor(key, fmt: str, out_dim: int, in_dim: int,
                       scale: float = 0.02) -> QuantTensor:
    """Random packed QuantTensor [out_dim, in_dim].  Bit payloads come
    from numpy's PCG64 (fast on host; dequantized random bits cost the
    same as real weights), seeded from the jax key for determinism."""
    if jax.default_backend() != "cpu":
        return _synth_quant_tensor_device(key, fmt, out_dim, in_dim, scale)
    seed = int(np.asarray(jax.random.key_data(key)).ravel()[-1])
    rng = np.random.default_rng(seed)
    if fmt == "q8_0":
        q = jnp.asarray(rng.integers(-127, 128, (out_dim, in_dim), np.int8))
        d = jnp.full((out_dim, in_dim // QK), scale / 127, jnp.bfloat16)
        return QuantTensor(fmt, (out_dim, in_dim), q, d)
    if fmt == "q8_r":
        q = jnp.asarray(rng.integers(-127, 128, (out_dim, in_dim), np.int8))
        d = jnp.full((out_dim, 1), scale / 127, jnp.bfloat16)
        return QuantTensor(fmt, (out_dim, in_dim), q, d)
    if fmt == "q4_0":
        q = jnp.asarray(rng.integers(0, 256, (out_dim, in_dim // 2), np.uint8))
        d = jnp.full((out_dim, in_dim // QK), scale / 8, jnp.bfloat16)
        return QuantTensor(fmt, (out_dim, in_dim), q, d)
    if fmt == "q4_k":
        nsb = in_dim // QK_K
        q = jnp.asarray(rng.integers(0, 256, (out_dim, in_dim // 2), np.uint8))
        sc = jnp.asarray(rng.integers(0, 64, (out_dim, nsb, 8), np.uint8))
        mn = jnp.asarray(rng.integers(0, 64, (out_dim, nsb, 8), np.uint8))
        d = jnp.full((out_dim, nsb), scale / (63 * 15), jnp.bfloat16)
        dmin = jnp.full((out_dim, nsb), scale / 63, jnp.bfloat16)
        return QuantTensor(fmt, (out_dim, in_dim), q, d, sc=sc, mn=mn,
                           dmin=dmin).with_eff_scales()
    raise ValueError(fmt)


def _synth_quant_tensor_device(key, fmt, out_dim, in_dim, scale):
    """On accelerators, generate packed bits on device (no host transfer)."""
    ks = jax.random.split(key, 3)

    def bits(k, shape):
        return jax.random.bits(k, shape, jnp.uint8)

    if fmt == "q8_0":
        q = bits(ks[0], (out_dim, in_dim)).astype(jnp.int8)
        q = jnp.maximum(q, -127)
        d = jnp.full((out_dim, in_dim // QK), scale / 127, jnp.bfloat16)
        return QuantTensor(fmt, (out_dim, in_dim), q, d)
    if fmt == "q8_r":
        q = bits(ks[0], (out_dim, in_dim)).astype(jnp.int8)
        q = jnp.maximum(q, -127)
        d = jnp.full((out_dim, 1), scale / 127, jnp.bfloat16)
        return QuantTensor(fmt, (out_dim, in_dim), q, d)
    if fmt == "q4_0":
        q = bits(ks[0], (out_dim, in_dim // 2))
        d = jnp.full((out_dim, in_dim // QK), scale / 8, jnp.bfloat16)
        return QuantTensor(fmt, (out_dim, in_dim), q, d)
    if fmt == "q4_k":
        nsb = in_dim // QK_K
        q = bits(ks[0], (out_dim, in_dim // 2))
        sc = bits(ks[1], (out_dim, nsb, 8)) & jnp.uint8(63)
        mn = bits(ks[2], (out_dim, nsb, 8)) & jnp.uint8(63)
        d = jnp.full((out_dim, nsb), scale / (63 * 15), jnp.bfloat16)
        dmin = jnp.full((out_dim, nsb), scale / 63, jnp.bfloat16)
        return QuantTensor(fmt, (out_dim, in_dim), q, d, sc=sc, mn=mn,
                           dmin=dmin).with_eff_scales()
    raise ValueError(fmt)


def synth_lm_params(key, cfg: LMConfig, fmt: str | None = None,
                    dtype=jnp.bfloat16):
    """Random LM params matching init_lm_params' structure; 2-D matmul
    weights follow the quantization policy when fmt is given."""
    shapes = jax.eval_shape(lambda k: init_lm_params(k, cfg, dtype), key)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    keys = jax.random.split(key, len(leaves))
    out = []
    for (path, leaf), k in zip(leaves, keys):
        name = "".join(str(p) for p in path)
        name = name.replace("'", "").replace("]", "").replace("[", ".")
        shape = leaf.shape
        actual = (choose_format(name, shape[-2:], fmt)
                  if fmt and len(shape) >= 2 else None)
        if actual is not None and len(shape) == 2:
            out.append(synth_quant_tensor(k, actual, shape[0], shape[1]))
        elif actual is not None and len(shape) > 2:
            # stacked weights [L(,W), O, I]: synthesize per slice and stack
            lead = math.prod(shape[:-2])  # host math: no device round-trip
            subkeys = jax.random.split(k, lead)
            qts = [synth_quant_tensor(sk, actual, shape[-2], shape[-1])
                   for sk in subkeys]
            stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *qts)
            stacked = jax.tree_util.tree_map(
                lambda a: a.reshape(shape[:-2] + a.shape[1:]), stacked)
            out.append(stacked)
        else:
            out.append(jax.random.normal(k, shape, dtype) * 0.02)
    return jax.tree_util.tree_unflatten(treedef, out)
