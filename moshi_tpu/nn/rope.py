"""Rotary position embedding, interleaved pairs.

Parity with /root/reference/src/moshi/modules/rope.h:1-129: rotation angles
come from a timestep embedding of `arange(T) + offset` with `max_period`,
applied to interleaved (even, odd) channel pairs of q and k.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_angles(positions: jnp.ndarray, dim: int, max_period: float = 10_000.0):
    """positions [...,T] -> (cos, sin) each [...,T, dim//2] (f32)."""
    half = dim // 2
    freqs = jnp.exp(
        -jnp.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    theta = positions.astype(jnp.float32)[..., None] * freqs
    return jnp.cos(theta), jnp.sin(theta)


def apply_rope(x: jnp.ndarray, positions: jnp.ndarray = None,
               max_period: float = 10_000.0, cos_sin=None) -> jnp.ndarray:
    """x: [B, T, H, D] with interleaved pairs; positions: [T] or [B, T].
    Pass precomputed `cos_sin` to share the angle computation across a
    whole stack (the reference shares the rope embedding across layers,
    transformer.h:1198-1209)."""
    b, t, h, d = x.shape
    if cos_sin is None:
        cos_sin = rope_angles(positions, d, max_period)  # [..., T, D/2]
    cos, sin = cos_sin
    if cos.ndim == 2:  # positions [T]
        cos = cos[None, :, None, :]
        sin = sin[None, :, None, :]
    elif cos.ndim == 3:  # positions [B, T]
        cos = cos[:, :, None, :]
        sin = sin[:, :, None, :]
    xf = x.astype(jnp.float32).reshape(b, t, h, d // 2, 2)
    xr, xi = xf[..., 0], xf[..., 1]
    yr = xr * cos - xi * sin
    yi = xr * sin + xi * cos
    y = jnp.stack([yr, yi], axis=-1).reshape(b, t, h, d)
    return y.astype(x.dtype)
