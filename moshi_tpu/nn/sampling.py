"""Token sampling: temperature + top-k + Gumbel-max categorical draw.

Parity with /root/reference/src/moshi/utils/sampling.h:4-79: the reference
computes softmax(logits/temp), keeps top-k, then draws argmax(p / E) with
E ~ Exponential(1) host noise.  argmax(p/E) over the top-k set is exactly
the Gumbel-max trick (log p + Gumbel), so on TPU we use
jax.random.gumbel with a threefry key — fully on-device, deterministic
under a fixed seed (the reference's DISABLE_RAND analog is temp=0 greedy).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_token(logits: jnp.ndarray, key, temp: float, top_k: int) -> jnp.ndarray:
    """logits [..., V] -> token ids [...] (int32).

    temp/top_k are static (baked into the jitted step, like the reference's
    graph-resident sampling).  temp == 0 means greedy argmax.
    """
    if temp == 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    scaled = logits.astype(jnp.float32) / temp
    k = min(int(top_k), logits.shape[-1]) if top_k > 0 else logits.shape[-1]
    vals, idx = jax.lax.top_k(scaled, k)
    g = jax.random.gumbel(key, vals.shape, dtype=jnp.float32)
    choice = jnp.argmax(vals + g, axis=-1)
    return jnp.take_along_axis(idx, choice[..., None], axis=-1)[..., 0].astype(jnp.int32)
