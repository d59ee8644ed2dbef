"""SiLU-gated MLP (parity: /root/reference/src/moshi/modules/gating.h:1-44).

linear_in projects to 2*hidden (fused gate|value halves), activation is
silu(gate) * value, linear_out projects back.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from moshi_tpu.nn.layers import init_linear, linear


def init_gating(key, dim: int, hidden: int, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    return {
        "linear_in": init_linear(k1, dim, 2 * hidden, dtype=dtype),
        "linear_out": init_linear(k2, hidden, dim, dtype=dtype),
    }


def gating_mlp(params, x, activation: str = "silu", pre_norm_alpha=None):
    from moshi_tpu.quant.formats import QuantTensor, pallas_enabled
    w_in = params["linear_in"]["weight"]
    if (activation == "silu" and pallas_enabled()
            and isinstance(w_in, QuantTensor)
            and "bias" not in params["linear_in"]):
        # fused GLU kernel: linear_in + split + silu + mult in one call
        from moshi_tpu.quant.pallas_matmul import glu_matmul_pallas
        hv = glu_matmul_pallas(x, w_in, alpha=pre_norm_alpha)
        if hv is not None:
            return linear(params["linear_out"], hv.astype(x.dtype))
    h = linear(params["linear_in"], x, pre_norm_alpha=pre_norm_alpha)
    gate, value = jnp.split(h, 2, axis=-1)
    if activation == "silu":
        act = jax.nn.silu(gate.astype(jnp.float32)).astype(gate.dtype)
    elif activation == "gelu":
        act = jax.nn.gelu(gate.astype(jnp.float32), approximate=True).astype(gate.dtype)
    else:
        raise ValueError(activation)
    return linear(params["linear_out"], act * value)


def mlp_gelu(params, x):
    """Plain linear1 -> gelu -> linear2 FFN (non-gating models,
    transformer.h linear1/linear2 path)."""
    h = linear(params["linear1"], x)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=True).astype(h.dtype)
    return linear(params["linear2"], h)
