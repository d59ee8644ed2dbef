"""Core layers: linear, norms, embeddings — functional, quant-aware.

Behavioral parity with the reference's torch-compat ops
(/root/reference/src/torch.h:14-152) and the scaled/demux embeddings
(/root/reference/src/moshi/models/lm_utils.h:14-217).

Conventions: activations are [B, T, C] (batch, time, channels); weights are
[O, I] row-major; params are plain nested dicts; quantized weights are
QuantTensor pytree leaves handled transparently by qmatmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from moshi_tpu.quant.formats import QuantTensor, dequantize_rows, qmatmul


# ---------------------------------------------------------------------------
# linear
# ---------------------------------------------------------------------------

def init_linear(key, in_dim: int, out_dim: int, bias: bool = False,
                dtype=jnp.float32, scale: float | None = None):
    if scale is None:
        scale = in_dim ** -0.5
    p = {"weight": jax.random.normal(key, (out_dim, in_dim), dtype) * scale}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), dtype)
    return p


def linear(params, x, out_dtype=None, pre_norm_alpha=None):
    """y = x @ W.T + b.  Works with plain or QuantTensor weights;
    pre_norm_alpha fuses an rms pre-norm of x."""
    y = qmatmul(x, params["weight"], out_dtype=out_dtype or x.dtype,
                pre_norm_alpha=pre_norm_alpha)
    if "bias" in params and params["bias"] is not None:
        y = y + params["bias"].astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# norms — f32 accumulation regardless of input dtype (torch.h LayerNorm;
# rms_norm_f32 upcast: transformer.h:10-27)
# ---------------------------------------------------------------------------

def init_layer_norm(dim: int, dtype=jnp.float32):
    return {"weight": jnp.ones((dim,), dtype), "bias": jnp.zeros((dim,), dtype)}


def init_rms_norm(dim: int, dtype=jnp.float32):
    # learned scale named `alpha` as in the checkpoint files
    return {"alpha": jnp.ones((dim,), dtype)}


def layer_norm(params, x, eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * params["weight"].astype(jnp.float32) + params["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm(params, x, eps: float = 1e-8):
    xf = x.astype(jnp.float32)
    ms = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(ms + eps) * params["alpha"].astype(jnp.float32)
    return y.astype(x.dtype)


def apply_norm(norm_type: str, params, x):
    if norm_type in ("rms_norm", "rms_norm_f32"):
        return rms_norm(params, x)
    if norm_type in ("layer_norm", "layer_norm_f32"):
        return layer_norm(params, x)
    raise ValueError(f"unknown norm {norm_type!r}")


def layer_scale(params, x):
    """Per-channel learned residual-branch scale (transformer.h:29-49)."""
    if params is None:
        return x
    return x * params["scale"].astype(x.dtype)


# ---------------------------------------------------------------------------
# embeddings
# ---------------------------------------------------------------------------

def init_embedding(key, card: int, dim: int, dtype=jnp.float32,
                   low_rank: int | None = None):
    k1, k2 = jax.random.split(key)
    if low_rank:
        return {
            "weight": jax.random.normal(k1, (card, low_rank), dtype),
            "low_rank": {"weight": jax.random.normal(k2, (dim, low_rank), dtype)
                         * (low_rank ** -0.5)},
        }
    return {"weight": jax.random.normal(k1, (card, dim), dtype)}


def embedding_lookup(params, ids, out_dtype=jnp.float32):
    """Plain table lookup supporting quantized tables."""
    table = params["weight"]
    if isinstance(table, QuantTensor):
        emb = dequantize_rows(table, ids, out_dtype)
    else:
        emb = jnp.take(table, ids, axis=0).astype(out_dtype)
    if "low_rank" in params:
        emb = linear(params["low_rank"], emb, out_dtype=out_dtype)
    return emb


def scaled_embedding(params, ids, out_dtype=jnp.float32, zero_id: int = -1):
    """Embedding with `-1 -> zero vector` semantics.

    The reference computes a host-side (index, scale) pair
    (lm_utils.h:14-60); on TPU we clamp the id and multiply by a mask —
    both stay on device.  Any negative id (zero=-1, ungenerated=-2) maps
    to the zero vector.
    """
    del zero_id
    mask = (ids >= 0)
    safe = jnp.where(mask, ids, 0)
    emb = embedding_lookup(params, safe, out_dtype)
    return emb * mask[..., None].astype(out_dtype)


def demux_embedding(params, ids, card: int, out_dtype=jnp.float32):
    """Demuxed two-stream text embedding (lm_utils.h:96-217).

    A muxed token t encodes two text streams: first = t % N,
    second = t / N - 1 with N = card (TokenIds.card, e.g. 8001); the +1
    shift makes `second == -1` mean absent.  Both are looked up in the
    *shared* table, passed through out1/out2 projections, and summed.
    The integer demux stays in-jit (cheap int ops on device; the
    reference notes it must run on the host only because GGML lacks
    integer div, lm_utils.h:9-12).

    params = {"weight": [N, D], "out1": linear, "out2": linear}.
    """
    has = ids >= 0
    first = jnp.where(has, ids % card, -1)
    second = jnp.where(has, ids // card - 1, -1)
    e1 = linear(params["out1"], scaled_embedding(params, first, out_dtype))
    e2 = linear(params["out2"], scaled_embedding(params, second, out_dtype))
    return (e1 + e2).astype(out_dtype)
