"""Checkpoint loading: safetensors -> param pytrees (+ on-load quantization).

Behavioral parity with the reference's two-phase WeightLoader
(/root/reference/src/loader.h) and the per-module get_weights walks:
  * Mimi checkpoint names (src/moshi.cpp:141-148 + module get_weights):
    "mimi.encoder.model.N.conv.conv.weight", "mimi.upsample.convtr.convtr.
    convtr.weight", "mimi.encoder_transformer.transformer.layers.I. ...",
    "mimi.quantizer.rvq_first.vq.layers.J._codebook.embedding_sum", ...
  * LM names under "lm." (src/moshi/models/lm.h:370-395): transformer
    layers with fused "self_attn.in_proj_weight", gating linears, rms-norm
    "alpha"s, depformer per-step "in_projs.J.weight"/"gating.J.*",
    "depformer_in.J.weight", low-rank depformer embeddings, per-codebook
    "linears.J.weight", "extra_heads.J.weight".
  * codebooks derived at load: embedding = embedding_sum /
    clamp(cluster_usage, 1e-5) (core_vq.h:58-85).
  * quantization policy with shape fallback (quant/policy.py mirrors
    loader.h:149-189); norms/biases stay f32, conv kernels bf16.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from moshi_tpu.io.safetensors import SafeTensors
from moshi_tpu.models.lm import LMConfig
from moshi_tpu.models.mimi import MimiModel
from moshi_tpu.nn.conv import torch_convtr_weight_to_oiw
from moshi_tpu.quant.formats import quantize
from moshi_tpu.quant.policy import choose_format


class _Source:
    """Uniform view over one or more safetensors files."""

    def __init__(self, *paths: str):
        self.files = [SafeTensors(p) for p in paths]

    def find(self, name: str) -> bool:
        return any(name in f for f in self.files)

    def get(self, name: str) -> np.ndarray:
        for f in self.files:
            if name in f:
                return f[name]
        raise KeyError(name)

    def get_opt(self, name: str) -> Optional[np.ndarray]:
        return self.get(name) if self.find(name) else None

    def close(self):
        for f in self.files:
            f.close()


def _as(dtype):
    return lambda a: jnp.asarray(np.asarray(a, np.float32)).astype(dtype)


def _maybe_quant(name: str, w: np.ndarray, fmt: Optional[str], dtype):
    actual = choose_format(name, w.shape, fmt) if fmt else None
    if actual:
        return quantize(np.asarray(w, np.float32), actual)
    return _as(dtype)(w)


def _linear(src: _Source, name: str, fmt, dtype):
    p = {"weight": _maybe_quant(name + ".weight", src.get(name + ".weight"),
                                fmt, dtype)}
    b = src.get_opt(name + ".bias")
    if b is not None:
        p["bias"] = _as(jnp.float32)(b)
    return p


def _norm(src: _Source, prefix: str, dtype):
    """rms norm ('alpha') or layer norm ('weight'/'bias')."""
    if src.find(prefix + ".alpha"):
        a = src.get(prefix + ".alpha")
        return {"alpha": _as(jnp.float32)(a).reshape(-1)}
    p = {"weight": _as(jnp.float32)(src.get(prefix + ".weight"))}
    b = src.get_opt(prefix + ".bias")
    p["bias"] = (_as(jnp.float32)(b) if b is not None
                 else jnp.zeros_like(p["weight"]))
    return p


def _conv(src: _Source, prefix: str, dtype, transpose: bool = False,
          groups: int = 1):
    key = "convtr.convtr" if transpose else "conv.conv"
    w = src.get(f"{prefix}.{key}.weight")
    if transpose:
        w = torch_convtr_weight_to_oiw(np.asarray(w, np.float32), groups)
    p = {"weight": _as(dtype)(w)}
    b = src.get_opt(f"{prefix}.{key}.bias")
    if b is not None:
        p["bias"] = _as(jnp.float32)(b)
    return p


def _attention(src: _Source, prefix: str, fmt, dtype):
    """Fused in_proj_weight + out_proj (single-step attention)."""
    w = src.get(prefix + ".in_proj_weight")
    p = {"in_proj": {"weight": _maybe_quant(prefix + ".in_proj_weight",
                                            w, fmt, dtype)},
         "out_proj": _linear(src, prefix + ".out_proj", fmt, dtype)}
    b = src.get_opt(prefix + ".in_proj_bias")
    if b is not None:
        p["in_proj"]["bias"] = _as(jnp.float32)(b)
    return p


def _stack(trees):
    import jax
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


# ---------------------------------------------------------------------------
# Mimi
# ---------------------------------------------------------------------------

def _codebook_embedding(src: _Source, prefix: str) -> np.ndarray:
    emb = src.get_opt(prefix + ".embedding")
    if emb is not None:
        return np.asarray(emb, np.float32)
    s = np.asarray(src.get(prefix + ".embedding_sum"), np.float32)
    u = np.asarray(src.get(prefix + ".cluster_usage"), np.float32)
    return s / np.clip(u, 1e-5, None)[:, None]


def _mimi_transformer_layers(src: _Source, prefix: str, n_layers: int,
                             dtype):
    layers = []
    for i in range(n_layers):
        lp = f"{prefix}.layers.{i}"
        layers.append({
            "norm1": _norm(src, lp + ".norm1", dtype),
            "self_attn": _attention(src, lp + ".self_attn", None, dtype),
            "norm2": _norm(src, lp + ".norm2", dtype),
            "linear1": _linear(src, lp + ".linear1", None, dtype),
            "linear2": _linear(src, lp + ".linear2", None, dtype),
            "layer_scale_1": {"scale": _as(jnp.float32)(
                src.get(lp + ".layer_scale_1.scale"))},
            "layer_scale_2": {"scale": _as(jnp.float32)(
                src.get(lp + ".layer_scale_2.scale"))},
        })
    return {"layers": _stack(layers)}


def _seanet_params(src: _Source, model, prefix: str, dtype):
    """model: SEANetEncoder/Decoder instance; uses its module table."""
    from moshi_tpu.nn.conv import StreamingConvTranspose1d
    out = {}
    for name, mod in model.modules.items():
        full = f"{prefix}.{name}"
        if isinstance(mod, StreamingConvTranspose1d):
            out[name] = _conv(src, full, dtype, transpose=True,
                              groups=mod.groups)
        else:
            out[name] = _conv(src, full, dtype)
    return out


def _proj_1x1(src: _Source, name: str, dtype):
    """1x1 conv projection stored [out, in, 1] -> linear weight [out, in]."""
    w = np.asarray(src.get(name + ".weight"), np.float32)
    if w.ndim == 3:
        w = w[:, :, 0]
    return {"weight": _as(dtype)(w)}


def _rvq_branch(src: _Source, prefix: str, n_q: int, dtype):
    embs = [
        _codebook_embedding(src, f"{prefix}.vq.layers.{i}._codebook")
        for i in range(n_q)
    ]
    return {
        "embeddings": jnp.asarray(np.stack(embs)),
        "input_proj": _proj_1x1(src, prefix + ".input_proj", dtype),
        "output_proj": _proj_1x1(src, prefix + ".output_proj", dtype),
    }


def load_mimi_params(path: str, model: MimiModel, dtype=jnp.bfloat16):
    """Load a Mimi checkpoint (tokenizer-*.safetensors) into a MimiModel
    param tree."""
    src = _Source(path)
    cfg = model.cfg
    try:
        params = {
            "encoder": _seanet_params(src, model.encoder, "mimi.encoder",
                                      dtype),
            "encoder_transformer": _mimi_transformer_layers(
                src, "mimi.encoder_transformer.transformer",
                cfg.transformer_layers, dtype),
            "downsample": {"weight": _as(dtype)(
                src.get("mimi.downsample.conv.conv.conv.weight"))},
            "quantizer": {
                "rvq_first": _rvq_branch(src, "mimi.quantizer.rvq_first",
                                         1, dtype),
                "rvq_rest": _rvq_branch(src, "mimi.quantizer.rvq_rest",
                                        cfg.total_codebooks - 1, dtype),
            },
            "upsample": {"weight": _as(dtype)(torch_convtr_weight_to_oiw(
                np.asarray(src.get(
                    "mimi.upsample.convtr.convtr.convtr.weight"),
                    np.float32), cfg.dim))},
            "decoder_transformer": _mimi_transformer_layers(
                src, "mimi.decoder_transformer.transformer",
                cfg.transformer_layers, dtype),
            "decoder": _seanet_params(src, model.decoder, "mimi.decoder",
                                      dtype),
        }
    finally:
        src.close()
    return params


# ---------------------------------------------------------------------------
# LM
# ---------------------------------------------------------------------------

def _text_emb(src: _Source, prefix: str, demux: bool, fmt, dtype):
    p = {"weight": _maybe_quant(prefix + ".weight", src.get(prefix + ".weight"),
                                fmt, dtype)}
    if demux:
        p["out1"] = _linear(src, prefix + ".out1", fmt, dtype)
        p["out2"] = _linear(src, prefix + ".out2", fmt, dtype)
    elif src.find(prefix + ".low_rank.weight"):
        p["low_rank"] = _linear(src, prefix + ".low_rank", None, dtype)
    return p


def _lm_transformer_layers(src: _Source, cfg: LMConfig, fmt, dtype):
    layers = []
    for i in range(cfg.num_layers):
        lp = f"lm.transformer.layers.{i}"
        layer = {
            "norm1": _norm(src, lp + ".norm1", dtype),
            "self_attn": _attention(src, lp + ".self_attn", fmt, dtype),
            "norm2": _norm(src, lp + ".norm2", dtype),
            "gating": {
                "linear_in": _linear(src, lp + ".gating.linear_in", fmt, dtype),
                "linear_out": _linear(src, lp + ".gating.linear_out", fmt, dtype),
            },
        }
        if cfg.cross_attention:
            layer["norm_cross"] = _norm(src, lp + ".norm_cross", dtype)
            layer["cross_attention"] = _attention(
                src, lp + ".cross_attention", fmt, dtype)
        layers.append(layer)
    return {"layers": _stack(layers)}


def _depformer_layers(src: _Source, cfg: LMConfig, fmt, dtype):
    w = cfg.depformer_num_weights
    layers = []
    for i in range(cfg.depformer_layers):
        lp = f"lm.depformer.layers.{i}"
        steps_attn = []
        steps_gate = []
        for j in range(w):
            steps_attn.append({
                "in_proj": {"weight": _maybe_quant(
                    f"{lp}.self_attn.in_projs.{j}.weight",
                    src.get(f"{lp}.self_attn.in_projs.{j}.weight"),
                    fmt, dtype)},
                "out_proj": {"weight": _maybe_quant(
                    f"{lp}.self_attn.out_projs.{j}.weight",
                    src.get(f"{lp}.self_attn.out_projs.{j}.weight"),
                    fmt, dtype)},
            })
            steps_gate.append({
                "linear_in": _linear(src, f"{lp}.gating.{j}.linear_in",
                                     fmt, dtype),
                "linear_out": _linear(src, f"{lp}.gating.{j}.linear_out",
                                      fmt, dtype),
            })
        layers.append({
            "norm1": _norm(src, lp + ".norm1", dtype),
            "norm2": _norm(src, lp + ".norm2", dtype),
            "self_attn": _stack(steps_attn),
            "gating": _stack(steps_gate),
        })
    stacked = _stack(layers)
    # steps-outer layout [W, L, ...] (see models/lm._init_depformer_layers)
    import jax
    for key in ("self_attn", "gating"):
        stacked[key] = jax.tree_util.tree_map(
            lambda a: jnp.swapaxes(a, 0, 1), stacked[key])
    return stacked


def load_lm_params(path: str, cfg: LMConfig, fmt: Optional[str] = None,
                   dtype=jnp.bfloat16, extra_paths: Tuple[str, ...] = ()):
    """Load a Moshi LM checkpoint into an LM param tree, quantizing matmul
    weights to `fmt` (q8_0/q4_0/q4_k) with the reference's fallback rules."""
    src = _Source(path, *extra_paths)
    try:
        params = {
            "text_emb": _text_emb(src, "lm.text_emb",
                                  cfg.demux_second_stream, fmt, dtype),
            "emb": {"weight": _stack([
                _maybe_quant(f"lm.emb.{i}.weight",
                             src.get(f"lm.emb.{i}.weight"), fmt, dtype)
                for i in range(cfg.n_q)])},
            "transformer": _lm_transformer_layers(src, cfg, fmt, dtype),
            "out_norm": _norm(src, "lm.out_norm", dtype),
            "text_linear": _linear(src, "lm.text_linear", fmt, dtype),
        }
        if cfg.extra_heads_num:
            params["extra_heads"] = _stack([
                _linear(src, f"lm.extra_heads.{i}", None, dtype)
                for i in range(cfg.extra_heads_num)])
        if cfg.dep_q > 0:
            dep = {
                "in": _stack([
                    _linear(src, f"lm.depformer_in.{i}", fmt, dtype)
                    for i in range(cfg.depformer_num_weights)]),
                "text_emb": _text_emb(src, "lm.depformer_text_emb",
                                      cfg.demux_second_stream, fmt, dtype),
                "layers": _depformer_layers(src, cfg, fmt, dtype),
                "linears": _stack([
                    _linear(src, f"lm.linears.{i}", fmt, dtype)
                    for i in range(cfg.dep_q)]),
            }
            if cfg.dep_q > 1:
                embs = [_text_emb(src, f"lm.depformer_emb.{i}", False,
                                  fmt, dtype)
                        for i in range(cfg.dep_q - 1)]
                dep["emb"] = _stack(embs)
            params["depformer"] = dep
    finally:
        src.close()
    return params
