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
from moshi_tpu.quant.formats import QuantTensor, quantize
from moshi_tpu.quant.policy import choose_format

# fused-attention names the safetensors checkpoints use vs the per-split
# names the reference stores in GGUF (transformer.h:764-849: in_proj_weight
# is sliced into in_projs.<i>.weight at load; the GGUF cache keeps the
# splits).  Temporal/mimi attention has exactly one split.
_GGUF_ALIASES = (
    (".in_proj_weight", ".in_projs.0.weight"),
    (".in_proj_bias", ".in_projs.0.bias"),
    (".out_proj.weight", ".out_projs.0.weight"),
    (".out_proj.bias", ".out_projs.0.bias"),
)


class _GGUFAdapter:
    """SafeTensors-like view over a reference GGUF file: resolves the
    CRC renaming of >=64-char names (loader.h:120-137) and the fused ->
    split attention aliases; quantized tensors come back as planar
    QuantTensors (io/gguf.py repack)."""

    def __init__(self, path: str):
        from moshi_tpu.io.gguf import GGUFReader
        self.reader = GGUFReader(path)

    def _stored(self, name: str):
        from moshi_tpu.io.gguf import gguf_tensor_name
        cands = [name]
        for suffix, alias in _GGUF_ALIASES:
            if name.endswith(suffix):
                cands.append(name[: -len(suffix)] + alias)
        for cand in cands:
            s = gguf_tensor_name(cand)
            if s in self.reader:
                return s
        return None

    def __contains__(self, name: str) -> bool:
        return self._stored(name) is not None

    def __getitem__(self, name: str):
        s = self._stored(name)
        if s is None:
            raise KeyError(name)
        if self.reader.is_quantized(s):
            return self.reader.get_quant(s)
        return self.reader.get(s)

    def close(self):
        self.reader.close()


class _Source:
    """Uniform view over one or more safetensors / GGUF files."""

    def __init__(self, *paths: str):
        self.files = [
            _GGUFAdapter(p) if p.endswith(".gguf") else SafeTensors(p)
            for p in paths
        ]

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


def _maybe_quant(name: str, w, fmt: Optional[str], dtype):
    if isinstance(w, QuantTensor):
        # already quantized on disk (GGUF repack) — the file's format wins
        return w.with_eff_scales()
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


# ---------------------------------------------------------------------------
# GGUF snapshotting (quantized-cache write — loader.h:227-233 analog,
# moshi_lm_save_gguf / mimi_save_gguf in moshi.cpp:177-179, 693-695).
# Tensor names follow the reference's GGUF conventions (split attention
# projections, derived codebook embeddings, CRC renaming) so the files
# interoperate with the reference's load_gguf and round-trip through
# load_lm_params/load_mimi_params above.
# ---------------------------------------------------------------------------


def _unstack(tree, idx):
    import jax
    return jax.tree_util.tree_map(lambda a: a[idx], tree)


def _save_float(writer, name, value):
    """Float leaf -> F32 (f32 leaves) or F16 when value-exact, else BF16."""
    a = np.asarray(value)
    if a.dtype == np.float32:
        writer.add_tensor(name, a)
        return
    f32 = a.astype(np.float32)
    f16 = f32.astype(np.float16)
    if np.array_equal(f16.astype(np.float32), f32):
        writer.add_tensor(name, f16)
    else:
        writer.add_tensor(name, value)  # jax bf16 -> GGML BF16


def _save_leaf(writer, name, value):
    if isinstance(value, QuantTensor):
        writer.add_tensor(name, value)
    else:
        _save_float(writer, name, value)


def _save_linear(writer, prefix: str, tree):
    _save_leaf(writer, prefix + ".weight", tree["weight"])
    if "bias" in tree:
        _save_float(writer, prefix + ".bias", tree["bias"])


def _save_norm(writer, prefix: str, tree):
    if "alpha" in tree:
        a = np.asarray(tree["alpha"], np.float32)
        writer.add_tensor(prefix + ".alpha", a.reshape(1, 1, -1))
    else:
        writer.add_tensor(prefix + ".weight",
                          np.asarray(tree["weight"], np.float32))
        writer.add_tensor(prefix + ".bias",
                          np.asarray(tree["bias"], np.float32))


def _save_attention(writer, prefix: str, tree):
    _save_leaf(writer, prefix + ".in_projs.0.weight",
               tree["in_proj"]["weight"])
    if "bias" in tree["in_proj"]:
        _save_float(writer, prefix + ".in_projs.0.bias",
                    tree["in_proj"]["bias"])
    _save_linear_split(writer, prefix, tree["out_proj"])


def _save_linear_split(writer, prefix: str, tree):
    _save_leaf(writer, prefix + ".out_projs.0.weight", tree["weight"])
    if "bias" in tree:
        _save_float(writer, prefix + ".out_projs.0.bias", tree["bias"])


def _save_text_emb(writer, prefix: str, tree):
    _save_leaf(writer, prefix + ".weight", tree["weight"])
    if "out1" in tree:
        _save_linear(writer, prefix + ".out1", tree["out1"])
        _save_linear(writer, prefix + ".out2", tree["out2"])
    if "low_rank" in tree:
        _save_linear(writer, prefix + ".low_rank", tree["low_rank"])


def save_lm_gguf(path: str, params, cfg: LMConfig,
                 metadata: Optional[dict] = None):
    """Snapshot an LM param tree (quantized or not) to GGUF."""
    from moshi_tpu.io.gguf import GGUFWriter
    w = GGUFWriter()
    w.add_kv("general.architecture", "moshi")
    for k, v in (metadata or {}).items():
        w.add_kv(k, v)
    _save_text_emb(w, "lm.text_emb", params["text_emb"])
    for i in range(cfg.n_q):
        _save_leaf(w, f"lm.emb.{i}.weight",
                   _unstack(params["emb"], i)["weight"])
    for i in range(cfg.num_layers):
        lp = f"lm.transformer.layers.{i}"
        layer = _unstack(params["transformer"]["layers"], i)
        _save_norm(w, lp + ".norm1", layer["norm1"])
        _save_norm(w, lp + ".norm2", layer["norm2"])
        _save_attention(w, lp + ".self_attn", layer["self_attn"])
        _save_linear(w, lp + ".gating.linear_in", layer["gating"]["linear_in"])
        _save_linear(w, lp + ".gating.linear_out",
                     layer["gating"]["linear_out"])
        if "cross_attention" in layer:
            _save_norm(w, lp + ".norm_cross", layer["norm_cross"])
            _save_attention(w, lp + ".cross_attention",
                            layer["cross_attention"])
    _save_norm(w, "lm.out_norm", params["out_norm"])
    _save_linear(w, "lm.text_linear", params["text_linear"])
    if "extra_heads" in params:
        for i in range(cfg.extra_heads_num):
            _save_linear(w, f"lm.extra_heads.{i}",
                         _unstack(params["extra_heads"], i))
    if "depformer" in params:
        dep = params["depformer"]
        for i in range(cfg.depformer_num_weights):
            _save_linear(w, f"lm.depformer_in.{i}", _unstack(dep["in"], i))
        _save_text_emb(w, "lm.depformer_text_emb", dep["text_emb"])
        if "emb" in dep:
            for i in range(cfg.dep_q - 1):
                _save_text_emb(w, f"lm.depformer_emb.{i}",
                               _unstack(dep["emb"], i))
        for i in range(cfg.dep_q):
            _save_linear(w, f"lm.linears.{i}", _unstack(dep["linears"], i))
        for i in range(cfg.depformer_layers):
            lp = f"lm.depformer.layers.{i}"
            _save_norm(w, lp + ".norm1",
                       _unstack(dep["layers"]["norm1"], i))
            _save_norm(w, lp + ".norm2",
                       _unstack(dep["layers"]["norm2"], i))
            for j in range(cfg.depformer_num_weights):
                # steps-outer [W, L, ...]
                attn = _unstack(dep["layers"]["self_attn"], (j, i))
                _save_leaf(w, f"{lp}.self_attn.in_projs.{j}.weight",
                           attn["in_proj"]["weight"])
                _save_leaf(w, f"{lp}.self_attn.out_projs.{j}.weight",
                           attn["out_proj"]["weight"])
                gate = _unstack(dep["layers"]["gating"], (j, i))
                _save_linear(w, f"{lp}.gating.{j}.linear_in",
                             gate["linear_in"])
                _save_linear(w, f"{lp}.gating.{j}.linear_out",
                             gate["linear_out"])
    w.write(path)


def save_mimi_gguf(path: str, params, model: MimiModel,
                   metadata: Optional[dict] = None):
    """Snapshot a Mimi param tree to GGUF (mimi_save_gguf analog)."""
    from moshi_tpu.io.gguf import GGUFWriter
    from moshi_tpu.nn.conv import StreamingConvTranspose1d, oiw_to_torch_convtr
    w = GGUFWriter()
    w.add_kv("general.architecture", "mimi")
    for k, v in (metadata or {}).items():
        w.add_kv(k, v)
    cfg = model.cfg

    def save_conv(prefix, tree, mod):
        if isinstance(mod, StreamingConvTranspose1d):
            wt = oiw_to_torch_convtr(np.asarray(tree["weight"], np.float32),
                                     mod.groups)
            _save_float(w, f"{prefix}.convtr.convtr.weight",
                        wt.astype(np.float16))
            if "bias" in tree:
                _save_float(w, f"{prefix}.convtr.convtr.bias", tree["bias"])
        else:
            _save_float(w, f"{prefix}.conv.conv.weight",
                        np.asarray(tree["weight"], np.float32)
                        .astype(np.float16))
            if "bias" in tree:
                _save_float(w, f"{prefix}.conv.conv.bias", tree["bias"])

    for net, tree, prefix in ((model.encoder, params["encoder"],
                               "mimi.encoder"),
                              (model.decoder, params["decoder"],
                               "mimi.decoder")):
        for name, mod in net.modules.items():
            save_conv(f"{prefix}.{name}", tree[name], mod)

    for tr in ("encoder_transformer", "decoder_transformer"):
        for i in range(cfg.transformer_layers):
            lp = f"mimi.{tr}.transformer.layers.{i}"
            layer = _unstack(params[tr]["layers"], i)
            _save_norm(w, lp + ".norm1", layer["norm1"])
            _save_norm(w, lp + ".norm2", layer["norm2"])
            _save_attention(w, lp + ".self_attn", layer["self_attn"])
            _save_linear(w, lp + ".linear1", layer["linear1"])
            _save_linear(w, lp + ".linear2", layer["linear2"])
            w.add_tensor(lp + ".layer_scale_1.scale",
                         np.asarray(layer["layer_scale_1"]["scale"],
                                    np.float32))
            w.add_tensor(lp + ".layer_scale_2.scale",
                         np.asarray(layer["layer_scale_2"]["scale"],
                                    np.float32))

    _save_float(w, "mimi.downsample.conv.conv.conv.weight",
                np.asarray(params["downsample"]["weight"], np.float32)
                .astype(np.float16))
    _save_float(w, "mimi.upsample.convtr.convtr.convtr.weight",
                oiw_to_torch_convtr(
                    np.asarray(params["upsample"]["weight"], np.float32),
                    cfg.dim).astype(np.float16))

    for branch, n in (("rvq_first", 1),
                      ("rvq_rest", cfg.total_codebooks - 1)):
        bp = f"mimi.quantizer.{branch}"
        btree = params["quantizer"][branch]
        embs = np.asarray(btree["embeddings"], np.float32)
        for j in range(n):
            w.add_tensor(f"{bp}.vq.layers.{j}._codebook.embedding", embs[j])
        for proj in ("input_proj", "output_proj"):
            pw = np.asarray(btree[proj]["weight"], np.float32)
            _save_float(w, f"{bp}.{proj}.weight",
                        pw[:, :, None].astype(np.float16))
    w.write(path)


