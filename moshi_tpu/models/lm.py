"""Moshi dual-transformer LM: temporal transformer + depth transformer.

Behavioral parity with /root/reference/src/moshi/models/lm.h and
lm_default.h:6-226:

  * temporal transformer over 12.5 Hz frames: input = text embedding
    (+ demuxed second text stream) + sum of n_q audio embeddings
    (+ condition_sum), rms-norm / rope / silu-gating stack, out_norm,
    text_linear logits (lm.h:555-700);
  * depformer: small transformer that autoregressively generates the
    dep_q audio codebooks within a frame, each step conditioned on
    transformer_out (per-step depformer_in projection) + the previous
    token's embedding, with **weights-per-step** attention/gating
    selected by depformer_weights_per_step_schedule
    (lm.h:443-553, transformer.h:55-146);
  * the LMGen delay-line cache of size max_delay+2 (+1 personaplex)
    applying per-codebook delays on input writes and output reads
    (lm.h:778-979) — here a [B, CT, K] int32 device array so the whole
    generation step is one jitted program (no per-frame host round-trips,
    unlike the reference's three D->H token syncs, SURVEY.md §3.1);
  * -1 (zero) / -2 (ungenerated) token semantics and the audio_delay
    suppression window (lm.h:905-918).

TPU design notes: the depformer's per-step weight sets are stacked with a
leading [W] axis and gathered by schedule index inside a lax.scan over the
dep_q steps — the analog of the reference's unrolled per-step graph
(lm.h:489-531) but compiled once.  Everything (delay cache, sampling,
depformer loop) runs on device; only the optional TTS text StateMachine
stays on host between the text and audio phases.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp

from moshi_tpu.config import MoshiConfig
from moshi_tpu.nn.layers import (demux_embedding, init_embedding, init_linear,
                                 init_rms_norm, linear, rms_norm,
                                 scaled_embedding)
from moshi_tpu.nn.sampling import sample_token
from moshi_tpu.nn.transformer import (TransformerConfig, init_layer_params,
                                      init_transformer_params,
                                      init_transformer_state,
                                      transformer_forward, transformer_layer)

UNGENERATED = -2  # lm.h:713
ZERO = -1


@dataclass(frozen=True)
class LMConfig:
    dim: int = 4096
    num_heads: int = 32
    num_layers: int = 32
    hidden_dim: int = 11264          # int(dim * hidden_scale)
    context: int = 3000
    max_period: float = 10_000.0
    causal: bool = True
    cross_attention: bool = False
    card: int = 2048
    n_q: int = 16
    dep_q: int = 8
    text_card: int = 32_000
    delays: Tuple[int, ...] = ()
    demux_second_stream: bool = False
    # depformer
    depformer_dim: int = 1024
    depformer_heads: int = 16
    depformer_layers: int = 6
    depformer_hidden: int = 4224     # depformer_dim_feedforward (7B config)
    depformer_context: int = 0       # 0 -> weights_per_step count
    depformer_max_period: float = 10_000.0
    depformer_pos_emb: str = "none"
    depformer_multi_linear: bool = True
    depformer_schedule: Tuple[int, ...] = ()
    depformer_low_rank: int = 128
    extra_heads_num: int = 0
    extra_heads_dim: int = 2
    delay_steps: int = 0             # audio_delay * frame_rate
    personaplex: bool = False
    kv_dtype: str = "bfloat16"       # KV ring storage (fp8 halves memory)

    # -- derived ---------------------------------------------------------
    @property
    def num_codebooks(self) -> int:  # text + audio streams
        return self.n_q + 1

    @property
    def runtime_dep_q(self) -> int:  # lm.h:803-804
        return 8 if self.personaplex else self.dep_q

    @property
    def max_delay(self) -> int:
        return max(self.delays) if self.delays else 0

    @property
    def cache_len(self) -> int:      # lm.h:726-729
        return self.max_delay + 2 + (1 if self.personaplex else 0)

    @property
    def schedule(self) -> Tuple[int, ...]:
        if self.depformer_schedule:
            return self.depformer_schedule
        return tuple(range(self.dep_q))

    @property
    def depformer_num_weights(self) -> int:
        return (max(self.schedule) + 1) if self.depformer_multi_linear else 1

    @property
    def text_initial(self) -> int:
        return self.text_card

    @property
    def audio_initial(self) -> int:
        return self.card

    @property
    def transformer(self) -> TransformerConfig:
        return TransformerConfig(
            dim=self.dim, num_heads=self.num_heads,
            num_layers=self.num_layers, hidden_dim=self.hidden_dim,
            context=self.context, causal=self.causal, norm="rms_norm_f32",
            gating="silu", rope_max_period=self.max_period,
            cross_attention=self.cross_attention, norm_cross="layer_norm",
            kv_dtype=self.kv_dtype)

    @property
    def depformer(self) -> TransformerConfig:
        cap = self.depformer_context or len(self.schedule) or self.dep_q
        rope = (self.depformer_max_period
                if self.depformer_pos_emb == "rope" else 0.0)
        return TransformerConfig(
            dim=self.depformer_dim, num_heads=self.depformer_heads,
            num_layers=self.depformer_layers, hidden_dim=self.depformer_hidden,
            context=cap, capacity=cap, causal=self.causal,
            norm="rms_norm_f32", gating="silu", rope_max_period=rope)

    @classmethod
    def from_moshi_config(cls, c: MoshiConfig, frame_rate: float = 12.5,
                          audio_delay: float = 0.0) -> "LMConfig":
        return cls(
            dim=c.dim, num_heads=c.num_heads, num_layers=c.num_layers,
            hidden_dim=int(c.dim * c.hidden_scale), context=c.context,
            max_period=float(c.max_period), causal=c.causal,
            cross_attention=c.cross_attention, card=c.card, n_q=c.n_q,
            dep_q=c.dep_q, text_card=c.text_card,
            delays=tuple(c.delays or [0] * (c.n_q + 1)),
            demux_second_stream=c.demux_second_stream,
            depformer_dim=c.depformer_dim,
            depformer_heads=c.depformer_num_heads,
            depformer_layers=c.depformer_num_layers,
            depformer_hidden=(c.depformer_dim_feedforward
                              or int(c.depformer_dim *
                                     (c.depformer_hidden_scale or 4.125))),
            depformer_context=c.depformer_context,
            depformer_max_period=float(c.depformer_max_period or 10_000),
            depformer_pos_emb=c.depformer_pos_emb,
            depformer_multi_linear=c.depformer_multi_linear,
            depformer_schedule=tuple(c.depformer_weights_per_step_schedule),
            depformer_low_rank=c.depformer_low_rank_embeddings,
            extra_heads_num=c.extra_heads_num_heads,
            extra_heads_dim=c.extra_heads_dim or 2,
            delay_steps=int(round(audio_delay * frame_rate)),
            personaplex=(c.model_type == "personaplex"),
        )


# ---------------------------------------------------------------------------
# parameters
# ---------------------------------------------------------------------------

def _init_text_emb(key, cfg: LMConfig, dim: int, dtype):
    if cfg.demux_second_stream:
        k0, k1, k2 = jax.random.split(key, 3)
        return {
            "weight": jax.random.normal(k0, (cfg.text_card + 1, dim), dtype),
            "out1": init_linear(k1, dim, dim, dtype=dtype),
            "out2": init_linear(k2, dim, dim, dtype=dtype),
        }
    return init_embedding(key, cfg.text_card + 1, dim, dtype)


def _init_depformer_layers(key, cfg: LMConfig, dtype):
    """Stacked depformer layers, **steps-outer**: shared norms [L, ...],
    per-step attention and gating weights [W, L, ...].

    Steps-outer layout lets the per-frame scan over depformer steps
    consume the weight stacks as scan xs directly — zero per-step weight
    gathers at runtime (the reference selects per-step weight sets by
    index each step, transformer.h:55-146; here the selection is baked
    into the layout once at init/load)."""
    dcfg = cfg.depformer
    w = cfg.depformer_num_weights
    keys = jax.random.split(key, dcfg.num_layers)

    def one_layer(k):
        ks = jax.random.split(k, w)
        per_step = [init_layer_params(kk, dcfg, dtype) for kk in ks]
        stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_step)
        return {
            "norm1": per_step[0]["norm1"],      # norms are shared across steps
            "norm2": per_step[0]["norm2"],
            "self_attn": stacked["self_attn"],  # [W, ...]
            "gating": stacked["gating"],        # [W, ...]
        }

    layers = [one_layer(k) for k in keys]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)
    # [L, W, ...] -> [W, L, ...] for the per-step leaves
    for key_ in ("self_attn", "gating"):
        stacked[key_] = jax.tree_util.tree_map(
            lambda a: jnp.swapaxes(a, 0, 1), stacked[key_])
    return stacked


def init_lm_params(key, cfg: LMConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 12)
    emb_scale = cfg.dim ** -0.5
    p = {
        "text_emb": _init_text_emb(ks[0], cfg, cfg.dim, dtype),
        "emb": {"weight": jax.random.normal(
            ks[1], (cfg.n_q, cfg.card + 1, cfg.dim), dtype) * emb_scale},
        "transformer": init_transformer_params(ks[2], cfg.transformer, dtype),
        "out_norm": init_rms_norm(cfg.dim, dtype),
        "text_linear": init_linear(ks[3], cfg.dim, cfg.text_card, dtype=dtype),
    }
    # scale text emb like audio embs
    p["text_emb"]["weight"] = p["text_emb"]["weight"] * emb_scale
    if cfg.extra_heads_num:
        hk = jax.random.split(ks[4], cfg.extra_heads_num)
        heads = [init_linear(k, cfg.dim, cfg.extra_heads_dim, dtype=dtype)
                 for k in hk]
        p["extra_heads"] = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *heads)
    if cfg.dep_q > 0:
        dd = cfg.depformer_dim
        dep = {
            "in": {"weight": jax.random.normal(
                ks[5], (cfg.depformer_num_weights, dd, cfg.dim), dtype)
                * cfg.dim ** -0.5},
            "text_emb": _init_text_emb(ks[6], cfg, dd, dtype),
            "layers": _init_depformer_layers(ks[7], cfg, dtype),
            "linears": {"weight": jax.random.normal(
                ks[8], (cfg.dep_q, cfg.card, dd), dtype) * dd ** -0.5},
        }
        if cfg.dep_q > 1:
            lr = cfg.depformer_low_rank
            dep["emb"] = {
                "weight": jax.random.normal(
                    ks[9], (cfg.dep_q - 1, cfg.card + 1, lr), dtype),
                "low_rank": {"weight": jax.random.normal(
                    ks[10], (cfg.dep_q - 1, dd, lr), dtype) * lr ** -0.5},
            }
        p["depformer"] = dep
    return p


# ---------------------------------------------------------------------------
# temporal transformer forward
# ---------------------------------------------------------------------------

def embed_frame(cfg: LMConfig, params, tokens, condition_sum=None,
                dtype=jnp.float32):
    """tokens [B, T, K] (text stream 0 + n_q audio) -> [B, T, dim]."""
    text_ids = tokens[..., 0]
    if cfg.demux_second_stream:
        x = demux_embedding(params["text_emb"], text_ids, cfg.text_card + 1,
                            dtype)
    else:
        x = scaled_embedding(params["text_emb"], text_ids, dtype)
    audio_ids = jnp.moveaxis(tokens[..., 1:], -1, 0)       # [n_q, B, T]
    tables = params["emb"]["weight"]                        # [n_q, card+1, dim]

    def one(table, ids):
        return scaled_embedding({"weight": table}, ids, dtype)
    audio_emb = jax.vmap(one)(tables, audio_ids)            # [n_q, B, T, dim]
    x = x + jnp.sum(audio_emb, axis=0)
    if condition_sum is not None:
        x = x + condition_sum[:, None, :].astype(x.dtype)
    return x


def temporal_forward(cfg: LMConfig, params, kv_state, tokens, offset,
                     condition_sum=None, cross_kv=None):
    """tokens [B, T, K] -> (transformer_out [B, T, dim],
    text_logits [B, T, text_card], new_kv_state)."""
    from moshi_tpu.utils.capture import capture
    x = capture("lm/embed", embed_frame(cfg, params, tokens, condition_sum))
    h, new_kv = transformer_forward(cfg.transformer, params["transformer"],
                                    kv_state, x, offset, cross_kv,
                                    tap="lm/temporal")
    h = capture("lm/transformer_out", rms_norm(params["out_norm"], h))
    from moshi_tpu.parallel.pp import current_pp
    from moshi_tpu.parallel.tp import current_tp
    from moshi_tpu.quant.formats import QuantTensor, pallas_enabled
    tp = current_tp()
    pp = current_pp()
    if (tp is not None and pallas_enabled()
            and isinstance(params["text_linear"]["weight"], QuantTensor)):
        # row-sharded head: per-shard pallas kernel + gathered logits.
        # Checked before pp: on a 3-axis TPxPP mesh the TP shard_map's
        # specs never mention "pp", so it runs pp-replicated — real
        # sharding beats pp's replicated-weights wrapper.
        from moshi_tpu.parallel.tp import tp_row_logits
        logits = capture("lm/text_logits", tp_row_logits(
            h, params["text_linear"]["weight"], tp))
    elif (pp is not None and pallas_enabled()
            and isinstance(params["text_linear"]["weight"], QuantTensor)):
        # replicated head inside a shard_map (Mosaic kernels cannot be
        # auto-partitioned over the pp mesh)
        from moshi_tpu.parallel.pp import pp_head_logits
        logits = capture("lm/text_logits", pp_head_logits(
            h, params["text_linear"]["weight"], pp))
    else:
        logits = capture("lm/text_logits",
                         linear(params["text_linear"], h,
                                out_dtype=jnp.float32))
    return h, logits, new_kv


# ---------------------------------------------------------------------------
# depformer
# ---------------------------------------------------------------------------

def _gather_step(tree, idx):
    return jax.tree_util.tree_map(
        lambda a: jax.lax.dynamic_index_in_dim(a, idx, 0, keepdims=False),
        tree)


def _depformer_text_embed(cfg: LMConfig, dep_params, text_token):
    if cfg.demux_second_stream:
        return demux_embedding(dep_params["text_emb"], text_token,
                               cfg.text_card + 1)
    return scaled_embedding(dep_params["text_emb"], text_token)


def _per_step_weights(cfg: LMConfig, dep):
    """Assemble the scan-xs tree of per-step weights [dep_q, ...]:
    schedule selection is a trace-time (static) gather — for the usual
    identity schedule it is a no-op view."""
    dep_q = cfg.runtime_dep_q
    sched = list(cfg.schedule[:dep_q]) if len(cfg.schedule) >= dep_q \
        else list(range(dep_q))
    ident = sched == list(range(dep_q)) and \
        cfg.depformer_num_weights == dep_q

    def sel(tree):
        if ident:
            return tree
        idx = jnp.asarray(sched)
        return jax.tree_util.tree_map(lambda a: a[idx], tree)

    def head(tree, n):
        # slice stacked leaves to the runtime step count (personaplex
        # runs dep_q = 8 of the model's 16, lm.h:803-804)
        return jax.tree_util.tree_map(lambda a: a[:n], tree)

    xs = {
        "in": sel(dep["in"]),                         # [dep_q, dd, dim]
        "attn": sel(dep["layers"]["self_attn"]),      # [dep_q, L, ...]
        "gating": sel(dep["layers"]["gating"]),       # [dep_q, L, ...]
        "linears": head(dep["linears"], dep_q),       # [dep_q, card, dd]
    }
    if cfg.dep_q > 1:
        # step cb uses emb[cb-1]; prepend a dummy row so xs align by step
        emb = dep["emb"]
        pad = jax.tree_util.tree_map(lambda a: a[:1], emb)
        xs["emb"] = jax.tree_util.tree_map(
            lambda p, a: jnp.concatenate([p, a[: dep_q - 1]], axis=0),
            pad, emb)
    return xs


def _can_use_dep_megakernel(cfg: LMConfig, dep, b: int) -> bool:
    """Whole-layer depformer megakernel preconditions: pallas on, B=1,
    no rope, rms norms, q4_k weights without biases."""
    import os
    from moshi_tpu.quant.formats import QuantTensor, pallas_enabled
    # OPT-IN only — see nn/transformer.can_use_temporal_megakernel
    if os.environ.get("MOSHI_TPU_MEGAKERNEL", "") not in ("dep", "all"):
        return False
    if not (pallas_enabled() and b == 1):
        return False
    if cfg.depformer.rope_max_period or not cfg.depformer.gating:
        return False
    lay = dep["layers"]
    main = [lay["self_attn"]["in_proj"], lay["self_attn"]["out_proj"],
            lay["gating"]["linear_in"]]
    for lf in main:
        w = lf.get("weight")
        if not (isinstance(w, QuantTensor) and w.fmt == "q4_k"):
            return False
        if "bias" in lf:
            return False
    lo = lay["gating"]["linear_out"]
    w = lo.get("weight")
    # linear_out's K (depformer hidden, 4224 on 7B) is often not a 256
    # multiple -> policy makes it q4_0; the kernel supports both, as long
    # as scale blocks don't straddle the planar half (K % 64 == 0)
    from moshi_tpu.quant.formats import pallas_layout_ok
    if not (isinstance(w, QuantTensor) and w.fmt in ("q4_k", "q4_0")
            and pallas_layout_ok(w)):
        return False
    if "bias" in lo:
        return False
    return True


def _can_use_dep_frame_kernel(cfg: LMConfig, dep, step_w, b: int) -> bool:
    """Whole-FRAME depformer kernel preconditions: the megakernel set plus
    q4_k per-step output linears, a low-rank embedding stack (dep_q > 1),
    lane-aligned card, and a no-wrap ring (cap >= dep_q)."""
    from moshi_tpu.quant.formats import QuantTensor
    if not _can_use_dep_megakernel(cfg, dep, b):
        return False
    if cfg.runtime_dep_q <= 1 or "emb" not in step_w:
        return False
    lw = step_w["linears"]["weight"]
    if not (isinstance(lw, QuantTensor) and lw.fmt == "q4_k"):
        return False
    if cfg.card % 128:
        return False
    if cfg.depformer.mha.cap < cfg.runtime_dep_q:
        return False
    inw = step_w["in"]["weight"]
    if not isinstance(inw, QuantTensor):
        return False
    ew = step_w["emb"]["weight"]
    lrw = step_w["emb"]["low_rank"]["weight"]
    if isinstance(ew, QuantTensor) or isinstance(lrw, QuantTensor):
        return False
    # the kernel computes pure matmuls; any bias a checkpoint might carry
    # would be silently dropped -> fall back to the scan path instead
    for mod in (step_w["in"], step_w["linears"], step_w["emb"]["low_rank"]):
        if mod.get("bias") is not None:
            return False
    return True


def _depformer_generate_frame_kernel(cfg: LMConfig, params, transformer_out,
                                     text_token, key, step_w,
                                     temp: float, top_k: int):
    """ONE pallas launch for the whole depformer frame (all dep_q steps,
    all layers, logits and sampling in-kernel; nn/pallas_depformer.py
    dep_frame_step).  The per-step depformer_in projections are token-
    independent, so they are batched OUTSIDE as a single tall matmul."""
    from moshi_tpu.nn.pallas_depformer import dep_frame_step
    from moshi_tpu.quant.formats import flatten_lead, qmatmul
    dep = params["depformer"]
    dcfg = cfg.depformer
    dep_q = cfg.runtime_dep_q
    dd = dcfg.dim
    card = cfg.card
    text_emb = _depformer_text_embed(cfg, dep, text_token)     # [1, dd]
    h_in = qmatmul(transformer_out, flatten_lead(step_w["in"]["weight"]))
    h_in_all = h_in.reshape(dep_q, 1, dd)
    if temp == 0.0:
        noise = jnp.zeros((dep_q, 1, card), jnp.float32)
    else:
        noise = jax.random.gumbel(key, (dep_q, 1, card), jnp.float32)
    lay = dep["layers"]
    weights = {
        "qkv": step_w["attn"]["in_proj"]["weight"],      # [W, L, 3dd, dd]
        "out": step_w["attn"]["out_proj"]["weight"],
        "glu": step_w["gating"]["linear_in"]["weight"],
        "lout": step_w["gating"]["linear_out"]["weight"],
        "n1": lay["norm1"]["alpha"], "n2": lay["norm2"]["alpha"],
        "linears": step_w["linears"]["weight"],          # [W, card, dd]
        "emb": step_w["emb"]["weight"],                  # [W, card+1, lr]
        "lr_w": step_w["emb"]["low_rank"]["weight"],     # [W, dd, lr]
    }
    tokens = dep_frame_step(
        h_in_all, text_emb.astype(jnp.float32), weights, noise,
        cap=dcfg.mha.cap, heads=dcfg.num_heads, nlayers=dcfg.num_layers,
        card=card, temp=float(temp), top_k=int(top_k))
    return tokens[None, :]                               # [B=1, dep_q]


def _depformer_generate_megakernel(cfg: LMConfig, params, transformer_out,
                                   text_token, keys, step_w,
                                   temp: float, top_k: int):
    """dep_q-step scan whose body runs the WHOLE 6-layer depformer in a
    single pallas launch (nn/pallas_depformer.py dep_full_step): per-frame
    depformer launches drop from ~60 XLA ops/step to ~6 kernels total.
    KV rings are flat [L, cap, dd] (head-major lanes)."""
    from moshi_tpu.nn.pallas_depformer import dep_full_step
    dep = params["depformer"]
    dcfg = cfg.depformer
    dep_q = cfg.runtime_dep_q
    dd = dcfg.dim
    cap = dcfg.mha.cap
    nl = dcfg.num_layers
    text_emb = _depformer_text_embed(cfg, dep, text_token)
    kv0 = (jnp.zeros((nl, cap, dd), jnp.bfloat16),
           jnp.zeros((nl, cap, dd), jnp.bfloat16))
    lay = dep["layers"]

    def step(carry, xs):
        prev_token, (kfl, vfl) = carry
        cb, k_cb, w = xs
        h = linear(w["in"], transformer_out)                # [1, dd]
        if cfg.dep_q > 1:
            e = scaled_embedding({"weight": w["emb"]["weight"]}, prev_token)
            audio_emb = linear(w["emb"]["low_rank"], e)
            tok_emb = jnp.where(cb == 0, text_emb, audio_emb)
        else:
            tok_emb = text_emb
        hh = (h + tok_emb).astype(jnp.float32)              # [1, dd]
        weights = {
            "qkv": w["attn"]["in_proj"]["weight"],          # [L, 3dd, dd]
            "out": w["attn"]["out_proj"]["weight"],
            "glu": w["gating"]["linear_in"]["weight"],
            "lout": w["gating"]["linear_out"]["weight"],
            "n1": lay["norm1"]["alpha"], "n2": lay["norm2"]["alpha"],
        }
        y, k_new, v_new = dep_full_step(
            hh, kfl, vfl, cb, weights, cap=cap, heads=dcfg.num_heads,
            nlayers=nl)
        logits = linear(w["linears"], y).astype(jnp.float32)  # [1, card]
        token = sample_token(logits, k_cb, temp, top_k)        # [1]
        return (token, (k_new, v_new)), token

    xs = {"in": step_w["in"], "attn": step_w["attn"],
          "gating": step_w["gating"], "linears": step_w["linears"]}
    if cfg.dep_q > 1:
        xs["emb"] = step_w["emb"]
    (_, _), tokens = jax.lax.scan(
        step, (text_token, kv0),
        (jnp.arange(dep_q, dtype=jnp.int32), keys, xs))
    return jnp.moveaxis(tokens, 0, 1)                       # [B, dep_q]


def _can_use_dep_stacked(cfg: LMConfig, step_w, b: int) -> bool:
    """Copy-free depformer scan preconditions (mirrors
    nn/transformer.can_use_stacked_decode): pallas on, rms norms + silu
    gating, every hot projection a QuantTensor in a pallas layout with no
    bias.  Megakernels (opt-in) take precedence when requested."""
    import os
    from moshi_tpu.quant.formats import (QuantTensor, pallas_enabled,
                                         pallas_layout_ok)
    if os.environ.get("MOSHI_TPU_NO_STACKED"):
        return False
    if not pallas_enabled():
        return False
    dcfg = cfg.depformer
    if not dcfg.norm.startswith("rms_norm") or dcfg.gating != "silu":
        return False
    if dcfg.mha.cap < cfg.runtime_dep_q:
        return False
    from moshi_tpu.quant.pallas_matmul import storage_ok
    mods = [step_w["attn"]["in_proj"], step_w["attn"]["out_proj"],
            step_w["gating"]["linear_in"], step_w["gating"]["linear_out"],
            step_w["in"]]
    for lf in mods:
        w = lf.get("weight")
        if not (isinstance(w, QuantTensor) and pallas_layout_ok(w)):
            return False
        if not storage_ok(w, b):
            return False  # i8 storage is int8-MXU-only (B=1 decode)
        if lf.get("bias") is not None:
            return False
    # per-codebook output linears may be dense (policy keeps small heads
    # bf16) — the stacked body handles both
    lw = step_w["linears"].get("weight")
    if isinstance(lw, QuantTensor) and not pallas_layout_ok(lw):
        return False
    if step_w["linears"].get("bias") is not None:
        return False
    if cfg.dep_q > 1:
        if step_w["emb"]["low_rank"].get("bias") is not None:
            return False
    return True


def _depformer_generate_stacked(cfg: LMConfig, norms, text_emb,
                                transformer_out, text_token, keys, step_w,
                                temp: float, top_k: int, tp_axis=None):
    """Copy-free depformer: the (step, layer) scans pass WHOLE stacked
    weight buffers into scalar-prefetch pallas kernels indexed by the
    flat step*L+layer number, the per-frame KV rings live outside the
    layer scan (one stacked DUS per step), and the token-independent
    depformer_in projections batch into a single tall matmul up front.
    Round 1 threaded every per-step weight as scan xs — each step
    dynamic-slice-copied its full weight set before use."""
    from moshi_tpu.nn.pallas_attention import decode_attention_stacked
    from moshi_tpu.quant.formats import flatten_lead, qmatmul
    from moshi_tpu.quant.pallas_matmul import (glu_matmul_pallas_stacked,
                                               qmatmul_pallas_stacked)
    dcfg = cfg.depformer
    dep_q = cfg.runtime_dep_q
    b = transformer_out.shape[0]
    nl, dd = dcfg.num_layers, dcfg.dim
    hd = dcfg.mha.head_dim
    cap = dcfg.mha.cap
    # under TP (inside shard_map) the attention projections are head-
    # sharded; local head count falls out of the local fused-qkv rows
    ddl = step_w["attn"]["in_proj"]["weight"].q.shape[-2] // 3
    nh = ddl // hd
    h_in = qmatmul(transformer_out.astype(jnp.bfloat16),
                   flatten_lead(step_w["in"]["weight"]))
    h_in_all = jnp.moveaxis(h_in.reshape(b, dep_q, dd), 1, 0)   # [W, B, dd]
    attn_in = step_w["attn"]["in_proj"]["weight"]               # [W, L, ...]
    attn_out = step_w["attn"]["out_proj"]["weight"]
    glu_in = step_w["gating"]["linear_in"]["weight"]
    glu_out = step_w["gating"]["linear_out"]["weight"]
    lin_w = step_w["linears"]["weight"]                         # [W, card, dd]
    # norms are per-layer (shared across steps): tile so row cb*L+l of the
    # flat alpha matches the weights' flat (step, layer) row order
    n1t = jnp.tile(norms["norm1"]["alpha"], (dep_q, 1))
    n2t = jnp.tile(norms["norm2"]["alpha"], (dep_q, 1))
    kv_dt = jnp.dtype(dcfg.kv_dtype)
    kv0 = (jnp.zeros((nl, b, cap, nh, hd), kv_dt),
           jnp.zeros((nl, b, cap, nh, hd), kv_dt))
    use_rope = bool(dcfg.rope_max_period)
    # mid-grain fusion for the depformer layers too (the same
    # out_proj+residual+norm2+GLU merge as the temporal stack; on the
    # 7B this removes dep_q x L = 48 launches/frame) — flat (step,
    # layer) indices feed the fused kernel's scalar-prefetch row maps
    from moshi_tpu.quant.formats import QuantTensor as _QT_
    from moshi_tpu.quant.pallas_fused import (attn_ffn_fused_i8,
                                              can_fuse_mid,
                                              fuse_mid_enabled)
    from moshi_tpu.quant.pallas_matmul import _int8_dispatch
    from moshi_tpu.utils.capture import recording_active
    fuse_mid = (tp_axis is None and fuse_mid_enabled()
                and not recording_active()
                and isinstance(attn_out, _QT_) and isinstance(glu_in, _QT_)
                and _int8_dispatch(attn_out, b)
                and _int8_dispatch(glu_in, b)
                and can_fuse_mid(attn_out, glu_in, b))

    def step(carry, xs):
        prev_token, (k_stack, v_stack) = carry
        if cfg.dep_q > 1:
            cb, k_cb, h, w_emb = xs
            e = scaled_embedding({"weight": w_emb["weight"]}, prev_token)
            audio_emb = linear(w_emb["low_rank"], e)
            tok_emb = jnp.where(cb == 0, text_emb, audio_emb)
        else:
            cb, k_cb, h = xs
            tok_emb = text_emb
        hcur = (h + tok_emb).astype(jnp.bfloat16)               # [B, dd]
        offset_b = jnp.full((b,), cb, jnp.int32)
        cos_sin = None
        if use_rope:
            from moshi_tpu.nn.rope import rope_angles
            cos_sin = rope_angles(offset_b[:, None], hd,
                                  dcfg.rope_max_period)

        def layer_body(hh, l):
            n = cb * nl + l
            qkv = qmatmul_pallas_stacked(hh, attn_in, n, alpha=n1t)
            if cos_sin is not None:
                from moshi_tpu.nn.rope import apply_rope
                qk = qkv[:, : 2 * ddl].reshape(b, 1, 2 * nh, hd)
                qk = apply_rope(qk, cos_sin=cos_sin)
                q, k_new = qk[:, 0, :nh], qk[:, 0, nh:]
            else:
                q = qkv[:, :ddl].reshape(b, nh, hd)
                k_new = qkv[:, ddl:2 * ddl].reshape(b, nh, hd)
            v_new = qkv[:, 2 * ddl:].reshape(b, nh, hd)
            attn = decode_attention_stacked(
                q.astype(jnp.bfloat16), k_stack, v_stack,
                k_new.astype(jnp.bfloat16), v_new.astype(jnp.bfloat16),
                offset_b, l, cap=cap, context=dcfg.context)
            if fuse_mid:
                g, h_mid = attn_ffn_fused_i8(
                    attn.reshape(b, ddl).astype(jnp.bfloat16), hh,
                    attn_out, glu_in, n2t, n)
                ffn = qmatmul_pallas_stacked(
                    g.astype(jnp.bfloat16), glu_out, n)
                hh = (h_mid + ffn).astype(hh.dtype)
                return hh, (k_new.astype(kv_dt), v_new.astype(kv_dt))
            o = qmatmul_pallas_stacked(
                attn.reshape(b, ddl).astype(jnp.bfloat16), attn_out, n)
            if tp_axis is not None:
                o = jax.lax.psum(o, tp_axis)
            hh = hh + o.astype(hh.dtype)
            g = glu_matmul_pallas_stacked(hh, glu_in, n, alpha=n2t)
            if g is None:
                gh = qmatmul_pallas_stacked(hh, glu_in, n, alpha=n2t)
                gate, value = jnp.split(gh, 2, axis=-1)
                g = jax.nn.silu(gate) * value
            ffn = qmatmul_pallas_stacked(
                g.astype(jnp.bfloat16), glu_out, n)
            if tp_axis is not None:
                ffn = jax.lax.psum(ffn, tp_axis)
            hh = hh + ffn.astype(hh.dtype)
            return hh, (k_new.astype(kv_dt), v_new.astype(kv_dt))

        from moshi_tpu.utils.capture import capture as _cap
        hcur = _cap("lm/dep/h_in", hcur)
        y, (ks, vs) = jax.lax.scan(layer_body, hcur,
                                   jnp.arange(nl, dtype=jnp.int32))
        y = _cap("lm/dep/step_out", y)
        slot = (cb % cap).astype(jnp.int32)
        z = jnp.int32(0)
        kc = jax.lax.dynamic_update_slice(k_stack, ks[:, :, None],
                                          (z, z, slot, z, z))
        vc = jax.lax.dynamic_update_slice(v_stack, vs[:, :, None],
                                          (z, z, slot, z, z))
        from moshi_tpu.quant.formats import QuantTensor as _QT
        if isinstance(lin_w, _QT):
            logits = qmatmul_pallas_stacked(y, lin_w, cb)  # [B, card(/S)]
            if tp_axis is not None:
                # quantized linears are contiguously row-sharded on card
                logits = jax.lax.all_gather(logits, tp_axis, axis=1,
                                            tiled=True)
        else:
            # dense small heads stay replicated: tiny dynamic-index copy
            wl = jax.lax.dynamic_index_in_dim(lin_w, cb, 0, keepdims=False)
            logits = jax.lax.dot_general(
                y.astype(wl.dtype), wl, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        logits = _cap("lm/dep/logits", logits)
        token = _cap("lm/dep/token", sample_token(
            logits.astype(jnp.float32), k_cb, temp, top_k))
        return (token, (kc, vc)), token

    xs = [jnp.arange(dep_q, dtype=jnp.int32), keys, h_in_all]
    if cfg.dep_q > 1:
        xs.append(step_w["emb"])
    (_, _), tokens = jax.lax.scan(step, (text_token, kv0), tuple(xs))
    return jnp.moveaxis(tokens, 0, 1)                           # [B, dep_q]


def depformer_generate(cfg: LMConfig, params, transformer_out, text_token,
                       key, temp: float, top_k: int):
    """Generate dep_q audio tokens for one frame.

    transformer_out: [B, dim]; text_token: [B] (already machine-processed
    for TTS).  Returns tokens [B, dep_q] int32.  The depformer KV state is
    per-frame (capacity = dep_q / depformer_context) and created fresh here
    — the reference resets it every frame too (lm.h:478-553).  All
    per-step weights are threaded as scan xs (steps-outer layout): no
    weight gathers inside the loop."""
    dep = params["depformer"]
    dcfg = cfg.depformer
    dep_q = cfg.runtime_dep_q
    b = transformer_out.shape[0]
    keys = jax.random.split(key, dep_q)
    step_w = _per_step_weights(cfg, dep)
    if _can_use_dep_frame_kernel(cfg, dep, step_w, b):
        return _depformer_generate_frame_kernel(
            cfg, params, transformer_out, text_token, key, step_w,
            temp, top_k)
    if _can_use_dep_megakernel(cfg, dep, b):
        return _depformer_generate_megakernel(
            cfg, params, transformer_out, text_token, keys, step_w,
            temp, top_k)
    from moshi_tpu.parallel.pp import current_pp as _current_pp
    from moshi_tpu.parallel.tp import current_tp as _current_tp
    from moshi_tpu.quant.formats import pallas_enabled as _pe
    if ((_current_tp() is not None or _current_pp() is not None) and _pe()
            and not _can_use_dep_stacked(cfg, step_w, b)):
        raise ValueError(
            "tp_scope/pp_scope is active but the depformer does not satisfy "
            "the stacked-kernel preconditions (quantized pallas-layout "
            "projections, rms norm, silu gating, no biases) — explicit "
            "TP/PP only runs the stacked path")
    if _can_use_dep_stacked(cfg, step_w, b):
        from moshi_tpu.parallel.pp import current_pp
        from moshi_tpu.parallel.tp import current_tp
        norms = {"norm1": dep["layers"]["norm1"],
                 "norm2": dep["layers"]["norm2"]}
        text_emb = _depformer_text_embed(cfg, dep, text_token)
        tp = current_tp()
        if tp is not None:
            # checked before pp: on a 3-axis TPxPP mesh the TP shard_map
            # runs pp-replicated (its specs never mention "pp") and
            # actually shards the per-step weights over `model`
            from moshi_tpu.parallel.tp import tp_depformer_generate
            return tp_depformer_generate(
                cfg, norms, text_emb, transformer_out, text_token, keys,
                step_w, temp, top_k, tp)
        pp = current_pp()
        if pp is not None:
            from moshi_tpu.parallel.pp import pp_depformer_generate
            return pp_depformer_generate(
                cfg, norms, text_emb, transformer_out, text_token, keys,
                step_w, temp, top_k, pp)
        return _depformer_generate_stacked(
            cfg, norms, text_emb, transformer_out, text_token, keys,
            step_w, temp, top_k)
    kv0 = init_transformer_state(dcfg, b)
    # the text embedding (step 0's token input) is loop-invariant:
    # compute it once outside the scan and select per step — cheaper than
    # a lax.cond branch at this chip's per-op cost
    text_emb = _depformer_text_embed(cfg, dep, text_token)  # [B, dd]

    def step(carry, xs):
        prev_token, kv = carry
        cb, k_cb, w = xs
        h = linear(w["in"], transformer_out)                # [B, dd]
        if cfg.dep_q > 1:
            e = scaled_embedding({"weight": w["emb"]["weight"]}, prev_token)
            audio_emb = linear(w["emb"]["low_rank"], e)
            tok_emb = jnp.where(cb == 0, text_emb, audio_emb)
        else:
            tok_emb = text_emb
        x = (h + tok_emb)[:, None, :]                       # [B, 1, dd]
        offset_b = jnp.full((b,), cb, jnp.int32)
        from moshi_tpu.nn.attention import attn_shared
        attn_sh = attn_shared(dcfg.mha, offset_b, 1)        # shared by all L

        def layer_body(hh, per_layer):
            shared, attn, gating, kv_l = per_layer
            layer_params = {
                "norm1": shared["norm1"], "norm2": shared["norm2"],
                "self_attn": attn, "gating": gating,
            }
            y, new_kv_l = transformer_layer(
                dcfg, layer_params, kv_l, hh, offset_b, shared=attn_sh)
            return y, new_kv_l

        shared = {"norm1": dep["layers"]["norm1"],
                  "norm2": dep["layers"]["norm2"]}
        # unrolled for the same reason as the step scan below: dense
        # per-layer weight xs slices are full copies otherwise
        y, new_kv = jax.lax.scan(layer_body, x,
                                 (shared, w["attn"], w["gating"], kv),
                                 unroll=dcfg.num_layers)
        from moshi_tpu.utils.capture import capture as _cap
        logits = _cap("lm/dep/logits",
                      linear(w["linears"], y[:, 0]).astype(jnp.float32))
        token = _cap("lm/dep/token", sample_token(logits, k_cb, temp, top_k))
        return (token, new_kv), token

    xs = {"in": step_w["in"], "attn": step_w["attn"],
          "gating": step_w["gating"], "linears": step_w["linears"]}
    if cfg.dep_q > 1:
        xs["emb"] = step_w["emb"]
    init = (text_token, kv0)  # prev_token unused at cb=0
    # dense weights-per-step sets: the step scan's xs slices copy each
    # step's FULL weight set per frame (~2.2 GB/frame on the TTS-class
    # bf16 depformer) — unroll so the slices are static reads (same fix
    # as the dense temporal stack, nn/transformer.py; hardware: STT
    # temporal 155.5 -> 234.6 fps)
    from moshi_tpu.nn.transformer import SCAN_UNROLL as _SU
    dep_unroll = dep_q if _SU == 1 else _SU
    (_, _), tokens = jax.lax.scan(
        step, init, (jnp.arange(dep_q, dtype=jnp.int32), keys, xs),
        unroll=dep_unroll)
    return jnp.moveaxis(tokens, 0, 1)                       # [B, dep_q]


# ---------------------------------------------------------------------------
# delay cache (device-side LMGen state, lm.h:778-979)
# ---------------------------------------------------------------------------

def init_gen_state(cfg: LMConfig, batch: int, key=None, params=None):
    """Fresh generation state.  Pass `params` to let the allocator pick
    the temporal-megakernel KV layout when the weights/flags allow it
    (pallas on, B=1, q4_k) — the forward dispatches on the layout."""
    if key is None:
        key = jax.random.PRNGKey(0)
    from moshi_tpu.nn.transformer import can_use_temporal_megakernel
    flat = params is not None and can_use_temporal_megakernel(
        cfg.transformer, params["transformer"], batch)
    return {
        "transformer": init_transformer_state(cfg.transformer, batch,
                                              flat=flat),
        "cache": jnp.full((batch, cfg.cache_len, cfg.num_codebooks),
                          UNGENERATED, jnp.int32),
        "offset": jnp.zeros((batch,), jnp.int32),
        "rng": key,
    }


def _delays_arr(cfg: LMConfig):
    d = list(cfg.delays) if cfg.delays else [0] * cfg.num_codebooks
    if len(d) < cfg.num_codebooks:
        d = d + [0] * (cfg.num_codebooks - len(d))
    return jnp.asarray(d[: cfg.num_codebooks], jnp.int32)


def write_stream_tokens(cfg: LMConfig, cache, offset, tokens, stream_start):
    """Scatter provided tokens [B, n] for streams
    [stream_start, stream_start+n) at slots (offset + delay) % CT
    (lm.h:806-825)."""
    b, n = tokens.shape
    ct = cfg.cache_len
    delays = _delays_arr(cfg)[stream_start: stream_start + n]
    slots = (offset[:, None] + delays[None, :]) % ct        # [B, n]
    bi = jnp.arange(b)[:, None]
    si = jnp.arange(stream_start, stream_start + n)[None, :]
    return cache.at[bi, slots, si].set(tokens.astype(jnp.int32))


def build_input_frame(cfg: LMConfig, cache, offset):
    """Model input tokens [B, 1, K] for the current step (lm.h:827-835)."""
    ct = cfg.cache_len
    b = cache.shape[0]
    pos = offset % ct
    cached = cache[jnp.arange(b), pos]                      # [B, K]
    delays = _delays_arr(cfg)
    initial = jnp.concatenate([
        jnp.asarray([cfg.text_initial], jnp.int32),
        jnp.full((cfg.n_q,), cfg.audio_initial, jnp.int32)])
    is_init = offset[:, None] <= delays[None, :]
    return jnp.where(is_init, initial[None, :], cached)[:, None, :]


def write_generated(cfg: LMConfig, cache, new_offset, text_token,
                    audio_tokens):
    """Write this step's generated tokens at slot new_offset % CT
    (lm.h:940-948; note the write happens after offset++)."""
    b = cache.shape[0]
    ct = cfg.cache_len
    pos = new_offset % ct
    bi = jnp.arange(b)
    cache = cache.at[bi, pos, 0].set(text_token.astype(jnp.int32))
    dep_q = audio_tokens.shape[1]
    si = jnp.arange(1, dep_q + 1)[None, :]
    cache = cache.at[bi[:, None], pos[:, None], si].set(
        audio_tokens.astype(jnp.int32))
    return cache


def read_output(cfg: LMConfig, cache, new_offset):
    """Un-delayed output frame (lm.h:950-966): stream i is read at slot
    (offset - max_delay + delays[i]) % CT.  Returns (text [B],
    audio [B, dep_q], valid [B])."""
    b = cache.shape[0]
    ct = cfg.cache_len
    dep_q = cfg.runtime_dep_q
    delays = _delays_arr(cfg)[: dep_q + 1]
    slots = (new_offset[:, None] - cfg.max_delay + delays[None, :]) % ct
    bi = jnp.arange(b)[:, None]
    si = jnp.arange(dep_q + 1)[None, :]
    frame = cache[bi, slots, si]                            # [B, dep_q+1]
    text = frame[:, 0]
    audio = frame[:, 1:]
    valid = (new_offset > cfg.max_delay) & jnp.all(audio != ZERO, axis=-1) \
        & jnp.all(audio != UNGENERATED, axis=-1)
    return text, audio, valid


# ---------------------------------------------------------------------------
# generation steps
# ---------------------------------------------------------------------------

def lm_text_step(cfg: LMConfig, params, state, other_audio=None,
                 forced_frame=None, condition_sum=None, cross_kv=None,
                 temp_text: float = 0.0, top_k_text: int = 25):
    """Phase A of one frame: write provided inputs, run the temporal
    transformer, sample the text token.

    other_audio: [B, n_q - dep_q] other-stream tokens (STS/STT input side)
    forced_frame: [B, K] full provided frame (prompt replay); suppresses
        the generated-token write in phase B (lm.h:806-818).
    Returns (sampled_text [B], transformer_out [B, dim], new_state).
    """
    cache = state["cache"]
    offset = state["offset"]
    provided = forced_frame is not None
    if provided:
        cache = write_stream_tokens(cfg, cache, offset, forced_frame, 0)
    elif other_audio is not None and other_audio.shape[1] > 0:
        start = cfg.runtime_dep_q + 1
        cache = write_stream_tokens(cfg, cache, offset, other_audio, start)
    tokens = build_input_frame(cfg, cache, offset)
    h, logits, new_kv = temporal_forward(cfg, params, state["transformer"],
                                         tokens, offset, condition_sum,
                                         cross_kv)
    rng, k1 = jax.random.split(state["rng"])
    from moshi_tpu.utils.capture import capture as _cap
    text_token = _cap("lm/text_token",
                      sample_token(logits[:, -1], k1, temp_text, top_k_text))
    new_state = {"transformer": new_kv, "cache": cache, "offset": offset,
                 "rng": rng}
    return text_token, h[:, -1], new_state


def lm_audio_step(cfg: LMConfig, params, state, text_token, transformer_out,
                  provided: bool = False, forced_audio=None,
                  depformer_replace: bool = False,
                  temp: float = 0.0, top_k: int = 250):
    """Phase B: depformer generation + delay-cache update + output read.

    text_token: [B] final text token (possibly machine-replaced on host).
    forced_audio: [B, dep_q] with UNGENERATED = keep-generated (voice/audio
        prefixes, lm.h:920-933).
    Returns (outputs dict, new_state)."""
    cache = state["cache"]
    offset = state["offset"]
    b = cache.shape[0]
    dep_q = cfg.runtime_dep_q
    rng = state["rng"]
    if cfg.dep_q > 0 and not depformer_replace:
        rng, k2 = jax.random.split(rng)
        audio = depformer_generate(cfg, params, transformer_out, text_token,
                                   k2, temp, top_k)
    else:
        audio = jnp.full((b, dep_q), ZERO, jnp.int32)
    if cfg.delay_steps:
        delays = _delays_arr(cfg)[1: dep_q + 1]
        early = offset[:, None] < (delays[None, :] + cfg.delay_steps)
        audio = jnp.where(early, ZERO, audio)
    if forced_audio is not None:
        audio = jnp.where(forced_audio != UNGENERATED, forced_audio, audio)
    new_offset = offset + 1
    if not provided:
        cache = write_generated(cfg, cache, new_offset, text_token, audio)
    out_text, out_audio, valid = read_output(cfg, cache, new_offset)
    if depformer_replace:
        valid = jnp.zeros_like(valid)
    outputs = {"text": out_text, "audio": out_audio, "valid": valid,
               "sampled_text": text_token}
    if cfg.extra_heads_num > 2:
        vad_w = _gather_step(params["extra_heads"], 2)
        vad_logits = linear(vad_w, transformer_out).astype(jnp.float32)
        outputs["vad"] = jax.nn.softmax(vad_logits, axis=-1)[:, 0]
    new_state = {"transformer": state["transformer"], "cache": cache,
                 "offset": new_offset, "rng": rng}
    return outputs, new_state


def lm_gen_step(cfg: LMConfig, params, state, other_audio=None,
                forced_frame=None, forced_text=None, forced_audio=None,
                condition_sum=None, cross_kv=None,
                depformer_replace: bool = False,
                temp: float = 0.8, temp_text: float = 0.7,
                top_k: int = 250, top_k_text: int = 25):
    """Fused single-jit frame step (STS / STT / machine-less TTS):
    temporal forward + text sampling + depformer + delay cache, one device
    launch per 80 ms frame.  forced_text [B] (>= 0 entries override the
    sampled token) supports host-side prefix feeding without splitting
    the program."""
    text_token, h, state = lm_text_step(
        cfg, params, state, other_audio=other_audio,
        forced_frame=forced_frame, condition_sum=condition_sum,
        cross_kv=cross_kv, temp_text=temp_text, top_k_text=top_k_text)
    if forced_text is not None:
        text_token = jnp.where(forced_text >= 0, forced_text, text_token)
    return lm_audio_step(
        cfg, params, state, text_token, h,
        provided=forced_frame is not None, forced_audio=forced_audio,
        depformer_replace=depformer_replace, temp=temp, top_k=top_k)
