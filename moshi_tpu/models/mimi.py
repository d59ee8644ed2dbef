"""Mimi streaming neural audio codec: 24 kHz audio <-> RVQ tokens at 12.5 Hz.

Behavioral parity with /root/reference/src/moshi/models/compression.h and the
default architecture in lm_default.h:229-578:

  encode:  [B, T*1920] audio -> SEANet encoder (24 kHz -> 25 Hz, dim 512)
           -> 8-layer streaming transformer (ctx 250)
           -> downsample conv k4 s2 (25 -> 12.5 Hz)
           -> SplitRVQ nearest-centroid encode -> codes [B, T, n_q]
  decode:  codes -> SplitRVQ decode -> upsample depthwise convtr k4 s2
           (12.5 -> 25 Hz) -> 8-layer streaming transformer
           -> SEANet decoder -> [B, T*1920] audio

The reference builds two prebuilt GGML graphs (compression.h:149-205,
277-326); here each direction is one jitted step function over an explicit
state pytree (conv carries + transformer KV rings + stream offsets).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from moshi_tpu.nn.conv import StreamingConv1d, StreamingConvTranspose1d
from moshi_tpu.nn.seanet import SEANetConfig, SEANetDecoder, SEANetEncoder
from moshi_tpu.nn.transformer import (TransformerConfig,
                                      init_transformer_params,
                                      init_transformer_state,
                                      transformer_forward)
from moshi_tpu.nn.vq import SplitRVQ, SplitRVQConfig


@dataclass(frozen=True)
class MimiConfig:
    n_q: int = 32                   # runtime codebooks (<= total)
    total_codebooks: int = 32
    dim: int = 512
    seanet: SEANetConfig = field(default_factory=SEANetConfig)
    codebook_dim: int = 256
    codebook_size: int = 2048
    transformer_layers: int = 8
    transformer_heads: int = 8
    transformer_context: int = 250
    transformer_hidden: int = 2048
    frames_per_step: int = 2        # 25 Hz positions per 12.5 Hz token
    transformer_capacity: int = 0   # ring slots; 0 -> context.  The
    # offline scan pipelines use context + chunk so multi-position
    # prefill never evicts in-window keys (runtime/pipeline.py)

    @property
    def transformer(self) -> TransformerConfig:
        return TransformerConfig(
            dim=self.dim, num_heads=self.transformer_heads,
            num_layers=self.transformer_layers,
            hidden_dim=self.transformer_hidden,
            context=self.transformer_context,
            capacity=self.transformer_capacity,
            norm="layer_norm", gating="", use_layer_scale=True,
            rope_max_period=10_000.0, bias_proj=False, bias_ffn=False)

    @property
    def quantizer(self) -> SplitRVQConfig:
        return SplitRVQConfig(n_q=self.total_codebooks, n_q_semantic=1,
                              dim=self.dim, codebook_dim=self.codebook_dim,
                              codebook_size=self.codebook_size)


class MimiModel:
    """params = {encoder, encoder_transformer, downsample,
                 quantizer, upsample, decoder_transformer, decoder}"""

    def __init__(self, cfg: MimiConfig = MimiConfig()):
        self.cfg = cfg
        self.encoder = SEANetEncoder(cfg.seanet)
        self.decoder = SEANetDecoder(cfg.seanet)
        self.quantizer = SplitRVQ(cfg.quantizer)
        self.downsample = StreamingConv1d(cfg.dim, cfg.dim, 4, stride=2,
                                          bias=False)
        self.upsample = StreamingConvTranspose1d(cfg.dim, cfg.dim, 4, stride=2,
                                                 groups=cfg.dim, bias=False)

    # -- init ------------------------------------------------------------
    def init_params(self, key, dtype=jnp.float32):
        ks = jax.random.split(key, 7)
        return {
            "encoder": self.encoder.init_params(ks[0], dtype),
            "encoder_transformer": init_transformer_params(
                ks[1], self.cfg.transformer, dtype),
            "downsample": self.downsample.init_params(ks[2], dtype),
            "quantizer": self.quantizer.init_params(ks[3], dtype),
            "upsample": self.upsample.init_params(ks[4], dtype),
            "decoder_transformer": init_transformer_params(
                ks[5], self.cfg.transformer, dtype),
            "decoder": self.decoder.init_params(ks[6], dtype),
        }

    def init_encode_state(self, batch: int, dtype=jnp.float32):
        return {
            "encoder": self.encoder.init_state(batch, dtype),
            "transformer": init_transformer_state(self.cfg.transformer, batch),
            "offset": jnp.zeros((batch,), jnp.int32),
            "downsample": self.downsample.init_state(batch, dtype),
        }

    def init_decode_state(self, batch: int, dtype=jnp.float32):
        return {
            "upsample": self.upsample.init_state(batch, dtype),
            "transformer": init_transformer_state(self.cfg.transformer, batch),
            "offset": jnp.zeros((batch,), jnp.int32),
            "decoder": self.decoder.init_state(batch, dtype),
        }

    # -- streaming steps (jit these) -------------------------------------
    def encode_step(self, params, state, audio):
        """audio [B, n*1920] -> (codes [B, n, n_q], new_state)."""
        b, t = audio.shape
        frame = self.cfg.seanet.hop_length * self.cfg.frames_per_step
        assert t % frame == 0, f"encode needs multiples of {frame}, got {t}"
        from moshi_tpu.utils.capture import capture
        x = audio[..., None]                                    # [B, T, 1]
        h, enc_state = self.encoder(params["encoder"], state["encoder"], x,
                                    tap="mimi/enc")
        h = capture("mimi/encoder_out", h)
        h, tr_state = transformer_forward(
            self.cfg.transformer, params["encoder_transformer"],
            state["transformer"], h, state["offset"], tap="mimi/enc_tx")
        h = capture("mimi/enc_tx_out", h)
        new_offset = state["offset"] + h.shape[1]
        h, ds_state = self.downsample(params["downsample"],
                                      state["downsample"], h)
        h = capture("mimi/downsample_out", h)
        codes = self.quantizer.encode(params["quantizer"], h)
        codes = codes[..., : self.cfg.n_q]
        codes = capture("mimi/codes", codes)
        return codes, {"encoder": enc_state, "transformer": tr_state,
                       "offset": new_offset, "downsample": ds_state}

    def decode_step(self, params, state, codes):
        """codes [B, n, n_q] -> (audio [B, n*1920], new_state)."""
        from moshi_tpu.utils.capture import capture
        h = capture("mimi/rvq_decode",
                    self.quantizer.decode(params["quantizer"], codes))
        h, up_state = self.upsample(params["upsample"], state["upsample"], h)
        h = capture("mimi/upsample_out", h)
        h, tr_state = transformer_forward(
            self.cfg.transformer, params["decoder_transformer"],
            state["transformer"], h, state["offset"], tap="mimi/dec_tx")
        h = capture("mimi/dec_tx_out", h)
        new_offset = state["offset"] + h.shape[1]
        audio, dec_state = self.decoder(params["decoder"], state["decoder"],
                                        h, tap="mimi/dec")
        audio = capture("mimi/decode_out", audio)
        return audio[..., 0], {"upsample": up_state, "transformer": tr_state,
                               "offset": new_offset, "decoder": dec_state}

    # -- convenience offline paths ---------------------------------------
    def encode(self, params, audio):
        codes, _ = self.encode_step(
            params, self.init_encode_state(audio.shape[0], audio.dtype), audio)
        return codes

    def decode(self, params, codes):
        audio, _ = self.decode_step(
            params, self.init_decode_state(codes.shape[0]), codes)
        return audio
