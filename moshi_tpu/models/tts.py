"""TTS voice conditioning + voice prefixes + all-in-one TTS model.

Behavioral parity with /root/reference/src/moshi/models/tts.h and
src/moshi.cpp:296-366:

  * conditioners (tts.h:5-35): cfg / control embedding conditioners and
    the speaker_wavs cross-attention conditioner, loaded from
    "lm.condition_provider.conditioners.*";
  * voice_condition (moshi.cpp:296-366): condition_sum = output_proj(cfg
    embed row 2 of {1.0..4.0}) + output_proj(control embed row 0 "ok");
    condition_cross = 5x learnt-padding slots with the projected speaker
    wavs in slot 0, plus a sinusoidal position embedding (half-cos /
    half-sin, the GGML timestep-embedding layout);
  * voice prefix for non-cross TTS models (tts.h:218-305): mimi-encode a
    speaker wav, feed as text(-1)/audio forced prefixes after
    max_delay+delay_steps empty frames, with the semantic codebook moved
    two frames earlier (the "[n-3][0]" delay rewrite);
  * moshi_ttsmodel_generate_wav-style blocking loop (tts.h:310-419).
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from moshi_tpu import FRAME_SIZE
from moshi_tpu.models.lm import LMConfig, UNGENERATED, ZERO
from moshi_tpu.nn.layers import linear


def sin_embedding(positions: jnp.ndarray, dim: int,
                  max_period: float = 10_000.0) -> jnp.ndarray:
    """[T] -> [T, dim]; first half cos, second half sin (GGML
    ggml_timestep_embedding layout used by the reference)."""
    half = dim // 2
    freqs = jnp.exp(-jnp.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    args = positions.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def load_conditioners(src) -> dict:
    """src: runtime.loader._Source over the LM safetensors."""
    base = "lm.condition_provider.conditioners"
    def g(name):
        return jnp.asarray(np.asarray(src.get(f"{base}.{name}"), np.float32))
    return {
        "cfg": {"embed": g("cfg.embed.weight"),
                "learnt_padding": g("cfg.learnt_padding"),
                "output_proj": {"weight": g("cfg.output_proj.weight")}},
        "control": {"embed": g("control.embed.weight"),
                    "learnt_padding": g("control.learnt_padding"),
                    "output_proj": {"weight": g("control.output_proj.weight")}},
        "speaker_wavs": {"learnt_padding": g("speaker_wavs.learnt_padding"),
                         "output_proj": {"weight":
                                         g("speaker_wavs.output_proj.weight")}},
    }


def voice_condition(cond: dict, speaker_wavs: jnp.ndarray,
                    cfg_index: int = 2,
                    pos_emb_scale: float = 1.0,
                    max_period: float = 10_000.0):
    """speaker_wavs: [S, Dw] voice embedding (from voice.speaker_wavs).
    Returns (condition_sum [1, dim], condition_cross [1, 5*S, dim])."""
    # cfg {'1.0':0 ... '4.0':6} -> row `cfg_index` (2 == cfg 2.0)
    cfg_emb = cond["cfg"]["embed"][cfg_index][None, :]
    cfg_c = linear(cond["cfg"]["output_proj"], cfg_emb)
    ctl_emb = cond["control"]["embed"][0][None, :]       # 'ok'
    ctl_c = linear(cond["control"]["output_proj"], ctl_emb)
    condition_sum = (cfg_c + ctl_c).reshape(1, -1)

    proj = linear(cond["speaker_wavs"]["output_proj"], speaker_wavs)
    s, dim = proj.shape
    pad = cond["speaker_wavs"]["learnt_padding"].reshape(1, -1)[:, :dim]
    cross = jnp.broadcast_to(pad, (5 * s, dim))
    cross = cross.at[:s].set(proj)
    pos = sin_embedding(jnp.arange(5 * s), dim, max_period)
    cross = cross + pos_emb_scale * pos
    return condition_sum, cross[None]


def make_voice_prefix(encode_fn, audio: np.ndarray, lm_cfg: LMConfig,
                      delay_steps: int) -> Tuple[List[int], List[List[int]]]:
    """Non-cross TTS voice prefix (tts.h:218-305).

    encode_fn: audio [1, n*1920] -> codes [1, n, n_q] (a MimiStreamer
    encode or jitted step).  Returns (text_prefixes, audio_prefixes).
    """
    n = (len(audio) // FRAME_SIZE) * FRAME_SIZE
    audio = np.asarray(audio[:n], np.float32)
    nframes = n // FRAME_SIZE
    codes = np.asarray(encode_fn(audio[None]))            # [1, T, n_q]
    codes = codes.reshape(nframes, -1)[:, : lm_cfg.n_q]
    text_prefixes = [ZERO] * nframes
    audio_prefixes: List[List[int]] = [
        [UNGENERATED] * lm_cfg.n_q
        for _ in range(lm_cfg.max_delay + delay_steps)
    ]
    for i in range(nframes):
        frame = [int(c) for c in codes[i]]
        audio_prefixes.append(frame)
        # semantic-delay rewrite: move codebook 0 two frames earlier
        audio_prefixes[-3][0] = frame[0]
        frame[0] = UNGENERATED
    return text_prefixes, audio_prefixes


class TTSModel:
    """All-in-one TTS convenience wrapper (parity:
    moshi_ttsmodel / moshi_ttsmodel_generate_wav, tts.h:310-419): loads
    config + LM + mimi + tokenizer, builds the StateMachine, and exposes a
    blocking generate_wav(script) loop."""

    def __init__(self, lm_cfg, lm_params, mimi, mimi_params, tokenizer,
                 config, *, seed: int = 0, mimi_dtype=None):
        import jax.numpy as jnp
        from moshi_tpu.models.state_machine import StateMachine, TokenIds
        from moshi_tpu.runtime.pipeline import TTSPipeline
        self.lm_cfg = lm_cfg
        self.lm_params = lm_params
        self.mimi = mimi
        self.mimi_params = mimi_params
        self.tokenizer = tokenizer
        self.config = config
        self.seed = seed
        self.token_ids = TokenIds(card=lm_cfg.text_card + 1)
        self.machine = StateMachine(
            text_card=lm_cfg.text_card + 1,
            second_stream_ahead=(config.tts_config.second_stream_ahead
                                 if lm_cfg.demux_second_stream else 0),
            max_padding=8, initial_padding=2)
        self.pipe = TTSPipeline(
            mimi, lm_cfg,
            temp=config.lm_gen_config.temp,
            temp_text=config.lm_gen_config.temp_text,
            top_k=config.lm_gen_config.top_k,
            top_k_text=config.lm_gen_config.top_k_text,
            mimi_dtype=mimi_dtype if mimi_dtype is not None
            else jnp.bfloat16)

    def generate_wav(self, script, max_frames: int = 2500,
                     final_padding: int = 4):
        """script: list of lines.  Returns (wav float32 [T], n_frames)."""
        import jax
        from moshi_tpu.models.state_machine import script_to_entries
        entries = script_to_entries(self.tokenizer, self.token_ids, 12.5,
                                    script, multi_speaker=False,
                                    padding_between=1)
        mstate = self.machine.new_state(entries)
        state = self.pipe.init_state(1, jax.random.PRNGKey(self.seed))
        wav = []
        offset = 0
        while offset < max_frames:
            replace = offset < self.lm_cfg.delay_steps
            out, state = self.pipe.step(
                self.mimi_params, self.lm_params, state,
                machine=self.machine, machine_state=mstate, offset=offset,
                depformer_replace=replace)
            if bool(np.asarray(out["valid"])[0]) and not replace:
                wav.append(np.asarray(out["audio_out"])[0])
            offset += 1
            end = mstate.end_step
            if end >= 0 and offset >= end + self.lm_cfg.delay_steps + \
                    final_padding:
                break
        audio = np.concatenate(wav) if wav else np.zeros(FRAME_SIZE,
                                                         np.float32)
        return audio, offset

    def generate_wavs(self, scripts, max_frames: int = 2500,
                      final_padding: int = 4):
        """Batched TTS: one jitted program serves len(scripts) sessions
        with diverging scripts, each behind its own StateMachine (new
        TPU-serving design — the reference is B=1 only, SURVEY §7.2).

        scripts: list of script line-lists.  Returns a list of
        (wav float32 [T], end_frame) per session; the batch runs until
        every session has passed its own end_step + delay + padding."""
        import jax
        from moshi_tpu.models.state_machine import script_to_entries
        b = len(scripts)
        mstates = [
            self.machine.new_state(script_to_entries(
                self.tokenizer, self.token_ids, 12.5, script,
                multi_speaker=False, padding_between=1))
            for script in scripts
        ]
        state = self.pipe.init_state(b, jax.random.PRNGKey(self.seed))
        wavs = [[] for _ in range(b)]
        ends = [0] * b
        offset = 0
        while offset < max_frames:
            replace = offset < self.lm_cfg.delay_steps
            out, state = self.pipe.step(
                self.mimi_params, self.lm_params, state,
                machine=self.machine, machine_state=mstates, offset=offset,
                depformer_replace=replace)
            valid = np.asarray(out["valid"])
            audio = np.asarray(out["audio_out"])
            offset += 1
            done = 0
            for i, ms in enumerate(mstates):
                end = ms.end_step
                live = end < 0 or offset <= end + self.lm_cfg.delay_steps \
                    + final_padding
                if live:
                    ends[i] = offset
                    if bool(valid[i]) and not replace:
                        wavs[i].append(audio[i])
                else:
                    done += 1
            if done == b:
                break
        return [
            (np.concatenate(w) if w else np.zeros(FRAME_SIZE, np.float32),
             e)
            for w, e in zip(wavs, ends)
        ]
