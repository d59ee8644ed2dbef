"""Streaming sessions: the send/receive "pipe" API over jitted steps.

Capability parity with the reference C ABI (include/moshi/moshi.h,
src/moshi.cpp):
  * LMGenerator ~= moshi_lm_generator/start/send/receive/send2/receive2/
    is_active/is_empty/machine_reset (moshi.cpp:700-953): host-side
    orchestration of the jitted frame steps, the TTS StateMachine hook,
    text/audio prefix feeding, skip handling, and the
    depformer-replace lead-in (receive: moshi.cpp:904-918; is_active
    final_padding=4: moshi.cpp:940-945).
  * MimiStreamer ~= mimi_encode/decode_alloc_context/reset/send/receive
    (moshi.cpp:183-292).

The reference is single-session (B=1); these wrappers carry an explicit
batch of sessions (one host wrapper can drive B concurrent streams with
shared jitted programs — the TPU serving path).
"""

from __future__ import annotations

from collections import deque
from typing import Deque, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from moshi_tpu.models.lm import (LMConfig, UNGENERATED, init_gen_state,
                                 lm_audio_step, lm_gen_step, lm_text_step)
from moshi_tpu.models.mimi import MimiModel
from moshi_tpu.models.state_machine import MachineState, StateMachine

FINAL_PADDING = 4  # moshi.cpp:941


class LMGenerator:
    def __init__(self, cfg: LMConfig, params, *, batch: int = 1,
                 temp: float = 0.8, temp_text: float = 0.7,
                 top_k: int = 250, top_k_text: int = 25,
                 machine: Optional[StateMachine] = None,
                 condition_sum=None, cross_kv=None, seed: int = 0):
        self.cfg = cfg
        self.params = params
        self.batch = batch
        self.machine = machine
        # one FSM state per session slot: B>1 TTS serves diverging
        # scripts through a single jitted program (new TPU-serving
        # design; the reference is B=1 only)
        self.machine_states: List[MachineState] = (
            [machine.new_state() for _ in range(batch)] if machine else [])
        self.condition_sum = condition_sum
        self.cross_kv = cross_kv
        self.state = init_gen_state(cfg, batch, jax.random.PRNGKey(seed),
                                    params=params)
        self.text_prefixes: Deque[int] = deque()
        self.audio_prefixes: Deque[List[int]] = deque()
        self.skip = 0
        self.skip_prefix = 2  # lm.h:788
        self._offset = 0

        n_other = cfg.n_q - cfg.runtime_dep_q

        def fused(params, state, other, forced_text, forced_audio,
                  cond, ckv, replace):
            return lm_gen_step(
                cfg, params, state, other_audio=other,
                forced_text=forced_text, forced_audio=forced_audio,
                condition_sum=cond, cross_kv=ckv,
                depformer_replace=replace,
                temp=temp, temp_text=temp_text,
                top_k=top_k, top_k_text=top_k_text)

        def text_phase(params, state, other, cond, ckv):
            return lm_text_step(cfg, params, state, other_audio=other,
                                condition_sum=cond, cross_kv=ckv,
                                temp_text=temp_text, top_k_text=top_k_text)

        def audio_phase(params, state, text_token, h, forced_audio, replace):
            return lm_audio_step(cfg, params, state, text_token, h,
                                 forced_audio=forced_audio,
                                 depformer_replace=replace,
                                 temp=temp, top_k=top_k)

        self._fused = jax.jit(fused, static_argnums=(7,), donate_argnums=(1,))
        self._text_phase = jax.jit(text_phase, donate_argnums=(1,))
        self._audio_phase = jax.jit(audio_phase, static_argnums=(5,),
                                    donate_argnums=(1,))
        self._n_other = n_other
        self._none_other = jnp.zeros((batch, n_other), jnp.int32) \
            if n_other else None
        self._pending_other: Optional[np.ndarray] = None

    @property
    def machine_state(self) -> Optional[MachineState]:
        """Slot 0's FSM state (reference B=1 API compatibility)."""
        return self.machine_states[0] if self.machine_states else None

    # -- reference API surface -------------------------------------------
    def send(self, entry, slot: int = 0):
        """moshi_lm_send: queue a TTS word Entry (for session `slot`)."""
        assert self.machine_states, "no state machine (not TTS)"
        self.machine_states[slot].entries.append(entry)

    def send2(self, audio_tokens):
        """moshi_lm_send2: provide the other stream's audio tokens."""
        self._pending_other = np.asarray(audio_tokens, np.int32).reshape(
            self.batch, -1)

    def _forced_audio(self):
        if not self.audio_prefixes:
            return None
        self.skip = self.skip_prefix
        codes = self.audio_prefixes.popleft()
        arr = np.full((self.batch, self.cfg.runtime_dep_q), UNGENERATED,
                      np.int32)
        arr[:, : len(codes)] = [int(c) for c in codes]
        return jnp.asarray(arr)

    def step(self, depformer_replace: Optional[bool] = None):
        """One frame.  Returns dict with host-side results:
        {has_audio, text, audio [dep_q], sampled_text, vad?}."""
        cfg = self.cfg
        if depformer_replace is None:
            depformer_replace = self._offset < cfg.delay_steps  # moshi.cpp:905
        other = (jnp.asarray(self._pending_other)
                 if self._pending_other is not None else self._none_other)
        self._pending_other = None
        forced_audio = self._forced_audio()
        if forced_audio is None:
            forced_audio = jnp.full((self.batch, cfg.runtime_dep_q),
                                    UNGENERATED, jnp.int32)

        if self.machine is not None:
            tok, h, state = self._text_phase(self.params, self.state, other,
                                             self.condition_sum, self.cross_kv)
            if self.text_prefixes:
                text_token = int(self.text_prefixes.popleft())
                text_arr = jnp.full((self.batch,), text_token, jnp.int32)
            else:
                # one D->H fetch, then each slot's token through its own
                # FSM (diverging scripts share the jitted program)
                toks = np.asarray(tok)
                text_arr = jnp.asarray(
                    [self.machine.process(self._offset, ms, int(toks[i]))
                     for i, ms in enumerate(self.machine_states)],
                    jnp.int32)
            out, self.state = self._audio_phase(
                self.params, state, text_arr, h, forced_audio,
                depformer_replace)
        else:
            out, self.state = self._fused(
                self.params, self.state, other, None, forced_audio,
                self.condition_sum, self.cross_kv, depformer_replace)
        self._offset += 1

        result = {
            "sampled_text": np.asarray(out["sampled_text"]),
            "text": np.asarray(out["text"]),
            "audio": np.asarray(out["audio"]),
            "has_audio": np.asarray(out["valid"]).copy(),
        }
        if "vad" in out:
            result["vad"] = np.asarray(out["vad"])
        if self.skip > 0:
            self.skip -= 1
            result["has_audio"][:] = False
        return result

    def receive(self):
        """moshi_lm_receive (TTS/STS output side)."""
        return self.step()

    def receive2(self):
        """moshi_lm_receive2 (STT: text + vad, audio ignored)."""
        return self.step(depformer_replace=False)

    def is_active(self, slot: Optional[int] = None) -> bool:
        """moshi.cpp:940-945.  slot=None: true while ANY slot is active
        (the batch keeps stepping until every script has drained)."""
        if not self.machine_states:
            return True
        states = (self.machine_states if slot is None
                  else [self.machine_states[slot]])
        for ms in states:
            end = ms.end_step
            if end == -1 or self._offset < end + self.cfg.delay_steps \
                    + FINAL_PADDING:
                return True
        return False

    def is_empty(self, slot: int = 0) -> bool:
        return not self.machine_states or \
            self.machine_states[slot].is_empty()

    def machine_reset(self):
        if self.machine:
            for ms in self.machine_states:
                self.machine.reset_state(ms)

    def reset(self, seed: int = 0):
        self.state = init_gen_state(self.cfg, self.batch,
                                    jax.random.PRNGKey(seed),
                                    params=self.params)
        self._offset = 0
        self.skip = 0
        self.text_prefixes.clear()
        self.audio_prefixes.clear()
        self.machine_reset()


class MimiStreamer:
    """Streaming codec contexts (mimi_encode/decode_*, moshi.cpp:183-292)."""

    def __init__(self, model: MimiModel, params, batch: int = 1,
                 dtype=jnp.float32):
        self.model = model
        self.params = params
        self.batch = batch
        self.dtype = dtype
        self._enc = jax.jit(model.encode_step, donate_argnums=(1,))
        self._dec = jax.jit(model.decode_step, donate_argnums=(1,))
        self.reset()

    def reset(self):
        self.enc_state = self.model.init_encode_state(self.batch, self.dtype)
        self.dec_state = self.model.init_decode_state(self.batch, self.dtype)

    def encode(self, frame: np.ndarray) -> np.ndarray:
        """frame [B, n*1920] f32 -> codes [B, n, n_q] (int)."""
        codes, self.enc_state = self._enc(
            self.params, self.enc_state,
            jnp.asarray(frame, self.dtype).reshape(self.batch, -1))
        return np.asarray(codes)

    def decode(self, codes: np.ndarray) -> np.ndarray:
        """codes [B, n, n_q] -> audio [B, n*1920] f32."""
        codes = np.asarray(codes, np.int32)
        if codes.ndim == 2:
            codes = codes[:, None, :]
        n_q = self.model.cfg.n_q
        if codes.shape[-1] < n_q:
            pad = np.zeros(codes.shape[:-1] + (n_q - codes.shape[-1],),
                           np.int32)
            codes = np.concatenate([codes, pad], axis=-1)
        codes = np.where(codes < 0, 0, codes)
        audio, self.dec_state = self._dec(self.params, self.dec_state,
                                          jnp.asarray(codes[..., :n_q]))
        return np.asarray(audio, np.float32)
