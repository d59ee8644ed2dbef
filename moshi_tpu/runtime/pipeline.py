"""Fused full-duplex frame pipeline: ONE device launch per 80 ms frame.

The reference runs three separate prebuilt graphs per frame with three
device->host token readbacks between them (SURVEY.md §3.1-3.2: mimi
encode graph -> LM graph -> depformer graph -> mimi decode graph).  On
TPU every launch costs dispatch latency (severe over remote links), so
the whole STS frame —

    mic audio [B, 1920] -> mimi encode -> other-stream tokens
    -> LM temporal + text sampling + depformer + delay cache
    -> mimi decode -> speaker audio [B, 1920]

— is a single jitted program here; the only host traffic per frame is
the input frame up and the (audio, text token) down.  This removes the
per-frame sync points the reference's design is bound by (SURVEY.md §7.3
"the three D->H token syncs per frame are the latency trap").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from moshi_tpu.models.lm import LMConfig, init_gen_state, lm_gen_step
from moshi_tpu.models.mimi import MimiModel


def _chunk_lengths(t: int, chunks):
    """Greedy decomposition of t into the fixed scan sizes `chunks`
    (scan length is a static shape: arbitrary totals compile at most
    len(chunks) programs — same trick as personaplex priming)."""
    out = []
    for c in chunks:
        while t >= c:
            out.append(c)
            t -= c
    return out


def _scan_chunks(default=(64, 16, 4, 1)):
    """Fixed scan chunk sizes, overridable via MOSHI_TPU_SCAN_CHUNKS
    (e.g. "256,64,16,4,1" — longer chunks = fewer launches for long
    offline runs, one extra compiled program per new size)."""
    import os
    s = os.environ.get("MOSHI_TPU_SCAN_CHUNKS")
    if s:
        return tuple(int(x) for x in s.split(","))
    return default


def _offline_mimi(mimi: MimiModel, chunk_frames: int) -> MimiModel:
    """A MimiModel view whose transformer rings hold context + one
    chunk of positions: multi-position prefill then never evicts an
    in-window key mid-call (capacity == context rings drop the oldest
    window keys when T > 1 positions insert at once).  Same params;
    only the state rings grow."""
    import dataclasses
    cap = (mimi.cfg.transformer_context
           + chunk_frames * mimi.cfg.frames_per_step)
    return MimiModel(dataclasses.replace(mimi.cfg,
                                         transformer_capacity=cap))


def _grow_rings(tr_state, offset, newcap: int):
    """Re-slot a transformer ring state {k, v: [L, B, cap, H, hd]} into
    a `newcap`-slot ring (position p moves from slot p % cap to slot
    p % newcap; unwritten positions stay zero).  Lets a streaming state
    enter the offline scan mid-stream."""
    k = tr_state["k"]
    l, b, oldcap, h, hd = k.shape
    if oldcap == newcap:
        return tr_state
    last = jnp.asarray(offset, jnp.int32) - 1                  # [B]
    p = last[:, None] - jnp.arange(oldcap, dtype=jnp.int32)[None, :]
    src = jnp.where(p >= 0, p % oldcap, 0)
    # never-written positions scatter to a sacrificial slot `newcap`
    # (duplicate-index .set picks an arbitrary winner — a zeroed row
    # colliding with a real slot-0 write would wipe it)
    dst = jnp.where(p >= 0, p % newcap, newcap)

    def grow(a):
        new = jnp.zeros((l, b, newcap + 1, h, hd), a.dtype)
        for i in range(b):
            rows = a[:, i][:, src[i]]                # [L, oldcap, H, hd]
            new = new.at[:, i, dst[i]].set(rows.astype(a.dtype))
        return new[:, :, :newcap]

    out = dict(tr_state)
    out["k"] = grow(tr_state["k"])
    out["v"] = grow(tr_state["v"])
    return out


class STSPipeline:
    """Full-duplex speech-to-speech: one fused step per frame."""

    def __init__(self, mimi: MimiModel, lm_cfg: LMConfig, *,
                 temp: float = 0.8, temp_text: float = 0.7,
                 top_k: int = 250, top_k_text: int = 25,
                 mimi_dtype=jnp.bfloat16):
        self.mimi = mimi
        self.lm_cfg = lm_cfg
        self.mimi_dtype = mimi_dtype
        self.frame_samples = (mimi.cfg.seanet.hop_length *
                              mimi.cfg.frames_per_step)
        n_other = lm_cfg.n_q - lm_cfg.runtime_dep_q
        dep_q = lm_cfg.runtime_dep_q
        mimi_n_q = mimi.cfg.n_q

        def frame(mimi_params, lm_params, state, audio_in, condition_sum,
                  cross_kv):
            codes, enc_state = mimi.encode_step(
                mimi_params, state["enc"], audio_in.astype(mimi_dtype))
            other = codes[:, 0, :n_other] if n_other else None
            out, lm_state = lm_gen_step(
                lm_cfg, lm_params, state["lm"], other_audio=other,
                condition_sum=condition_sum, cross_kv=cross_kv,
                temp=temp, temp_text=temp_text,
                top_k=top_k, top_k_text=top_k_text)
            # decode our dep_q streams (pad remaining books with 0; -1 -> 0)
            audio_codes = jnp.where(out["audio"] < 0, 0, out["audio"])
            if dep_q < mimi_n_q:
                pad = jnp.zeros((audio_codes.shape[0], mimi_n_q - dep_q),
                                jnp.int32)
                audio_codes = jnp.concatenate([audio_codes, pad], axis=-1)
            wav, dec_state = mimi.decode_step(
                mimi_params, state["dec"], audio_codes[:, None, :mimi_n_q])
            new_state = {"enc": enc_state, "lm": lm_state, "dec": dec_state}
            return {"audio_out": wav.astype(jnp.float32),
                    "text": out["text"], "valid": out["valid"],
                    "audio_tokens": out["audio"]}, new_state

        self.frame_fn = frame  # unjitted: composable (bench digest harness)
        self._frame = jax.jit(frame, donate_argnums=(2,))

        def scan(mimi_params, lm_params, state, audio_frames):
            def body(st, a):
                out, st = frame(mimi_params, lm_params, st, a, None, None)
                return st, (out["text"], out["audio_tokens"],
                            out["audio_out"])
            st, ys = jax.lax.scan(body, state, audio_frames)
            return ys, st

        self._scan = jax.jit(scan, donate_argnums=(2,))

        def lm_scan(lm_params, lm_state, others):
            def body(st, o):
                out, st = lm_gen_step(
                    lm_cfg, lm_params, st, other_audio=o,
                    temp=temp, temp_text=temp_text,
                    top_k=top_k, top_k_text=top_k_text)
                return st, (out["text"], out["audio"])
            st, (t, tk) = jax.lax.scan(body, lm_state, others)
            return t, tk, st

        self._lm_scan = jax.jit(lm_scan, donate_argnums=(1,))
        self._mimi_off = _offline_mimi(mimi, self._mimi_chunk)
        self._off_cap = self._mimi_off.cfg.transformer.mha.cap
        self._enc_multi = jax.jit(self._mimi_off.encode_step,
                                  donate_argnums=(1,))
        self._dec_multi = jax.jit(self._mimi_off.decode_step,
                                  donate_argnums=(1,))

    SCAN_CHUNKS = _scan_chunks()

    @property
    def _mimi_chunk(self) -> int:
        # batch mimi one context's worth of frames per call; with the
        # offline rings (capacity = context + chunk) no in-window key
        # is ever evicted mid-call
        return max(self.mimi.cfg.transformer_context
                   // self.mimi.cfg.frames_per_step, 1)

    def scan_frames(self, mimi_params, lm_params, state, audio_frames):
        """Offline multi-frame STS in THREE batched phases — mimi
        encode of ALL frames (one launch per 125-frame mimi chunk), LM
        chunked lax.scans over the token stream, mimi decode of ALL
        output tokens.  The round-4 design ran the full fused frame
        inside the scan body; mimi's ~150 small conv/attn ops then
        execute PER FRAME and dominate (~4.6 ms/frame of the 16.7 ms
        scan frame was mimi+glue).  Offline, the encode depends only on
        inputs and the decode only on LM outputs, so both batch over
        time — the convs run once at T = N*1920 samples (MXU-efficient)
        instead of N times at T = 1920.  Live duplex streaming still
        uses step().  Returns (texts [N, B], audio_tokens [N, B, dep_q],
        audio_out [N, B, samples], state)."""
        n, b = audio_frames.shape[0], audio_frames.shape[1]
        fs = self.frame_samples
        n_other = self.lm_cfg.n_q - self.lm_cfg.runtime_dep_q
        dep_q = self.lm_cfg.runtime_dep_q
        mimi_n_q = self.mimi.cfg.n_q
        if n_other == 0:
            return self._scan_fused(mimi_params, lm_params, state,
                                    audio_frames)
        mc = self._mimi_chunk
        # phase 1: batched mimi encode (offline rings: re-slot a
        # streaming state's rings into the larger offline capacity)
        audio_bt = jnp.moveaxis(audio_frames, 0, 1)       # [B, N, fs]
        enc_state = state["enc"]
        if enc_state["transformer"]["k"].shape[2] != self._off_cap:
            enc_state = dict(enc_state, transformer=_grow_rings(
                enc_state["transformer"], enc_state["offset"],
                self._off_cap))
        codes_parts = []
        for c0 in range(0, n, mc):
            cs = min(mc, n - c0)
            flat = audio_bt[:, c0:c0 + cs].reshape(b, cs * fs)
            codes_c, enc_state = self._enc_multi(
                mimi_params, enc_state, flat.astype(self.mimi_dtype))
            codes_parts.append(codes_c)
        codes = jnp.concatenate(codes_parts, axis=1)      # [B, N, n_q]
        other = jnp.moveaxis(codes[..., :n_other], 1, 0)  # [N, B, n_o]
        # phase 2: LM chunked scans
        lm_state = state["lm"]
        texts, toks = [], []
        pos = 0
        for c in _chunk_lengths(n, self.SCAN_CHUNKS):
            t, tk, lm_state = self._lm_scan(lm_params, lm_state,
                                            other[pos: pos + c])
            texts.append(t)
            toks.append(tk)
            pos += c
        texts = jnp.concatenate(texts, axis=0)            # [N, B]
        toks = jnp.concatenate(toks, axis=0)              # [N, B, dep_q]
        # phase 3: batched mimi decode of our audio tokens
        audio_codes = jnp.where(toks < 0, 0, toks)
        if dep_q < mimi_n_q:
            pad = jnp.zeros(audio_codes.shape[:-1] + (mimi_n_q - dep_q,),
                            jnp.int32)
            audio_codes = jnp.concatenate([audio_codes, pad], axis=-1)
        codes_bt = jnp.moveaxis(audio_codes, 0, 1)        # [B, N, n_q]
        dec_state = state["dec"]
        if dec_state["transformer"]["k"].shape[2] != self._off_cap:
            dec_state = dict(dec_state, transformer=_grow_rings(
                dec_state["transformer"], dec_state["offset"],
                self._off_cap))
        wav_parts = []
        for c0 in range(0, n, mc):
            cs = min(mc, n - c0)
            wav_c, dec_state = self._dec_multi(
                mimi_params, dec_state, codes_bt[:, c0:c0 + cs])
            wav_parts.append(wav_c.reshape(b, cs, fs))
        audio_out = jnp.moveaxis(jnp.concatenate(wav_parts, axis=1), 0, 1)
        return texts, toks, audio_out.astype(jnp.float32), \
            {"enc": enc_state, "lm": lm_state, "dec": dec_state}

    def _scan_fused(self, mimi_params, lm_params, state, audio_frames):
        """Per-frame fused scan (the n_other == 0 fallback)."""
        n = audio_frames.shape[0]
        outs = []
        pos = 0
        for c in _chunk_lengths(n, self.SCAN_CHUNKS):
            ys, state = self._scan(mimi_params, lm_params, state,
                                   audio_frames[pos: pos + c])
            outs.append(ys)
            pos += c
        texts, toks, audio = (jnp.concatenate([o[i] for o in outs], axis=0)
                              for i in range(3))
        return texts, toks, audio, state

    def init_state(self, batch: int, key=None, lm_params=None):
        return {
            "enc": self.mimi.init_encode_state(batch, self.mimi_dtype),
            "lm": init_gen_state(self.lm_cfg, batch, key, params=lm_params),
            "dec": self.mimi.init_decode_state(batch, self.mimi_dtype),
        }

    def step(self, mimi_params, lm_params, state, audio_in,
             condition_sum=None, cross_kv=None):
        """audio_in [B, frame_samples] f32 -> (outputs, new_state).
        Single device launch."""
        return self._frame(mimi_params, lm_params, state,
                           jnp.asarray(audio_in), condition_sum, cross_kv)


class STTPipeline:
    """Speech-to-text: mimi encode + LM (dep_q=0) + VAD in one launch."""

    def __init__(self, mimi: MimiModel, lm_cfg: LMConfig, *,
                 temp_text: float = 0.0, top_k_text: int = 25,
                 mimi_dtype=jnp.bfloat16):
        self.mimi = mimi
        self.lm_cfg = lm_cfg
        self.mimi_dtype = mimi_dtype
        self.frame_samples = (mimi.cfg.seanet.hop_length *
                              mimi.cfg.frames_per_step)
        n_other = lm_cfg.n_q - lm_cfg.runtime_dep_q  # == n_q when dep_q=0

        def frame(mimi_params, lm_params, state, audio_in):
            codes, enc_state = mimi.encode_step(
                mimi_params, state["enc"], audio_in.astype(mimi_dtype))
            other = codes[:, 0, :n_other]
            out, lm_state = lm_gen_step(
                lm_cfg, lm_params, state["lm"], other_audio=other,
                temp_text=temp_text, top_k_text=top_k_text)
            return {"text": out["sampled_text"],
                    "vad": out.get("vad",
                                   jnp.zeros(audio_in.shape[0],
                                             jnp.float32))}, \
                {"enc": enc_state, "lm": lm_state}

        self.frame_fn = frame
        self._frame = jax.jit(frame, donate_argnums=(2,))

        def scan(mimi_params, lm_params, state, audio_frames):
            def body(st, a):
                out, st = frame(mimi_params, lm_params, st, a)
                return st, (out["text"], out["vad"])
            st, (texts, vads) = jax.lax.scan(body, state, audio_frames)
            return texts, vads, st

        self._scan = jax.jit(scan, donate_argnums=(2,))

        def lm_scan(lm_params, lm_state, others):
            def body(st, o):
                out, st = lm_gen_step(lm_cfg, lm_params, st,
                                      other_audio=o, temp_text=temp_text,
                                      top_k_text=top_k_text)
                return st, (out["sampled_text"],
                            out.get("vad", jnp.zeros(o.shape[0],
                                                     jnp.float32)))
            st, (t, v) = jax.lax.scan(body, lm_state, others)
            return t, v, st

        self._lm_scan = jax.jit(lm_scan, donate_argnums=(1,))
        self._mimi_off = _offline_mimi(mimi, self._mimi_chunk)
        self._off_cap = self._mimi_off.cfg.transformer.mha.cap
        self._enc_multi = jax.jit(self._mimi_off.encode_step,
                                  donate_argnums=(1,))

    # fixed chunk sizes: scan length is a static shape, so arbitrary
    # inputs decompose into at most len(SCAN_CHUNKS) compiled programs
    SCAN_CHUNKS = _scan_chunks()

    @property
    def _mimi_chunk(self) -> int:
        return max(self.mimi.cfg.transformer_context
                   // self.mimi.cfg.frames_per_step, 1)

    def scan_frames(self, mimi_params, lm_params, state, audio_frames):
        """Multi-frame transcription in TWO batched phases: mimi encode
        of ALL input frames (one launch per 125-frame mimi chunk — the
        convs run once at clip length instead of per frame), then the
        LM as chunked lax.scans over the token stream.  Offline/file
        transcription has every input frame upfront, so nothing forces
        per-frame interleaving; the round-4 per-frame-fused scan paid
        mimi's ~150 small ops EVERY frame.  No reference analog — the
        reference's prebuilt graphs are single-frame by design.
        Returns (texts [N, B], vads [N, B], state)."""
        n, b = audio_frames.shape[0], audio_frames.shape[1]
        fs = self.frame_samples
        n_other = self.lm_cfg.n_q - self.lm_cfg.runtime_dep_q
        mc = self._mimi_chunk
        audio_bt = jnp.moveaxis(audio_frames, 0, 1)       # [B, N, fs]
        enc_state = state["enc"]
        if enc_state["transformer"]["k"].shape[2] != self._off_cap:
            enc_state = dict(enc_state, transformer=_grow_rings(
                enc_state["transformer"], enc_state["offset"],
                self._off_cap))
        codes_parts = []
        for c0 in range(0, n, mc):
            cs = min(mc, n - c0)
            flat = audio_bt[:, c0:c0 + cs].reshape(b, cs * fs)
            codes_c, enc_state = self._enc_multi(
                mimi_params, enc_state, flat.astype(self.mimi_dtype))
            codes_parts.append(codes_c)
        codes = jnp.concatenate(codes_parts, axis=1)      # [B, N, n_q]
        other = jnp.moveaxis(codes[..., :n_other], 1, 0)  # [N, B, n_o]
        lm_state = state["lm"]
        texts, vads = [], []
        pos = 0
        for c in _chunk_lengths(n, self.SCAN_CHUNKS):
            t, v, lm_state = self._lm_scan(lm_params, lm_state,
                                           other[pos: pos + c])
            texts.append(t)
            vads.append(v)
            pos += c
        return (jnp.concatenate(texts, axis=0),
                jnp.concatenate(vads, axis=0),
                {"enc": enc_state, "lm": lm_state})

    def init_state(self, batch: int, key=None, lm_params=None):
        return {
            "enc": self.mimi.init_encode_state(batch, self.mimi_dtype),
            "lm": init_gen_state(self.lm_cfg, batch, key, params=lm_params),
        }

    def step(self, mimi_params, lm_params, state, audio_in):
        return self._frame(mimi_params, lm_params, state,
                           jnp.asarray(audio_in))


class TTSPipeline:
    """TTS frame: LM (text phase on device, machine on host between
    phases) + mimi decode.  Two launches per frame when a StateMachine is
    active; one when text is pre-forced."""

    def __init__(self, mimi: MimiModel, lm_cfg: LMConfig, *,
                 temp: float = 0.6, temp_text: float = 0.6,
                 top_k: int = 250, top_k_text: int = 25,
                 mimi_dtype=jnp.bfloat16):
        from moshi_tpu.models.lm import lm_audio_step, lm_text_step
        self.mimi = mimi
        self.lm_cfg = lm_cfg
        self.mimi_dtype = mimi_dtype
        dep_q = lm_cfg.runtime_dep_q
        mimi_n_q = mimi.cfg.n_q

        def text_phase(lm_params, lm_state, cond, ckv):
            return lm_text_step(lm_cfg, lm_params, lm_state,
                                condition_sum=cond, cross_kv=ckv,
                                temp_text=temp_text, top_k_text=top_k_text)

        def audio_phase(mimi_params, lm_params, state, text_token, h,
                        forced_audio, replace):
            out, lm_state = lm_audio_step(
                lm_cfg, lm_params, state["lm"], text_token, h,
                forced_audio=forced_audio,
                depformer_replace=replace, temp=temp, top_k=top_k)
            audio_codes = jnp.where(out["audio"] < 0, 0, out["audio"])
            if dep_q < mimi_n_q:
                pad = jnp.zeros((audio_codes.shape[0], mimi_n_q - dep_q),
                                jnp.int32)
                audio_codes = jnp.concatenate([audio_codes, pad], axis=-1)
            wav, dec_state = mimi.decode_step(
                mimi_params, state["dec"], audio_codes[:, None, :mimi_n_q])
            return {"audio_out": wav.astype(jnp.float32),
                    "valid": out["valid"], "text": out["text"],
                    "sampled_text": out["sampled_text"],
                    "audio_tokens": out["audio"]}, \
                {"lm": lm_state, "dec": dec_state}

        self._text_phase = jax.jit(text_phase)
        self._audio_phase = jax.jit(audio_phase, static_argnums=(6,))
        self._text_fn = text_phase
        self._audio_fn = audio_phase
        self._dep_q = dep_q
        self._fused = None

    def init_state(self, batch: int, key=None, lm_params=None):
        return {
            "lm": init_gen_state(self.lm_cfg, batch, key, params=lm_params),
            "dec": self.mimi.init_decode_state(batch, self.mimi_dtype),
        }

    def step(self, mimi_params, lm_params, state, machine=None,
             machine_state=None, offset: int = 0, forced_text=None,
             forced_audio=None, condition_sum=None, cross_kv=None,
             depformer_replace: bool = False):
        """One TTS frame.  When a machine is given, the sampled text token
        round-trips through the host FSM between the two launches
        (the reference's on_text hook, lm.h:881-899).  forced_audio
        [B, dep_q] with UNGENERATED = keep (voice prefixes).

        Batched TTS (new design, no reference analog — SURVEY §7.2
        step 7): `machine_state` may be a sequence of B per-slot
        MachineStates with diverging scripts; each slot's sampled token
        round-trips through its own FSM (one D->H fetch total).  `offset`
        may then be a per-slot sequence."""
        from moshi_tpu.models.lm import UNGENERATED
        tok, h, lm_state = self._text_phase(lm_params, state["lm"],
                                            condition_sum, cross_kv)
        if forced_text is not None:
            text_token = int(forced_text)
        elif machine is not None and isinstance(machine_state,
                                                (list, tuple)):
            toks = np.asarray(tok)
            assert len(machine_state) == toks.shape[0], \
                "need one MachineState per session slot"
            offs = (offset if isinstance(offset, (list, tuple, np.ndarray))
                    else [offset] * len(machine_state))
            tok = jnp.asarray(
                [machine.process(int(offs[i]), ms, int(toks[i]))
                 for i, ms in enumerate(machine_state)], jnp.int32)
            text_token = None
        elif machine is not None:
            text_token = machine.process(offset, machine_state,
                                         int(np.asarray(tok)[0]))
        else:
            text_token = None
        if text_token is not None:
            b = np.asarray(tok).shape[0]
            tok = jnp.full((b,), text_token, jnp.int32)
        if forced_audio is None:
            b = np.asarray(tok).shape[0]
            forced_audio = jnp.full((b, self._dep_q), UNGENERATED,
                                    jnp.int32)
        out, new_sub = self._audio_phase(
            mimi_params, lm_params, {"lm": lm_state, "dec": state["dec"]},
            tok, h, forced_audio, depformer_replace)
        return out, new_sub

    # -- device-side FSM: ONE launch per frame, no host round-trip ------

    def enable_device_fsm(self, machine):
        """Build the fused TTS step with the StateMachine folded in-jit
        (models/device_machine.py).  Removes the per-frame D->H text
        fetch the two-phase path pays (the reference's on_text hook is a
        host callback, lm.h:881-899 — on TPU that sync caps fps at the
        dispatch round-trip), so frames dispatch pipelined like STS/STT.
        """
        from moshi_tpu.models.device_machine import (device_machine_step,
                                                     machine_device_config)
        dm = machine_device_config(machine)
        # idempotent per machine config: rebuilding the jit wrapper for
        # every generate() call would re-trace inside callers' timed
        # windows (advisor r3)
        if self._fused is not None and self._fused_dm == dm:
            return dm

        def fused(mimi_params, lm_params, state, mstate, script,
                  forced_text, forced_audio, cond, ckv, replace):
            tok, h, lm_state = self._text_fn(lm_params, state["lm"],
                                             cond, ckv)
            offset = state["lm"]["offset"]
            active = forced_text < 0
            mtok, mstate = device_machine_step(dm, script, mstate,
                                               offset, tok, active)
            tok = jnp.where(forced_text >= 0, forced_text, mtok)
            out, new_sub = self._audio_fn(
                mimi_params, lm_params,
                {"lm": lm_state, "dec": state["dec"]},
                tok, h, forced_audio, replace)
            out["end_step"] = mstate["end_step"]
            out["machine_text"] = tok
            return out, new_sub, mstate

        self._fused = jax.jit(fused, static_argnums=(9,),
                              donate_argnums=(2, 3))
        self._fused_fn = fused

        def scan(mimi_params, lm_params, state, mstate, script, cond,
                 ckv, n_frames_dummy):
            b = n_frames_dummy.shape[1]
            ft = jnp.full((b,), -1, jnp.int32)
            from moshi_tpu.models.lm import UNGENERATED
            fa = jnp.full((b, self._dep_q), UNGENERATED, jnp.int32)

            def body(carry, _):
                st, ms = carry
                out, st, ms = fused(mimi_params, lm_params, st, ms,
                                    script, ft, fa, cond, ckv, False)
                return (st, ms), (out["audio_out"], out["valid"],
                                  out["end_step"])
            (state, mstate), ys = jax.lax.scan(body, (state, mstate),
                                               n_frames_dummy)
            return ys, state, mstate

        self._fused_scan = jax.jit(scan, donate_argnums=(2, 3))
        self._fused_dm = dm
        return dm

    SCAN_CHUNKS = _scan_chunks()

    def scan_device(self, mimi_params, lm_params, state, mstate, script,
                    n_frames: int, condition_sum=None, cross_kv=None):
        """Generate `n_frames` TTS frames in chunked lax.scans — one
        device launch per chunk instead of per frame (the device-side
        FSM needs no host between frames; offline generation has no
        realtime input, so nothing forces per-frame launches — hardware:
        ~12 ms/frame in-scan vs ~19-20 ms per-frame-launch for the same
        step).  Callers feed voice prefixes with per-frame step_device
        first, then scan the free-running tail.  Returns
        (audio [n, B, samples], valid [n, B], end_step [n, B], state,
        mstate)."""
        outs = []
        b = state["lm"]["offset"].shape[0]
        for c in _chunk_lengths(n_frames, self.SCAN_CHUNKS):
            ys, state, mstate = self._fused_scan(
                mimi_params, lm_params, state, mstate, script,
                condition_sum, cross_kv, jnp.zeros((c, b), jnp.int32))
            outs.append(ys)
        audio, valid, end = (jnp.concatenate([o[i] for o in outs], axis=0)
                             for i in range(3))
        return audio, valid, end, state, mstate

    def step_device(self, mimi_params, lm_params, state, mstate, script,
                    forced_text=None, forced_audio=None,
                    condition_sum=None, cross_kv=None,
                    depformer_replace: bool = False):
        """One TTS frame with the FSM on device (enable_device_fsm first).
        forced_text [B] with -1 = let the machine drive; forced_audio
        [B, dep_q] with UNGENERATED = keep.  Returns
        (outputs, new_state, new_mstate); outputs["end_step"] is the
        device-side end marker (-1 = script not finished) the host may
        poll with a lag instead of blocking every frame."""
        from moshi_tpu.models.lm import UNGENERATED
        b = state["lm"]["offset"].shape[0]
        if forced_text is None:
            forced_text = jnp.full((b,), -1, jnp.int32)
        if forced_audio is None:
            forced_audio = jnp.full((b, self._dep_q), UNGENERATED,
                                    jnp.int32)
        return self._fused(mimi_params, lm_params, state, mstate, script,
                           forced_text, forced_audio, condition_sum,
                           cross_kv, depformer_replace)
