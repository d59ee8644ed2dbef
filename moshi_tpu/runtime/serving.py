"""Continuous batching of concurrent voice sessions.

The reference serves exactly one session per process (B=1 hard-coded,
SURVEY.md §2.7).  This is the TPU-native serving layer: a fixed pool of B
session slots drives ONE jitted fused frame program per 80 ms tick;
sessions attach/detach at frame boundaries (continuous batching — no
recompile, no pipeline bubble: a retired slot's state rows are reset in
place and a new session takes over).  Per-slot stream offsets make the
windowed ring-cache attention correct for sessions at different ages
(nn/attention.py), and under a `(data, model)` mesh the slot axis shards
across the `data` axis while weights/KV shard over `model`
(parallel/sharding.py) — the same program scales chip -> host -> pod.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from moshi_tpu.runtime.pipeline import STSPipeline, TTSPipeline


def _make_slot_reset():
    """Jitted MASKED state reset: copies the template's rows for every
    slot whose mask bit is set — ONE compiled program serves any subset
    of slots (attach_many batches k attaches into one launch instead of
    k).  The batch axis is known by path: KV-ring leaves ("k"/"v") are
    stacked [L, B, ...] (axis 1); everything else (delay cache, offsets,
    conv carries) is [B, ...] (axis 0); "rng" is shared."""
    def reset_slots(state, template, mask):
        s_leaves, treedef = jax.tree_util.tree_flatten_with_path(state)
        t_leaves = treedef.flatten_up_to(template)
        out = []
        for (path, leaf), tmpl in zip(s_leaves, t_leaves):
            last = str(path[-1])
            if "rng" in last or getattr(leaf, "ndim", 0) == 0:
                out.append(leaf)
            elif ("'k'" in last or "'v'" in last) and leaf.ndim >= 3:
                m = mask.reshape((1, -1) + (1,) * (leaf.ndim - 2))
                out.append(jnp.where(m, tmpl, leaf))
            else:
                m = mask.reshape((-1,) + (1,) * (leaf.ndim - 1))
                out.append(jnp.where(m, tmpl, leaf))
        return jax.tree_util.tree_unflatten(treedef, out)

    jitted = jax.jit(reset_slots, donate_argnums=(0,))

    def reset(state, template, slots):
        # mask length = B, read off the first [B]/[B, ...] leaf (offsets
        # / delay cache; KV leaves are [L, B, ...] so skip ndim >= 3)
        b = next(leaf.shape[0]
                 for leaf in jax.tree_util.tree_leaves(template)
                 if getattr(leaf, "ndim", 0) in (1, 2))
        mask = np.zeros((b,), bool)
        for s in (slots if isinstance(slots, (list, tuple, set))
                  else [slots]):
            mask[s] = True
        return jitted(state, template, jnp.asarray(mask))

    return reset


def auto_slots(lm_cfg, weight_bytes: int, device=None, cap: int = 64,
               headroom: float = 0.85) -> int:
    """HBM-derived slot count for a serving pool (the reference's
    VRAM-aware sizing, moshi-sts.cpp:254-264, applied to sessions
    instead of context): weights + per-session KV rings must fit in
    `headroom` of the chip's HBM."""
    from moshi_tpu.runtime.memory import suggest_sessions
    n = suggest_sessions(lm_cfg, weight_bytes, device=device,
                         headroom=headroom)
    return int(max(1, min(n, cap)))


def _reset_slot(tree, template, slot: int, axis_of_batch):
    """Return tree with state rows of `slot` reset to template values.
    axis_of_batch(path-free): leaves are matched by shape against the
    template (same pytree structure)."""
    def reset(leaf, tmpl):
        return leaf.at[slot].set(tmpl[slot]) if leaf.ndim else tmpl
    return jax.tree_util.tree_map(reset, tree, template)


@dataclass
class SlotInfo:
    session_id: Optional[str] = None
    frames: int = 0


class SessionPool:
    """Fixed-B pool of full-duplex STS sessions over one fused program.

    >>> pool = SessionPool(pipe, mimi_params, lm_params, batch=8)
    >>> pool.attach("alice"); pool.attach("bob")
    >>> outs = pool.tick({"alice": frame_a, "bob": frame_b})
    """

    def __init__(self, pipe: STSPipeline, mimi_params, lm_params,
                 batch: int, seed: int = 0):
        self.pipe = pipe
        self.mimi_params = mimi_params
        self.lm_params = lm_params
        self.batch = batch
        self.state = pipe.init_state(batch, jax.random.PRNGKey(seed))
        # template state for slot resets — kept on device, never mutated
        self._template = pipe.init_state(batch, jax.random.PRNGKey(seed))
        self.slots: List[SlotInfo] = [SlotInfo() for _ in range(batch)]
        self._by_session: Dict[str, int] = {}
        fs = pipe.frame_samples
        self._silence = np.zeros((fs,), np.float32)

        self._reset_slot = _make_slot_reset()

    # -- session lifecycle ----------------------------------------------
    def attach(self, session_id: str) -> int:
        assert session_id not in self._by_session, "duplicate session"
        for i, s in enumerate(self.slots):
            if s.session_id is None:
                s.session_id = session_id
                s.frames = 0
                self._by_session[session_id] = i
                self.state = self._reset_slot(self.state, self._template, i)
                return i
        raise RuntimeError("pool full")

    def detach(self, session_id: str):
        i = self._by_session.pop(session_id)
        self.slots[i] = SlotInfo()

    @property
    def active(self) -> int:
        return len(self._by_session)

    # -- frame tick ------------------------------------------------------
    def tick(self, frames: Dict[str, np.ndarray]) -> Dict[str, dict]:
        """One 80 ms tick for all sessions.  `frames` maps session id ->
        mic audio [frame_samples]; absent/idle slots get silence.
        Returns session id -> {audio_out, text, valid}."""
        fs = self.pipe.frame_samples
        batch_audio = np.zeros((self.batch, fs), np.float32)
        for sid, frame in frames.items():
            i = self._by_session[sid]
            batch_audio[i] = np.asarray(frame, np.float32).reshape(fs)
        out, self.state = self.pipe.step(self.mimi_params, self.lm_params,
                                         self.state, batch_audio)
        audio = np.asarray(out["audio_out"])
        text = np.asarray(out["text"])
        valid = np.asarray(out["valid"])
        results = {}
        for sid, i in self._by_session.items():
            self.slots[i].frames += 1
            results[sid] = {"audio_out": audio[i], "text": int(text[i]),
                            "valid": bool(valid[i])}
        return results


class TTSSessionPool:
    """Continuous batching of TTS requests over ONE fused launch/tick.

    Built on the device-side StateMachine (models/device_machine.py):
    every slot's script FSM runs in-jit, so B diverging scripts advance
    in the same program with no per-frame host sync (the reference is
    B=1 with a host on_text hook, lm.h:881-899; batched TTS serving has
    no reference analog — SURVEY §7.2 step 7 "batched StateMachine").

    Script arrays are padded to a fixed (max_tokens, max_entries)
    capacity so attach() never changes shapes (no recompile).  Young
    slots rely on the per-slot early-delay masking in lm_audio_step
    (offset < delays + delay_steps forces ZERO tokens -> invalid frames),
    so mixed-age slots share one program; with temp=0 a slot's stream is
    bit-identical to a B=1 run of the same script.

    >>> pool = TTSSessionPool(pipe, machine, mimi_params, lm_params,
    ...                       batch=4, max_tokens=512, max_entries=128)
    >>> pool.attach("req1", entries)
    >>> outs = pool.tick()       # {"req1": {audio_out, valid, done}}
    """

    FINAL_PADDING = 4            # moshi.cpp final_padding

    def __init__(self, pipe: TTSPipeline, machine, mimi_params, lm_params,
                 batch: int, max_tokens: int = 512, max_entries: int = 128,
                 seed: int = 0):
        from moshi_tpu.models.device_machine import (compile_script,
                                                     init_device_state)
        self.pipe = pipe
        self.mimi_params = mimi_params
        self.lm_params = lm_params
        self.batch = batch
        self.pad_to = (max_tokens, max_entries)
        self.dm = pipe.enable_device_fsm(machine)
        self._compile = compile_script
        self._init_dm = init_device_state
        empty = [[] for _ in range(batch)]
        self.script = compile_script(empty, self.dm, pad_to=self.pad_to)
        self.state = pipe.init_state(batch, jax.random.PRNGKey(seed))
        self._template = pipe.init_state(batch, jax.random.PRNGKey(seed))
        self.mstate = init_device_state(self.dm, self.script)
        self._mtemplate = init_device_state(self.dm, self.script)
        self.slots: List[SlotInfo] = [SlotInfo() for _ in range(batch)]
        self._by_session: Dict[str, int] = {}
        self._reset_slot = _make_slot_reset()
        self._delay_steps = pipe.lm_cfg.delay_steps
        self._total: List[Optional[int]] = [None] * batch

    def attach(self, session_id: str, entries) -> int:
        """Claim a free slot for a script (list of Entry).  Resets the
        slot's LM/mimi state rows, FSM rows, and script rows in place."""
        return self.attach_many({session_id: entries})[session_id]

    def attach_many(self, requests: Dict[str, list]) -> Dict[str, int]:
        """Attach several scripts in ONE batch: one script compile, one
        script-row scatter, one masked state reset, one masked FSM reset
        (k attaches used to cost 2k reset launches + k scatters)."""
        free = [i for i, s in enumerate(self.slots) if s.session_id is None]
        if len(requests) > len(free):
            raise RuntimeError("pool full")
        ids = list(requests)
        for sid in ids:
            assert sid not in self._by_session, "duplicate session"
        slots = free[: len(ids)]
        rows = self._compile([requests[sid] for sid in ids], self.dm,
                             pad_to=self.pad_to)
        idx = jnp.asarray(slots, jnp.int32)
        self.script = {k: v.at[idx].set(rows[k])
                       for k, v in self.script.items()}
        self.state = self._reset_slot(self.state, self._template, slots)
        self.mstate = self._reset_slot(self.mstate, self._mtemplate, slots)
        out = {}
        for sid, i in zip(ids, slots):
            self.slots[i] = SlotInfo(session_id=sid, frames=0)
            self._by_session[sid] = i
            self._total[i] = None
            out[sid] = i
        return out

    def detach(self, session_id: str):
        i = self._by_session.pop(session_id)
        self.slots[i] = SlotInfo()
        self._total[i] = None

    @property
    def active(self) -> int:
        return len(self._by_session)

    def tick(self) -> Dict[str, dict]:
        """One frame for all active slots (single launch).  Returns
        session id -> {audio_out [frame_samples] f32, valid, done}.
        `done` slots auto-detach (their audio tail has fully drained:
        offset >= end_step + delay_steps + final_padding)."""
        if not self._by_session:
            return {}    # idle pool: skip the device launch entirely
        out, self.state, self.mstate = self.pipe.step_device(
            self.mimi_params, self.lm_params, self.state, self.mstate,
            self.script)
        audio = np.asarray(out["audio_out"])
        valid = np.asarray(out["valid"])
        end = np.asarray(out["end_step"])
        results = {}
        for sid in list(self._by_session):
            i = self._by_session[sid]
            self.slots[i].frames += 1
            if self._total[i] is None and end[i] >= 0:
                self._total[i] = int(end[i]) + self._delay_steps + \
                    self.FINAL_PADDING
            done = (self._total[i] is not None
                    and self.slots[i].frames >= self._total[i])
            results[sid] = {"audio_out": audio[i],
                            "valid": bool(valid[i]), "done": done}
            if done:
                self.detach(sid)
        return results

    def tick_chunk(self, n: int) -> Dict[str, dict]:
        """`n` frames for all active slots as chunked lax.scans — one
        device launch (and one D->H fetch) per chunk instead of per
        frame (the device-side FSM needs no host between frames;
        VERDICT r4 item 2: per-frame-synced pool ticks were host-paced
        and threw away the device FSM's advantage).  Sessions attach /
        detach at chunk boundaries; a slot finishing mid-chunk free-runs
        to the boundary (its surplus frames are trimmed here).  Returns
        session id -> {audio_out [kept, samples], valid [kept],
        done}."""
        if not self._by_session:
            return {}
        audio, valid, end, self.state, self.mstate = self.pipe.scan_device(
            self.mimi_params, self.lm_params, self.state, self.mstate,
            self.script, n)
        audio = np.asarray(audio)
        valid = np.asarray(valid)
        end = np.asarray(end)
        results = {}
        for sid in list(self._by_session):
            i = self._by_session[sid]
            base = self.slots[i].frames
            self.slots[i].frames += n
            if self._total[i] is None:
                hits = np.nonzero(end[:, i] >= 0)[0]
                if hits.size:
                    self._total[i] = (int(end[hits[0], i])
                                      + self._delay_steps
                                      + self.FINAL_PADDING)
            tot = self._total[i]
            done = tot is not None and self.slots[i].frames >= tot
            kept = n if tot is None else max(0, min(n, tot - base))
            results[sid] = {"audio_out": audio[:kept, i],
                            "valid": valid[:kept, i], "done": done}
            if done:
                self.detach(sid)
        return results
