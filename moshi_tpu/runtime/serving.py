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
import numpy as np

from moshi_tpu.runtime.pipeline import STSPipeline


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

        # jitted per-slot reset: copies the template's rows for one slot.
        # The batch axis is known by path: KV-ring leaves ("k"/"v") are
        # stacked [L, B, ...] (axis 1); everything else (delay cache,
        # offsets, conv carries) is [B, ...] (axis 0); "rng" is shared.
        def reset_slot(state, template, slot):
            s_leaves, treedef = jax.tree_util.tree_flatten_with_path(state)
            t_leaves = treedef.flatten_up_to(template)
            out = []
            for (path, leaf), tmpl in zip(s_leaves, t_leaves):
                last = str(path[-1])
                if "rng" in last or getattr(leaf, "ndim", 0) == 0:
                    out.append(leaf)
                elif ("'k'" in last or "'v'" in last) and leaf.ndim >= 3:
                    out.append(leaf.at[:, slot].set(tmpl[:, slot]))
                else:
                    out.append(leaf.at[slot].set(tmpl[slot]))
            return jax.tree_util.tree_unflatten(treedef, out)

        self._reset_slot = jax.jit(reset_slot, donate_argnums=(0,),
                                   static_argnums=(2,))

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
