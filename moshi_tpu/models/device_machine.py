"""Device-side text StateMachine: the host FSM of state_machine.py
re-expressed as pure jnp scalar/gather arithmetic so the whole TTS frame
(temporal forward + text sampling + FSM + depformer + mimi decode) is ONE
jit launch with no per-frame device->host round trip.

Behavioral parity target: StateMachine.process (state_machine.py, itself
mirroring /root/reference/src/moshi/models/lm.h:102-193).  The host FSM
is inherently per-frame sequential, but every transition is scalar
arithmetic over a word queue whose contents are STATIC per session (the
script).  So:

  * the script compiles once (host) to flat device arrays: a concatenated
    token stream plus per-entry [start, len, padding, lookahead-source];
    `get_tokens_ahead` (lm.h:176-183) becomes a precomputed per-entry
    index because the entry list never changes after start;
  * the main queue (always the suffix of one entry's tokens —
    NEW_WORD is only accepted when the queue is empty, lm.h:131-139) is a
    (start, len) cursor into the flat stream;
  * the lookahead queue (second_stream_ahead mux) is a small ring whose
    capacity = total script tokens, which it can never exceed;
  * remaining/forced padding budgets and end_step are int32 lanes.

Everything is [B]-vectorized: batched TTS slots with diverging scripts
run the FSM in the same launch (no reference analog — the reference is
B=1 host code).  `active` masks slots whose text is host-forced this
frame (voice prefixes) or already detached.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from moshi_tpu.models.state_machine import Entry, TokenIds

NEW_WORD = 0
PAD = 3


@dataclass(frozen=True)
class DeviceMachineConfig:
    """Static FSM parameters (mirrors StateMachine.__init__)."""
    card: int                       # TokenIds.card = text_card (+1)
    second_stream_ahead: int = 0
    max_padding: int = 8            # moshi.cpp:852-853
    initial_padding: int = 2


def compile_script(entries_per_slot: Sequence[Sequence[Entry]],
                   cfg: DeviceMachineConfig,
                   pad_to: tuple[int, int] | None = None):
    """Host-side: entries -> static device arrays, one row per slot.

    Returns a dict of int32 arrays:
      tok_flat [B, N]  all entry tokens concatenated (per slot)
      e_start  [B, E]  entry token offset into tok_flat
      e_len    [B, E]  entry token count (0 = pure-padding <break/>)
      e_pad    [B, E]  entry forced padding
      e_ahead  [B, E]  index of the entry whose tokens feed the lookahead
                       ring when this entry is popped (the
                       second_stream_ahead-th LATER entry with tokens,
                       lm.h:176-183), or -1
      n_entries [B]
    Shapes are padded to the max across slots (empty-padded)."""
    rows = []
    for entries in entries_per_slot:
        flat: list[int] = []
        start, length, pad, ahead = [], [], [], []
        nonempty = [i for i, e in enumerate(entries) if e.tokens]
        for i, e in enumerate(entries):
            start.append(len(flat))
            length.append(len(e.tokens))
            pad.append(e.padding)
            flat.extend(e.tokens)
            src = -1
            if cfg.second_stream_ahead:
                later = [j for j in nonempty if j > i]
                k = cfg.second_stream_ahead - 1
                if k < len(later):
                    src = later[k]
            ahead.append(src)
        rows.append((flat, start, length, pad, ahead))
    b = len(rows)
    n = max(1, max(len(r[0]) for r in rows))
    e = max(1, max(len(r[1]) for r in rows))
    if pad_to is not None:
        # fixed serving capacity: attaching a new script never changes
        # array shapes (no recompile in a session pool)
        if n > pad_to[0] or e > pad_to[1]:
            raise ValueError(f"script ({n} tokens, {e} entries) exceeds "
                             f"pool capacity {pad_to}")
        n, e = pad_to

    def padded(seqs, width, fill):
        out = np.full((b, width), fill, np.int32)
        for i, s in enumerate(seqs):
            out[i, : len(s)] = s
        return out

    return {
        "tok_flat": jnp.asarray(padded([r[0] for r in rows], n, 0)),
        "e_start": jnp.asarray(padded([r[1] for r in rows], e, 0)),
        "e_len": jnp.asarray(padded([r[2] for r in rows], e, 0)),
        "e_pad": jnp.asarray(padded([r[3] for r in rows], e, 0)),
        "e_ahead": jnp.asarray(padded([r[4] for r in rows], e, -1)),
        "n_entries": jnp.asarray(
            [len(r[1]) for r in rows], jnp.int32),
    }


def init_device_state(cfg: DeviceMachineConfig, script):
    """Fresh FSM state rows matching StateMachine.new_state."""
    b, n = script["tok_flat"].shape
    cap = max(8, n)                 # ring can never exceed script tokens

    def z():
        # distinct buffers: the fused step donates the state, and XLA
        # rejects donating one buffer twice
        return jnp.zeros((b,), jnp.int32)

    return {
        "entry_idx": z(),
        "remaining_padding": jnp.full((b,), cfg.initial_padding, jnp.int32),
        "forced_padding": jnp.full((b,), cfg.initial_padding, jnp.int32),
        "end_step": jnp.full((b,), -1, jnp.int32),
        "q_start": z(),
        "q_len": z(),
        "la_buf": jnp.zeros((b, cap), jnp.int32),
        "la_head": z(),
        "la_len": z(),
    }


def device_machine_step(cfg: DeviceMachineConfig, script, st, step, token,
                        active=None):
    """One FSM transition per slot, in-jit.

    step [B] int32 (the LM offset), token [B] sampled text token,
    active [B] bool (False = leave the slot's state untouched and pass
    the sampled token through — host-forced prefix frames).
    Returns (output_token [B], new_state)."""
    b, ecap = script["e_start"].shape
    cap = st["la_buf"].shape[1]
    bi = jnp.arange(b)
    if active is None:
        active = jnp.ones((b,), bool)

    q_len, q_start = st["q_len"], st["q_start"]
    rem, forced = st["remaining_padding"], st["forced_padding"]
    end_step, entry_idx = st["end_step"], st["entry_idx"]
    la_buf, la_head, la_len = st["la_buf"], st["la_head"], st["la_len"]

    # ---- sanitize + budget overrides (lm.h:141-152) -------------------
    tok = jnp.where((token != NEW_WORD) & (token != PAD), PAD, token)
    tok = jnp.where(q_len > 0, PAD,
                    jnp.where(forced > 0, PAD,
                              jnp.where(rem <= 0, NEW_WORD, tok)))

    # ---- NEW_WORD: pop the next entry (lm.h:154-171) ------------------
    is_nw = tok == NEW_WORD
    has_entry = entry_idx < script["n_entries"]
    e = jnp.clip(entry_idx, 0, ecap - 1)
    e_start = script["e_start"][bi, e]
    e_len = script["e_len"][bi, e]
    e_pad = script["e_pad"][bi, e]
    e_ahead = script["e_ahead"][bi, e]
    pop = is_nw & has_entry
    pop_tok = pop & (e_len > 0)

    q_start = jnp.where(pop_tok, e_start, q_start)
    q_len = jnp.where(pop_tok, e_len, q_len)
    rem = jnp.where(pop_tok, cfg.max_padding, rem)
    forced = jnp.where(pop, e_pad, forced)
    entry_idx = jnp.where(pop, entry_idx + 1, entry_idx)
    tok = jnp.where(pop & (e_len == 0), PAD, tok)

    if cfg.second_stream_ahead:
        # append the lookahead source entry's tokens to the ring
        ext = pop_tok & (e_ahead >= 0)
        src = jnp.clip(e_ahead, 0, ecap - 1)
        s_start = script["e_start"][bi, src]
        s_len = jnp.where(ext, script["e_len"][bi, src], 0)
        ncap = script["tok_flat"].shape[1]
        k = jnp.arange(cap)[None, :]
        wpos = (la_head[:, None] + la_len[:, None] + k) % cap
        vals = script["tok_flat"][bi[:, None],
                                  jnp.clip(s_start[:, None] + k, 0,
                                           ncap - 1)]
        mask = k < s_len[:, None]
        cur = la_buf[bi[:, None], wpos]
        la_buf = la_buf.at[bi[:, None], wpos].set(
            jnp.where(mask, vals, cur))
        la_len = la_len + s_len

    # ---- out of entries (lm.h:164-170) --------------------------------
    noent = is_nw & ~has_entry
    tok = jnp.where(noent, PAD, tok)
    if cfg.second_stream_ahead:
        tok = jnp.where(noent & (end_step < 0), NEW_WORD, tok)
    end_step = jnp.where(noent & (end_step < 0), step, end_step)

    # ---- emit (lm.h:173-189) ------------------------------------------
    is_pad = tok == PAD
    rem = jnp.where(is_pad & (rem > 0), rem - 1, rem)
    forced = jnp.where(is_pad & (forced > 0), forced - 1, forced)
    ncap = script["tok_flat"].shape[1]
    q_front = script["tok_flat"][bi, jnp.clip(q_start, 0, ncap - 1)]
    out = jnp.where(is_pad,
                    jnp.where(q_len > 0, q_front, PAD),
                    NEW_WORD)
    popped = is_pad & (q_len > 0)
    q_start = jnp.where(popped, q_start + 1, q_start)
    q_len = jnp.where(popped, q_len - 1, q_len)

    if cfg.second_stream_ahead:
        out_is_nw = out == NEW_WORD
        q_front2 = script["tok_flat"][bi, jnp.clip(q_start, 0, ncap - 1)]
        second = jnp.where(out_is_nw, NEW_WORD, -1)
        out = jnp.where(out_is_nw,
                        jnp.where(q_len > 0, q_front2, PAD), out)
        popped2 = out_is_nw & (q_len > 0)
        q_start = jnp.where(popped2, q_start + 1, q_start)
        q_len = jnp.where(popped2, q_len - 1, q_len)
        la_front = la_buf[bi, la_head]
        pop_la = ~out_is_nw & (la_len > 0)
        second = jnp.where(pop_la, la_front, second)
        la_head = jnp.where(pop_la, (la_head + 1) % cap, la_head)
        la_len = jnp.where(pop_la, la_len - 1, la_len)
        out = (second + 1) * cfg.card + out

    new_st = {
        "entry_idx": entry_idx, "remaining_padding": rem,
        "forced_padding": forced, "end_step": end_step,
        "q_start": q_start, "q_len": q_len,
        "la_buf": la_buf, "la_head": la_head, "la_len": la_len,
    }
    out = jnp.where(active, out, token)
    # merge BY KEY (jit pytree flattening re-sorts dict order)
    new_st = {k: jnp.where(_bcast(active, st[k]), new_st[k], st[k])
              for k in st}
    return out, new_st


def _bcast(active, v):
    return active[:, None] if v.ndim == 2 else active


def machine_device_config(machine) -> DeviceMachineConfig:
    """Lift a host StateMachine's parameters."""
    return DeviceMachineConfig(
        card=machine.token_ids.card,
        second_stream_ahead=machine.second_stream_ahead,
        max_padding=machine.max_padding,
        initial_padding=machine.initial_padding)
