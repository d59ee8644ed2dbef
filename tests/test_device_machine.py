"""Device-side StateMachine (models/device_machine.py) must match the
host FSM (models/state_machine.py, itself mirroring lm.h:102-193)
transition-for-transition: same output token stream, same end_step,
for scripts with words, breaks, and second_stream_ahead muxing."""

import numpy as np
import pytest

import jax.numpy as jnp

from moshi_tpu.models.device_machine import (DeviceMachineConfig,
                                             compile_script,
                                             device_machine_step,
                                             init_device_state)
from moshi_tpu.models.state_machine import Entry, StateMachine


def _random_entries(rng, n_entries, card, with_breaks=True):
    entries = []
    for _ in range(n_entries):
        if with_breaks and rng.random() < 0.15:
            entries.append(Entry([], "<break>", padding=int(rng.integers(1, 6))))
        else:
            ln = int(rng.integers(1, 5))
            toks = [int(t) for t in rng.integers(4, card - 1, size=ln)]
            entries.append(Entry(toks, "w", padding=int(rng.integers(0, 3))))
    return entries


@pytest.mark.parametrize("ssa", [0, 2])
@pytest.mark.parametrize("seed", [0, 1])
def test_device_fsm_matches_host(ssa, seed):
    rng = np.random.default_rng(seed)
    card = 4001
    entries = _random_entries(rng, 12, card)
    machine = StateMachine(text_card=card, second_stream_ahead=ssa,
                           max_padding=8, initial_padding=2)
    hstate = machine.new_state([Entry(list(e.tokens), e.text, e.padding)
                                for e in entries])

    cfg = DeviceMachineConfig(card=card, second_stream_ahead=ssa,
                              max_padding=8, initial_padding=2)
    script = compile_script([entries], cfg)
    dstate = init_device_state(cfg, script)

    n_steps = 250
    # sampled tokens: mix of NEW_WORD, PAD, and arbitrary ids (the FSM
    # sanitizes the latter to PAD, lm.h:141-143)
    sampled = rng.choice([0, 3, 3, 777], size=n_steps)
    for step in range(n_steps):
        want = machine.process(step, hstate, int(sampled[step]))
        got, dstate = device_machine_step(
            cfg, script, dstate,
            jnp.asarray([step], jnp.int32),
            jnp.asarray([int(sampled[step])], jnp.int32))
        assert int(np.asarray(got)[0]) == want, \
            f"step {step}: device {int(np.asarray(got)[0])} != host {want}"
    assert int(np.asarray(dstate["end_step"])[0]) == hstate.end_step


def test_device_fsm_inactive_passthrough():
    cfg = DeviceMachineConfig(card=101, second_stream_ahead=0)
    entries = [Entry([7, 8], "w", 0)]
    script = compile_script([entries], cfg)
    st = init_device_state(cfg, script)
    out, st2 = device_machine_step(
        cfg, script, st, jnp.asarray([0], jnp.int32),
        jnp.asarray([42], jnp.int32),
        active=jnp.asarray([False]))
    assert int(np.asarray(out)[0]) == 42
    for k in st:
        assert np.array_equal(np.asarray(st[k]), np.asarray(st2[k])), k


def test_device_fsm_batched_diverging_scripts():
    """Two slots with different scripts in one step call must match two
    independent host FSMs (batched TTS serving; no reference analog)."""
    rng = np.random.default_rng(7)
    card = 2001
    ssa = 2
    scripts = [_random_entries(rng, 6, card), _random_entries(rng, 14, card)]
    machine = StateMachine(text_card=card, second_stream_ahead=ssa,
                           max_padding=8, initial_padding=2)
    hstates = [machine.new_state([Entry(list(e.tokens), e.text, e.padding)
                                  for e in s]) for s in scripts]
    cfg = DeviceMachineConfig(card=card, second_stream_ahead=ssa,
                              max_padding=8, initial_padding=2)
    script = compile_script(scripts, cfg)
    dstate = init_device_state(cfg, script)
    sampled = rng.choice([0, 3], size=(120, 2))
    for step in range(120):
        want = [machine.process(step, hstates[i], int(sampled[step, i]))
                for i in range(2)]
        got, dstate = device_machine_step(
            cfg, script, dstate, jnp.full((2,), step, jnp.int32),
            jnp.asarray(sampled[step], jnp.int32))
        assert list(np.asarray(got)) == want, f"step {step}"
    for i in range(2):
        assert int(np.asarray(dstate["end_step"])[i]) == hstates[i].end_step
