"""Batched TTS: B>1 sessions with diverging scripts behind per-slot
StateMachines share one jitted program (VERDICT r1 item 6; SURVEY §7.2
step 7 "batched StateMachine" — new design, the reference is B=1 only:
moshi.cpp lm contexts are allocated with n_batch=1)."""

import types

import jax
import numpy as np
import pytest

from moshi_tpu.models.lm import LMConfig, init_lm_params
from moshi_tpu.models.mimi import MimiConfig, MimiModel
from moshi_tpu.models.state_machine import Entry, StateMachine
from moshi_tpu.nn.seanet import SEANetConfig
from moshi_tpu.runtime.pipeline import TTSPipeline

_mimi_cfg = MimiConfig(
    n_q=4, total_codebooks=4, dim=32,
    seanet=SEANetConfig(dimension=32, n_filters=4, ratios=(4, 3, 2, 2)),
    codebook_dim=16, codebook_size=32, transformer_layers=1,
    transformer_heads=4, transformer_context=8, transformer_hidden=64)

_lm_cfg = LMConfig(
    dim=32, num_heads=4, num_layers=2, hidden_dim=64, context=32,
    card=32, n_q=4, dep_q=2, text_card=48, delays=(0, 0, 1, 1, 2),
    depformer_dim=16, depformer_heads=2, depformer_layers=2,
    depformer_hidden=32, depformer_low_rank=8)


class FakeTokenizer:
    def encode(self, word):
        return [10 + (ord(c) % 30) for c in word]


@pytest.fixture(scope="module")
def models():
    import jax.numpy as jnp
    mimi = MimiModel(_mimi_cfg)
    mimi_params = mimi.init_params(jax.random.PRNGKey(0), jnp.float32)
    lm_params = init_lm_params(jax.random.PRNGKey(1), _lm_cfg)
    return mimi, mimi_params, lm_params


def _machine():
    return StateMachine(text_card=_lm_cfg.text_card + 1,
                        max_padding=3, initial_padding=1)


def test_batched_fsm_diverging_scripts(models):
    import jax.numpy as jnp
    mimi, mimi_params, lm_params = models
    pipe = TTSPipeline(mimi, _lm_cfg, temp=0.0, temp_text=0.0,
                       mimi_dtype=jnp.float32)
    machine = _machine()
    # slot 0: two words; slot 1: one long word -> different end_steps
    ms = [
        machine.new_state([Entry([10, 11], "hi", 0),
                           Entry([12], "yo", 0)]),
        machine.new_state([Entry([20, 21, 22, 23, 24], "lonword", 0)]),
    ]
    state = pipe.init_state(2, jax.random.PRNGKey(7))
    sampled = [[], []]
    for off in range(24):
        out, state = pipe.step(mimi_params, lm_params, state,
                               machine=machine, machine_state=ms,
                               offset=off)
        t = np.asarray(out["sampled_text"])
        sampled[0].append(int(t[0]))
        sampled[1].append(int(t[1]))
    # both scripts drained and ended at their own steps
    assert ms[0].is_empty() and ms[1].is_empty()
    assert ms[0].end_step >= 0 and ms[1].end_step >= 0
    # the forced token streams diverge (different scripts)
    assert sampled[0] != sampled[1]
    # slot 0's stream contains its word tokens, slot 1's contains its own
    assert {10, 11, 12} <= set(sampled[0])
    assert {20, 21, 22, 23, 24} <= set(sampled[1])
    assert not ({20, 21, 22} & set(sampled[0]))


def test_batched_slot_matches_single_run(models):
    """Each slot of a B=2 batch produces the same forced-text trajectory
    and FSM end_step as a B=1 run of the same script (greedy)."""
    import jax.numpy as jnp
    mimi, mimi_params, lm_params = models
    pipe = TTSPipeline(mimi, _lm_cfg, temp=0.0, temp_text=0.0,
                       mimi_dtype=jnp.float32)
    machine = _machine()
    scripts = [[Entry([10, 11], "hi", 0)],
               [Entry([20, 21, 22], "oy", 0)]]

    def run(mstates, b):
        state = pipe.init_state(b, jax.random.PRNGKey(7))
        toks = []
        for off in range(16):
            out, state = pipe.step(
                mimi_params, lm_params, state, machine=machine,
                machine_state=mstates if b > 1 else mstates[0],
                offset=off)
            toks.append(np.asarray(out["sampled_text"]).copy())
        return np.stack(toks)

    ms_b = [machine.new_state(list(s)) for s in scripts]
    batched = run(ms_b, 2)
    ends_b = [m.end_step for m in ms_b]
    for i, script in enumerate(scripts):
        ms_1 = [machine.new_state(list(script))]
        single = run(ms_1, 1)
        np.testing.assert_array_equal(batched[:, i], single[:, 0],
                                      err_msg=f"slot {i}")
        assert ends_b[i] == ms_1[0].end_step


def test_generate_wavs_batched(models):
    import jax.numpy as jnp
    mimi, mimi_params, lm_params = models
    from moshi_tpu.models.tts import TTSModel
    config = types.SimpleNamespace(
        tts_config=types.SimpleNamespace(second_stream_ahead=0),
        lm_gen_config=types.SimpleNamespace(temp=0.0, temp_text=0.0,
                                            top_k=8, top_k_text=8))
    model = TTSModel(_lm_cfg, lm_params, mimi, mimi_params,
                     FakeTokenizer(), config, mimi_dtype=jnp.float32)
    model.machine = _machine()
    outs = model.generate_wavs([["hello world"], ["a much longer script "
                                                  "with more words here"]],
                               max_frames=60)
    assert len(outs) == 2
    (wav0, end0), (wav1, end1) = outs
    assert wav0.ndim == 1 and np.isfinite(wav0).all()
    assert wav1.ndim == 1 and np.isfinite(wav1).all()
    # the longer script runs longer and yields more audio
    assert end1 > end0
    assert len(wav1) > len(wav0)


def test_session_lmgenerator_batched_machines(models):
    from moshi_tpu.runtime.session import LMGenerator
    _, _, lm_params = models
    machine = _machine()
    gen = LMGenerator(_lm_cfg, lm_params, batch=2, temp=0.0,
                      temp_text=0.0, machine=machine)
    gen.send(Entry([10, 11], "hi", 0), slot=0)
    gen.send(Entry([20, 21, 22, 23], "long", 0), slot=1)
    steps = 0
    while gen.is_active() and steps < 40:
        out = gen.receive()
        steps += 1
    assert not gen.is_active()
    ends = [ms.end_step for ms in gen.machine_states]
    assert ends[0] >= 0 and ends[1] >= 0
    # back-compat surface: machine_state is slot 0
    assert gen.machine_state is gen.machine_states[0]
    assert not gen.is_active(slot=0) and not gen.is_active(slot=1)
