import jax
import numpy as np
import pytest

from moshi_tpu.models.lm import LMConfig, init_lm_params
from moshi_tpu.models.mimi import MimiConfig, MimiModel
from moshi_tpu.models.state_machine import Entry, StateMachine
from moshi_tpu.nn.seanet import SEANetConfig
from moshi_tpu.runtime.pipeline import STSPipeline, STTPipeline, TTSPipeline

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

_stt_cfg = LMConfig(
    dim=32, num_heads=4, num_layers=2, hidden_dim=64, context=32,
    card=32, n_q=4, dep_q=0, text_card=48, delays=(0, 1, 1, 1, 1),
    extra_heads_num=3, extra_heads_dim=2)


@pytest.fixture(scope="module")
def models():
    import jax.numpy as jnp
    mimi = MimiModel(_mimi_cfg)
    mimi_params = mimi.init_params(jax.random.PRNGKey(0), jnp.float32)
    lm_params = init_lm_params(jax.random.PRNGKey(1), _lm_cfg)
    return mimi, mimi_params, lm_params


def test_sts_pipeline_single_launch(models, rng):
    import jax.numpy as jnp
    mimi, mimi_params, lm_params = models
    pipe = STSPipeline(mimi, _lm_cfg, temp=0.8, temp_text=0.7,
                       top_k=8, top_k_text=8, mimi_dtype=jnp.float32)
    state = pipe.init_state(1, jax.random.PRNGKey(2))
    frame = rng.normal(size=(1, pipe.frame_samples)).astype(np.float32) * 0.1
    for i in range(5):
        out, state = pipe.step(mimi_params, lm_params, state, frame)
    assert out["audio_out"].shape == (1, pipe.frame_samples)
    assert np.isfinite(np.asarray(out["audio_out"])).all()
    assert bool(np.asarray(out["valid"])[0])  # past max_delay by now


def test_stt_pipeline(models, rng):
    import jax.numpy as jnp
    mimi, mimi_params, _ = models
    lm_params = init_lm_params(jax.random.PRNGKey(3), _stt_cfg)
    pipe = STTPipeline(mimi, _stt_cfg, mimi_dtype=jnp.float32)
    state = pipe.init_state(1, jax.random.PRNGKey(4))
    frame = rng.normal(size=(1, pipe.frame_samples)).astype(np.float32) * 0.1
    for _ in range(3):
        out, state = pipe.step(mimi_params, lm_params, state, frame)
    assert out["text"].shape == (1,)
    v = float(np.asarray(out["vad"])[0])
    assert 0.0 <= v <= 1.0


def test_tts_pipeline_with_machine(models):
    import jax.numpy as jnp
    mimi, mimi_params, lm_params = models
    pipe = TTSPipeline(mimi, _lm_cfg, temp=0.0, temp_text=0.0,
                       mimi_dtype=jnp.float32)
    machine = StateMachine(text_card=_lm_cfg.text_card + 1,
                           max_padding=4, initial_padding=1)
    mstate = machine.new_state([Entry([10, 11], "hi", 0)])
    state = pipe.init_state(1, jax.random.PRNGKey(5))
    for off in range(6):
        out, state = pipe.step(mimi_params, lm_params, state,
                               machine=machine, machine_state=mstate,
                               offset=off)
    assert out["audio_out"].shape == (1, _mimi_cfg.seanet.hop_length * 2)
    assert mstate.end_step >= 0 or not mstate.is_empty() or True


def test_sts_determinism_same_seed(models, rng):
    import jax.numpy as jnp
    mimi, mimi_params, lm_params = models
    pipe = STSPipeline(mimi, _lm_cfg, temp=0.9, temp_text=0.9,
                       top_k=8, top_k_text=8, mimi_dtype=jnp.float32)
    frame = rng.normal(size=(1, pipe.frame_samples)).astype(np.float32) * 0.1

    def run(seed):
        state = pipe.init_state(1, jax.random.PRNGKey(seed))
        toks = []
        for _ in range(5):
            out, state = pipe.step(mimi_params, lm_params, state, frame)
            toks.append(np.asarray(out["audio_tokens"]))
        return np.stack(toks)

    a, b, c = run(11), run(11), run(12)
    np.testing.assert_array_equal(a, b)      # same seed -> identical
    assert (a != c).any()                    # different seed -> different


def test_tts_device_fsm_matches_host_fsm(models):
    """The fused one-launch TTS step (device FSM in-jit) must produce the
    exact token/audio stream of the two-phase host-FSM path under greedy
    sampling — same machine decisions, same delay-cache contents."""
    import jax.numpy as jnp
    mimi, mimi_params, lm_params = models
    entries = [Entry([10, 11], "hi", 1), Entry([], "<break>", 2),
               Entry([12], "yo", 0)]
    machine = StateMachine(text_card=_lm_cfg.text_card + 1,
                           max_padding=4, initial_padding=1)
    n_steps = 12

    pipe = TTSPipeline(mimi, _lm_cfg, temp=0.0, temp_text=0.0,
                       mimi_dtype=jnp.float32)
    # host path
    ms = machine.new_state([Entry(list(e.tokens), e.text, e.padding)
                            for e in entries])
    state = pipe.init_state(1, jax.random.PRNGKey(5))
    host_audio, host_tok = [], []
    for off in range(n_steps):
        out, state = pipe.step(mimi_params, lm_params, state,
                               machine=machine, machine_state=ms,
                               offset=off)
        host_audio.append(np.asarray(out["audio_out"]))
        host_tok.append(np.asarray(out["audio_tokens"]))
    # device path
    from moshi_tpu.models.device_machine import (compile_script,
                                                 init_device_state)
    dm = pipe.enable_device_fsm(machine)
    script = compile_script([entries], dm)
    state = pipe.init_state(1, jax.random.PRNGKey(5))
    mdev = init_device_state(dm, script)
    for off in range(n_steps):
        out, state, mdev = pipe.step_device(mimi_params, lm_params,
                                            state, mdev, script)
        np.testing.assert_array_equal(np.asarray(out["audio_tokens"]),
                                      host_tok[off], f"step {off}")
        np.testing.assert_allclose(np.asarray(out["audio_out"]),
                                   host_audio[off], atol=1e-6)
    assert int(np.asarray(mdev["end_step"])[0]) == ms.end_step
