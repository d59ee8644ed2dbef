import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moshi_tpu.models.lm import LMConfig, init_lm_params
from moshi_tpu.models.mimi import MimiConfig, MimiModel
from moshi_tpu.models.state_machine import Entry, StateMachine
from moshi_tpu.nn.seanet import SEANetConfig
from moshi_tpu.runtime.session import LMGenerator, MimiStreamer

_cfg = LMConfig(
    dim=32, num_heads=4, num_layers=2, hidden_dim=64, context=32,
    card=32, n_q=4, dep_q=2, text_card=48, delays=(0, 0, 1, 1, 2),
    depformer_dim=16, depformer_heads=2, depformer_layers=2,
    depformer_hidden=32, depformer_low_rank=8)


@pytest.fixture(scope="module")
def lm_params():
    return init_lm_params(jax.random.PRNGKey(0), _cfg)


def test_sts_session_loop(lm_params):
    gen = LMGenerator(_cfg, lm_params, temp=0.8, temp_text=0.7,
                      top_k=8, top_k_text=8, seed=1)
    rng = np.random.default_rng(0)
    got_audio = 0
    for i in range(8):
        gen.send2(rng.integers(0, 32, size=(1, 2)))
        out = gen.receive()
        if out["has_audio"][0]:
            got_audio += 1
            assert (out["audio"] >= 0).all()
    assert got_audio >= 4
    assert gen.is_active()   # no machine -> always active


def test_tts_session_with_machine(lm_params):
    machine = StateMachine(text_card=_cfg.text_card + 1, max_padding=4,
                           initial_padding=1)
    cfg = _cfg
    gen = LMGenerator(cfg, lm_params, temp=0.0, temp_text=0.0,
                      machine=machine, seed=2)
    for w, toks in (("hi", [10, 11]), ("there", [12])):
        gen.send(Entry(list(toks), w, padding=0))
    steps = 0
    while gen.is_active() and steps < 40:
        out = gen.receive()
        steps += 1
    # machine consumed the script and signalled the end
    assert gen.machine_state.end_step >= 0
    assert not gen.is_active()
    assert gen.is_empty()


def test_text_prefix_feeding(lm_params):
    machine = StateMachine(text_card=_cfg.text_card + 1)
    gen = LMGenerator(_cfg, lm_params, temp=0.0, temp_text=0.0,
                      machine=machine, seed=3)
    gen.text_prefixes.extend([21, 22])
    out1 = gen.step()
    out2 = gen.step()
    assert int(out1["sampled_text"][0]) == 21
    assert int(out2["sampled_text"][0]) == 22


def test_audio_prefix_and_skip(lm_params):
    gen = LMGenerator(_cfg, lm_params, temp=0.0, temp_text=0.0, seed=4)
    gen.audio_prefixes.append([5, 6])
    out = gen.step()
    # skip window suppresses output
    assert not out["has_audio"].any()
    c = np.asarray(gen.state["cache"])
    assert c[0, 1, 1] == 5 and c[0, 1, 2] == 6
    out = gen.step()
    assert not out["has_audio"].any()  # skip still draining


def test_mimi_streamer(rng):
    cfg = MimiConfig(
        n_q=4, total_codebooks=4, dim=32,
        seanet=SEANetConfig(dimension=32, n_filters=4, ratios=(4, 3, 2, 2)),
        codebook_dim=16, codebook_size=32, transformer_layers=1,
        transformer_heads=4, transformer_context=8, transformer_hidden=64)
    m = MimiModel(cfg)
    params = m.init_params(jax.random.PRNGKey(0))
    st = MimiStreamer(m, params)
    frame = rng.normal(size=(1, cfg.seanet.hop_length * 2)).astype(np.float32)
    codes = st.encode(frame)
    assert codes.shape == (1, 1, 4)
    audio = st.decode(codes)
    assert audio.shape == (1, cfg.seanet.hop_length * 2)
    # dep_q-short codes get padded; -1 mapped to 0
    audio2 = st.decode(np.asarray([[-1, 3]]))
    assert audio2.shape == (1, cfg.seanet.hop_length * 2)
    st.reset()


def test_batched_sessions_equal_separate_runs(lm_params):
    """State isolation: two sessions in one batch (greedy sampling) must
    produce exactly what each produces alone — with long-enough streams
    to wrap the ring KV cache (context 32 < 40 frames)."""
    import jax.numpy as jnp
    from moshi_tpu.models.lm import init_gen_state, lm_gen_step
    cfg = _cfg
    rng = np.random.default_rng(7)
    others = rng.integers(0, 32, size=(40, 2, 2)).astype(np.int32)

    step = jax.jit(lambda p, s, o: lm_gen_step(cfg, p, s, other_audio=o,
                                               temp=0.0, temp_text=0.0))

    def run(batch_rows):
        state = init_gen_state(cfg, len(batch_rows), jax.random.PRNGKey(0))
        outs = []
        for f in range(40):
            o = jnp.asarray(others[f][batch_rows])
            out, state = step(lm_params, state, o)
            outs.append((np.asarray(out["text"]), np.asarray(out["audio"])))
        return outs

    both = run([0, 1])
    only0 = run([0])
    only1 = run([1])
    for f in range(40):
        np.testing.assert_array_equal(both[f][0][0:1], only0[f][0])
        np.testing.assert_array_equal(both[f][1][0:1], only0[f][1])
        np.testing.assert_array_equal(both[f][0][1:2], only1[f][0])
        np.testing.assert_array_equal(both[f][1][1:2], only1[f][1])
