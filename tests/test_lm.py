import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moshi_tpu.models.lm import (LMConfig, UNGENERATED, ZERO,
                                 build_input_frame, depformer_generate,
                                 init_gen_state, init_lm_params, lm_gen_step,
                                 lm_text_step, lm_audio_step, read_output,
                                 temporal_forward, write_generated,
                                 write_stream_tokens)
from moshi_tpu.config import parse_config

_small = LMConfig(
    dim=32, num_heads=4, num_layers=2, hidden_dim=64, context=16,
    card=32, n_q=4, dep_q=2, text_card=48,
    delays=(0, 0, 1, 1, 2),
    depformer_dim=16, depformer_heads=2, depformer_layers=2,
    depformer_hidden=32, depformer_low_rank=8,
)


@pytest.fixture(scope="module")
def lm():
    params = init_lm_params(jax.random.PRNGKey(0), _small)
    return params


def test_param_shapes(lm):
    assert lm["text_emb"]["weight"].shape == (49, 32)
    assert lm["emb"]["weight"].shape == (4, 33, 32)
    assert lm["text_linear"]["weight"].shape == (48, 32)
    dep = lm["depformer"]
    assert dep["in"]["weight"].shape == (2, 16, 32)
    assert dep["linears"]["weight"].shape == (2, 32, 16)
    assert dep["emb"]["weight"].shape == (1, 33, 8)
    # per-step per-layer attention weights [W, L, 3dd, dd] (steps-outer)
    assert dep["layers"]["self_attn"]["in_proj"]["weight"].shape == (2, 2, 48, 16)


def test_temporal_forward_shapes(lm):
    from moshi_tpu.nn.transformer import init_transformer_state
    kv = init_transformer_state(_small.transformer, 2)
    tokens = jnp.zeros((2, 1, 5), jnp.int32)
    h, logits, new_kv = temporal_forward(_small, lm, kv, tokens,
                                         jnp.zeros((2,), jnp.int32))
    assert h.shape == (2, 1, 32)
    assert logits.shape == (2, 1, 48)


def test_initial_tokens():
    state = init_gen_state(_small, 1)
    frame = np.asarray(build_input_frame(_small, state["cache"],
                                         state["offset"]))
    # at offset 0, every stream with delay >= 0 is initial
    assert frame[0, 0, 0] == _small.text_initial
    assert (frame[0, 0, 1:] == _small.audio_initial).all()


def test_delay_cache_write_read():
    cfg = _small
    state = init_gen_state(cfg, 1)
    cache = state["cache"]
    # generated frame at step 0 -> written at slot offset+1
    text = jnp.asarray([7], jnp.int32)
    audio = jnp.asarray([[11, 13]], jnp.int32)
    new_offset = jnp.asarray([1], jnp.int32)
    cache = write_generated(cfg, cache, new_offset, text, audio)
    # stream 2 has delay 1: its input at step 1 = slot 1 % CT
    frame = np.asarray(build_input_frame(cfg, cache, new_offset))
    assert frame[0, 0, 0] == 7      # text delay 0, offset 1 > 0 -> cached
    assert frame[0, 0, 1] == 11     # delay 0
    # delay-1 stream still initial at offset 1 (offset <= delay)
    assert frame[0, 0, 2] == cfg.audio_initial


def test_other_stream_write():
    cfg = _small  # dep_q 2 -> other streams are 3, 4 (delays 1, 2)
    state = init_gen_state(cfg, 1)
    other = jnp.asarray([[21, 22]], jnp.int32)
    cache = write_stream_tokens(cfg, state["cache"], state["offset"],
                                other, stream_start=3)
    c = np.asarray(cache)
    ct = cfg.cache_len
    assert c[0, (0 + 1) % ct, 3] == 21   # delay 1
    assert c[0, (0 + 2) % ct, 4] == 22   # delay 2


def test_read_output_undelay():
    cfg = _small
    state = init_gen_state(cfg, 1)
    cache = state["cache"]
    # simulate steps 0..3 generated, writing at slots 1..4
    for s in range(4):
        cache = write_generated(cfg, cache,
                                jnp.asarray([s + 1], jnp.int32),
                                jnp.asarray([100 + s], jnp.int32),
                                jnp.asarray([[200 + s, 300 + s]], jnp.int32))
    # after step s=2 (new_offset=3 > max_delay=2), output appears
    text, audio, valid = read_output(cfg, cache, jnp.asarray([3], jnp.int32))
    assert bool(valid[0])
    # text (delay 0): step offset-max_delay = 1 -> written at slot 1 -> 100
    assert int(text[0]) == 100
    # audio stream 1 (delay 0): slot 1 -> 200; stream 2 (delay 1): slot 2 -> 301
    assert int(audio[0, 0]) == 200
    assert int(audio[0, 1]) == 301


def test_depformer_generate_deterministic(lm):
    h = jnp.asarray(np.random.default_rng(0).normal(size=(1, 32)),
                    jnp.float32)
    text = jnp.asarray([5], jnp.int32)
    k = jax.random.PRNGKey(0)
    a1 = depformer_generate(_small, lm, h, text, k, temp=0.0, top_k=8)
    a2 = depformer_generate(_small, lm, h, text, k, temp=0.8, top_k=8)
    a3 = depformer_generate(_small, lm, h, text, k, temp=0.8, top_k=8)
    assert a1.shape == (1, 2)
    np.testing.assert_array_equal(np.asarray(a2), np.asarray(a3))
    assert (np.asarray(a1) >= 0).all() and (np.asarray(a1) < 32).all()


def test_fused_gen_loop(lm):
    cfg = _small
    state = init_gen_state(cfg, 2, jax.random.PRNGKey(42))
    step = jax.jit(lambda p, s, o: lm_gen_step(
        cfg, p, s, other_audio=o, temp=0.8, temp_text=0.7,
        top_k=8, top_k_text=8))
    rng = np.random.default_rng(0)
    valids = []
    for i in range(6):
        other = jnp.asarray(rng.integers(0, 32, size=(2, 2)), jnp.int32)
        out, state = step(lm, state, other)
        valids.append(np.asarray(out["valid"]))
        assert out["audio"].shape == (2, 2)
        assert out["text"].shape == (2,)
    # outputs become valid after max_delay steps
    assert not valids[0].any() and not valids[1].any()
    assert valids[3].all() and valids[5].all()
    aud = np.asarray(out["audio"])
    assert (aud >= 0).all() and (aud < 32).all()


def test_forced_text_and_audio(lm):
    cfg = _small
    state = init_gen_state(cfg, 1)
    forced_text = jnp.asarray([9], jnp.int32)
    forced_audio = jnp.asarray([[UNGENERATED, 17]], jnp.int32)
    out, state = lm_gen_step(cfg, lm, state, forced_text=forced_text,
                             forced_audio=forced_audio, temp=0.0,
                             temp_text=0.0)
    assert int(out["sampled_text"][0]) == 9
    c = np.asarray(state["cache"])
    assert c[0, 1, 0] == 9       # forced text written
    assert c[0, 1, 2] == 17      # forced audio stream 2


def test_depformer_replace(lm):
    cfg = _small
    state = init_gen_state(cfg, 1)
    out, state = lm_gen_step(cfg, lm, state, depformer_replace=True,
                             temp=0.0, temp_text=0.0)
    assert not bool(out["valid"][0])
    c = np.asarray(state["cache"])
    assert c[0, 1, 1] == ZERO and c[0, 1, 2] == ZERO


def test_delay_steps_suppression():
    cfg = LMConfig(
        dim=32, num_heads=4, num_layers=1, hidden_dim=64, context=16,
        card=32, n_q=2, dep_q=2, text_card=48, delays=(0, 0, 0),
        depformer_dim=16, depformer_heads=2, depformer_layers=1,
        depformer_hidden=32, depformer_low_rank=8, delay_steps=3)
    params = init_lm_params(jax.random.PRNGKey(1), cfg)
    state = init_gen_state(cfg, 1)
    for i in range(3):
        out, state = lm_gen_step(cfg, params, state, temp=0.0, temp_text=0.0)
        # audio suppressed to ZERO during the delay window -> never valid
        assert not bool(out["valid"][0])
    out, state = lm_gen_step(cfg, params, state, temp=0.0, temp_text=0.0)
    # step 3: offset 3 >= delays+delay_steps -> real tokens now cached
    c = np.asarray(state["cache"])
    assert (c[0, (4) % cfg.cache_len, 1:3] >= 0).all()


def test_lmconfig_from_moshi_config():
    cfg = parse_config({
        "dim": 4096, "num_layers": 32, "num_heads": 32, "n_q": 16,
        "dep_q": 8, "context": 3000, "card": 2048, "text_card": 32000,
        "delays": [0, 0, 1, 1, 1, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1, 1, 1],
        "depformer_dim": 1024, "depformer_num_layers": 6,
        "depformer_context": 8, "model_type": "moshi",
    })
    lc = LMConfig.from_moshi_config(cfg)
    assert lc.num_codebooks == 17
    assert lc.max_delay == 1
    assert lc.cache_len == 3
    assert lc.depformer.capacity == 8
    assert lc.schedule == tuple(range(8))
    assert lc.runtime_dep_q == 8


def test_text_audio_split_matches_fused(lm):
    # machine-style two-phase == fused when no machine replacement happens
    cfg = _small
    s1 = init_gen_state(cfg, 1, jax.random.PRNGKey(7))
    s2 = init_gen_state(cfg, 1, jax.random.PRNGKey(7))
    out_f, s1 = lm_gen_step(cfg, lm, s1, temp=0.0, temp_text=0.0)
    tok, h, s2b = lm_text_step(cfg, lm, s2, temp_text=0.0)
    out_s, s2c = lm_audio_step(cfg, lm, s2b, tok, h, temp=0.0)
    np.testing.assert_array_equal(np.asarray(out_f["sampled_text"]),
                                  np.asarray(out_s["sampled_text"]))
    np.testing.assert_array_equal(np.asarray(s1["cache"]),
                                  np.asarray(s2c["cache"]))


def test_fp8_kv_cache():
    cfg = LMConfig(
        dim=32, num_heads=4, num_layers=2, hidden_dim=64, context=16,
        card=32, n_q=2, dep_q=1, text_card=48, delays=(0, 0, 1),
        depformer_dim=16, depformer_heads=2, depformer_layers=1,
        depformer_hidden=32, depformer_low_rank=8,
        kv_dtype="float8_e4m3fn")
    params = init_lm_params(jax.random.PRNGKey(0), cfg)
    state = init_gen_state(cfg, 1)
    assert str(state["transformer"]["k"].dtype) == "float8_e4m3fn"
    for _ in range(4):
        out, state = lm_gen_step(cfg, params, state, temp=0.0, temp_text=0.0)
    assert (np.asarray(out["audio"]) >= -2).all()
    # fp8 state is half the bf16 KV footprint
    bf16_cfg = LMConfig(
        dim=32, num_heads=4, num_layers=2, hidden_dim=64, context=16,
        card=32, n_q=2, dep_q=1, text_card=48, delays=(0, 0, 1),
        depformer_dim=16, depformer_heads=2, depformer_layers=1,
        depformer_hidden=32, depformer_low_rank=8)
    s2 = init_gen_state(bf16_cfg, 1)
    assert (state["transformer"]["k"].nbytes * 2 ==
            s2["transformer"]["k"].nbytes)
