import jax
import jax.numpy as jnp
import numpy as np

from moshi_tpu.models.lm import (LMConfig, UNGENERATED, ZERO, init_gen_state,
                                 init_lm_params)
from moshi_tpu.models.personaplex import (PROMPT_TOKENS,
                                          prime_system_prompts,
                                          prime_with_voice_embeddings)
from moshi_tpu.models.tts import (make_voice_prefix, sin_embedding,
                                  voice_condition)

_cfg = LMConfig(
    dim=32, num_heads=4, num_layers=2, hidden_dim=64, context=32,
    card=2100, n_q=16, dep_q=8, text_card=48,
    delays=(0, 0) + (1,) * 7 + (0,) + (1,) * 7,
    depformer_dim=16, depformer_heads=2, depformer_layers=1,
    depformer_hidden=32, depformer_low_rank=8, personaplex=True)


def test_sin_embedding_layout():
    emb = np.asarray(sin_embedding(jnp.arange(3), 8))
    # position 0: cos(0)=1 first half, sin(0)=0 second half
    np.testing.assert_allclose(emb[0, :4], 1.0, atol=1e-6)
    np.testing.assert_allclose(emb[0, 4:], 0.0, atol=1e-6)


def test_voice_condition_shapes(rng):
    dim, dw, s = 32, 16, 4
    cond = {
        "cfg": {"embed": jnp.asarray(rng.normal(size=(7, 24)).astype(np.float32)),
                "learnt_padding": jnp.zeros((1, dim)),
                "output_proj": {"weight": jnp.asarray(
                    rng.normal(size=(dim, 24)).astype(np.float32))}},
        "control": {"embed": jnp.asarray(rng.normal(size=(1, 24)).astype(np.float32)),
                    "learnt_padding": jnp.zeros((1, dim)),
                    "output_proj": {"weight": jnp.asarray(
                        rng.normal(size=(dim, 24)).astype(np.float32))}},
        "speaker_wavs": {"learnt_padding": jnp.asarray(
            rng.normal(size=(1, dim)).astype(np.float32)),
            "output_proj": {"weight": jnp.asarray(
                rng.normal(size=(dim, dw)).astype(np.float32))}},
    }
    wavs = jnp.asarray(rng.normal(size=(s, dw)).astype(np.float32))
    csum, cross = voice_condition(cond, wavs)
    assert csum.shape == (1, dim)
    assert cross.shape == (1, 5 * s, dim)
    # slots beyond the first S are learnt padding (+pos emb)
    pad_row = np.asarray(cond["speaker_wavs"]["learnt_padding"])[0]
    pos = np.asarray(sin_embedding(jnp.arange(5 * s), dim))
    np.testing.assert_allclose(np.asarray(cross)[0, s], pad_row + pos[s],
                               rtol=1e-5)


def test_make_voice_prefix():
    lm_cfg = _cfg
    def fake_encode(audio):
        n = audio.shape[1] // 1920
        return np.tile(np.arange(lm_cfg.n_q), (1, n, 1)) + 100
    audio = np.zeros(1920 * 3, np.float32)
    text_p, audio_p = make_voice_prefix(fake_encode, audio, lm_cfg,
                                        delay_steps=2)
    assert text_p == [ZERO] * 3
    lead = lm_cfg.max_delay + 2
    assert len(audio_p) == lead + 3
    assert all(t == UNGENERATED for t in audio_p[0])
    # semantic code moved 2 frames earlier; current frame's [0] cleared
    assert audio_p[lead][0] != UNGENERATED or audio_p[lead - 2][0] == 100
    assert audio_p[-1][0] == UNGENERATED


def test_personaplex_priming_runs():
    params = init_lm_params(jax.random.PRNGKey(0), _cfg)
    state = init_gen_state(_cfg, 1)
    assert _cfg.runtime_dep_q == 8     # dep_q forced to 8 of 16
    assert _cfg.cache_len == 1 + 2 + 1  # max_delay+2 (+1 personaplex)
    emb = np.random.default_rng(0).normal(size=(2, 32)).astype(np.float32)
    cache = np.zeros((_cfg.cache_len, _cfg.num_codebooks), np.int32) + 5
    state = prime_system_prompts(
        _cfg, params, state, text_prompt_tokens=[7, 8],
        voice_embeddings=emb, voice_cache=cache, silence_frames=2,
        temp=0.0, temp_text=0.0, top_k=8, top_k_text=8)
    # offset advanced: 2 (voice) + 2 + 2 (text) + 2 silence = 8
    assert int(np.asarray(state["offset"])[0]) == 8
    # delay cache was seeded from the voice file then overwritten by
    # the forced PROMPT_TOKENS frames at the written slots
    c = np.asarray(state["cache"])
    assert c.shape == (1, _cfg.cache_len, 17)


def test_prompt_tokens_template():
    assert len(PROMPT_TOKENS) == 17
    assert PROMPT_TOKENS[0] == 3
