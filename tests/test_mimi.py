import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moshi_tpu import FRAME_SIZE
from moshi_tpu.models.mimi import MimiConfig, MimiModel
from moshi_tpu.nn.seanet import SEANetConfig

# a scaled-down mimi (hop 48 instead of 960) for fast CPU tests
_small = MimiConfig(
    n_q=4, total_codebooks=8, dim=32,
    seanet=SEANetConfig(dimension=32, n_filters=4, ratios=(4, 3, 2, 2)),
    codebook_dim=16, codebook_size=64,
    transformer_layers=2, transformer_heads=4, transformer_context=16,
    transformer_hidden=64,
)
_SMALL_FRAME = _small.seanet.hop_length * 2  # 96 samples / 12.5Hz-frame


@pytest.fixture(scope="module")
def mimi():
    m = MimiModel(_small)
    params = m.init_params(jax.random.PRNGKey(0))
    return m, params


def test_encode_decode_shapes(mimi, rng):
    m, params = mimi
    audio = jnp.asarray(rng.normal(size=(2, _SMALL_FRAME * 3)).astype(np.float32) * 0.1)
    codes, _ = m.encode_step(params, m.init_encode_state(2), audio)
    assert codes.shape == (2, 3, 4)
    assert (np.asarray(codes) >= 0).all() and (np.asarray(codes) < 64).all()
    out, _ = m.decode_step(params, m.init_decode_state(2), codes)
    assert out.shape == (2, _SMALL_FRAME * 3)


def test_streaming_equals_offline_encode(mimi, rng):
    m, params = mimi
    audio = rng.normal(size=(1, _SMALL_FRAME * 4)).astype(np.float32) * 0.1
    codes_full, _ = m.encode_step(params, m.init_encode_state(1),
                                  jnp.asarray(audio))
    state = m.init_encode_state(1)
    outs = []
    for i in range(0, audio.shape[1], _SMALL_FRAME):
        c, state = m.encode_step(params, state,
                                 jnp.asarray(audio[:, i:i + _SMALL_FRAME]))
        outs.append(np.asarray(c))
    np.testing.assert_array_equal(np.concatenate(outs, axis=1),
                                  np.asarray(codes_full))


def test_streaming_equals_offline_decode(mimi, rng):
    m, params = mimi
    codes = rng.integers(0, 64, size=(1, 4, 4)).astype(np.int32)
    audio_full, _ = m.decode_step(params, m.init_decode_state(1),
                                  jnp.asarray(codes))
    state = m.init_decode_state(1)
    outs = []
    for i in range(4):
        a, state = m.decode_step(params, state, jnp.asarray(codes[:, i:i + 1]))
        outs.append(np.asarray(a))
    np.testing.assert_allclose(np.concatenate(outs, axis=1),
                               np.asarray(audio_full), rtol=1e-3, atol=1e-4)


def test_jit_step_round(mimi, rng):
    m, params = mimi
    enc = jax.jit(lambda p, s, a: m.encode_step(p, s, a))
    dec = jax.jit(lambda p, s, c: m.decode_step(p, s, c))
    state_e = m.init_encode_state(1)
    state_d = m.init_decode_state(1)
    audio = jnp.asarray(rng.normal(size=(1, _SMALL_FRAME)).astype(np.float32) * 0.1)
    for _ in range(3):
        codes, state_e = enc(params, state_e, audio)
        out, state_d = dec(params, state_d, codes)
    assert out.shape == (1, _SMALL_FRAME)


def test_full_size_shape_config():
    cfg = MimiConfig()
    assert cfg.seanet.hop_length * cfg.frames_per_step == FRAME_SIZE
