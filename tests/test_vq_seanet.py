import jax
import jax.numpy as jnp
import numpy as np

from moshi_tpu.nn.seanet import SEANetConfig, SEANetDecoder, SEANetEncoder
from moshi_tpu.nn.vq import (SplitRVQ, SplitRVQConfig, codebook_decode,
                             codebook_encode, rvq_decode, rvq_encode)


def test_codebook_encode_is_nearest(rng):
    emb = rng.normal(size=(16, 8)).astype(np.float32)
    x = rng.normal(size=(4, 8)).astype(np.float32)
    idx = np.asarray(codebook_encode(jnp.asarray(emb), jnp.asarray(x)))
    d = ((x[:, None] - emb[None]) ** 2).sum(-1)
    np.testing.assert_array_equal(idx, d.argmin(-1))


def test_codebook_roundtrip_on_centroids(rng):
    emb = rng.normal(size=(16, 8)).astype(np.float32)
    ids = jnp.asarray([3, 7, 15])
    x = codebook_decode(jnp.asarray(emb), ids)
    back = codebook_encode(jnp.asarray(emb), x)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(ids))


def test_rvq_reduces_residual(rng):
    embs = rng.normal(size=(4, 32, 8)).astype(np.float32)
    x = rng.normal(size=(1, 6, 8)).astype(np.float32)
    codes = rvq_encode(jnp.asarray(embs), jnp.asarray(x))
    assert codes.shape == (1, 6, 4)
    rec = np.asarray(rvq_decode(jnp.asarray(embs), codes))
    # more codebooks must not increase error
    rec1 = np.asarray(rvq_decode(jnp.asarray(embs[:1]), codes[..., :1]))
    e_all = ((rec - x) ** 2).mean()
    e_one = ((rec1 - x) ** 2).mean()
    assert e_all <= e_one


def test_split_rvq_shapes(rng):
    cfg = SplitRVQConfig(n_q=8, dim=64, codebook_dim=16, codebook_size=32)
    m = SplitRVQ(cfg)
    params = m.init_params(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.normal(size=(2, 3, 64)).astype(np.float32))
    codes = m.encode(params, x)
    assert codes.shape == (2, 3, 8)
    out = m.decode(params, codes)
    assert out.shape == (2, 3, 64)
    # decoding fewer acoustic books still works (n_q at runtime <= n_q)
    out4 = m.decode(params, codes[..., :4])
    assert out4.shape == (2, 3, 64)


_small = SEANetConfig(dimension=32, n_filters=4, ratios=(4, 3, 2, 2))


def test_seanet_encoder_shapes_and_streaming(rng):
    enc = SEANetEncoder(_small)
    params = enc.init_params(jax.random.PRNGKey(0))
    hop = _small.hop_length  # 48
    x = rng.normal(size=(1, hop * 4, 1)).astype(np.float32)
    y_full, _ = enc(params, enc.init_state(1), jnp.asarray(x))
    assert y_full.shape == (1, 4, 32)
    state = enc.init_state(1)
    outs = []
    for i in range(0, hop * 4, hop):
        y, state = enc(params, state, jnp.asarray(x[:, i:i + hop]))
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs, axis=1),
                               np.asarray(y_full), rtol=1e-3, atol=1e-3)


def test_seanet_decoder_shapes_and_streaming(rng):
    dec = SEANetDecoder(_small)
    params = dec.init_params(jax.random.PRNGKey(1))
    hop = _small.hop_length
    x = rng.normal(size=(1, 4, 32)).astype(np.float32)
    y_full, _ = dec(params, dec.init_state(1), jnp.asarray(x))
    assert y_full.shape == (1, 4 * hop, 1)
    state = dec.init_state(1)
    outs = []
    for i in range(4):
        y, state = dec(params, state, jnp.asarray(x[:, i:i + 1]))
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs, axis=1),
                               np.asarray(y_full), rtol=1e-3, atol=1e-3)


def test_seanet_mimi_topology():
    # full-size layout must mirror lm_default.h:327-563 module indices
    enc = SEANetEncoder(SEANetConfig())
    names = set(enc.modules.keys())
    assert "model.0" in names and "model.14" in names
    assert "model.3" in names and enc.modules["model.3"].stride == 4
    assert enc.modules["model.12"].stride == 8
    assert enc.modules["model.12"].in_ch == 512
    assert enc.modules["model.14"].out_ch == 512
    dec = SEANetDecoder(SEANetConfig())
    assert dec.modules["model.2"].stride == 8
    assert dec.modules["model.2"].in_ch == 1024
    assert dec.modules["model.11"].stride == 4
    assert dec.modules["model.14"].out_ch == 1
    assert SEANetConfig().hop_length == 960  # 24 kHz -> 25 Hz
