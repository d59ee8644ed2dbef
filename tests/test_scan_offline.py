"""Offline scan pipelines (runtime/pipeline.scan_frames): the
three-phase batched design (mimi-encode-all -> LM scan -> mimi-
decode-all) must reproduce the per-frame streaming loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moshi_tpu.models.lm import LMConfig, init_lm_params
from moshi_tpu.models.mimi import MimiConfig, MimiModel
from moshi_tpu.nn.seanet import SEANetConfig
from moshi_tpu.runtime.pipeline import STSPipeline, STTPipeline

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


@pytest.fixture(scope="module")
def models():
    mimi = MimiModel(_mimi_cfg)
    mimi_params = mimi.init_params(jax.random.PRNGKey(0), jnp.float32)
    lm_params = init_lm_params(jax.random.PRNGKey(1), _lm_cfg)
    return mimi, mimi_params, lm_params


def test_sts_scan_matches_step_loop(models, rng):
    mimi, mimi_params, lm_params = models
    pipe = STSPipeline(mimi, _lm_cfg, temp=0.0, temp_text=0.0,
                       mimi_dtype=jnp.float32)
    n = 12   # spans a chunk boundary (4+4+4 at default chunks) and
    #          stays inside the tiny mimi ring chunk (ctx 8 -> mc 4)
    frames = jnp.asarray(
        rng.normal(size=(n, 1, pipe.frame_samples)).astype(np.float32)
        * 0.1)
    # per-frame loop
    state = pipe.init_state(1, jax.random.PRNGKey(0))
    ref_t, ref_k, ref_a = [], [], []
    for f in range(n):
        out, state = pipe.step(mimi_params, lm_params, state, frames[f])
        ref_t.append(np.asarray(out["text"]))
        ref_k.append(np.asarray(out["audio_tokens"]))
        ref_a.append(np.asarray(out["audio_out"]))
    # batched offline scan
    state = pipe.init_state(1, jax.random.PRNGKey(0))
    texts, toks, audio, state = pipe.scan_frames(mimi_params, lm_params,
                                                 state, frames)
    np.testing.assert_array_equal(np.asarray(texts), np.stack(ref_t))
    np.testing.assert_array_equal(np.asarray(toks), np.stack(ref_k))
    # audio is close, not bit-equal: the offline rings (capacity =
    # context + chunk) keep the oldest in-window keys that per-frame
    # streaming's capacity==context ring evicts during its 2-position
    # inserts — the offline pass is the MORE exact window
    np.testing.assert_allclose(np.asarray(audio), np.stack(ref_a),
                               atol=5e-2)
    # state carries forward: another scan continues the stream
    more = jnp.asarray(
        rng.normal(size=(4, 1, pipe.frame_samples)).astype(np.float32)
        * 0.1)
    t2, _, _, _ = pipe.scan_frames(mimi_params, lm_params, state, more)
    assert np.asarray(t2).shape == (4, 1)


def test_stt_scan_matches_step_loop(models, rng):
    mimi, mimi_params, lm_params = models
    cfg = LMConfig(
        dim=32, num_heads=4, num_layers=2, hidden_dim=64, context=32,
        card=32, n_q=4, dep_q=0, text_card=48, delays=(0, 0, 0, 0, 0),
        depformer_dim=16, depformer_heads=2, depformer_layers=1,
        depformer_hidden=32, depformer_low_rank=8)
    lm_p = init_lm_params(jax.random.PRNGKey(2), cfg)
    pipe = STTPipeline(mimi, cfg, temp_text=0.0, mimi_dtype=jnp.float32)
    n = 10
    frames = jnp.asarray(
        rng.normal(size=(n, 1, pipe.frame_samples)).astype(np.float32)
        * 0.1)
    state = pipe.init_state(1, jax.random.PRNGKey(0))
    ref_t = []
    for f in range(n):
        out, state = pipe.step(mimi_params, lm_p, state, frames[f])
        ref_t.append(np.asarray(out["text"]))
    state = pipe.init_state(1, jax.random.PRNGKey(0))
    texts, vads, state = pipe.scan_frames(mimi_params, lm_p, state,
                                          frames)
    np.testing.assert_array_equal(np.asarray(texts), np.stack(ref_t))
    assert np.asarray(vads).shape == (n, 1)
