import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moshi_tpu.models.lm import LMConfig, init_lm_params
from moshi_tpu.models.mimi import MimiConfig, MimiModel
from moshi_tpu.nn.seanet import SEANetConfig
from moshi_tpu.runtime.pipeline import STSPipeline
from moshi_tpu.runtime.serving import SessionPool

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
def pool():
    mimi = MimiModel(_mimi_cfg)
    mimi_params = mimi.init_params(jax.random.PRNGKey(0), jnp.float32)
    lm_params = init_lm_params(jax.random.PRNGKey(1), _lm_cfg)
    pipe = STSPipeline(mimi, _lm_cfg, temp=0.8, temp_text=0.7,
                       top_k=8, top_k_text=8, mimi_dtype=jnp.float32)
    return SessionPool(pipe, mimi_params, lm_params, batch=4)


def test_attach_tick_detach(pool, rng):
    fs = pool.pipe.frame_samples
    a = pool.attach("alice")
    b = pool.attach("bob")
    assert pool.active == 2 and a != b
    for i in range(5):
        outs = pool.tick({
            "alice": rng.normal(size=fs).astype(np.float32) * 0.1,
            "bob": rng.normal(size=fs).astype(np.float32) * 0.1,
        })
    assert set(outs) == {"alice", "bob"}
    assert outs["alice"]["valid"] and outs["bob"]["valid"]
    assert outs["alice"]["audio_out"].shape == (fs,)
    pool.detach("alice")
    assert pool.active == 1


def test_slot_reuse_resets_state(pool, rng):
    fs = pool.pipe.frame_samples
    # bob is 5+ frames old (valid); a fresh session must restart from
    # offset 0 (invalid during the delay lead-in)
    pool.attach("carol")
    outs = pool.tick({
        "bob": rng.normal(size=fs).astype(np.float32) * 0.1,
        "carol": rng.normal(size=fs).astype(np.float32) * 0.1,
    })
    assert outs["bob"]["valid"]          # old session unaffected
    assert not outs["carol"]["valid"]    # fresh session in lead-in
    # offsets really are per-slot
    off = np.asarray(pool.state["lm"]["offset"])
    i_bob = pool._by_session["bob"]
    i_carol = pool._by_session["carol"]
    assert off[i_bob] > off[i_carol] == 1


def test_pool_full(pool):
    while pool.active < pool.batch:
        pool.attach(f"s{pool.active}")
    with pytest.raises(RuntimeError):
        pool.attach("overflow")


def test_memory_sizing():
    from moshi_tpu.runtime.memory import (hbm_bytes, kv_bytes_per_session,
                                          suggest_context, suggest_sessions)
    from moshi_tpu.models.lm import LMConfig
    cfg = LMConfig()  # 7B: 32L x 3000 x 32h x 128d x2 (k+v) bf16
    per = kv_bytes_per_session(cfg)
    assert per == 32 * 3000 * 32 * 128 * 2 * 2
    # q4_k 7B weights ~4.3 GB; 16 GB chip
    w = int(4.3e9)
    n = suggest_sessions(cfg, w)
    assert n >= 5
    cfg8 = LMConfig(kv_dtype="float8_e4m3fn")
    assert suggest_sessions(cfg8, w) >= 2 * n - 2
    ctx = suggest_context(cfg, w, sessions=16)
    assert 0 < ctx <= cfg.context
