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
    # q4_k 7B weights ~4.3 GB; 16 GB chip; KV_TRANSIENT=1.8 calibrated
    # against the measured B=4 OOM (memory.py)
    w = int(4.3e9)
    n = suggest_sessions(cfg, w)
    assert n >= 3
    cfg8 = LMConfig(kv_dtype="float8_e4m3fn")
    assert suggest_sessions(cfg8, w) >= 2 * n - 2
    ctx = suggest_context(cfg, w, sessions=16)
    assert 0 < ctx <= cfg.context


def test_auto_shrink_context():
    """auto_shrink_context: identity when everything fits; shrinks (and
    reports) when sessions x KV would overflow — the reference's
    VRAM-aware context shrink (moshi-sts.cpp:254-264)."""
    from moshi_tpu.runtime.memory import auto_shrink_context
    from moshi_tpu.models.lm import LMConfig
    cfg = LMConfig()                      # 7B, ctx 3000
    w = int(5.14e9)
    c1, shrunk, ctx = auto_shrink_context(cfg, w, sessions=1)
    assert not shrunk and c1.context == cfg.context
    c2, shrunk2, _ = auto_shrink_context(cfg, w, sessions=2)
    assert not shrunk2 and c2.context == cfg.context   # B=2 runs at 3000
    c4, shrunk4, ctx4 = auto_shrink_context(cfg, w, sessions=4)
    assert shrunk4 and 8 <= c4.context < cfg.context
    assert ctx4 == c4.context and ctx4 % 8 == 0
    # the shrunk config's KV (live + XLA double-buffer) + weights fit
    from moshi_tpu.runtime.memory import (KV_TRANSIENT, hbm_bytes,
                                          kv_bytes_per_session)
    total = w + 4 * kv_bytes_per_session(c4) * KV_TRANSIENT
    assert total <= hbm_bytes() * 0.95


def test_tts_pool_matches_single_session():
    """TTSSessionPool: two scripts attached at different ticks must each
    produce the token stream of a B=1 device-FSM run of the same script
    (greedy), and auto-detach when their audio tail drains."""
    from moshi_tpu.models.device_machine import (compile_script,
                                                 init_device_state)
    from moshi_tpu.models.state_machine import Entry, StateMachine
    from moshi_tpu.runtime.pipeline import TTSPipeline
    from moshi_tpu.runtime.serving import TTSSessionPool

    mimi = MimiModel(_mimi_cfg)
    mimi_params = mimi.init_params(jax.random.PRNGKey(0), jnp.float32)
    lm_params = init_lm_params(jax.random.PRNGKey(1), _lm_cfg)
    machine = StateMachine(text_card=_lm_cfg.text_card + 1,
                           max_padding=4, initial_padding=1)
    scripts = {
        "a": [Entry([10, 11], "hi", 1), Entry([12], "yo", 0)],
        "b": [Entry([13], "x", 0), Entry([], "<break>", 2),
              Entry([14, 15, 16], "zzz", 1)],
    }

    def single_run(entries, n_steps):
        pipe = TTSPipeline(mimi, _lm_cfg, temp=0.0, temp_text=0.0,
                           mimi_dtype=jnp.float32)
        dm = pipe.enable_device_fsm(machine)
        script = compile_script([entries], dm)
        state = pipe.init_state(1, jax.random.PRNGKey(0))
        mdev = init_device_state(dm, script)
        toks = []
        for _ in range(n_steps):
            out, state, mdev = pipe.step_device(mimi_params, lm_params,
                                                state, mdev, script)
            toks.append(np.asarray(out["audio_tokens"])[0])
        return np.stack(toks)

    pipe = TTSPipeline(mimi, _lm_cfg, temp=0.0, temp_text=0.0,
                       mimi_dtype=jnp.float32)
    pool = TTSSessionPool(pipe, machine, mimi_params, lm_params,
                          batch=3, max_tokens=32, max_entries=8)
    got = {"a": [], "b": []}
    done_at = {}
    pool.attach("a", scripts["a"])
    for t in range(40):
        if t == 3:
            pool.attach("b", scripts["b"])
        outs = pool.tick()
        for sid, r in outs.items():
            got[sid].append(r)
            if r["done"]:
                done_at[sid] = t
        if not pool.active and t > 3:
            break
    assert set(done_at) == {"a", "b"}
    assert pool.active == 0
    # tokens of each pooled session == its B=1 run
    # (pool doesn't expose audio_tokens; equivalence is via valid+audio)
    for sid in ("a", "b"):
        n = len(got[sid])
        single = single_run(scripts[sid], n)
        assert single.shape[0] == n
    # valid frames' audio must match the B=1 run's audio bit-for-bit
    for sid in ("a", "b"):
        pipe1 = TTSPipeline(mimi, _lm_cfg, temp=0.0, temp_text=0.0,
                            mimi_dtype=jnp.float32)
        dm = pipe1.enable_device_fsm(machine)
        script = compile_script([scripts[sid]], dm)
        state = pipe1.init_state(1, jax.random.PRNGKey(0))
        mdev = init_device_state(dm, script)
        for r in got[sid]:
            out, state, mdev = pipe1.step_device(mimi_params, lm_params,
                                                 state, mdev, script)
            assert bool(np.asarray(out["valid"])[0]) == r["valid"]
            if r["valid"]:
                np.testing.assert_allclose(
                    np.asarray(out["audio_out"])[0], r["audio_out"],
                    atol=1e-5)


def test_tts_pool_chunked_ticks_match_per_frame():
    """VERDICT r4 item 2: tick_chunk(n) (one lax.scan launch per n
    frames) must produce the same per-session audio/valid stream and
    the same completion frame as the per-frame-synced tick(), and
    attach_many must equal sequential attaches."""
    from moshi_tpu.models.state_machine import Entry, StateMachine
    from moshi_tpu.runtime.pipeline import TTSPipeline
    from moshi_tpu.runtime.serving import TTSSessionPool

    mimi = MimiModel(_mimi_cfg)
    mimi_params = mimi.init_params(jax.random.PRNGKey(0), jnp.float32)
    lm_params = init_lm_params(jax.random.PRNGKey(1), _lm_cfg)
    machine = StateMachine(text_card=_lm_cfg.text_card + 1,
                           max_padding=4, initial_padding=1)
    scripts = {
        "a": [Entry([10, 11], "hi", 1), Entry([12], "yo", 0)],
        "b": [Entry([13], "x", 0), Entry([14, 15], "zz", 1)],
    }

    def run(chunk):
        pipe = TTSPipeline(mimi, _lm_cfg, temp=0.0, temp_text=0.0,
                           mimi_dtype=jnp.float32)
        pool = TTSSessionPool(pipe, machine, mimi_params, lm_params,
                              batch=3, max_tokens=32, max_entries=8)
        if chunk > 1:
            pool.attach_many(scripts)
        else:
            pool.attach("a", scripts["a"])
            pool.attach("b", scripts["b"])
        got = {"a": {"audio": [], "valid": []},
               "b": {"audio": [], "valid": []}}
        frames_done = {}
        for t in range(30):
            if not pool.active:
                break
            if chunk > 1:
                outs = pool.tick_chunk(chunk)
                for sid, r in outs.items():
                    got[sid]["audio"].extend(list(r["audio_out"]))
                    got[sid]["valid"].extend(list(r["valid"]))
                    if r["done"]:
                        frames_done[sid] = len(got[sid]["valid"])
            else:
                outs = pool.tick()
                for sid, r in outs.items():
                    got[sid]["audio"].append(r["audio_out"])
                    got[sid]["valid"].append(r["valid"])
                    if r["done"]:
                        frames_done[sid] = len(got[sid]["valid"])
        return got, frames_done

    ref, ref_done = run(1)
    chk, chk_done = run(4)
    assert set(ref_done) == set(chk_done) == {"a", "b"}
    for sid in ("a", "b"):
        # chunk mode trims the free-running tail at `total`, which is
        # exactly where per-frame mode stops: identical frame counts
        assert chk_done[sid] == ref_done[sid], sid
        np.testing.assert_array_equal(
            np.asarray(chk[sid]["valid"], bool),
            np.asarray(ref[sid]["valid"], bool), err_msg=sid)
        np.testing.assert_allclose(
            np.stack(chk[sid]["audio"]), np.stack(ref[sid]["audio"]),
            atol=1e-5, err_msg=sid)


def test_sts_pool_masked_reset_multi():
    """attach after detach with the masked reset resets exactly the
    reattached slots (offsets back to lead-in) and leaves live ones."""
    mimi = MimiModel(_mimi_cfg)
    mimi_params = mimi.init_params(jax.random.PRNGKey(0), jnp.float32)
    lm_params = init_lm_params(jax.random.PRNGKey(1), _lm_cfg)
    pipe = STSPipeline(mimi, _lm_cfg, temp=0.8, temp_text=0.7,
                       top_k=8, top_k_text=8, mimi_dtype=jnp.float32)
    p = SessionPool(pipe, mimi_params, lm_params, batch=4)
    fs = pipe.frame_samples
    rng = np.random.default_rng(0)
    p.attach("x")
    p.attach("y")
    for _ in range(3):
        p.tick({"x": rng.normal(size=fs).astype(np.float32) * 0.1,
                "y": rng.normal(size=fs).astype(np.float32) * 0.1})
    p.detach("y")
    p.attach("z")
    off = np.asarray(p.state["lm"]["offset"])
    assert off[p._by_session["x"]] == 3
    assert off[p._by_session["z"]] == 0


def test_tts_pool_capacity_guard():
    from moshi_tpu.models.state_machine import Entry, StateMachine
    from moshi_tpu.runtime.pipeline import TTSPipeline
    from moshi_tpu.runtime.serving import TTSSessionPool
    mimi = MimiModel(_mimi_cfg)
    mimi_params = mimi.init_params(jax.random.PRNGKey(0), jnp.float32)
    lm_params = init_lm_params(jax.random.PRNGKey(1), _lm_cfg)
    machine = StateMachine(text_card=_lm_cfg.text_card + 1)
    pipe = TTSPipeline(mimi, _lm_cfg, temp=0.0, temp_text=0.0,
                       mimi_dtype=jnp.float32)
    pool = TTSSessionPool(pipe, machine, mimi_params, lm_params,
                          batch=2, max_tokens=4, max_entries=2)
    with pytest.raises(ValueError):
        pool.attach("big", [Entry([1, 2, 3], "w", 0)] * 3)
