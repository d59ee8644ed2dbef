import jax
import jax.numpy as jnp
import numpy as np

from moshi_tpu.nn.attention import (MHAConfig, init_kv_state, init_mha_params,
                                    ring_key_positions, streaming_attn_bias,
                                    streaming_mha, cross_attention_kv, cross_mha)


def np_rope(x, positions, max_period):
    t, h, d = x.shape
    half = d // 2
    freqs = np.exp(-np.log(max_period) * np.arange(half) / half)
    theta = positions[:, None] * freqs  # [T, half]
    cos, sin = np.cos(theta), np.sin(theta)
    xr = x.reshape(t, h, half, 2)
    out = np.empty_like(xr)
    out[..., 0] = xr[..., 0] * cos[:, None] - xr[..., 1] * sin[:, None]
    out[..., 1] = xr[..., 0] * sin[:, None] + xr[..., 1] * cos[:, None]
    return out.reshape(t, h, d)


def np_windowed_attention(x, win, wout, h, context, max_period):
    """Oracle: full-sequence causal windowed MHA, x [T, D]."""
    t, d = x.shape
    hd = d // h
    qkv = x @ win.T
    q, k, v = np.split(qkv, 3, axis=-1)
    q = q.reshape(t, h, hd)
    k = k.reshape(t, h, hd)
    v = v.reshape(t, h, hd)
    pos = np.arange(t, dtype=np.float64)
    q = np_rope(q, pos, max_period)
    k = np_rope(k, pos, max_period)
    out = np.zeros((t, h, hd))
    for i in range(t):
        lo = max(0, i - context + 1)
        ks = k[lo:i + 1]
        scores = np.einsum("hd,shd->hs", q[i], ks) / np.sqrt(hd)
        p = np.exp(scores - scores.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        out[i] = np.einsum("hs,shd->hd", p, v[lo:i + 1])
    return out.reshape(t, d) @ wout.T


def test_ring_key_positions():
    last = jnp.asarray([5])
    p = np.asarray(ring_key_positions(last, 4))[0]
    # slots 0..3 hold positions p % 4 == slot, p <= 5, nearest
    np.testing.assert_array_equal(p, [4, 5, 2, 3])
    # early stream: only slots <= last written
    p0 = np.asarray(ring_key_positions(jnp.asarray([0]), 4))[0]
    assert p0[0] == 0 and (p0[1:] < 0).all()


def test_bias_window():
    bias = np.asarray(streaming_attn_bias(jnp.asarray([10]), 1, cap=8, context=4))
    # query position 10 attends to 7,8,9,10
    p = np.asarray(ring_key_positions(jnp.asarray([10]), 8))[0]
    valid = (bias[0, 0] == 0)
    expect = (p >= 7) & (p <= 10)
    np.testing.assert_array_equal(valid, expect)
    assert valid.sum() == 4


def _run_streaming(cfg, params, x, chunk):
    b, t, d = x.shape
    state = init_kv_state(cfg, b)
    outs = []
    for i in range(0, t, chunk):
        y, state = streaming_mha(cfg, params, state,
                                 jnp.asarray(x[:, i:i + chunk]),
                                 jnp.asarray([i] * b, jnp.int32))
        outs.append(np.asarray(y, np.float32))
    return np.concatenate(outs, axis=1)


def test_streaming_mha_matches_oracle(rng):
    cfg = MHAConfig(dim=32, num_heads=4, context=16, capacity=16,
                    kv_dtype=jnp.float32)
    params = init_mha_params(jax.random.PRNGKey(0), cfg)
    x = rng.normal(size=(1, 12, 32)).astype(np.float32)
    got = _run_streaming(cfg, params, x, chunk=1)
    ref = np_windowed_attention(x[0], np.asarray(params["in_proj"]["weight"]),
                                np.asarray(params["out_proj"]["weight"]),
                                4, 16, 10_000.0)
    np.testing.assert_allclose(got[0], ref, rtol=2e-2, atol=2e-2)


def test_streaming_mha_ring_wraparound(rng):
    # stream length 24 >> capacity 8: ring must wrap and window must hold
    cfg = MHAConfig(dim=16, num_heads=2, context=8, capacity=8,
                    kv_dtype=jnp.float32)
    params = init_mha_params(jax.random.PRNGKey(1), cfg)
    x = rng.normal(size=(1, 24, 16)).astype(np.float32)
    got = _run_streaming(cfg, params, x, chunk=1)
    ref = np_windowed_attention(x[0], np.asarray(params["in_proj"]["weight"]),
                                np.asarray(params["out_proj"]["weight"]),
                                2, 8, 10_000.0)
    np.testing.assert_allclose(got[0], ref, rtol=2e-2, atol=2e-2)


def test_streaming_mha_chunked_equals_tokenwise(rng):
    cfg = MHAConfig(dim=16, num_heads=2, context=32, capacity=32,
                    kv_dtype=jnp.float32)
    params = init_mha_params(jax.random.PRNGKey(2), cfg)
    x = rng.normal(size=(2, 8, 16)).astype(np.float32)
    a = _run_streaming(cfg, params, x, chunk=1)
    b = _run_streaming(cfg, params, x, chunk=4)
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2)


def test_per_session_offsets(rng):
    # two sessions at different stream positions share one call
    cfg = MHAConfig(dim=16, num_heads=2, context=8, capacity=8,
                    kv_dtype=jnp.float32)
    params = init_mha_params(jax.random.PRNGKey(3), cfg)
    x = rng.normal(size=(2, 10, 16)).astype(np.float32)
    # session 0 as usual; session 1 starts 3 frames later (shifted input)
    state = init_kv_state(cfg, 2)
    outs = []
    for i in range(10):
        off = jnp.asarray([i, max(i - 3, 0)], jnp.int32)
        xi = np.stack([x[0, i], x[1, max(i - 3, 0)]])[:, None]
        y, state = streaming_mha(cfg, params, state, jnp.asarray(xi), off)
        outs.append(np.asarray(y, np.float32))
    got = np.concatenate(outs, axis=1)
    ref0 = np_windowed_attention(x[0], np.asarray(params["in_proj"]["weight"]),
                                 np.asarray(params["out_proj"]["weight"]),
                                 2, 8, 10_000.0)
    np.testing.assert_allclose(got[0], ref0, rtol=2e-2, atol=2e-2)


def test_cross_attention(rng):
    cfg = MHAConfig(dim=16, num_heads=2, context=8, kv_dtype=jnp.float32)
    params = init_mha_params(jax.random.PRNGKey(4), cfg)
    cond = rng.normal(size=(1, 5, 16)).astype(np.float32)
    kv = cross_attention_kv(cfg, params, jnp.asarray(cond))
    assert kv["k"].shape == (1, 5, 2, 8)
    x = rng.normal(size=(1, 3, 16)).astype(np.float32)
    y = cross_mha(cfg, params, jnp.asarray(x), kv)
    assert y.shape == (1, 3, 16)
    # oracle
    win = np.asarray(params["in_proj"]["weight"])
    wout = np.asarray(params["out_proj"]["weight"])
    q = (x[0] @ win[:16].T).reshape(3, 2, 8)
    k = (cond[0] @ win[16:32].T).reshape(5, 2, 8)
    v = (cond[0] @ win[32:].T).reshape(5, 2, 8)
    scores = np.einsum("thd,shd->hts", q, k) / np.sqrt(8)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    out = np.einsum("hts,shd->thd", p, v).reshape(3, 16) @ wout.T
    np.testing.assert_allclose(np.asarray(y)[0], out, rtol=2e-2, atol=2e-2)


def test_bias_pattern_lut_matches_computed():
    from moshi_tpu.nn.attention import (build_bias_pattern,
                                        bias_pattern_lookup)
    cap, context = 8, 5
    pattern = build_bias_pattern(cap, context, t=1)
    assert pattern.shape == (16, 1, 8)
    for off in [0, 1, 3, 7, 8, 9, 15, 16, 23, 100]:
        offs = jnp.asarray([off], jnp.int32)
        lut = np.asarray(bias_pattern_lookup(pattern, offs, cap))
        ref = np.asarray(streaming_attn_bias(offs, 1, cap, context))
        np.testing.assert_array_equal(lut, ref), off
