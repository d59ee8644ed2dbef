import jax.numpy as jnp
import numpy as np
import jax

from moshi_tpu.nn.conv import (StatelessConv1d, StreamingConv1d,
                               StreamingConvTranspose1d,
                               torch_convtr_weight_to_oiw)


def np_causal_conv(x, w, b, stride=1, dilation=1):
    """Oracle: causal conv, x [T, Cin], w [O, Cin, K] -> [T//stride, O]."""
    o, cin, k = w.shape
    keff = dilation * (k - 1) + 1
    pad = keff - stride
    xp = np.concatenate([np.zeros((pad, cin), x.dtype), x], axis=0)
    t_out = x.shape[0] // stride
    y = np.zeros((t_out, o), np.float32)
    for t in range(t_out):
        for kk in range(k):
            y[t] += xp[t * stride + kk * dilation] @ w[:, :, kk].T
    return y + b


def np_convtr(x, w, stride):
    """Oracle: full transposed conv, x [T, Cin], w [O, Cin, K] (forward
    layout; tap k of input t lands on output t*stride + k)."""
    o, cin, k = w.shape
    t = x.shape[0]
    y = np.zeros(((t - 1) * stride + k, o), np.float32)
    for ti in range(t):
        for kk in range(k):
            y[ti * stride + kk] += x[ti] @ w[:, :, kk].T
    return y


def test_streaming_conv_matches_oracle(rng):
    m = StreamingConv1d(4, 8, kernel=5, stride=1)
    params = m.init_params(jax.random.PRNGKey(0))
    x = rng.normal(size=(1, 24, 4)).astype(np.float32)
    y, _ = m(params, m.init_state(1), jnp.asarray(x))
    ref = np_causal_conv(x[0], np.asarray(params["weight"]),
                         np.asarray(params["bias"]))
    np.testing.assert_allclose(np.asarray(y)[0], ref, rtol=1e-4, atol=1e-4)


def test_streaming_conv_strided_chunks_equal_offline(rng):
    m = StreamingConv1d(3, 6, kernel=8, stride=4)
    params = m.init_params(jax.random.PRNGKey(1))
    x = rng.normal(size=(2, 32, 3)).astype(np.float32)
    y_full, _ = m(params, m.init_state(2), jnp.asarray(x))
    # chunked: 8 samples at a time
    state = m.init_state(2)
    outs = []
    for i in range(0, 32, 8):
        y, state = m(params, state, jnp.asarray(x[:, i:i + 8]))
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.concatenate(outs, axis=1),
                               np.asarray(y_full), rtol=1e-4, atol=1e-4)
    ref = np_causal_conv(x[0], np.asarray(params["weight"]),
                         np.asarray(params["bias"]), stride=4)
    np.testing.assert_allclose(np.asarray(y_full)[0], ref, rtol=1e-4, atol=1e-4)


def test_streaming_conv_dilated(rng):
    m = StreamingConv1d(2, 2, kernel=3, dilation=2)
    params = m.init_params(jax.random.PRNGKey(2))
    x = rng.normal(size=(1, 16, 2)).astype(np.float32)
    y, _ = m(params, m.init_state(1), jnp.asarray(x))
    ref = np_causal_conv(x[0], np.asarray(params["weight"]),
                         np.asarray(params["bias"]), dilation=2)
    np.testing.assert_allclose(np.asarray(y)[0], ref, rtol=1e-4, atol=1e-4)


def test_stateless_conv1x1(rng):
    m = StatelessConv1d(4, 7, kernel=1)
    params = m.init_params(jax.random.PRNGKey(3))
    x = rng.normal(size=(1, 5, 4)).astype(np.float32)
    y, _ = m(params, {}, jnp.asarray(x))
    w = np.asarray(params["weight"])[:, :, 0]
    ref = x[0] @ w.T + np.asarray(params["bias"])
    np.testing.assert_allclose(np.asarray(y)[0], ref, rtol=1e-4, atol=1e-4)


def test_streaming_convtr_matches_oracle(rng):
    m = StreamingConvTranspose1d(3, 5, kernel=8, stride=4)
    params = m.init_params(jax.random.PRNGKey(4))
    x = rng.normal(size=(1, 12, 3)).astype(np.float32)
    state = m.init_state(1)
    outs = []
    for i in range(0, 12, 2):  # chunks of 2 -> 8 output samples each
        y, state = m(params, state, jnp.asarray(x[:, i:i + 2]))
        outs.append(np.asarray(y))
    got = np.concatenate(outs, axis=1)[0]        # [48, 5]
    full = np_convtr(x[0], np.asarray(params["weight"]), 4)
    ref = full[:48] + np.asarray(params["bias"])
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_streaming_convtr_depthwise(rng):
    # Mimi upsample: 512ch depthwise k4 s2 (here scaled down: 8ch)
    m = StreamingConvTranspose1d(8, 8, kernel=4, stride=2, groups=8)
    params = m.init_params(jax.random.PRNGKey(5))
    x = rng.normal(size=(1, 6, 8)).astype(np.float32)
    state = m.init_state(1)
    outs = []
    for i in range(0, 6, 1):
        y, state = m(params, state, jnp.asarray(x[:, i:i + 1]))
        outs.append(np.asarray(y))
    got = np.concatenate(outs, axis=1)[0]
    # depthwise oracle: per-channel 1d transposed conv
    w = np.asarray(params["weight"])  # [8, 1, 4]
    ref = np.zeros((6 * 2 + 2, 8), np.float32)
    for c in range(8):
        for ti in range(6):
            for kk in range(4):
                ref[ti * 2 + kk, c] += x[0, ti, c] * w[c, 0, kk]
    ref = ref[:12] + np.asarray(params["bias"])
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_convtr_weight_conversion():
    w = np.arange(2 * 3 * 4, dtype=np.float32).reshape(2, 3, 4)  # [I, O, K]
    out = torch_convtr_weight_to_oiw(w)
    assert out.shape == (3, 2, 4)
    np.testing.assert_array_equal(out[1, 0], w[0, 1])
    # grouped: I=4, g=2, O/g=1 -> O=2
    wg = np.arange(4 * 1 * 3, dtype=np.float32).reshape(4, 1, 3)
    outg = torch_convtr_weight_to_oiw(wg, groups=2)
    assert outg.shape == (2, 2, 3)
    np.testing.assert_array_equal(outg[0, 0], wg[0, 0])
    np.testing.assert_array_equal(outg[1, 1], wg[3, 0])
