import jax
import jax.numpy as jnp
import numpy as np

from moshi_tpu.nn.transformer import (TransformerConfig,
                                      init_transformer_params,
                                      init_transformer_state,
                                      transformer_cross_kv,
                                      transformer_forward)
from moshi_tpu.quant.policy import quantize_tree


def _mk(cfg, batch=1, seed=0):
    params = init_transformer_params(jax.random.PRNGKey(seed), cfg)
    state = init_transformer_state(cfg, batch)
    return params, state


def _stream(cfg, params, state, x, chunk):
    outs = []
    b, t, _ = x.shape
    for i in range(0, t, chunk):
        y, state = transformer_forward(
            cfg, params, state, jnp.asarray(x[:, i:i + chunk]),
            jnp.asarray([i] * b, jnp.int32))
        outs.append(np.asarray(y, np.float32))
    return np.concatenate(outs, axis=1), state


def test_stack_streaming_consistency(rng):
    cfg = TransformerConfig(dim=32, num_heads=4, num_layers=3, hidden_dim=64,
                            context=64, norm="rms_norm_f32", gating="silu")
    params, state = _mk(cfg)
    x = rng.normal(size=(1, 8, 32)).astype(np.float32)
    y1, _ = _stream(cfg, params, init_transformer_state(cfg, 1), x, chunk=1)
    y8, _ = _stream(cfg, params, init_transformer_state(cfg, 1), x, chunk=8)
    np.testing.assert_allclose(y1, y8, rtol=5e-2, atol=5e-2)


def test_stack_layer_norm_gelu_layerscale(rng):
    # mimi-style stack: layer_norm + linear1/linear2 + layer_scale
    cfg = TransformerConfig(dim=32, num_heads=4, num_layers=2, hidden_dim=128,
                            context=16, norm="layer_norm", gating="",
                            use_layer_scale=True, bias_proj=True, bias_ffn=True)
    params, state = _mk(cfg, batch=2)
    x = rng.normal(size=(2, 4, 32)).astype(np.float32)
    y, new_state = transformer_forward(cfg, params, state, jnp.asarray(x),
                                       jnp.zeros((2,), jnp.int32))
    assert y.shape == (2, 4, 32)
    assert new_state["k"].shape == (2, 2, 16, 4, 8)
    assert not np.allclose(np.asarray(y), x)  # did something


def test_stack_jit_and_donate(rng):
    cfg = TransformerConfig(dim=16, num_heads=2, num_layers=2, hidden_dim=32,
                            context=8, gating="silu")
    params, state = _mk(cfg)

    @jax.jit
    def step(params, state, x, offset):
        return transformer_forward(cfg, params, state, x, offset)

    x = jnp.asarray(rng.normal(size=(1, 1, 16)).astype(np.float32))
    y1, state = step(params, state, x, jnp.asarray([0]))
    y2, state = step(params, state, x, jnp.asarray([1]))
    assert y1.shape == (1, 1, 16)
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_quantized_stack_runs(rng):
    cfg = TransformerConfig(dim=256, num_heads=4, num_layers=2,
                            hidden_dim=512, context=8, gating="silu")
    params, state = _mk(cfg)
    qparams = {"layers": quantize_tree(params["layers"], "q8_0")}
    x = jnp.asarray(rng.normal(size=(1, 1, 256)).astype(np.float32))
    y, _ = transformer_forward(cfg, params, state, x, jnp.asarray([0]))
    yq, _ = transformer_forward(cfg, qparams, state, x, jnp.asarray([0]))
    err = np.abs(np.asarray(y) - np.asarray(yq)).mean()
    scale = np.abs(np.asarray(y)).mean()
    assert err / scale < 0.1, f"quantized stack diverges: {err/scale}"


def test_cross_attention_stack(rng):
    cfg = TransformerConfig(dim=32, num_heads=4, num_layers=2, hidden_dim=64,
                            context=16, gating="silu", cross_attention=True)
    params, state = _mk(cfg)
    cond = jnp.asarray(rng.normal(size=(1, 6, 32)).astype(np.float32))
    ckv = transformer_cross_kv(cfg, params, cond)
    assert ckv["k"].shape == (2, 1, 6, 4, 8)
    x = jnp.asarray(rng.normal(size=(1, 2, 32)).astype(np.float32))
    y_with, _ = transformer_forward(cfg, params, state, x,
                                    jnp.zeros((1,), jnp.int32), cross_kv=ckv)
    y_wo, _ = transformer_forward(cfg, params, state, x,
                                  jnp.zeros((1,), jnp.int32))
    assert y_with.shape == (1, 2, 32)
    assert not np.allclose(np.asarray(y_with), np.asarray(y_wo))
