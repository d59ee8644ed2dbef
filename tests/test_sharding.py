import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moshi_tpu.models.lm import (LMConfig, init_gen_state, init_lm_params,
                                 lm_gen_step)
from moshi_tpu.parallel import (lm_param_pspecs, lm_state_pspecs, make_mesh,
                                shard_tree)
from moshi_tpu.quant.policy import quantize_tree

# dims sized so model axis 4 divides heads (8) and rows
_cfg = LMConfig(
    dim=64, num_heads=8, num_layers=2, hidden_dim=128, context=16,
    card=32, n_q=4, dep_q=2, text_card=48, delays=(0, 0, 1, 1, 2),
    depformer_dim=32, depformer_heads=4, depformer_layers=2,
    depformer_hidden=64, depformer_low_rank=16,
)


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "conftest must provide 8 cpu devices"
    params = init_lm_params(jax.random.PRNGKey(0), _cfg)
    return params


def test_mesh_creation():
    mesh = make_mesh(data=2, model=4)
    assert mesh.shape == {"data": 2, "model": 4}


def test_pspec_tree_structure(setup):
    params = setup
    specs = lm_param_pspecs(params)
    # same tree structure
    jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(specs)
    lay = specs["transformer"]["layers"]
    from jax.sharding import PartitionSpec as P
    assert lay["self_attn"]["in_proj"]["weight"] == P(None, "model", None)
    assert lay["self_attn"]["out_proj"]["weight"] == P(None, None, "model")
    assert lay["norm1"]["alpha"] == P(None, None)
    assert specs["text_linear"]["weight"] == P("model", None)


def test_sharded_step_matches_single_device(setup):
    params = setup
    mesh = make_mesh(data=2, model=4)
    state = init_gen_state(_cfg, 2, jax.random.PRNGKey(3))
    # single-device run
    out_ref, state_ref = lm_gen_step(_cfg, params, state, temp=0.0,
                                     temp_text=0.0)
    # sharded run
    p_specs = lm_param_pspecs(params)
    s_specs = lm_state_pspecs(state)
    params_s = shard_tree(params, p_specs, mesh)
    state_s = shard_tree(state, s_specs, mesh)
    with mesh:
        step = jax.jit(lambda p, s: lm_gen_step(_cfg, p, s, temp=0.0,
                                                temp_text=0.0))
        out_s, _ = step(params_s, state_s)
    np.testing.assert_array_equal(np.asarray(out_ref["sampled_text"]),
                                  np.asarray(out_s["sampled_text"]))
    np.testing.assert_array_equal(np.asarray(out_ref["audio"]),
                                  np.asarray(out_s["audio"]))


import pytest


@pytest.mark.parametrize("fmt", ["q8_0", "q8_r"])
def test_sharded_quantized_params(setup, fmt):
    # q8_r is the GSPMD-native path by design (plain XLA int8 dot)
    params = quantize_tree(setup, fmt)
    mesh = make_mesh(data=1, model=8)
    specs = lm_param_pspecs(params)
    params_s = shard_tree(params, specs, mesh)
    state = init_gen_state(_cfg, 1)
    with mesh:
        out, _ = jax.jit(lambda p, s: lm_gen_step(_cfg, p, s, temp=0.0,
                                                  temp_text=0.0))(params_s, state)
    assert out["audio"].shape == (1, 2)


def test_multi_step_sharded_loop(setup):
    params = setup
    mesh = make_mesh(data=2, model=4)
    params_s = shard_tree(params, lm_param_pspecs(params), mesh)
    state = init_gen_state(_cfg, 2, jax.random.PRNGKey(1))
    state_s = shard_tree(state, lm_state_pspecs(state), mesh)
    rng = np.random.default_rng(0)
    with mesh:
        step = jax.jit(lambda p, s, o: lm_gen_step(_cfg, p, s, other_audio=o,
                                                   temp=0.8, temp_text=0.7,
                                                   top_k=8, top_k_text=8))
        for i in range(4):
            other = jnp.asarray(rng.integers(0, 32, size=(2, 2)), jnp.int32)
            out, state_s = step(params_s, state_s, other)
    assert bool(np.asarray(out["valid"]).all())
