"""Expert-parallel depformer sharding (parallel/ep.py): weights-per-step
sets distributed over the model axis — equivalence vs unsharded."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from moshi_tpu.models.lm import LMConfig, init_gen_state, lm_gen_step
from moshi_tpu.parallel import make_mesh
from moshi_tpu.parallel.ep import ep_shard_depformer
from moshi_tpu.runtime.synth import synth_lm_params

_cfg = LMConfig(dim=128, num_heads=4, num_layers=2, hidden_dim=256,
                context=32, card=128, n_q=6, dep_q=4, text_card=256,
                delays=(0, 0, 1, 1, 1, 1, 2), depformer_dim=128,
                depformer_heads=4, depformer_layers=2,
                depformer_hidden=256, depformer_low_rank=16)


def _steps(params, n=4):
    state = init_gen_state(_cfg, 1, jax.random.PRNGKey(3), params=params)
    toks = []
    for _ in range(n):
        out, state = lm_gen_step(_cfg, params, state, temp=0.0,
                                 temp_text=0.0)
        toks.append((np.asarray(out["sampled_text"]),
                     np.asarray(out["audio"])))
    return toks


def test_ep_sharded_depformer_matches_unsharded():
    params = synth_lm_params(jax.random.PRNGKey(0), _cfg, fmt=None)
    ref = _steps(params)

    mesh = make_mesh(data=1, model=4, devices=jax.devices()[:4])
    eps = ep_shard_depformer(params, _cfg, mesh)
    # step axes sharded, norms/emb replicated
    dep = eps["depformer"]
    in_sh = dep["in"]["weight"].sharding
    assert in_sh.spec == P("model", None, None), in_sh
    lin_sh = dep["linears"]["weight"].sharding
    assert lin_sh.spec == P("model", None, None), lin_sh
    emb_sh = dep["emb"]["weight"].sharding             # [dep_q-1, ...]
    assert emb_sh.spec in (P(None, None, None), P()), emb_sh

    with mesh:
        got = _steps(eps)
    for (rt, ra), (gt, ga) in zip(ref, got):
        np.testing.assert_array_equal(rt, gt)
        np.testing.assert_array_equal(ra, ga)


def test_ep_layer_norm_stacks_not_sharded():
    """A leading dim that merely divides the axis size (e.g. L == 2
    layers on a 2-way axis) must NOT shard — only true step axes."""
    params = synth_lm_params(jax.random.PRNGKey(0), _cfg, fmt=None)
    mesh = make_mesh(data=1, model=2, devices=jax.devices()[:2])
    eps = ep_shard_depformer(params, _cfg, mesh)
    lay = eps["depformer"]["layers"]
    n1 = lay["norm1"]["alpha"]             # [L, ...] stack, L == 2
    assert all(p is None for p in n1.sharding.spec), n1.sharding
