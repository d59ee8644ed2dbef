"""Pipeline parallelism (parallel/pp.py): GPipe-style stage schedule of
the stacked-kernel decode path — equivalence vs the single-device path
(SURVEY.md §2.7 PP row, the one optional strategy round 1 left out)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moshi_tpu.models.lm import LMConfig, init_gen_state, lm_gen_step
from moshi_tpu.parallel import (make_pp_mesh, pp_scope, pp_shard_lm_params,
                                pp_shard_lm_state)
from moshi_tpu.quant.formats import enable_pallas
from moshi_tpu.utils.pallas_mode import pallas_interpret

# 4 stacked layers so a 2- or 4-stage pipeline divides evenly
_cfg = LMConfig(
    dim=256, num_heads=8, num_layers=4, hidden_dim=256, context=32,
    card=256, n_q=4, dep_q=2, text_card=512, delays=(0, 0, 1, 1, 2),
    depformer_dim=256, depformer_heads=8, depformer_layers=2,
    depformer_hidden=256, depformer_low_rank=16)


def _run_frames(cfg, params, state, n_frames, batch):
    step = jax.jit(lambda p, s, o: lm_gen_step(
        cfg, p, s, other_audio=o, temp=0.0, temp_text=0.0))
    outs = []
    rng = np.random.default_rng(0)
    for _ in range(n_frames):
        other = jnp.asarray(rng.integers(0, cfg.card, (batch, 2)), jnp.int32)
        # plain-interpret pallas (threaded TPU emulator deadlocks under
        # multi-device shard_map on the CPU pool — see test_tp.py)
        with pallas_interpret():
            out, state = step(params, state, other)
        outs.append((np.asarray(out["sampled_text"]),
                     np.asarray(out["audio"]),
                     np.asarray(out["valid"])))
    return outs


@pytest.mark.parametrize("data,pp,batch", [(1, 2, 4), (2, 2, 4), (1, 4, 4)])
def test_pp_step_matches_single_device(data, pp, batch):
    """S-stage pipeline over the temporal stack == single device, while
    the depformer/mimi stacks in the same jit stay replicated (dispatch
    gated on the stack's layer count)."""
    from moshi_tpu.runtime.synth import synth_lm_params
    params = synth_lm_params(jax.random.PRNGKey(0), _cfg, fmt="q4_k")
    enable_pallas(True)
    try:
        state0 = init_gen_state(_cfg, batch, jax.random.PRNGKey(5))
        ref = _run_frames(_cfg, params, state0, 3, batch)
        assert any(o[2].any() for o in ref), "no valid frames generated"
        mesh = make_pp_mesh(pp=pp, data=data)
        pp_params = pp_shard_lm_params(params, _cfg, mesh)
        state = pp_shard_lm_state(
            init_gen_state(_cfg, batch, jax.random.PRNGKey(5)), mesh)
        with pp_scope(mesh, _cfg.transformer):
            got = _run_frames(_cfg, pp_params, state, 3, batch)
    finally:
        enable_pallas(False)
    for f, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_array_equal(g[0], r[0], err_msg=f"text f{f}")
        np.testing.assert_array_equal(g[1], r[1], err_msg=f"audio f{f}")


def test_pp_step_lowers_for_tpu():
    """Cross-lower the pipelined step for TPU (Mosaic block rules on the
    per-stage kernels + the ppermute/psum collective program)."""
    from moshi_tpu.runtime.synth import synth_lm_params
    params = synth_lm_params(jax.random.PRNGKey(0), _cfg, fmt="q4_k")
    enable_pallas(True)
    try:
        mesh = make_pp_mesh(pp=4, data=2)
        pp_params = pp_shard_lm_params(params, _cfg, mesh)
        state = pp_shard_lm_state(
            init_gen_state(_cfg, 8, jax.random.PRNGKey(5)), mesh)
        with pp_scope(mesh, _cfg.transformer):
            f = jax.jit(lambda p, s: lm_gen_step(_cfg, p, s, temp=0.0,
                                                 temp_text=0.0))
            f.trace(pp_params, state).lower(lowering_platforms=("tpu",))
    finally:
        enable_pallas(False)


def test_pp_matches_rejects_same_depth_other_stack():
    """Dispatch is gated on full config identity: a different stack with
    a coincidentally equal layer count must NOT be pp-routed
    (ADVICE r2: bare layer-count gate was a footgun)."""
    import dataclasses
    from moshi_tpu.parallel.pp import PPContext
    mesh = make_pp_mesh(pp=2)
    with pp_scope(mesh, _cfg.transformer):
        from moshi_tpu.parallel.pp import current_pp
        pp = current_pp()
        assert pp.matches(_cfg.transformer)
        other = dataclasses.replace(_cfg.transformer, dim=128)
        assert other.num_layers == _cfg.transformer.num_layers
        assert not pp.matches(other)
    # legacy int form keeps the (documented) depth-only behavior
    with pp_scope(mesh, _cfg.transformer.num_layers):
        from moshi_tpu.parallel.pp import current_pp
        assert current_pp().matches(_cfg.transformer)


def test_pp_state_pspecs_rejects_flat_kv():
    """A flat megakernel KV layout (k/v ndim 3) must fail loudly with a
    message naming the stacked-layout requirement, not an opaque
    device_put error (ADVICE r2)."""
    from moshi_tpu.parallel.pp import pp_state_pspecs
    flat = {"k": jnp.zeros((4, 8, 16)), "v": jnp.zeros((4, 8, 16))}
    with pytest.raises(ValueError, match="stacked KV layout"):
        pp_state_pspecs(flat)


def test_pp_guard_covers_prefill_fallback():
    """Under pp_scope, a quantized stack that fails the stacked-decode
    preconditions (prefill T>1) raises instead of silently taking the
    GSPMD scan path with pp-sharded pallas weights (ADVICE r2 medium)."""
    from moshi_tpu.nn.transformer import (transformer_forward,
                                          init_transformer_state)
    from moshi_tpu.runtime.synth import synth_lm_params
    params = synth_lm_params(jax.random.PRNGKey(0), _cfg, fmt="q4_k")
    enable_pallas(True)
    try:
        mesh = make_pp_mesh(pp=2)
        tcfg = _cfg.transformer
        state = init_transformer_state(tcfg, batch=2)
        x = jnp.zeros((2, 3, tcfg.dim), jnp.bfloat16)   # T=3 prefill
        off = jnp.zeros((2,), jnp.int32)
        with pp_scope(mesh, tcfg):
            with pytest.raises(ValueError, match="stacked-decode"):
                transformer_forward(tcfg, params["transformer"], state,
                                    x, off)
    finally:
        enable_pallas(False)
