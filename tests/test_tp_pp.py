"""3-axis TP x PP x data composition (parallel/tp_pp.py): the full
generation step on a ("data", "model", "pp") mesh matches the
single-device stacked path bit-for-bit (VERDICT r4 item 6)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moshi_tpu.models.lm import LMConfig, init_gen_state, lm_gen_step
from moshi_tpu.parallel import (make_tp_pp_mesh, pp_scope, tp_pp_shard_lm_params,
                                tp_pp_shard_lm_state, tp_scope)
from moshi_tpu.quant.formats import enable_pallas
from moshi_tpu.utils.pallas_mode import pallas_interpret

_cfg = LMConfig(
    dim=256, num_heads=8, num_layers=4, hidden_dim=256, context=32,
    card=256, n_q=4, dep_q=2, text_card=512, delays=(0, 0, 1, 1, 2),
    depformer_dim=256, depformer_heads=8, depformer_layers=2,
    depformer_hidden=256, depformer_low_rank=16)

_BATCH = 4   # data=2 shards x 2 pp microbatches each


def _run_frames(cfg, params, mesh, n_frames, seed=5):
    state = init_gen_state(cfg, _BATCH, jax.random.PRNGKey(seed))
    if mesh is not None:
        state = tp_pp_shard_lm_state(state, mesh)
    step = jax.jit(lambda p, s, o: lm_gen_step(
        cfg, p, s, other_audio=o, temp=0.0, temp_text=0.0))
    outs = []
    rng = np.random.default_rng(0)
    for _ in range(n_frames):
        other = jnp.asarray(rng.integers(0, cfg.card, (_BATCH, 2)),
                            jnp.int32)
        with pallas_interpret():
            out, state = step(params, state, other)
        outs.append((np.asarray(out["sampled_text"]),
                     np.asarray(out["audio"]),
                     np.asarray(out["valid"])))
    return outs


@pytest.mark.parametrize("fmt", ["q4_k"])
def test_tp_pp_step_matches_single_device(fmt):
    from moshi_tpu.runtime.synth import synth_lm_params
    params = synth_lm_params(jax.random.PRNGKey(0), _cfg, fmt=fmt)
    enable_pallas(True)
    try:
        ref = _run_frames(_cfg, params, None, 3)
        assert any(o[2].any() for o in ref), "no valid frames generated"
        mesh = make_tp_pp_mesh(data=2, model=2, pp=2)
        sp = tp_pp_shard_lm_params(params, _cfg, mesh)
        with tp_scope(mesh), pp_scope(mesh, _cfg.transformer):
            got = _run_frames(_cfg, sp, mesh, 3)
    finally:
        enable_pallas(False)
    for f, (r, g) in enumerate(zip(ref, got)):
        np.testing.assert_array_equal(g[0], r[0], err_msg=f"text f{f}")
        np.testing.assert_array_equal(g[1], r[1], err_msg=f"audio f{f}")


def test_tp_pp_param_placement():
    """Temporal layers shard (pp on L, model on the TP axis); depformer
    step weights and heads shard model-only; KV rings shard
    (pp, data, -, model, -)."""
    from moshi_tpu.runtime.synth import synth_lm_params
    from jax.sharding import PartitionSpec as P
    params = synth_lm_params(jax.random.PRNGKey(0), _cfg, fmt="q4_k")
    mesh = make_tp_pp_mesh(data=2, model=2, pp=2)
    sp = tp_pp_shard_lm_params(params, _cfg, mesh)
    q = sp["transformer"]["layers"]["self_attn"]["in_proj"]["weight"].q
    assert q.sharding.spec == P("pp", "model", None), q.sharding.spec
    oq = sp["transformer"]["layers"]["self_attn"]["out_proj"]["weight"].q
    assert oq.sharding.spec == P("pp", None, "model"), oq.sharding.spec
    hq = sp["text_linear"]["weight"].q
    assert hq.sharding.spec == P("model", None), hq.sharding.spec

    state = tp_pp_shard_lm_state(init_gen_state(_cfg, _BATCH), mesh)
    k = state["transformer"]["k"]
    assert k.sharding.spec == P("pp", "data", None, "model", None), \
        k.sharding.spec


def test_tp_pp_step_lowers_for_tpu():
    """Cross-lower the 3-axis sharded step for TPU: catches Mosaic
    block-rule violations in the (stage, model)-local kernel shapes."""
    from moshi_tpu.runtime.synth import synth_lm_params
    params = synth_lm_params(jax.random.PRNGKey(0), _cfg, fmt="q4_k")
    enable_pallas(True)
    try:
        mesh = make_tp_pp_mesh(data=2, model=2, pp=2)
        sp = tp_pp_shard_lm_params(params, _cfg, mesh)
        state = tp_pp_shard_lm_state(
            init_gen_state(_cfg, _BATCH, jax.random.PRNGKey(5)), mesh)
        with tp_scope(mesh), pp_scope(mesh, _cfg.transformer):
            f = jax.jit(lambda p, s: lm_gen_step(_cfg, p, s, temp=0.0,
                                                 temp_text=0.0))
            f.trace(sp, state).lower(lowering_platforms=("tpu",))
    finally:
        enable_pallas(False)
