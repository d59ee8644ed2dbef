"""Temporal-stack megakernel (nn/pallas_temporal.py) vs the XLA path.

The megakernel is OPT-IN (MOSHI_TPU_MEGAKERNEL=temporal|dep|all) since
the hardware A/B measured it slower than the layer scan over per-op
pallas kernels (BENCH_NOTES.md); these tests keep it correct for
re-evaluation on future toolchains.

Interpret mode on CPU for numerics (ring wrap-around included), plus TPU
cross-lowering for the Mosaic block rules that interpret mode skips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from moshi_tpu.models.lm import LMConfig, init_gen_state, lm_gen_step
from moshi_tpu.nn.transformer import (_forward_megakernel,
                                      can_use_temporal_megakernel,
                                      init_transformer_state,
                                      transformer_forward)
from moshi_tpu.utils.pallas_mode import pallas_interpret
from moshi_tpu.quant.formats import enable_pallas
from moshi_tpu.runtime.synth import synth_lm_params

_cfg = LMConfig(
    dim=256, num_heads=4, num_layers=2, hidden_dim=256, context=16,
    card=256, n_q=4, dep_q=2, text_card=512, delays=(0, 0, 1, 1, 2),
    depformer_dim=256, depformer_heads=4, depformer_layers=1,
    depformer_hidden=256, depformer_low_rank=16)


@pytest.fixture
def megakernel_env(monkeypatch):
    monkeypatch.setenv("MOSHI_TPU_MEGAKERNEL", "all")


def _tparams():
    return synth_lm_params(jax.random.PRNGKey(0), _cfg,
                           fmt="q4_k")["transformer"]


def test_megakernel_matches_xla_stack(megakernel_env):
    """20 decode steps (ring wraps at context=16): outputs and cache
    contents match the XLA stack within bf16-attention tolerance."""
    tcfg = _cfg.transformer
    tp = _tparams()
    enable_pallas(True)
    try:
        assert can_use_temporal_megakernel(tcfg, tp, 1)
    finally:
        enable_pallas(False)
    state_std = init_transformer_state(tcfg, 1)
    state_flat = init_transformer_state(tcfg, 1, flat=True)
    key = jax.random.PRNGKey(7)
    for step in range(20):
        key, k = jax.random.split(key)
        x = jax.random.normal(k, (1, 1, _cfg.dim), jnp.float32)
        offset = jnp.full((1,), step, jnp.int32)
        y_ref, state_std = transformer_forward(tcfg, tp, state_std, x,
                                               offset)
        with pallas_interpret():
            y_got, state_flat = _forward_megakernel(tcfg, tp, state_flat,
                                                    x, offset)
        scale = np.abs(np.asarray(y_ref)).mean()
        err = np.abs(np.asarray(y_got) - np.asarray(y_ref)).max()
        assert err / scale < 5e-2, f"step {step}: err {err/scale}"
    # ring contents: flat cache rows == standard cache rows (post-rope k)
    cap = tcfg.mha.cap
    k_std = np.asarray(state_std["k"])[:, 0, :cap]          # [L, cap, H, hd]
    k_std = k_std.reshape(k_std.shape[0], cap, -1)
    k_flat = np.asarray(state_flat["k"])[:, :cap]           # [L, cap, D]
    np.testing.assert_allclose(k_flat.astype(np.float32),
                               k_std.astype(np.float32), atol=2e-2)


def test_megakernel_e2e_lm_step(megakernel_env):
    """Full lm_gen_step with the flat-KV layout vs the XLA path: greedy
    tokens over several frames."""
    params = synth_lm_params(jax.random.PRNGKey(0), _cfg, fmt="q4_k")

    def run(flat):
        enable_pallas(flat)
        try:
            state = init_gen_state(_cfg, 1, jax.random.PRNGKey(5),
                                   params=params if flat else None)
            if flat:
                assert state["transformer"]["k"].ndim == 3
            outs = []
            for _ in range(4):
                if flat:
                    with pallas_interpret():
                        out, state = lm_gen_step(_cfg, params, state,
                                                 temp=0.0, temp_text=0.0)
                else:
                    out, state = lm_gen_step(_cfg, params, state,
                                             temp=0.0, temp_text=0.0)
                outs.append((np.asarray(out["sampled_text"]),
                             np.asarray(out["audio"])))
            return outs
        finally:
            enable_pallas(False)

    ref = run(False)
    got = run(True)
    for f in range(4):
        np.testing.assert_array_equal(got[f][0], ref[f][0])
        np.testing.assert_array_equal(got[f][1], ref[f][1])


def test_megakernel_lowers_for_tpu(megakernel_env):
    params = synth_lm_params(jax.random.PRNGKey(0), _cfg, fmt="q4_k")
    enable_pallas(True)
    try:
        state = init_gen_state(_cfg, 1, jax.random.PRNGKey(5),
                               params=params)
        assert state["transformer"]["k"].ndim == 3
        f = jax.jit(lambda p, s: lm_gen_step(_cfg, p, s, temp=0.0,
                                             temp_text=0.0))
        f.trace(params, state).lower(lowering_platforms=("tpu",))
    finally:
        enable_pallas(False)


def test_megakernel_default_off(monkeypatch):
    """Without the opt-in env the scan layout is chosen even when the
    megakernel preconditions would otherwise hold."""
    tcfg = _cfg.transformer
    tp = _tparams()
    enable_pallas(True)
    try:
        monkeypatch.delenv("MOSHI_TPU_MEGAKERNEL", raising=False)
        assert not can_use_temporal_megakernel(tcfg, tp, 1)
        params = synth_lm_params(jax.random.PRNGKey(0), _cfg, fmt="q4_k")
        state = init_gen_state(_cfg, 1, jax.random.PRNGKey(5),
                               params=params)
        assert state["transformer"]["k"].ndim == 5   # [L, B, cap, H, hd]
        monkeypatch.setenv("MOSHI_TPU_MEGAKERNEL", "all")
        assert can_use_temporal_megakernel(tcfg, tp, 1)
    finally:
        enable_pallas(False)
