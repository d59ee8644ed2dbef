"""End-to-end LM step with ALL pallas kernels active (TPU interpret mode
on CPU) vs the XLA path — the integration check for the fused kernels."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from moshi_tpu.models.lm import LMConfig, init_gen_state, lm_gen_step
from moshi_tpu.utils.pallas_mode import pallas_interpret
from moshi_tpu.quant.formats import enable_pallas
from moshi_tpu.runtime.synth import synth_lm_params

_cfg = LMConfig(
    dim=256, num_heads=4, num_layers=2, hidden_dim=256, context=32,
    card=256, n_q=4, dep_q=2, text_card=512, delays=(0, 0, 1, 1, 2),
    depformer_dim=256, depformer_heads=4, depformer_layers=1,
    depformer_hidden=256, depformer_low_rank=16)


@pytest.mark.parametrize("fmt", ["q8_0", "q4_k"])
def test_lm_step_pallas_interpret_matches_xla(fmt):
    params = synth_lm_params(jax.random.PRNGKey(0), _cfg, fmt=fmt)

    def run(pallas):
        enable_pallas(pallas)
        try:
            state = init_gen_state(_cfg, 1, jax.random.PRNGKey(5))
            outs = []
            for _ in range(3):
                if pallas:
                    # plain pallas interpreter: the threaded TPU emulator
                    # (force_tpu_interpret_mode) deadlocks its clock
                    # io_callbacks against eager main-thread dispatch
                    # under load (utils/pallas_mode.py)
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
    for f in range(3):
        np.testing.assert_array_equal(got[f][0], ref[f][0])
        np.testing.assert_array_equal(got[f][1], ref[f][1])


def test_lm_step_pallas_lowers_for_tpu():
    """AOT cross-lowering to TPU runs the Mosaic block-mapping checks that
    interpret mode skips (a (1, dd) block of an [L, dd] array passed
    interpret tests but raised ValueError on the real chip and silently
    benched the XLA fallback)."""
    params = synth_lm_params(jax.random.PRNGKey(0), _cfg, fmt="q4_k")
    enable_pallas(True)
    try:
        state = init_gen_state(_cfg, 1, jax.random.PRNGKey(5))
        f = jax.jit(lambda p, s: lm_gen_step(_cfg, p, s, temp=0.0,
                                             temp_text=0.0))
        f.trace(params, state).lower(lowering_platforms=("tpu",))
    finally:
        enable_pallas(False)
