"""Aliased in-place ring writes (nn/pallas_ring.py) vs the XLA DUS
oracle, plus TPU cross-lowering (the aliasing itself is a
memory-layout property only the real compiler checks)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moshi_tpu.nn.pallas_ring import ring_write, ring_write_stacked

L, B, CAP, H, HD = 3, 4, 16, 4, 64


def _oracle_stacked(k_stack, ks, slot):
    out = np.asarray(k_stack).copy()
    for i in range(k_stack.shape[1]):
        out[:, i, int(slot[i])] = np.asarray(ks)[:, i]
    return out


@pytest.mark.parametrize("dtype", ["bfloat16", "float8_e4m3fn"])
def test_ring_write_stacked_matches_dus(rng, dtype):
    dt = jnp.dtype(dtype)
    k = jnp.asarray(rng.normal(size=(L, B, CAP, H, HD)), jnp.float32
                    ).astype(dt)
    v = jnp.asarray(rng.normal(size=(L, B, CAP, H, HD)), jnp.float32
                    ).astype(dt)
    ks = jnp.asarray(rng.normal(size=(L, B, H, HD)), jnp.float32)
    vs = jnp.asarray(rng.normal(size=(L, B, H, HD)), jnp.float32)
    slot = jnp.asarray([0, 3, 15, 7], jnp.int32)
    kc, vc = ring_write_stacked(k, v, ks, vs, slot, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(kc.astype(jnp.float32)),
        _oracle_stacked(k.astype(jnp.float32),
                        ks.astype(dt).astype(jnp.float32), slot))
    np.testing.assert_array_equal(
        np.asarray(vc.astype(jnp.float32)),
        _oracle_stacked(v.astype(jnp.float32),
                        vs.astype(dt).astype(jnp.float32), slot))


def test_ring_write_4d_matches_dus(rng):
    c = jnp.asarray(rng.normal(size=(B, CAP, H, HD)), jnp.bfloat16)
    vals = jnp.asarray(rng.normal(size=(B, H, HD)), jnp.float32)
    slot = jnp.asarray([5, 0, 2, 15], jnp.int32)
    out = ring_write(c, vals, slot, interpret=True)
    ref = np.asarray(c.astype(jnp.float32)).copy()
    for i in range(B):
        ref[i, int(slot[i])] = np.asarray(vals.astype(jnp.bfloat16)
                                          .astype(jnp.float32))[i]
    np.testing.assert_array_equal(np.asarray(out.astype(jnp.float32)),
                                  ref)


def test_ring_write_lowers_for_tpu(rng):
    k = jnp.zeros((L, B, CAP, H, HD), jnp.bfloat16)
    ks = jnp.zeros((L, B, H, HD), jnp.float32)
    slot = jnp.zeros((B,), jnp.int32)

    def f(kk, vv, a, b2, s):
        return ring_write_stacked(kk, vv, a, b2, s)

    jax.jit(f).trace(k, k, ks, ks, slot).lower(
        lowering_platforms=("tpu",))

    def g(c, vals, s):
        return ring_write(c, vals, s)

    jax.jit(g).trace(k[0], ks[0], slot).lower(lowering_platforms=("tpu",))


def test_stacked_decode_ring_semantics_unchanged(rng):
    """End-to-end: the stacked decode with the pallas ring write still
    matches its own pre-change semantics (ring row at offset%cap gets
    the new k/v; everything else untouched) across 3 frames."""
    from moshi_tpu.models.lm import LMConfig, init_gen_state, lm_gen_step
    from moshi_tpu.quant.formats import enable_pallas
    from moshi_tpu.runtime.synth import synth_lm_params
    from moshi_tpu.utils.pallas_mode import pallas_interpret

    cfg = LMConfig(
        dim=256, num_heads=4, num_layers=2, hidden_dim=256, context=8,
        card=256, n_q=4, dep_q=2, text_card=512, delays=(0, 0, 1, 1, 2),
        depformer_dim=256, depformer_heads=4, depformer_layers=2,
        depformer_hidden=256, depformer_low_rank=16)
    params = synth_lm_params(jax.random.PRNGKey(0), cfg, fmt="q4_k")
    enable_pallas(True)
    try:
        state = init_gen_state(cfg, 2, jax.random.PRNGKey(5))
        rings = []
        for f in range(3):
            with pallas_interpret():
                out, state = lm_gen_step(cfg, params, state, temp=0.0,
                                         temp_text=0.0)
            rings.append(np.asarray(
                state["transformer"]["k"].astype(jnp.float32)))
        # frame f writes slot f; earlier slots keep their rows
        assert not np.array_equal(rings[0][:, :, 0], rings[0][:, :, 1])
        np.testing.assert_array_equal(rings[2][:, :, 0], rings[0][:, :, 0])
        np.testing.assert_array_equal(rings[2][:, :, 1], rings[1][:, :, 1])
        # untouched tail slots stay zero-initialized
        assert np.all(rings[2][:, :, 5:] == 0)
    finally:
        enable_pallas(False)
