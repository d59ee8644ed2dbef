"""Tests for the elision-proof bench harness (moshi_tpu/utils/honest.py).

The harness is round 4's measurement gate (VERDICT r3 item 1): these
tests pin its protocol mechanics — digest chaining, validation verdicts,
the physics floor — on CPU with toy step functions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moshi_tpu.utils import honest


def _inputs(n, dim=8, seed=0):
    rng = np.random.default_rng(seed)
    return [jnp.asarray(rng.normal(size=(dim,)).astype(np.float32))
            for _ in range(n)]


def _make_step():
    @jax.jit
    def step(state, chained, x):
        state = state * 0.9 + x
        dg = jnp.sum(state * state)
        return state, chained * jnp.float32(0.999) + dg, dg
    return step


def _init():
    return jnp.zeros((8,), jnp.float32)


def test_honest_run_valid():
    rep = honest.run(_make_step(), _init, _inputs(64), frames=16,
                     warmup=4, bytes_per_frame=1, windowed_frames=8,
                     validate_frames=4)
    assert rep.valid, rep.checks
    assert rep.checks == {"digest_finite": True, "digest_varies": True,
                          "above_floor": True, "deterministic": True,
                          "input_dependent": True}
    assert rep.frame_ms > 0 and rep.p50_ms > 0
    assert rep.windowed_ms > 0
    assert np.isfinite(rep.digest)


def test_honest_detects_constant_digest():
    # a step whose digest ignores the input (the elision signature:
    # outputs not a function of the work) must be flagged
    @jax.jit
    def step(state, chained, x):
        dg = jnp.float32(42.0)
        return state, chained + dg, dg

    rep = honest.run(step, _init, _inputs(64), frames=16, warmup=4,
                     bytes_per_frame=1, validate_frames=4)
    assert not rep.valid
    assert not rep.checks["digest_varies"]
    assert not rep.checks["input_dependent"]


def test_honest_physics_floor():
    # a bytes_per_frame so large no machine could stream it in the
    # measured time -> below the floor -> invalid
    rep = honest.run(_make_step(), _init, _inputs(64), frames=16,
                     warmup=4, bytes_per_frame=10**18, validate_frames=4)
    assert not rep.valid
    assert not rep.checks["above_floor"]
    assert rep.floor_ms > rep.frame_ms


def test_honest_requires_distinct_inputs():
    with pytest.raises(ValueError, match="distinct inputs"):
        honest.run(_make_step(), _init, _inputs(4), frames=16, warmup=4,
                   bytes_per_frame=1)


def test_tree_bytes():
    tree = {"a": jnp.zeros((4, 4), jnp.float32),
            "b": [jnp.zeros((8,), jnp.int8), jnp.zeros((2,), jnp.bfloat16)],
            "c": 3}
    assert honest.tree_bytes(tree) == 64 + 8 + 4
