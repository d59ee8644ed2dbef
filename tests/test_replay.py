"""Replay-style divergence localization tests (utils/replay.py).

The reference's replay harness re-executes recorded ops individually and
names the first divergence (replay.h:332-385).  These tests inject
faults and assert the tool names the faulty layer/op."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moshi_tpu.models.lm import LMConfig, init_gen_state, lm_gen_step
from moshi_tpu.quant.formats import enable_pallas
from moshi_tpu.runtime.synth import synth_lm_params
from moshi_tpu.utils.capture import TOL_TPU, recording
from moshi_tpu.utils.pallas_mode import pallas_interpret
from moshi_tpu.utils.replay import (first_divergence, qt_layer, replay_ops,
                                    stacked_layer_ops)

_cfg = LMConfig(
    dim=256, num_heads=4, num_layers=3, hidden_dim=256, context=32,
    card=256, n_q=4, dep_q=2, text_card=512, delays=(0, 0, 1, 1, 2),
    depformer_dim=256, depformer_heads=4, depformer_layers=1,
    depformer_hidden=256, depformer_low_rank=16)


def _record_steps(params, steps=2):
    enable_pallas(True)
    try:
        with recording() as rec:
            state = init_gen_state(_cfg, 1, jax.random.PRNGKey(5))
            with pallas_interpret():
                for _ in range(steps):
                    _, state = lm_gen_step(_cfg, params, state,
                                           temp=0.0, temp_text=0.0)
        return rec
    finally:
        enable_pallas(False)


def _corrupt_layer(params, layer):
    """Flip the packed bits of one layer's in_proj rows."""
    tx = params["transformer"]
    w = tx["layers"]["self_attn"]["in_proj"]["weight"]
    q = np.asarray(w.q).copy()
    q[layer] ^= 0xFF
    new_w = dataclasses.replace(w, q=jnp.asarray(q))
    out = dict(params)
    out["transformer"] = dict(tx)
    out["transformer"]["layers"] = dict(tx["layers"])
    out["transformer"]["layers"]["self_attn"] = dict(
        tx["layers"]["self_attn"])
    out["transformer"]["layers"]["self_attn"]["in_proj"] = dict(
        tx["layers"]["self_attn"]["in_proj"])
    out["transformer"]["layers"]["self_attn"]["in_proj"]["weight"] = new_w
    return out


def test_deep_taps_recorded():
    params = synth_lm_params(jax.random.PRNGKey(0), _cfg, fmt="q4_k")
    rec = _record_steps(params, steps=1)
    for op in ("x_in", "qkv", "attn_ctx", "attn_out", "ffn_in",
               "glu_out", "layer_out"):
        key = f"lm/temporal/{op}"
        assert key in rec.values, sorted(rec.values)
        assert len(rec.values[key]) == _cfg.num_layers
    assert rec.order, "execution order must be recorded"


def test_first_divergence_names_faulty_layer():
    params = synth_lm_params(jax.random.PRNGKey(0), _cfg, fmt="q4_k")
    golden = _record_steps(params)
    bad = _record_steps(_corrupt_layer(params, layer=1))
    hit = first_divergence(golden, bad, tol=1e-6)
    assert hit is not None
    name, layer, err = hit
    # layer 0 matches; the corrupt in_proj shows first at layer 1's qkv
    assert name == "lm/temporal/qkv"
    assert layer == 1
    assert err > 1e-3


def test_first_divergence_clean_match():
    params = synth_lm_params(jax.random.PRNGKey(0), _cfg, fmt="q4_k")
    golden = _record_steps(params)
    again = _record_steps(params)
    assert first_divergence(golden, again, tol=1e-6) is None


def test_replay_ops_reexecute_and_localize():
    params = synth_lm_params(jax.random.PRNGKey(0), _cfg, fmt="q4_k")
    rec = _record_steps(params, steps=1)
    trace = {k: list(v) for k, v in rec.values.items()}

    enable_pallas(True)
    try:
        with pallas_interpret():
            ops = stacked_layer_ops(params, trace)
            # same backend as the recording: every op reproduces
            first, lines = replay_ops(ops, tol=TOL_TPU)
    finally:
        enable_pallas(False)
    assert first is None, "\n".join(lines)
    assert len(ops) == 4 * _cfg.num_layers

    # inject a fault into the recorded golden of layer 2's glu output:
    # replay must name exactly that op
    trace["lm/temporal/glu_out"][2] = \
        trace["lm/temporal/glu_out"][2] * 1.5 + 0.1
    enable_pallas(True)
    try:
        with pallas_interpret():
            ops = stacked_layer_ops(params, trace)
            first, lines = replay_ops(ops, tol=TOL_TPU)
    finally:
        enable_pallas(False)
    assert first is not None
    assert first[0] == "layer2/glu", "\n".join(lines)


def test_replay_xla_oracle_agrees_with_kernels():
    """replay.h's cross-backend check: re-execute the recorded ops on
    the OTHER backend (XLA dequant oracle) — same numeric class, so it
    must agree with the pallas-recorded golden within the GPU-grade
    tolerance (replay.h:332-341 uses 1e-2 for cross-backend)."""
    params = synth_lm_params(jax.random.PRNGKey(0), _cfg, fmt="q4_k")
    rec = _record_steps(params, steps=1)
    trace = {k: list(v) for k, v in rec.values.items()}
    enable_pallas(False)     # XLA oracle backend
    ops = stacked_layer_ops(params, trace)
    first, lines = replay_ops(ops, tol=5e-2)
    assert first is None, "\n".join(lines)


def test_replay_attention_op_localizes():
    """VERDICT r4 item 4: decode attention re-executes from the RECORDED
    ring state; a fault injected into one layer's ring localizes to that
    layer's attn op — not just its tap bracket."""
    params = synth_lm_params(jax.random.PRNGKey(0), _cfg, fmt="q4_k")
    rec = _record_steps(params, steps=2)     # frame 2 has a live ring
    trace = {k: list(v) for k, v in rec.values.items()}
    assert "lm/temporal/ring_k" in trace
    assert trace["lm/temporal/ring_k"][0].shape[0] == _cfg.num_layers

    enable_pallas(True)
    try:
        with pallas_interpret():
            ops = stacked_layer_ops(params, trace, cfg=_cfg.transformer)
            assert len(ops) == 5 * _cfg.num_layers
            first, lines = replay_ops(ops, tol=TOL_TPU)
            assert first is None, "\n".join(lines)

            # corrupt layer 1's recorded ring (k so the stale slot wins
            # the softmax, v so the winner's content is wrong): only
            # layer 1's attn op may fail
            bad = {k: list(v) for k, v in trace.items()}
            rk = bad["lm/temporal/ring_k"][-1].copy()
            rv = bad["lm/temporal/ring_v"][-1].copy()
            rk[1] = np.abs(rk[1]) + 3.0
            rv[1] = rv[1] + 50.0
            bad["lm/temporal/ring_k"][-1] = rk
            bad["lm/temporal/ring_v"][-1] = rv
            ops = stacked_layer_ops(params, bad, cfg=_cfg.transformer)
            first, lines = replay_ops(ops, tol=TOL_TPU)
    finally:
        enable_pallas(False)
    assert first is not None
    assert first[0] == "layer1/attn", "\n".join(lines)
    fails = [ln for ln in lines if ln.startswith("FAIL")]
    assert fails == [ln for ln in lines
                     if ln.startswith("FAIL layer1/attn")], fails


def test_replay_attention_xla_oracle():
    """Cross-backend: the pure-XLA ring-attention oracle re-executes the
    pallas-recorded attention within GPU-grade tolerance."""
    params = synth_lm_params(jax.random.PRNGKey(0), _cfg, fmt="q4_k")
    rec = _record_steps(params, steps=2)
    trace = {k: list(v) for k, v in rec.values.items()}
    enable_pallas(False)     # XLA oracle backend for attn + projections
    ops = stacked_layer_ops(params, trace, cfg=_cfg.transformer)
    first, lines = replay_ops(ops, tol=5e-2)
    assert first is None, "\n".join(lines)


def test_seanet_conv_replay_localizes():
    """VERDICT r4 item 4: streaming convs re-execute from recorded
    input + carry state; a corrupted conv weight localizes to exactly
    that module's op."""
    from moshi_tpu.nn.seanet import SEANetConfig, SEANetEncoder
    from moshi_tpu.utils.replay import seanet_ops

    cfg = SEANetConfig(dimension=32, n_filters=4, ratios=(4, 3, 2, 2))
    enc = SEANetEncoder(cfg)
    params = enc.init_params(jax.random.PRNGKey(0))
    state = enc.init_state(1)
    rng = np.random.default_rng(0)
    with recording() as rec:
        for _ in range(2):
            x = jnp.asarray(rng.normal(size=(1, cfg.hop_length, 1)),
                            jnp.float32)
            _, state = enc(params, state, x, tap="enc")
    trace = {k: list(v) for k, v in rec.values.items()}

    ops = seanet_ops(enc, params, trace, "enc")
    assert len(ops) == 2 * len([n for n in enc.modules])
    first, lines = replay_ops(ops, tol=1e-5)
    assert first is None, "\n".join(lines)

    # corrupt ONE mid-chain conv's weights: replay fails at that op only
    victim = sorted(enc.modules)[3]
    bad = dict(params)
    bad[victim] = dict(params[victim],
                       weight=params[victim]["weight"] * 1.5 + 0.01)
    ops = seanet_ops(enc, bad, trace, "enc")
    first, lines = replay_ops(ops, tol=1e-5)
    assert first is not None
    assert first[0] == f"{victim}@0", "\n".join(lines)
    fails = {ln.split()[1].rstrip(":").split("@")[0]
             for ln in lines if ln.startswith("FAIL")}
    assert fails == {victim}, fails


def test_seanet_decoder_convtr_replay():
    """ConvTranspose overlap-add carries replay too (partial-state
    taps)."""
    from moshi_tpu.nn.seanet import SEANetConfig, SEANetDecoder
    from moshi_tpu.utils.replay import seanet_ops

    cfg = SEANetConfig(dimension=32, n_filters=4, ratios=(4, 3, 2, 2))
    dec = SEANetDecoder(cfg)
    params = dec.init_params(jax.random.PRNGKey(0))
    state = dec.init_state(1)
    rng = np.random.default_rng(0)
    with recording() as rec:
        for _ in range(2):
            x = jnp.asarray(rng.normal(size=(1, 2, cfg.dimension)),
                            jnp.float32)
            _, state = dec(params, state, x, tap="dec")
    trace = {k: list(v) for k, v in rec.values.items()}
    ops = seanet_ops(dec, params, trace, "dec")
    first, lines = replay_ops(ops, tol=1e-5)
    assert first is None, "\n".join(lines)


def test_dump_graph_writes_metadata():
    """One-frame full-trace dump (the GraphDumper analog): npz of every
    tensor + JSON sidecar with execution order and caller provenance."""
    import json
    import os
    import tempfile
    params = synth_lm_params(jax.random.PRNGKey(0), _cfg, fmt="q4_k")
    rec = _record_steps(params, steps=1)
    assert rec.provenance, "capture call sites must be stamped"
    for name, src in rec.provenance.items():
        assert ".py:" in src, (name, src)
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "frame")
        rec.dump_graph(path)
        with np.load(path + ".npz") as z:
            assert len(z.files) == len(rec.order)
        with open(path + ".json") as fh:
            doc = json.load(fh)
        assert len(doc["order"]) == len(rec.order)
        k = f"{rec.order[0][0]}@0"
        assert doc["tensors"][k]["caller"].count(":") >= 1
        assert doc["tensors"][k]["shape"] is not None


def test_qt_layer_slices_components():
    from moshi_tpu.quant.formats import quantize
    rng = np.random.default_rng(0)
    qts = [quantize(jnp.asarray(rng.normal(size=(64, 256)),
                                jnp.float32), "q4_k") for _ in range(3)]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *qts)
    one = qt_layer(stacked, 1)
    np.testing.assert_array_equal(one.q, qts[1].q)
    np.testing.assert_array_equal(one.d, qts[1].d)
    assert one.shape == (64, 256)
