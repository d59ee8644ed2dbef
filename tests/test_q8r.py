"""q8_r: TPU-native w8a8 fast path (per-row weight scales, per-token
activation quant, raw int8 MXU contraction in plain XLA).  Not a GGML
format — accuracy class is per-channel w8a8; these tests pin the error
envelope and the exactness of TP slicing."""

import numpy as np

import jax
import jax.numpy as jnp

from moshi_tpu.quant.formats import (QuantTensor, dequantize,
                                     dequantize_rows, qmatmul, qt_slice_cols,
                                     qt_take_rows, quantize)


def _w(o=256, i=512, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(o, i)) * 0.02).astype(np.float32)


def test_q8r_roundtrip_error():
    w = _w()
    qt = quantize(w, "q8_r")
    assert qt.fmt == "q8_r" and qt.q.dtype == jnp.int8
    assert qt.q.shape == w.shape and qt.d.shape == (w.shape[0], 1)
    wd = np.asarray(dequantize(qt, jnp.float32))
    rel = np.abs(wd - w).max() / np.abs(w).max()
    assert rel < 0.01, rel          # 8-bit per-row: <1% of row max


def test_q8r_qmatmul_matches_f32():
    w = _w()
    qt = quantize(w, "q8_r")
    rng = np.random.default_rng(1)
    x = (rng.normal(size=(3, 512)) * 0.5).astype(np.float32)
    y = np.asarray(qmatmul(jnp.asarray(x), qt))
    ref = x @ w.T
    rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel          # w8a8 class
    # 3-D activations broadcast the same way
    y3 = np.asarray(qmatmul(jnp.asarray(x[None]), qt))
    np.testing.assert_allclose(y3[0], y, rtol=1e-5, atol=1e-5)


def test_q8r_qmatmul_int8_dot_is_used():
    """The lowered HLO must contract int8 (no dequantized bf16 weight
    matmul hiding inside)."""
    w = _w(256, 256)
    qt = quantize(w, "q8_r")
    x = jnp.ones((1, 256), jnp.float32)
    txt = jax.jit(lambda a, b: qmatmul(a, b)).lower(x, qt).as_text()
    assert "i8" in txt, "int8 operands not present in lowered HLO"
    assert "dot" in txt


def test_q8r_pre_norm_fusion():
    from moshi_tpu.quant.formats import _rms_pre_norm
    w = _w()
    qt = quantize(w, "q8_r")
    rng = np.random.default_rng(2)
    x = (rng.normal(size=(2, 512))).astype(np.float32)
    alpha = (1 + rng.normal(size=(512,)) * 0.1).astype(np.float32)
    y = np.asarray(qmatmul(jnp.asarray(x), qt,
                           pre_norm_alpha=jnp.asarray(alpha)))
    xr = np.asarray(_rms_pre_norm(jnp.asarray(x), jnp.asarray(alpha)))
    ref = xr @ np.asarray(dequantize(qt, jnp.float32)).T
    rel = np.linalg.norm(y - ref) / np.linalg.norm(ref)
    assert rel < 0.02, rel


def test_q8r_row_col_slicing_exact():
    w = _w(128, 256)
    qt = quantize(w, "q8_r")
    full = np.asarray(dequantize(qt, jnp.float32))
    rows = np.asarray(dequantize(qt_take_rows(qt, np.arange(32, 64)),
                                 jnp.float32))
    np.testing.assert_array_equal(rows, full[32:64])
    # per-row scales: ANY column slice is exact, even non-block-aligned
    cols = np.asarray(dequantize(qt_slice_cols(qt, 40, 200), jnp.float32))
    np.testing.assert_array_equal(cols, full[:, 40:200])


def test_q8r_embedding_rows():
    w = _w(64, 128)
    qt = quantize(w, "q8_r")
    idx = jnp.asarray([[0, 5], [63, 1]])
    out = np.asarray(dequantize_rows(qt, idx, jnp.float32))
    full = np.asarray(dequantize(qt, jnp.float32))
    np.testing.assert_array_equal(out, full[np.asarray(idx)])


def test_q8r_policy_no_block_constraint():
    from moshi_tpu.quant.policy import choose_format
    # inner dim 300 is not a 32-multiple: q8_0 would bail, q8_r never does
    assert choose_format("transformer.w", (512, 300), "q8_0") is None
    assert choose_format("transformer.w", (512, 300), "q8_r") == "q8_r"


def test_q8r_lm_step_runs():
    """Full LM step with a q8_r tree (the GSPMD scan path — q8_r never
    dispatches to pallas)."""
    from moshi_tpu.models.lm import LMConfig, init_gen_state, lm_gen_step
    from moshi_tpu.runtime.synth import synth_lm_params
    cfg = LMConfig(dim=64, num_heads=4, num_layers=2, hidden_dim=128,
                   context=32, card=64, n_q=4, dep_q=2, text_card=128,
                   delays=(0, 0, 1, 1, 2), depformer_dim=64,
                   depformer_heads=4, depformer_layers=2,
                   depformer_hidden=128, depformer_low_rank=16)
    params = synth_lm_params(jax.random.PRNGKey(0), cfg, fmt="q8_r")
    state = init_gen_state(cfg, 1, params=params)
    other = jnp.zeros((1, cfg.n_q - cfg.dep_q), jnp.int32)
    step = jax.jit(lambda p, s, o: lm_gen_step(cfg, p, s, other_audio=o))
    out, state = step(params, state, other)
    assert np.asarray(out["audio"]).shape == (1, 2)
    assert np.isfinite(np.asarray(out["text"])).all()


def test_q8r_lm_divergence_vs_float_with_outliers():
    """End-to-end error class on a real step chain (advisor r3): per-token
    symmetric int8 activation quant is outlier-sensitive, so compare the
    q8_r LM against the float LM over several steps with activation
    outliers injected through an outlier-heavy embedding table, and pin
    the logits error + greedy-token agreement."""
    from moshi_tpu.models.lm import LMConfig, init_gen_state, lm_text_step
    from moshi_tpu.quant.policy import quantize_tree
    from moshi_tpu.runtime.synth import synth_lm_params

    cfg = LMConfig(dim=256, num_heads=4, num_layers=2, hidden_dim=512,
                   context=64, card=256, n_q=4, dep_q=2, text_card=512,
                   delays=(0, 0, 1, 1, 2), depformer_dim=256,
                   depformer_heads=4, depformer_layers=1,
                   depformer_hidden=256, depformer_low_rank=16)
    params = synth_lm_params(jax.random.PRNGKey(0), cfg, fmt=None)

    # inject outliers: a few embedding channels 50x larger than the rest
    # (the classic transformer activation-outlier pattern) so every
    # per-token activation quant must absorb a wide dynamic range
    rng = np.random.default_rng(3)
    emb = np.asarray(params["text_emb"]["weight"], np.float32)
    hot = rng.choice(emb.shape[1], size=4, replace=False)
    emb[:, hot] *= 50.0
    params = dict(params)
    params["text_emb"] = dict(params["text_emb"])
    params["text_emb"]["weight"] = jnp.asarray(emb)

    qparams = quantize_tree(params, "q8_r")

    def run(p, forced=None):
        """forced=None: free-running greedy.  forced=list: teacher-forced
        token stream (isolates per-step quant error from autoregressive
        trajectory divergence, which amplifies any perturbation)."""
        state = init_gen_state(cfg, 1, jax.random.PRNGKey(7))
        logits_seq, toks = [], []
        from moshi_tpu.models.lm import (build_input_frame,
                                         temporal_forward, write_generated)
        for step in range(6):
            tokens = build_input_frame(cfg, state["cache"], state["offset"])
            h, logits, kv = temporal_forward(cfg, p, state["transformer"],
                                             tokens, state["offset"])
            tok = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            toks.append(int(tok[0]))
            if forced is not None:
                tok = jnp.asarray([forced[step]], jnp.int32)
            cache = write_generated(cfg, state["cache"],
                                    state["offset"] + 1, tok,
                                    jnp.zeros((1, cfg.dep_q), jnp.int32))
            state = {"transformer": kv, "cache": cache,
                     "offset": state["offset"] + 1, "rng": state["rng"]}
            logits_seq.append(np.asarray(logits[:, -1], np.float32))
        return logits_seq, toks

    ref_logits, ref_toks = run(params)
    q_logits, q_toks = run(qparams, forced=ref_toks)

    rels = [np.linalg.norm(q - r) / max(np.linalg.norm(r), 1e-9)
            for q, r in zip(q_logits, ref_logits)]
    # teacher-forced per-step error: w8a8 with outlier-stressed
    # activations stays in the few-percent class; a broken quant path
    # is 10-100x worse
    assert max(rels) < 0.15, rels
    # greedy decisions from those logits must agree on most steps
    # (ties near the argmax may flip one)
    agree = sum(a == b for a, b in zip(ref_toks, q_toks))
    assert agree >= len(ref_toks) - 1, (ref_toks, q_toks)


def test_serving_format_policy():
    from moshi_tpu.quant.policy import serving_format
    # single chip: q4_k pallas wins at every batch (q8_r 2x weight
    # bytes loses at B=1 and OOMs batched full-STS — BENCH_NOTES r4)
    assert serving_format("q4_k", batch=1) == "q4_k"
    assert serving_format("q4_k", batch=4) == "q4_k"
    # GSPMD model sharding: pallas calls cannot partition -> q8_r
    assert serving_format("q4_k", model_sharded=True) == "q8_r"
    assert serving_format("q8_r", batch=1) == "q8_r"
    assert serving_format("none", batch=8) == "none"
