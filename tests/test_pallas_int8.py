"""Integer-MXU decode kernels (quant/pallas_matmul_int8.py) vs oracles.

The int8 kernels quantize the ACTIVATION to int8 per 32-block in-kernel
and contract raw integers on the MXU (GGML's vec_dot_q4_K_q8_1 numeric
class — the reference GPU path quantizes activations to q8_1 for every
K-quant matvec).  Interpret mode on CPU for numerics; TPU cross-lowering
for the Mosaic block rules interpret mode skips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moshi_tpu.quant import pallas_matmul as pm
from moshi_tpu.utils.pallas_mode import pallas_interpret
from moshi_tpu.quant.formats import QK, dequantize, quantize
from moshi_tpu.quant.pallas_matmul_int8 import (glu_matmul_i8,
                                                int8_shape_ok, qmatmul_i8)

K, O = 512, 512
NB = K // QK


def _sim_act_quant(x):
    """Per-32-block int8 activation quantization (numpy oracle)."""
    xb = x.reshape(-1, x.shape[-1] // QK, QK)
    m = np.abs(xb).max(-1, keepdims=True)
    dx = np.where(m > 0, m / 127.0, 1.0)
    xq = np.round(xb / dx)
    return (xq * dx).reshape(x.shape)


@pytest.mark.parametrize("fmt", ["q8_0", "q4_0", "q4_k"])
@pytest.mark.parametrize("storage", ["packed", "unpacked"])
def test_int8_matches_dequant_oracle(rng, fmt, storage):
    w = rng.normal(size=(O, K)).astype(np.float32)
    x = rng.normal(size=(1, K)).astype(np.float32)
    qt = quantize(w, fmt)
    if storage == "unpacked":
        qt = qt.with_i8_storage()
    assert int8_shape_ok(qt, 1)
    y = np.asarray(qmatmul_i8(jnp.asarray(x), qt, interpret=True))
    wd = np.asarray(dequantize(qt, jnp.float32))
    ref = _sim_act_quant(x) @ wd.T
    rel = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-6)
    # the only kernel-vs-oracle residual is f32 epilogue rounding; the
    # activation-quant noise itself is IN the oracle
    assert rel < 5e-3, f"{fmt}/{storage}: rel {rel}"


@pytest.mark.parametrize("fmt", ["q4_0", "q4_k"])
def test_int8_packed_unpacked_agree(rng, fmt):
    """Packed u8 (in-kernel nibble unpack + zero-point epilogue) and
    unpacked i8 (zero point folded at rest) are the same computation."""
    w = rng.normal(size=(O, K)).astype(np.float32)
    x = rng.normal(size=(1, K)).astype(np.float32)
    qt = quantize(w, fmt)
    yp = np.asarray(qmatmul_i8(jnp.asarray(x), qt, interpret=True))
    yu = np.asarray(qmatmul_i8(jnp.asarray(x), qt.with_i8_storage(),
                               interpret=True))
    np.testing.assert_allclose(yp, yu, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("fmt", ["q8_0", "q4_k"])
@pytest.mark.parametrize("with_norm", [False, True])
def test_int8_glu_matches(rng, fmt, with_norm):
    h = 512
    w = rng.normal(size=(2 * h, K)).astype(np.float32)
    x = rng.normal(size=(1, K)).astype(np.float32)
    alpha = rng.normal(size=(K,)).astype(np.float32) if with_norm else None
    qt = quantize(w, fmt)
    y = np.asarray(glu_matmul_i8(
        jnp.asarray(x), qt,
        alpha=None if alpha is None else jnp.asarray(alpha),
        interpret=True))
    xf = x.astype(np.float32)
    if alpha is not None:
        ms = (xf ** 2).mean(-1, keepdims=True)
        xf = xf / np.sqrt(ms + 1e-8) * alpha
    wd = np.asarray(dequantize(qt, jnp.float32))
    full = _sim_act_quant(xf) @ wd.T
    g, v = full[:, :h], full[:, h:]
    ref = (g / (1 + np.exp(-g))) * v
    rel = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-6)
    assert rel < 0.01, f"{fmt} norm={with_norm}: rel {rel}"


@pytest.mark.parametrize("storage", ["packed", "unpacked"])
def test_int8_stacked_layer_indexing(rng, storage):
    ws = [rng.normal(size=(O, K)).astype(np.float32) for _ in range(3)]
    qts = [quantize(w, "q4_k") for w in ws]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *qts)
    if storage == "unpacked":
        stacked = stacked.with_i8_storage()
        qts = [q.with_i8_storage() for q in qts]
    x = rng.normal(size=(1, K)).astype(np.float32)
    for l in range(3):
        ys = np.asarray(qmatmul_i8(jnp.asarray(x), stacked,
                                   layer=jnp.int32(l), interpret=True))
        yf = np.asarray(qmatmul_i8(jnp.asarray(x), qts[l], interpret=True))
        np.testing.assert_allclose(ys, yf, rtol=1e-5, atol=1e-5)


def test_int8_dispatch_routing(rng):
    """qmatmul_pallas routes eligible m==1 calls into the int8 kernels;
    set_int8(False) restores the f32-dequant path; m>1 never routes."""
    w = rng.normal(size=(O, K)).astype(np.float32)
    x1 = rng.normal(size=(1, K)).astype(np.float32)
    qt = quantize(w, "q4_k")
    y_i8 = np.asarray(qmatmul_i8(jnp.asarray(x1), qt, interpret=True))
    prev = pm.int8_enabled()
    try:
        pm.set_int8(True)
        y_on = np.asarray(pm.qmatmul_pallas(jnp.asarray(x1), qt,
                                            interpret=True))
        np.testing.assert_array_equal(y_on, y_i8)
        pm.set_int8(False)
        jax.clear_caches()  # the knob is trace-time; drop cached traces
        y_off = np.asarray(pm.qmatmul_pallas(jnp.asarray(x1), qt,
                                             interpret=True))
        assert not np.array_equal(y_off, y_i8)
        # both are valid evaluations of the same quantized matmul
        rel = np.abs(y_off - y_i8).max() / (np.abs(y_i8).max() + 1e-6)
        assert rel < 0.02, rel
    finally:
        pm.set_int8(prev)


def test_int8_shape_gates(rng):
    qt = quantize(rng.normal(size=(O, K)).astype(np.float32), "q4_k")
    assert int8_shape_ok(qt, 1)
    assert int8_shape_ok(qt, 4)              # batched decode (round 5)
    assert int8_shape_ok(qt, 8)
    assert not int8_shape_ok(qt, 9)          # spread scratch cap
    big = quantize(rng.normal(size=(64, 11264)).astype(np.float32) * 0.05,
                   "q4_k")
    assert int8_shape_ok(big, 4)             # 7B linear_out: m <= 4
    assert not int8_shape_ok(big, 8)


@pytest.mark.parametrize("fmt", ["q8_0", "q4_0", "q4_k"])
@pytest.mark.parametrize("m", [2, 3, 8])
def test_int8_batched_rows_match_oracle(rng, fmt, m):
    """m <= 8 activation rows batch into ONE kernel (stacked per-row
    block-diagonal spreads); each row must equal its single-row run."""
    w = rng.normal(size=(O, K)).astype(np.float32)
    x = rng.normal(size=(m, K)).astype(np.float32)
    qt = quantize(w, fmt)
    assert int8_shape_ok(qt, m)
    y = np.asarray(qmatmul_i8(jnp.asarray(x), qt, interpret=True))
    assert y.shape == (m, O)
    for r in range(m):
        y1 = np.asarray(qmatmul_i8(jnp.asarray(x[r: r + 1]), qt,
                                   interpret=True))
        np.testing.assert_allclose(y[r: r + 1], y1, rtol=1e-5, atol=1e-5)


def test_int8_batched_glu_matches(rng):
    h, m = 512, 4
    w = rng.normal(size=(2 * h, K)).astype(np.float32)
    x = rng.normal(size=(m, K)).astype(np.float32)
    alpha = rng.uniform(0.5, 1.5, (K,)).astype(np.float32)
    qt = quantize(w, "q4_k")
    y = np.asarray(glu_matmul_i8(jnp.asarray(x), qt,
                                 alpha=jnp.asarray(alpha),
                                 interpret=True))
    assert y.shape == (m, h)
    for r in range(m):
        y1 = np.asarray(glu_matmul_i8(jnp.asarray(x[r: r + 1]), qt,
                                      alpha=jnp.asarray(alpha),
                                      interpret=True))
        np.testing.assert_allclose(y[r: r + 1], y1, rtol=1e-5, atol=1e-5)


def test_split_spread_matches_standard(rng, monkeypatch):
    """MOSHI_TPU_SPLIT_SPREAD=1 (pair-order grouped spread): identical
    results to the standard kernel — same activation quantization, same
    epilogue, only the spread layout and dot grouping change.  K=9216
    (nb=288 > 128, half_nb=144) exercises a partial last group."""
    from moshi_tpu.quant.pallas_matmul_int8 import _split_ok
    k, o = 9216, 256
    w = rng.normal(size=(o, k)).astype(np.float32) * 0.05
    x = rng.normal(size=(1, k)).astype(np.float32)
    alpha = rng.uniform(0.5, 1.5, (k,)).astype(np.float32)
    qt = quantize(w, "q4_k")
    assert _split_ok(qt, 1, False)
    y_std = np.asarray(qmatmul_i8(jnp.asarray(x), qt, interpret=True))
    yn_std = np.asarray(qmatmul_i8(jnp.asarray(x), qt,
                                   alpha=jnp.asarray(alpha),
                                   interpret=True))
    monkeypatch.setenv("MOSHI_TPU_SPLIT_SPREAD", "1")
    jax.clear_caches()
    try:
        y_sp = np.asarray(qmatmul_i8(jnp.asarray(x), qt, interpret=True))
        yn_sp = np.asarray(qmatmul_i8(jnp.asarray(x), qt,
                                      alpha=jnp.asarray(alpha),
                                      interpret=True))
    finally:
        monkeypatch.delenv("MOSHI_TPU_SPLIT_SPREAD", raising=False)
        jax.clear_caches()
    np.testing.assert_allclose(y_sp, y_std, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(yn_sp, yn_std, rtol=1e-5, atol=1e-5)


def test_split_spread_stacked_and_lowers(rng, monkeypatch):
    """Stacked layer indexing under the split kernel + TPU cross-lower
    (the alignment rules are the whole point)."""
    k, o = 9216, 256
    ws = [rng.normal(size=(o, k)).astype(np.float32) * 0.05
          for _ in range(2)]
    qts = [quantize(w, "q4_k") for w in ws]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *qts)
    x = rng.normal(size=(1, k)).astype(np.float32)
    monkeypatch.setenv("MOSHI_TPU_SPLIT_SPREAD", "1")
    jax.clear_caches()
    try:
        for l in range(2):
            ys = np.asarray(qmatmul_i8(jnp.asarray(x), stacked,
                                       layer=jnp.int32(l), interpret=True))
            yf = np.asarray(qmatmul_i8(jnp.asarray(x), qts[l],
                                       interpret=True))
            np.testing.assert_allclose(ys, yf, rtol=1e-5, atol=1e-5)

        def f(xx):
            return qmatmul_i8(xx, stacked, layer=jnp.int32(1))

        jax.jit(f).trace(jnp.zeros((1, k), jnp.float32)).lower(
            lowering_platforms=("tpu",))
    finally:
        monkeypatch.delenv("MOSHI_TPU_SPLIT_SPREAD", raising=False)
        jax.clear_caches()


@pytest.mark.parametrize("k", [5120, 8192])
@pytest.mark.parametrize("with_norm", [False, True])
def test_kseg_matches_standard(rng, monkeypatch, k, with_norm):
    """MOSHI_TPU_KSEG=1 (k-segment reduction grid): identical products
    to the standard kernel — same per-32 activation quantization, same
    epilogue terms, only the dot grouping and summation order change.
    k=5120 (nb=160, nsegs=2 with a 1-chunk last segment) exercises the
    masked tail; k=8192 (nb=256) is the exact-2-segment case."""
    from moshi_tpu.quant.pallas_matmul_int8 import _kseg_ok
    o = 256
    w = rng.normal(size=(o, k)).astype(np.float32) * 0.05
    x = rng.normal(size=(1, k)).astype(np.float32)
    alpha = (rng.uniform(0.5, 1.5, (k,)).astype(np.float32)
             if with_norm else None)
    qt = quantize(w, "q4_k")
    assert _kseg_ok(qt, 1, False)
    aj = None if alpha is None else jnp.asarray(alpha)
    y_std = np.asarray(qmatmul_i8(jnp.asarray(x), qt, alpha=aj,
                                  interpret=True))
    monkeypatch.setenv("MOSHI_TPU_KSEG", "1")
    jax.clear_caches()
    try:
        y_ks = np.asarray(qmatmul_i8(jnp.asarray(x), qt, alpha=aj,
                                     interpret=True))
    finally:
        monkeypatch.delenv("MOSHI_TPU_KSEG", raising=False)
        jax.clear_caches()
    np.testing.assert_allclose(y_ks, y_std, rtol=1e-5, atol=1e-5)


def test_kseg_stacked_and_lowers(rng, monkeypatch):
    """Stacked layer indexing under the kseg grid + TPU cross-lower at
    the 7B linear_out shape class (K=11264, nb=352, nsegs=3 with a
    3-chunk last segment)."""
    from moshi_tpu.quant.pallas_matmul_int8 import _kseg_ok
    k, o = 11264, 256
    ws = [rng.normal(size=(o, k)).astype(np.float32) * 0.05
          for _ in range(2)]
    qts = [quantize(w, "q4_k") for w in ws]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *qts)
    x = rng.normal(size=(1, k)).astype(np.float32)
    monkeypatch.setenv("MOSHI_TPU_KSEG", "1")
    jax.clear_caches()
    try:
        assert _kseg_ok(qts[0], 1, False)
        for l in range(2):
            ys = np.asarray(qmatmul_i8(jnp.asarray(x), stacked,
                                       layer=jnp.int32(l), interpret=True))
            yf = np.asarray(qmatmul_i8(jnp.asarray(x), qts[l],
                                       interpret=True))
            np.testing.assert_allclose(ys, yf, rtol=1e-5, atol=1e-5)

        def f(xx):
            return qmatmul_i8(xx, stacked, layer=jnp.int32(1))

        jax.jit(f).trace(jnp.zeros((1, k), jnp.float32)).lower(
            lowering_platforms=("tpu",))
    finally:
        monkeypatch.delenv("MOSHI_TPU_KSEG", raising=False)
        jax.clear_caches()


def test_kseg_ineligible_shapes(rng):
    """nb <= 128 (already one MXU lane tile) and non-512-multiple packed
    columns stay on the standard kernel."""
    from moshi_tpu.quant.pallas_matmul_int8 import _kseg_ok
    qt = quantize(rng.normal(size=(O, 4096)).astype(np.float32), "q4_k")
    assert not _kseg_ok(qt, 1, False)        # nb = 128
    qt2 = quantize(rng.normal(size=(O, 8448)).astype(np.float32), "q4_k")
    assert not _kseg_ok(qt2, 1, False)       # k2 % 512 != 0
    qt3 = quantize(rng.normal(size=(O, 11264)).astype(np.float32), "q4_k")
    assert not _kseg_ok(qt3, 2, False)       # m == 1 only
    assert _kseg_ok(qt3, 1, False)


def test_int8_batched_lowers_for_tpu(rng):
    qt = quantize(rng.normal(size=(O, K)).astype(np.float32), "q4_k")
    x = jnp.zeros((4, K), jnp.float32)

    def f(xx):
        return qmatmul_i8(xx, qt)

    jax.jit(f).trace(x).lower(lowering_platforms=("tpu",))


@pytest.mark.parametrize("fmt", ["q8_0", "q4_0"])
def test_int8_nonaligned_block_count(rng, fmt):
    """k=4224 (the 7B depformer FFN hidden) has nb=132, not a sublane
    multiple — the kernel pads blocks to nb_pad=136 with zero scales."""
    k = 4224
    w = rng.normal(size=(256, k)).astype(np.float32)
    x = rng.normal(size=(1, k)).astype(np.float32)
    qt = quantize(w, fmt)
    # not auto-dispatched (the per-call scale pad is too costly inside
    # layer scans — see int8_shape_ok), but direct calls support it
    assert not int8_shape_ok(qt, 1)
    y = np.asarray(qmatmul_i8(jnp.asarray(x), qt, interpret=True))
    wd = np.asarray(dequantize(qt, jnp.float32))
    ref = _sim_act_quant(x) @ wd.T
    rel = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-6)
    assert rel < 5e-3, f"{fmt}: rel {rel}"


def test_f32_kernels_reject_i8_storage(rng):
    """Unpacked i8 storage reaching the f32-dequant kernels (m>1 path)
    must fail loudly instead of misreading the buffer."""
    qt = quantize(rng.normal(size=(O, K)).astype(np.float32),
                  "q4_k").with_i8_storage()
    x4 = jnp.asarray(rng.normal(size=(4, K)).astype(np.float32))
    with pytest.raises(ValueError, match="unpacked i8 storage"):
        pm.qmatmul_pallas(x4, qt, interpret=True)


def test_dequantize_i8_storage_matches_packed(rng):
    for fmt in ("q4_0", "q4_k"):
        qt = quantize(rng.normal(size=(O, K)).astype(np.float32), fmt)
        a = np.asarray(dequantize(qt, jnp.float32))
        b = np.asarray(dequantize(qt.with_i8_storage(), jnp.float32))
        np.testing.assert_array_equal(a, b)


def test_i8_storage_batched_falls_back_to_xla(rng):
    """m>1 calls on i8-storage weights must take the XLA dequant path
    (qmatmul guard / glu None-fallback), not raise."""
    from moshi_tpu.nn.gating import gating_mlp
    from moshi_tpu.quant.formats import enable_pallas, qmatmul
    qt = quantize(rng.normal(size=(O, K)).astype(np.float32),
                  "q4_k").with_i8_storage()
    x4 = jnp.asarray(rng.normal(size=(4, K)).astype(np.float32))
    enable_pallas(True)
    try:
        y = np.asarray(qmatmul(x4, qt))
        ref = np.asarray(x4.astype(jnp.bfloat16) @ dequantize(
            qt, jnp.bfloat16).T.astype(jnp.bfloat16),
            np.float32)
        rel = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-6)
        assert rel < 0.02, rel
        glu = {"linear_in": {"weight": quantize(
            rng.normal(size=(2 * O, K)).astype(np.float32),
            "q4_k").with_i8_storage()},
            "linear_out": {"weight": rng.normal(size=(K, O)).astype(
                np.float32)}}
        out = gating_mlp(glu, x4)          # must not raise
        assert out.shape == (4, K)
    finally:
        enable_pallas(False)


def test_i8_storage_tree_skips_embeddings(rng):
    from moshi_tpu.quant.formats import i8_storage_tree
    tree = {
        "text_emb": {"weight": quantize(
            rng.normal(size=(O, K)).astype(np.float32), "q4_k")},
        "attn": {"weight": quantize(
            rng.normal(size=(O, K)).astype(np.float32), "q4_k")},
    }
    out = i8_storage_tree(tree)
    assert out["text_emb"]["weight"].q.dtype == jnp.uint8   # untouched
    assert out["attn"]["weight"].q.dtype == jnp.int8


def test_i8_storage_lm_step_matches_packed():
    """Full LM generation step with i8-storage params ≡ packed params
    (both through the int8-MXU kernels; integer dots are exact)."""
    from jax.experimental.pallas import tpu as pltpu
    from moshi_tpu.models.lm import LMConfig, init_gen_state, lm_gen_step
    from moshi_tpu.quant.formats import enable_pallas, i8_storage_tree
    from moshi_tpu.runtime.synth import synth_lm_params
    cfg = LMConfig(
        dim=256, num_heads=4, num_layers=2, hidden_dim=256, context=32,
        card=256, n_q=4, dep_q=2, text_card=512, delays=(0, 0, 1, 1, 2),
        depformer_dim=256, depformer_heads=4, depformer_layers=1,
        depformer_hidden=256, depformer_low_rank=16)
    params = synth_lm_params(jax.random.PRNGKey(0), cfg, fmt="q4_k")
    params_i8 = i8_storage_tree(params)

    def run(p):
        enable_pallas(True)
        try:
            state = init_gen_state(cfg, 1, jax.random.PRNGKey(5))
            outs = []
            for _ in range(3):
                with pallas_interpret():
                    out, state = lm_gen_step(cfg, p, state, temp=0.0,
                                             temp_text=0.0)
                outs.append((np.asarray(out["sampled_text"]),
                             np.asarray(out["audio"])))
            return outs
        finally:
            enable_pallas(False)

    ref = run(params)
    got = run(params_i8)
    for f in range(3):
        np.testing.assert_array_equal(got[f][0], ref[f][0])
        np.testing.assert_array_equal(got[f][1], ref[f][1])


def test_int8_nonaligned_tpu_cross_lowering(rng):
    """nb_pad lane-padding (k=4224 -> 136 scale lanes) must survive the
    Mosaic block rules."""
    k = 4224
    qt = quantize(rng.normal(size=(1024, k)).astype(np.float32) * 0.02,
                  "q8_0")
    x = jnp.zeros((1, k), jnp.float32)
    f = jax.jit(lambda x, q: qmatmul_i8(x, q, interpret=False))
    f.trace(x, qt).lower(lowering_platforms=("tpu",))


@pytest.mark.parametrize("storage", ["packed", "unpacked"])
def test_int8_tpu_cross_lowering(rng, storage):
    """Mosaic lowering rules (interpret mode skips them) for the plain,
    fused-norm, and GLU int8 kernels at the real 7B shapes."""
    k, o = 4096, 4096
    qt = quantize(rng.normal(size=(o, k)).astype(np.float32) * 0.02,
                  "q4_k")
    if storage == "unpacked":
        qt = qt.with_i8_storage()
    x = jnp.zeros((1, k), jnp.float32)
    alpha = jnp.ones((k,), jnp.float32)

    f = jax.jit(lambda x, q: qmatmul_i8(x, q, interpret=False))
    f.trace(x, qt).lower(lowering_platforms=("tpu",))
    g = jax.jit(lambda x, q, a: qmatmul_i8(x, q, alpha=a, interpret=False))
    g.trace(x, qt, alpha).lower(lowering_platforms=("tpu",))

    qt2 = quantize(rng.normal(size=(2 * o, k)).astype(np.float32) * 0.02,
                   "q4_k")
    if storage == "unpacked":
        qt2 = qt2.with_i8_storage()
    h = jax.jit(lambda x, q, a: glu_matmul_i8(x, q, alpha=a,
                                              interpret=False))
    h.trace(x, qt2, alpha).lower(lowering_platforms=("tpu",))
