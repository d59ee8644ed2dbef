import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moshi_tpu.quant import QuantTensor, dequantize, qmatmul, quantize
from moshi_tpu.quant.formats import dequantize_rows
from moshi_tpu.quant.policy import choose_format, quantize_tree


@pytest.mark.parametrize("fmt,rtol", [("q8_0", 0.01), ("q4_0", 0.25), ("q4_k", 0.15)])
def test_quant_roundtrip_error(rng, fmt, rtol):
    w = rng.normal(size=(64, 512)).astype(np.float32)
    qt = quantize(w, fmt)
    wd = np.asarray(dequantize(qt, jnp.float32))
    # relative reconstruction error bounded by format class
    err = np.abs(wd - w).mean() / np.abs(w).mean()
    assert err < rtol, f"{fmt}: mean rel err {err}"


def test_q8_0_block_scale_exact(rng):
    # the absmax element of each 32-block must reconstruct to within 1 lsb
    w = rng.normal(size=(4, 64)).astype(np.float32)
    qt = quantize(w, "q8_0")
    wd = np.asarray(dequantize(qt, jnp.float32))
    blocks = w.reshape(4, 2, 32)
    rec = wd.reshape(4, 2, 32)
    amax_idx = np.abs(blocks).argmax(-1)
    for o in range(4):
        for b in range(2):
            i = amax_idx[o, b]
            assert abs(rec[o, b, i] - blocks[o, b, i]) <= abs(blocks[o, b, i]) / 100


def test_q4_0_range(rng):
    w = rng.normal(size=(8, 128)).astype(np.float32)
    qt = quantize(w, "q4_0")
    q = np.asarray(qt.q)
    assert ((q & 15) <= 15).all() and ((q >> 4) <= 15).all()


def test_q4_k_fields(rng):
    w = rng.normal(size=(16, 512)).astype(np.float32)
    qt = quantize(w, "q4_k")
    assert qt.q.shape == (16, 256)
    assert qt.sc.shape == (16, 2, 8)
    assert qt.d.shape == (16, 2)
    # 6-bit scales
    assert int(np.asarray(qt.sc).max()) <= 63
    assert int(np.asarray(qt.mn).max()) <= 63


@pytest.mark.parametrize("fmt", ["q8_0", "q4_0", "q4_k"])
def test_qmatmul_matches_dequant(rng, fmt):
    w = rng.normal(size=(128, 256)).astype(np.float32)
    x = rng.normal(size=(2, 256)).astype(np.float32)
    qt = quantize(w, fmt)
    y = np.asarray(qmatmul(jnp.asarray(x), qt, out_dtype=jnp.float32))
    xb = np.asarray(jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32))
    wd = np.asarray(dequantize(qt, jnp.bfloat16).astype(jnp.float32))
    ref = xb @ wd.T
    np.testing.assert_allclose(y, ref, rtol=0.05, atol=0.3)


def test_qmatmul_plain_weight(rng):
    w = rng.normal(size=(64, 32)).astype(np.float32)
    x = rng.normal(size=(3, 32)).astype(np.float32)
    y = np.asarray(qmatmul(jnp.asarray(x), jnp.asarray(w), out_dtype=jnp.float32))
    np.testing.assert_allclose(y, x @ w.T, rtol=1e-4, atol=1e-4)


def test_dequantize_rows(rng):
    w = rng.normal(size=(100, 256)).astype(np.float32)
    qt = quantize(w, "q4_k")
    rows = jnp.asarray([[3, 7], [99, 0]])
    out = np.asarray(dequantize_rows(qt, rows, jnp.float32))
    full = np.asarray(dequantize(qt, jnp.float32))
    np.testing.assert_allclose(out, full[np.asarray(rows)], rtol=1e-3, atol=1e-3)


def test_quant_tensor_is_pytree(rng):
    qt = quantize(rng.normal(size=(32, 256)).astype(np.float32), "q4_k")
    leaves, treedef = jax.tree_util.tree_flatten(qt)
    qt2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert qt2.fmt == "q4_k" and qt2.shape == qt.shape


def test_policy_fallbacks():
    # q4_k on non-256-divisible inner dim falls back to q4_0 (loader.h:162-166)
    assert choose_format("w", (512, 320), "q4_k") == "q4_0"
    assert choose_format("w", (512, 512), "q4_k") == "q4_k"
    # non-32-divisible stays unquantized (loader.h:168-172)
    assert choose_format("w", (512, 300), "q4_0") is None
    # norms / biases / small tensors never quantize
    assert choose_format("norm.alpha", (512, 512), "q4_k") is None
    assert choose_format("w.bias", (512, 512), "q8_0") is None
    assert choose_format("w", (8, 512), "q8_0") is None


def test_quantize_tree(rng):
    params = {
        "linear": {"weight": rng.normal(size=(512, 512)).astype(np.float32),
                   "bias": rng.normal(size=(512,)).astype(np.float32)},
        "norm": {"alpha": rng.normal(size=(512,)).astype(np.float32)},
    }
    qp = quantize_tree(params, "q8_0")
    assert isinstance(qp["linear"]["weight"], QuantTensor)
    assert not isinstance(qp["linear"]["bias"], QuantTensor)
    assert not isinstance(qp["norm"]["alpha"], QuantTensor)


@pytest.mark.parametrize("fmt,min_snr_db", [("q8_0", 38.0), ("q4_k", 16.0),
                                            ("q4_0", 12.0)])
def test_quantization_snr(rng, fmt, min_snr_db):
    # reconstruction SNR must stay in the format's class (the BASELINE
    # accuracy criterion: within the q4_k/q8_0 deltas at the bit-width)
    w = rng.normal(size=(256, 1024)).astype(np.float32)
    qt = quantize(w, fmt)
    rec = np.asarray(dequantize(qt, jnp.float32))
    snr = 10 * np.log10((w ** 2).mean() / ((w - rec) ** 2).mean())
    assert snr > min_snr_db, f"{fmt}: SNR {snr:.1f} dB"


def test_native_matches_numpy_quantizer(rng):
    from moshi_tpu.native_quant import available, quantize_native
    if not available():
        pytest.skip("native lib not built")
    w = rng.normal(size=(64, 512)).astype(np.float32)
    for fmt in ("q8_0", "q4_0", "q4_k"):
        qn = quantize(w, fmt, native=True)
        qp = quantize(w, fmt, native=False)
        a = np.asarray(dequantize(qn, jnp.float32))
        b = np.asarray(dequantize(qp, jnp.float32))
        # same algorithm, different rounding paths -> near-identical
        denom = np.abs(w).mean()
        assert np.abs(a - b).mean() / denom < 0.02, fmt
        # exact packing layout agreement on the quantized ints
        if fmt != "q4_k":
            np.testing.assert_array_equal(np.asarray(qn.q), np.asarray(qp.q))
