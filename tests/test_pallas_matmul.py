"""Pallas fused dequant+matmul kernels vs the XLA dequant oracle
(interpret mode on CPU; the same kernels run compiled on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from moshi_tpu.quant.formats import dequantize, quantize
from moshi_tpu.quant.pallas_matmul import qmatmul_pallas


@pytest.mark.parametrize("fmt", ["q8_0", "q4_0", "q4_k"])
@pytest.mark.parametrize("m", [1, 4])
def test_pallas_matches_xla_dequant(rng, fmt, m):
    k, o = 512, 512
    w = rng.normal(size=(o, k)).astype(np.float32)
    x = rng.normal(size=(m, k)).astype(np.float32)
    qt = quantize(w, fmt)
    y = np.asarray(qmatmul_pallas(jnp.asarray(x), qt, interpret=True))
    wd = np.asarray(dequantize(qt, jnp.float32))
    xb = np.asarray(jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32))
    ref = xb @ wd.T
    rel = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-6)
    assert rel < 0.02, f"{fmt} m={m}: rel {rel}"


def test_pallas_3d_input(rng):
    w = rng.normal(size=(256, 256)).astype(np.float32)
    x = rng.normal(size=(2, 3, 256)).astype(np.float32)
    qt = quantize(w, "q4_k")
    y = np.asarray(qmatmul_pallas(jnp.asarray(x), qt, interpret=True))
    assert y.shape == (2, 3, 256)


def test_pallas_nonsquare(rng):
    # gating-style shapes: O != K, O a multiple of the tile
    w = rng.normal(size=(1024, 512)).astype(np.float32)
    x = rng.normal(size=(1, 512)).astype(np.float32)
    qt = quantize(w, "q8_0")
    y = np.asarray(qmatmul_pallas(jnp.asarray(x), qt, interpret=True))
    wd = np.asarray(dequantize(qt, jnp.float32))
    ref = x @ wd.T
    np.testing.assert_allclose(y, ref, rtol=0.05, atol=0.5)


@pytest.mark.parametrize("fmt", ["q8_0", "q4_k"])
@pytest.mark.parametrize("with_norm", [False, True])
def test_glu_kernel_matches_reference(rng, fmt, with_norm):
    import jax
    from moshi_tpu.quant.pallas_matmul import glu_matmul_pallas
    k, h = 512, 512
    w = rng.normal(size=(2 * h, k)).astype(np.float32)
    x = rng.normal(size=(1, k)).astype(np.float32)
    alpha = rng.normal(size=(k,)).astype(np.float32) if with_norm else None
    qt = quantize(w, fmt)
    y = glu_matmul_pallas(jnp.asarray(x), qt,
                          alpha=None if alpha is None else jnp.asarray(alpha),
                          interpret=True)
    assert y is not None
    y = np.asarray(y)
    # reference path
    xf = x.astype(np.float32)
    if alpha is not None:
        ms = (xf ** 2).mean(-1, keepdims=True)
        xf = xf / np.sqrt(ms + 1e-8) * alpha
    xb = np.asarray(jnp.asarray(xf).astype(jnp.bfloat16).astype(jnp.float32))
    wd = np.asarray(dequantize(qt, jnp.bfloat16).astype(jnp.float32))
    full = xb @ wd.T
    g, v = full[:, :h], full[:, h:]
    ref = (g / (1 + np.exp(-g))) * v
    rel = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-6)
    assert rel < 0.03, rel


def test_norm_fused_matmul_matches(rng):
    from moshi_tpu.quant.pallas_matmul import qmatmul_pallas
    k, o = 512, 256
    w = rng.normal(size=(o, k)).astype(np.float32)
    x = rng.normal(size=(2, k)).astype(np.float32)
    alpha = rng.normal(size=(k,)).astype(np.float32)
    qt = quantize(w, "q4_k")
    y = np.asarray(qmatmul_pallas(jnp.asarray(x), qt,
                                  alpha=jnp.asarray(alpha), interpret=True))
    xf = x / np.sqrt((x ** 2).mean(-1, keepdims=True) + 1e-8) * alpha
    xb = np.asarray(jnp.asarray(xf).astype(jnp.bfloat16).astype(jnp.float32))
    wd = np.asarray(dequantize(qt, jnp.bfloat16).astype(jnp.float32))
    ref = xb @ wd.T
    rel = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-6)
    assert rel < 0.03, rel


def test_decode_attention_matches_oracle(rng):
    from moshi_tpu.nn.pallas_attention import decode_attention
    from moshi_tpu.nn.attention import streaming_attn_bias
    for cap, ctx, off in [(16, 16, 5), (16, 8, 12), (16, 16, 40),
                          (300, 250, 123)]:
        b, h, hd = 2, 4, 128
        q = rng.normal(size=(b, h, hd)).astype(np.float32)
        kc = rng.normal(size=(b, cap, h, hd)).astype(np.float32)
        vc = rng.normal(size=(b, cap, h, hd)).astype(np.float32)
        offs = np.asarray([off, max(off - 3, 0)], np.int32)
        out = np.asarray(decode_attention(
            jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
            jnp.asarray(offs), cap=cap, context=ctx, interpret=True))
        bias = np.asarray(streaming_attn_bias(jnp.asarray(offs), 1, cap, ctx))
        s = (np.einsum("bhd,bchd->bch", q, kc) / np.sqrt(hd)
             + bias[:, 0][:, :, None])
        p = np.exp(s - s.max(1, keepdims=True))
        p /= p.sum(1, keepdims=True)
        ref = np.einsum("bch,bchd->bhd", p, vc)
        # bf16 in-kernel intermediates: ~0.5% relative accuracy
        rel = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-6)
        assert rel < 0.02, (cap, ctx, off, rel)


def test_bf16_dequant_optin_numerics():
    """MOSHI_TPU_DEQUANT=bf16 (opt-in VPU arithmetic for chips with a
    bf16 ALU — this pod's v5e lacks one) must stay numerically close to
    the f32 default.  The knob is read at import, so run in a
    subprocess."""
    import subprocess
    import sys
    import os
    code = """
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from moshi_tpu.quant.formats import dequantize, quantize
from moshi_tpu.quant.pallas_matmul import _DEQ_BF16, qmatmul_pallas, \\
    glu_matmul_pallas
assert _DEQ_BF16, "env knob not honored"
rng = np.random.default_rng(0)
for fmt in ("q8_0", "q4_0", "q4_k"):
    w = rng.normal(size=(512, 512)).astype(np.float32) * 0.05
    x = rng.normal(size=(1, 512)).astype(np.float32)
    qt = quantize(w, fmt)
    y = np.asarray(qmatmul_pallas(jnp.asarray(x), qt, interpret=True))
    wd = np.asarray(dequantize(qt, jnp.float32))
    xb = np.asarray(jnp.asarray(x).astype(jnp.bfloat16)
                    .astype(jnp.float32))
    ref = xb @ wd.T
    rel = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-6)
    assert rel < 0.02, f"{fmt}: rel {rel}"
print("bf16-dequant OK")
"""
    env = dict(os.environ, MOSHI_TPU_DEQUANT="bf16",
               PYTHONPATH=os.pathsep.join(sys.path))
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=300)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "bf16-dequant OK" in out.stdout


def test_dequant_env_rejects_unknown_values():
    """Only the literal 'bf16' may enable the bf16 ALU path; any other
    value ('0', 'off', 'float32') must raise at import rather than
    silently flipping into the path that wedges this v5e's compiles
    (ADVICE r2)."""
    import subprocess
    import sys
    import os
    code = ("import jax; jax.config.update('jax_platforms', 'cpu');\n"
            "import moshi_tpu.quant.pallas_matmul\n")
    for bad in ("0", "off", "float32"):
        env = dict(os.environ, MOSHI_TPU_DEQUANT=bad,
                   PYTHONPATH=os.pathsep.join(sys.path))
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, timeout=300)
        assert out.returncode != 0, f"{bad!r} accepted"
        assert "MOSHI_TPU_DEQUANT" in out.stderr, out.stderr[-500:]
