"""MXU decode-attention kernel vs the VPU kernel and a numpy oracle.

The MXU variant (nn/pallas_attention.py _decode_attn_kernel_stacked_mxu)
streams KV through bf16 MXU contractions via a block-diagonal q spread;
the VPU variant broadcasts+reduces per element.  Both implement the
identical online-softmax ring semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moshi_tpu.nn.pallas_attention import decode_attention_stacked


def _oracle(q, ks, vs, ck, cv, offsets, layer, cap, context):
    """Numpy reference: ring slots + current token, softmax over the
    window (positions in (offset-context, offset])."""
    b, h, hd = q.shape
    out = np.zeros((b, h, hd), np.float32)
    for bi in range(b):
        off = int(offsets[bi])
        scores = [np.einsum("hd,hd->h", q[bi], ck[bi]) / np.sqrt(hd)]
        vals = [cv[bi]]
        for j in range(cap):
            last = off - 1
            delta = (last - j) % cap
            p = last - delta
            if p < 0 or delta >= context - 1:
                continue
            scores.append(np.einsum("hd,hd->h", q[bi],
                                    ks[layer, bi, j]) / np.sqrt(hd))
            vals.append(vs[layer, bi, j])
        s = np.stack(scores)                      # [n, h]
        p = np.exp(s - s.max(0))
        p /= p.sum(0)
        out[bi] = np.einsum("nh,nhd->hd", p, np.stack(vals))
    return out


def _run(q, ks, vs, ck, cv, off, layer, cap, context, mxu, monkeypatch):
    monkeypatch.setenv("MOSHI_TPU_ATTN_MXU", "1" if mxu else "0")
    jax.clear_caches()  # the knob is trace-time
    return np.asarray(decode_attention_stacked(
        jnp.asarray(q), jnp.asarray(ks), jnp.asarray(vs),
        jnp.asarray(ck), jnp.asarray(cv),
        jnp.asarray(off, jnp.int32), jnp.int32(layer),
        cap=cap, context=context, interpret=True))


@pytest.mark.parametrize("cap,ctx,off", [(16, 16, 5), (16, 8, 12),
                                         (16, 16, 40), (240, 200, 123)])
def test_mxu_matches_vpu_and_oracle(rng, monkeypatch, cap, ctx, off):
    b, L, h, hd = 2, 3, 4, 128
    q = rng.normal(size=(b, h, hd)).astype(np.float32)
    ks = rng.normal(size=(L, b, cap, h, hd)).astype(np.float32)
    vs = rng.normal(size=(L, b, cap, h, hd)).astype(np.float32)
    ck = rng.normal(size=(b, h, hd)).astype(np.float32)
    cv = rng.normal(size=(b, h, hd)).astype(np.float32)
    offs = np.asarray([off, max(off - 3, 1)], np.int32)
    ksb = jnp.asarray(ks, jnp.bfloat16)
    vsb = jnp.asarray(vs, jnp.bfloat16)
    for layer in (0, L - 1):
        y_vpu = _run(q, ksb, vsb, ck, cv, offs, layer, cap, ctx, False,
                     monkeypatch)
        y_mxu = _run(q, ksb, vsb, ck, cv, offs, layer, cap, ctx, True,
                     monkeypatch)
        ref = _oracle(q, np.asarray(ksb, np.float32),
                      np.asarray(vsb, np.float32), ck, cv, offs, layer,
                      cap, ctx)
        for tag, y in (("vpu", y_vpu), ("mxu", y_mxu)):
            rel = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-6)
            assert rel < 0.02, (tag, layer, rel)
        rel = np.abs(y_mxu - y_vpu).max() / (np.abs(y_vpu).max() + 1e-6)
        assert rel < 0.02, (layer, rel)


def test_mxu_depformer_shape(rng, monkeypatch):
    """dep ring: H=16, hd=64 (H*hd=1024 lanes), cap=8 single chunk."""
    b, L, h, hd, cap = 1, 2, 16, 64, 8
    q = rng.normal(size=(b, h, hd)).astype(np.float32)
    ks = jnp.asarray(rng.normal(size=(L, b, cap, h, hd)), jnp.bfloat16)
    vs = jnp.asarray(rng.normal(size=(L, b, cap, h, hd)), jnp.bfloat16)
    ck = rng.normal(size=(b, h, hd)).astype(np.float32)
    cv = rng.normal(size=(b, h, hd)).astype(np.float32)
    offs = np.asarray([5], np.int32)
    y_vpu = _run(q, ks, vs, ck, cv, offs, 1, cap, cap, False, monkeypatch)
    y_mxu = _run(q, ks, vs, ck, cv, offs, 1, cap, cap, True, monkeypatch)
    rel = np.abs(y_mxu - y_vpu).max() / (np.abs(y_vpu).max() + 1e-6)
    assert rel < 0.02, rel


def test_fp8_ring_keeps_vpu_kernel(rng, monkeypatch):
    """fp8 rings must not take the MXU path (full-tile converts); the
    call still works via the VPU kernel."""
    from moshi_tpu.nn.pallas_attention import _use_mxu_attn
    monkeypatch.setenv("MOSHI_TPU_ATTN_MXU", "1")
    assert not _use_mxu_attn(jnp.float8_e4m3fn, 4, 128, 16)
    assert _use_mxu_attn(jnp.bfloat16, 4, 128, 16)
    assert not _use_mxu_attn(jnp.bfloat16, 4, 128, 250)  # no 8-div chunk
    b, L, h, hd, cap = 1, 1, 4, 128, 16
    q = rng.normal(size=(b, h, hd)).astype(np.float32)
    ks = jnp.asarray(rng.normal(size=(L, b, cap, h, hd)),
                     jnp.float8_e4m3fn)
    vs = jnp.asarray(rng.normal(size=(L, b, cap, h, hd)),
                     jnp.float8_e4m3fn)
    ck = rng.normal(size=(b, h, hd)).astype(np.float32)
    cv = rng.normal(size=(b, h, hd)).astype(np.float32)
    y = _run(q, ks, vs, ck, cv, np.asarray([5], np.int32), 0, cap, cap,
             True, monkeypatch)
    assert np.isfinite(y).all()


def test_mxu_tpu_cross_lowering(rng, monkeypatch):
    """Mosaic block rules at the 7B ring shapes (cap 3000, H=32, hd=128)
    — interpret mode does not check them."""
    monkeypatch.setenv("MOSHI_TPU_ATTN_MXU", "1")
    jax.clear_caches()
    b, L, h, hd, cap, ctx = 1, 2, 32, 128, 3000, 3000
    q = jnp.zeros((b, h, hd), jnp.float32)
    ks = jnp.zeros((L, b, cap, h, hd), jnp.bfloat16)
    off = jnp.zeros((b,), jnp.int32)
    f = jax.jit(lambda q, ks, vs, ck, cv, off: decode_attention_stacked(
        q, ks, vs, ck, cv, off, jnp.int32(0), cap=cap, context=ctx,
        interpret=False))
    f.trace(q, ks, ks, q, q, off).lower(lowering_platforms=("tpu",))
