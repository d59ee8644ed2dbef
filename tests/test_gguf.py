"""GGUF interchange: container round-trip, ggml-block <-> planar repack
bit-exactness, CRC tensor-name parity, and full LM/Mimi snapshot
round-trips through the loader (VERDICT r1 item 4; reference
loader.h:227-271, moshi.cpp:789-836)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from moshi_tpu.io.gguf import (GGML_Q4_K, GGUFReader, GGUFWriter,
                               ggml_to_quant, gguf_tensor_name,
                               quant_to_ggml)
from moshi_tpu.quant.formats import QK_K, QuantTensor, dequantize, quantize


def _ref_crc_name(name: str) -> str:
    """Independent reimplementation of the reference's tensor_name
    (loader.h:120-137 + crc-bbf.h bit-by-bit CRC), kept deliberately
    C-literal to pin our gguf_tensor_name against it."""
    if len(name) < 64:
        return name
    crc = 0xFFFFFFFF
    for ch in name.encode():
        i = 1
        while i & 0xFF:
            bit = (crc & 0x80000000) ^ (0x80000000 if ch & i else 0)
            crc = (crc << 1) & 0xFFFFFFFF
            if bit:
                crc ^= 0x04C11DB7
            i <<= 1
    # crc_finalize: reflect 32 bits then xor
    refl = 0
    x = crc
    for _ in range(32):
        refl = (refl << 1) | (x & 1)
        x >>= 1
    crc = refl ^ 0xFFFFFFFF
    out = []
    hexd = "0123456789abcdef"
    for _ in range(8):
        out.append(hexd[crc & 0xF])   # low nibble only (ref overwrite bug)
        crc >>= 8
    return "".join(out)


def test_crc_tensor_name_matches_reference_semantics():
    long_names = [
        "mimi.encoder_transformer.transformer.layers.0.self_attn"
        ".in_projs.0.weight",
        "mimi.decoder_transformer.transformer.layers.7.layer_scale_1.scale",
        "x" * 64,
        "lm." + "a" * 100,
    ]
    for n in long_names:
        assert len(n) >= 64
        assert gguf_tensor_name(n) == _ref_crc_name(n)
        assert len(gguf_tensor_name(n)) == 8
        assert gguf_tensor_name(n)[4:] == "0000"  # 32-bit crc, bytes 4..7 = 0
    short = "lm.text_linear.weight"
    assert gguf_tensor_name(short) == short


def test_container_roundtrip(tmp_path):
    path = str(tmp_path / "t.gguf")
    w = GGUFWriter()
    w.add_kv("general.architecture", "moshi")
    w.add_kv("moshi.count", 7)
    w.add_kv("moshi.neg", -3)
    w.add_kv("moshi.f", 2.5)
    w.add_kv("moshi.flag", True)
    w.add_kv("moshi.list", ["a", "b"])
    rng = np.random.default_rng(0)
    f32 = rng.normal(size=(5, 48)).astype(np.float32)
    f16 = rng.normal(size=(3, 32)).astype(np.float16)
    i32 = rng.integers(0, 100, (4,), dtype=np.int32)
    bf16 = jnp.asarray(rng.normal(size=(2, 64)), jnp.bfloat16)
    w.add_tensor("a.f32", f32)
    w.add_tensor("a.f16", f16)
    w.add_tensor("a.i32", i32)
    w.add_tensor("a.bf16", bf16)
    w.write(path)

    r = GGUFReader(path)
    assert r.metadata["general.architecture"] == "moshi"
    assert r.metadata["moshi.count"] == 7
    assert r.metadata["moshi.neg"] == -3
    assert r.metadata["moshi.f"] == 2.5
    assert r.metadata["moshi.flag"] is True
    assert r.metadata["moshi.list"] == ["a", "b"]
    np.testing.assert_array_equal(r.get("a.f32"), f32)
    np.testing.assert_array_equal(r.get("a.f16"), f16.astype(np.float32))
    np.testing.assert_array_equal(r.get("a.i32"), i32)
    np.testing.assert_array_equal(r.get("a.bf16"),
                                  np.asarray(bf16, np.float32))
    assert r.shape("a.f32") == (5, 48)
    r.close()


@pytest.mark.parametrize("fmt,o,i", [("q8_0", 6, 96), ("q4_0", 6, 96),
                                     ("q4_k", 5, 512)])
def test_ggml_repack_bit_exact(tmp_path, fmt, o, i, rng):
    w = rng.normal(size=(o, i)).astype(np.float32) * 0.05
    qt = quantize(w, fmt)
    ggml_type, raw = quant_to_ggml(qt)
    back = ggml_to_quant(ggml_type, raw, (o, i))
    assert back.fmt == qt.fmt and back.shape == tuple(qt.shape)
    for f in ("q", "d", "sc", "mn", "dmin", "es", "em"):
        a, b = getattr(qt, f), getattr(back, f)
        if a is None:
            assert b is None, f
            continue
        np.testing.assert_array_equal(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            err_msg=f"{fmt}.{f}")
    # and through the container
    path = str(tmp_path / "q.gguf")
    wr = GGUFWriter()
    wr.add_tensor("w", qt)
    wr.write(path)
    r = GGUFReader(path)
    assert r.is_quantized("w")
    back2 = r.get_quant("w")
    np.testing.assert_array_equal(np.asarray(qt.q), np.asarray(back2.q))
    r.close()


def _dequant_ggml_q4_k(raw: bytes, o: int, i: int) -> np.ndarray:
    """Independent numpy port of llama.cpp dequantize_row_q4_K (block
    layout: d f16, dmin f16, scales[12], qs[128]; 64-element chunks,
    get_scale_min_k4 packing)."""
    nsb = i // QK_K
    b = np.frombuffer(raw, np.uint8).reshape(o, nsb, 144)
    d = np.ascontiguousarray(b[:, :, 0:2]).view(np.float16) \
        .astype(np.float32).reshape(o, nsb)
    dmin = np.ascontiguousarray(b[:, :, 2:4]).view(np.float16) \
        .astype(np.float32).reshape(o, nsb)
    scales = b[:, :, 4:16]
    sc = np.empty((o, nsb, 8), np.uint8)
    mn = np.empty((o, nsb, 8), np.uint8)
    for j in range(8):   # deliberate per-j loop, C-literal
        if j < 4:
            sc[:, :, j] = scales[:, :, j] & 63
            mn[:, :, j] = scales[:, :, j + 4] & 63
        else:
            sc[:, :, j] = (scales[:, :, j + 4] & 0xF) | \
                ((scales[:, :, j - 4] >> 6) << 4)
            mn[:, :, j] = (scales[:, :, j + 4] >> 4) | \
                ((scales[:, :, j] >> 6) << 4)
    qs = b[:, :, 16:144]
    out = np.zeros((o, nsb, QK_K), np.float32)
    for c in range(4):        # 64-element chunk
        blk = qs[:, :, 32 * c:32 * (c + 1)]
        lo = (blk & 15).astype(np.float32)
        hi = (blk >> 4).astype(np.float32)
        is_ = 2 * c
        out[:, :, 64 * c:64 * c + 32] = \
            d[..., None] * sc[:, :, is_, None] * lo \
            - dmin[..., None] * mn[:, :, is_, None]
        out[:, :, 64 * c + 32:64 * (c + 1)] = \
            d[..., None] * sc[:, :, is_ + 1, None] * hi \
            - dmin[..., None] * mn[:, :, is_ + 1, None]
    return out.reshape(o, i)


def test_q4_k_ggml_dequant_parity(rng):
    """Our planar dequantize == a C-literal ggml q4_K dequant of the
    repacked blocks (same numbers, different layout)."""
    o, i = 4, 512
    w = rng.normal(size=(o, i)).astype(np.float32) * 0.05
    qt = quantize(w, "q4_k")
    _, raw = quant_to_ggml(qt)
    ref = _dequant_ggml_q4_k(raw, o, i)
    ours = np.asarray(dequantize(qt, jnp.float32))
    np.testing.assert_allclose(ours, ref, rtol=2e-2, atol=2e-4)
    # reconstruction is a real approximation of w
    assert np.abs(ours - w).max() < 0.02


def test_foreign_f16_scales_load(tmp_path, rng):
    """A GGUF whose f16 scales are NOT bf16-representable still loads,
    with scales snapped <= 2^-9 relative."""
    o, i = 4, 512
    nsb = i // QK_K
    raw = bytearray()
    d = (rng.uniform(0.001, 0.01, (o, nsb)).astype(np.float16))
    dmin = (rng.uniform(0.001, 0.01, (o, nsb)).astype(np.float16))
    sc = rng.integers(0, 64, (o, nsb, 8), np.uint8)
    mn = rng.integers(0, 64, (o, nsb, 8), np.uint8)
    qs = rng.integers(0, 256, (o, nsb, 128), np.uint8)
    blocks = np.empty((o, nsb, 144), np.uint8)
    blocks[:, :, 0:2] = d[..., None].view(np.uint8)
    blocks[:, :, 2:4] = dmin[..., None].view(np.uint8)
    for j in range(4):
        blocks[:, :, 4 + j] = (sc[:, :, j] & 63) | ((sc[:, :, j + 4] >> 4) << 6)
        blocks[:, :, 8 + j] = (mn[:, :, j] & 63) | ((mn[:, :, j + 4] >> 4) << 6)
        blocks[:, :, 12 + j] = (sc[:, :, j + 4] & 0xF) | ((mn[:, :, j + 4] & 0xF) << 4)
    blocks[:, :, 16:] = qs
    raw = blocks.tobytes()
    ref = _dequant_ggml_q4_k(raw, o, i)
    qt = ggml_to_quant(GGML_Q4_K, raw, (o, i))
    ours = np.asarray(dequantize(qt, jnp.float32))
    # f16 -> bf16 snap: <= 2^-9 relative on the scales, which bounds the
    # ABSOLUTE value error by ~2^-8 of the value range (values themselves
    # cross zero, so a pure rtol check is meaningless there)
    np.testing.assert_allclose(ours, ref,
                               atol=2**-8 * np.abs(ref).max(), rtol=2**-8)
    # es/em derive from full-precision f16 before the snap
    es = np.asarray(qt.es, np.float32).reshape(o, nsb, 8)
    np.testing.assert_allclose(
        es, np.float32(d)[..., None] * sc, rtol=2**-8)


def _tree_equal(a, b, path=""):
    import jax
    la, sa = jax.tree_util.tree_flatten(a)
    lb, sb = jax.tree_util.tree_flatten(b)
    assert sa == sb, f"{path}: structure {sa} != {sb}"
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(
            np.asarray(x, np.float32), np.asarray(y, np.float32))


@pytest.mark.parametrize("fmt", ["q8_0", "q4_k"])
def test_lm_gguf_snapshot_roundtrip(tmp_path, fmt, rng):
    """synth LM -> save_lm_gguf -> load_lm_params: bit-exact tree."""
    from moshi_tpu.models.lm import LMConfig
    from moshi_tpu.runtime.loader import load_lm_params, save_lm_gguf
    from moshi_tpu.runtime.synth import synth_lm_params
    cfg = LMConfig(
        dim=256, num_heads=4, num_layers=2, hidden_dim=256, context=16,
        card=32, n_q=4, dep_q=2, text_card=48, delays=(0, 0, 1, 1, 2),
        depformer_dim=256, depformer_heads=2, depformer_layers=2,
        depformer_hidden=256, depformer_low_rank=32, extra_heads_num=2,
        extra_heads_dim=2)
    params = synth_lm_params(jax.random.PRNGKey(0), cfg, fmt=fmt)
    path = str(tmp_path / "lm.gguf")
    save_lm_gguf(path, params, cfg)
    loaded = load_lm_params(path, cfg, fmt=fmt)
    _tree_equal(params, loaded)
    # the loaded tree actually generates
    from moshi_tpu.models.lm import init_gen_state, lm_gen_step
    state = init_gen_state(cfg, 1, params=loaded)
    out, _ = lm_gen_step(cfg, loaded, state, temp=0.0, temp_text=0.0)
    assert out["audio"].shape == (1, cfg.dep_q)


def test_mimi_gguf_snapshot_roundtrip(tmp_path, rng):
    from moshi_tpu.models.mimi import MimiConfig, MimiModel
    from moshi_tpu.nn.seanet import SEANetConfig
    from moshi_tpu.runtime.loader import load_mimi_params, save_mimi_gguf
    cfg = MimiConfig(
        n_q=4, total_codebooks=4, dim=32,
        seanet=SEANetConfig(dimension=32, n_filters=4, ratios=(4, 3, 2, 2)),
        codebook_dim=16, codebook_size=32, transformer_layers=2,
        transformer_heads=4, transformer_context=16, transformer_hidden=64)
    model = MimiModel(cfg)
    params = model.init_params(jax.random.PRNGKey(0), jnp.bfloat16)
    path = str(tmp_path / "mimi.gguf")
    save_mimi_gguf(path, params, model)
    loaded = load_mimi_params(path, model, dtype=jnp.bfloat16)
    _tree_equal(params, loaded)
    # end-to-end step on the loaded tree
    hop2 = cfg.seanet.hop_length * 2
    audio = jnp.asarray(rng.normal(size=(1, hop2)).astype(np.float32) * 0.1)
    codes, _ = model.encode_step(loaded, model.init_encode_state(1), audio)
    out, _ = model.decode_step(loaded, model.init_decode_state(1), codes)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_voice_file_gguf(tmp_path, rng):
    from moshi_tpu.models.personaplex import load_voice_file
    emb = rng.normal(size=(17, 64)).astype(np.float32)
    cache = rng.integers(0, 100, (20, 9), dtype=np.int32)  # [K, CT] on disk
    path = str(tmp_path / "voice.gguf")
    w = GGUFWriter()
    w.add_tensor("voice.embeddings", emb)
    w.add_tensor("voice.cache", cache)
    w.write(path)
    e, c, wavs = load_voice_file(path)
    np.testing.assert_array_equal(e, emb)
    np.testing.assert_array_equal(c, cache.T)  # transposed to [CT, K]
    assert wavs is None


def test_voice_cache_orientation_from_config(tmp_path, rng):
    # VERDICT r3 #7: a voice whose cache has CT >= K must not mis-orient
    # when the model config is given — K = cfg.num_codebooks decides.
    from moshi_tpu.models.lm import LMConfig
    from moshi_tpu.models.personaplex import load_voice_file
    cfg = LMConfig(dim=32, num_heads=2, num_layers=1, hidden_dim=64,
                   context=16, card=64, n_q=8, dep_q=4, text_card=128,
                   delays=(0,) * 9)
    k = cfg.num_codebooks  # 9
    ct = 12                # CT > K: heuristic would flip a [K, CT] store

    def write(cache):
        path = str(tmp_path / f"v{cache.shape}.gguf")
        w = GGUFWriter()
        w.add_tensor("voice.cache", cache)
        w.write(path)
        return path

    stored_kct = rng.integers(0, 100, (k, ct), dtype=np.int32)
    _, c, _ = load_voice_file(write(stored_kct), cfg)
    np.testing.assert_array_equal(c, stored_kct.T)

    stored_ctk = rng.integers(0, 100, (ct, k), dtype=np.int32)
    _, c, _ = load_voice_file(write(stored_ctk), cfg)
    np.testing.assert_array_equal(c, stored_ctk)

    bad = rng.integers(0, 100, (ct, k + 1), dtype=np.int32)
    import pytest
    with pytest.raises(ValueError, match="voice.cache shape"):
        load_voice_file(write(bad), cfg)


def test_gguf_writer_bytes_parse_with_independent_spec_reader(tmp_path,
                                                              rng):
    """Cross-validation against the GGUF v3 spec itself (VERDICT r3
    missing #4, reference-binary-free variant): a from-scratch minimal
    reader written straight from the spec in this test — NOT the
    production GGUFReader — parses a file produced by our writer,
    checking magic/version/counts/kv encoding/tensor-info layout/data
    alignment byte-for-byte."""
    import struct
    from moshi_tpu.io.gguf import GGUFWriter

    w = GGUFWriter()
    w.add_kv("general.architecture", "moshi")
    w.add_kv("moshi.context_length", 3000)
    t1 = rng.normal(size=(4, 8)).astype(np.float32)
    t2 = rng.integers(0, 100, (6,), dtype=np.int32)
    w.add_tensor("a.weight", t1)
    w.add_tensor("b.idx", t2)
    path = str(tmp_path / "spec.gguf")
    w.write(path)

    blob = open(path, "rb").read()
    off = [0]

    def take(fmt):
        v = struct.unpack_from("<" + fmt, blob, off[0])
        off[0] += struct.calcsize("<" + fmt)
        return v if len(v) > 1 else v[0]

    def gstr():
        n = take("Q")
        s = blob[off[0]: off[0] + n].decode()
        off[0] += n
        return s

    assert blob[:4] == b"GGUF"
    off[0] = 4
    assert take("I") == 3                        # version
    n_tensors = take("Q")
    n_kv = take("Q")
    assert n_tensors == 2
    kvs = {}
    for _ in range(n_kv):
        key = gstr()
        vtype = take("I")
        if vtype == 8:                            # string
            kvs[key] = gstr()
        elif vtype == 4:                          # uint32
            kvs[key] = take("I")
        elif vtype == 5:                          # int32
            kvs[key] = take("i")
        elif vtype == 10:                         # uint64
            kvs[key] = take("Q")
        elif vtype == 11:                         # int64
            kvs[key] = take("q")
        else:
            raise AssertionError(f"unexpected kv type {vtype} for {key}")
    assert kvs["general.architecture"] == "moshi"
    assert kvs["moshi.context_length"] == 3000

    infos = []
    for _ in range(n_tensors):
        name = gstr()
        ndim = take("I")
        dims = [take("Q") for _ in range(ndim)]
        ttype = take("I")
        data_off = take("Q")
        infos.append((name, dims, ttype, data_off))
    align = int(kvs.get("general.alignment", 32))
    data_base = (off[0] + align - 1) // align * align

    by_name = {i[0]: i for i in infos}
    # ggml dims are innermost-first (reversed vs numpy)
    assert by_name["a.weight"][1] == [8, 4]
    assert by_name["a.weight"][2] == 0            # GGML_TYPE_F32
    assert by_name["b.idx"][1] == [6]
    for name, dims, ttype, data_off in infos:
        assert data_off % align == 0
    a_off = data_base + by_name["a.weight"][3]
    got = np.frombuffer(blob, np.float32, t1.size, a_off).reshape(4, 8)
    np.testing.assert_array_equal(got, t1)
    b_off = data_base + by_name["b.idx"][3]
    np.testing.assert_array_equal(
        np.frombuffer(blob, np.int32, t2.size, b_off), t2)
