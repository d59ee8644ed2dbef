"""Loader round-trip: synthesize a checkpoint under the reference's tensor
naming, load it, and check numerics against the source arrays."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from moshi_tpu.io.safetensors import save_safetensors
from moshi_tpu.models.lm import LMConfig, init_gen_state, init_lm_params, lm_gen_step
from moshi_tpu.models.mimi import MimiConfig, MimiModel
from moshi_tpu.nn.seanet import SEANetConfig
from moshi_tpu.quant.formats import QuantTensor
from moshi_tpu.runtime.loader import load_lm_params, load_mimi_params

_mimi_cfg = MimiConfig(
    n_q=4, total_codebooks=4, dim=32,
    seanet=SEANetConfig(dimension=32, n_filters=4, ratios=(4, 3, 2, 2)),
    codebook_dim=16, codebook_size=32, transformer_layers=2,
    transformer_heads=4, transformer_context=16, transformer_hidden=64)

_lm_cfg = LMConfig(
    dim=32, num_heads=4, num_layers=2, hidden_dim=64, context=16,
    card=32, n_q=4, dep_q=2, text_card=48, delays=(0, 0, 1, 1, 2),
    depformer_dim=16, depformer_heads=2, depformer_layers=2,
    depformer_hidden=32, depformer_low_rank=8, extra_heads_num=3,
    extra_heads_dim=2)


def _mimi_checkpoint(rng):
    """Build a random checkpoint dict using reference tensor names."""
    t = {}
    m = MimiModel(_mimi_cfg)

    def conv(prefix, mod, transpose=False):
        from moshi_tpu.nn.conv import StreamingConvTranspose1d
        if transpose:
            # torch layout [I, O/g, K]
            i, og, k = mod.in_ch, mod.out_ch // mod.groups, mod.kernel
            t[f"{prefix}.convtr.convtr.weight"] = rng.normal(
                size=(i, og, k)).astype(np.float32)
            t[f"{prefix}.convtr.convtr.bias"] = rng.normal(
                size=(mod.out_ch,)).astype(np.float32)
        else:
            g = getattr(mod, "groups", 1)
            t[f"{prefix}.conv.conv.weight"] = rng.normal(
                size=(mod.out_ch, mod.in_ch // g,
                      mod.kernel)).astype(np.float32)
            t[f"{prefix}.conv.conv.bias"] = rng.normal(
                size=(mod.out_ch,)).astype(np.float32)

    from moshi_tpu.nn.conv import StreamingConvTranspose1d
    for net, prefix in ((m.encoder, "mimi.encoder"), (m.decoder, "mimi.decoder")):
        for name, mod in net.modules.items():
            conv(f"{prefix}.{name}", mod,
                 transpose=isinstance(mod, StreamingConvTranspose1d))

    for tr in ("encoder_transformer", "decoder_transformer"):
        for i in range(_mimi_cfg.transformer_layers):
            lp = f"mimi.{tr}.transformer.layers.{i}"
            d = _mimi_cfg.dim
            t[f"{lp}.norm1.weight"] = np.ones(d, np.float32)
            t[f"{lp}.norm1.bias"] = np.zeros(d, np.float32)
            t[f"{lp}.norm2.weight"] = np.ones(d, np.float32)
            t[f"{lp}.norm2.bias"] = np.zeros(d, np.float32)
            t[f"{lp}.self_attn.in_proj_weight"] = rng.normal(
                size=(3 * d, d)).astype(np.float32) * 0.1
            t[f"{lp}.self_attn.out_proj.weight"] = rng.normal(
                size=(d, d)).astype(np.float32) * 0.1
            t[f"{lp}.linear1.weight"] = rng.normal(
                size=(_mimi_cfg.transformer_hidden, d)).astype(np.float32) * 0.1
            t[f"{lp}.linear2.weight"] = rng.normal(
                size=(d, _mimi_cfg.transformer_hidden)).astype(np.float32) * 0.1
            t[f"{lp}.layer_scale_1.scale"] = np.full(d, 0.01, np.float32)
            t[f"{lp}.layer_scale_2.scale"] = np.full(d, 0.01, np.float32)

    t["mimi.downsample.conv.conv.conv.weight"] = rng.normal(
        size=(32, 32, 4)).astype(np.float32) * 0.1
    t["mimi.upsample.convtr.convtr.convtr.weight"] = rng.normal(
        size=(32, 1, 4)).astype(np.float32) * 0.1  # depthwise [I, O/g, K]

    for branch, n in (("rvq_first", 1), ("rvq_rest", 3)):
        bp = f"mimi.quantizer.{branch}"
        for j in range(n):
            cp = f"{bp}.vq.layers.{j}._codebook"
            t[f"{cp}.embedding_sum"] = rng.normal(
                size=(32, 16)).astype(np.float32)
            t[f"{cp}.cluster_usage"] = np.abs(rng.normal(
                size=(32,))).astype(np.float32) + 0.5
        t[f"{bp}.input_proj.weight"] = rng.normal(
            size=(16, 32, 1)).astype(np.float32) * 0.1
        t[f"{bp}.output_proj.weight"] = rng.normal(
            size=(32, 16, 1)).astype(np.float32) * 0.1
    return t


def test_mimi_loader_roundtrip(tmp_path, rng):
    ckpt = _mimi_checkpoint(rng)
    path = str(tmp_path / "mimi.safetensors")
    save_safetensors(path, ckpt)
    m = MimiModel(_mimi_cfg)
    params = load_mimi_params(path, m, dtype=jnp.float32)
    # codebook derivation
    expect = (ckpt["mimi.quantizer.rvq_first.vq.layers.0._codebook.embedding_sum"]
              / np.clip(ckpt["mimi.quantizer.rvq_first.vq.layers.0._codebook.cluster_usage"],
                        1e-5, None)[:, None])
    got = np.asarray(params["quantizer"]["rvq_first"]["embeddings"][0])
    np.testing.assert_allclose(got, expect, rtol=1e-5)
    # the loaded tree drives a real encode/decode step
    hop2 = _mimi_cfg.seanet.hop_length * 2
    audio = jnp.asarray(rng.normal(size=(1, hop2)).astype(np.float32) * 0.1)
    codes, _ = m.encode_step(params, m.init_encode_state(1), audio)
    out, _ = m.decode_step(params, m.init_decode_state(1), codes)
    assert out.shape == (1, hop2)
    assert np.isfinite(np.asarray(out)).all()


def _lm_checkpoint(rng):
    c = _lm_cfg
    t = {}
    t["lm.text_emb.weight"] = rng.normal(size=(c.text_card + 1, c.dim)).astype(np.float32) * 0.1
    for i in range(c.n_q):
        t[f"lm.emb.{i}.weight"] = rng.normal(size=(c.card + 1, c.dim)).astype(np.float32) * 0.1
    for i in range(c.num_layers):
        lp = f"lm.transformer.layers.{i}"
        t[f"{lp}.norm1.alpha"] = np.ones((1, 1, c.dim), np.float32)
        t[f"{lp}.norm2.alpha"] = np.ones((1, 1, c.dim), np.float32)
        t[f"{lp}.self_attn.in_proj_weight"] = rng.normal(size=(3 * c.dim, c.dim)).astype(np.float32) * 0.1
        t[f"{lp}.self_attn.out_proj.weight"] = rng.normal(size=(c.dim, c.dim)).astype(np.float32) * 0.1
        t[f"{lp}.gating.linear_in.weight"] = rng.normal(size=(2 * c.hidden_dim, c.dim)).astype(np.float32) * 0.1
        t[f"{lp}.gating.linear_out.weight"] = rng.normal(size=(c.dim, c.hidden_dim)).astype(np.float32) * 0.1
    t["lm.out_norm.alpha"] = np.ones((1, 1, c.dim), np.float32)
    t["lm.text_linear.weight"] = rng.normal(size=(c.text_card, c.dim)).astype(np.float32) * 0.1
    for i in range(c.extra_heads_num):
        t[f"lm.extra_heads.{i}.weight"] = rng.normal(size=(c.extra_heads_dim, c.dim)).astype(np.float32) * 0.1
    for i in range(c.depformer_num_weights):
        t[f"lm.depformer_in.{i}.weight"] = rng.normal(size=(c.depformer_dim, c.dim)).astype(np.float32) * 0.1
    t["lm.depformer_text_emb.weight"] = rng.normal(size=(c.text_card + 1, c.depformer_dim)).astype(np.float32) * 0.1
    for i in range(c.dep_q - 1):
        t[f"lm.depformer_emb.{i}.weight"] = rng.normal(size=(c.card + 1, c.depformer_low_rank)).astype(np.float32) * 0.1
        t[f"lm.depformer_emb.{i}.low_rank.weight"] = rng.normal(size=(c.depformer_dim, c.depformer_low_rank)).astype(np.float32) * 0.1
    for i in range(c.dep_q):
        t[f"lm.linears.{i}.weight"] = rng.normal(size=(c.card, c.depformer_dim)).astype(np.float32) * 0.1
    dd = c.depformer_dim
    for i in range(c.depformer_layers):
        lp = f"lm.depformer.layers.{i}"
        t[f"{lp}.norm1.alpha"] = np.ones((1, 1, dd), np.float32)
        t[f"{lp}.norm2.alpha"] = np.ones((1, 1, dd), np.float32)
        for j in range(c.depformer_num_weights):
            t[f"{lp}.self_attn.in_projs.{j}.weight"] = rng.normal(size=(3 * dd, dd)).astype(np.float32) * 0.1
            t[f"{lp}.self_attn.out_projs.{j}.weight"] = rng.normal(size=(dd, dd)).astype(np.float32) * 0.1
            t[f"{lp}.gating.{j}.linear_in.weight"] = rng.normal(size=(2 * c.depformer_hidden, dd)).astype(np.float32) * 0.1
            t[f"{lp}.gating.{j}.linear_out.weight"] = rng.normal(size=(dd, c.depformer_hidden)).astype(np.float32) * 0.1
    return t


def test_lm_loader_roundtrip(tmp_path, rng):
    ckpt = _lm_checkpoint(rng)
    path = str(tmp_path / "lm.safetensors")
    save_safetensors(path, ckpt)
    params = load_lm_params(path, _lm_cfg, fmt=None, dtype=jnp.float32)
    # tree structure matches the init structure
    ref = init_lm_params(jax.random.PRNGKey(0), _lm_cfg)
    assert (jax.tree_util.tree_structure(params) ==
            jax.tree_util.tree_structure(ref))
    np.testing.assert_allclose(
        np.asarray(params["text_linear"]["weight"]),
        ckpt["lm.text_linear.weight"], rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(params["depformer"]["layers"]["gating"]["linear_in"]["weight"][0, 1]),
        ckpt["lm.depformer.layers.1.gating.0.linear_in.weight"], rtol=1e-5)  # [W, L]
    # loaded params run a full generation step
    state = init_gen_state(_lm_cfg, 1)
    out, _ = lm_gen_step(_lm_cfg, params, state, temp=0.0, temp_text=0.0)
    assert out["audio"].shape == (1, 2)
    assert "vad" in out   # extra_heads_num=3 -> vad prob emitted


def test_lm_loader_quantized(tmp_path, rng):
    cfg = LMConfig(
        dim=512, num_heads=4, num_layers=1, hidden_dim=512, context=8,
        card=32, n_q=1, dep_q=0, text_card=300, delays=(0, 0),
        extra_heads_num=0)
    c = cfg
    t = {
        "lm.text_emb.weight": rng.normal(size=(c.text_card + 1, c.dim)).astype(np.float32),
        "lm.emb.0.weight": rng.normal(size=(c.card + 1, c.dim)).astype(np.float32),
        "lm.out_norm.alpha": np.ones((1, 1, c.dim), np.float32),
        "lm.text_linear.weight": rng.normal(size=(c.text_card, c.dim)).astype(np.float32),
    }
    lp = "lm.transformer.layers.0"
    t[f"{lp}.norm1.alpha"] = np.ones((1, 1, c.dim), np.float32)
    t[f"{lp}.norm2.alpha"] = np.ones((1, 1, c.dim), np.float32)
    t[f"{lp}.self_attn.in_proj_weight"] = rng.normal(size=(3 * c.dim, c.dim)).astype(np.float32)
    t[f"{lp}.self_attn.out_proj.weight"] = rng.normal(size=(c.dim, c.dim)).astype(np.float32)
    t[f"{lp}.gating.linear_in.weight"] = rng.normal(size=(2 * c.hidden_dim, c.dim)).astype(np.float32)
    t[f"{lp}.gating.linear_out.weight"] = rng.normal(size=(c.dim, c.hidden_dim)).astype(np.float32)
    path = str(tmp_path / "lm.safetensors")
    save_safetensors(path, t)
    params = load_lm_params(path, cfg, fmt="q8_0", dtype=jnp.bfloat16)
    lay = params["transformer"]["layers"]
    assert isinstance(lay["self_attn"]["in_proj"]["weight"], QuantTensor)
    assert isinstance(params["text_linear"]["weight"], QuantTensor)
    assert not isinstance(lay["norm1"]["alpha"], QuantTensor)
    state = init_gen_state(cfg, 1)
    out, _ = lm_gen_step(cfg, params, state, temp=0.0, temp_text=0.0)
    assert out["text"].shape == (1,)
