import jax
import numpy as np

from moshi_tpu.models.lm import LMConfig, init_gen_state, lm_gen_step
from moshi_tpu.quant.formats import QuantTensor
from moshi_tpu.runtime.synth import synth_lm_params, synth_quant_tensor

_cfg = LMConfig(
    dim=256, num_heads=4, num_layers=2, hidden_dim=512, context=16,
    card=256, n_q=4, dep_q=2, text_card=512, delays=(0, 0, 1, 1, 2),
    depformer_dim=256, depformer_heads=4, depformer_layers=2,
    depformer_hidden=512, depformer_low_rank=16,
)


def test_synth_quant_tensor_dequantizes():
    from moshi_tpu.quant.formats import dequantize
    qt = synth_quant_tensor(jax.random.PRNGKey(0), "q4_k", 64, 512)
    w = np.asarray(dequantize(qt, jax.numpy.float32))
    assert w.shape == (64, 512)
    assert np.isfinite(w).all() and np.abs(w).max() > 0


def test_synth_lm_params_structure_and_step():
    params = synth_lm_params(jax.random.PRNGKey(0), _cfg, fmt="q8_0")
    # big matmuls quantized, norms not
    lay = params["transformer"]["layers"]
    assert isinstance(lay["self_attn"]["in_proj"]["weight"], QuantTensor)
    assert not isinstance(lay["norm1"]["alpha"], QuantTensor)
    assert isinstance(params["text_linear"]["weight"], QuantTensor)
    assert isinstance(params["emb"]["weight"], QuantTensor)
    # stacked leading axes preserved
    assert lay["self_attn"]["in_proj"]["weight"].q.shape[0] == 2
    # a full generation step runs on the synthetic quantized tree
    state = init_gen_state(_cfg, 1)
    out, state = lm_gen_step(_cfg, params, state, temp=0.0, temp_text=0.0)
    assert out["audio"].shape == (1, 2)
    a = np.asarray(out["sampled_text"])
    assert (a >= 0).all() and (a < 512).all()


def test_synth_bf16_tree():
    params = synth_lm_params(jax.random.PRNGKey(1), _cfg, fmt=None)
    state = init_gen_state(_cfg, 1)
    out, _ = lm_gen_step(_cfg, params, state, temp=0.0, temp_text=0.0)
    assert out["text"].shape == (1,)
