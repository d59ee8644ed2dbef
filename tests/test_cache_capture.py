import jax
import jax.numpy as jnp
import numpy as np

from moshi_tpu.models.lm import LMConfig, init_gen_state, init_lm_params, lm_gen_step
from moshi_tpu.quant.formats import QuantTensor, dequantize
from moshi_tpu.quant.policy import quantize_tree
from moshi_tpu.runtime.cache import load_quantized, save_quantized
from moshi_tpu.utils.capture import compare_traces, recording, capture
from moshi_tpu.utils.prof import FrameTimer

_cfg = LMConfig(
    dim=32, num_heads=4, num_layers=2, hidden_dim=64, context=16,
    card=32, n_q=2, dep_q=1, text_card=48, delays=(0, 0, 1),
    depformer_dim=16, depformer_heads=2, depformer_layers=1,
    depformer_hidden=32, depformer_low_rank=8)


def test_quantized_cache_roundtrip(tmp_path, rng):
    params = init_lm_params(jax.random.PRNGKey(0), _cfg)
    qparams = quantize_tree(
        {"big": {"weight": rng.normal(size=(512, 512)).astype(np.float32)},
         "norm": {"alpha": np.ones(512, np.float32)},
         "emb": {"weight": rng.normal(size=(300, 512)).astype(np.float32)}},
        "q4_k")
    path = str(tmp_path / "model.moshi-tpu.safetensors")
    save_quantized(path, qparams, metadata={"model": "test"})
    loaded = load_quantized(path)
    assert isinstance(loaded["big"]["weight"], QuantTensor)
    assert loaded["big"]["weight"].fmt == "q4_k"
    a = np.asarray(dequantize(qparams["big"]["weight"], jnp.float32))
    b = np.asarray(dequantize(loaded["big"]["weight"], jnp.float32))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(np.asarray(qparams["norm"]["alpha"]),
                                  np.asarray(loaded["norm"]["alpha"]))


def test_cache_full_lm_tree(tmp_path):
    params = init_lm_params(jax.random.PRNGKey(0), _cfg)
    path = str(tmp_path / "lm.cache.safetensors")
    save_quantized(path, params)
    loaded = load_quantized(path)
    assert (jax.tree_util.tree_structure(params) ==
            jax.tree_util.tree_structure(loaded))
    # loaded tree still runs
    out, _ = lm_gen_step(_cfg, loaded, init_gen_state(_cfg, 1),
                         temp=0.0, temp_text=0.0)
    assert out["text"].shape == (1,)


def test_capture_and_compare():
    @jax.jit
    def fn(x):
        y = capture("mid", x * 2)
        return capture("out", y + 1)

    with recording() as rec:
        fn(jnp.ones((4,)))
        jax.effects_barrier()
    assert set(rec.values) == {"mid", "out"}
    golden = {k: v[0] for k, v in rec.values.items()}
    ok, report = compare_traces(golden, golden)
    assert ok
    bad = dict(golden)
    bad["mid"] = bad["mid"] + 1.0
    ok2, report2 = compare_traces(golden, bad)
    assert not ok2
    assert any("FAIL" in r for r in report2)


def test_capture_save_load(tmp_path):
    with recording() as rec:
        capture("a", jnp.arange(3.0))
        jax.effects_barrier()
    path = str(tmp_path / "trace.npz")
    rec.save(path)
    loaded = rec.load(path)
    np.testing.assert_array_equal(loaded["a@0"], np.arange(3.0))


def test_frame_timer():
    t = FrameTimer(budget_ms=1000)
    for _ in range(5):
        with t.frame():
            pass
    rep = t.report()
    assert rep["frames"] == 5 and rep["realtime"]


def test_model_capture_taps():
    # the built-in taps record lm intermediates when a recorder is active
    params = init_lm_params(jax.random.PRNGKey(0), _cfg)
    state = init_gen_state(_cfg, 1)
    with recording() as rec:
        lm_gen_step(_cfg, params, state, temp=0.0, temp_text=0.0)
        jax.effects_barrier()
    assert "lm/transformer_out" in rec.values
    assert "lm/text_logits" in rec.values
