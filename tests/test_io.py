import numpy as np

from moshi_tpu.io import (SafeTensors, load_wav, read_mimi_file,
                          save_safetensors, save_wav, write_mimi_file)
from moshi_tpu.io.safetensors import bf16_to_f32, f32_to_bf16_raw
from moshi_tpu.io.wav import resample_linear
from moshi_tpu.config import parse_config


def test_safetensors_roundtrip(tmp_path, rng):
    path = str(tmp_path / "t.safetensors")
    a = rng.normal(size=(3, 5)).astype(np.float32)
    b = (rng.normal(size=(4,)) * 10).astype(np.int32)
    save_safetensors(path, {"a": a, "b": b}, metadata={"k": "v"})
    st = SafeTensors(path)
    assert set(st.keys()) == {"a", "b"}
    np.testing.assert_array_equal(st["a"], a)
    np.testing.assert_array_equal(st["b"], b)
    assert st.shape("a") == [3, 5]
    st.close()


def test_safetensors_bf16(tmp_path, rng):
    path = str(tmp_path / "t.safetensors")
    a = rng.normal(size=(8,)).astype(np.float32)
    raw = f32_to_bf16_raw(a)
    save_safetensors(path, {"a": (raw, "BF16")})
    st = SafeTensors(path)
    out = st["a"]
    np.testing.assert_allclose(out, a, rtol=0.01)
    np.testing.assert_array_equal(f32_to_bf16_raw(out), raw)  # exact bits
    st.close()


def test_bf16_helpers():
    x = np.array([1.0, -2.5, 3.14159, 0.0], dtype=np.float32)
    np.testing.assert_allclose(bf16_to_f32(f32_to_bf16_raw(x)), x, rtol=0.01)


def test_wav_roundtrip(tmp_path, rng):
    path = str(tmp_path / "t.wav")
    x = (rng.normal(size=4800) * 0.1).astype(np.float32)
    save_wav(path, x, 24000)
    y, rate = load_wav(path)
    assert rate == 24000
    np.testing.assert_allclose(y, x, atol=1.0 / 32000)


def test_resample():
    t = np.arange(48000, dtype=np.float32)
    x = np.sin(2 * np.pi * 440 * t / 48000)
    y = resample_linear(x, 48000, 24000)
    assert abs(len(y) - 24000) <= 1


def test_mimi_file(tmp_path, rng):
    path = str(tmp_path / "t.mimi")
    codes = rng.integers(0, 2048, size=(25, 8)).astype(np.int16)
    write_mimi_file(path, codes)
    out = read_mimi_file(path)
    np.testing.assert_array_equal(out, codes)
    with open(path, "rb") as fh:
        assert fh.read(4) == b"MIMI"  # byte-compatible magic


def test_config_parse():
    cfg = parse_config({
        "dim": 4096, "num_layers": 32, "num_heads": 32, "n_q": 16,
        "dep_q": 8, "context": 3000, "card": 2048, "text_card": 32000,
        "delays": [0, 0, 1, 1, 1, 1, 1, 1, 1, 0, 1, 1, 1, 1, 1, 1, 1],
        "depformer_dim": 1024, "depformer_num_layers": 6,
        "depformer_context": 8,
        "tts_config": {"audio_delay": 1.28, "second_stream_ahead": 2},
        "lm_gen_config": {"temp": 0.8, "top_k": 250},
        "unknown_key": {"deep": 1},
    })
    assert cfg.dim == 4096 and cfg.max_delay == 1
    assert cfg.tts_config.second_stream_ahead == 2
    assert cfg.lm_gen_config.temp == 0.8
    assert cfg.lm_gen_config.top_k_text == 50  # default preserved
    assert cfg.hidden_dim == int(4096 * 4.125)
    assert cfg.depformer_weights_per_step_schedule == list(range(8))


def test_config_defaults():
    cfg = parse_config({})
    assert cfg.existing_text_padding_id == 3
    assert cfg.norm == "rms_norm_f32"
    assert cfg.positional_embedding == "rope"
    assert cfg.fuser.sum == ["control", "cfg"]
    # reference defaults config.h:151-152
    assert cfg.stt_config.audio_delay_seconds == 5.0
    assert cfg.stt_config.audio_silence_prefix_seconds == 1.0
