"""End-to-end CLI tool smoke tests with synthetic weights."""

import numpy as np
import pytest

from moshi_tpu.io.mimi_file import read_mimi_file
from moshi_tpu.io.wav import load_wav, save_wav


@pytest.fixture
def wav_file(tmp_path, rng):
    path = str(tmp_path / "in.wav")
    t = np.arange(24_000)  # 1s
    x = 0.3 * np.sin(2 * np.pi * 220 * t / 24_000).astype(np.float32)
    save_wav(path, x, 24_000)
    return path


def test_mimi_encode_decode_cli(tmp_path, wav_file):
    from moshi_tpu.tools.mimi_encode import main as enc_main
    from moshi_tpu.tools.mimi_decode import main as dec_main
    mimi_path = str(tmp_path / "t.mimi")
    out_wav = str(tmp_path / "out.wav")
    assert enc_main(["-i", wav_file, "-o", mimi_path, "-n", "8",
                     "--synthetic", "--chunk-frames", "13"]) == 0
    codes = read_mimi_file(mimi_path)
    assert codes.shape == (13, 8)   # 1s = 12.5 -> 13 padded frames
    assert dec_main(["-i", mimi_path, "-o", out_wav, "--synthetic"]) == 0
    audio, rate = load_wav(out_wav)
    assert rate == 24_000 and len(audio) == 13 * 1920


def test_moshi_tts_cli(tmp_path):
    from moshi_tpu.tools.moshi_tts import main
    out = str(tmp_path / "tts.wav")
    rc = main(["hello", "world", "-o", out, "--synthetic",
               "--max-frames", "30"])
    assert rc == 0
    audio, rate = load_wav(out)
    assert rate == 24_000


def test_moshi_stt_cli(tmp_path, wav_file):
    from moshi_tpu.tools.moshi_stt import main
    srt = str(tmp_path / "out.srt")
    rc = main(["-i", wav_file, "-s", srt, "--synthetic"])
    assert rc == 0


def test_moshi_sts_bench_cli():
    from moshi_tpu.tools.moshi_sts import main
    rc = main(["--synthetic", "--bench", "--frames", "8"])
    assert rc == 0


def test_moshi_sts_file_mode(tmp_path, wav_file):
    from moshi_tpu.tools.moshi_sts import main
    out = str(tmp_path / "sts.wav")
    rc = main(["-i", wav_file, "-o", out, "--synthetic"])
    assert rc == 0
    audio, rate = load_wav(out)
    assert len(audio) == 13 * 1920
