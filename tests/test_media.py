"""Media I/O (io/media.py): container decode capability + windowed-sinc
resampler quality (VERDICT r1 item 9; reference tools/common_av.h)."""

import os
import wave

import numpy as np
import pytest

from moshi_tpu.io.media import (have_ffmpeg, load_audio, resample_sinc,
                                save_audio)
from moshi_tpu.io.wav import save_wav


def _tone(rate, freq=440.0, secs=0.5, amp=0.5):
    t = np.arange(int(rate * secs)) / rate
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_resample_sinc_tone_quality():
    """A pure tone survives 48k -> 24k with high fidelity (the linear
    interpolator leaves audible error; the sinc filter must not)."""
    x48 = _tone(48_000, 1000.0, 0.25)
    y24 = resample_sinc(x48, 48_000, 24_000)
    ref = _tone(24_000, 1000.0, 0.25)
    n = min(len(y24), len(ref))
    # ignore filter edges
    s = slice(256, n - 256)
    err = np.sqrt(np.mean((y24[s] - ref[s]) ** 2))
    assert err < 1e-3, err
    # and a non-integer ratio (44.1k -> 24k)
    x441 = _tone(44_100, 1000.0, 0.25)
    y = resample_sinc(x441, 44_100, 24_000)
    ref = _tone(24_000, 1000.0, 0.25)
    n = min(len(y), len(ref))
    s = slice(256, n - 256)
    assert np.sqrt(np.mean((y[s] - ref[s]) ** 2)) < 1e-3


def test_resample_identity():
    x = _tone(24_000)
    assert resample_sinc(x, 24_000, 24_000) is not None
    np.testing.assert_array_equal(resample_sinc(x, 24_000, 24_000), x)


def _write_aiff(path, x, rate):
    import aifc
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype(">i2")
    with aifc.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())


def test_load_aiff(tmp_path):
    x = _tone(48_000)
    p = str(tmp_path / "t.aiff")
    _write_aiff(p, x, 48_000)
    y, rate = load_audio(p, rate=24_000)
    assert rate == 24_000
    assert abs(len(y) - len(x) // 2) <= 2
    ref = _tone(24_000)
    n = min(len(y), len(ref))
    s = slice(256, n - 256)
    assert np.sqrt(np.mean((y[s] - ref[s]) ** 2)) < 2e-3


def test_mimi_encode_accepts_aiff(tmp_path):
    """The reference workflow `mimi-encode some.mp3` generalizes: a
    non-WAV container file drives the codec CLI end-to-end."""
    from moshi_tpu.io.mimi_file import read_mimi_file
    from moshi_tpu.tools.mimi_encode import main
    p = str(tmp_path / "in.aiff")
    _write_aiff(p, _tone(48_000, secs=0.4), 48_000)
    out = str(tmp_path / "out.mimi")
    assert main(["-i", p, "-o", out, "--synthetic"]) == 0
    codes = read_mimi_file(out)
    assert codes.shape[0] >= 1


def test_unknown_format_errors_without_ffmpeg(tmp_path):
    p = str(tmp_path / "t.xyz")
    open(p, "wb").write(b"\x00" * 64)
    if have_ffmpeg():
        with pytest.raises(RuntimeError, match="ffmpeg decode failed"):
            load_audio(p)
    else:
        with pytest.raises(RuntimeError, match="no native decoder"):
            load_audio(p)


@pytest.mark.skipif(not have_ffmpeg(), reason="no ffmpeg binary")
def test_mp3_roundtrip_via_ffmpeg(tmp_path):
    x = _tone(24_000, secs=0.3)
    p = str(tmp_path / "t.mp3")
    save_audio(p, x, 24_000)
    y, rate = load_audio(p, rate=24_000)
    assert rate == 24_000 and len(y) > 0
