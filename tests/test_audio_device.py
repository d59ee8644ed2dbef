"""Live audio device layer (io/audio_device.py — common_sdl.h:135-193's
device edge).  No audio hardware exists here, so the real backends are
exercised at their availability gates and through a fake libasound that
serves the same ctypes call surface; the structural loop (device
capture -> FrameFIFO -> compute -> device playback) runs end-to-end
through a registered fake backend."""

import ctypes

import numpy as np
import pytest

from moshi_tpu.io import audio_device as ad
from moshi_tpu.io.driver import FRAME_SAMPLES


class FakeCapture(ad.CaptureStream):
    def __init__(self, frames):
        self._frames = list(frames)

    def read(self, n):
        if not self._frames:
            return None
        f = self._frames.pop(0)
        assert len(f) == n
        return f


class FakePlayback(ad.PlaybackStream):
    def __init__(self):
        self.written = []

    def write(self, frame):
        self.written.append(np.array(frame, copy=True))


class FakeBackend:
    name = "fake"

    def __init__(self, frames):
        self._frames = frames
        self.playback = FakePlayback()

    def open_capture(self, samplerate=ad.SAMPLERATE):
        return FakeCapture(self._frames)

    def open_playback(self, samplerate=ad.SAMPLERATE):
        return self.playback


@pytest.fixture
def clean_registry(monkeypatch):
    monkeypatch.setattr(ad, "_REGISTRY", dict(ad._REGISTRY))


def test_no_backend_raises_with_causes(clean_registry, monkeypatch):
    """With no usable device stack, auto-resolve must fail with every
    backend's cause in the message (a user at a real deployment needs
    to see WHICH dependency to install).  The real gates are forced
    shut so this passes even on a dev box that HAS libasound."""
    monkeypatch.setattr(ad, "_load_alsa",
                        lambda: (_ for _ in ()).throw(
                            OSError("libasound.so.2: not found")))
    monkeypatch.setitem(__import__("sys").modules, "sounddevice", None)
    with pytest.raises(RuntimeError) as ei:
        ad.resolve_backend(None)
    msg = str(ei.value)
    assert "sounddevice" in msg and "alsa" in msg
    assert ad.available_backends() == []


def test_unknown_backend_name_lists_registered(clean_registry):
    with pytest.raises(RuntimeError, match="registered: alsa"):
        ad.resolve_backend("sounddevce")   # typo must not KeyError


def test_resolution_probes_device_open(clean_registry):
    """A backend whose library loads but whose device cannot OPEN (the
    headless-server-with-libasound case) must be skipped by auto-
    resolution and absent from available_backends."""

    class Constructs:
        name = "constructs"

        def open_capture(self, samplerate=ad.SAMPLERATE):
            raise RuntimeError("snd_pcm_open failed: -2")

    fb = FakeBackend([])
    ad._REGISTRY.clear()
    ad.register_backend("constructs", Constructs)
    ad.register_backend("fake", lambda: fb)
    assert ad.resolve_backend(None) is fb
    assert ad.available_backends() == ["fake"]


def test_registered_backend_resolves(clean_registry):
    fb = FakeBackend([])
    ad.register_backend("fake", lambda: fb)
    assert ad.resolve_backend("fake") is fb
    assert ad.resolve_backend(None) is fb        # auto picks the live one
    assert "fake" in ad.available_backends()


def test_run_device_loop_end_to_end(clean_registry):
    """capture -> FIFO -> step -> playback with latency accounting; the
    played audio is exactly step(captured)."""
    rng = np.random.default_rng(0)
    frames = [rng.standard_normal(FRAME_SAMPLES).astype(np.float32)
              for _ in range(5)]
    fb = FakeBackend(frames)
    ad.register_backend("fake", lambda: fb)

    # the fake capture isn't hardware-paced, so a depth-3 FIFO may drop
    # (that accounting is itself by-design); depth 8 holds every frame
    rep = ad.run_device_loop(lambda f: f * 0.5, name="fake",
                             fifo_depth=8)
    assert rep["frames"] == 5
    assert len(fb.playback.written) == 5
    for src, out in zip(frames, fb.playback.written):
        np.testing.assert_allclose(out, src * 0.5, rtol=1e-6)
    assert "latency_p50_ms" in rep and "capture_drops" in rep


def test_open_duplex_closes_capture_on_playback_failure(clean_registry):
    class Broken(FakeBackend):
        def open_playback(self, samplerate=ad.SAMPLERATE):
            raise RuntimeError("busy")

    closed = []
    b = Broken([])

    def cap_with_close(samplerate=ad.SAMPLERATE):
        c = FakeCapture([])
        c.close = lambda: closed.append(True)
        return c

    b.open_capture = cap_with_close
    ad.register_backend("fake", lambda: b)
    with pytest.raises(RuntimeError, match="busy"):
        ad.open_duplex("fake")
    assert closed == [True]


# ---------------------------------------------------------------------------
# ALSA ctypes path against a fake libasound (same call surface)
# ---------------------------------------------------------------------------


class FakeAsound:
    """Serves the exact ctypes surface _AlsaPcm uses.  FLOAT_LE is
    rejected so the S16_LE fallback (and its f32<->i16 conversion) is
    the path under test; readi serves a scripted int16 signal and
    writei records bytes back into int16."""

    def __init__(self, capture_i16):
        self._cap = np.ascontiguousarray(capture_i16, np.int16)
        self._pos = 0
        self.written = []
        self.recovers = 0
        self._fail_next_read = False

    def snd_pcm_open(self, pcmp, name, stream, mode):
        pcmp._obj.value = 0xBEEF
        return 0

    def snd_pcm_set_params(self, pcm, fmt, access, ch, rate, rs, lat):
        return -22 if fmt == ad._SND_PCM_FORMAT_FLOAT_LE else 0

    def fail_next_read(self):
        self._fail_next_read = True

    def snd_pcm_readi(self, pcm, buf, n):
        if self._fail_next_read:
            self._fail_next_read = False
            return -32                      # EPIPE xrun
        n = int(n.value if hasattr(n, "value") else n)
        take = min(n, len(self._cap) - self._pos)
        if take <= 0:
            return 0
        src = self._cap[self._pos:self._pos + take]
        ctypes.memmove(buf, src.ctypes.data, take * 2)
        self._pos += take
        return take

    def snd_pcm_writei(self, pcm, buf, n):
        n = int(n.value if hasattr(n, "value") else n)
        out = np.empty(n, np.int16)
        ctypes.memmove(out.ctypes.data, buf, n * 2)
        self.written.append(out)
        return n

    def snd_pcm_recover(self, pcm, err, silent):
        self.recovers += 1
        return 0

    def snd_pcm_close(self, pcm):
        return 0


def test_alsa_s16_roundtrip_and_recover():
    sig = (np.sin(np.linspace(0, 20, 2 * FRAME_SAMPLES))
           * 20000).astype(np.int16)
    lib = FakeAsound(sig)
    cap = ad._AlsaCapture(lib, "default", ad._SND_PCM_STREAM_CAPTURE,
                          ad.SAMPLERATE)
    assert cap.fmt == ad._SND_PCM_FORMAT_S16_LE   # FLOAT_LE fell back
    f1 = cap.read(FRAME_SAMPLES)
    np.testing.assert_allclose(
        f1, sig[:FRAME_SAMPLES].astype(np.float32) / 32768.0)

    lib.fail_next_read()                           # xrun: recover + retry
    f2 = cap.read(FRAME_SAMPLES)
    assert lib.recovers == 1 and f2 is not None

    play = ad._AlsaPlayback(lib, "default", ad._SND_PCM_STREAM_PLAYBACK,
                            ad.SAMPLERATE)
    play.write(f1)
    got = lib.written[-1]
    np.testing.assert_allclose(got, sig[:FRAME_SAMPLES], atol=1)
    cap.close()
    play.close()


def test_moshi_sts_device_flag_live_duplex(clean_registry, capsys):
    """`moshi-sts --device fake` runs the full-duplex pipeline live:
    mic frames in, moshi frames out (moshi-sts.cpp over common_sdl.h)."""
    rng = np.random.default_rng(2)
    frames = [rng.standard_normal(FRAME_SAMPLES).astype(np.float32) * 1e-3
              for _ in range(2)]
    fb = FakeBackend(frames)
    ad.register_backend("fake", lambda: fb)

    from moshi_tpu.tools import moshi_sts
    rc = moshi_sts.main(["--synthetic", "--device", "fake",
                         "--frames", "2"])
    assert rc == 0
    assert len(fb.playback.written) == 2
    for w in fb.playback.written:
        assert w.shape == (FRAME_SAMPLES,) and np.isfinite(w).all()
    assert '"sts_live_device"' in capsys.readouterr().out


def test_mimi_play_device_flag_uses_backend(clean_registry):
    """`mimi-play --echo --device fake` drives the real codec through
    the device loop (mimi-echo.cpp over common_sdl.h)."""
    rng = np.random.default_rng(1)
    frames = [rng.standard_normal(FRAME_SAMPLES).astype(np.float32) * 0.1
              for _ in range(3)]
    fb = FakeBackend(frames)
    ad.register_backend("fake", lambda: fb)

    from moshi_tpu.tools import mimi_play
    rc = mimi_play.main(["--echo", "--device", "fake", "--synthetic",
                         "--frames", "3"])
    assert rc == 0
    assert len(fb.playback.written) == 3
    for w in fb.playback.written:
        assert w.shape == (FRAME_SAMPLES,) and np.isfinite(w).all()
