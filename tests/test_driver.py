"""Tests for the async frame-FIFO driver (io/driver.py, the
common_sdl.h analog) and the tools' --realtime-sim / --interactive
loops built on it.  Simulation runs faster than realtime (pace=0 or
sim-speed) so the tests are quick."""

import sys
import threading
import time

import numpy as np
import pytest

from moshi_tpu.io.driver import (FRAME_SAMPLES, CaptureDriver, FrameFIFO,
                                 PlaybackSink, file_source, realtime_loop,
                                 synthetic_source)
from moshi_tpu.io.wav import load_wav, save_wav


def test_fifo_basic_roundtrip():
    fifo = FrameFIFO(frame_samples=4, depth=3)
    b = fifo.get_free()
    b[:] = [1, 2, 3, 4]
    fifo.push(b, stamp=1.0)
    stamp, frame = fifo.pop(0.1)
    assert stamp == 1.0
    np.testing.assert_array_equal(frame, [1, 2, 3, 4])
    fifo.recycle(frame)
    assert fifo.drops == 0


def test_fifo_drops_oldest_when_full():
    fifo = FrameFIFO(frame_samples=2, depth=2)
    for i in range(4):                    # 2 fit; 2 drop the oldest
        b = fifo.get_free()
        b[:] = i
        fifo.push(b)
    assert fifo.drops == 2
    vals = []
    while (item := fifo.pop(0.01)) is not None:
        vals.append(int(item[1][0]))
        fifo.recycle(item[1])
    assert vals == [2, 3]                 # newest survive


def test_fifo_pop_timeout_and_close():
    fifo = FrameFIFO(frame_samples=2, depth=2)
    t0 = time.perf_counter()
    assert fifo.pop(0.05) is None
    assert time.perf_counter() - t0 >= 0.04
    # close releases a blocked consumer
    done = threading.Event()

    def consumer():
        assert fifo.pop(5.0) is None
        done.set()

    threading.Thread(target=consumer, daemon=True).start()
    time.sleep(0.02)
    fifo.close()
    assert done.wait(1.0)


def test_capture_driver_file_source_end_to_end():
    audio = np.arange(FRAME_SAMPLES * 5, dtype=np.float32)
    fifo = FrameFIFO(depth=8)     # deeper than the stream: no drops
    sink = PlaybackSink(budget=10.0)      # generous: no late frames
    cap = CaptureDriver(file_source(audio), fifo, pace=0).start()
    rep = realtime_loop(fifo, lambda f: f * 2.0, sink)
    cap.join(1.0)
    assert rep["frames"] == 5
    assert rep["late"] == 0
    assert rep["capture_drops"] == 0
    np.testing.assert_allclose(sink.audio(), audio * 2.0)


def test_realtime_loop_reports_late_frames_and_drops():
    # consumer slower than producer: frames must drop and arrive late
    fifo = FrameFIFO(frame_samples=8, depth=2)
    sink = PlaybackSink(budget=0.001)
    cap = CaptureDriver(synthetic_source(frame_samples=8, frames=20),
                        fifo, pace=0.002).start()

    def slow_step(f):
        time.sleep(0.01)
        return f

    rep = realtime_loop(fifo, slow_step, sink, timeout=0.5)
    cap.join(2.0)
    assert rep["frames"] + rep["capture_drops"] == 20
    assert rep["capture_drops"] > 0
    assert rep["late"] > 0
    assert rep["latency_p99_ms"] >= rep["latency_p50_ms"]


def test_synthetic_source_distinct_frames():
    src = synthetic_source(frame_samples=16, frames=4)
    frames = [src(i) for i in range(5)]
    assert frames[4] is None
    # elision-proofing: every frame distinct
    assert not np.array_equal(frames[0], frames[1])


def test_mimi_echo_realtime_sim(tmp_path, rng):
    from moshi_tpu.tools.mimi_play import main
    path = str(tmp_path / "in.wav")
    save_wav(path, (rng.standard_normal(1920 * 4) * 0.1).astype(np.float32),
             24_000)
    out = str(tmp_path / "echo.wav")
    rc = main(["-i", path, "-o", out, "--echo", "--realtime-sim",
               "--sim-speed", "100", "--synthetic", "-n", "8"])
    assert rc == 0
    audio, rate = load_wav(out)
    assert rate == 24_000 and len(audio) > 0


def test_moshi_sts_realtime_sim(tmp_path, rng, capsys):
    from moshi_tpu.tools.moshi_sts import main
    path = str(tmp_path / "in.wav")
    save_wav(path, (rng.standard_normal(1920 * 5) * 0.1).astype(np.float32),
             24_000)
    out = str(tmp_path / "sts.wav")
    rc = main(["-i", path, "-o", out, "--synthetic", "--realtime-sim",
               "--sim-speed", "100"])
    assert rc == 0
    got = capsys.readouterr().out
    assert "sts_realtime_sim" in got
    assert "sustained_fps" in got


def test_moshi_tts_interactive(tmp_path, monkeypatch):
    """Feed-while-generating: lines arrive on stdin while the frame loop
    runs (moshi-tts.cpp:51-86)."""
    import io

    class SlowLines:
        """stdin stand-in whose second line arrives later."""

        def __init__(self, lines, delay):
            self._lines = lines
            self._delay = delay

        def __iter__(self):
            for i, line in enumerate(self._lines):
                if i:
                    time.sleep(self._delay)
                yield line

    from moshi_tpu.tools import moshi_tts
    monkeypatch.setattr(sys, "stdin", SlowLines(["hello there\n",
                                                 "more words\n"], 0.2))
    out = str(tmp_path / "tts.wav")
    rc = moshi_tts.main(["-o", out, "--synthetic", "--interactive",
                         "--max-frames", "120"])
    assert rc == 0
    audio, rate = load_wav(out)
    assert rate == 24_000
