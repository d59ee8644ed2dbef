import hashlib
import json

import numpy as np
import pytest

from moshi_tpu.io.mimi_file import write_mimi_file
from moshi_tpu.io.wav import load_wav, save_wav


def test_moshi_dl_verify(tmp_path):
    from moshi_tpu.tools.moshi_dl import main, sha256_file
    f = tmp_path / "weights.bin"
    f.write_bytes(b"hello moshi")
    manifest = {
        "files": [{"host": "https://example.invalid", "path": "x/y",
                   "filename": "weights.bin",
                   "sha256": hashlib.sha256(b"hello moshi").hexdigest()}]
    }
    mpath = tmp_path / "m.json"
    mpath.write_text(json.dumps(manifest))
    assert main([str(mpath), "-o", str(tmp_path), "--verify-only"]) == 0
    # corrupt -> failure
    f.write_bytes(b"corrupted")
    assert main([str(mpath), "-o", str(tmp_path), "--verify-only"]) == 1


def test_mimi_play_cli(tmp_path, rng):
    from moshi_tpu.tools.mimi_play import main
    mimi_path = str(tmp_path / "t.mimi")
    codes = rng.integers(0, 64, size=(4, 8)).astype(np.int16)
    write_mimi_file(mimi_path, codes)
    out = str(tmp_path / "o.wav")
    assert main(["-i", mimi_path, "-o", out, "--synthetic"]) == 0
    audio, rate = load_wav(out)
    assert len(audio) == 4 * 1920


def test_mimi_echo_cli(tmp_path, rng):
    from moshi_tpu.tools.mimi_play import main
    wav_in = str(tmp_path / "in.wav")
    save_wav(wav_in, rng.normal(size=1920 * 3).astype(np.float32) * 0.1, 24000)
    out = str(tmp_path / "echo.wav")
    assert main(["-i", wav_in, "-o", out, "--echo", "-n", "8",
                 "--synthetic"]) == 0


def test_personaplex_cli(tmp_path):
    from moshi_tpu.tools.personaplex import main
    out = str(tmp_path / "pp.wav")
    rc = main(["--synthetic", "-o", out, "--frames", "4",
               "-p", "be nice"])
    assert rc == 0
    audio, _ = load_wav(out)
    assert len(audio) == 4 * 1920


def test_quantized_cache_flow(tmp_path, rng):
    """-q + -g: first load quantizes + writes cache; second load reads it."""
    import argparse
    import jax.numpy as jnp
    from moshi_tpu.config import parse_config
    from moshi_tpu.io.safetensors import save_safetensors
    from moshi_tpu.tools.common import load_lm
    from tests.test_loader import _lm_checkpoint, _lm_cfg

    ckpt = _lm_checkpoint(rng)
    path = tmp_path / "model.safetensors"
    save_safetensors(str(path), ckpt)
    config = parse_config({
        "dim": 32, "num_heads": 4, "num_layers": 2, "hidden_scale": 2.0,
        "context": 16, "card": 32, "n_q": 4, "dep_q": 2, "text_card": 48,
        "delays": [0, 0, 1, 1, 2], "depformer_dim": 16,
        "depformer_num_heads": 2, "depformer_num_layers": 2,
        "depformer_dim_feedforward": 32,
        "depformer_low_rank_embeddings": 8,
        "extra_heads_num_heads": 3, "extra_heads_dim": 2,
        "moshi_name": "model.safetensors"})
    args = argparse.Namespace(synthetic=False, quantize="q8_0",
                              use_cache=True, model_dir=str(tmp_path))
    cfg1, p1 = load_lm(args, config)
    cache = tmp_path / "model.safetensors.q8_0.moshi-tpu"
    assert cache.exists()
    cfg2, p2 = load_lm(args, config)   # second load hits the cache
    import jax
    assert (jax.tree_util.tree_structure(p1) ==
            jax.tree_util.tree_structure(p2))
    a = jax.tree_util.tree_leaves(p1)[0]
    b = jax.tree_util.tree_leaves(p2)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_moshi_stt_scan_matches_per_frame(tmp_path, rng):
    """--scan (chunked multi-frame lax.scan, one launch per chunk) must
    transcribe identically to the per-frame loop."""
    import subprocess  # noqa: F401  (pattern parity with other tests)
    from moshi_tpu.io.wav import save_wav
    from moshi_tpu.tools.moshi_stt import main
    path = str(tmp_path / "in.wav")
    save_wav(path, (rng.standard_normal(24_000 * 2) * 0.1
                    ).astype(np.float32), 24_000)

    import contextlib
    import io

    def run(extra):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = main(["-i", path, "--synthetic"] + extra)
        assert rc == 0
        return buf.getvalue().splitlines()

    per_frame = run([])
    scanned = run(["--scan"])
    # transcript (first line) identical; fps line differs
    assert scanned[0] == per_frame[0]


def test_moshi_tts_scan_mode(tmp_path):
    """--scan (device FSM + chunked lax.scans) produces audio and ends
    at the script end like the per-frame device path."""
    from moshi_tpu.io.wav import load_wav
    from moshi_tpu.tools.moshi_tts import main
    out = str(tmp_path / "tts.wav")
    rc = main(["hello", "there", "world", "-o", out, "--synthetic",
               "--scan", "--max-frames", "120"])
    assert rc == 0
    audio, rate = load_wav(out)
    assert rate == 24_000 and len(audio) > 0


def test_moshi_tts_scan_end_near_chunk_tail(tmp_path, monkeypatch):
    """The end token can land near the tail of the last scan chunk, with
    end + delay_steps + final_padding extending PAST the generated
    frames — the tail top-up must generate through the delay window
    instead of IndexError-ing on assembly (round-5 hardware repro: a 3x
    bench text crashed at audio[448]).  Tiny 1-frame chunks + a text
    sweep make the boundary land everywhere."""
    from moshi_tpu.io.wav import load_wav
    from moshi_tpu.tools.moshi_tts import main
    monkeypatch.setenv("MOSHI_TPU_SCAN_CHUNKS", "8,4,1")
    from moshi_tpu.runtime.pipeline import TTSPipeline
    monkeypatch.setattr(TTSPipeline, "SCAN_CHUNKS", (8, 4, 1))
    words = ["hello", "there", "quite", "a", "few", "more", "words",
             "to", "move", "the", "end", "boundary"]
    for n in (3, 7, 12):
        out = str(tmp_path / f"tts{n}.wav")
        rc = main(words[:n] + ["-o", out, "--synthetic", "--scan",
                               "--max-frames", "150"])
        assert rc == 0
        audio, rate = load_wav(out)
        assert rate == 24_000 and len(audio) > 0
