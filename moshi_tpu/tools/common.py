"""Shared CLI plumbing: model path resolution, config+weights loading.

Capability parity with /root/reference/tools/common_utils.h (MODEL_CACHE
env var, multi-location model path resolution: moshi-tts.cpp:281-330) and
common_ggml.h (backend selection — here: JAX platform/device listing).
The SDL/FFmpeg realtime I/O of the reference tools is replaced by WAV
file I/O (moshi_tpu/io/wav.py): this environment ships no audio stack,
and file mode matches the reference's own -i/-o file paths.
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: repeated tool runs skip recompiles (the
# remote-compile link makes cold 7B compiles cost tens of minutes);
# same default as bench.py
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass


def model_cache_dir() -> Path:
    env = os.environ.get("MODEL_CACHE")
    if env:
        return Path(env)
    return Path.home() / ".cache" / "moshi"


def resolve_model_file(name: str, model_dir: Optional[str] = None) -> Path:
    """Reference search order: explicit dir, cwd, MODEL_CACHE."""
    cands = []
    if model_dir:
        cands.append(Path(model_dir) / name)
    cands.append(Path(name))
    cands.append(model_cache_dir() / name)
    for c in cands:
        if c.exists():
            return c
    raise FileNotFoundError(
        f"model file {name!r} not found (searched: "
        + ", ".join(str(c) for c in cands) + ")")


def list_devices():
    for i, d in enumerate(jax.devices()):
        print(f"{i}: {d.device_kind} ({d.platform})")


def add_common_args(ap: argparse.ArgumentParser):
    ap.add_argument("-d", "--model-dir", default=None,
                    help="directory containing model files")
    ap.add_argument("-l", "--list-devices", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--synthetic", action="store_true",
                    help="random weights (no checkpoint needed; for "
                         "smoke tests and benches)")
    ap.add_argument("-q", "--quantize", default=None,
                    choices=["q4_0", "q4_k", "q8_0", "q8_r"],
                    help="weight-only quantization at load")
    ap.add_argument("-g", "--use-cache", action="store_true",
                    help="cache the quantized model to disk and reload "
                         "from it (the reference's GGUF-cache flow)")
    ap.add_argument("--window", type=int, default=1,
                    help="host-sync every N frames (1 = reference-style "
                         "per-frame consumption; N>1 amortizes the "
                         "remote-dispatch RPC, modeling host-local "
                         "production dispatch)")


def load_mimi(args, n_q: int = 32):
    """Build MimiModel (+params from checkpoint or random)."""
    from moshi_tpu.models.mimi import MimiConfig, MimiModel
    from moshi_tpu.runtime.loader import load_mimi_params
    cfg = MimiConfig(n_q=n_q)
    model = MimiModel(cfg)
    if args.synthetic:
        params = model.init_params(jax.random.PRNGKey(0), jnp.bfloat16)
    else:
        path = resolve_model_file(args.mimi_file, args.model_dir)
        params = load_mimi_params(str(path), model)
    return model, params


def load_lm(args, config):
    """Build LMConfig + params from a MoshiConfig."""
    from moshi_tpu.models.lm import LMConfig
    from moshi_tpu.runtime.loader import load_lm_params
    from moshi_tpu.runtime.synth import synth_lm_params
    audio_delay = 0.0
    if config.model_type == "tts" or getattr(args, "tts", False):
        audio_delay = config.tts_config.audio_delay
    elif config.model_type == "stt" or getattr(args, "stt", False):
        audio_delay = config.stt_config.audio_delay_seconds
    cfg = LMConfig.from_moshi_config(config, audio_delay=audio_delay)
    if args.synthetic:
        params = synth_lm_params(jax.random.PRNGKey(0), cfg,
                                 fmt=args.quantize)
    else:
        path = resolve_model_file(config.moshi_name, args.model_dir)
        use_cache = getattr(args, "use_cache", False) and args.quantize
        if use_cache:
            from moshi_tpu.runtime.cache import (load_quantized,
                                                 save_quantized)
            cache_path = Path(str(path) + f".{args.quantize}.moshi-tpu")
            if cache_path.exists():
                print(f"loading quantized cache {cache_path}")
                return cfg, load_quantized(str(cache_path))
            params = load_lm_params(str(path), cfg, fmt=args.quantize)
            print(f"writing quantized cache {cache_path}")
            save_quantized(str(cache_path), params,
                           metadata={"fmt": args.quantize})
            return cfg, params
        params = load_lm_params(str(path), cfg, fmt=args.quantize)
    return cfg, params


def load_tokenizer(args, config):
    from moshi_tpu.tokenizer import SentencePieceTokenizer
    if args.synthetic:
        return None
    path = resolve_model_file(config.tokenizer_name, args.model_dir)
    return SentencePieceTokenizer.from_file(str(path))


def read_audio_24k(path: str) -> np.ndarray:
    """Decode any supported media file (WAV/AIFF/AU natively; mp3/ogg/
    containers via an ffmpeg binary when present) to 24 kHz mono float32
    — the common_av.h Decoder+Resampler capability."""
    from moshi_tpu.io.media import load_audio
    x, _ = load_audio(path, rate=24_000)
    return x
