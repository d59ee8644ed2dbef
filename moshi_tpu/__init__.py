"""moshi_tpu — a TPU-native streaming speech inference framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Codes4Fun/moshi.cpp (a GGML-based C++ engine): the Mimi streaming neural
audio codec (SEANet + streaming transformer + split-RVQ), the Moshi
dual-transformer LM (temporal transformer + depth transformer), weight-only
block quantization (q8_0 / q4_0 / q4_k class formats) with fused
dequant+matmul Pallas kernels, and the TTS / STT / full-duplex STS /
PersonaPlex workloads — plus a TPU-native distribution layer (mesh sharding,
session batching) that the single-device reference does not have.

Design mapping (reference -> TPU), see SURVEY.md §7:
  - prebuilt ggml graphs   -> jax.jit step functions with static shapes
  - StateContext buffers   -> explicit state pytrees threaded through steps
  - ScratchContext one-offs-> plain jitted helpers
  - ggml backend           -> XLA; hot quantized matmuls -> Pallas kernels
  - (absent) multi-device  -> jax.sharding.Mesh (sessions x model axes)
"""

__version__ = "0.1.0"

SAMPLE_RATE = 24_000   # reference: src/moshi/models/lm_default.h:3
FRAME_RATE = 12.5      # reference: src/moshi/models/lm_default.h:4
FRAME_SIZE = 1920      # SAMPLE_RATE / FRAME_RATE; reference: src/moshi.cpp:173-175

from moshi_tpu.config import MoshiConfig, load_config  # noqa: E402,F401


def __getattr__(name):  # lazy public API (avoids importing jax at pkg import)
    import importlib
    _API = {
        "MimiModel": "moshi_tpu.models.mimi",
        "MimiConfig": "moshi_tpu.models.mimi",
        "LMConfig": "moshi_tpu.models.lm",
        "STSPipeline": "moshi_tpu.runtime.pipeline",
        "STTPipeline": "moshi_tpu.runtime.pipeline",
        "TTSPipeline": "moshi_tpu.runtime.pipeline",
        "LMGenerator": "moshi_tpu.runtime.session",
        "MimiStreamer": "moshi_tpu.runtime.session",
        "SessionPool": "moshi_tpu.runtime.serving",
        "TTSSessionPool": "moshi_tpu.runtime.serving",
        "script_to_entries": "moshi_tpu.models.state_machine",
        "TokenIds": "moshi_tpu.models.state_machine",
        "TTSModel": "moshi_tpu.models.tts",
        "StateMachine": "moshi_tpu.models.state_machine",
        "SentencePieceTokenizer": "moshi_tpu.tokenizer",
        "QuantTensor": "moshi_tpu.quant.formats",
        "quantize": "moshi_tpu.quant.formats",
        "load_lm_params": "moshi_tpu.runtime.loader",
        "load_mimi_params": "moshi_tpu.runtime.loader",
    }
    if name in _API:
        return getattr(importlib.import_module(_API[name]), name)
    raise AttributeError(name)
