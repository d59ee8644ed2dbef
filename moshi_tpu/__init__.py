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
