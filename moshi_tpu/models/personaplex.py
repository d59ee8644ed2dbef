"""PersonaPlex session priming: voice prompt + system prompt.

Behavioral parity with /root/reference/src/moshi/models/lm.h:983-1134 and
moshi.cpp:789-849:

  * PROMPT_TOKENS: the fixed 17-token frame template (text=3 + 8 moshi +
    8 input codes) used for silence/system-prompt frames (lm.h:983-987);
  * voice prompt from a precomputed voice file: feed
    ``voice.embeddings`` [T, dim] directly through the temporal
    transformer (bypassing token embedding), force text=3, run the
    depformer, then overwrite the delay cache from ``voice.cache``
    (lm.h:989-1052);
  * or voice prompt from raw audio: mimi-encode, replay as full forced
    frames with the PROMPT_TOKENS template (lm.h:1053-1076);
  * system prompt: "<system> ... <system>" text tokens in PROMPT_TOKENS
    frames, bracketed by 6 silence frames each side (lm.h:1120-1134,
    moshi.cpp:838-849);
  * personaplex models run with dep_q = 8 of 16 (lm.h:803-804 — handled
    by LMConfig.runtime_dep_q).
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from moshi_tpu.models.lm import LMConfig, lm_gen_step, depformer_generate
from moshi_tpu.nn.layers import linear, rms_norm
from moshi_tpu.nn.transformer import transformer_forward

# lm.h:983-987
PROMPT_TOKENS = [
    3,                                                   # text
    948, 243, 1178, 546, 1736, 1030, 1978, 2008,         # moshi stream
    430, 1268, 381, 1611, 1095, 1495, 56, 472,           # input stream
]


def forward_embedding(cfg: LMConfig, params, kv_state, embeddings, offset):
    """Temporal forward from precomputed input embeddings [B, T, dim]
    (lm.h moshi_lmmodel_forward_embedding)."""
    h, new_kv = transformer_forward(cfg.transformer, params["transformer"],
                                    kv_state, embeddings, offset)
    h = rms_norm(params["out_norm"], h)
    logits = linear(params["text_linear"], h, out_dtype=jnp.float32)
    return h, logits, new_kv


def prime_with_voice_embeddings(cfg: LMConfig, params, state,
                                embeddings: np.ndarray,
                                cache: np.ndarray,
                                temp: float = 0.8, top_k: int = 250):
    """Precomputed-voice priming (lm.h:998-1052): run each prompt
    embedding frame through the transformer + depformer (outputs
    discarded; this warms the KV cache), then overwrite the delay cache
    with the shipped contents.

    embeddings: [T, dim] (voice.embeddings); cache: [CT, K] int32
    (voice.cache, stored [K, CT] in the file — transpose before calling).
    """
    emb = jnp.asarray(np.asarray(embeddings, np.float32))[None]  # [1,T,dim]
    t = emb.shape[1]
    kv = state["transformer"]
    offset = state["offset"]
    rng = state["rng"]
    for i in range(t):
        h, _, kv = forward_embedding(cfg, params, kv, emb[:, i:i + 1], offset)
        rng, k = jax.random.split(rng)
        text = jnp.full((1,), 3, jnp.int32)
        depformer_generate(cfg, params, h[:, -1], text, k, temp, top_k)
        offset = offset + 1
    cache_arr = jnp.asarray(np.asarray(cache, np.int32))[None]   # [1, CT, K]
    assert cache_arr.shape[1:] == state["cache"].shape[1:], \
        f"voice cache {cache_arr.shape} vs {state['cache'].shape}"
    return {"transformer": kv, "cache": cache_arr, "offset": offset,
            "rng": rng}


def _forced_frame(cfg: LMConfig, tokens: List[int]):
    return jnp.asarray(tokens, jnp.int32)[None, : cfg.num_codebooks]


def prime_step(cfg: LMConfig, params, state, tokens: List[int],
               temp: float = 0.8, temp_text: float = 0.7,
               top_k: int = 250, top_k_text: int = 25):
    """One forced PROMPT_TOKENS-style frame (full frame provided)."""
    out, state = lm_gen_step(cfg, params, state,
                             forced_frame=_forced_frame(cfg, tokens),
                             temp=temp, temp_text=temp_text,
                             top_k=top_k, top_k_text=top_k_text)
    return state


def prime_with_audio(cfg: LMConfig, params, state,
                     audio_codes: List[List[int]], **kw):
    """Raw-audio voice prompt (lm.h:1053-1076): replay mimi codes of the
    voice sample in the input slots of the PROMPT_TOKENS template."""
    dep_q = 8  # personaplex
    for codes in audio_codes:
        tokens = list(PROMPT_TOKENS)
        for j in range(min(dep_q, len(codes))):
            tokens[j + 1] = int(codes[j])
        state = prime_step(cfg, params, state, tokens, **kw)
    return state


def prime_system_prompts(cfg: LMConfig, params, state,
                         text_prompt_tokens: List[int],
                         voice_embeddings: Optional[np.ndarray] = None,
                         voice_cache: Optional[np.ndarray] = None,
                         voice_audio_codes=None,
                         silence_frames: int = 6, **kw):
    """Full priming sequence (lm.h:1120-1134): voice prompt, 6 silence
    frames, system-prompt text frames, 6 silence frames."""
    if voice_embeddings is not None and voice_cache is not None:
        state = prime_with_voice_embeddings(cfg, params, state,
                                            voice_embeddings, voice_cache)
    elif voice_audio_codes:
        state = prime_with_audio(cfg, params, state, voice_audio_codes, **kw)
    for _ in range(silence_frames):
        state = prime_step(cfg, params, state, PROMPT_TOKENS, **kw)
    for tok in text_prompt_tokens:
        tokens = list(PROMPT_TOKENS)
        tokens[0] = int(tok)
        state = prime_step(cfg, params, state, tokens, **kw)
    for _ in range(silence_frames):
        state = prime_step(cfg, params, state, PROMPT_TOKENS, **kw)
    return state


def load_voice_file(path: str):
    """Load a PersonaPlex voice file (.safetensors or .gguf): returns
    (embeddings [T, dim] | None, cache [CT, K] | None, speaker_wavs | None).
    The cache ships [K, CT] (reference notes inverted dims,
    lm.h:1038-1045).  GGUF voices per moshi.cpp:789-836."""
    if path.endswith(".gguf"):
        from moshi_tpu.runtime.loader import _GGUFAdapter
        st = _GGUFAdapter(path)
    else:
        from moshi_tpu.io.safetensors import SafeTensors
        st = SafeTensors(path)
    emb = cache = wavs = None
    if "voice.embeddings" in st:
        emb = st["voice.embeddings"]
        emb = np.asarray(emb, np.float32).reshape(emb.shape[0], -1)
    if "voice.cache" in st:
        c = np.asarray(st["voice.cache"])
        cache = c.T.astype(np.int32) if c.shape[0] > c.shape[1] else \
            c.astype(np.int32)
    if "voice.speaker_wavs" in st:
        wavs = np.asarray(st["voice.speaker_wavs"], np.float32)
    st.close()
    return emb, cache, wavs
