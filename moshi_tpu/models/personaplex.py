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

from moshi_tpu.models.lm import LMConfig, lm_gen_step
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


_EMB_PRIME_CACHE: dict = {}


def _emb_prime_fn(cfg: LMConfig):
    """Compiled embeddings-replay priming: ONE jitted lax.scan over the
    prompt frames (round-4: the former eager python loop ran T unjitted
    32-layer forwards — hours at 7B over a remote-dispatch link;
    reference runs prebuilt graphs here, lm.h:1120-1134).

    The reference also runs the depformer per prompt frame and discards
    its tokens (lm.h:1016-1036; the delay cache is overwritten from the
    file right after) — dead compute we deliberately let XLA eliminate.
    The per-frame rng split is kept so the sampling stream downstream of
    priming is unchanged."""
    fn = _EMB_PRIME_CACHE.get(cfg)
    if fn is None:
        def prime(params, kv, offset, rng, emb):       # emb [C, dim]
            def body(carry, e):
                kv, offset, rng = carry
                _, _, kv = forward_embedding(cfg, params, kv,
                                             e[None, None, :], offset)
                rng, _ = jax.random.split(rng)
                return (kv, offset + 1, rng), None
            (kv, offset, rng), _ = jax.lax.scan(body, (kv, offset, rng),
                                                emb)
            return kv, offset, rng
        fn = jax.jit(prime, donate_argnums=(1,))
        _EMB_PRIME_CACHE[cfg] = fn
    return fn


def prime_with_voice_embeddings(cfg: LMConfig, params, state,
                                embeddings: np.ndarray,
                                cache: np.ndarray,
                                temp: float = 0.8, top_k: int = 250):
    """Precomputed-voice priming (lm.h:998-1052): run the prompt
    embedding frames through the transformer (one compiled scan; this
    warms the KV cache), then overwrite the delay cache with the shipped
    contents.

    embeddings: [T, dim] (voice.embeddings); cache: [CT, K] int32
    (voice.cache, stored [K, CT] in the file — transpose before calling).
    """
    emb = np.asarray(embeddings, np.float32)                  # [T, dim]
    fn = _emb_prime_fn(cfg)
    kv, offset, rng = state["transformer"], state["offset"], state["rng"]
    pos = 0
    for c in _chunk_lengths(emb.shape[0]):
        kv, offset, rng = fn(params, kv, offset, rng,
                             jnp.asarray(emb[pos: pos + c]))
        pos += c
    cache_arr = jnp.asarray(np.asarray(cache, np.int32))[None]   # [1, CT, K]
    assert cache_arr.shape[1:] == state["cache"].shape[1:], \
        f"voice cache {cache_arr.shape} vs {state['cache'].shape}"
    return {"transformer": kv, "cache": cache_arr, "offset": offset,
            "rng": rng}


def _forced_frame(cfg: LMConfig, tokens: List[int]):
    return jnp.asarray(tokens, jnp.int32)[None, : cfg.num_codebooks]


_FRAME_PRIME_CACHE: dict = {}


def _frame_prime_fn(cfg: LMConfig, temp: float, temp_text: float,
                    top_k: int, top_k_text: int):
    """Compiled forced-frame priming: ONE jitted lax.scan running the
    full lmgen step per prompt frame (reference: tens-to-hundreds of
    prebuilt-graph steps, lm.h:1120-1134; the former per-frame eager
    python loop was unusable at 7B scale over a remote link)."""
    key = (cfg, temp, temp_text, top_k, top_k_text)
    fn = _FRAME_PRIME_CACHE.get(key)
    if fn is None:
        def prime(params, state, frames):           # frames [T, B, K]
            def body(st, frame):
                _, st = lm_gen_step(cfg, params, st, forced_frame=frame,
                                    temp=temp, temp_text=temp_text,
                                    top_k=top_k, top_k_text=top_k_text)
                return st, None
            st, _ = jax.lax.scan(body, state, frames)
            return st
        fn = jax.jit(prime, donate_argnums=(1,))
        _FRAME_PRIME_CACHE[key] = fn
    return fn


# scan length is a static shape: chunk arbitrary prompt lengths into a
# few fixed sizes so at most len(_CHUNKS) programs are ever compiled
# (a fresh 7B compile costs tens of minutes on a remote-compile link)
_CHUNKS = (64, 16, 4, 1)


def _chunk_lengths(t: int):
    out = []
    for c in _CHUNKS:
        while t >= c:
            out.append(c)
            t -= c
    return out


def prime_frames(cfg: LMConfig, params, state, frames,
                 temp: float = 0.8, temp_text: float = 0.7,
                 top_k: int = 250, top_k_text: int = 25):
    """Run a sequence of forced PROMPT_TOKENS-style frames through the
    lmgen step in compiled scans (chunked to the fixed sizes in _CHUNKS).
    frames: [T, K] token rows (host list/array), broadcast over the
    state's batch dim."""
    frames = np.asarray(frames, np.int32)[:, : cfg.num_codebooks]
    b = state["offset"].shape[0]
    fn = _frame_prime_fn(cfg, temp, temp_text, top_k, top_k_text)
    pos = 0
    for c in _chunk_lengths(frames.shape[0]):
        chunk = frames[pos: pos + c]
        pos += c
        dev = jnp.asarray(np.broadcast_to(
            chunk[:, None, :], (c, b, chunk.shape[1])))
        state = fn(params, state, dev)
    return state


def prime_step(cfg: LMConfig, params, state, tokens: List[int],
               temp: float = 0.8, temp_text: float = 0.7,
               top_k: int = 250, top_k_text: int = 25):
    """One forced PROMPT_TOKENS-style frame (full frame provided)."""
    return prime_frames(cfg, params, state, [tokens], temp=temp,
                        temp_text=temp_text, top_k=top_k,
                        top_k_text=top_k_text)


def _audio_prompt_frames(audio_codes: List[List[int]]) -> np.ndarray:
    """lm.h:1053-1076: mimi codes of the voice sample replayed in the
    input slots of the PROMPT_TOKENS template."""
    dep_q = 8  # personaplex
    rows = []
    for codes in audio_codes:
        tokens = list(PROMPT_TOKENS)
        for j in range(min(dep_q, len(codes))):
            tokens[j + 1] = int(codes[j])
        rows.append(tokens)
    return np.asarray(rows, np.int32)


def prime_with_audio(cfg: LMConfig, params, state,
                     audio_codes: List[List[int]], **kw):
    """Raw-audio voice prompt (lm.h:1053-1076): replay mimi codes of the
    voice sample in the input slots of the PROMPT_TOKENS template."""
    return prime_frames(cfg, params, state,
                        _audio_prompt_frames(audio_codes), **kw)


def prime_system_prompts(cfg: LMConfig, params, state,
                         text_prompt_tokens: List[int],
                         voice_embeddings: Optional[np.ndarray] = None,
                         voice_cache: Optional[np.ndarray] = None,
                         voice_audio_codes=None,
                         silence_frames: int = 6, **kw):
    """Full priming sequence (lm.h:1120-1134): voice prompt, 6 silence
    frames, system-prompt text frames, 6 silence frames.  Everything
    after the voice prompt is ONE compiled scan over the stacked frames
    (the audio-voice variant folds its replay frames into the same
    scan)."""
    rows = []
    if voice_embeddings is not None and voice_cache is not None:
        state = prime_with_voice_embeddings(cfg, params, state,
                                            voice_embeddings, voice_cache)
    elif voice_audio_codes:
        rows.append(_audio_prompt_frames(voice_audio_codes))
    silence = np.asarray([PROMPT_TOKENS] * silence_frames, np.int32)
    text_rows = np.asarray([PROMPT_TOKENS] * len(text_prompt_tokens),
                           np.int32)
    if len(text_prompt_tokens):
        text_rows[:, 0] = np.asarray(text_prompt_tokens, np.int32)
    rows += [silence, text_rows, silence]
    frames = np.concatenate([r for r in rows if len(r)], axis=0)
    return prime_frames(cfg, params, state, frames, **kw)


def load_voice_file(path: str, cfg: Optional[LMConfig] = None):
    """Load a PersonaPlex voice file (.safetensors or .gguf): returns
    (embeddings [T, dim] | None, cache [CT, K] | None, speaker_wavs | None).
    The cache ships [K, CT] (reference notes inverted dims,
    lm.h:1038-1045).  GGUF voices per moshi.cpp:789-836.

    Pass `cfg` to orient the cache from the known stream count K =
    cfg.num_codebooks instead of the longest-axis heuristic (a voice
    with CT >= K would otherwise silently mis-orient — VERDICT r3 #7)."""
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
        if cfg is not None:
            k = cfg.num_codebooks
            if c.shape[1] == k and c.shape[0] != k:
                cache = c.astype(np.int32)             # already [CT, K]
            elif c.shape[0] == k:
                cache = c.T.astype(np.int32)           # stored [K, CT]
            else:
                raise ValueError(
                    f"voice.cache shape {c.shape} matches neither "
                    f"[CT, {k}] nor [{k}, CT] for this model")
        else:
            cache = c.T.astype(np.int32) if c.shape[0] > c.shape[1] else \
                c.astype(np.int32)
    if "voice.speaker_wavs" in st:
        wavs = np.asarray(st["voice.speaker_wavs"], np.float32)
    st.close()
    return emb, cache, wavs
