"""PersonaPlex 7B priming time on hardware (VERDICT r3 item 3).

The reference primes a session with tens-to-hundreds of full lmgen
steps through prebuilt graphs (lm.h:1120-1134).  Round 3's eager python
loop would have taken hours at 7B over the remote link; round 4 compiles
the priming as chunked lax.scans (models/personaplex.py).  This bench
times a realistic priming sequence — a 125-frame (10 s) audio voice
prompt + 6 silence + 32 system-prompt tokens + 6 silence — on the 7B
personaplex geometry with synthetic q4_k weights, and closes the clock
with a D->H fetch of the primed state's offset (block_until_ready can
ack early on this rig).

Prints ONE JSON line: {"metric": "personaplex_prime_seconds", ...}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import os
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from moshi_tpu.models.lm import LMConfig, init_gen_state
    from moshi_tpu.models.personaplex import prime_system_prompts
    from moshi_tpu.quant.formats import enable_pallas
    from moshi_tpu.runtime.synth import synth_lm_params

    if jax.default_backend() != "cpu":
        enable_pallas(True)
    # 7B personaplex: n_q 16 with runtime dep_q 8, personaplex delay slot
    cfg = LMConfig(delays=(0, 0, 1, 1, 1, 1, 1, 1, 1, 0,
                           1, 1, 1, 1, 1, 1, 1), personaplex=True)
    params = synth_lm_params(jax.random.PRNGKey(0), cfg, fmt="q4_k")
    state = init_gen_state(cfg, 1, params=params)

    rng = np.random.default_rng(0)
    voice_frames = 125                       # 10 s voice prompt
    audio_codes = [list(rng.integers(0, cfg.card, 8)) for _ in
                   range(voice_frames)]
    text_tokens = list(rng.integers(4, 31000, 32))

    def prime_once():
        st = init_gen_state(cfg, 1, params=params)
        t0 = time.perf_counter()
        st = prime_system_prompts(cfg, params, st, text_tokens,
                                  voice_audio_codes=audio_codes)
        off = int(np.asarray(st["offset"])[0])        # D->H closes it
        return off, time.perf_counter() - t0

    del state
    primed_offset, dt_cold = prime_once()      # includes chunk compiles
    _, dt_warm = prime_once()

    total_frames = voice_frames + 6 + len(text_tokens) + 6
    assert primed_offset == total_frames, (primed_offset, total_frames)
    print(json.dumps({
        "metric": "personaplex_prime_seconds",
        "value": round(dt_warm, 2), "unit": "s",
        "cold_s": round(dt_cold, 2),
        "frames": total_frames,
        "ms_per_frame": round(dt_warm * 1000 / total_frames, 2),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
