"""Component probe: where the 7B q4_k frame time goes (TPU, pallas path).

Times each stage of the STS frame in isolation (median per-call ms with
blocking), so kernel work can be aimed at the dominant share:
    temporal megakernel | lm_text_step | depformer | full LM step | mimi

Usage: python benchmarks/probe.py [--iters N] [--fmt q4_k]
"""

import argparse
import time

import numpy as np


def med_ms(fn, iters):
    fn()  # compile
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1000)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--fmt", default="q4_k")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from moshi_tpu.models.lm import (LMConfig, init_gen_state, lm_gen_step,
                                     lm_text_step, temporal_forward)
    from moshi_tpu.models.mimi import MimiConfig, MimiModel
    from moshi_tpu.quant.formats import enable_pallas
    from moshi_tpu.runtime.synth import synth_lm_params

    enable_pallas(True)
    cfg = LMConfig(delays=(0, 0, 1, 1, 1, 1, 1, 1, 1, 0,
                           1, 1, 1, 1, 1, 1, 1))
    params = synth_lm_params(jax.random.PRNGKey(0), cfg, fmt=args.fmt)
    state = init_gen_state(cfg, 1, params=params)
    print("kv layout:", state["transformer"]["k"].shape, flush=True)
    tokens = jnp.zeros((1, 1, cfg.num_codebooks), jnp.int32)
    offset = jnp.zeros((1,), jnp.int32)

    # temporal transformer alone (megakernel when layout is flat)
    tf = jax.jit(lambda p, kv, t, o: temporal_forward(cfg, p, kv, t, o))

    def run_temporal():
        h, logits, kv = tf(params, state["transformer"], tokens, offset)
        jax.block_until_ready(h)

    print(f"temporal+text_linear: {med_ms(run_temporal, args.iters):.1f} ms",
          flush=True)

    # text phase (embed + temporal + sample)
    ts_f = jax.jit(lambda p, s: lm_text_step(cfg, p, s, temp_text=0.7,
                                             top_k_text=25))

    def run_text():
        tt, h, _ = ts_f(params, state)
        jax.block_until_ready(tt)

    t_text = med_ms(run_text, args.iters)
    print(f"lm_text_step:         {t_text:.1f} ms", flush=True)

    # full LM frame
    other = jnp.zeros((1, cfg.n_q - cfg.dep_q), jnp.int32)
    full_f = jax.jit(lambda p, s, o: lm_gen_step(
        cfg, p, s, other_audio=o, temp=0.8, temp_text=0.7,
        top_k=250, top_k_text=25))

    def run_full():
        out, _ = full_f(params, state, other)
        jax.block_until_ready(out["audio"])

    t_full = med_ms(run_full, args.iters)
    print(f"full lm_gen_step:     {t_full:.1f} ms "
          f"(depformer+cache ~= {t_full - t_text:.1f} ms)", flush=True)

    # mimi encode + decode
    mimi = MimiModel(MimiConfig(n_q=16))
    mp = mimi.init_params(jax.random.PRNGKey(1), jnp.bfloat16)
    enc_state = mimi.init_encode_state(1, jnp.bfloat16)
    dec_state = mimi.init_decode_state(1, jnp.bfloat16)
    audio = jnp.zeros((1, 1920), jnp.bfloat16)
    enc = jax.jit(lambda p, s, a: mimi.encode_step(p, s, a))
    codes0 = jnp.zeros((1, 1, 16), jnp.int32)
    dec = jax.jit(lambda p, s, c: mimi.decode_step(p, s, c))

    def run_mimi():
        c, _ = enc(mp, enc_state, audio)
        w, _ = dec(mp, dec_state, codes0)
        jax.block_until_ready(w)

    print(f"mimi enc+dec:         {med_ms(run_mimi, args.iters):.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
