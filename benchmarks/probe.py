"""Component probe: where the 7B q4_k frame time goes (TPU, pallas path).

Times each stage of the STS frame in isolation so kernel work can be
aimed at the dominant share:
    temporal stack | lm_text_step | depformer (via full-text delta) |
    full LM step | mimi enc+dec

Methodology (CLAUDE.md): vary an input per call (identical input sets
appear memoized by this runtime), pass weights as jit ARGS (closure
device arrays are fetched at trace time and poison the process into a
~22 ms/call sync mode), block per call, never fetch device->host.
Default layout is the lax.scan path; set MOSHI_TPU_MEGAKERNEL=
temporal|dep|all to A/B the opt-in megakernels.

Usage: python benchmarks/probe.py [--iters N] [--fmt q4_k]
"""

import argparse
import time

import numpy as np


def med_ms(fn, iters, nvar=8):
    fn(0)  # compile
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        fn((i % nvar) + 1)
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
    offsets = [jnp.full((1,), i * 7 + 3, jnp.int32) for i in range(9)]

    # temporal transformer alone (megakernel iff layout is flat)
    tf = jax.jit(lambda p, kv, t, o: temporal_forward(cfg, p, kv, t, o))

    def run_temporal(i):
        h, logits, kv = tf(params, state["transformer"], tokens, offsets[i])
        jax.block_until_ready(h)

    print(f"temporal+text_linear: {med_ms(run_temporal, args.iters):.1f} ms",
          flush=True)

    # text phase (embed + temporal + sample); vary offset via state copies
    states = [dict(state, offset=jnp.full((1,), i * 7 + 3, jnp.int32))
              for i in range(9)]
    ts_f = jax.jit(lambda p, s: lm_text_step(cfg, p, s, temp_text=0.7,
                                             top_k_text=25))

    def run_text(i):
        tt, h, _ = ts_f(params, states[i])
        jax.block_until_ready(tt)

    t_text = med_ms(run_text, args.iters)
    print(f"lm_text_step:         {t_text:.1f} ms", flush=True)

    # full LM frame
    other = jnp.zeros((1, cfg.n_q - cfg.dep_q), jnp.int32)
    full_f = jax.jit(lambda p, s, o: lm_gen_step(
        cfg, p, s, other_audio=o, temp=0.8, temp_text=0.7,
        top_k=250, top_k_text=25))

    def run_full(i):
        out, _ = full_f(params, states[i], other)
        jax.block_until_ready(out["audio"])

    t_full = med_ms(run_full, args.iters)
    print(f"full lm_gen_step:     {t_full:.1f} ms "
          f"(depformer+cache ~= {t_full - t_text:.1f} ms)", flush=True)

    # mimi encode + decode
    mimi = MimiModel(MimiConfig(n_q=16))
    mp = mimi.init_params(jax.random.PRNGKey(1), jnp.bfloat16)
    enc_state = mimi.init_encode_state(1, jnp.bfloat16)
    dec_state = mimi.init_decode_state(1, jnp.bfloat16)
    rng = np.random.default_rng(0)
    audios = [jnp.asarray(rng.standard_normal((1, 1920)) * 0.1,
                          jnp.bfloat16) for _ in range(9)]
    enc = jax.jit(lambda p, s, a: mimi.encode_step(p, s, a))
    codes = [jnp.full((1, 1, 16), i % 7, jnp.int32) for i in range(9)]
    dec = jax.jit(lambda p, s, c: mimi.decode_step(p, s, c))

    def run_mimi(i):
        c, _ = enc(mp, enc_state, audios[i])
        w, _ = dec(mp, dec_state, codes[i])
        jax.block_until_ready(w)

    print(f"mimi enc+dec:         {med_ms(run_mimi, args.iters):.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
