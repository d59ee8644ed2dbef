"""Roofline probe: pin the chip's TRUE sustained streaming rate with
un-elidable, digest-fetched measurements (VERDICT r3 item 2).

Every prior micro-bench on this rig was untrustworthy (BENCH_NOTES
trap #4: repeated-buffer chains measured 40x chip peak; block_until_ready
can return before execution).  This probe only trusts wall clock closed
by a D->H digest fetch, with distinct inputs per call:

  A. dispatch floor: tiny jit + per-call 4-byte fetch               -> rpc_ms
  B. raw HBM rate:   sum(|M_i - v_j|) over K distinct ~2 GB bf16
     buffers round-robined, v_j distinct per call (L1 distance is not
     factorable into per-buffer cached stats)                        -> raw rate
  C. model rate:     the real 7B q4_k LM frame, ONE weight tree      -> frame p50
  D. cache control:  same frame, TWO weight trees alternated — if the
     runtime were serving repeated weights from a cache, D would be
     slower than C; equal times mean C's rate is a true HBM number

Prints one JSON line with the reconciliation: model bytes/frame,
implied sustained TB/s, and the ratio to the raw rate (B).

Usage: python benchmarks/roofline_probe.py [--skip-model]
"""

import argparse
import json
import time

import numpy as np


def _fetch(x):
    return float(np.asarray(x))


def _p50(f, n, *, warmup=3):
    for _ in range(warmup):
        f()
    lat = []
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        lat.append(time.perf_counter() - t0)
    return float(np.percentile(lat, 50) * 1e3), lat


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--calls", type=int, default=20)
    ap.add_argument("--skip-model", action="store_true")
    ap.add_argument("--gb", type=float, default=2.0,
                    help="size of each raw-probe buffer")
    args = ap.parse_args()

    import jax
    import os
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    out = {"metric": "roofline_probe", "device": str(jax.devices()[0])}

    # ---- A: dispatch floor ------------------------------------------
    tiny = jax.jit(lambda x: x * 1.000001 + 1.0)
    xs = [jnp.float32(i) for i in range(args.calls + 5)]
    it = iter(xs)
    rpc_ms, _ = _p50(lambda: _fetch(tiny(next(it))), args.calls)
    out["rpc_ms"] = round(rpc_ms, 2)

    # ---- B: raw streaming rate --------------------------------------
    rows = 1 << 15
    cols = int(args.gb * (1 << 30) / 2 / rows)
    cols = max(256, (cols // 256) * 256)
    nbuf = 3
    key = jax.random.PRNGKey(0)
    bufs = [jax.device_put(jax.random.normal(
        jax.random.fold_in(key, i), (rows, cols), jnp.bfloat16))
        for i in range(nbuf)]
    for b in bufs:
        b.block_until_ready()
    vs = [jax.random.normal(jax.random.fold_in(key, 1000 + i),
                            (cols,), jnp.bfloat16)
          for i in range(args.calls + 5)]

    @jax.jit
    def stream(m0, m1, m2, v):
        # L1 distance: cannot be rewritten into cached per-M statistics.
        # All three distinct buffers stream per call so the net time
        # over the RPC floor is several ms (SNR: a single 2 GB read is
        # ~1.4 ms against a ~29 ms floor)
        f = v.astype(jnp.float32)[None, :]
        return (jnp.sum(jnp.abs(m0.astype(jnp.float32) - f)) +
                jnp.sum(jnp.abs(m1.astype(jnp.float32) - f)) +
                jnp.sum(jnp.abs(m2.astype(jnp.float32) - f)))

    i = [0]

    def one():
        j = i[0]
        i[0] += 1
        return _fetch(stream(*bufs, vs[j]))

    raw_ms, _ = _p50(one, args.calls)
    nbytes = rows * cols * 2 * nbuf
    raw_rate = nbytes / ((raw_ms - rpc_ms) / 1e3) if raw_ms > rpc_ms \
        else float("nan")
    out["raw_probe_ms"] = round(raw_ms, 2)
    out["raw_bytes"] = nbytes
    out["raw_tbps"] = round(raw_rate / 1e12, 2)
    del bufs

    if not args.skip_model:
        # ---- C/D: the real LM frame, 1 vs 2 weight trees -------------
        from moshi_tpu.models.lm import (LMConfig, init_gen_state,
                                         lm_gen_step)
        from moshi_tpu.quant.formats import enable_pallas
        from moshi_tpu.runtime.synth import synth_lm_params
        from moshi_tpu.utils.honest import tree_bytes
        enable_pallas(True)
        cfg = LMConfig(delays=(0, 0, 1, 1, 1, 1, 1, 1, 1, 0,
                               1, 1, 1, 1, 1, 1, 1))
        trees = [synth_lm_params(jax.random.PRNGKey(s), cfg, fmt="q4_k")
                 for s in range(2)]
        wbytes = tree_bytes(trees[0])
        out["model_weight_gb"] = round(wbytes / 2**30, 2)
        n_other = cfg.n_q - cfg.dep_q
        rng_in = np.random.default_rng(0)
        others = [jnp.asarray(rng_in.integers(
            0, cfg.card, (1, n_other)).astype(np.int32))
            for _ in range(2 * (args.calls + 5))]
        step = jax.jit(lambda p, s, o: lm_gen_step(
            cfg, p, s, other_audio=o, temp=0.8, temp_text=0.7,
            top_k=250, top_k_text=25), donate_argnums=(1,))

        def run_variant(ntree):
            state = init_gen_state(cfg, 1, params=trees[0])
            k = [0]

            def one():
                j = k[0]
                k[0] += 1
                out_, st = step(trees[j % ntree], state_box[0], others[j])
                state_box[0] = st
                return _fetch(out_["text"].astype(jnp.float32).sum())

            state_box = [state]
            return _p50(one, args.calls)[0]

        c_ms = run_variant(1)
        d_ms = run_variant(2)
        out["model_1tree_ms"] = round(c_ms, 2)
        out["model_2tree_ms"] = round(d_ms, 2)
        # frame motion: weights + ~1.6 GB KV window reads
        kv_bytes = int(1.6e9)
        move = wbytes + kv_bytes
        net = (c_ms - rpc_ms) / 1e3
        out["model_bytes_per_frame"] = move
        out["model_sustained_tbps"] = round(move / net / 1e12, 2) \
            if net > 0 else None
        out["cache_suspect"] = bool(d_ms > 1.3 * c_ms)
        if raw_rate == raw_rate and net > 0:
            out["gap_vs_raw"] = round((move / net) / raw_rate, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
