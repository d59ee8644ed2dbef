"""Micro-bench: the temporal-stack megakernel alone (7B shapes).

Times temporal_full_step in isolation so tile-plan experiments
(MOSHI_TPU_TEMPORAL_TILES) don't pay the full-LM compile.

Usage: [MOSHI_TPU_TEMPORAL_TILES=tq=1024,...] python
benchmarks/temporal_kernel_bench.py [--iters N]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from moshi_tpu.models.lm import LMConfig
    from moshi_tpu.nn.pallas_temporal import plan_stages, temporal_full_step
    from moshi_tpu.nn.rope import rope_angles
    from moshi_tpu.runtime.synth import synth_lm_params

    cfg = LMConfig()
    tc = cfg.transformer
    dd, hd = tc.dim, tc.dim // tc.num_heads
    cap = tc.mha.cap
    print("plan:", plan_stages(dd, cfg.hidden_dim, cap), flush=True)
    params = synth_lm_params(jax.random.PRNGKey(0), cfg, fmt="q4_k")
    lay = params["transformer"]["layers"]
    weights = {
        "qkv": lay["self_attn"]["in_proj"]["weight"],
        "out": lay["self_attn"]["out_proj"]["weight"],
        "glu": lay["gating"]["linear_in"]["weight"],
        "lout": lay["gating"]["linear_out"]["weight"],
        "n1": lay["norm1"]["alpha"], "n2": lay["norm2"]["alpha"],
    }
    cap_pad = plan_stages(dd, cfg.hidden_dim, cap)[5]
    k_cache = jnp.zeros((tc.num_layers, cap_pad, dd), jnp.bfloat16)
    v_cache = jnp.zeros_like(k_cache)
    # weights/cos_sin as ARGS (closure device arrays become jaxpr
    # constants -> trace-time fetch -> 22 ms/call sync poison), varying
    # h/pos per call (identical input buffers appear memoized), no
    # device->host fetch anywhere
    rng = np.random.default_rng(0)
    hs = [jax.device_put(rng.standard_normal((1, dd)).astype(np.float32)
                         * 0.01) for _ in range(9)]

    def step(h, k, v, p, cs, w):
        return temporal_full_step(
            h, k, v, p, cs, w, cap=cap, context=tc.context,
            heads=tc.num_heads, hidden=cfg.hidden_dim,
            nlayers=tc.num_layers)

    f = jax.jit(step)
    pos = jnp.int32(1500)
    cos_sin = rope_angles(pos[None], hd, tc.rope_max_period)
    t0 = time.perf_counter()
    out = f(hs[0], k_cache, v_cache, pos, cos_sin, weights)
    jax.block_until_ready(out)
    print(f"compile+first: {time.perf_counter() - t0:.1f} s", flush=True)
    ts = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        out = f(hs[i % 9], k_cache, v_cache, pos, cos_sin, weights)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) * 1000)
    print(f"temporal megakernel: p50 {np.median(ts):.1f} ms  "
          f"min {min(ts):.1f} ms", flush=True)


if __name__ == "__main__":
    main()
