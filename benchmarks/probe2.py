"""Fine-grained probe of the 7B q4_k temporal stack (TPU).

probe.py showed temporal+text_linear ~= 57 ms blocked (~88% of the LM
step).  This probe splits that into: per-layer matmuls, decode-attention
kernel, KV ring traffic, scan-vs-unrolled weight feeding, embedding,
text head, sampling — each as its own jitted function timed blocked,
with the RPC floor (trivial jit call) measured for subtraction.

Methodology per CLAUDE.md: vary inputs per call, weights as jit args,
no device->host fetches.

Usage: python benchmarks/probe2.py [--iters N] [--fmt q4_k] [--xla]
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
    ap.add_argument("--xla", action="store_true",
                    help="disable pallas (pure-XLA A/B)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from moshi_tpu.models.lm import (LMConfig, embed_frame, init_gen_state,
                                     lm_text_step, temporal_forward)
    from moshi_tpu.nn.transformer import transformer_layer
    from moshi_tpu.nn.attention import attn_shared
    from moshi_tpu.quant.formats import enable_pallas, qmatmul
    from moshi_tpu.runtime.synth import synth_lm_params

    enable_pallas(not args.xla)
    cfg = LMConfig(delays=(0, 0, 1, 1, 1, 1, 1, 1, 1, 0,
                           1, 1, 1, 1, 1, 1, 1))
    tcfg = cfg.transformer
    params = synth_lm_params(jax.random.PRNGKey(0), cfg, fmt=args.fmt)
    state = init_gen_state(cfg, 1, params=params)
    kv = state["transformer"]
    print("kv layout:", kv["k"].shape, "pallas:", not args.xla, flush=True)
    tokens = jnp.zeros((1, 1, cfg.num_codebooks), jnp.int32)
    offsets = [jnp.full((1,), i * 7 + 3, jnp.int32) for i in range(9)]
    xs = [jax.random.normal(jax.random.PRNGKey(i), (1, 1, cfg.dim),
                            jnp.bfloat16) for i in range(9)]

    def report(label, fn):
        print(f"{label:28s} {med_ms(fn, args.iters):7.2f} ms", flush=True)

    # 0. RPC floor
    tiny = [jnp.full((8, 128), float(i), jnp.bfloat16) for i in range(9)]
    f0 = jax.jit(lambda a: a + 1.0)

    def run0(i):
        jax.block_until_ready(f0(tiny[i]))
    report("rpc floor (tiny jit)", run0)

    layers = params["transformer"]["layers"]
    layer0 = jax.tree_util.tree_map(lambda a: a[0], layers)
    kv0 = {"k": kv["k"][0], "v": kv["v"][0]}

    # 1. one full layer
    def one_layer(lp, kv_l, x, off):
        shared = attn_shared(tcfg.mha, off, 1)
        return transformer_layer(tcfg, lp, kv_l, x, off, shared=shared)
    f1 = jax.jit(one_layer)

    def run1(i):
        y, _ = f1(layer0, kv0, xs[i], offsets[i])
        jax.block_until_ready(y)
    report("1 layer (attn+mlp)", run1)

    # 2. one layer matmuls only (no attention/ring)
    def layer_matmuls(lp, x):
        a = lp["self_attn"]
        qkv = qmatmul(x, a["in_proj"]["weight"],
                      pre_norm_alpha=lp["norm1"]["alpha"])
        o = qmatmul(qkv[..., :cfg.dim].astype(jnp.bfloat16),
                    a["out_proj"]["weight"])
        g = lp["gating"]
        h = qmatmul(x + o.astype(jnp.bfloat16), g["linear_in"]["weight"],
                    pre_norm_alpha=lp["norm2"]["alpha"])
        half = h.shape[-1] // 2
        act = jax.nn.silu(h[..., :half]) * h[..., half:]
        return qmatmul(act.astype(jnp.bfloat16), g["linear_out"]["weight"])
    f2 = jax.jit(layer_matmuls)

    def run2(i):
        jax.block_until_ready(f2(layer0, xs[i]))
    report("1 layer matmuls only", run2)

    # 3. scan over 32 layers, matmuls only (scan weight-feed overhead)
    def scan_matmuls(lys, x):
        def body(h, lp):
            return layer_matmuls(lp, h).astype(jnp.bfloat16), ()
        y, _ = jax.lax.scan(body, x, lys)
        return y
    f3 = jax.jit(scan_matmuls)

    def run3(i):
        jax.block_until_ready(f3(layers, xs[i]))
    report("scan32 matmuls only", run3)

    # 4. decode attention kernel alone (one layer)
    h, hd = tcfg.mha.num_heads, tcfg.mha.head_dim
    qs = [jax.random.normal(jax.random.PRNGKey(i + 100), (1, h, hd),
                            jnp.bfloat16) for i in range(9)]
    if not args.xla:
        from moshi_tpu.nn.pallas_attention import decode_attention
        f4 = jax.jit(lambda q, k, v, off: decode_attention(
            q, k, v, off, cap=tcfg.mha.cap, context=tcfg.context))

        def run4(i):
            jax.block_until_ready(f4(qs[i], kv0["k"], kv0["v"], offsets[i]))
        report("decode-attn kernel x1", run4)

        # 4b. 32 sequential decode-attn kernels (chained via q)
        def attn32(q, k, v, off):
            def body(qq, kvl):
                o = decode_attention(qq, kvl["k"], kvl["v"], off,
                                     cap=tcfg.mha.cap, context=tcfg.context)
                return o.astype(jnp.bfloat16), ()
            y, _ = jax.lax.scan(body, q, kv)
            return y
        f4b = jax.jit(attn32)

        def run4b(i):
            jax.block_until_ready(f4b(qs[i], kv["k"], kv["v"], offsets[i]))
        report("scan32 decode-attn", run4b)

    # 5. KV ring DUS over the full stack (write 1 row to all 32 rings)
    def dus_all(k_stack, vals, off):
        slot = (off[0] % tcfg.mha.cap).astype(jnp.int32)
        return jax.lax.dynamic_update_slice(
            k_stack, vals.astype(k_stack.dtype),
            (jnp.int32(0), jnp.int32(0), slot, jnp.int32(0), jnp.int32(0)))
    vals = [jax.random.normal(jax.random.PRNGKey(i + 200),
                              (32, 1, 1, h, hd), jnp.bfloat16)
            for i in range(9)]
    f5 = jax.jit(dus_all, donate_argnums=(0,))
    # donation invalidates the arg; rebind the buffer each call
    state_holder = {"k": jnp.array(kv["k"])}

    def run5b(i):
        state_holder["k"] = f5(state_holder["k"], vals[i], offsets[i])
        jax.block_until_ready(state_holder["k"])
    report("DUS kv stack (donated)", run5b)

    # 6. embedding
    f6 = jax.jit(lambda p, t: embed_frame(cfg, p, t))
    toks = [jnp.full((1, 1, cfg.num_codebooks), i, jnp.int32)
            for i in range(9)]

    def run6(i):
        jax.block_until_ready(f6(params, toks[i]))
    report("embed_frame", run6)

    # 7. text head alone
    f7 = jax.jit(lambda w, x: qmatmul(x, w, out_dtype=jnp.float32))
    tw = params["text_linear"]["weight"]

    def run7(i):
        jax.block_until_ready(f7(tw, xs[i]))
    report("text_linear", run7)

    # 8. full temporal stack (= probe.py headline)
    f8 = jax.jit(lambda p, k, t, o: temporal_forward(cfg, p, k, t, o))

    def run8(i):
        hh, logits, _ = f8(params, kv, tokens, offsets[i])
        jax.block_until_ready(hh)
    report("temporal stack full", run8)

    # 9. text step (embed+temporal+sample) => sampling = 9 - 8 - embed
    states = [dict(state, offset=jnp.full((1,), i * 7 + 3, jnp.int32))
              for i in range(9)]
    f9 = jax.jit(lambda p, s: lm_text_step(cfg, p, s, temp_text=0.7,
                                           top_k_text=25))

    def run9(i):
        tt, hh, _ = f9(params, states[i])
        jax.block_until_ready(tt)
    report("lm_text_step full", run9)


if __name__ == "__main__":
    main()
