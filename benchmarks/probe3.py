"""Pipelined per-component probe of the STACKED 7B q4_k decode path.

probe2 explained the round-1 scan-over-xs cost (weight/KV copies) and
the flip to scalar-prefetch stacked kernels brought the LM step from
42.4 -> 22.9 ms pipelined.  This probe splits the remaining 22.9 ms
(vs a ~2.5-5 ms HBM floor incl. KV-window reads) into stacked-path
components, each measured PIPELINED (calls chained on data
dependencies, one block at the end — per-call RPC overhead amortized,
matching the bench headline methodology).

Components: full LM step / temporal stack / temporal matmuls-only /
decode-attention-only / stacked ring write / depformer / text+sample,
plus a scan-unroll sweep on the temporal stack.

Usage: python benchmarks/probe3.py [--iters N] [--fmt q4_k]
"""

import argparse
import time

import numpy as np


def pipelined_ms(tag, make_step, iters):
    """make_step() -> (fn, chain0); fn(chain, i) -> chain (async).
    Chained calls amortize dispatch; one block at the end."""
    import jax
    fn, chain = make_step()
    chain = fn(chain, 0)  # compile
    jax.block_until_ready(chain)
    t0 = time.perf_counter()
    for i in range(iters):
        chain = fn(chain, i)
    jax.block_until_ready(chain)
    ms = (time.perf_counter() - t0) * 1000 / iters
    print(f"{tag:34s} {ms:7.2f} ms", flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--fmt", default="q4_k")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from moshi_tpu.models.lm import (LMConfig, init_gen_state, lm_gen_step)
    from moshi_tpu.nn.attention import attn_shared
    from moshi_tpu.nn.pallas_attention import decode_attention_stacked
    from moshi_tpu.nn.transformer import (set_scan_unroll,
                                          transformer_forward)
    from moshi_tpu.quant.formats import enable_pallas
    from moshi_tpu.quant.pallas_matmul import (glu_matmul_pallas_stacked,
                                               qmatmul_pallas_stacked)
    from moshi_tpu.runtime.synth import synth_lm_params

    enable_pallas(True)
    cfg = LMConfig(delays=(0, 0, 1, 1, 1, 1, 1, 1, 1, 0,
                           1, 1, 1, 1, 1, 1, 1))
    tcfg = cfg.transformer
    params = synth_lm_params(jax.random.PRNGKey(0), cfg, fmt=args.fmt)
    state = init_gen_state(cfg, 1, params=params)
    kv = state["transformer"]
    lay = params["transformer"]["layers"]
    d = cfg.dim
    h, hd = tcfg.mha.num_heads, tcfg.mha.head_dim
    nl, cap = tcfg.num_layers, tcfg.mha.cap
    print(f"cfg: dim={d} layers={nl} cap={cap} fmt={args.fmt}", flush=True)

    # A. dispatch floor
    def mk_floor():
        f = jax.jit(lambda a: a * 1.000001 + 1e-7)
        return (lambda c, i: f(c)), jnp.ones((8, 128), jnp.bfloat16)
    pipelined_ms("dispatch floor (tiny jit)", mk_floor, 200)

    # B. full LM step (== bench --no-mimi headline).  Params are jit ARGS
    # everywhere below: closure-captured trees become 4.9 GB of lowered
    # constants that break the remote-compile transport.
    def mk_full():
        other = jnp.zeros((1, cfg.n_q - cfg.runtime_dep_q), jnp.int32)
        f = jax.jit(lambda p, s: lm_gen_step(
            cfg, p, s, other_audio=other, temp=0.8, temp_text=0.7,
            top_k=250, top_k_text=25), donate_argnums=(1,))

        def step(s, i):
            out, s2 = f(params, s)
            return s2
        return step, init_gen_state(cfg, 1, params=params)
    pipelined_ms("full lm_gen_step", mk_full, args.iters)

    # C. temporal stack only (stacked decode path), y feeds back as x
    def mk_temporal(unroll=1):
        set_scan_unroll(unroll)
        tr = params["transformer"]

        def fwd(p, st, x, off):
            y, st2 = transformer_forward(tcfg, p, st, x, off)
            return y.astype(jnp.bfloat16), st2
        f = jax.jit(fwd, donate_argnums=(1,))

        def step(c, i):
            st, x, off = c
            y, st2 = f(tr, st, x, off)
            return (st2, y * 0.25, off + 1)
        x0 = jax.random.normal(jax.random.PRNGKey(1), (1, 1, d),
                               jnp.bfloat16)
        st0 = {"k": jnp.array(kv["k"]), "v": jnp.array(kv["v"])}
        return step, (st0, x0, jnp.full((1,), 3, jnp.int32))
    base = pipelined_ms("temporal stack (unroll=1)", mk_temporal,
                        args.iters)

    # C2. unroll sweep
    for u in (2, 4):
        pipelined_ms(f"temporal stack (unroll={u})",
                     lambda u=u: mk_temporal(u), args.iters)
    set_scan_unroll(1)

    # D. temporal matmuls only (no attention kernel, no ring write)
    in_w = lay["self_attn"]["in_proj"]["weight"]
    out_w = lay["self_attn"]["out_proj"]["weight"]
    glu_w = lay["gating"]["linear_in"]["weight"]
    lout_w = lay["gating"]["linear_out"]["weight"]
    n1 = lay["norm1"]["alpha"]
    n2 = lay["norm2"]["alpha"]

    def mk_matmuls():
        ws = (in_w, out_w, glu_w, lout_w, n1, n2)

        def fwd(w, x):
            iw, ow, gw, lw, a1, a2 = w

            def body(hcur, l):
                qkv = qmatmul_pallas_stacked(hcur, iw, l, alpha=a1)
                o = qmatmul_pallas_stacked(
                    qkv[:, :d].astype(jnp.bfloat16), ow, l)
                hcur = hcur + o.astype(hcur.dtype)
                g = glu_matmul_pallas_stacked(hcur, gw, l, alpha=a2)
                ffn = qmatmul_pallas_stacked(
                    g.astype(jnp.bfloat16), lw, l)
                return hcur + ffn.astype(hcur.dtype), ()
            y, _ = jax.lax.scan(body, x,
                                jnp.arange(nl, dtype=jnp.int32))
            return y * 0.25
        f = jax.jit(fwd)
        x0 = jax.random.normal(jax.random.PRNGKey(2), (1, d),
                               jnp.bfloat16)
        return (lambda c, i: f(ws, c)), x0
    pipelined_ms("temporal matmuls only", mk_matmuls, args.iters)

    # E. decode-attention kernels only (chained via q)
    def mk_attn():
        kst, vst = jnp.array(kv["k"]), jnp.array(kv["v"])

        def fwd(ks, vs, q, off):
            def body(qq, l):
                o = decode_attention_stacked(
                    qq, ks, vs, qq, qq, off, l, cap=cap,
                    context=tcfg.context)
                return o.astype(jnp.bfloat16), ()
            y, _ = jax.lax.scan(body, q, jnp.arange(nl, dtype=jnp.int32))
            return y * 0.25
        f = jax.jit(fwd)
        q0 = jax.random.normal(jax.random.PRNGKey(3), (1, h, hd),
                               jnp.bfloat16)
        return (lambda c, i: f(kst, vst, c,
                               jnp.full((1,), 3 + i, jnp.int32))), q0
    pipelined_ms("decode-attn only (32 kernels)", mk_attn, args.iters)

    # F. stacked ring write (donated DUS on both stacks)
    def mk_ring():
        def fwd(k_stack, v_stack, vals, off):
            z = jnp.int32(0)
            slot = (off[0] % cap).astype(jnp.int32)
            kc = jax.lax.dynamic_update_slice(
                k_stack, vals.astype(k_stack.dtype), (z, z, slot, z, z))
            vc = jax.lax.dynamic_update_slice(
                v_stack, vals.astype(v_stack.dtype), (z, z, slot, z, z))
            return kc, vc
        f = jax.jit(fwd, donate_argnums=(0, 1))
        vals = jax.random.normal(jax.random.PRNGKey(4), (nl, 1, 1, h, hd),
                                 jnp.bfloat16)

        def step(c, i):
            kc, vc = f(c[0], c[1], vals, jnp.full((1,), i, jnp.int32))
            return (kc, vc)
        return step, (jnp.array(kv["k"]), jnp.array(kv["v"]))
    pipelined_ms("ring write (stacked DUS x2)", mk_ring, args.iters)

    # G. depformer (audio phase) only
    def mk_dep():
        from moshi_tpu.models.lm import lm_audio_step
        f0 = jax.jit(lambda p, s, tt, ho: lm_audio_step(
            cfg, p, s, tt, ho, temp=0.8, top_k=250),
            donate_argnums=(1,))
        f = lambda s, tt, ho: f0(params, s, tt, ho)
        hs = jax.random.normal(jax.random.PRNGKey(5), (1, d), jnp.bfloat16)
        tt = jnp.zeros((1,), jnp.int32)

        def step(s, i):
            out, s2 = f(s, tt + (i % 7), hs * (1 + 0.01 * (i % 5)))
            return s2
        return step, init_gen_state(cfg, 1, params=params)
    pipelined_ms("depformer audio phase", mk_dep, args.iters)

    print("done", flush=True)


if __name__ == "__main__":
    main()
