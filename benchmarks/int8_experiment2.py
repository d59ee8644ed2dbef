"""Round-3 probe #2: decompose the int8-MXU q4_k matvec candidates.

int8_experiment.py established (hardware):
  * int8 x int8 -> i32 dot_general works exactly inside a kernel;
  * the naive block-dot (activation spread block-diagonally, P computed
    as xq[nb,K] @ W[TO,K]^T then a VPU TRANSPOSE of P for the scale
    epilogue) runs 0.618 ms at 22528x4096 vs the current fused q4_k
    kernel's 1.255 ms — 2x, but still ~10x off the HBM rate.

This probe isolates where the time goes, with every variant chained x8
inside ONE jit (per-frame reality; isolated-call numbers pay the ~0.26 ms
dispatch floor).  Key re-orientation vs probe #1: the WEIGHT tile is the
dot LHS, P[o, b] = W[TO,K] @ xq_spread[nb,K]^T, so the es/em epilogue
reads scales in their natural [TO, nb] layout (no transposes anywhere)
and the output is written as an [O, 1] column (block (TO, 1): lane dim
equals array dim, legal per the Mosaic block rules).

Variants (all q4_k math: y = sum_b es[o,b]*dx[b]*P[o,b] - em[o,b]*xs[b]):
  A  pure int8 dot + trivial lane-sum (upper bound for the dot itself)
  B  + full epilogue, activation quant prep OUTSIDE the kernel
  C  production candidate: rms-norm + per-32-block int8 activation quant
     INSIDE the kernel (computed once at grid step 0 into VMEM scratch)
  D  C with TO in {512, 2048}
  E  bf16 dot variant (no activation quant: x spread in bf16, weights
     i8 -> bf16 chunked in-kernel; exact vs the current numeric class)
  F  C but with PACKED u8 storage (in-kernel nibble unpack to i8):
     halves HBM, pays VPU unpack — the capacity/speed tradeoff point.

Run on the real chip (background, serial with other TPU work):
  PYTHONPATH=/tmp/repo_bench:/root/.axon_site python \
      benchmarks/int8_experiment2.py
"""

import time

import numpy as np

O, K = 22528, 4096
QK = 32
NB = K // QK
CHAIN = 8


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices(), flush=True)

    rng = np.random.default_rng(1)
    w_f = rng.standard_normal((O, K)).astype(np.float32) * 0.02
    es_np = rng.uniform(0.001, 0.02, (O, NB)).astype(np.float32)
    em_np = rng.uniform(0.0, 0.01, (O, NB)).astype(np.float32)
    # integer weight codes 0..15 (q4_k class)
    q_np = rng.integers(0, 16, (O, K), np.int8)
    w_i8 = jax.device_put(jnp.asarray(q_np))
    es = jax.device_put(jnp.asarray(es_np, jnp.bfloat16))
    em = jax.device_put(jnp.asarray(em_np, jnp.bfloat16))
    # packed planar u8 for variant F
    packed_np = (q_np[:, : K // 2].astype(np.uint8)
                 | (q_np[:, K // 2:].astype(np.uint8) << 4))
    w_u8 = jax.device_put(jnp.asarray(packed_np))
    alpha = jax.device_put(jnp.ones((1, K), jnp.float32))
    xs_host = [jax.device_put(
        jnp.asarray(rng.standard_normal((1, K)), jnp.float32))
        for _ in range(9)]

    def run(tag, fn):
        try:
            out = fn()
            print(f"P {tag}: OK {out}", flush=True)
        except Exception as e:
            print(f"P {tag}: FAIL {type(e).__name__}: {str(e)[:400]}",
                  flush=True)

    def med_ms(fn, iters=20):
        fn(0)
        ts = []
        for i in range(iters):
            t0 = time.perf_counter()
            fn((i % 8) + 1)
            ts.append((time.perf_counter() - t0) * 1000)
        return float(np.median(ts))

    # ---- host-side activation quant prep (for A/B/E) --------------------
    @jax.jit
    def prep(xv):
        xb = xv.reshape(NB, QK)
        m = jnp.max(jnp.abs(xb), axis=1)
        dx = jnp.where(m > 0, m / 127.0, 1.0)
        xq = jnp.round(xb / dx[:, None]).astype(jnp.int8)
        rows = jax.lax.broadcasted_iota(jnp.int32, (NB, K), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (NB, K), 1)
        mask = (cols // QK) == rows
        xq_full = jnp.where(mask, xq.reshape(1, K), 0).astype(jnp.int8)
        xs = jnp.sum(xb, axis=1).reshape(1, NB)
        return xq_full, xs, dx.reshape(1, NB)

    def dot_w_lhs(w_tile, xq):
        return jax.lax.dot_general(
            w_tile, xq, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)

    # ---- A: pure dot ----------------------------------------------------
    def kern_a(xq_ref, w_ref, o_ref):
        p = dot_w_lhs(w_ref[:], xq_ref[:])                 # [TO, NB] i32
        o_ref[:] = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)

    def mk_a(to=1024):
        f = pl.pallas_call(
            kern_a,
            grid=(O // to,),
            in_specs=[
                pl.BlockSpec((NB, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((to, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((to, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((O, 1), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

        def chain(xq0, xq1, w):
            y = f(xq0, w)
            for _ in range(CHAIN - 1):
                xq = jnp.where(y[:1, :1] > 1e30, xq1, xq0)
                y = y + f(xq, w)
            return y
        return jax.jit(chain)

    def pa():
        jf = mk_a()
        xq0, _, _ = prep(xs_host[0])
        xq1, _, _ = prep(xs_host[1])
        t = med_ms(lambda i: jax.block_until_ready(jf(
            jnp.where(jnp.float32(i) > 4, xq1, xq0), xq1, w_i8)))
        per = t / CHAIN
        return f"{t:.3f} ms chain -> {per:.3f} ms/op ({O*K/per/1e6:.0f} GB/s)"

    run("A pure int8 dot (w-lhs, [O,1] out)", pa)

    # ---- B: + epilogue, prep outside ------------------------------------
    def kern_b(xq_ref, xs_ref, dx_ref, w_ref, es_ref, em_ref, o_ref):
        p = dot_w_lhs(w_ref[:], xq_ref[:])                 # [TO, NB] i32
        pf = p.astype(jnp.float32) * dx_ref[:]             # * dx[b] row
        y = (es_ref[:].astype(jnp.float32) * pf
             - em_ref[:].astype(jnp.float32) * xs_ref[:])
        o_ref[:] = jnp.sum(y, axis=1, keepdims=True)

    def mk_b(to=1024):
        f = pl.pallas_call(
            kern_b,
            grid=(O // to,),
            in_specs=[
                pl.BlockSpec((NB, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NB), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NB), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((to, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((to, NB), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((to, NB), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((to, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((O, 1), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

        def chain(x0, w, e1, e2):
            x = x0
            for _ in range(CHAIN):
                xq, xs, dx = prep(x)
                y = f(xq, xs, dx, w, e1, e2)
                x = y[:K].reshape(1, K) * jnp.float32(1e-3)
            return y
        return jax.jit(chain), f

    def pb():
        jf, f1 = mk_b()
        # accuracy on one call
        xq, xs, dx = prep(xs_host[0])
        y = np.asarray(f1(xq, xs, dx, w_i8, es, em))[:, 0]
        wf = np.asarray(q_np, np.float32) * np.repeat(es_np, QK, 1) \
            - np.repeat(em_np, QK, 1)
        yref = (np.asarray(xs_host[0])[0] * wf).sum(1)
        rel = np.abs(y - yref).max() / np.abs(yref).max()
        t = med_ms(lambda i: jax.block_until_ready(
            jf(xs_host[i], w_i8, es, em)))
        per = t / CHAIN
        return (f"rel={rel:.4f} {t:.3f} ms chain -> {per:.3f} ms/op "
                f"({O*K/per/1e6:.0f} GB/s)")

    run("B dot + natural-layout epilogue, prep outside", pb)

    # ---- C: production candidate (norm + quant in-kernel, scratch) ------
    def kern_c(x_ref, alpha_ref, w_ref, es_ref, em_ref, o_ref,
               xq_s, xs_s, dx_s):
        @pl.when(pl.program_id(0) == 0)
        def _prep():
            x = x_ref[:].astype(jnp.float32)
            ms = jnp.mean(x * x, axis=-1, keepdims=True)
            xn = x * jax.lax.rsqrt(ms + 1e-8) * alpha_ref[:]
            rows = jax.lax.broadcasted_iota(jnp.int32, (NB, K), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (NB, K), 1)
            mask = (cols // QK) == rows
            xsp = jnp.where(mask, xn, 0.0)                 # [NB, K]
            m = jnp.max(jnp.abs(xsp), axis=1, keepdims=True)
            dx = jnp.where(m > 0, m / 127.0, 1.0)          # [NB, 1]
            xs_col = jnp.sum(xsp, axis=1, keepdims=True)   # [NB, 1]
            # [NB, 1] -> [1, NB] via an MXU identity contraction (Mosaic
            # has no cheap sublane<->lane transpose)
            ri = jax.lax.broadcasted_iota(jnp.int32, (NB, NB), 0)
            ci = jax.lax.broadcasted_iota(jnp.int32, (NB, NB), 1)
            ident = (ri == ci).astype(jnp.float32)
            xs_s[:] = jax.lax.dot_general(
                xs_col, ident, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dx_s[:] = jax.lax.dot_general(
                dx, ident, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for c0 in range(0, K, 512):
                xq_s[:, c0:c0 + 512] = jnp.round(
                    xsp[:, c0:c0 + 512] / dx).astype(jnp.int8)

        p = dot_w_lhs(w_ref[:], xq_s[:])
        pf = p.astype(jnp.float32) * dx_s[:]
        y = (es_ref[:].astype(jnp.float32) * pf
             - em_ref[:].astype(jnp.float32) * xs_s[:])
        o_ref[:] = jnp.sum(y, axis=1, keepdims=True)

    def mk_c(to=1024):
        f = pl.pallas_call(
            kern_c,
            grid=(O // to,),
            in_specs=[
                pl.BlockSpec((1, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((to, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((to, NB), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((to, NB), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((to, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((O, 1), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((NB, K), jnp.int8),
                pltpu.VMEM((1, NB), jnp.float32),
                pltpu.VMEM((1, NB), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

        def chain(x0, a, w, e1, e2):
            x = x0
            for _ in range(CHAIN):
                y = f(x, a, w, e1, e2)
                x = y[:K].reshape(1, K) * jnp.float32(1e-3)
            return y
        return jax.jit(chain), f

    def pc(to=1024):
        jf, f1 = mk_c(to)
        y = np.asarray(f1(xs_host[0], alpha, w_i8, es, em))[:, 0]
        x0 = np.asarray(xs_host[0])[0]
        xn = x0 / np.sqrt((x0 * x0).mean() + 1e-8)
        wf = np.asarray(q_np, np.float32) * np.repeat(es_np, QK, 1) \
            - np.repeat(em_np, QK, 1)
        yref = (xn * wf).sum(1)
        rel = np.abs(y - yref).max() / np.abs(yref).max()
        t = med_ms(lambda i: jax.block_until_ready(
            jf(xs_host[i], alpha, w_i8, es, em)))
        per = t / CHAIN
        return (f"rel={rel:.4f} {t:.3f} ms chain -> {per:.3f} ms/op "
                f"({O*K/per/1e6:.0f} GB/s)")

    run("C norm+quant in-kernel (TO=1024)", pc)
    run("D1 same, TO=512", lambda: pc(512))
    run("D2 same, TO=2048", lambda: pc(2048))

    # ---- E: bf16 dot, no activation quant --------------------------------
    def kern_e(xsp_ref, w_ref, es_ref, em_ref, xs_ref, o_ref):
        acc = jnp.zeros((w_ref.shape[0], NB), jnp.float32)
        for c0 in range(0, K, 512):
            wb = (w_ref[:, c0:c0 + 512].astype(jnp.float32)
                  .astype(jnp.bfloat16))
            acc += jax.lax.dot_general(
                wb, xsp_ref[:, c0:c0 + 512],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        y = (es_ref[:].astype(jnp.float32) * acc
             - em_ref[:].astype(jnp.float32) * xs_ref[:])
        o_ref[:] = jnp.sum(y, axis=1, keepdims=True)

    def mk_e(to=1024):
        f = pl.pallas_call(
            kern_e,
            grid=(O // to,),
            in_specs=[
                pl.BlockSpec((NB, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((to, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((to, NB), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((to, NB), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, NB), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((to, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((O, 1), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

        @jax.jit
        def prep_bf(xv):
            rows = jax.lax.broadcasted_iota(jnp.int32, (NB, K), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (NB, K), 1)
            mask = (cols // QK) == rows
            xsp = jnp.where(mask, xv.reshape(1, K), 0.0)
            return (xsp.astype(jnp.bfloat16),
                    jnp.sum(xsp, axis=1, keepdims=True).reshape(1, NB))

        def chain(x0, w, e1, e2):
            x = x0
            for _ in range(CHAIN):
                xsp, xs2 = prep_bf(x)
                y = f(xsp, w, e1, e2, xs2)
                x = y[:K].reshape(1, K) * jnp.float32(1e-3)
            return y
        return jax.jit(chain), (f, prep_bf)

    def pe():
        jf, (f1, prep_bf) = mk_e()
        xsp, xs2 = prep_bf(xs_host[0])
        y = np.asarray(f1(xsp, w_i8, es, em, xs2))[:, 0]
        wf = np.asarray(q_np, np.float32) * np.repeat(es_np, QK, 1) \
            - np.repeat(em_np, QK, 1)
        yref = (np.asarray(xs_host[0])[0] * wf).sum(1)
        rel = np.abs(y - yref).max() / np.abs(yref).max()
        t = med_ms(lambda i: jax.block_until_ready(
            jf(xs_host[i], w_i8, es, em)))
        per = t / CHAIN
        return (f"rel={rel:.4f} {t:.3f} ms chain -> {per:.3f} ms/op "
                f"({O*K/per/1e6:.0f} GB/s)")

    run("E bf16 dot (no act quant, i8->bf16 in-kernel)", pe)

    # ---- F: packed u8 storage, in-kernel unpack to i8 --------------------
    def kern_f(x_ref, alpha_ref, w_ref, es_ref, em_ref, o_ref,
               xq_s, xs_s, dx_s):
        @pl.when(pl.program_id(0) == 0)
        def _prep():
            x = x_ref[:].astype(jnp.float32)
            ms = jnp.mean(x * x, axis=-1, keepdims=True)
            xn = x * jax.lax.rsqrt(ms + 1e-8) * alpha_ref[:]
            rows = jax.lax.broadcasted_iota(jnp.int32, (NB, K), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (NB, K), 1)
            mask = (cols // QK) == rows
            xsp = jnp.where(mask, xn, 0.0)                 # [NB, K]
            m = jnp.max(jnp.abs(xsp), axis=1, keepdims=True)
            dx = jnp.where(m > 0, m / 127.0, 1.0)          # [NB, 1]
            xs_col = jnp.sum(xsp, axis=1, keepdims=True)   # [NB, 1]
            # [NB, 1] -> [1, NB] via an MXU identity contraction (Mosaic
            # has no cheap sublane<->lane transpose)
            ri = jax.lax.broadcasted_iota(jnp.int32, (NB, NB), 0)
            ci = jax.lax.broadcasted_iota(jnp.int32, (NB, NB), 1)
            ident = (ri == ci).astype(jnp.float32)
            xs_s[:] = jax.lax.dot_general(
                xs_col, ident, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            dx_s[:] = jax.lax.dot_general(
                dx, ident, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for c0 in range(0, K, 512):
                xq_s[:, c0:c0 + 512] = jnp.round(
                    xsp[:, c0:c0 + 512] / dx).astype(jnp.int8)

        to = w_ref.shape[0]
        k2 = K // 2
        acc = jnp.zeros((to, NB), jnp.int32)
        for c0 in range(0, k2, 512):
            pk = w_ref[:, c0:c0 + 512].astype(jnp.int32)
            lo = (pk & 15).astype(jnp.int8)
            hi = ((pk >> 4) & 15).astype(jnp.int8)
            acc += jax.lax.dot_general(
                lo, xq_s[:, c0:c0 + 512], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            acc += jax.lax.dot_general(
                hi, xq_s[:, k2 + c0:k2 + c0 + 512],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
        pf = acc.astype(jnp.float32) * dx_s[:]
        y = (es_ref[:].astype(jnp.float32) * pf
             - em_ref[:].astype(jnp.float32) * xs_s[:])
        o_ref[:] = jnp.sum(y, axis=1, keepdims=True)

    def mk_f(to=1024):
        f = pl.pallas_call(
            kern_f,
            grid=(O // to,),
            in_specs=[
                pl.BlockSpec((1, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((to, K // 2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((to, NB), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((to, NB), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((to, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((O, 1), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((NB, K), jnp.int8),
                pltpu.VMEM((1, NB), jnp.float32),
                pltpu.VMEM((1, NB), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

        def chain(x0, a, w, e1, e2):
            x = x0
            for _ in range(CHAIN):
                y = f(x, a, w, e1, e2)
                x = y[:K].reshape(1, K) * jnp.float32(1e-3)
            return y
        return jax.jit(chain), f

    def pf_probe():
        jf, f1 = mk_f()
        # NOTE planar: packed col j = (orig j | orig j+K/2 << 4), and the
        # es/em blocks are in natural col order — kern_f contracts lo
        # against natural cols [c0, c0+512) which is exactly xq cols there.
        y = np.asarray(f1(xs_host[0], alpha, w_u8, es, em))[:, 0]
        x0 = np.asarray(xs_host[0])[0]
        xn = x0 / np.sqrt((x0 * x0).mean() + 1e-8)
        wf = np.asarray(q_np, np.float32) * np.repeat(es_np, QK, 1) \
            - np.repeat(em_np, QK, 1)
        yref = (xn * wf).sum(1)
        rel = np.abs(y - yref).max() / np.abs(yref).max()
        t = med_ms(lambda i: jax.block_until_ready(
            jf(xs_host[i], alpha, w_u8, es, em)))
        per = t / CHAIN
        return (f"rel={rel:.4f} {t:.3f} ms chain -> {per:.3f} ms/op "
                f"({O*K/2/per/1e6:.0f} GB/s packed)")

    run("F packed u8 + in-kernel unpack to i8", pf_probe)

    print("done", flush=True)


if __name__ == "__main__":
    main()
