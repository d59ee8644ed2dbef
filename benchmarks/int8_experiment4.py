"""Round-3 probe #4: int8-MXU q4_k matvec — CLEAN pipelined methodology.

Probe #2's epilogue variants looked 80x slower than the pure dot; probe
#3 showed the gap was measurement, not compute: #2 ran an accuracy check
(device->host fetch) before timing, which flips the process into the
~22 ms/call sync mode (BENCH_NOTES trap #2); #3's 8-variant input cycle
then hit the buffer-memoization trap (#1) and read impossibly-fast
medians.  This probe uses bench.py's pipelined methodology, immune to
both: the activation FEEDS BACK device-side across timed calls (x_{t+1}
= normalized slice of y_t, so every call's inputs genuinely differ),
nothing is fetched until all timing ends, and we block once at the end
of a 30-call window.

Variants (all at 22528 x 4096, chain of 8 matvecs per jit call):
  H1  current production q4_k kernel (control)
  H2  int8 dot + full epilogue, unpacked-i8 weights, prep in-jit outside
  H3  int8 dot + full epilogue, PACKED u8 weights, norm+quant in-kernel
  H4  int8 dot + full epilogue, unpacked-i8, norm+quant in-kernel
  H5  pure int8 dot, no epilogue (roofline reference)
Accuracy for H2/H3/H4 vs the f32-dequant reference is checked at the
very END (after all timing).

Run: PYTHONPATH=/tmp/repo_bench:/root/.axon_site python \
    benchmarks/int8_experiment4.py
"""

import time

import numpy as np

O, K = 22528, 4096
QK = 32
NB = K // QK
CHAIN = 8
TO = 1024
CALLS = 30


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices(), flush=True)

    rng = np.random.default_rng(1)
    q_np = rng.integers(0, 16, (O, K), np.int8)
    w_i8 = jax.device_put(jnp.asarray(q_np))
    es_np = rng.uniform(0.001, 0.02, (O, NB)).astype(np.float32)
    em_np = rng.uniform(0.0, 0.01, (O, NB)).astype(np.float32)
    es16 = jax.device_put(jnp.asarray(es_np, jnp.bfloat16))
    em16 = jax.device_put(jnp.asarray(em_np, jnp.bfloat16))
    packed_np = (q_np[:, : K // 2].astype(np.uint8)
                 | (q_np[:, K // 2:].astype(np.uint8) << 4))
    w_u8 = jax.device_put(jnp.asarray(packed_np))
    alpha = jax.device_put(jnp.ones((1, K), jnp.float32))
    x0 = jax.device_put(
        jnp.asarray(rng.standard_normal((1, K)), jnp.float32))

    results = []

    def pipelined_ms(jf, args):
        # warmup (compile + one real run)
        x = jf(x0, *args)
        x.block_until_ready()
        x = jf(x, *args)
        x.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(CALLS):
            x = jf(x, *args)
        x.block_until_ready()
        t = (time.perf_counter() - t0) * 1000 / CALLS
        return t, x

    def norm_feed(y):
        # y: [O, 1] or [1, O] -> normalized [1, K] feed (keeps magnitude
        # stable across hundreds of chained matvecs)
        x = y.reshape(-1)[:K].reshape(1, K)
        return x * jax.lax.rsqrt(jnp.mean(x * x) + 1e-8)

    def report(tag, ms, extra=""):
        per = ms / CHAIN
        print(f"P {tag}: {ms:.3f} ms/call -> {per:.3f} ms/op {extra}",
              flush=True)
        results.append((tag, per))

    def guard(tag, fn):
        try:
            fn()
        except Exception as e:
            print(f"P {tag}: FAIL {type(e).__name__}: {str(e)[:300]}",
                  flush=True)

    # ---- H1: current production kernel (control) ------------------------
    def h1():
        from moshi_tpu.quant.formats import QuantTensor
        from moshi_tpu.quant.pallas_matmul import qmatmul_pallas
        dd = jnp.ones((O, K // 256), jnp.bfloat16)
        qt = QuantTensor("q4_k", (O, K), w_u8, dd, es=es16, em=em16)

        def chain(x, q, d, es, em):
            qt2 = QuantTensor("q4_k", (O, K), q, d, es=es, em=em)
            for _ in range(CHAIN):
                y = qmatmul_pallas(x, qt2, interpret=False)
                x = norm_feed(y)
            return x
        jf = jax.jit(chain)
        ms, _ = pipelined_ms(jf, (qt.q, qt.d, qt.es, qt.em))
        report("H1 current q4_k kernel (control)", ms,
               f"({O*K/2/(ms/CHAIN)/1e6:.0f} GB/s packed)")
    guard("H1", h1)

    # ---- shared pieces ---------------------------------------------------
    def dot_w_lhs(w_tile, xq):
        return jax.lax.dot_general(
            w_tile, xq, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)

    WSPEC = pl.BlockSpec((TO, K), lambda i: (i, 0), memory_space=pltpu.VMEM)
    WSPEC_P = pl.BlockSpec((TO, K // 2), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    XQSPEC = pl.BlockSpec((NB, K), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    XSPEC = pl.BlockSpec((1, K), lambda i: (0, 0), memory_space=pltpu.VMEM)
    ESPEC = pl.BlockSpec((TO, NB), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    RSPEC = pl.BlockSpec((1, NB), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    OSPEC = pl.BlockSpec((TO, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

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

    # ---- H2: unpacked i8, prep outside -----------------------------------
    def kern_h2(xq_ref, xs_ref, dx_ref, w_ref, es_ref, em_ref, o_ref):
        p = dot_w_lhs(w_ref[:], xq_ref[:])
        pf = p.astype(jnp.float32) * dx_ref[:]
        y = (es_ref[:].astype(jnp.float32) * pf
             - em_ref[:].astype(jnp.float32) * xs_ref[:])
        o_ref[:] = jnp.sum(y, axis=1, keepdims=True)

    f_h2 = pl.pallas_call(
        kern_h2, grid=(O // TO,),
        in_specs=[XQSPEC, RSPEC, RSPEC, WSPEC, ESPEC, ESPEC],
        out_specs=OSPEC,
        out_shape=jax.ShapeDtypeStruct((O, 1), jnp.float32),
        compiler_params=PARAMS)

    def h2():
        def chain(x, w, e1, e2):
            for _ in range(CHAIN):
                xq, xs, dx = prep(x)
                y = f_h2(xq, xs, dx, w, e1, e2)
                x = norm_feed(y)
            return x
        jf = jax.jit(chain)
        ms, _ = pipelined_ms(jf, (w_i8, es16, em16))
        report("H2 int8+epilogue, unpacked, prep outside", ms,
               f"({O*K/(ms/CHAIN)/1e6:.0f} GB/s)")
    guard("H2", h2)

    # ---- H3: packed u8, norm+quant in-kernel ------------------------------
    def prep_body(x_ref, alpha_ref, xq_s, xs_s, dx_s, jnp=None, jax=None):
        pass  # placeholder (real bodies below keep jax/jnp from closure)

    def _inkernel_prep(x_ref, alpha_ref, xq_s, xs_s, dx_s):
        x = x_ref[:].astype(jnp.float32)
        ms = jnp.mean(x * x, axis=-1, keepdims=True)
        xn = x * jax.lax.rsqrt(ms + 1e-8) * alpha_ref[:]
        rows = jax.lax.broadcasted_iota(jnp.int32, (NB, K), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (NB, K), 1)
        mask = (cols // QK) == rows
        xsp = jnp.where(mask, xn, 0.0)
        m = jnp.max(jnp.abs(xsp), axis=1, keepdims=True)
        dx = jnp.where(m > 0, m / 127.0, 1.0)
        xs_col = jnp.sum(xsp, axis=1, keepdims=True)
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

    def kern_h3(x_ref, alpha_ref, w_ref, es_ref, em_ref, o_ref,
                xq_s, xs_s, dx_s):
        @pl.when(pl.program_id(0) == 0)
        def _():
            _inkernel_prep(x_ref, alpha_ref, xq_s, xs_s, dx_s)
        k2 = K // 2
        acc = jnp.zeros((TO, NB), jnp.int32)
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

    f_h3 = pl.pallas_call(
        kern_h3, grid=(O // TO,),
        in_specs=[XSPEC, XSPEC, WSPEC_P, ESPEC, ESPEC],
        out_specs=OSPEC,
        out_shape=jax.ShapeDtypeStruct((O, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((NB, K), jnp.int8),
            pltpu.VMEM((1, NB), jnp.float32),
            pltpu.VMEM((1, NB), jnp.float32),
        ],
        compiler_params=PARAMS)

    def h3():
        def chain(x, a, w, e1, e2):
            for _ in range(CHAIN):
                y = f_h3(x, a, w, e1, e2)
                x = norm_feed(y)
            return x
        jf = jax.jit(chain)
        ms, _ = pipelined_ms(jf, (alpha, w_u8, es16, em16))
        report("H3 int8+epilogue, packed, prep in-kernel", ms,
               f"({O*K/2/(ms/CHAIN)/1e6:.0f} GB/s packed)")
    guard("H3", h3)

    # ---- H4: unpacked i8, norm+quant in-kernel ----------------------------
    def kern_h4(x_ref, alpha_ref, w_ref, es_ref, em_ref, o_ref,
                xq_s, xs_s, dx_s):
        @pl.when(pl.program_id(0) == 0)
        def _():
            _inkernel_prep(x_ref, alpha_ref, xq_s, xs_s, dx_s)
        p = dot_w_lhs(w_ref[:], xq_s[:])
        pf = p.astype(jnp.float32) * dx_s[:]
        y = (es_ref[:].astype(jnp.float32) * pf
             - em_ref[:].astype(jnp.float32) * xs_s[:])
        o_ref[:] = jnp.sum(y, axis=1, keepdims=True)

    f_h4 = pl.pallas_call(
        kern_h4, grid=(O // TO,),
        in_specs=[XSPEC, XSPEC, WSPEC, ESPEC, ESPEC],
        out_specs=OSPEC,
        out_shape=jax.ShapeDtypeStruct((O, 1), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((NB, K), jnp.int8),
            pltpu.VMEM((1, NB), jnp.float32),
            pltpu.VMEM((1, NB), jnp.float32),
        ],
        compiler_params=PARAMS)

    def h4():
        def chain(x, a, w, e1, e2):
            for _ in range(CHAIN):
                y = f_h4(x, a, w, e1, e2)
                x = norm_feed(y)
            return x
        jf = jax.jit(chain)
        ms, _ = pipelined_ms(jf, (alpha, w_i8, es16, em16))
        report("H4 int8+epilogue, unpacked, prep in-kernel", ms,
               f"({O*K/(ms/CHAIN)/1e6:.0f} GB/s)")
    guard("H4", h4)

    # ---- H5: pure dot roofline -------------------------------------------
    def kern_h5(xq_ref, w_ref, o_ref):
        p = dot_w_lhs(w_ref[:], xq_ref[:])
        o_ref[:] = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)

    f_h5 = pl.pallas_call(
        kern_h5, grid=(O // TO,),
        in_specs=[XQSPEC, WSPEC],
        out_specs=OSPEC,
        out_shape=jax.ShapeDtypeStruct((O, 1), jnp.float32),
        compiler_params=PARAMS)

    def h5():
        def chain(x, w):
            for _ in range(CHAIN):
                xq, _, _ = prep(x)
                y = f_h5(xq, w)
                x = norm_feed(y)
            return x
        jf = jax.jit(chain)
        ms, _ = pipelined_ms(jf, (w_i8,))
        report("H5 pure int8 dot (roofline)", ms,
               f"({O*K/(ms/CHAIN)/1e6:.0f} GB/s)")
    guard("H5", h5)

    # ---- accuracy (AFTER all timing; D->H fetches are fine now) ----------
    def acc():
        x_np = np.asarray(x0)[0]
        xn = x_np / np.sqrt((x_np * x_np).mean() + 1e-8)
        wf = np.asarray(q_np, np.float32) * np.repeat(es_np, QK, 1) \
            - np.repeat(em_np, QK, 1)
        yref_n = (xn * wf).sum(1)
        yref_raw = (x_np * wf).sum(1)

        xq, xs, dx = prep(x0)
        y2 = np.asarray(f_h2(xq, xs, dx, w_i8, es16, em16))[:, 0]
        y3 = np.asarray(f_h3(x0, alpha, w_u8, es16, em16))[:, 0]
        y4 = np.asarray(f_h4(x0, alpha, w_i8, es16, em16))[:, 0]
        for tag, y, ref in (("H2", y2, yref_raw), ("H3", y3, yref_n),
                            ("H4", y4, yref_n)):
            rel = np.abs(y - ref).max() / np.abs(ref).max()
            print(f"ACC {tag}: rel={rel:.4f}", flush=True)
    guard("acc", acc)

    print("done", flush=True)


if __name__ == "__main__":
    main()
