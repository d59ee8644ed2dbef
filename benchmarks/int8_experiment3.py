"""Round-3 probe #3: bisect the A->B cliff from int8_experiment2.

Probe #2 on hardware: pure int8 dot (A) = 0.052 ms/op (~HBM rate), but
EVERY variant with the scale epilogue (B/C/E/F) = ~4 ms/op — an 80x
cliff.  The delta is some combination of: the B-style chain (prep jitted
between kernels), the extra streamed es/em [TO, NB] blocks, the [1, NB]
invariant blocks, the bf16->f32 converts, or the epilogue arithmetic.
This probe adds ONE ingredient at a time (all with B's chain structure):

  G1  dot+lane-sum only, B-style chain (no extra inputs)  [chain cost]
  G2  G1 + es/em streamed, used trivially (sum * 1e-9)    [streams]
  G3  G2 + dx/xs [1, NB] inputs, used trivially           [tiny blocks]
  G4  full epilogue but es/em stored f32                  [converts]
  G5  full epilogue, es/em bf16 (== probe2 B, control)
  G6  full epilogue f32, fori_loop over a 2-D grid?  no — G6: epilogue
      with es/em streamed but multiply against P WITHOUT the lane-sum
      rewrite: o = sum(es*pf, 1) only (drop em/xs)        [halved work]

Run: PYTHONPATH=/tmp/repo_bench:/root/.axon_site python \
    benchmarks/int8_experiment3.py
"""

import time

import numpy as np

O, K = 22528, 4096
QK = 32
NB = K // QK
CHAIN = 8
TO = 1024


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
    es32 = jax.device_put(jnp.asarray(es_np))
    em32 = jax.device_put(jnp.asarray(em_np))
    xs_host = [jax.device_put(
        jnp.asarray(rng.standard_normal((1, K)), jnp.float32))
        for _ in range(9)]

    def run(tag, fn):
        try:
            out = fn()
            print(f"P {tag}: OK {out}", flush=True)
        except Exception as e:
            print(f"P {tag}: FAIL {type(e).__name__}: {str(e)[:300]}",
                  flush=True)

    def med_ms(fn, iters=20):
        fn(0)
        ts = []
        for i in range(iters):
            t0 = time.perf_counter()
            fn((i % 8) + 1)
            ts.append((time.perf_counter() - t0) * 1000)
        return float(np.median(ts))

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

    WSPEC = pl.BlockSpec((TO, K), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    XQSPEC = pl.BlockSpec((NB, K), lambda i: (0, 0),
                          memory_space=pltpu.VMEM)
    ESPEC = pl.BlockSpec((TO, NB), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    RSPEC = pl.BlockSpec((1, NB), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    OSPEC = pl.BlockSpec((TO, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)

    def mk(kern, in_specs, weights):
        f = pl.pallas_call(
            kern, grid=(O // TO,), in_specs=in_specs, out_specs=OSPEC,
            out_shape=jax.ShapeDtypeStruct((O, 1), jnp.float32),
            compiler_params=PARAMS)

        def chain(x0, *ws):
            x = x0
            for _ in range(CHAIN):
                xq, xs, dx = prep(x)
                y = f(*weights(xq, xs, dx, ws))
                x = y[:K].reshape(1, K) * jnp.float32(1e-3)
            return y
        return jax.jit(chain)

    def bench(tag, kern, in_specs, weights, ws):
        def go():
            jf = mk(kern, in_specs, weights)
            t = med_ms(lambda i: jax.block_until_ready(
                jf(xs_host[i], *ws)))
            per = t / CHAIN
            return f"{t:.3f} ms chain -> {per:.3f} ms/op"
        run(tag, go)

    # G1: dot + sum only, B-style chain
    def kern_g1(xq_ref, w_ref, o_ref):
        p = dot_w_lhs(w_ref[:], xq_ref[:])
        o_ref[:] = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)

    bench("G1 dot+sum, B chain", kern_g1, [XQSPEC, WSPEC],
          lambda xq, xs, dx, ws: (xq, ws[0]), (w_i8,))

    # G2: + es/em streamed, trivially used
    def kern_g2(xq_ref, w_ref, es_ref, em_ref, o_ref):
        p = dot_w_lhs(w_ref[:], xq_ref[:])
        t = (jnp.sum(es_ref[:].astype(jnp.float32), axis=1, keepdims=True)
             + jnp.sum(em_ref[:].astype(jnp.float32), axis=1,
                       keepdims=True))
        o_ref[:] = (jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
                    + t * jnp.float32(1e-9))

    bench("G2 + es/em streams (trivial use)", kern_g2,
          [XQSPEC, WSPEC, ESPEC, ESPEC],
          lambda xq, xs, dx, ws: (xq, ws[0], ws[1], ws[2]),
          (w_i8, es16, em16))

    # G3: + dx/xs tiny blocks, trivially used
    def kern_g3(xq_ref, xs_ref, dx_ref, w_ref, es_ref, em_ref, o_ref):
        p = dot_w_lhs(w_ref[:], xq_ref[:])
        t = (jnp.sum(es_ref[:].astype(jnp.float32), axis=1, keepdims=True)
             + jnp.sum(em_ref[:].astype(jnp.float32), axis=1,
                       keepdims=True))
        t2 = jnp.sum(dx_ref[:] + xs_ref[:])
        o_ref[:] = (jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
                    + t * jnp.float32(1e-9) + t2 * jnp.float32(1e-9))

    bench("G3 + dx/xs [1,NB] blocks", kern_g3,
          [XQSPEC, RSPEC, RSPEC, WSPEC, ESPEC, ESPEC],
          lambda xq, xs, dx, ws: (xq, xs, dx, ws[0], ws[1], ws[2]),
          (w_i8, es16, em16))

    # G4: full epilogue, es/em f32
    def kern_g4(xq_ref, xs_ref, dx_ref, w_ref, es_ref, em_ref, o_ref):
        p = dot_w_lhs(w_ref[:], xq_ref[:])
        pf = p.astype(jnp.float32) * dx_ref[:]
        y = es_ref[:] * pf - em_ref[:] * xs_ref[:]
        o_ref[:] = jnp.sum(y, axis=1, keepdims=True)

    bench("G4 full epilogue, es/em f32", kern_g4,
          [XQSPEC, RSPEC, RSPEC, WSPEC, ESPEC, ESPEC],
          lambda xq, xs, dx, ws: (xq, xs, dx, ws[0], ws[1], ws[2]),
          (w_i8, es32, em32))

    # G5: full epilogue, es/em bf16 (probe2-B control)
    def kern_g5(xq_ref, xs_ref, dx_ref, w_ref, es_ref, em_ref, o_ref):
        p = dot_w_lhs(w_ref[:], xq_ref[:])
        pf = p.astype(jnp.float32) * dx_ref[:]
        y = (es_ref[:].astype(jnp.float32) * pf
             - em_ref[:].astype(jnp.float32) * xs_ref[:])
        o_ref[:] = jnp.sum(y, axis=1, keepdims=True)

    bench("G5 full epilogue, es/em bf16 (control)", kern_g5,
          [XQSPEC, RSPEC, RSPEC, WSPEC, ESPEC, ESPEC],
          lambda xq, xs, dx, ws: (xq, xs, dx, ws[0], ws[1], ws[2]),
          (w_i8, es16, em16))

    # G6: es-only epilogue (no em/xs), f32
    def kern_g6(xq_ref, dx_ref, w_ref, es_ref, o_ref):
        p = dot_w_lhs(w_ref[:], xq_ref[:])
        pf = p.astype(jnp.float32) * dx_ref[:]
        o_ref[:] = jnp.sum(es_ref[:] * pf, axis=1, keepdims=True)

    bench("G6 es-only epilogue f32", kern_g6,
          [XQSPEC, RSPEC, WSPEC, ESPEC],
          lambda xq, xs, dx, ws: (xq, dx, ws[0], ws[1]),
          (w_i8, es32))

    print("done", flush=True)


if __name__ == "__main__":
    main()
