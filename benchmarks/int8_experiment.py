"""Hardware feasibility probes for the integer-domain dequant redesign.

Hypothesis (round 3): the q4_k/q8_0 fused kernels are VPU-bound on the
per-element dequant chain (~6-8 f32 lane-passes per weight: unpack via
int32, f32 converts, scale multiply, bf16 cast), not HBM-bound — the
dense bf16 matvec streams at ~4.6 TB/s while the q4_k kernel manages
~1 TB/s packed.  The fix is GGML's own CUDA trick (vec_dot_q4_K_q8_1,
reference ggml backend): quantize the ACTIVATION to int8 per 32-block,
contract raw integer values on the MXU, and apply scale_w*scale_x per
block afterwards — zero elementwise work over the weights.

This script probes the Mosaic/v5e building blocks, each in a tiny
standalone kernel, then micro-benches the winning formulation against
the current q4_k kernel:

  P1  int8 x int8 -> int32 dot_general inside a pallas kernel
  P2  bf16 x bf16 exact small-int contraction (fallback if P1 fails)
  P3  pltpu.bitcast i32 -> i8 (cheap in-word nibble unpack)
  P4  block-dot q4_k matvec: P = Xblk[nb,K] @ W[O,K]^T, y = sum_b
      d'[o,b] * P[b,o]  (timed vs the current kernel at 22528x4096)

Run on the real chip (background, serial with other TPU work):
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/int8_experiment.py
"""

import functools
import time
import traceback

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices(), flush=True)

    def run(tag, fn):
        try:
            out = fn()
            print(f"P {tag}: OK {out}", flush=True)
            return True
        except Exception as e:
            print(f"P {tag}: FAIL {type(e).__name__}: {str(e)[:500]}",
                  flush=True)
            return False

    # ---- P1: int8 MXU contraction in a kernel --------------------------
    def p1():
        def kern(a_ref, b_ref, o_ref):
            o_ref[:] = jax.lax.dot_general(
                a_ref[:], b_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)

        a = jnp.arange(-64, 64, dtype=jnp.int8).reshape(1, 128)
        a = jnp.tile(a, (8, 1))
        b = jnp.ones((256, 128), jnp.int8) * 3
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, 256), jnp.int32),
        )(a, b)
        expect = np.asarray(a, np.int32) @ np.asarray(b, np.int32).T
        np.testing.assert_array_equal(np.asarray(out), expect)
        return "int8 dot exact"

    ok_i8 = run("1 int8xint8->i32 dot in kernel", p1)

    # ---- P2: bf16 exact small-int contraction ---------------------------
    def p2():
        def kern(a_ref, b_ref, o_ref):
            o_ref[:] = jax.lax.dot_general(
                a_ref[:], b_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        rng = np.random.default_rng(0)
        a = jnp.asarray(rng.integers(-127, 128, (8, 512)), jnp.bfloat16)
        b = jnp.asarray(rng.integers(0, 16, (256, 512)), jnp.bfloat16)
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32),
        )(a, b)
        expect = (np.asarray(a, np.float32) @ np.asarray(b, np.float32).T)
        np.testing.assert_array_equal(np.asarray(out), expect)
        return "bf16 small-int dot exact"

    run("2 bf16 exact int dot in kernel", p2)

    # ---- P3: bitcast i32 -> i8 ------------------------------------------
    def p3():
        def kern(w_ref, o_ref):
            w = w_ref[:]
            lo = w & 0x0F0F0F0F
            o_ref[:] = pltpu.bitcast(lo, jnp.int8)

        w = jnp.arange(8 * 128, dtype=jnp.int32).reshape(8, 128) * 0x01010101
        out = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((32, 128), jnp.int8),
        )(w)
        print("  bitcast out shape", out.shape, "sample", np.asarray(out)[:2, :4])
        return "bitcast lowered+ran"

    run("3 bitcast i32->i8 in kernel", p3)

    # ---- P4: block-dot q4_k matvec vs current kernel --------------------
    # Shapes: fused in_proj-scale 22528 x 4096 (the matvec_experiment shape)
    O, K = 22528, 4096
    QK = 32
    nb = K // QK
    rng = np.random.default_rng(1)
    q_u8 = rng.integers(0, 256, (O, K // 2), np.uint8)        # packed
    es = jnp.asarray(rng.uniform(0.001, 0.02, (O, nb)), jnp.bfloat16)
    em = jnp.asarray(rng.uniform(0.0, 0.01, (O, nb)), jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((1, K)), jnp.float32)

    # unpacked-int8 resident copy (planar: col j -> lo, col j + K/2 -> hi)
    lo = (q_u8 & 15).astype(np.int8)
    hi = (q_u8 >> 4).astype(np.int8)
    w_i8 = jnp.asarray(np.concatenate([lo, hi], axis=1))       # [O, K]
    q_u8 = jnp.asarray(q_u8)

    TO = 1024
    acc_dtype = jnp.int32 if ok_i8 else jnp.float32
    wd = jnp.int8 if ok_i8 else jnp.bfloat16

    def blockdot_kernel(x_ref, xs_ref, dx_ref, w_ref, es_ref, em_ref,
                        o_ref):
        # Xblk [nb, K]: int8 x spread block-diagonally
        xq = x_ref[:]                                    # [nb_pad?, K] i8
        p = jax.lax.dot_general(
            xq, w_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=(jnp.int32 if ok_i8 else jnp.float32))
        # y[o] = sum_b es[o,b]*dx[b]*P[b,o] - em[o,b]*xs[b]
        pf = p.astype(jnp.float32)                       # [nb, TO]
        d = es_ref[:].astype(jnp.float32) * dx_ref[:].T  # [TO, nb]*[1,nb]
        y = jnp.sum(d * pf.T, axis=1)
        y = y - jnp.sum(em_ref[:].astype(jnp.float32) * xs_ref[:].T, axis=1)
        o_ref[:] = y[None]

    def mk_blockdot():
        # host-side prep (in-jit in production, tiny)
        @jax.jit
        def prep(xv):
            xb = xv.reshape(nb, QK)
            dx = jnp.max(jnp.abs(xb), axis=1) / 127.0
            dx = jnp.maximum(dx, 1e-8)
            xq = jnp.round(xb / dx[:, None]).astype(jnp.int8)
            # spread to [nb, K] block-diagonal
            rows = jax.lax.broadcasted_iota(jnp.int32, (nb, K), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (nb, K), 1)
            mask = (cols // QK) == rows
            xq_full = jnp.where(mask, xq.reshape(1, K), 0).astype(wd)
            xs = jnp.sum(xb, axis=1)                     # [nb] f32
            return xq_full, xs.reshape(nb, 1), dx.reshape(nb, 1)

        xq_full, xs, dx = prep(x)
        grid = (O // TO,)
        f = pl.pallas_call(
            blockdot_kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((nb, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nb, 1), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TO, K), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TO, nb), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TO, nb), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TO), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((1, O), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )
        jf = jax.jit(lambda xq, xs, dx, w, e1, e2: f(xq, xs, dx, w, e1, e2))
        return jf, (xq_full, xs, dx)

    def p4():
        jf, (xq_full, xs, dx) = mk_blockdot()
        y = jf(xq_full, xs, dx, w_i8, es, em)
        y.block_until_ready()
        # reference: float dequant
        wf = (np.asarray(w_i8, np.float32)
              * np.repeat(np.asarray(es, np.float32), QK, axis=1))
        mins = np.repeat(np.asarray(em, np.float32), QK, axis=1)
        yref = (np.asarray(x, np.float32)
                @ (wf - 0 * wf).T) - np.asarray(x) @ mins.T
        # the int8-activation path has quantization noise; check rel err
        ya = np.asarray(y)
        rel = (np.abs(ya - yref).max()
               / max(np.abs(yref).max(), 1e-6))
        # timing: vary x variant each call, chain on nothing (weights args)
        # vary the input each call (identical buffers time memoized)
        variants = [(xq_full + jnp.asarray(i % 3, wd)) for i in range(8)]
        for v in variants:
            jf(v, xs, dx, w_i8, es, em).block_until_ready()
        n = 50
        t0 = time.perf_counter()
        outs = [jf(variants[i % 8], xs, dx, w_i8, es, em)
                for i in range(n)]
        jax.block_until_ready(outs)
        ms = (time.perf_counter() - t0) * 1000 / n
        gbs = (O * K * (1 if ok_i8 else 1) + O * nb * 4) / ms / 1e6
        return (f"rel_err={rel:.4f} {ms:.3f} ms "
                f"({gbs:.2f} GB/s int8-resident)")

    run("4 block-dot q4k matvec (unpacked-i8 resident)", p4)

    # ---- P5: current q4_k kernel same shape, for comparison -------------
    def p5():
        from moshi_tpu.quant.formats import QuantTensor, quantize
        from moshi_tpu.quant.pallas_matmul import qmatmul_pallas
        wf = rng.standard_normal((O, K)).astype(np.float32)
        qt = quantize(jnp.asarray(wf), "q4_k")
        f = jax.jit(lambda xv, q: qmatmul_pallas(xv, q, interpret=False))
        variants = [jnp.asarray(rng.standard_normal((1, K)), jnp.float32)
                    for _ in range(8)]
        for v in variants[:2]:
            f(v, qt).block_until_ready()
        n = 50
        t0 = time.perf_counter()
        outs = [f(variants[i % 8], qt) for i in range(n)]
        jax.block_until_ready(outs)
        ms = (time.perf_counter() - t0) * 1000 / n
        return f"current q4_k kernel {ms:.3f} ms"

    run("5 current q4_k kernel (same shape)", p5)

    print("done", flush=True)


if __name__ == "__main__":
    main()
