"""Hardware experiment: M=1 matvec strategies for the decode path.

Finding that motivates this (probe, 7B): M=1 dots on the MXU are
WEIGHT-LOAD-BOUND — a 128x128 tile costs ~128 cycles to fill no matter
how small M is, capping matvecs at ~120 Gparam/s.  Both the per-op
kernels (59 ms temporal) and the megakernel (116 ms) sit exactly on that
ceiling; the depformer frame kernel (534 Mparam -> 6 ms) confirms the
model.  A VPU matvec with the weight TRANSPOSED ([K, O]: K on sublanes,
O on lanes; broadcast x, multiply, fold-reduce over sublanes) never
touches the MXU and should run at HBM speed (~500+ GB/s).

Layout trick for q4_k block scales: within each CK-row chunk the rows
are stored BLOCK-INTERLEAVED — row r = j*nb + b holds original element
j of block b — so the halving fold-reduction [CK -> nb rows] lands each
32-element block's sum in its own row, ready for an elementwise multiply
with the es chunk [nb, O].  The packed weights and x are permuted once
(at quantize / step time); the kernel itself is pure multiply+fold.

Times, at the GLU shape [O=22528, K=4096]:
  A. XLA dense bf16 matvec (x @ W.T)
  B. pallas MXU matvec (current kernels' structure)
  C. pallas VPU transposed dense matvec
  D. pallas VPU transposed q4_k matvec (block-interleaved rows)
"""

import argparse
import time

import numpy as np


def med_ms(fn, iters=50, nvar=8):
    """fn(i) with i cycling over nvar distinct input variants: identical
    input buffers appear to be memoized by this runtime (2.7 TB/s
    "bandwidths"), and any host fetch would flip it into a ~22 ms/call
    sync mode — so vary inputs, never fetch."""
    import jax
    fn(0)
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        fn((i % nvar) + 1 if nvar else 0)
        ts.append((time.perf_counter() - t0) * 1000)
    return float(np.median(ts))


def fold_sum(t, rows_out: int):
    """[R, O] -> [rows_out, O] by repeated halving adds (R, rows_out
    powers-of-two multiples)."""
    r = t.shape[0]
    while r > rows_out:
        r //= 2
        t = t[:r] + t[r:]
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--o", type=int, default=22528)
    ap.add_argument("--k", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    O, K = args.o, args.k
    rng0 = np.random.default_rng(0)
    w_np = (rng0.standard_normal((O, K)) * 0.02).astype(np.float32)
    w = jax.device_put(jnp.asarray(w_np).astype(jnp.bfloat16))
    wt = jax.device_put(jnp.asarray(w_np.T).astype(jnp.bfloat16))
    rng = np.random.default_rng(1)
    xs_np = [rng.standard_normal((1, K)).astype(np.float32)
             for _ in range(9)]
    xs = [jax.device_put(v) for v in xs_np]
    x = xs[0]
    gb = O * K * 2 / 1e9

    # ---- A: XLA dense ----------------------------------------------------
    fa = jax.jit(lambda x, w: jax.lax.dot_general(
        x.astype(jnp.bfloat16), w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32))
    jax.block_until_ready(fa(x, w))
    ta = med_ms(lambda i: jax.block_until_ready(fa(xs[i], w)), args.iters)
    print(f"A xla dense:      {ta:.3f} ms  {gb/ta*1000:.0f} GB/s",
          flush=True)

    # ---- B: pallas MXU matvec -------------------------------------------
    def mxu_kernel(x_ref, w_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            x_ref[:].astype(jnp.bfloat16), w_ref[:],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    TO = 1024
    fb = jax.jit(lambda x, w: pl.pallas_call(
        mxu_kernel,
        grid=(O // TO,),
        in_specs=[pl.BlockSpec((1, K), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((TO, K), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TO), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, O), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x, w))
    jax.block_until_ready(fb(x, w))
    tb = med_ms(lambda i: jax.block_until_ready(fb(xs[i], w)), args.iters)
    print(f"B pallas MXU:     {tb:.3f} ms  {gb/tb*1000:.0f} GB/s",
          flush=True)

    # ---- C: pallas VPU transposed dense ---------------------------------
    CK, TO2 = 512, 2048

    def vpu_kernel(xt_ref, wt_ref, o_ref, acc):
        ki = pl.program_id(1)
        nk = pl.num_programs(1)

        @pl.when(ki == 0)
        def _z():
            acc[:] = jnp.zeros_like(acc)
        xv = xt_ref[:].astype(jnp.float32)                 # [CK, 1]
        wv = wt_ref[:].astype(jnp.float32)                 # [CK, TO2]
        acc[:] = acc[:] + fold_sum(wv * xv, 1)

        @pl.when(ki == nk - 1)
        def _w():
            o_ref[:] = acc[:]

    fc = jax.jit(lambda xt, wt: pl.pallas_call(
        vpu_kernel,
        grid=(O // TO2, K // CK),
        in_specs=[pl.BlockSpec((CK, 1), lambda oi, ki: (ki, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((CK, TO2), lambda oi, ki: (ki, oi),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, TO2), lambda oi, ki: (0, oi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, O), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, TO2), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xt, wt))
    xts = [xv.reshape(K, 1) for xv in xs]
    jax.block_until_ready(fc(xts[0], wt))
    tc = med_ms(lambda i: jax.block_until_ready(fc(xts[i], wt)),
                args.iters)
    print(f"C pallas VPU-T:   {tc:.3f} ms  {gb/tc*1000:.0f} GB/s",
          flush=True)

    # ---- D: pallas VPU transposed q4_k (block-interleaved rows) ---------
    # synthetic packed bits, pure-numpy prep: fetching device arrays for
    # host-side transposes would poison the process (see med_ms)
    QK = 32
    K2 = K // 2
    CKP = 256                  # packed rows per chunk (512 unpacked)
    NB = CKP // QK
    nkc = K2 // CKP
    qTi = jax.device_put(rng0.integers(0, 256, (K2, O), np.uint8))
    es_c = jax.device_put(
        (rng0.standard_normal((nkc * 2 * NB, O)) * 1e-3).astype(np.float32))
    em_c = jax.device_put(
        (rng0.standard_normal((nkc * 2 * NB, O)) * 1e-3).astype(np.float32))

    def xperm(v):
        lo = v[:K2].reshape(nkc, NB, QK)
        hi = v[K2:].reshape(nkc, NB, QK)
        lo = np.transpose(lo, (0, 2, 1)).reshape(nkc, CKP)
        hi = np.transpose(hi, (0, 2, 1)).reshape(nkc, CKP)
        return np.concatenate([lo, hi], 1).reshape(-1, 1)  # [2K2, 1]

    def q4kt_kernel(xt_ref, q_ref, es_ref, em_ref, o_ref, acc):
        ki = pl.program_id(1)
        nk = pl.num_programs(1)

        @pl.when(ki == 0)
        def _z():
            acc[:] = jnp.zeros_like(acc)
        pi = q_ref[:].astype(jnp.int32)                    # [CKP, TO2]
        lo = (pi & 15).astype(jnp.float32)
        hi = ((pi >> 4) & 15).astype(jnp.float32)
        xv = xt_ref[:].astype(jnp.float32)                 # [2CKP, 1]
        xl = xv[:CKP]
        xh = xv[CKP:]
        bs_lo = fold_sum(lo * xl, NB)                      # [NB, TO2]
        bs_hi = fold_sum(hi * xh, NB)
        es = es_ref[:]                                     # [2NB, TO2]
        em = em_ref[:]
        contrib = fold_sum(bs_lo * es[:NB] + bs_hi * es[NB:], 1)
        xb_lo = fold_sum(xl, NB)                           # [NB, 1]
        xb_hi = fold_sum(xh, NB)
        mins = fold_sum(em[:NB] * xb_lo + em[NB:] * xb_hi, 1)
        acc[:] = acc[:] + contrib - mins

        @pl.when(ki == nk - 1)
        def _w():
            o_ref[:] = acc[:]

    fd = jax.jit(lambda xi, q, es, em: pl.pallas_call(
        q4kt_kernel,
        grid=(O // TO2, nkc),
        in_specs=[
            pl.BlockSpec((2 * CKP, 1), lambda oi, ki: (ki, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((CKP, TO2), lambda oi, ki: (ki, oi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * NB, TO2), lambda oi, ki: (ki, oi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * NB, TO2), lambda oi, ki: (ki, oi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TO2), lambda oi, ki: (0, oi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, O), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, TO2), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xi, q, es, em))
    x_is = [jax.device_put(xperm(v[0])) for v in xs_np]
    jax.block_until_ready(fd(x_is[0], qTi, es_c, em_c))
    gbq = (qTi.size + es_c.size * 4 + em_c.size * 4) / 1e9
    td = med_ms(lambda i: jax.block_until_ready(fd(x_is[i], qTi, es_c, em_c)),
                args.iters)
    print(f"D pallas VPU-q4k: {td:.3f} ms  {gbq/td*1000:.0f} GB/s packed "
          f"({gb/td*1000:.0f} GB/s bf16-equiv)", flush=True)

    # ---- E: the CURRENT row-major q4_k kernel (qmatmul_pallas) ----------
    from moshi_tpu.quant.formats import QuantTensor, enable_pallas
    from moshi_tpu.quant.pallas_matmul import qmatmul_pallas
    q_rm = jax.device_put(rng0.integers(0, 256, (O, K2), np.uint8))
    es_rm = jax.device_put(
        (rng0.standard_normal((O, K // 32)) * 1e-3).astype(np.float32)
        .astype(jnp.bfloat16))
    em_rm = jax.device_put(
        (rng0.standard_normal((O, K // 32)) * 1e-3).astype(np.float32)
        .astype(jnp.bfloat16))
    d_dummy = jax.device_put(np.ones((O, K // 256), np.float32)
                             .astype(jnp.bfloat16))
    qt_rm = QuantTensor("q4_k", (O, K), q_rm, d_dummy, es=es_rm, em=em_rm)
    # NOTE pass qt as an ARG: closing over device arrays embeds them as
    # jaxpr constants, whose bytes jax fetches at trace time -> poisons
    # the process into the 22 ms sync mode
    fe = jax.jit(lambda x, qt: qmatmul_pallas(x, qt))
    jax.block_until_ready(fe(xs[0], qt_rm))
    te = med_ms(lambda i: jax.block_until_ready(fe(xs[i], qt_rm)),
                args.iters)
    print(f"E rowmajor q4_k:  {te:.3f} ms  {gbq/te*1000:.0f} GB/s packed "
          f"({gb/te*1000:.0f} GB/s bf16-equiv)", flush=True)


def grid_overhead():
    """F: per-grid-step cost of a 640-step kernel whose body has 20
    pl.when stage branches (the temporal megakernel's control shape)
    doing tiny VPU work — isolates stage-sequencing overhead."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(x_ref, o_ref, acc):
        li = pl.program_id(0)
        st = pl.program_id(1)

        @pl.when((li == 0) & (st == 0))
        def _z():
            acc[:] = x_ref[:]
        for i in range(20):
            @pl.when(st == i)
            def _s(i=i):
                acc[:] = acc[:] * 1.0000001 + float(i)

        @pl.when((li == 31) & (st == 19))
        def _w():
            o_ref[:] = acc[:]

    f = jax.jit(lambda x: pl.pallas_call(
        kern, grid=(32, 20),
        in_specs=[pl.BlockSpec((8, 128), lambda l, s: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda l, s: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, 128), jnp.float32)],
    )(x))
    xs = [jax.device_put(np.random.default_rng(i).standard_normal(
        (8, 128)).astype(np.float32)) for i in range(9)]
    jax.block_until_ready(f(xs[0]))
    t = med_ms(lambda i: jax.block_until_ready(f(xs[i])), 50)
    print(f"F 640-step grid:  {t:.3f} ms -> {t/640*1000:.2f} us/step",
          flush=True)


if __name__ == "__main__":
    main()
    grid_overhead()
