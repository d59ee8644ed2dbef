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


def med_ms(fn, iters=50):
    fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
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
    key = jax.random.PRNGKey(0)
    w = jax.random.normal(key, (O, K), jnp.bfloat16) * 0.02
    wt = jnp.asarray(w.T)                                 # [K, O]
    x = jax.random.normal(jax.random.PRNGKey(1), (1, K), jnp.float32)
    gb = O * K * 2 / 1e9

    # ---- A: XLA dense ----------------------------------------------------
    fa = jax.jit(lambda x, w: jax.lax.dot_general(
        x.astype(jnp.bfloat16), w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32))
    ya = np.asarray(fa(x, w))
    ta = med_ms(lambda: jax.block_until_ready(fa(x, w)), args.iters)
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
    )(x, w))
    yb = np.asarray(fb(x, w))
    np.testing.assert_allclose(yb, ya, rtol=2e-2, atol=2e-2)
    tb = med_ms(lambda: jax.block_until_ready(fb(x, w)), args.iters)
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
    )(xt, wt))
    yc = np.asarray(fc(x.reshape(K, 1), wt))
    np.testing.assert_allclose(yc, ya, rtol=2e-2, atol=2e-2)
    tc = med_ms(lambda: jax.block_until_ready(fc(x.reshape(K, 1), wt)),
                args.iters)
    print(f"C pallas VPU-T:   {tc:.3f} ms  {gb/tc*1000:.0f} GB/s",
          flush=True)

    # ---- D: pallas VPU transposed q4_k (block-interleaved rows) ---------
    from moshi_tpu.quant.formats import QK, dequantize, quantize
    qt = quantize(np.asarray(w, np.float32), "q4_k")
    K2 = K // 2
    CKP = 256                  # packed rows per chunk (512 unpacked)
    NB = CKP // QK             # packed 32-blocks per chunk (lo) = 8
    nkc = K2 // CKP

    def interleave(rows_mat, block):
        """[R, O] -> same rows permuted so chunk-local row j*nb+b holds
        original row b*block + j of that chunk (nb = chunk blocks)."""
        r, o = rows_mat.shape
        nb = CKP // block if block == QK else CKP // block
        out = rows_mat.reshape(nkc, NB, QK, o) if block == QK else None
        out = np.transpose(out, (0, 2, 1, 3))      # [nkc, 32, nb, O]
        return np.ascontiguousarray(out.reshape(r, o))

    qT = np.asarray(qt.q).T                        # [K2, O] u8
    qTi = jnp.asarray(interleave(qT, QK))
    esT = np.asarray(qt.es.astype(jnp.float32)).T  # [K/32, O]
    emT = np.asarray(qt.em.astype(jnp.float32)).T
    # es rows grouped per chunk: lo-half blocks for chunk ki are rows
    # [ki*NB, +NB); hi-half are [K2/QK + ki*NB, +NB) -> stack as
    # [nkc, 2*NB, O]
    es_lo = esT[: K2 // QK].reshape(nkc, NB, O)
    es_hi = esT[K2 // QK:].reshape(nkc, NB, O)
    es_c = jnp.asarray(np.concatenate([es_lo, es_hi], 1).reshape(-1, O),
                       jnp.float32)                # [nkc*2NB, O]
    em_lo = emT[: K2 // QK].reshape(nkc, NB, O)
    em_hi = emT[K2 // QK:].reshape(nkc, NB, O)
    em_c = jnp.asarray(np.concatenate([em_lo, em_hi], 1).reshape(-1, O),
                       jnp.float32)
    # x permuted to match: lo chunk rows interleaved, then hi
    x_np = np.asarray(x[0], np.float32)

    def xperm(v):
        lo = v[:K2].reshape(nkc, NB, QK)
        hi = v[K2:].reshape(nkc, NB, QK)
        lo = np.transpose(lo, (0, 2, 1)).reshape(nkc, CKP)
        hi = np.transpose(hi, (0, 2, 1)).reshape(nkc, CKP)
        return np.concatenate([lo, hi], 1).reshape(-1, 1)  # [2K2, 1]

    x_i = jnp.asarray(xperm(x_np))

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
    )(xi, q, es, em))
    yd = np.asarray(fd(x_i, qTi, es_c, em_c))
    ref = np.asarray(x, np.float32) @ np.asarray(
        dequantize(qt, jnp.float32)).T
    err = np.abs(yd - ref).max() / (np.abs(ref).mean() + 1e-9)
    print(f"D q4_k rel err:   {err:.5f}", flush=True)
    gbq = qt.nbytes / 1e9
    td = med_ms(lambda: jax.block_until_ready(fd(x_i, qTi, es_c, em_c)),
                args.iters)
    print(f"D pallas VPU-q4k: {td:.3f} ms  {gbq/td*1000:.0f} GB/s packed "
          f"({gb/td*1000:.0f} GB/s bf16-equiv)", flush=True)


if __name__ == "__main__":
    main()
