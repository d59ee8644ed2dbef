"""Ground-truth HBM streaming bandwidth with UNCACHEABLE working sets.

Every earlier micro-number (dense 4.6 TB/s, int8-dot 27 TB/s, f32 kernel
1.5 TB/s) reused ONE weight buffer across the timed chain — on this chip
that is served from cache, not HBM.  The real-model evidence says
otherwise: the full 7B frame moves ~3.9 GB of packed weights in 18.3 ms
(~0.21 TB/s), and the unpacked-i8 A/B (2x bytes -> ~2x slower temporal
matmuls) behaves exactly like a bandwidth-bound pipeline.

This probe cycles through NBUF=8 distinct weight buffers (368 MB packed
working set, uncacheable) and measures ms/op for:
  S1 XLA dense bf16 matvec                  (XLA's own streaming rate)
  S2 pallas f32-dequant q4_k kernel         (production MOSHI_TPU_INT8=0)
  S3 pallas int8-MXU q4_k kernel, packed    (production default)
  S4 pallas minimal kernel: stream q, one u8 row-sum per tile (DMA cap)
  S5 = S4 with (tile x 4) blocks            (DMA efficiency vs block size)
Feedback chains a data dependency through every call; nothing is fetched
until timing ends.

Run: PYTHONPATH=/tmp/repo_bench:/root/.axon_site python \
    benchmarks/stream_experiment.py
"""

import time

import numpy as np

O, K = 22528, 4096
NBUF = 8
CALLS = 48  # 6 passes over the 8 buffers


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices(), flush=True)

    from moshi_tpu.quant.formats import QuantTensor, quantize
    from moshi_tpu.quant import pallas_matmul as pm

    rng = np.random.default_rng(0)
    qts = []
    for i in range(NBUF):
        w = (rng.standard_normal((O, K)) * 0.02).astype(np.float32)
        qts.append(quantize(w, "q4_k"))
    qts = [jax.device_put(q) for q in qts]
    dense = [jax.device_put(jnp.asarray(
        rng.standard_normal((O, K)), jnp.bfloat16)) for _ in range(NBUF)]
    x0 = jax.device_put(jnp.asarray(rng.standard_normal((1, K)),
                                    jnp.float32))
    packed_bytes = O * K // 2
    dense_bytes = O * K * 2

    def norm_feed(y):
        x = y.reshape(-1)[:K].reshape(1, K)
        return x * jax.lax.rsqrt(jnp.mean(x * x) + 1e-8)

    def run(tag, jf, args_list, nbytes):
        # jf(x, *args_list[i]) -> y ; cycles buffers
        x = jf(x0, *args_list[0])
        jax.block_until_ready(x)
        x = jf(x, *args_list[1 % NBUF])
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        for i in range(CALLS):
            x = jf(x, *args_list[(i + 2) % NBUF])
        jax.block_until_ready(x)
        ms = (time.perf_counter() - t0) * 1000 / CALLS
        print(f"S {tag}: {ms:.3f} ms/op  ({nbytes / ms / 1e6:.0f} GB/s)",
              flush=True)

    def guard(tag, fn):
        try:
            fn()
        except Exception as e:
            print(f"S {tag}: FAIL {type(e).__name__}: {str(e)[:300]}",
                  flush=True)

    # ---- S1: XLA dense bf16 matvec -------------------------------------
    def s1():
        @jax.jit
        def f(x, w):
            y = jax.lax.dot_general(
                x.astype(jnp.bfloat16), w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return norm_feed(y)
        run("S1 XLA dense bf16 matvec", f, [(d,) for d in dense],
            dense_bytes)
    guard("S1", s1)

    # ---- S2/S3: production kernels -------------------------------------
    def mk_prod(int8):
        def f(x, q, d, es, em):
            qt = QuantTensor("q4_k", (O, K), q, d, es=es, em=em)
            pm.set_int8(int8)
            y = pm.qmatmul_pallas(x, qt, interpret=False)
            return norm_feed(y)
        return jax.jit(f)

    def s2():
        jf = mk_prod(False)
        run("S2 pallas f32-dequant q4_k", jf,
            [(q.q, q.d, q.es, q.em) for q in qts], packed_bytes)

    def s3():
        jf = mk_prod(True)
        run("S3 pallas int8-MXU q4_k (packed)", jf,
            [(q.q, q.d, q.es, q.em) for q in qts], packed_bytes)
    guard("S2", s2)
    guard("S3", s3)
    pm.set_int8(True)

    # ---- S4/S5: minimal DMA kernel -------------------------------------
    def mk_dma(tile):
        k2 = K // 2

        def kern(q_ref, o_ref):
            # one int pass: row-sums of the u8 tile (forces the DMA, no
            # unpack/epilogue)
            o_ref[:] = jnp.sum(q_ref[:].astype(jnp.int32), axis=1,
                               keepdims=True).astype(jnp.float32)

        f = pl.pallas_call(
            kern, grid=(O // tile,),
            in_specs=[pl.BlockSpec((tile, k2), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tile, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((O, 1), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )

        def g(x, q):
            y = f(q)
            return norm_feed(y + x.sum())
        return jax.jit(g)

    def s4():
        run("S4 pallas DMA-only (tile 1024)", mk_dma(1024),
            [(q.q,) for q in qts], packed_bytes)

    def s5():
        run("S5 pallas DMA-only (tile 4096)", mk_dma(4096),
            [(q.q,) for q in qts], packed_bytes)
    guard("S4", s4)
    guard("S5", s5)

    print("done", flush=True)


if __name__ == "__main__":
    main()
