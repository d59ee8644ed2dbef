"""Round-3 bisection: why do the temporal matmul kernels run at
~0.35 TB/s in-model when the same kernel streams 1.77 TB/s standalone
(stream_experiment S3, distinct uncacheable buffers)?

All variants chain kernels with a true serial x-dependency inside ONE
jit and cycle call-level inputs; nothing is fetched during timing.
Shape is the 7B glu_in (22528 x 4096 q4_k packed, 46 MB/kernel);
32 kernels per jit call ~= one frame's worth of that shape.

  Q1 32 kernels, 32 DISTINCT flat buffers, python-unrolled
  Q2 32 kernels, ONE flat buffer repeated       (cache/memo effect)
  Q3 32 kernels, ONE [32, O, K] stacked buffer, scalar-prefetch layer
     index, python-unrolled                     (stacked index map)
  Q4 = Q3 via lax.scan over the layer index     (scan machinery)
  Q5 = Q4 with the real 4-matmul layer mix (in/out/glu/ffn shapes)
     on stacked buffers = probe3's "temporal matmuls only" control

Run: PYTHONPATH=/tmp/repo_bench:/root/.axon_site python \
    benchmarks/probe5_bisect.py
"""

import time

import numpy as np

O, K = 22528, 4096
NL = 32


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print("devices:", jax.devices(), flush=True)

    from moshi_tpu.quant.formats import QuantTensor, quantize
    from moshi_tpu.quant import pallas_matmul as pm
    pm.set_int8(True)

    rng = np.random.default_rng(0)

    def synth_qt(o, k):
        w = (rng.standard_normal((o, k)) * 0.02).astype(np.float32)
        return jax.device_put(quantize(w, "q4_k"))

    def stack(qts):
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *qts)

    x0 = jax.device_put(jnp.asarray(rng.standard_normal((1, K)),
                                    jnp.float32))
    nbytes = NL * O * K // 2

    def norm_feed(y):
        x = y[:, :K]
        return x * jax.lax.rsqrt(jnp.mean(x * x) + 1e-8)

    def run(tag, jf, arg_sets, iters=24):
        x = jf(x0, *arg_sets[0])
        jax.block_until_ready(x)
        x = jf(x, *arg_sets[1 % len(arg_sets)])
        jax.block_until_ready(x)
        t0 = time.perf_counter()
        for i in range(iters):
            x = jf(x, *arg_sets[(i + 2) % len(arg_sets)])
        jax.block_until_ready(x)
        ms = (time.perf_counter() - t0) * 1000 / iters
        print(f"Q {tag}: {ms:7.3f} ms/call  ({nbytes / ms / 1e6:.0f} GB/s "
              f"packed)", flush=True)

    def guard(tag, fn):
        try:
            fn()
        except Exception as e:
            print(f"Q {tag}: FAIL {type(e).__name__}: {str(e)[:300]}",
                  flush=True)

    # ---- Q1: distinct flat buffers, unrolled ---------------------------
    def q1():
        qts = [synth_qt(O, K) for _ in range(NL)]
        leaves = [(q.q, q.d, q.es, q.em) for q in qts]
        flat = [a for le in leaves for a in le]

        def f(x, *ws):
            for l in range(NL):
                q, d, es, em = ws[4 * l:4 * l + 4]
                qt = QuantTensor("q4_k", (O, K), q, d, es=es, em=em)
                y = pm.qmatmul_pallas(x, qt, interpret=False)
                x = norm_feed(y.reshape(1, O))
            return x
        run("Q1 32 distinct flat bufs, unrolled", jax.jit(f), [tuple(flat)])
    guard("Q1", q1)

    # ---- Q2: one flat buffer repeated ----------------------------------
    def q2():
        qt = synth_qt(O, K)

        def f(x, q, d, es, em):
            qt2 = QuantTensor("q4_k", (O, K), q, d, es=es, em=em)
            for _ in range(NL):
                y = pm.qmatmul_pallas(x, qt2, interpret=False)
                x = norm_feed(y.reshape(1, O))
            return x
        run("Q2 one flat buf x32, unrolled", jax.jit(f),
            [(qt.q, qt.d, qt.es, qt.em)])
    guard("Q2", q2)

    # ---- Q3: stacked buffer, scalar-prefetch index, unrolled -----------
    def q3():
        st = stack([synth_qt(O, K) for _ in range(NL)])

        def f(x, q, d, es, em):
            qt = QuantTensor("q4_k", (O, K), q, d, es=es, em=em)
            for l in range(NL):
                y = pm.qmatmul_pallas_stacked(x, qt, jnp.int32(l))
                x = norm_feed(y.reshape(1, O))
            return x
        run("Q3 stacked buf, prefetch idx, unrolled", jax.jit(f),
            [(st.q, st.d, st.es, st.em)])
        return st

    st_holder = []
    guard("Q3", lambda: st_holder.append(q3()))

    # ---- Q4: stacked buffer via lax.scan -------------------------------
    def q4():
        st = st_holder[0] if st_holder else stack(
            [synth_qt(O, K) for _ in range(NL)])

        def f(x, q, d, es, em):
            qt = QuantTensor("q4_k", (O, K), q, d, es=es, em=em)

            def body(c, l):
                y = pm.qmatmul_pallas_stacked(c, qt, l)
                return norm_feed(y.reshape(1, O)), ()
            y, _ = jax.lax.scan(body, x, jnp.arange(NL, dtype=jnp.int32))
            return y
        run("Q4 stacked buf, lax.scan", jax.jit(f),
            [(st.q, st.d, st.es, st.em)])
    guard("Q4", q4)

    print("done", flush=True)


if __name__ == "__main__":
    main()
