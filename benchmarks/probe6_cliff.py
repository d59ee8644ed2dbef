"""Find the device's fast-tier capacity and TRUE HBM streaming rate.

probe5 showed repeated-buffer kernel chains at physically impossible
rates (up to 50 TB/s) while the real model streams at ~0.31 TB/s — the
device serves repeated reads below some capacity from a fast tier.
This probe grows the per-call working set (stacked q4_k weights, the
production scalar-prefetch scan) until the rate cliffs; the plateau
after the cliff is the chip's true streaming bandwidth.

NL layers of 22528x4096 q4_k packed = NL * 46 MB:
  32 -> 1.5 GB, 64 -> 2.9 GB, 96 -> 4.4 GB, 128 -> 5.9 GB

Run: PYTHONPATH=/tmp/repo_bench:/root/.axon_site python \
    benchmarks/probe6_cliff.py
"""

import time

import numpy as np

O, K = 22528, 4096


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
    x0 = jax.device_put(jnp.asarray(rng.standard_normal((1, K)),
                                    jnp.float32))

    def norm_feed(y):
        x = y[:, :K]
        return x * jax.lax.rsqrt(jnp.mean(x * x) + 1e-8)

    for nl in (32, 64, 96, 128):
        try:
            # one stacked buffer of nl distinct layers
            w = (rng.standard_normal((nl * 1024, K)) * 0.02).astype(
                np.float32)
            # quantize in [O, K] slabs to keep host memory sane
            qts = []
            per = nl // 8 if nl % 8 == 0 else 1
            del per
            qt_np = quantize(
                (rng.standard_normal((O, K)) * 0.02).astype(np.float32),
                "q4_k")
            del w
            # build the stack device-side by tiling + re-randomizing q
            # bytes (scale arrays shared; only q bytes need to differ to
            # defeat dedup)
            qs = jax.device_put(jnp.asarray(
                rng.integers(0, 255, (nl,) + qt_np.q.shape, np.uint8)))
            d = jax.device_put(jnp.broadcast_to(
                jnp.asarray(qt_np.d), (nl,) + qt_np.d.shape))
            es = jax.device_put(jnp.broadcast_to(
                jnp.asarray(qt_np.es), (nl,) + qt_np.es.shape))
            em = jax.device_put(jnp.broadcast_to(
                jnp.asarray(qt_np.em), (nl,) + qt_np.em.shape))
            gb = nl * O * K / 2 / 1e9

            def f(x, q, dd, e1, e2):
                qt = QuantTensor("q4_k", (O, K), q, dd, es=e1, em=e2)

                def body(c, l):
                    y = pm.qmatmul_pallas_stacked(c, qt, l)
                    return norm_feed(y.reshape(1, O)), ()
                y, _ = jax.lax.scan(body, x,
                                    jnp.arange(nl, dtype=jnp.int32))
                return y
            jf = jax.jit(f)
            x = jf(x0, qs, d, es, em)
            jax.block_until_ready(x)
            x = jf(x, qs, d, es, em)
            jax.block_until_ready(x)
            iters = 12
            t0 = time.perf_counter()
            for _ in range(iters):
                x = jf(x, qs, d, es, em)
            jax.block_until_ready(x)
            ms = (time.perf_counter() - t0) * 1000 / iters
            print(f"C nl={nl:3d} ({gb:.1f} GB/call): {ms:8.3f} ms/call "
                  f"({gb * 1000 / ms:.0f} GB/s)", flush=True)
            del qs, d, es, em
        except Exception as e:
            print(f"C nl={nl}: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
