"""In-jit sequencing cost: chains of dependent ops inside ONE jit.

Isolated kernels time at ~0.07 ms (launch-overlapped) — this measures
what a SEQUENCE costs on-device, which is what a 32-layer decode step
actually is:
  A. chain of N q4_k qmatmul_pallas calls ([4096, 4096], y feeds x)
  B. chain of N XLA elementwise ops on [1, 4096]
  C. chain of N dense bf16 [4096, 4096] XLA matvecs

Methodology per CLAUDE.md: inputs varied per call, weights as args,
NO device->host fetch in-process.
"""

import argparse
import time

import numpy as np


def med_ms(fn, iters=30, nvar=8):
    fn(0)
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        fn((i % nvar) + 1)
        ts.append((time.perf_counter() - t0) * 1000)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32)
    args = ap.parse_args()
    N = args.n

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from moshi_tpu.quant.formats import QuantTensor
    from moshi_tpu.quant.pallas_matmul import qmatmul_pallas

    K = 4096
    rng = np.random.default_rng(0)
    xs = [jax.device_put(rng.standard_normal((1, K)).astype(np.float32))
          for _ in range(9)]

    # A: q4_k chain
    q = jax.device_put(rng.integers(0, 256, (K, K // 2), np.uint8))
    es = jax.device_put((rng.standard_normal((K, K // 32)) * 1e-3)
                        .astype(np.float32).astype(jnp.bfloat16))
    em = jax.device_put((rng.standard_normal((K, K // 32)) * 1e-3)
                        .astype(np.float32).astype(jnp.bfloat16))
    dd = jax.device_put(np.ones((K, K // 256), np.float32)
                        .astype(jnp.bfloat16))
    qt = QuantTensor("q4_k", (K, K), q, dd, es=es, em=em)

    def chain_q(x, qt):
        for _ in range(N):
            x = qmatmul_pallas(x, qt) * 1e-3
        return x

    fa = jax.jit(chain_q)
    jax.block_until_ready(fa(xs[0], qt))
    ta = med_ms(lambda i: jax.block_until_ready(fa(xs[i], qt)))
    print(f"A q4_k chain x{N}:  {ta:.3f} ms -> {ta/N*1000:.0f} us/op",
          flush=True)

    # B: elementwise chain
    def chain_e(x):
        for i in range(N):
            x = x * 1.0001 + float(i) * 1e-6
        return x

    fb = jax.jit(chain_e)
    jax.block_until_ready(fb(xs[0]))
    tb = med_ms(lambda i: jax.block_until_ready(fb(xs[i])))
    print(f"B eltwise chain x{N}: {tb:.3f} ms -> {tb/N*1000:.1f} us/op",
          flush=True)

    # C: dense matvec chain
    w = jax.device_put((rng.standard_normal((K, K)) * 0.01)
                       .astype(np.float32).astype(jnp.bfloat16))

    def chain_d(x, w):
        for _ in range(N):
            x = jax.lax.dot_general(
                x.astype(jnp.bfloat16), w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * 1e-2
        return x

    fc = jax.jit(chain_d)
    jax.block_until_ready(fc(xs[0], w))
    tc = med_ms(lambda i: jax.block_until_ready(fc(xs[i], w)))
    print(f"C dense chain x{N}: {tc:.3f} ms -> {tc/N*1000:.0f} us/op",
          flush=True)


if __name__ == "__main__":
    main()
