"""Round-5 probe: VPU cost of the packed-nibble unpack chain.

The 7B frame sits at 1.44x its HBM-bytes floor; the named residual is
the in-kernel u8 nibble unpack (6 vector ops per packed byte at i32
lane width) plus per-kernel ramp (BENCH_NOTES roofline).  This probe
A/Bs ONLY the unpack chain inside the production int8-MXU q4_k matvec
(quant/pallas_matmul_int8.py), at the 7B FFN shape:

  U0  current: pk=u8->i32; lo=(pk&15)->i8; hi=((pk>>4)&15)->i8
  U1  drop the &15 on hi (u8 source: >>4 already yields 0..15)
  U2  native-u8 lo: lo=bitcast(w&15,u8->i8) (no i32 round-trip); hi
      via the i32 chain (no u8 shift on this Mosaic)
  U3  i16 chain: pk=u8->i16 (2x denser lanes than i32)
  U4  U1 with 2048-wide unpack chunks (fewer chain setups)
  U5  unpacked-i8 weights (zero unpack, 2x bytes — roofline ref)

Methodology (honest, CLAUDE.md): device-side feedback chain (x_{t+1} =
f(y_t)) so inputs differ per call; nothing fetched during timing; ONE
final D->H FETCH (np.asarray) ends the clock — block_until_ready acks
early on this runtime and is never trusted.

Run: PYTHONPATH=/tmp/repo_r5b:/root/.axon_site python \
    benchmarks/unpack_probe.py
"""

import functools
import time

import numpy as np

O, K = 22528, 4096
QK = 32
NB = K // QK
TO = 2048
CHAIN = 8
CALLS = 20


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from moshi_tpu.quant.pallas_matmul_int8 import (_epilogue_q4k,
                                                    _prep_int8_activation)

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
    x0 = jax.device_put(jnp.asarray(
        rng.normal(size=(1, K)).astype(np.float32) * 0.05))

    nblocks = O // TO

    def mk_kernel(unpack, packed=True):
        def kernel(x_ref, w_ref, es_ref, em_ref, o_ref, xq_s, xs_s, dx_s):
            @pl.when(pl.program_id(0) == 0)
            def _():
                _prep_int8_activation(x_ref[:], None, xq_s, xs_s, dx_s,
                                      k=K, nb=NB)
            p = unpack(w_ref, xq_s)
            o_ref[:] = _epilogue_q4k(p, es_ref, em_ref, dx_s[:], xs_s[:])

        wcols = K // 2 if packed else K
        return pl.pallas_call(
            kernel,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec((1, K), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TO, wcols), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TO, NB), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TO, NB), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TO, 1), lambda i: (i, 0),
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

    def dots(lo, hi, xq_s, c0, cs):
        k2 = K // 2
        a = jax.lax.dot_general(
            lo, xq_s[:, c0:c0 + cs], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        b = jax.lax.dot_general(
            hi, xq_s[:, k2 + c0:k2 + c0 + cs], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        return a + b

    def mk_unpack(chunk, lo_mode, hi_mode):
        def unpack(w_ref, xq_s):
            k2 = K // 2
            acc = jnp.zeros((TO, NB), jnp.int32)
            for c0 in range(0, k2, chunk):
                cs = min(chunk, k2 - c0)
                wv = w_ref[:, c0:c0 + cs]
                if lo_mode == "i32":
                    pk = wv.astype(jnp.int32)
                    lo = (pk & 15).astype(jnp.int8)
                elif lo_mode == "i16":
                    pk = wv.astype(jnp.int16)
                    lo = (pk & 15).astype(jnp.int8)
                else:  # u8-native
                    lo = jax.lax.bitcast_convert_type(
                        wv & jnp.uint8(15), jnp.int8)
                    pk = wv.astype(jnp.int32)
                if hi_mode == "mask":
                    hi = ((pk >> 4) & 15).astype(jnp.int8)
                else:     # nomask
                    hi = (pk >> 4).astype(jnp.int8)
                acc += dots(lo, hi, xq_s, c0, cs)
            return acc
        return unpack

    def unpack_i8(w_ref, xq_s):
        return jax.lax.dot_general(
            w_ref[:], xq_s[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)

    variants = {
        "U0_current": (mk_kernel(mk_unpack(512, "i32", "mask")), w_u8),
        "U1_nomask": (mk_kernel(mk_unpack(512, "i32", "nomask")), w_u8),
        "U2_u8lo": (mk_kernel(mk_unpack(512, "u8", "nomask")), w_u8),
        "U3_i16": (mk_kernel(mk_unpack(512, "i16", "nomask")), w_u8),
        "U4_chunk2048": (mk_kernel(mk_unpack(2048, "i32", "nomask")),
                         w_u8),
        "U5_i8storage": (mk_kernel(unpack_i8, packed=False), w_i8),
    }

    results = {}
    ref_y = None
    for name, (call, w) in variants.items():
        try:
            def chain(x, w=w, call=call):
                for _ in range(CHAIN):
                    y = call(x, w, es16, em16)          # [O, 1]
                    # feed back a normalized slice: distinct input per
                    # matvec, device-side only
                    x = (y[:K, 0] / (jnp.max(jnp.abs(y)) + 1e-6))[None]
                return x

            jf = jax.jit(chain)
            xw = jf(x0)
            float(np.asarray(xw)[0, 0])        # warm + compile, FETCHED
            x = x0
            t0 = time.perf_counter()
            for _ in range(CALLS):
                x = jf(x)
            got = np.asarray(x)                # the ONLY fetch ends the clock
            dt = (time.perf_counter() - t0) * 1000 / (CALLS * CHAIN)
            assert np.isfinite(got).all()
            results[name] = dt
            print(f"{name}: {dt:.3f} ms/matvec", flush=True)
        except Exception as e:
            results[name] = None
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    bytes_packed = O * K // 2 + 2 * O * NB * 2
    print(f"floor(packed) = {bytes_packed / 0.72e12 * 1e3:.3f} ms, "
          f"floor(i8) = {(O * K + 2 * O * NB * 2) / 0.72e12 * 1e3:.3f} ms")
    print({k: (round(v, 3) if v else None) for k, v in results.items()})


if __name__ == "__main__":
    main()
