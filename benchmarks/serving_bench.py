"""TTSSessionPool throughput: continuous batching requests/s (VERDICT
r3 item 5; chunked ticks + auto slots, VERDICT r4 item 2).

Streams a queue of TTS requests (random scripts of varying length)
through a TTSSessionPool with N slots.  Default mode runs CHUNKED pool
ticks (`tick_chunk`): one lax.scan launch + one D->H fetch per --chunk
frames (the device FSM needs no host between frames), with
attach_many() batching session admission at chunk boundaries.
`--chunk 1` restores the per-frame-synced tick() for A/B.  Every
chunk's audio bytes land on the host, so the measurement is honest.

Prints ONE JSON line: requests/s, session-frames/s, ticks, wall.

Usage: python benchmarks/serving_bench.py [--small] [--slots 4|auto]
       [--requests 12] [--chunk 16]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--slots", default="4",
                    help="slot count, or 'auto' = HBM-derived "
                         "(runtime/serving.auto_slots)")
    ap.add_argument("--requests", type=int, default=12)
    ap.add_argument("--chunk", type=int, default=16,
                    help="frames per pool tick_chunk launch; 1 = "
                         "per-frame-synced tick() (the round-4 mode)")
    ap.add_argument("--fmt", default="q8_0",
                    choices=["q8_0", "q8_r", "q4_k", "bf16"],
                    help="weight format for the pool A/B: q8_0 (f32-"
                         "dequant pallas at B>1), q8_r (plain XLA int8 "
                         "dot — batches on the MXU), q4_k, bf16")
    ap.add_argument("--max-ticks", type=int, default=3000)
    args = ap.parse_args()

    import jax
    import os
    if os.environ.get("MOSHI_TPU_CPU"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from moshi_tpu.models.lm import LMConfig
    from moshi_tpu.models.mimi import MimiConfig, MimiModel
    from moshi_tpu.models.state_machine import Entry, StateMachine
    from moshi_tpu.nn.seanet import SEANetConfig
    from moshi_tpu.quant.formats import enable_pallas
    from moshi_tpu.runtime.pipeline import TTSPipeline
    from moshi_tpu.runtime.serving import TTSSessionPool
    from moshi_tpu.runtime.synth import synth_lm_params

    if args.small:
        cfg = LMConfig(dim=256, num_heads=4, num_layers=2, hidden_dim=512,
                       context=64, card=256, n_q=4, dep_q=2, text_card=512,
                       delays=(0, 0, 1, 1, 2), depformer_dim=256,
                       depformer_heads=4, depformer_layers=2,
                       depformer_hidden=512, depformer_low_rank=16)
        mimi_cfg = MimiConfig(
            n_q=2, total_codebooks=4, dim=32,
            seanet=SEANetConfig(dimension=32, n_filters=4,
                                ratios=(4, 3, 2, 2)),
            codebook_dim=16, codebook_size=64, transformer_layers=2,
            transformer_heads=4, transformer_context=16,
            transformer_hidden=64)
        fmt = None
    else:
        # default-class TTS geometry (config.h defaults; BENCH_NOTES)
        cfg = LMConfig(dim=2048, num_heads=16, num_layers=16,
                       hidden_dim=2048 * 4, context=500, card=2048,
                       n_q=32, dep_q=32, text_card=8000,
                       delays=(0,) + (2,) * 32,
                       depformer_dim=1024, depformer_heads=16,
                       depformer_layers=6, depformer_hidden=1024 * 4,
                       depformer_low_rank=128, delay_steps=16,
                       demux_second_stream=True)
        mimi_cfg = MimiConfig(n_q=32)
        fmt = None if args.fmt == "bf16" else args.fmt
    if jax.default_backend() != "cpu":
        enable_pallas(True)

    params = synth_lm_params(jax.random.PRNGKey(0), cfg, fmt=fmt)
    mimi = MimiModel(mimi_cfg)
    mimi_params = mimi.init_params(jax.random.PRNGKey(1), jnp.bfloat16)
    machine = StateMachine(
        text_card=cfg.text_card + 1,
        second_stream_ahead=2 if cfg.demux_second_stream else 0,
        max_padding=8, initial_padding=2)
    pipe = TTSPipeline(mimi, cfg)
    if args.slots == "auto":
        from moshi_tpu.quant.formats import QuantTensor
        from moshi_tpu.runtime.serving import auto_slots

        def nbytes(a):
            return sum(x.size * x.dtype.itemsize
                       for x in jax.tree_util.tree_leaves(a))
        weight_bytes = nbytes(params) + nbytes(mimi_params)
        slots = auto_slots(cfg, weight_bytes, cap=16)
        print(f"# auto slots: {slots} (weights "
              f"{weight_bytes / 2**30:.2f} GiB)", flush=True)
    else:
        slots = int(args.slots)
    pool = TTSSessionPool(pipe, machine, mimi_params, params, batch=slots)

    rng = np.random.default_rng(0)

    def random_script(n_words):
        return [Entry(list(rng.integers(4, cfg.text_card - 1,
                                        rng.integers(1, 4))),
                      f"w{i}", 1) for i in range(n_words)]

    def run_tick():
        if args.chunk > 1:
            return pool.tick_chunk(args.chunk)
        return pool.tick()

    pending = [random_script(int(rng.integers(4, 12)))
               for _ in range(args.requests)]
    next_id = 0
    done = 0
    frames = 0
    # warm/compile tick with one session attached (excluded from timing)
    pool.attach("warm", random_script(2))
    while pool.active:
        run_tick()
    t0 = time.perf_counter()
    ticks = 0
    while done < args.requests and ticks < args.max_ticks:
        admit = {}
        while pending and pool.active + len(admit) < slots:
            admit[f"r{next_id}"] = pending.pop(0)
            next_id += 1
        if admit:
            pool.attach_many(admit)
        res = run_tick()
        ticks += 1
        # count USEFUL session-frames (chunk mode trims a finished
        # slot's free-running tail; don't credit trimmed frames)
        frames += sum(
            (len(r["audio_out"]) if getattr(r["audio_out"], "ndim", 1) > 1
             else 1) for r in res.values())
        done += sum(1 for r in res.values() if r["done"])
    dt = time.perf_counter() - t0

    print(json.dumps({
        "metric": "tts_pool_requests_per_sec",
        "value": round(done / dt, 2), "unit": "req/s",
        "fmt": args.fmt,
        "slots": slots, "chunk": args.chunk, "requests": done,
        "session_frames_per_sec": round(frames / dt, 2),
        "ticks": ticks, "wall_s": round(dt, 2),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
