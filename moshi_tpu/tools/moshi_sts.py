"""moshi-sts: full-duplex speech-to-speech.

Parity with /root/reference/tools/moshi-sts.cpp: input audio -> mimi
encode -> LM (other stream) -> our audio tokens -> mimi decode -> output
audio, with live text transcript; ``--bench`` = 125 silence frames with
fps report (moshi-sts.cpp:770-806); ``--delay`` for file-input echo mode.

On TPU the whole frame is ONE fused device launch (runtime/pipeline.py).

Usage: python -m moshi_tpu.tools.moshi_sts -c config.json -i in.wav -o out.wav
       python -m moshi_tpu.tools.moshi_sts --synthetic --bench
"""

import argparse
import json
import time

import numpy as np

from moshi_tpu import FRAME_SIZE, SAMPLE_RATE
from moshi_tpu.config import parse_config
from moshi_tpu.tools.common import (add_common_args, list_devices, load_lm,
                                    load_mimi, load_tokenizer,
                                    read_audio_24k)

BENCH_FRAMES = 125  # moshi-sts.cpp --bench


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-i", "--input", default=None)
    ap.add_argument("-o", "--output", default="sts.wav")
    ap.add_argument("-c", "--config", default=None)
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--frames", type=int, default=None,
                    help=f"frame budget (default {BENCH_FRAMES} for "
                         "--bench, unbounded for --device)")
    ap.add_argument("--realtime-sim", action="store_true",
                    help="drive the loop through the async frame-FIFO "
                         "driver (common_sdl.h analog) with a paced "
                         "capture thread; reports sustained fps, "
                         "latency p50/p99 vs the 80 ms budget, drops")
    ap.add_argument("--device", nargs="?", const="auto", default=None,
                    help="LIVE full-duplex mic->moshi->speakers through "
                         "an audio device backend (moshi-sts.cpp over "
                         "common_sdl.h; backends: alsa / sounddevice / "
                         "a registered shim; bare --device auto-picks). "
                         "--frames bounds the session, 0 = until the "
                         "stream ends")
    ap.add_argument("--sim-speed", type=float, default=1.0,
                    help="capture pacing speedup for --realtime-sim "
                         "(2.0 = frames arrive every 40 ms)")
    ap.add_argument("--dump-frame", default=None, metavar="PATH",
                    help="run ONE frame with every capture tap recorded "
                         "and write PATH.npz + PATH.json (tensors, "
                         "execution order, caller provenance) — the "
                         "GraphDumper analog (ggml_cap.h:1541-1766)")
    add_common_args(ap)
    args = ap.parse_args(argv)
    if args.frames is None:
        # a live conversation must not silently end at the bench budget
        args.frames = 0 if args.device is not None else BENCH_FRAMES
    if args.list_devices:
        list_devices()
        return 0

    if args.config:
        with open(args.config) as fh:
            config = parse_config(json.load(fh))
    else:
        # 7B moshi layout scaled down unless a real config is given
        config = parse_config({"model_type": "moshi", "dim": 512,
                               "num_layers": 2, "num_heads": 8,
                               "context": 128, "n_q": 16, "dep_q": 8,
                               "card": 2048, "text_card": 4000,
                               "delays": [0, 0] + [1] * 7 + [0] + [1] * 7,
                               "depformer_dim": 256,
                               "depformer_num_layers": 2,
                               "hidden_scale": 4.0})
    import jax
    import jax.numpy as jnp
    lm_cfg, lm_params = load_lm(args, config)
    # HBM-aware context shrink before building state (the reference
    # shrinks context to fit VRAM, moshi-sts.cpp:254-264)
    from moshi_tpu.runtime.memory import auto_shrink_context
    from moshi_tpu.utils.honest import tree_bytes
    lm_cfg, shrunk, ctx = auto_shrink_context(lm_cfg,
                                              tree_bytes(lm_params))
    if shrunk:
        print(f"context shrunk to {ctx} to fit device memory")
    mimi, mimi_params = load_mimi(args, n_q=lm_cfg.n_q)
    tok = load_tokenizer(args, config)

    from moshi_tpu.runtime.pipeline import STSPipeline
    pipe = STSPipeline(mimi, lm_cfg,
                       temp=config.lm_gen_config.temp,
                       temp_text=config.lm_gen_config.temp_text,
                       top_k=config.lm_gen_config.top_k,
                       top_k_text=config.lm_gen_config.top_k_text,
                       mimi_dtype=jnp.float32 if args.synthetic
                       else jnp.bfloat16)
    state = pipe.init_state(1, jax.random.PRNGKey(args.seed))

    if args.bench or not args.input:
        # dithered silence: DISTINCT buffers per frame — identical
        # buffers can be memoized/elided by the runtime (BENCH_NOTES
        # traps #1/#4), which fabricated the round-3 numbers
        rng = np.random.default_rng(args.seed)
        audio = (rng.standard_normal(args.frames * FRAME_SIZE) * 1e-4
                 ).astype(np.float32)
    else:
        audio = read_audio_24k(args.input)
        n = (len(audio) + FRAME_SIZE - 1) // FRAME_SIZE
        audio = np.pad(audio, (0, n * FRAME_SIZE - len(audio)))
    n = len(audio) // FRAME_SIZE

    if args.dump_frame:
        from moshi_tpu.utils.capture import recording
        with recording() as rec:
            out, state = pipe.step(mimi_params, lm_params, state,
                                   audio[:FRAME_SIZE][None])
            np.asarray(out["audio_out"])    # force execution (D->H)
        rec.dump_graph(args.dump_frame)
        print(f"dumped {len(rec.order)} tensors "
              f"({len(rec.values)} taps) to {args.dump_frame}.npz/.json")
        return 0

    transcript = []
    pad_id = config.existing_text_padding_id

    def emit_text(token: int):
        if token not in (pad_id, 0, -2) and token >= 0 and tok:
            transcript.append(tok.id_to_piece(token))

    if args.device is not None:
        # LIVE full duplex (moshi-sts.cpp main loop over common_sdl.h
        # device streams): device capture -> FIFO -> frame step ->
        # device playback, drop/latency accounting vs the 80 ms budget
        from moshi_tpu.io.audio_device import run_device_loop
        st_box = [state]

        def step_live(frame_np):
            out, st_box[0] = pipe.step(mimi_params, lm_params, st_box[0],
                                       frame_np[None])
            emit_text(int(np.asarray(out["text"])[0]))
            return np.asarray(out["audio_out"])[0]

        step_live(np.zeros(FRAME_SIZE, np.float32))   # compile first
        # the warmup frame must not leak into the live session: fresh
        # streaming state, empty transcript (compile cache is keyed on
        # shapes, so the re-run costs nothing)
        st_box[0] = pipe.init_state(1, jax.random.PRNGKey(args.seed))
        transcript.clear()
        name = None if args.device == "auto" else args.device
        rep = run_device_loop(step_live, name=name,
                              max_frames=args.frames)
        print(json.dumps({"metric": "sts_live_device", **rep,
                          "backend": args.device}))
        if transcript:
            print("".join(transcript).replace("▁", " ").strip())
        return 0

    if args.realtime_sim:
        # async-driver loop (common_sdl.h structure): paced capture
        # thread -> FIFO -> per-frame compute -> playback accounting
        from moshi_tpu.io.driver import (CaptureDriver, FrameFIFO,
                                         PlaybackSink, file_source,
                                         realtime_loop)
        st_box = [state]

        def step_frame(frame_np):
            out, st_box[0] = pipe.step(mimi_params, lm_params, st_box[0],
                                       frame_np[None])
            emit_text(int(np.asarray(out["text"])[0]))
            return np.asarray(out["audio_out"])[0]

        # warm/compile OUTSIDE the paced loop (frame 0 = compile)
        step_frame(audio[:FRAME_SIZE])
        fifo = FrameFIFO(FRAME_SIZE, depth=3)
        sink = PlaybackSink(keep_audio=not args.bench)
        cap = CaptureDriver(file_source(audio[FRAME_SIZE:]), fifo,
                            pace=0.08 / max(args.sim_speed, 1e-6)).start()
        rep = realtime_loop(fifo, step_frame, sink)
        cap.join(1.0)
        fps = rep.get("sustained_fps", 0.0)
        out_parts = [sink.audio()]
        print(json.dumps({"metric": "sts_realtime_sim", **rep,
                          "sim_speed": args.sim_speed}))
    else:
        # honest tight loop (moshi-sts.cpp:770-806): every frame's text
        # token is FETCHED and consumed, exactly like the reference —
        # which is also the fastest dispatch mode on this runtime
        # (dispatch-ahead degrades super-linearly; see utils/honest.py)
        out_parts = []
        t0 = None
        for f in range(n):
            frame = audio[f * FRAME_SIZE:(f + 1) * FRAME_SIZE][None]
            out, state = pipe.step(mimi_params, lm_params, state, frame)
            emit_text(int(np.asarray(out["text"])[0]))     # D->H fetch
            if f == 0:
                t0 = time.perf_counter()   # frame 0 = compile, excluded
            if not args.bench:
                out_parts.append(np.asarray(out["audio_out"])[0])
        dt = time.perf_counter() - t0 if t0 else 1.0
        frames_timed = max(n - 1, 0)
        fps = frames_timed / dt if frames_timed else 0.0

    if not args.bench:
        from moshi_tpu.io.media import save_audio as save_wav
        wav = np.concatenate(out_parts)
        save_wav(args.output, wav, SAMPLE_RATE)
        print(f"wrote {args.output}: {len(wav) / SAMPLE_RATE:.2f}s")
    if transcript:
        print("".join(transcript).replace("▁", " ").strip())
    print(f"bench: {fps:.2f} frames/s ({fps / 12.5:.2f}x realtime), "
          f"{n} frames")
    if args.bench:
        print(json.dumps({"metric": "sts_frames_per_sec",
                          "value": round(fps, 2), "unit": "frames/s"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
