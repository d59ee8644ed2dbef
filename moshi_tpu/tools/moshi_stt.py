"""moshi-stt: speech -> text (+ VAD, .srt subtitles).

Parity with /root/reference/tools/moshi-stt.cpp: audio -> mimi encode ->
LM receive2 -> text tokens + VAD probability; ``-s out.srt`` writes
VAD-segmented subtitles; 8 extra flush frames at end-of-input
(moshi-stt.cpp:552-719).

Usage: python -m moshi_tpu.tools.moshi_stt -c config.json -i speech.wav
"""

import argparse
import json
import time

import numpy as np

from moshi_tpu import FRAME_SIZE
from moshi_tpu.config import parse_config
from moshi_tpu.tools.common import (add_common_args, list_devices, load_lm,
                                    load_mimi, load_tokenizer,
                                    read_audio_24k)

FLUSH_FRAMES = 8  # moshi-stt.cpp end-of-input flush


def _fmt_ts(sec: float) -> str:
    ms = int(round(sec * 1000))
    h, ms = divmod(ms, 3600_000)
    m, ms = divmod(ms, 60_000)
    s, ms = divmod(ms, 1000)
    return f"{h:02d}:{m:02d}:{s:02d},{ms:03d}"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-i", "--input", required=False)
    ap.add_argument("-c", "--config", default=None)
    ap.add_argument("-s", "--srt", default=None, help="write .srt subtitles")
    ap.add_argument("--vad-threshold", type=float, default=0.5)
    ap.add_argument("--scan", action="store_true",
                    help="offline mode: transcribe in chunked multi-"
                         "frame lax.scans (one launch per chunk; all "
                         "input frames are known upfront in file mode)")
    add_common_args(ap)
    args = ap.parse_args(argv)
    if args.list_devices:
        list_devices()
        return 0

    if args.config:
        with open(args.config) as fh:
            config = parse_config(json.load(fh))
    else:
        config = parse_config({"model_type": "stt", "dim": 512,
                               "num_layers": 2, "num_heads": 8,
                               "context": 64, "n_q": 8, "dep_q": 0,
                               "card": 2048, "text_card": 4000,
                               "delays": [0] + [1] * 8,
                               "extra_heads_num_heads": 4,
                               "hidden_scale": 4.0,
                               # tiny synthetic model: keep the (normally
                               # 5.0s/1.0s, config.h:151-152) delays short
                               "stt_config": {
                                   "audio_delay_seconds": 0.5,
                                   "audio_silence_prefix_seconds": 0.0}})
    args.stt = True
    import jax
    import jax.numpy as jnp
    lm_cfg, lm_params = load_lm(args, config)
    mimi, mimi_params = load_mimi(args, n_q=lm_cfg.n_q)
    tok = load_tokenizer(args, config)

    from moshi_tpu.runtime.pipeline import STTPipeline
    pipe = STTPipeline(mimi, lm_cfg,
                       temp_text=config.lm_gen_config.temp_text,
                       top_k_text=config.lm_gen_config.top_k_text,
                       mimi_dtype=jnp.float32 if args.synthetic
                       else jnp.bfloat16)
    state = pipe.init_state(1, jax.random.PRNGKey(args.seed))

    audio = read_audio_24k(args.input)
    silence_prefix = int(config.stt_config.audio_silence_prefix_seconds
                         * 24_000)
    audio = np.concatenate([np.zeros(silence_prefix, np.float32), audio,
                            np.zeros(FLUSH_FRAMES * FRAME_SIZE, np.float32)])
    n = (len(audio) + FRAME_SIZE - 1) // FRAME_SIZE
    audio = np.pad(audio, (0, n * FRAME_SIZE - len(audio)))

    pieces = []
    srt_segments = []
    seg_tokens = []
    seg_start = None
    pad_id = config.existing_text_padding_id
    # text lags the audio by audio_delay_seconds; subtitle timestamps must
    # subtract that delay (reference: moshi-stt.cpp:438,622,644)
    stt_frame_delay = int(config.stt_config.audio_delay_seconds * 12.5)
    # Honest frame loop (round 4): text tokens are FETCHED and consumed
    # — the round-3 "fetch after timing" loop measured elided execution
    # (block_until_ready can ack before the work runs on this runtime;
    # utils/honest.py).  --window 1 (default) fetches every frame like
    # the reference's readback; --window N>1 fetches every N frames,
    # amortizing this rig's ~29 ms/RPC tunnel floor (every earlier
    # frame is forced by state dataflow, so the clock stays honest;
    # remaining tokens are fetched after timing).  Frame 0 (compile)
    # pays via a real fetch, then timing starts.
    win = max(1, args.window)
    if args.scan:
        # offline transcription: ALL input frames are known upfront, so
        # run chunked multi-frame lax.scans — one launch per chunk
        # (pipeline.STTPipeline.scan_frames; ~12 ms/frame in-scan vs
        # ~19-20 ms/launch for the same step on this rig).  Warm chunk
        # programs on one throwaway frame set (compile excluded), then
        # time the real pass; fetching the text arrays closes the clock.
        frames_arr = jnp.asarray(
            audio[: n * FRAME_SIZE].reshape(n, 1, FRAME_SIZE))
        # warm EVERY program of the timed pass, including the batched
        # mimi chunks of the three-phase scan (a warm pass over the
        # full input; compiles are excluded from timing)
        warm_state = pipe.init_state(1, jax.random.PRNGKey(args.seed))
        t, _, warm_state = pipe.scan_frames(
            mimi_params, lm_params, warm_state, frames_arr)
        np.asarray(t)
        del warm_state
        state = pipe.init_state(1, jax.random.PRNGKey(args.seed))
        t0 = time.perf_counter()
        texts, vads, state = pipe.scan_frames(mimi_params, lm_params,
                                              state, frames_arr)
        texts = np.asarray(texts)                      # D->H closes it
        vads = np.asarray(vads)
        dt = time.perf_counter() - t0
        outs = [(texts[f], vads[f]) for f in range(n)]
        n_timed = n  # all frames timed (compile paid in warmup)
    else:
        outs = []
        t0 = None
        for f in range(n):
            frame = audio[f * FRAME_SIZE:(f + 1) * FRAME_SIZE][None]
            out, state = pipe.step(mimi_params, lm_params, state, frame)
            if f == 0 or (f + 1) % win == 0 or f == n - 1:
                np.asarray(out["text"])                # D->H consume
            if f == 0:
                t0 = time.perf_counter()
            outs.append((out["text"], out["vad"]))
        if outs:
            np.asarray(outs[-1][0])
        dt = time.perf_counter() - t0 if t0 else 1.0
        n_timed = max(n - 1, 0)
    for f, (tok_dev, vad_dev) in enumerate(outs):
        token = int(np.asarray(tok_dev)[0])
        vad = float(np.asarray(vad_dev)[0])
        ts = max(f - stt_frame_delay, 0) / 12.5
        if token not in (pad_id, 0, -2) and token >= 0:
            piece = tok.id_to_piece(token) if tok else f"<{token}>"
            pieces.append(piece)
            if seg_start is None:
                seg_start = ts
            seg_tokens.append(piece)
        if vad > args.vad_threshold and seg_tokens:
            srt_segments.append((seg_start, ts, "".join(seg_tokens)
                                 .replace("▁", " ").strip()))
            seg_tokens, seg_start = [], None
    if seg_tokens:
        end = max(n - stt_frame_delay, 0) / 12.5
        srt_segments.append((seg_start, end, "".join(seg_tokens)
                             .replace("▁", " ").strip()))
    text = "".join(pieces).replace("▁", " ").strip()
    print(text)
    if args.srt:
        with open(args.srt, "w") as fh:
            for i, (a, b, line) in enumerate(srt_segments, 1):
                fh.write(f"{i}\n{_fmt_ts(a)} --> {_fmt_ts(b)}\n{line}\n\n")
        print(f"wrote {args.srt}: {len(srt_segments)} segments")
    fps = n_timed / dt
    print(f"bench: {fps:.2f} frames/s ({fps / 12.5:.2f}x realtime)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
