"""moshi-tts: text -> speech.

Parity with /root/reference/tools/moshi-tts.cpp: script -> word entries ->
StateMachine-paced LM generation -> mimi decode -> WAV (or .mimi);
``--bench`` runs the fixed benchmark text with seed 0 / greedy sampling
and reports frames/s + tokens/s (moshi-tts.cpp:242-251, 822-828).

Usage: python -m moshi_tpu.tools.moshi_tts -c config.json "Hello there"
       python -m moshi_tpu.tools.moshi_tts --synthetic --bench
"""

import argparse
import json
import time

import numpy as np

from moshi_tpu import FRAME_SIZE, SAMPLE_RATE
from moshi_tpu.config import parse_config
from moshi_tpu.models.state_machine import StateMachine, TokenIds, script_to_entries
from moshi_tpu.tools.common import (add_common_args, list_devices, load_lm,
                                    load_mimi, load_tokenizer)

# moshi-tts.cpp --bench uses a fixed paragraph; any fixed text works for
# comparable frames/s numbers
BENCH_TEXT = ("The quick brown fox jumps over the lazy dog. "
              "She sells sea shells by the sea shore.")


class _FakeTokenizer:
    def encode(self, word):
        return [10 + (ord(c) % 200) for c in word[:4]]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("text", nargs="*", default=None)
    ap.add_argument("-c", "--config", default=None)
    ap.add_argument("-i", "--input", default=None, help="script file")
    ap.add_argument("-o", "--output", default="tts.wav")
    ap.add_argument("--mimi-file", default=None)
    ap.add_argument("--voice", default=None,
                    help="voice file: .safetensors with voice.speaker_wavs "
                         "(cross-attention models) or a speaker wav "
                         "(prefix models)")
    ap.add_argument("--bench", action="store_true")
    ap.add_argument("--scan", action="store_true",
                    help="offline mode: generate in chunked multi-frame "
                         "lax.scans (device FSM; one launch + one "
                         "end_step poll per chunk)")
    ap.add_argument("--interactive", action="store_true",
                    help="feed-while-generating: a stdin reader thread "
                         "queues words into the live StateMachine as "
                         "lines arrive (moshi-tts.cpp:51-86); generation "
                         "ends after stdin EOF + final padding")
    ap.add_argument("--host-fsm", action="store_true",
                    help="per-frame host StateMachine (the reference's "
                         "on_text-hook structure, one D->H sync per "
                         "frame) instead of the fused device FSM")
    ap.add_argument("--max-frames", type=int, default=2000)
    ap.add_argument("--temp", type=float, default=0.6)
    ap.add_argument("--temp-text", type=float, default=0.6)
    add_common_args(ap)
    args = ap.parse_args(argv)
    if args.list_devices:
        list_devices()
        return 0

    if args.config:
        with open(args.config) as fh:
            config = parse_config(json.load(fh))
    else:
        config = parse_config({"model_type": "tts", "dim": 512,
                               "num_layers": 2, "num_heads": 8,
                               "context": 64, "n_q": 8, "dep_q": 8,
                               "card": 2048, "text_card": 4000,
                               "delays": [0] + [0] + [1] * 7,
                               "depformer_dim": 256,
                               "depformer_num_layers": 2,
                               "hidden_scale": 4.0})
    if args.mimi_file:
        config.mimi_name = args.mimi_file
    args.mimi_file = config.mimi_name
    args.tts = True
    if args.bench:
        args.temp = 0.0
        args.temp_text = 0.0
        args.seed = 0

    import jax.numpy as jnp
    lm_cfg, lm_params = load_lm(args, config)
    mimi, mimi_params = load_mimi(args, n_q=max(lm_cfg.dep_q, 1))
    tok = load_tokenizer(args, config) or _FakeTokenizer()

    if args.interactive:
        script = []                      # entries arrive from the thread
    elif args.text:
        script = [" ".join(args.text)]
    elif args.input:
        script = open(args.input).read().splitlines()
    elif args.bench:
        script = [BENCH_TEXT]
    else:
        import sys
        script = sys.stdin.read().splitlines()

    ids = TokenIds(card=lm_cfg.text_card + 1)
    entries = script_to_entries(tok, ids, 12.5, script, multi_speaker=False,
                                padding_between=1)

    from moshi_tpu.runtime.pipeline import TTSPipeline
    machine = StateMachine(
        text_card=lm_cfg.text_card + 1,
        second_stream_ahead=config.tts_config.second_stream_ahead
        if lm_cfg.demux_second_stream else 0,
        max_padding=8, initial_padding=2)          # moshi.cpp:852-853
    mstate = machine.new_state(entries)
    pipe = TTSPipeline(mimi, lm_cfg, temp=args.temp,
                       temp_text=args.temp_text,
                       mimi_dtype=jnp.float32 if args.synthetic
                       else jnp.bfloat16)
    import jax
    state = pipe.init_state(1, jax.random.PRNGKey(args.seed))

    # -- voice -----------------------------------------------------------
    condition_sum = cross_kv = None
    text_prefixes: list = []
    audio_prefixes: list = []
    if args.voice and lm_cfg.cross_attention:
        # cross-attention voice conditioning (moshi.cpp:296-366)
        from moshi_tpu.models.personaplex import load_voice_file
        from moshi_tpu.models.tts import voice_condition
        from moshi_tpu.nn.transformer import transformer_cross_kv
        from moshi_tpu.runtime.loader import _Source
        from moshi_tpu.models.tts import load_conditioners
        from moshi_tpu.tools.common import resolve_model_file
        _, _, wavs = load_voice_file(args.voice, lm_cfg)
        assert wavs is not None, f"{args.voice}: no voice.speaker_wavs"
        src = _Source(str(resolve_model_file(config.moshi_name,
                                             args.model_dir)))
        cond = load_conditioners(src)
        src.close()
        csum, ccross = voice_condition(cond, jnp.asarray(wavs))
        condition_sum = csum
        cross_kv = transformer_cross_kv(lm_cfg.transformer,
                                        lm_params["transformer"], ccross)
    elif args.voice:
        # voice prefix for non-cross models (tts.h:218-305)
        from moshi_tpu.models.tts import make_voice_prefix
        from moshi_tpu.runtime.session import MimiStreamer
        from moshi_tpu.tools.common import read_audio_24k
        streamer = MimiStreamer(mimi, mimi_params)
        audio = read_audio_24k(args.voice)
        text_prefixes, audio_prefixes = make_voice_prefix(
            lambda a: streamer.encode(a), audio, lm_cfg, lm_cfg.delay_steps)

    final_padding = 4
    from moshi_tpu.models.lm import UNGENERATED

    def _forced_audio(ap_q):
        if not ap_q:
            return None
        codes = ap_q.pop(0)
        fa = np.full((1, lm_cfg.runtime_dep_q), UNGENERATED, np.int32)
        fa[0, : len(codes)] = codes
        import jax.numpy as _jnp
        return _jnp.asarray(fa)

    def generate_host():
        """Reference-structure loop: sampled text token round-trips
        through the host FSM every frame (two launches + one D->H sync,
        moshi-tts.cpp / lm.h:881-899)."""
        state = pipe.init_state(1, jax.random.PRNGKey(args.seed))
        ms = machine.new_state(entries)
        tp = list(text_prefixes)
        ap_q = list(audio_prefixes)
        wav_parts = []
        t0 = None
        frames = offset = 0
        while frames < args.max_frames:
            replace = offset < lm_cfg.delay_steps
            forced_text = (int(tp.pop(0)) if tp else None)
            out, state = pipe.step(mimi_params, lm_params, state,
                                   machine=machine, machine_state=ms,
                                   offset=offset, forced_text=forced_text,
                                   forced_audio=_forced_audio(ap_q),
                                   condition_sum=condition_sum,
                                   cross_kv=cross_kv,
                                   depformer_replace=replace)
            offset += 1
            frames += 1
            if bool(np.asarray(out["valid"])[0]) and not replace:
                wav_parts.append(np.asarray(out["audio_out"])[0])
            if frames == 1:
                # compile boundary: frame 0 excluded from timing
                t0 = time.perf_counter()
            end = ms.end_step
            if end >= 0 and offset >= end + lm_cfg.delay_steps + \
                    final_padding:
                break
        dt = time.perf_counter() - t0 if t0 else 1.0
        return wav_parts, frames, max(frames - 1, 1) / dt

    def generate_device():
        """Fused path: StateMachine in-jit (ONE launch per frame;
        device_machine.py).  The host consumes end_step every frame —
        a 4-byte D->H fetch.  Per-frame sync is deliberate: it is both
        the honest methodology (work is provably consumed) and the
        fastest dispatch mode on this runtime (dispatch-ahead degrades
        super-linearly with queue depth; utils/honest.py).  Still 1
        launch + 1 fetch per frame vs the host-FSM path's 2 launches +
        1 fetch."""
        import jax.numpy as _jnp
        from moshi_tpu.models.device_machine import (compile_script,
                                                     init_device_state)
        dm = pipe.enable_device_fsm(machine)
        script_arr = compile_script([entries], dm)
        state = pipe.init_state(1, jax.random.PRNGKey(args.seed))
        mdev = init_device_state(dm, script_arr)
        tp = list(text_prefixes)
        ap_q = list(audio_prefixes)
        outs = []
        t0 = None
        f = 0
        end = -1
        win = max(1, args.window)
        while f < args.max_frames:
            replace = f < lm_cfg.delay_steps
            forced_text = (_jnp.asarray([tp.pop(0)], _jnp.int32)
                           if tp else None)
            out, state, mdev = pipe.step_device(
                mimi_params, lm_params, state, mdev, script_arr,
                forced_text=forced_text, forced_audio=_forced_audio(ap_q),
                condition_sum=condition_sum, cross_kv=cross_kv,
                depformer_replace=replace)
            outs.append(out)
            if f == 0 or (f + 1) % win == 0:
                # end_step consume: every frame at --window 1, every N
                # frames otherwise (bounded dispatch + amortized RPC)
                end = int(np.asarray(out["end_step"])[0])
            f += 1
            if f == 1:
                t0 = time.perf_counter()   # frame 0 = compile, excluded
            if end >= 0 and f >= min(args.max_frames,
                                     end + lm_cfg.delay_steps +
                                     final_padding):
                break
        end = int(np.asarray(outs[-1]["end_step"])[0])
        frames = (min(f, end + lm_cfg.delay_steps + final_padding)
                  if end >= 0 else f)
        outs = outs[:frames]
        np.asarray(outs[-1]["end_step"])
        dt = time.perf_counter() - t0 if t0 else 1.0
        wav_parts = [np.asarray(o["audio_out"])[0]
                     for i, o in enumerate(outs)
                     if i >= lm_cfg.delay_steps
                     and bool(np.asarray(o["valid"])[0])]
        return wav_parts, frames, max(frames - 1, 1) / dt

    def generate_interactive():
        """moshi-tts.cpp:51-86 analog: a reader thread tokenizes stdin
        lines into Entries and appends them to the LIVE machine state
        while the frame loop runs (host-FSM path — the word queue must
        be host-mutable).  New words clear end_step, reviving a stream
        that ran dry; generation stops after EOF once the machine drains
        plus final padding."""
        import sys
        import threading
        ms = machine.new_state([])
        eof = threading.Event()

        def reader():
            for line in sys.stdin:
                line = line.strip()
                if not line:
                    continue
                for e in script_to_entries(tok, ids, 12.5, [line],
                                           multi_speaker=False,
                                           padding_between=1):
                    ms.entries.append(e)
                ms.end_step = -1          # new words revive the stream
            eof.set()

        threading.Thread(target=reader, daemon=True).start()
        state = pipe.init_state(1, jax.random.PRNGKey(args.seed))
        tp = list(text_prefixes)
        ap_q = list(audio_prefixes)
        wav_parts = []
        t0 = None
        frames = offset = 0
        while frames < args.max_frames:
            replace = offset < lm_cfg.delay_steps
            forced_text = (int(tp.pop(0)) if tp else None)
            out, state = pipe.step(mimi_params, lm_params, state,
                                   machine=machine, machine_state=ms,
                                   offset=offset, forced_text=forced_text,
                                   forced_audio=_forced_audio(ap_q),
                                   condition_sum=condition_sum,
                                   cross_kv=cross_kv,
                                   depformer_replace=replace)
            offset += 1
            frames += 1
            if bool(np.asarray(out["valid"])[0]) and not replace:
                wav_parts.append(np.asarray(out["audio_out"])[0])
            if frames == 1:
                t0 = time.perf_counter()
            end = ms.end_step
            if eof.is_set() and end >= 0 and ms.is_empty() and \
                    offset >= end + lm_cfg.delay_steps + final_padding:
                break
        dt = time.perf_counter() - t0 if t0 else 1.0
        return wav_parts, frames, max(frames - 1, 1) / dt

    def generate_scan():
        """Offline generation: device FSM + chunked multi-frame
        lax.scans (pipeline.TTSPipeline.scan_device) — one launch per
        chunk; the host only polls end_step once per chunk.  Voice
        prefixes / depformer-replace lead-in run per-frame first."""
        import jax.numpy as _jnp
        from moshi_tpu.models.device_machine import (compile_script,
                                                     init_device_state)
        dm = pipe.enable_device_fsm(machine)
        script_arr = compile_script([entries], dm)

        # warm every chunk program on a throwaway state (compile
        # excluded from timing, like frame 0 in the per-frame paths)
        wstate = pipe.init_state(1, jax.random.PRNGKey(args.seed))
        wm = init_device_state(dm, script_arr)
        for c in sorted(set(pipe.SCAN_CHUNKS)):
            _, _, e, wstate, wm = pipe.scan_device(
                mimi_params, lm_params, wstate, wm, script_arr, c,
                condition_sum, cross_kv)
            np.asarray(e)
        out0, wstate, wm = pipe.step_device(
            mimi_params, lm_params, wstate, wm, script_arr,
            depformer_replace=True)
        np.asarray(out0["end_step"])
        del wstate, wm

        state = pipe.init_state(1, jax.random.PRNGKey(args.seed))
        mdev = init_device_state(dm, script_arr)
        tp = list(text_prefixes)
        ap_q = list(audio_prefixes)
        t0 = time.perf_counter()
        head = []
        f = 0
        # per-frame lead-in: depformer-replace window + forced prefixes
        while f < lm_cfg.delay_steps or tp or ap_q:
            forced_text = (_jnp.asarray([tp.pop(0)], _jnp.int32)
                           if tp else None)
            out, state, mdev = pipe.step_device(
                mimi_params, lm_params, state, mdev, script_arr,
                forced_text=forced_text, forced_audio=_forced_audio(ap_q),
                condition_sum=condition_sum, cross_kv=cross_kv,
                depformer_replace=f < lm_cfg.delay_steps)
            head.append(out)
            f += 1
        chunks = []
        end = -1
        while end < 0 and f < args.max_frames:
            c = min(64, args.max_frames - f)
            audio_c, valid_c, end_c, state, mdev = pipe.scan_device(
                mimi_params, lm_params, state, mdev, script_arr, c,
                condition_sum, cross_kv)
            end = int(np.asarray(end_c[-1])[0])   # 1 RPC per chunk
            chunks.append((audio_c, valid_c, end_c))
            f += c
        if end >= 0:
            # the delay/padding window AFTER the end token still carries
            # audio (the per-frame paths generate through it); top up to
            # `total` when the end landed near the last chunk's tail
            tail_total = min(args.max_frames,
                             end + lm_cfg.delay_steps + final_padding)
            while f < tail_total:
                c = min(64, tail_total - f)
                audio_c, valid_c, end_c, state, mdev = pipe.scan_device(
                    mimi_params, lm_params, state, mdev, script_arr, c,
                    condition_sum, cross_kv)
                np.asarray(end_c[-1])             # consume the chunk
                chunks.append((audio_c, valid_c, end_c))
                f += c
        dt = time.perf_counter() - t0
        # assemble: head frames (invalid/replace) then scan chunks
        audio = np.concatenate([np.asarray(a) for a, _, _ in chunks])
        valid = np.concatenate([np.asarray(v) for _, v, _ in chunks])
        ends = np.concatenate([np.asarray(e) for _, _, e in chunks])
        end_first = next((i for i in range(len(ends))
                          if ends[i][0] >= 0), len(ends))
        end_step = int(ends[end_first][0]) if end_first < len(ends) \
            else -1
        total = (min(args.max_frames, end_step + lm_cfg.delay_steps +
                     final_padding) if end_step >= 0 else f)
        # the end token can land near the tail of the last chunk, with
        # total (end + delay + final padding) extending past the frames
        # actually generated — clamp to what exists
        keep = min(max(0, total - len(head)), len(audio))
        wav_parts = [audio[i][0] for i in range(keep) if valid[i][0]]
        frames = min(f, total)
        return wav_parts, frames, max(frames - 1, 1) / dt

    generate = (generate_interactive if args.interactive
                else generate_scan if args.scan
                else generate_host if args.host_fsm else generate_device)
    if args.bench:
        generate()          # warm both depformer_replace variants
    t0 = time.perf_counter()
    wav_parts, frames, fps = generate()
    dt = time.perf_counter() - t0
    text_tokens = frames
    wav = np.concatenate(wav_parts) if wav_parts else np.zeros(FRAME_SIZE)
    from moshi_tpu.io.media import save_audio as save_wav
    save_wav(args.output, wav, SAMPLE_RATE)
    print(f"wrote {args.output}: {len(wav) / SAMPLE_RATE:.2f}s audio, "
          f"{frames} frames in {dt:.2f}s")
    print(f"bench: {fps:.2f} frames/s ({fps / 12.5:.2f}x realtime), "
          f"{text_tokens / dt:.1f} tokens/s, seed {args.seed}")
    if args.bench:
        print(json.dumps({"metric": "tts_frames_per_sec", "value":
                          round(fps, 2), "unit": "frames/s"}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
