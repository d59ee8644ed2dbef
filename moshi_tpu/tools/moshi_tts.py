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
    ap.add_argument("--bench", action="store_true")
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

    if args.text:
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

    wav_parts = []
    text_tokens = 0
    final_padding = 4
    t0 = time.perf_counter()
    frames = 0
    offset = 0
    while frames < args.max_frames:
        replace = offset < lm_cfg.delay_steps
        out, state = pipe.step(mimi_params, lm_params, state,
                               machine=machine, machine_state=mstate,
                               offset=offset, depformer_replace=replace)
        offset += 1
        frames += 1
        if bool(np.asarray(out["valid"])[0]) and not replace:
            wav_parts.append(np.asarray(out["audio_out"])[0])
        text_tokens += 1
        end = mstate.end_step
        if end >= 0 and offset >= end + lm_cfg.delay_steps + final_padding:
            break
    dt = time.perf_counter() - t0
    wav = np.concatenate(wav_parts) if wav_parts else np.zeros(FRAME_SIZE)
    from moshi_tpu.io.wav import save_wav
    save_wav(args.output, wav, SAMPLE_RATE)
    fps = frames / dt
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
