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
        _, _, wavs = load_voice_file(args.voice)
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

    wav_parts = []
    text_tokens = 0
    final_padding = 4
    t0 = time.perf_counter()
    frames = 0
    offset = 0
    from moshi_tpu.models.lm import UNGENERATED
    while frames < args.max_frames:
        replace = offset < lm_cfg.delay_steps
        forced_text = (int(text_prefixes.pop(0)) if text_prefixes else None)
        forced_audio = None
        if audio_prefixes:
            codes = audio_prefixes.pop(0)
            fa = np.full((1, lm_cfg.runtime_dep_q), UNGENERATED, np.int32)
            fa[0, : len(codes)] = codes
            import jax.numpy as _jnp
            forced_audio = _jnp.asarray(fa)
        out, state = pipe.step(mimi_params, lm_params, state,
                               machine=machine, machine_state=mstate,
                               offset=offset, forced_text=forced_text,
                               forced_audio=forced_audio,
                               condition_sum=condition_sum,
                               cross_kv=cross_kv,
                               depformer_replace=replace)
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
    from moshi_tpu.io.media import save_audio as save_wav
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
