"""mimi-encode: audio file -> .mimi RVQ token file.

Parity with /root/reference/tools/mimi-encode.cpp (media -> 24 kHz mono
-> streaming mimi encode -> MIMI magic + n_q + int16 frames).  Input here
is WAV (any rate, resampled); the byte format of the output matches the
reference exactly, so .mimi files interchange between the two stacks.

Usage: python -m moshi_tpu.tools.mimi_encode -i in.wav -o out.mimi
       [-n N_Q] [-m mimi.safetensors] [--synthetic]
"""

import argparse

import numpy as np

from moshi_tpu import FRAME_SIZE
from moshi_tpu.io.mimi_file import write_mimi_file
from moshi_tpu.runtime.session import MimiStreamer
from moshi_tpu.tools.common import (add_common_args, list_devices, load_mimi,
                                    read_audio_24k)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-i", "--input", required=False)
    ap.add_argument("-o", "--output", default="out.mimi")
    ap.add_argument("-n", "--n-q", type=int, default=32)
    ap.add_argument("-m", "--mimi-file",
                    default="tokenizer-e351c8d8-checkpoint125.safetensors")
    ap.add_argument("--chunk-frames", type=int, default=25,
                    help="frames per device call (2s default)")
    add_common_args(ap)
    args = ap.parse_args(argv)
    if args.list_devices:
        list_devices()
        return 0
    model, params = load_mimi(args, n_q=args.n_q)
    streamer = MimiStreamer(model, params)
    audio = read_audio_24k(args.input)
    frame = FRAME_SIZE * args.chunk_frames
    n = (len(audio) + FRAME_SIZE - 1) // FRAME_SIZE
    audio = np.pad(audio, (0, n * FRAME_SIZE - len(audio)))
    out = []
    for i in range(0, len(audio), frame):
        chunk = audio[i:i + frame]
        if len(chunk) % FRAME_SIZE:
            chunk = np.pad(chunk, (0, FRAME_SIZE - len(chunk) % FRAME_SIZE))
        codes = streamer.encode(chunk[None])
        out.append(codes[0])
    codes = np.concatenate(out, axis=0)
    write_mimi_file(args.output, codes)
    print(f"wrote {args.output}: {codes.shape[0]} frames x {codes.shape[1]} "
          f"codebooks ({codes.shape[0] / 12.5:.2f}s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
