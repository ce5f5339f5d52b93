"""End-to-end analysis / modification / resynthesis demo.

Mirrors the reference's example/prosody.py:1-58: read a wav, encode with
harvest (requiem analysis), optionally modify prosody, decode, write the
resynthesized wav next to the input.

Usage: python examples/prosody.py [input.wav] [--pitch 1.5] [--duration 2.0]
"""
import argparse
from pathlib import Path

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("wav", nargs="?",
                    default="/root/reference/test/test-mwm.wav")
    ap.add_argument("--pitch", type=float, default=None,
                    help="global pitch scale factor")
    ap.add_argument("--duration", type=float, default=None,
                    help="global duration scale factor")
    ap.add_argument("--warp", type=float, nargs=4, default=None,
                    metavar=("FROM1", "FROM2", "TO1", "TO2"),
                    help="piecewise time warp: map times FROM1,FROM2 (s) to "
                         "TO1,TO2 (s); pass TO2=-1 to pin FROM2 to itself "
                         "and preserve the total duration "
                         "(the reference demo's disabled modify_duration "
                         "branch, example/prosody.py:39-44)")
    ap.add_argument("--f0-method", default="harvest",
                    choices=["dio", "harvest", "swipe"])
    ap.add_argument("--classic", action="store_true",
                    help="use classic (non-requiem) analysis/synthesis")
    args = ap.parse_args()

    from world_tpu import World
    from world_tpu.io.wav import read_wav, write_wav

    fs, x = read_wav(args.wav)
    vocoder = World()

    dat = vocoder.encode(fs, x, f0_method=args.f0_method,
                         is_requiem=not args.classic)
    if args.pitch:
        dat = vocoder.scale_pitch(dat, args.pitch)
    if args.duration:
        dat = vocoder.scale_duration(dat, args.duration)
    if args.warp:
        f1, f2, t1, t2 = args.warp
        vocoder.modify_duration(dat, [f1, f2], [t1, t2])

    dat = vocoder.decode(dat)
    out_path = Path(args.wav).with_name(Path(args.wav).stem + "-resynth.wav")
    out_path = Path.cwd() / out_path.name  # never write next to read-only input
    write_wav(out_path, fs, dat["out"])
    print(f"wrote {out_path} ({len(dat['out'])/fs:.2f}s, "
          f"peak {np.abs(dat['out']).max():.3f})")


if __name__ == "__main__":
    main()
