"""Play a 440 Hz tone through the audio sink (parity:
examples/audio/play_tone.rs — SignalSource sin → AudioSink).

With no audio hardware in the environment the sink streams to a WAV file
(the honest equivalent of the reference's optional cpal feature); on a
host with ``sounddevice`` it plays live.

Run:  python examples/play_tone.py [out.wav] [--seconds 2]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from futuresdr_tpu import Flowgraph, Runtime  # noqa: E402
from futuresdr_tpu.blocks import Head, SignalSource  # noqa: E402
from futuresdr_tpu.blocks.audio import AudioSink  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out", nargs="?", default="tone.wav")
    ap.add_argument("--seconds", type=float, default=2.0)
    args = ap.parse_args()

    rate = 48_000
    fg = Flowgraph()
    # play_tone.rs:8 — sin(440 Hz, 48 kS/s, amplitude 0.3)
    src = SignalSource(freq=440.0, sample_rate=rate, amplitude=0.3, kind="sin")
    head = Head(int(args.seconds * rate), dtype=np.float32)
    snk = AudioSink(rate, 1, fallback_path=args.out)
    fg.stream(src, head)
    fg.stream(head, snk)
    Runtime(chunk_size=8192).run(fg)
    print(f"{args.seconds:.1f}s of 440 Hz -> {args.out}")


if __name__ == "__main__":
    main()
