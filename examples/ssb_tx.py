"""SSB transmitter — phasing method (parity: examples/ssb/transmit.rs).

audio → band-limit FIR (I) ∥ Hilbert FIR (Q) → I ± jQ (USB/LSB) →
rational resampler audio_rate → file_rate → NCO mix to the channel →
complex64 IQ file.

Run:  python examples/ssb_tx.py out.cf32 [--mode usb] [--tone 700]
"""

from __future__ import annotations

import argparse
import sys
from math import gcd
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from futuresdr_tpu import Flowgraph, Runtime  # noqa: E402
from futuresdr_tpu.blocks import (  # noqa: E402
    Combine,
    FileSink,
    Fir,
    FreqShift,
    Head,
    SignalSource,
    StreamDuplicator,
)
from futuresdr_tpu.dsp import firdes, windows  # noqa: E402
from futuresdr_tpu.ops.cplx import CArray  # noqa: E402


def build_ssb_tx(
    audio_source,
    audio_rate: int = 32_000,
    file_rate: int = 256_000,
    frequency: float = 51_500.0 + 1500.0,
    mode: str = "usb",
    level: float = 1.0,
):
    """Wire the transmit.rs chain around a float32 audio source block.

    Returns ``(fg, tail)`` — terminate ``tail`` with an IQ sink."""
    fg = Flowgraph()
    ntaps = 129
    win = windows.hamming(ntaps)
    lp_taps = firdes.lowpass(3000.0 / audio_rate, win)
    hilb = firdes.hilbert(windows.hamming(ntaps))
    dup = StreamDuplicator(2, np.float32)
    fir_i = Fir(lp_taps.astype(np.float32), dtype=np.float32)
    fir_q = Fir(hilb.astype(np.float32), dtype=np.float32)
    sign = 1.0 if mode == "usb" else -1.0
    mk = Combine(
        lambda i, q: CArray(i * level, q * (sign * level)),
        np.float32,
        np.float32,
        np.complex64,
        name="MakeAnalytic",
    )
    g = gcd(file_rate, audio_rate)
    resamp = Fir.resampling(file_rate // g, audio_rate // g)
    mix = FreqShift(frequency, file_rate)
    fg.stream(audio_source, dup)
    fg.stream(dup, fir_i, src_port=0)
    fg.stream(dup, fir_q, src_port=1)
    fg.stream(fir_i, mk, dst_port=0)
    fg.stream(fir_q, mk, dst_port=1)
    fg.stream(mk, resamp)
    fg.stream(resamp, mix)
    return fg, mix


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--mode", choices=["usb", "lsb"], default="usb")
    ap.add_argument("--tone", type=float, default=700.0)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--audio-rate", type=int, default=32_000)
    ap.add_argument("--file-rate", type=int, default=256_000)
    args = ap.parse_args()

    src = SignalSource(args.tone, float(args.audio_rate), kind="sin")
    fg, tail = build_ssb_tx(
        src, args.audio_rate, args.file_rate, mode=args.mode
    )
    head = Head(int(args.seconds * args.file_rate), np.complex64)
    snk = FileSink(args.out, np.complex64)
    fg.stream(tail, head)
    fg.stream(head, snk)
    Runtime(chunk_size=1 << 16).run(fg)
    print(f"wrote {snk.n_written} IQ samples to {args.out}")


if __name__ == "__main__":
    main()
