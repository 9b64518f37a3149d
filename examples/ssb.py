"""SSB receiver — Weaver product detector with polyphase resampling.

Parity: ``examples/ssb/receive.rs:32-96`` (GNU Radio SSB transceiver
tutorial lineage): FileSource (complex IQ, repeating) → freq-translating
NCO multiply (×0.0001 level adjust) → rational resampler file_rate →
audio_rate → Weaver decode (mid-spectrum 1500 Hz oscillator) → audio sink.

Run:  python examples/ssb.py capture.dat out.wav [--file-rate 256000]
(With no capture file a synthetic USB voice-band tone is used.)
"""

from __future__ import annotations

import argparse
import sys
from math import gcd
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from futuresdr_tpu import Flowgraph, Runtime, connect  # noqa: E402
from futuresdr_tpu.blocks import (  # noqa: E402
    FileSource,
    Fir,
    Head,
    VectorSource,
    WavSink,
)
from futuresdr_tpu.blocks.dsp import FreqShift, WeaverDecode  # noqa: E402

FILE_LEVEL_ADJUSTMENT = 0.0001
MID_AUDIO_SPECTRUM_FREQ = 1500.0


def build_ssb_receiver(
    source,
    file_rate: int,
    audio_rate: int = 32_000,
    center_freq: float = 51_500.0,
    usb: bool = True,
    level: float = FILE_LEVEL_ADJUSTMENT,
):
    """Wire the receive.rs chain; returns ``(fg, tail)`` (f32 audio)."""
    fg = Flowgraph()
    xlate = FreqShift(-center_freq, file_rate, scale=level)
    g = gcd(audio_rate, file_rate)
    resamp = Fir.resampling(audio_rate // g, file_rate // g)
    weaver = WeaverDecode(MID_AUDIO_SPECTRUM_FREQ, audio_rate, usb=usb)
    connect(fg, source, xlate, resamp, weaver)
    return fg, weaver


def synthesize_usb_tone(
    file_rate: int,
    seconds: float,
    audio_freq: float = 700.0,
    center_freq: float = 51_500.0,
    amplitude: float = 10_000.0,
) -> np.ndarray:
    """A single-tone SSB transmission for the Weaver receiver.

    ``center_freq`` sits mid-channel; a component at offset f′ demodulates
    (with the reference's ``+`` recombination, receive.rs:80-83) to audio
    ``1500 − f′`` — the spectrally-inverted (LSB-style) mapping, matching
    the reference's default LSB capture. So an audio tone ``fa`` lives at
    ``center + 1500 − fa``."""
    n = int(file_rate * seconds)
    t = np.arange(n) / file_rate
    f_abs = center_freq + MID_AUDIO_SPECTRUM_FREQ - audio_freq
    return (amplitude * np.exp(2j * np.pi * f_abs * t)).astype(np.complex64)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("capture", nargs="?", default=None)
    ap.add_argument("out", nargs="?", default="ssb_out.wav")
    ap.add_argument("--file-rate", type=int, default=256_000)
    ap.add_argument("--audio-rate", type=int, default=32_000)
    ap.add_argument("--center-freq", type=float, default=51_500.0)
    ap.add_argument("--seconds", type=float, default=5.0)
    args = ap.parse_args()

    if args.capture:
        src = FileSource(args.capture, np.complex64, repeat=True)
        level = FILE_LEVEL_ADJUSTMENT
    else:
        iq = synthesize_usb_tone(args.file_rate, args.seconds)
        src = VectorSource(iq)
        level = FILE_LEVEL_ADJUSTMENT
    fg, tail = build_ssb_receiver(
        src,
        args.file_rate,
        args.audio_rate,
        args.center_freq,
        level=level,
    )
    if args.capture:
        head = Head(int(args.seconds * args.audio_rate), np.float32)
        fg.stream(tail, head)
        tail = head
    fg.stream(tail, WavSink(args.out, args.audio_rate))
    Runtime(chunk_size=1 << 17).run(fg)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
