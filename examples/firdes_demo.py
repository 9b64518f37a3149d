"""Filter-design demo (parity: ``examples/firdes/src/main.rs``).

A three-tone source (2/6/10 kHz stepped over time at 66.15 kS/s) is
rational-resampled 2:3 down to 44.1 kS/s and low-passed with a Kaiser
design that keeps only the 2 kHz tone; audio lands in a WAV file and the
measured per-tone suppression is printed.

Run:  python examples/firdes_demo.py [out.wav]
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from futuresdr_tpu import Flowgraph, Runtime, connect  # noqa: E402
from futuresdr_tpu.blocks import Apply, Fir, VectorSink, VectorSource, WavSink  # noqa: E402
from futuresdr_tpu.dsp import firdes  # noqa: E402

FS = 66_150
TONES = (2000.0, 6000.0, 10000.0)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/firdes_demo.wav"
    n = 3 * FS  # 3 s, one second per tone
    t = np.arange(n, dtype=np.float64)
    freq = np.where(
        t < FS, TONES[0], np.where(t < 2 * FS, TONES[1], TONES[2])
    )
    sig = np.sin(2 * np.pi * np.cumsum(freq) / FS).astype(np.float32)

    # 2:3 rational resample to 44.1 kS/s, then Kaiser lowpass at 3 kHz
    taps = firdes.kaiser_lowpass(
        3000.0 / 44_100, 1000.0 / 44_100, 0.01
    ).astype(np.float32)

    fg = Flowgraph()
    src = VectorSource(sig)
    resamp = Fir.resampling(2, 3, dtype=np.float32)
    lp = Fir(taps, dtype=np.float32)
    # 0.8 headroom: the filter warmup transient would otherwise clip
    # the int16 WAV briefly
    att = Apply(lambda v: v * 0.8, in_dtype=np.float32)
    wav = WavSink(out_path, sample_rate=44_100)
    snk = VectorSink()
    connect(fg, src, resamp, lp, snk)
    fg.stream(lp, att)
    fg.stream(att, wav)
    Runtime().run(fg)

    y = snk.data()
    print(f"{len(y)} samples at 44.1 kS/s -> {out_path}")
    # per-second tone power (each input second holds one tone)
    sec = 44_100
    for i, f0 in enumerate(TONES):
        seg = y[i * sec + 4000 : (i + 1) * sec - 1000]
        tt = np.arange(len(seg)) / 44_100
        amp = 2 * np.hypot(
            np.mean(seg * np.sin(2 * np.pi * f0 * tt)),
            np.mean(seg * np.cos(2 * np.pi * f0 * tt)),
        )
        print(f"  {f0/1000:.0f} kHz tone: {20*np.log10(max(amp, 1e-9)):+6.1f} dBFS")


if __name__ == "__main__":
    main()
