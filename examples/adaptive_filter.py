"""Live FIR retune — swap a channel-select filter on a RUNNING graph.

Two tones (20 kHz wanted + 200 kHz interferer at 1 MS/s) feed a
``Fir(retunable=True)``. The graph starts with a lowpass keeping the
20 kHz tone; mid-stream a ``taps`` message swaps in a highpass — no
recompile, exact history continuity — and the passband flips.

Run:  python examples/adaptive_filter.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from futuresdr_tpu import Flowgraph, Runtime  # noqa: E402
from futuresdr_tpu.blocks import (  # noqa: E402
    Combine,
    Fir,
    SignalSource,
    VectorSink,
)
from futuresdr_tpu.dsp import firdes, windows  # noqa: E402
from futuresdr_tpu.types.pmt import Pmt  # noqa: E402

FS = 1e6


def tone_power(seg: np.ndarray, freq: float) -> float:
    t = np.arange(len(seg)) / FS
    return float(
        np.hypot(
            2 * np.mean(seg * np.sin(2 * np.pi * freq * t)),
            2 * np.mean(seg * np.cos(2 * np.pi * freq * t)),
        )
    )


def main() -> None:
    lowpass = firdes.lowpass(0.08, windows.hamming(101))
    highpass = firdes.highpass(0.12, windows.hamming(101))

    fg = Flowgraph()
    fir = Fir(lowpass, dtype=np.float32, retunable=True)
    snk = VectorSink(np.float32)
    wanted = SignalSource(20e3, FS, kind="sin")
    interferer = SignalSource(200e3, FS, kind="sin")
    mix = Combine(lambda a, b: a + 0.8 * b, np.float32, np.float32, np.float32)
    for b in (wanted, interferer, mix, fir, snk):
        fg.add(b)
    fg.stream(wanted, mix, 0, 0)
    fg.stream(interferer, mix, 0, 1)
    fg.stream(mix, fir)
    fg.stream(fir, snk)

    handle = Runtime(chunk_size=32768).start(fg)
    # first compile through a tunneled backend can take tens of seconds:
    # wait for real pre-retune output, not wall-clock
    deadline = time.monotonic() + 120.0
    while len(snk.data()) < 500_000:
        if time.monotonic() > deadline:
            raise SystemExit("no output within 120 s")
        time.sleep(0.25)
    n_before = len(snk.data())
    # the retune lands between compiled steps; the filter history carries
    handle.post(fir, "taps", Pmt.from_py([float(v) for v in highpass]))
    time.sleep(3.0)
    handle.stop()
    handle.wait()

    y = np.asarray(snk.data())
    if len(y) - n_before < 100_000:
        raise SystemExit(
            f"only {len(y) - n_before} post-retune samples — backend too "
            "slow to judge the flip; re-run"
        )
    before = y[2048 : n_before - 2048]
    after = y[-(len(y) - n_before) // 2 :]
    print(
        f"lowpass : 20 kHz {tone_power(before, 20e3):.3f}   "
        f"200 kHz {tone_power(before, 200e3):.4f}"
    )
    print(
        f"highpass: 20 kHz {tone_power(after, 20e3):.4f}   "
        f"200 kHz {tone_power(after, 200e3):.3f}"
    )
    ok = (
        tone_power(before, 20e3) > 0.8
        and tone_power(before, 200e3) < 0.05
        and tone_power(after, 200e3) > 0.6
        and tone_power(after, 20e3) < 0.05
    )
    print("passband flipped live — OK" if ok else "FAILED")
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
