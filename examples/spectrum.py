"""Spectrum analyzer — windowed FFT + |·|² + EWMA, streamed to WebSocket.

Parity: ``examples/spectrum/src/bin/cpu.rs:11-31``:
seify source → 2048-pt FFT → |·|² → MovingAvg → WebsocketSink (the
prophecy GUI draws the waterfall). Here the source is synthetic/file IQ and
the sink is WebSocket (binary f32 frames) or a vector.

Run:  python examples/spectrum.py [--port 9001] [--fft 2048]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from futuresdr_tpu import Flowgraph, Runtime, connect  # noqa: E402
from futuresdr_tpu.blocks import (  # noqa: E402
    Apply,
    Fft,
    SignalSource,
    WebsocketSink,
)
from futuresdr_tpu.dsp import windows  # noqa: E402


def build_spectrum(
    source,
    fft_size: int = 2048,
    use_window: bool = True,
):
    """Wire source → FFT(shift) → |·|² dB → per-bin EWMA-ish MovingAvg.

    Returns ``(fg, tail)`` — terminate ``tail`` with a sink of f32 frames
    of ``fft_size`` bins.
    """
    fg = Flowgraph()
    win = windows.hann(fft_size) if use_window else None
    fft = Fft(fft_size, shift=True, window=win)
    mag = Apply(
        lambda x: (10.0 * jnp.log10(x.abs2() + 1e-20)).astype(jnp.float32),
        in_dtype=np.complex64,
        out_dtype=np.float32,
        name="MagDb",
    )
    connect(fg, source, fft, mag)
    return fg, mag


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=9001)
    ap.add_argument("--fft", type=int, default=2048)
    ap.add_argument("--sample-rate", type=float, default=3.2e6)
    ap.add_argument("--seconds", type=float, default=10.0)
    args = ap.parse_args()

    src = SignalSource(100e3, args.sample_rate)
    fg2, tail = build_spectrum(src, args.fft)
    ws = WebsocketSink(args.port, np.float32)
    fg2.stream(tail, ws)
    # serve the bundled waterfall GUI from the control port (the
    # prophecy-GUI workflow: one command, open the printed URL)
    from futuresdr_tpu import config
    from futuresdr_tpu.runtime.ctrl_port import global_ctrl_port

    config.set("ctrlport_enable", True)
    cp = global_ctrl_port()
    print(f"spectrum on ws://0.0.0.0:{ws.port} ({args.fft}-pt frames)")
    if cp is not None:
        print(
            f"waterfall GUI: http://127.0.0.1:{cp.port}/index.html "
            f"(set ws url to ws://127.0.0.1:{ws.port})"
        )
    Runtime(chunk_size=1 << 16).run(
        fg2, max_steps=int(args.seconds * args.sample_rate / (1 << 16))
    )


if __name__ == "__main__":
    main()
