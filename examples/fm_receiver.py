"""FM broadcast receiver — the reference's flagship example, TPU-native.

Parity: ``examples/fm-receiver/src/main.rs:84-130``:
seify hardware source → ``Apply`` freq-shift → polyphase resampler →
quadrature demod → Kaiser low-pass resampler → AudioSink, retunable via
``handle.call(src, "freq", …)`` while running.

Here the hardware source is an IQ file / vector (the dummy-driver pattern,
SURVEY.md §4) and the audio sink a WAV file; every arrow in between is the
same math, fused into one XLA program per chunk.

Run:  python examples/fm_receiver.py out.wav
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from futuresdr_tpu import Flowgraph, Runtime, connect  # noqa: E402
from futuresdr_tpu.blocks import (  # noqa: E402
    Fir,
    QuadratureDemod,
    VectorSink,
    VectorSource,
    WavSink,
    XlatingFir,
)
from futuresdr_tpu.dsp import firdes  # noqa: E402


def synthesize_fm(
    sample_rate: float,
    duration: float,
    audio_freq: float = 1000.0,
    deviation: float = 75e3,
    offset: float = 100e3,
    amplitude: float = 1.0,
    seed: int | None = None,
    snr_db: float | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Generate an FM-modulated IQ capture centered ``offset`` Hz off-tune.

    Returns ``(iq complex64, audio float32)`` — the audio is the exact
    message waveform a perfect receiver would output.
    """
    n = int(round(sample_rate * duration))
    t = np.arange(n) / sample_rate
    audio = np.sin(2.0 * np.pi * audio_freq * t)
    phase = (
        2.0 * np.pi * deviation * np.cumsum(audio) / sample_rate
        + 2.0 * np.pi * offset * t
    )
    iq = amplitude * np.exp(1j * phase)
    if snr_db is not None:
        rng = np.random.default_rng(seed or 0)
        npow = amplitude**2 / (10.0 ** (snr_db / 10.0))
        iq = iq + np.sqrt(npow / 2.0) * (
            rng.standard_normal(n) + 1j * rng.standard_normal(n)
        )
    return iq.astype(np.complex64), audio.astype(np.float32)


def build_fm_receiver(
    source,
    sample_rate: float,
    offset: float,
    deviation: float = 75e3,
    quad_rate: float = 250e3,
    audio_rate: float = 50e3,
):
    """Wire the reference chain (main.rs:84-130) around any IQ source block.

    Returns ``(fg, audio_out)`` where ``audio_out`` is an open output the
    caller terminates with a sink.
    """
    fg = Flowgraph()
    decim1 = int(round(sample_rate / quad_rate))
    if abs(sample_rate / decim1 - quad_rate) > 1e-6:
        raise ValueError("sample_rate must be an integer multiple of quad_rate")
    # channel low-pass + down-mix + decimate in one block
    chan_taps = firdes.kaiser_lowpass(
        cutoff=(deviation + 25e3) / sample_rate,
        transition_bw=50e3 / sample_rate,
        max_ripple=1e-4,
    )
    xlate = XlatingFir(chan_taps, decim1, offset, sample_rate)
    demod = QuadratureDemod(gain=float(quad_rate / (2.0 * np.pi * deviation)))
    # audio resampler quad_rate → audio_rate
    from math import gcd

    g = gcd(int(quad_rate), int(audio_rate))
    interp, decim2 = int(audio_rate) // g, int(quad_rate) // g
    # auto Kaiser multirate prototype (parity: fir.rs:154)
    resamp = Fir.resampling(interp, decim2, dtype=np.float32)
    connect(fg, source, xlate)
    fg.stream(xlate, demod)
    fg.stream(demod, resamp)
    return fg, resamp


def main(out_path: str = "fm_out.wav", profile: str = "") -> None:
    sample_rate = 1_000_000.0
    offset = 100e3
    audio_rate = 50e3
    want_profile = profile == "--profile" or out_path == "--profile"
    if out_path == "--profile":
        out_path = "fm_out.wav"
    duration = 20.0 if want_profile else 2.0  # profiling needs a window
    iq, _ = synthesize_fm(sample_rate, duration=duration, offset=offset)
    src = VectorSource(iq, repeat=want_profile)
    fg, tail = build_fm_receiver(src, sample_rate, offset, audio_rate=audio_rate)
    wav = WavSink(out_path, int(audio_rate))
    fg.stream(tail, wav)
    rt = Runtime(chunk_size=1 << 18)
    if not want_profile:
        rt.run(fg)
        print(f"wrote {out_path}")
        return
    # --profile: per-block device-cost attribution from a live trace
    # (the reference's LTTng sample-path tracing, TPU-native: named
    # scopes in the fused step + one jax.profiler capture)
    import time as _time

    handle = rt.start(fg)
    # wait for steady state: compile through shared TPU frontends can
    # take tens of seconds, and tracing mid-compile captures nothing
    deadline = _time.monotonic() + 300.0
    while handle.stats()["steps"] < 8:
        if _time.monotonic() > deadline:
            raise TimeoutError("flowgraph never reached steady state")
        _time.sleep(0.25)
    costs = handle.profile_blocks(duration_s=2.0)
    print("block device-time attribution (profile window):")
    for name, pct in costs.items():
        print(f"  {pct:6.2f}%  {name}")
    handle.stop()
    handle.wait()
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main(*sys.argv[1:])
