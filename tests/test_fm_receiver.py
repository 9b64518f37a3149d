"""FM receiver end-to-end (milestone 1, SURVEY.md §7 step 5).

Parity: ``examples/fm-receiver/src/main.rs:84-130``; acceptance per
BASELINE.json north star — demodulated audio within 60 dB SNR of the
message waveform.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from fm_receiver import build_fm_receiver, synthesize_fm  # noqa: E402

from futuresdr_tpu import Runtime  # noqa: E402
from futuresdr_tpu.blocks import VectorSink, VectorSource, WavSink  # noqa: E402


def _tone_snr(y: np.ndarray, rate: float, freq: float) -> float:
    n0, n1 = int(0.1 * len(y)), int(0.9 * len(y))
    t = np.arange(len(y)) / rate
    seg, tt = y[n0:n1], t[n0:n1]
    s = np.sin(2 * np.pi * freq * tt)
    c = np.cos(2 * np.pi * freq * tt)
    a, b = 2 * np.mean(seg * s), 2 * np.mean(seg * c)
    fit = a * s + b * c
    return 10 * np.log10(np.mean(fit**2) / np.mean((seg - fit) ** 2))


def test_fm_receiver_60db():
    fs, off, ar = 1_000_000.0, 100e3, 50e3
    iq, _ = synthesize_fm(fs, duration=1.0, offset=off)
    fg, tail = build_fm_receiver(VectorSource(iq), fs, off, audio_rate=ar)
    snk = VectorSink(np.float32)
    fg.stream(tail, snk)
    Runtime(chunk_size=1 << 17).run(fg)
    y = snk.data()
    assert len(y) > 0.9 * ar
    snr = _tone_snr(y, ar, 1000.0)
    assert snr > 60.0, f"SNR {snr:.1f} dB below 60 dB target"


def test_fm_receiver_noisy_input():
    fs, off, ar = 1_000_000.0, 100e3, 50e3
    iq, _ = synthesize_fm(fs, duration=1.0, offset=off, snr_db=30.0, seed=7)
    fg, tail = build_fm_receiver(VectorSource(iq), fs, off, audio_rate=ar)
    snk = VectorSink(np.float32)
    fg.stream(tail, snk)
    Runtime(chunk_size=1 << 17).run(fg)
    snr = _tone_snr(snk.data(), ar, 1000.0)
    # 30 dB channel SNR: FM demod + audio filtering should still give a
    # clean tone (FM processing gain)
    assert snr > 25.0


def test_fm_receiver_writes_wav(tmp_path):
    import wave

    fs, off, ar = 1_000_000.0, 100e3, 50e3
    iq, _ = synthesize_fm(fs, duration=0.25, offset=off)
    fg, tail = build_fm_receiver(VectorSource(iq), fs, off, audio_rate=ar)
    path = tmp_path / "out.wav"
    fg.stream(tail, WavSink(path, int(ar)))
    Runtime(chunk_size=1 << 16).run(fg)
    with wave.open(str(path), "rb") as w:
        assert w.getframerate() == int(ar)
        assert w.getnframes() > 0.2 * ar
