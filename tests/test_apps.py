"""App-level tests: spectrum analyzer and SSB receiver
(parity targets: examples/spectrum/src/bin/cpu.rs, examples/ssb/receive.rs;
BASELINE.json configs #2 and #3)."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from futuresdr_tpu import Runtime  # noqa: E402
from futuresdr_tpu.blocks import VectorSink, VectorSource  # noqa: E402


def test_spectrum_tone_peak():
    from spectrum import build_spectrum

    fs, ftone, nfft = 1_000_000.0, 125_000.0, 2048
    n = nfft * 64
    t = np.arange(n) / fs
    iq = np.exp(2j * np.pi * ftone * t).astype(np.complex64)
    fg, tail = build_spectrum(VectorSource(iq), nfft)
    snk = VectorSink(np.float32)
    fg.stream(tail, snk)
    Runtime(chunk_size=nfft * 16).run(fg)
    frames = snk.data().reshape(-1, nfft)
    assert frames.shape[0] >= 32
    # shifted spectrum: bin for +125 kHz at nfft/2 + ftone/fs*nfft
    expect_bin = nfft // 2 + int(round(ftone / fs * nfft))
    peak_bins = frames.argmax(axis=1)
    assert np.all(np.abs(peak_bins - expect_bin) <= 1)
    # windowed tone should stand ≥40 dB above the far-away noise floor
    far = np.delete(frames[5], np.arange(expect_bin - 8, expect_bin + 9))
    assert frames[5, expect_bin] - np.max(far) > 40.0


def test_ssb_weaver_tone():
    from ssb import build_ssb_receiver, synthesize_usb_tone

    file_rate, audio_rate = 256_000, 32_000
    iq = synthesize_usb_tone(file_rate, seconds=1.0, audio_freq=700.0)
    fg, tail = build_ssb_receiver(
        VectorSource(iq), file_rate, audio_rate, level=1e-4
    )
    snk = VectorSink(np.float32)
    fg.stream(tail, snk)
    Runtime(chunk_size=1 << 16).run(fg)
    y = snk.data()
    assert len(y) > 0.9 * audio_rate
    n0, n1 = int(0.1 * len(y)), int(0.95 * len(y))
    t = np.arange(len(y)) / audio_rate
    seg, tt = y[n0:n1], t[n0:n1]
    s = np.sin(2 * np.pi * 700.0 * tt)
    c = np.cos(2 * np.pi * 700.0 * tt)
    a, b = 2 * np.mean(seg * s), 2 * np.mean(seg * c)
    fit = a * s + b * c
    snr = 10 * np.log10(np.mean(fit**2) / np.mean((seg - fit) ** 2))
    assert snr > 40.0, f"SSB tone SNR {snr:.1f} dB"
    # level: amplitude 10_000 · 1e-4 · volume 0.5 ≈ 0.5
    assert 0.35 < np.hypot(a, b) < 0.65


def test_cw_beacon_keys_tone():
    from cw import build_cw, keying_envelope

    fs = 8000.0
    fg, tail, n = build_cw("SOS", fs)
    snk = VectorSink(np.float32)
    fg.stream(tail, snk)
    from futuresdr_tpu import Runtime

    Runtime(chunk_size=2048).run(fg)
    y = snk.data()
    env = keying_envelope("SOS", fs)
    m = min(len(y), len(env))
    # envelope of the keyed tone matches the key (tone power where key=1)
    power = np.convolve(y[:m] ** 2, np.ones(64) / 64, mode="same")
    on = power[env[:m] > 0.9]
    off_mask = env[:m] < 0.1
    # exclude ramp neighborhoods
    off = power[off_mask]
    assert on.mean() > 0.3
    assert np.median(off) < 0.01


def test_ssb_tx_rx_roundtrip():
    """transmit.rs ∘ receive.rs: a 700 Hz USB tone round-trips."""
    from ssb import build_ssb_receiver
    from ssb_tx import build_ssb_tx

    from futuresdr_tpu.blocks import Head, SignalSource

    audio_rate, file_rate = 32_000, 256_000
    src = SignalSource(700.0, float(audio_rate), kind="sin")
    fg, tail = build_ssb_tx(src, audio_rate, file_rate, frequency=53_000.0)
    tx_snk = VectorSink(np.complex64)
    head = Head(file_rate, np.complex64)  # 1 s
    fg.stream(tail, head)
    fg.stream(head, tx_snk)
    from futuresdr_tpu import Runtime

    Runtime(chunk_size=1 << 16).run(fg)
    iq = tx_snk.data()
    assert len(iq) > 0.97 * file_rate  # Head cap minus the transient trim

    fg2, tail2 = build_ssb_receiver(
        VectorSource(iq), file_rate, audio_rate, center_freq=51_500.0, level=1.0
    )
    rx = VectorSink(np.float32)
    fg2.stream(tail2, rx)
    Runtime(chunk_size=1 << 16).run(fg2)
    y = rx.data()
    n0, n1 = int(0.2 * len(y)), int(0.9 * len(y))
    t = np.arange(len(y)) / audio_rate
    seg, tt = y[n0:n1], t[n0:n1]
    s = np.sin(2 * np.pi * 700.0 * tt)
    c = np.cos(2 * np.pi * 700.0 * tt)
    a, b = 2 * np.mean(seg * s), 2 * np.mean(seg * c)
    fit = a * s + b * c
    snr = 10 * np.log10(np.mean(fit**2) / np.mean((seg - fit) ** 2))
    assert snr > 30.0, f"SSB TX→RX tone SNR {snr:.1f} dB"
