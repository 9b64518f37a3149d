"""Coverage for DSP blocks not exercised elsewhere: PFB channelize →
synthesize reconstruction, Agc convergence, Iir block, XlatingFir retune,
FreqShift."""

import numpy as np

from futuresdr_tpu import Flowgraph, Runtime, connect
from futuresdr_tpu.blocks import (
    Agc,
    Fir,
    FreqShift,
    Head,
    Iir,
    PfbChannelizer,
    PfbSynthesizer,
    SignalSource,
    VectorSink,
    VectorSource,
    XlatingFir,
)
from futuresdr_tpu.types.pmt import Pmt


def test_pfb_channelize_synthesize_reconstruction():
    """Analysis → synthesis of a multitone signal reproduces it (up to
    the filter-bank group delay and edge transient)."""
    m = 8
    fs = 1.0
    n = 8192 * 2
    t = np.arange(n)
    x = sum(
        np.exp(2j * np.pi * (k / m + 0.013) * t) for k in (0, 2, 5)
    ) / 3.0
    x = x.astype(np.complex64)

    fg = Flowgraph()
    ch = PfbChannelizer(m)
    syn = PfbSynthesizer(m)
    snk = VectorSink(np.complex64)
    fg.stream(VectorSource(x), ch)
    for k in range(m):
        fg.stream(ch, syn, src_port=k, dst_port=k)
    fg.stream(syn, snk)
    Runtime(chunk_size=2048).run(fg)
    y = snk.data()
    assert len(y) > n * 0.8
    # align by cross-correlation (filter-bank delay), then compare SNR
    seg_y = y[2000:10000]
    c = np.correlate(seg_y, x[2000:2512], mode="valid")
    lag = int(np.argmax(np.abs(c)))
    ref = x[2000 - 0 : 2000 + len(seg_y) - 0]
    yy = seg_y[lag : lag + 6000]
    xx = x[2000 : 2000 + len(yy)]
    g = np.vdot(xx, yy) / np.vdot(xx, xx)
    err = yy - g * xx
    snr = 10 * np.log10(
        float(np.mean(np.abs(xx) ** 2) / (np.mean(np.abs(err) ** 2) + 1e-15))
    )
    assert snr > 30.0, f"reconstruction SNR {snr:.1f} dB"


def test_agc_converges_to_reference_level():
    rng = np.random.default_rng(0)
    x = (0.05 * (rng.standard_normal(80_000) + 1j * rng.standard_normal(80_000))).astype(
        np.complex64
    )
    fg = Flowgraph()
    agc = Agc(reference=1.0, rate=5e-2)
    snk = VectorSink(np.complex64)
    connect(fg, VectorSource(x), agc, snk)
    Runtime(chunk_size=8192).run(fg)
    y = snk.data()
    tail = y[-8000:]
    rms = float(np.sqrt(np.mean(np.abs(tail) ** 2)))
    assert 0.8 < rms < 1.25, f"AGC settled at rms {rms}"


def test_iir_block_single_pole():
    # y[n] = b0 x[n] + a1 y[n-1]
    b = [0.1]
    a = [1.0, -0.9]
    x = np.zeros(4000, np.float32)
    x[0] = 1.0
    fg = Flowgraph()
    snk = VectorSink(np.float32)
    connect(fg, VectorSource(x), Iir(b, a, np.float32), snk)
    Runtime(chunk_size=512).run(fg)
    y = snk.data()
    ref = 0.1 * (0.9 ** np.arange(len(y)))
    assert np.max(np.abs(y - ref)) < 1e-4


def test_xlating_fir_extracts_offset_tone():
    fs = 1_000_000.0
    off = 200e3
    n = 1 << 17
    t = np.arange(n) / fs
    # tone at offset + 1 kHz → after xlate+decim: 1 kHz
    x = np.exp(2j * np.pi * (off + 1000.0) * t).astype(np.complex64)
    from futuresdr_tpu.dsp import firdes

    taps = firdes.kaiser_lowpass(0.05, 0.05, 1e-4)
    fg = Flowgraph()
    xl = XlatingFir(taps, 4, off, fs)
    snk = VectorSink(np.complex64)
    connect(fg, VectorSource(x), xl, snk)
    Runtime(chunk_size=1 << 15).run(fg)
    y = snk.data()
    seg = y[2000:-2000]
    ph = np.unwrap(np.angle(seg))
    f_est = np.polyfit(np.arange(len(ph)), ph, 1)[0] * (fs / 4) / (2 * np.pi)
    assert abs(f_est - 1000.0) < 5.0


def test_xlating_fir_message_retune():
    from futuresdr_tpu.dsp import firdes

    taps = firdes.kaiser_lowpass(0.05, 0.05, 1e-4)
    xl = XlatingFir(taps, 4, 100e3, 1e6)
    old = xl.params()["dphi"]
    xl.call_handler("freq", Pmt.from_py(200e3))
    assert xl.params()["dphi"] != old


def test_freq_shift_moves_tone():
    fs = 100_000.0
    n = 1 << 14
    t = np.arange(n) / fs
    x = np.exp(2j * np.pi * 10e3 * t).astype(np.complex64)
    fg = Flowgraph()
    snk = VectorSink(np.complex64)
    connect(fg, VectorSource(x), FreqShift(-10e3, fs), snk)
    Runtime(chunk_size=4096).run(fg)
    y = snk.data()
    # shifted to DC: phase nearly constant
    ph = np.unwrap(np.angle(y[100:]))
    drift = abs(ph[-1] - ph[0]) / len(ph)
    assert drift < 1e-3
