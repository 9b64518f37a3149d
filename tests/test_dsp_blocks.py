"""Coverage for DSP blocks not exercised elsewhere: PFB channelize →
synthesize reconstruction, Agc convergence, Iir block, XlatingFir retune,
FreqShift."""

import numpy as np
import pytest

from futuresdr_tpu.dsp import firdes, windows

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


@pytest.mark.parametrize(
    "mode", ["plain", "decim", "resample", "complex_taps"]
)
def test_fir_retunable_matches_baked_modes(mode):
    """Every Fir mode produces identical output with params-path taps."""
    rng = np.random.default_rng(7)
    x = (
        rng.standard_normal(20_000) + 1j * rng.standard_normal(20_000)
    ).astype(np.complex64)
    if mode == "complex_taps":
        taps = (
            rng.standard_normal(19) + 1j * rng.standard_normal(19)
        ).astype(np.complex64)
    else:
        taps = firdes.lowpass(0.15, windows.hamming(29))

    def run(retunable):
        if mode == "decim":
            # through the FirBuilder-parity classmethod (must forward)
            blk = Fir.decimating(taps, 4, retunable=retunable)
        elif mode == "resample":
            blk = Fir(taps, interp=3, decim=2, retunable=retunable)
        else:
            blk = Fir(taps, retunable=retunable)
        fg = Flowgraph()
        snk = VectorSink(np.complex64)
        connect(fg, VectorSource(x.copy()), blk, snk)
        Runtime(chunk_size=4096).run(fg)
        return snk.data()

    a, b = run(False), run(True)
    assert len(a) == len(b) > 0
    np.testing.assert_allclose(a, b, atol=3e-5, rtol=0)


def test_fir_retunable_matches_baked():
    """Fir(retunable=True) routes taps through device params; output is
    identical to baked taps, and the traced-Toeplitz path (not the slow
    conv lowering) carries it."""
    from futuresdr_tpu.ops.fir import path_stats

    rng = np.random.default_rng(5)
    x = (rng.standard_normal(30_000) + 1j * rng.standard_normal(30_000)).astype(
        np.complex64
    )
    taps = firdes.lowpass(0.2, windows.hamming(31))

    def run(retunable):
        fg = Flowgraph()
        snk = VectorSink(np.complex64)
        connect(
            fg,
            VectorSource(x.copy()),
            Fir(taps, retunable=retunable),
            snk,
        )
        Runtime(chunk_size=4096).run(fg)
        return snk.data()

    conv_before = path_stats["conv"]
    a = run(False)
    b = run(True)
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=0)
    assert path_stats["conv"] == conv_before, "traced taps fell to conv"


def test_fir_retunable_live_retune(tmp_path):
    """A taps retune across a snapshot/resume boundary swaps the
    response with exact history continuity (the FIR state carries the
    old-taps input tail; the new taps apply from the next sample).
    Non-retunable blocks and wrong-length retunes reject."""
    from futuresdr_tpu.runtime.executor import Executor
    from futuresdr_tpu.types.pmt import Pmt

    rng = np.random.default_rng(6)
    n, chunk = 16_384, 4096
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )
    t_a = firdes.lowpass(0.3, windows.hamming(25))
    t_b = firdes.highpass(0.3, windows.hamming(25))
    ckpt = tmp_path / "retune.ckpt"

    def graph(taps):
        blk = Fir(taps, retunable=True)
        fg = Flowgraph()
        snk = VectorSink(np.complex64)
        connect(fg, VectorSource(x.copy()), blk, snk)
        return fg, blk, snk

    fg1, blk1, snk1 = graph(t_a)
    ex = Executor(fg1, chunk_size=chunk, max_steps=2)
    ex.running = True
    ex.run_loop()  # two chunks under taps A
    blk1.call_handler("taps", Pmt.from_py([float(v) for v in t_b]))
    ex.snapshot(ckpt)  # checkpoint carries the RETUNED params
    part1 = snk1.data()

    # fresh graph built with the ORIGINAL taps: restore must bring back
    # the retuned ones (device params are checkpoint state)
    fg2, blk2, snk2 = graph(t_a)
    Runtime(chunk_size=chunk).run(fg2, restore=str(ckpt))
    q = blk2.call_handler("taps", Pmt.from_py(None)).to_py()
    np.testing.assert_allclose(q, t_b, atol=1e-7)
    got = np.concatenate([part1, snk2.data()[len(part1) :]])

    # reference: valid-mode convs with explicit history across the switch
    T = len(t_a)
    ref_a = np.convolve(x[: 2 * chunk], t_a, mode="valid")
    hist = x[2 * chunk - (T - 1) : 2 * chunk]
    ref_b = np.convolve(np.concatenate([hist, x[2 * chunk :]]), t_b, "valid")
    ref = np.concatenate([ref_a, ref_b])
    m = min(len(got), len(ref))
    assert m > 3 * chunk
    np.testing.assert_allclose(got[:m], ref[:m], atol=2e-5, rtol=0)

    with pytest.raises(ValueError):
        blk2.call_handler("taps", Pmt.from_py([1.0, 2.0]))
    baked = Fir(t_a)
    with pytest.raises(RuntimeError):
        baked.call_handler("taps", Pmt.from_py([float(v) for v in t_a]))


def test_xlating_fir_retunable_matches_baked():
    """XlatingFir(retunable=True): identical output through params-path
    taps, and the taps handler is registered alongside freq."""
    rng = np.random.default_rng(8)
    x = (
        rng.standard_normal(24_000) + 1j * rng.standard_normal(24_000)
    ).astype(np.complex64)
    taps = firdes.lowpass(0.1, windows.hamming(33))

    def run(retunable):
        from futuresdr_tpu.blocks import XlatingFir

        blk = XlatingFir(taps, 4, 150e3, 1e6, retunable=retunable)
        fg = Flowgraph()
        snk = VectorSink(np.complex64)
        connect(fg, VectorSource(x.copy()), blk, snk)
        Runtime(chunk_size=4096).run(fg)
        return blk, snk.data()

    blk_a, a = run(False)
    blk_b, b = run(True)
    assert sorted(blk_b.handlers().keys()) == ["freq", "taps"]
    assert len(a) == len(b) > 0
    np.testing.assert_allclose(a, b, atol=3e-5, rtol=0)
    with pytest.raises(ValueError):
        blk_b.call_handler("taps", Pmt.from_py([1.0, 2.0]))
