"""SoapySDR driver against a fake SoapySDR module (the fake-driver
pattern of tests/test_audio_driver.py): full stream + retune surface
without hardware."""

import sys
import types

import numpy as np
import pytest

from futuresdr_tpu import Flowgraph, Runtime, connect
from futuresdr_tpu.blocks import Head, VectorSink
from futuresdr_tpu.types.pmt import Pmt

SOAPY_SDR_RX = 1
SOAPY_SDR_CF32 = "CF32"
SOAPY_SDR_TIMEOUT = -1
SOAPY_SDR_OVERFLOW = -4


class _FakeStreamResult:
    def __init__(self, ret):
        self.ret = ret


class _FakeDevice:
    """Tone generator with the SoapySDR Device API surface."""

    def __init__(self, args):
        self.args = dict(args)
        self.calls = []
        self.sample_rate = 1e6
        self.freq = 100e6
        self.gain = 0.0
        self.agc = False
        self.antenna = None
        self._phase = 0.0
        self._active = False
        self._inject = []  # pending special return codes

    # --- config -----------------------------------------------------
    def setSampleRate(self, d, ch, v):
        self.calls.append(("rate", ch, v))
        self.sample_rate = v

    def setFrequency(self, d, ch, v):
        self.calls.append(("freq", ch, v))
        self.freq = v

    def hasGainMode(self, d, ch):
        return True

    def setGainMode(self, d, ch, on):
        self.calls.append(("agc", ch, on))
        self.agc = bool(on)

    def setGain(self, d, ch, v):
        self.calls.append(("gain", ch, v))
        self.gain = v

    def setAntenna(self, d, ch, name):
        self.calls.append(("antenna", ch, name))
        self.antenna = name

    # --- streaming ----------------------------------------------------
    def setupStream(self, d, fmt, chans):
        assert fmt == SOAPY_SDR_CF32
        self.stream_chans = list(chans)
        return "stream0"

    def activateStream(self, st):
        self._active = True

    def deactivateStream(self, st):
        self._active = False

    def closeStream(self, st):
        self.closed = True

    def readStream(self, st, bufs, n, timeoutUs=0):
        assert self._active
        if self._inject:
            return _FakeStreamResult(self._inject.pop(0))
        w = 2 * np.pi * 50e3 / self.sample_rate
        ph = self._phase + w * np.arange(n)
        self._phase = float((self._phase + w * n) % (2 * np.pi))
        bufs[0][:n] = np.exp(1j * ph).astype(np.complex64)
        return _FakeStreamResult(n)


@pytest.fixture()
def fake_soapy(monkeypatch):
    mod = types.ModuleType("SoapySDR")
    mod.SOAPY_SDR_RX = SOAPY_SDR_RX
    mod.SOAPY_SDR_CF32 = SOAPY_SDR_CF32
    mod.SOAPY_SDR_TIMEOUT = SOAPY_SDR_TIMEOUT
    mod.SOAPY_SDR_OVERFLOW = SOAPY_SDR_OVERFLOW
    devices = []

    def make_device(args):
        d = _FakeDevice(args)
        devices.append(d)
        return d

    mod.Device = make_device
    mod._devices = devices
    monkeypatch.setitem(sys.modules, "SoapySDR", mod)
    return mod


def test_soapy_stream_and_retunes(fake_soapy):
    from futuresdr_tpu.blocks.seify import Builder

    src = (
        Builder("driver=soapy,soapy_driver=rtlsdr")
        .frequency(433e6)
        .sample_rate(1e6)
        .gain(20.0)
        .build_source()
    )
    dev = fake_soapy._devices[0]
    assert dev.args == {"driver": "rtlsdr"}
    assert dev.freq == 433e6 and dev.gain == 20.0 and not dev.agc

    fg = Flowgraph()
    snk = VectorSink(np.complex64)
    connect(fg, src, Head(32768, np.complex64), snk)
    src.call_handler("freq", Pmt.from_py(434e6))
    src.call_handler("gain", Pmt.from_py(None))  # back to AGC
    assert dev.freq == 434e6 and dev.agc
    Runtime(chunk_size=8192).run(fg)
    y = np.asarray(snk.data())
    assert len(y) == 32768
    peak = np.argmax(np.abs(np.fft.fft(y[:8192])))
    assert abs(peak - 8192 * 0.05) < 3  # 50 kHz tone at 1 MS/s
    assert getattr(dev, "closed", False)  # stream closed at EOS


def test_soapy_timeout_overflow_and_antenna(fake_soapy):
    from futuresdr_tpu.blocks.seify import Builder, Config

    src = Builder("driver=soapy").build_source()
    dev = fake_soapy._devices[0]
    dev._inject = [SOAPY_SDR_TIMEOUT, SOAPY_SDR_OVERFLOW]
    assert len(src.host_produce(256)) == 0  # timeout → retry
    assert len(src.host_produce(256)) == 0  # overflow → counted + retry
    assert src.call_handler("overflows", Pmt.from_py(None)).to_py() == 1
    assert len(src.host_produce(256)) == 256

    src.call_handler("cmd", Config(antenna="RX2").to_pmt())
    assert dev.antenna == "RX2"

    dev._inject = [-7]  # fatal stream error
    with pytest.raises(ConnectionError):
        src.host_produce(256)


def test_soapy_missing_module_is_gated(monkeypatch):
    monkeypatch.setitem(sys.modules, "SoapySDR", None)
    from futuresdr_tpu.blocks.seify import Builder

    with pytest.raises(RuntimeError, match="SoapySDR"):
        Builder("driver=soapy").build_source()


def test_soapy_tx_sink(fake_soapy):
    """TX path: host_consume writes whole chunks via writeStream with
    underflow retry; retunes forward; stream closes at EOS."""
    from futuresdr_tpu.blocks import VectorSource
    from futuresdr_tpu.blocks.seify import Builder

    fake_soapy.SOAPY_SDR_TX = 2
    fake_soapy.SOAPY_SDR_UNDERFLOW = -5
    writes = []

    def writeStream(self, st, bufs, n, timeoutUs=0):
        if getattr(self, "_tx_inject", None):
            return _FakeStreamResult(self._tx_inject.pop(0))
        take = min(n, 1000)  # partial writes exercise the retry loop
        writes.append(np.array(bufs[0][:take]))
        return _FakeStreamResult(take)

    _FakeDevice.writeStream = writeStream
    try:
        snk = (
            Builder("driver=soapy,soapy_driver=lime")
            .frequency(915e6)
            .sample_rate(2e6)
            .gain(30.0)
            .build_sink()
        )
        dev = fake_soapy._devices[0]
        assert dev.args == {"driver": "lime"}
        dev._tx_inject = [SOAPY_SDR_TIMEOUT, fake_soapy.SOAPY_SDR_UNDERFLOW]

        x = (np.arange(5000) % 7).astype(np.complex64)
        fg = Flowgraph()
        connect(fg, VectorSource(x.copy()), snk)
        snk.call_handler("freq", Pmt.from_py(916e6))
        assert dev.freq == 916e6
        Runtime(chunk_size=2048).run(fg)
        sent = np.concatenate(writes)
        np.testing.assert_array_equal(sent, x)
        assert snk._soapy.underflows == 1
        assert snk.n_sent == 5000
        assert getattr(dev, "closed", False)
    finally:
        del _FakeDevice.writeStream


def test_soapy_builder_channel_arg_and_antenna(fake_soapy):
    """channel= in the args string selects the RX channel; .antenna()
    applies at build; builder-owned keys never leak into Device args."""
    from futuresdr_tpu.blocks.seify import Builder

    _FakeDevice.listAntennas = lambda self, d, ch: ["RX1", "RX2"]
    try:
        src = (
            Builder("driver=soapy,soapy_driver=uhd,channel=1")
            .antenna("RX2")
            .build_source()
        )
        dev = fake_soapy._devices[0]
        assert dev.args == {"driver": "uhd"}  # channel= consumed, not leaked
        assert dev.stream_chans == [1]
        assert dev.antenna == "RX2" and src.antenna == "RX2"

        # invalid antenna in a cmd bundle: rejected BEFORE anything applies
        from futuresdr_tpu.blocks.seify import Config

        f0 = src.frequency
        with pytest.raises(ValueError, match="antenna"):
            src.call_handler(
                "cmd", Config(frequency=1e9, antenna="BOGUS").to_pmt()
            )
        assert src.frequency == f0 and dev.antenna == "RX2"
    finally:
        del _FakeDevice.listAntennas


def test_soapy_zero_return_and_tx_stall_bound(fake_soapy):
    """ret == 0 is a legal 'nothing now' (retry, not fatal); a TX stream
    that never makes progress raises instead of hanging the executor."""
    from futuresdr_tpu.blocks.seify import Builder

    src = Builder("driver=soapy").build_source()
    dev = fake_soapy._devices[0]
    dev._inject = [0]
    assert len(src.host_produce(64)) == 0  # zero return → retry

    fake_soapy.SOAPY_SDR_TX = 2
    fake_soapy.SOAPY_SDR_UNDERFLOW = -5

    def writeStream(self, st, bufs, n, timeoutUs=0):
        return _FakeStreamResult(SOAPY_SDR_TIMEOUT)  # never progresses

    _FakeDevice.writeStream = writeStream
    try:
        snk = Builder("driver=soapy").build_sink()
        with pytest.raises(ConnectionError, match="no progress"):
            snk._soapy.write(np.zeros(256, np.complex64))
    finally:
        del _FakeDevice.writeStream


def test_soapy_timed_activation(fake_soapy):
    """Builder.start_time(ns) → hardware-timed activateStream (parity:
    builder.rs start_time → activate_at)."""
    from futuresdr_tpu.blocks.seify import Builder

    acts = []

    def activateStream(self, st, flags=0, timeNs=0):
        acts.append((flags, timeNs))
        self._active = True

    _FakeDevice.activateStream = activateStream
    try:
        Builder("driver=soapy").start_time(123_456_789).build_source()
        assert acts == [(2, 123_456_789)]
    finally:
        del _FakeDevice.activateStream
