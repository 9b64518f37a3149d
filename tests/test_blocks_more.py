"""ApplyNM/ApplyIntoIter, PfbArbResampler, seify dummy driver, audio
fallback, executor stats, and the WLAN TX→RX flowgraph round trip."""

import numpy as np
import pytest

from futuresdr_tpu import Flowgraph, Runtime, connect
from futuresdr_tpu.blocks import (
    ApplyIntoIter,
    ApplyNM,
    Head,
    PfbArbResampler,
    VectorSink,
    VectorSource,
)
from futuresdr_tpu.blocks.seify import Builder
from futuresdr_tpu.types.pmt import Pmt


def test_apply_nm_windowed_sum():
    import jax.numpy as jnp

    data = np.arange(4000, dtype=np.float32)
    fg = Flowgraph()
    # 4:1 windowed sum
    b = ApplyNM(
        lambda w: jnp.sum(w, axis=-1, keepdims=True),
        4,
        1,
        np.float32,
        np.float32,
    )
    snk = VectorSink(np.float32)
    connect(fg, VectorSource(data), b, snk)
    Runtime(chunk_size=512).run(fg)
    ref = data.reshape(-1, 4).sum(axis=1)
    assert np.allclose(snk.data(), ref)


def test_apply_into_iter_repeat():
    import jax.numpy as jnp

    data = np.arange(100, dtype=np.float32)
    fg = Flowgraph()
    b = ApplyIntoIter(
        lambda x: jnp.repeat(x[:, None], 3, axis=1), 3, np.float32
    )
    snk = VectorSink(np.float32)
    connect(fg, VectorSource(data), b, snk)
    Runtime(chunk_size=64).run(fg)
    assert np.array_equal(snk.data(), np.repeat(data, 3))


def test_pfb_arb_resampler_tone():
    fs = 32_000.0
    f0 = 1_000.0
    rate = 3.0 / 2.0
    n = 32_000
    t = np.arange(n) / fs
    iq = np.exp(2j * np.pi * f0 * t).astype(np.complex64)
    fg = Flowgraph()
    snk = VectorSink(np.complex64)
    connect(fg, VectorSource(iq), PfbArbResampler(rate), snk)
    Runtime(chunk_size=4096).run(fg)
    y = snk.data()
    assert len(y) > 0.9 * n * rate
    # output tone should be f0 at fs·rate
    seg = y[2000:-2000]
    ph = np.unwrap(np.angle(seg))
    f_est = np.polyfit(np.arange(len(ph)), ph, 1)[0] * fs * rate / (2 * np.pi)
    assert abs(f_est - f0) < 5.0
    amp = np.mean(np.abs(seg))
    assert 0.8 < amp < 1.2


def test_seify_dummy_source_and_retune():
    src = Builder("driver=dummy").frequency(2.4e9).sample_rate(1e6).gain(
        0.0
    ).build_source()
    fg = Flowgraph()
    snk = VectorSink(np.complex64)
    connect(fg, src, Head(32768, np.complex64), snk)
    rt = Runtime(chunk_size=8192)
    src.call_handler("freq", Pmt.from_py(2.45e9))
    assert src.frequency == 2.45e9
    Runtime(chunk_size=8192).run(fg)
    y = snk.data()
    assert len(y) == 32768
    # dummy driver: 100 kHz tone at 1 MS/s
    spec = np.abs(np.fft.fft(y[:8192]))
    peak = np.argmax(spec)
    assert abs(peak - 8192 * 0.1) < 3


def test_seify_config_query_and_terminate():
    """seify/source.rs config + terminate ports: a config query returns
    the current settings as a Pmt map; Pmt::Ok on terminate ends the
    stream through the normal EOS cascade (no Head needed)."""
    from futuresdr_tpu.blocks.seify import Config

    src = Builder("driver=dummy").frequency(1e9).sample_rate(2e6).gain(
        10.0
    ).build_source()
    cfg = Config.from_pmt(src.call_handler("config", Pmt.from_py(0)))
    assert cfg.frequency == 1e9
    assert cfg.sample_rate == 2e6
    assert cfg.gain == 10.0
    with pytest.raises(ValueError):
        src.call_handler("config", Pmt.from_py(3))

    src.call_handler("terminate", Pmt.ok())
    fg = Flowgraph()
    snk = VectorSink(np.complex64)
    connect(fg, src, snk)
    Runtime(chunk_size=4096).run(fg)  # returns: source is terminated
    assert len(snk.data()) == 0


def test_seify_multichannel_dummy():
    """seify/source.rs:63-85 — one stream output per configured channel.
    Coherent dummy: both channels carry the same tone with independent
    noise; per-channel config query reports the hardware channel id."""
    from futuresdr_tpu.blocks.seify import Config

    src = (
        Builder("driver=dummy")
        .sample_rate(1e6)
        .channels([0, 2])
        .build_source()
    )
    assert len(src.stream_outputs) == 2
    c1 = Config.from_pmt(src.call_handler("config", Pmt.from_py(1)))
    assert c1.chan == 2

    fg = Flowgraph()
    s0, s1 = VectorSink(np.complex64), VectorSink(np.complex64)
    h0 = Head(16384, np.complex64)
    h1 = Head(16384, np.complex64)
    fg.add(src), fg.add(h0), fg.add(h1), fg.add(s0), fg.add(s1)
    fg.stream(src, h0, 0, 0), fg.stream(h0, s0)
    fg.stream(src, h1, 1, 0), fg.stream(h1, s1)
    Runtime(chunk_size=8192).run(fg)
    y0, y1 = np.asarray(s0.data()), np.asarray(s1.data())
    assert len(y0) == len(y1) == 16384
    # same coherent tone bin on both channels…
    p0 = np.argmax(np.abs(np.fft.fft(y0[:8192])))
    p1 = np.argmax(np.abs(np.fft.fft(y1[:8192])))
    assert p0 == p1
    # …but independent noise realizations
    assert not np.array_equal(y0, y1)

    with pytest.raises(ValueError):
        Builder("driver=file,path=/dev/null").channels([0, 1]).build_source()


def test_iir_builder_shim():
    from futuresdr_tpu.blocks import Iir, IirBuilder

    blk = IirBuilder.same_type([1.0, 2.0, 3.0], [1.0, 0.5, 0.1])
    assert isinstance(blk, Iir)
    assert isinstance(IirBuilder.iir([0.5], [1.0]), Iir)


def test_seify_sink_counts():
    snk = Builder("driver=dummy").build_sink()
    fg = Flowgraph()
    connect(
        fg,
        VectorSource(np.zeros(10_000, np.complex64)),
        snk,
    )
    Runtime(chunk_size=2048).run(fg)
    assert snk.n_sent == 10_000


def test_audio_sink_fallback_wav(tmp_path):
    import wave

    from futuresdr_tpu.blocks import AudioSink, SignalSource

    path = tmp_path / "fallback.wav"
    fg = Flowgraph()
    snk = AudioSink(48_000, fallback_path=path)
    connect(
        fg,
        SignalSource(440.0, 48_000.0, kind="sin"),
        Head(48_000, np.float32),
        snk,
    )
    Runtime(chunk_size=8192).run(fg)
    with wave.open(str(path), "rb") as w:
        assert w.getnframes() == 48_000


def test_audio_file_source_roundtrip(tmp_path):
    from futuresdr_tpu.blocks import AudioFileSource, WavSink

    path = tmp_path / "in.wav"
    tone = (0.5 * np.sin(2 * np.pi * 440 * np.arange(8000) / 8000)).astype(
        np.float32
    )
    ws = WavSink(path, 8000)
    ws.host_consume(tone, [])
    ws.on_finish()

    fg = Flowgraph()
    src = AudioFileSource(path)
    snk = VectorSink(np.float32)
    connect(fg, src, snk)
    Runtime(chunk_size=1024).run(fg)
    got = snk.data()
    assert len(got) == 8000
    assert np.max(np.abs(got - tone)) < 1e-3  # int16 quantization


def test_executor_stats():
    fg = Flowgraph()
    snk = VectorSink(np.float32)
    connect(fg, VectorSource(np.zeros(100_000, np.float32)), snk)
    from futuresdr_tpu.runtime.executor import Executor

    ex = Executor(fg, chunk_size=8192)
    ex.running = True
    ex.run_loop()
    s = ex.stats()
    assert s["steps"] > 0
    assert s["items_delivered"][1] == 100_000
    assert s["samples_per_s"] > 0


def test_wlan_flowgraph_roundtrip():
    from futuresdr_tpu.blocks import MessageSink
    from futuresdr_tpu.models.wlan import make_mac_frame
    from futuresdr_tpu.models.wlan.blocks import WlanRxSink, WlanTxSource

    p1 = make_mac_frame(b"over-the-flowgraph frame", seq=9)
    tx = WlanTxSource(mcs="qpsk12")
    tx.send(p1)
    rx = WlanRxSink()
    frames = MessageSink()
    fg = Flowgraph()
    head = Head(60_000, np.complex64)
    connect(fg, tx, head, rx)
    fg.add(frames)
    fg.message(rx, "rx_frames", frames, "in")
    Runtime(chunk_size=16384).run(fg)
    assert any(f.crc_ok and f.psdu == p1 for f in rx.frames)
    assert any(bytes(m.to_py()) == p1 for m in frames.received)


def test_native_ring_and_converters():
    from futuresdr_tpu.native import NativeRing, convert_iq, lib

    r = NativeRing(1 << 16)
    data = bytes(range(256)) * 8
    assert r.write(data) == len(data)
    assert r.readable() == len(data)
    assert r.read(len(data)) == data
    assert r.readable() == 0

    raw = np.array([16384, -16384, 32767, 0], dtype=np.int16)
    re, im = convert_iq(raw, "cs16")
    assert np.allclose(re, [0.5, 32767 / 32768], atol=1e-4)
    assert np.allclose(im, [-0.5, 0.0], atol=1e-4)
    # native lib should actually be present in this environment
    assert lib() is not None


def test_iq_file_source_cs16(tmp_path):
    from futuresdr_tpu.blocks import IQFileSource

    n = 50_000
    rng = np.random.default_rng(0)
    iq = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) * 0.1
    inter = np.empty(2 * n, np.int16)
    inter[0::2] = np.clip(iq.real * 32768, -32768, 32767).astype(np.int16)
    inter[1::2] = np.clip(iq.imag * 32768, -32768, 32767).astype(np.int16)
    path = tmp_path / "cap.cs16"
    inter.tofile(path)

    fg = Flowgraph()
    src = IQFileSource(path, fmt="cs16")
    snk = VectorSink(np.complex64)
    connect(fg, src, snk)
    Runtime(chunk_size=8192).run(fg)
    got = snk.data()
    assert len(got) == n
    ref = (inter[0::2].astype(np.float32) + 1j * inter[1::2]) / 32768.0
    assert np.max(np.abs(got - ref)) < 1e-6


def test_udp_iq_source_native_ingest():
    """Native UDP->SPSC-ring ingest: datagrams sent over loopback come
    out as converted complex chunks, in order, with live stats."""
    import socket
    import time

    from futuresdr_tpu.blocks import UdpIqSource

    src = UdpIqSource(fmt="cs16", ring_bytes=1 << 16)
    port = src.bound_port
    assert port > 0
    n = 512
    iq = (np.arange(2 * n, dtype=np.int16) - n).astype(np.int16)
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    for off in range(0, 2 * n, 256):  # 4 datagrams of 512 B
        tx.sendto(iq[off : off + 256].tobytes(), ("127.0.0.1", port))
    deadline = time.monotonic() + 5.0
    got = np.zeros(0, np.complex64)
    while len(got) < n and time.monotonic() < deadline:
        out = src.host_produce(n - len(got))
        if out is not None and len(out):
            got = np.concatenate([got, out])
        else:
            time.sleep(0.01)
    assert len(got) == n
    want = (iq[0::2].astype(np.float32) + 1j * iq[1::2].astype(np.float32)) / 32768.0
    np.testing.assert_allclose(got, want.astype(np.complex64), atol=1e-7)
    d, b, drop = src.stats()
    assert d == 4 and b == iq.nbytes and drop == 0
    src.on_finish()


def test_udp_iq_source_drops_whole_datagrams_when_full():
    import socket
    import time

    from futuresdr_tpu.blocks import UdpIqSource

    src = UdpIqSource(fmt="cf32", ring_bytes=4096)  # tiny ring
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    pkt = np.ones(1024, np.float32).tobytes()  # 4 KiB per datagram
    for _ in range(4):
        tx.sendto(pkt, ("127.0.0.1", src.bound_port))
    deadline = time.monotonic() + 5.0
    while src.stats()[0] < 4 and time.monotonic() < deadline:
        time.sleep(0.01)
    d, b, drop = src.stats()
    assert d == 4 and drop >= 3  # ring holds one datagram; rest dropped whole
    assert b % 8 == 0  # never a torn item
    src.on_finish()


def test_udp_reader_python_fallback(monkeypatch):
    """Without the native library the reader degrades to a Python thread
    with identical semantics."""
    import socket
    import time

    import futuresdr_tpu.native as native_mod
    from futuresdr_tpu.native import NativeRing, NativeUdpReader

    monkeypatch.setattr(native_mod, "lib", lambda: None)
    ring = NativeRing(1 << 12)
    assert ring._h is None  # really the fallback ring
    rd = NativeUdpReader(ring, "127.0.0.1", 0)
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    tx.sendto(b"\x01\x02\x03\x04", ("127.0.0.1", rd.port))
    deadline = time.monotonic() + 5.0
    while ring.readable() < 4 and time.monotonic() < deadline:
        time.sleep(0.01)
    assert ring.read(4) == b"\x01\x02\x03\x04"
    assert rd.stats()[0] == 1
    rd.stop()


def test_udp_iq_source_rejects_oversized_chunk():
    import pytest
    from futuresdr_tpu.blocks import UdpIqSource

    src = UdpIqSource(fmt="cf32", ring_bytes=4096)
    with pytest.raises(ValueError, match="ring_bytes"):
        src.host_produce(4096)  # 32 KiB of cf32 > 4 KiB ring
    src.on_finish()


def test_udp_iq_source_drops_misaligned_datagrams():
    """A datagram whose length is not a wire-item multiple is malformed
    and must be dropped whole — otherwise every later sample's I/Q
    planes shift."""
    import socket
    import time

    from futuresdr_tpu.blocks import UdpIqSource

    src = UdpIqSource(fmt="cf32", ring_bytes=1 << 16)
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    tx.sendto(b"\x00" * 996, ("127.0.0.1", src.bound_port))  # 124.5 items
    good = np.arange(2 * 8, dtype=np.float32).tobytes()  # 8 samples
    tx.sendto(good, ("127.0.0.1", src.bound_port))
    deadline = time.monotonic() + 5.0
    out = np.zeros(0, np.complex64)
    while len(out) < 8 and time.monotonic() < deadline:
        got = src.host_produce(8)
        if got is not None and len(got):
            out = got
        else:
            time.sleep(0.01)
    want = np.arange(16, dtype=np.float32)
    np.testing.assert_array_equal(out.view(np.float32), want)
    d, b, drop = src.stats()
    assert d == 2 and drop == 1 and b == len(good)
    src.on_finish()


def test_fft_size_message_port():
    """fft.rs fft_size port: query + pre-compile retune; mid-run retune
    is an explicit error (SDF rate change = recompile)."""
    from futuresdr_tpu.blocks import Fft

    blk = Fft(size=256)
    assert blk.call_handler("fft_size", Pmt.from_py(None)).to_py() == 256
    blk.call_handler("fft_size", Pmt.from_py(512))
    assert blk.size == 512 and blk.rate_in == (512,)

    iq = np.exp(2j * np.pi * 0.125 * np.arange(4096)).astype(np.complex64)
    fg = Flowgraph()
    snk = VectorSink(np.complex64)
    connect(fg, VectorSource(iq), blk, snk)
    Runtime(chunk_size=2048).run(fg)
    y = np.asarray(snk.data()).reshape(-1, 512)
    assert np.argmax(np.abs(y[0])) == 64  # 0.125 * 512
    # Runtime.run released the lock: the documented stop -> set ->
    # run-again flow works on the same block
    blk.call_handler("fft_size", Pmt.from_py(1024))
    assert blk.size == 1024
    blk._rate_locked = True  # what a live Executor sets at compile
    with pytest.raises(RuntimeError):
        blk.call_handler("fft_size", Pmt.from_py(2048))
    blk._rate_locked = False
    with pytest.raises(ValueError):
        Fft(256).call_handler("fft_size", Pmt.from_py(0))
    from futuresdr_tpu.dsp import windows as _win

    wblk = Fft(256, window=_win.hamming(256))
    with pytest.raises(ValueError):
        wblk.call_handler("fft_size", Pmt.from_py(512))
    with pytest.raises(ValueError):
        Fft(512, window=_win.hamming(256))  # ctor validates too


def test_seify_cmd_applies_full_config():
    """The cmd port applies every Config field (config.rs:62-109):
    antenna is recorded and reported back; an unknown chan rejects."""
    from futuresdr_tpu.blocks.seify import Config

    src = Builder("driver=dummy").build_source()
    src.call_handler(
        "cmd",
        Config(frequency=7e8, gain=12.0, antenna="RX2", chan=0).to_pmt(),
    )
    assert src.frequency == 7e8 and src.gain == 12.0
    assert src.antenna == "RX2"
    cfg = Config.from_pmt(src.call_handler("config", Pmt.from_py(0)))
    assert cfg.antenna == "RX2"
    with pytest.raises(ValueError):
        src.call_handler("cmd", Config(chan=5).to_pmt())


def test_seify_sink_full_port_surface():
    """seify/sink.rs:50 ports: freq, gain, sample_rate, cmd, config."""
    from futuresdr_tpu.blocks.seify import Config

    snk = Builder("driver=dummy").build_sink()
    assert sorted(snk.handlers()) == [
        "cmd", "config", "freq", "gain", "sample_rate",
    ]
    snk.call_handler(
        "cmd", Config(frequency=4.33e8, sample_rate=2.5e6, gain=30.0).to_pmt()
    )
    cfg = Config.from_pmt(snk.call_handler("config", Pmt.from_py(0)))
    assert cfg.frequency == 4.33e8
    assert cfg.sample_rate == 2.5e6
    assert cfg.gain == 30.0


def test_seify_sink_terminate_out():
    """Pmt::Ok posted on terminate_out when the stream finishes
    (sink.rs:278 — HITL loopback source-stop signal)."""
    from futuresdr_tpu.blocks import MessageSink

    snk = Builder("driver=dummy").build_sink()
    ms = MessageSink()
    fg = Flowgraph()
    connect(fg, VectorSource(np.zeros(5_000, np.complex64)), snk)
    fg.add(ms)
    fg.message(snk, "terminate_out", ms, "in")
    Runtime(chunk_size=2048).run(fg)
    assert len(ms.received) == 1
