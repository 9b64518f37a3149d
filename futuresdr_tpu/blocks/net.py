"""Network I/O blocks.

Parity: ``src/blocks/{tcp_source,tcp_sink,udp_source,blob_to_udp,
websocket_sink,websocket_pmt_sink}.rs``. These are host-boundary blocks
(the reference marks them ``#[blocking]``); they feed/drain the device
pipeline through the executor's source/sink chunking.
"""

from __future__ import annotations

import socket
import threading
from typing import List, Optional

import numpy as np

from futuresdr_tpu.runtime.block import Block, PortSpec, message_handler
from futuresdr_tpu.types.pmt import Pmt


class TcpSource(Block):
    """Read ``dtype`` items from a TCP connection (parity: tcp_source.rs:112
    — connects to, or listens at, ``addr``)."""

    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 0,
        dtype=np.complex64,
        listen: bool = False,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        dt = np.dtype(dtype)
        self.stream_outputs = [PortSpec("out", dt)]
        self.rate_out = (1,)
        self.is_blocking = True
        self._dtype = dt
        self._buf = b""
        self._eos = False
        self._sock: Optional[socket.socket] = None
        self._listen = listen
        self._addr = (host, port)
        self._server: Optional[socket.socket] = None
        if listen:
            self._server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            self._server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            self._server.bind(self._addr)
            self._server.listen(1)
            self._addr = self._server.getsockname()

    @property
    def bound_port(self) -> int:
        return self._addr[1]

    def _ensure(self) -> Optional[socket.socket]:
        if self._sock is None and not self._eos:
            if self._server is not None:
                self._server.settimeout(0.2)
                try:
                    self._sock, _ = self._server.accept()
                except socket.timeout:
                    return None
            else:
                self._sock = socket.create_connection(self._addr, timeout=5.0)
            self._sock.settimeout(0.1)
        return self._sock

    def host_produce(self, n: int, port: int = 0):
        if self._eos and not self._buf:
            return None
        s = self._ensure()
        want = n * self._dtype.itemsize
        while s is not None and len(self._buf) < want and not self._eos:
            try:
                data = s.recv(min(want - len(self._buf), 1 << 20))
            except socket.timeout:
                break
            if not data:
                self._eos = True
                break
            self._buf += data
        items = len(self._buf) // self._dtype.itemsize
        if not self._eos and items < n:
            return np.zeros((0,), self._dtype)  # wait for a full chunk
        take = min(items, n)
        if take == 0:
            return None if self._eos else np.zeros((0,), self._dtype)
        raw = self._buf[: take * self._dtype.itemsize]
        self._buf = self._buf[take * self._dtype.itemsize :]
        return np.frombuffer(raw, dtype=self._dtype)

    def on_finish(self) -> None:
        for s in (self._sock, self._server):
            if s is not None:
                try:
                    s.close()
                except OSError:
                    pass


class TcpSink(Block):
    """Write items to a TCP connection (parity: tcp_sink.rs:110)."""

    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 0,
        dtype=np.float32,
        listen: bool = False,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        dt = np.dtype(dtype)
        self.stream_inputs = [PortSpec("in", dt)]
        self.rate_in = (1,)
        self.is_blocking = True
        self._dtype = dt
        self._sock: Optional[socket.socket] = None
        self._addr = (host, port)
        self._server: Optional[socket.socket] = None
        if listen:
            self._server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
            self._server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            self._server.bind(self._addr)
            self._server.listen(1)
            self._addr = self._server.getsockname()

    @property
    def bound_port(self) -> int:
        return self._addr[1]

    def _ensure(self) -> socket.socket:
        if self._sock is None:
            if self._server is not None:
                self._sock, _ = self._server.accept()
            else:
                self._sock = socket.create_connection(self._addr, timeout=5.0)
        return self._sock

    def host_consume(self, arr: np.ndarray, tags, port: int = 0) -> None:
        self._ensure().sendall(
            np.ascontiguousarray(arr.astype(self._dtype)).tobytes()
        )

    def on_finish(self) -> None:
        for s in (self._sock, self._server):
            if s is not None:
                try:
                    s.close()
                except OSError:
                    pass


class UdpSource(Block):
    """Receive ``dtype`` items over UDP datagrams (parity: udp_source.rs:96)."""

    def __init__(
        self,
        bind: str = "127.0.0.1",
        port: int = 0,
        dtype=np.complex64,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        dt = np.dtype(dtype)
        self.stream_outputs = [PortSpec("out", dt)]
        self.rate_out = (1,)
        self.is_blocking = True
        self._dtype = dt
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._sock.bind((bind, port))
        self._sock.settimeout(0.05)
        self._buf = b""
        self._closed = False

    @property
    def bound_port(self) -> int:
        return self._sock.getsockname()[1]

    def close(self) -> None:
        self._closed = True

    def host_produce(self, n: int, port: int = 0):
        if self._closed:
            return None
        want = n * self._dtype.itemsize
        while len(self._buf) < want:
            try:
                data, _ = self._sock.recvfrom(1 << 16)
            except socket.timeout:
                break
            self._buf += data
        items = len(self._buf) // self._dtype.itemsize
        if items < n:
            return np.zeros((0,), self._dtype)  # wait for a full chunk
        raw = self._buf[: n * self._dtype.itemsize]
        self._buf = self._buf[n * self._dtype.itemsize :]
        return np.frombuffer(raw, dtype=self._dtype)

    def on_finish(self) -> None:
        try:
            self._sock.close()
        except OSError:
            pass


class UdpIqSource(Block):
    """UDP IQ ingest on the NATIVE runtime path: a C++ reader thread
    (``native/ringbuf.cpp``) drains datagrams into the lock-free SPSC
    ring without the GIL, and ``host_produce`` converts SDR wire formats
    (``cs8`` HackRF / ``cu8`` rtl_tcp / ``cs16`` USRP / ``cf32``) to
    complex chunks with the native converters — the network-radio
    equivalent of the reference's ``#[blocking]`` seify driver thread
    feeding a vmcircbuffer ring (``seify/source.rs:53``,
    ``buffer/circular.rs``).

    Datagrams that arrive while the ring is full — or whose length is
    not a multiple of the wire item size (malformed for the format;
    admitting one would shift every later sample's I/Q planes) — are
    dropped WHOLE, so ring content stays item-aligned at all times;
    ``stats()`` reports ``(datagrams, bytes, dropped)``.
    """

    def __init__(
        self,
        bind: str = "127.0.0.1",
        port: int = 0,
        fmt: str = "cf32",
        ring_bytes: int = 1 << 24,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        from futuresdr_tpu.native import (
            IQ_ITEM_BYTES,
            NativeRing,
            NativeUdpReader,
            iq_bytes_to_complex64,
        )

        if fmt not in IQ_ITEM_BYTES:
            raise ValueError(f"unknown IQ format {fmt!r}")
        self.fmt = fmt
        self.is_blocking = True
        self.stream_outputs = [PortSpec("out", np.complex64)]
        self.rate_out = (1,)
        self._item = IQ_ITEM_BYTES[fmt]
        self._to_c64 = iq_bytes_to_complex64
        self._ring = NativeRing(ring_bytes)
        self._reader = NativeUdpReader(
            self._ring, bind, port, item_bytes=self._item
        )
        self._closed = False
        self.message_outputs = ["overflows"]
        self._dropped_seen = 0

    @property
    def bound_port(self) -> int:
        return self._reader.port

    def stats(self):
        return self._reader.stats()

    def close(self) -> None:
        self._closed = True

    @message_handler("stats")
    def _h_stats(self, pmt: Pmt) -> Pmt:
        d, b, drop = self._reader.stats()
        return Pmt({"datagrams": d, "bytes": b, "dropped": drop})

    @message_handler("overflows")
    def _h_overflows(self, pmt: Pmt) -> Pmt:
        """Query the total dropped-datagram count (reference parity:
        seify source.rs:36 — `overflows` returns Pmt::U64)."""
        return Pmt.u64(self._reader.stats()[2])

    def take_overflow_delta(self) -> int:
        """Dropped-datagram growth since the last call (the native ring
        producer drops WHOLE datagrams while full, ringbuf.cpp)."""
        drop = self._reader.stats()[2]
        delta = drop - self._dropped_seen
        self._dropped_seen = drop
        return int(delta)

    def host_produce(self, n: int, port: int = 0):
        if self._closed:
            return None
        delta = self.take_overflow_delta()
        if delta:
            # surfaced as an event, the observable form of the
            # reference's overflow accounting (its actor logs + counts)
            self.post("overflows", Pmt.u64(delta))
        want = n * self._item
        if want > self._ring.capacity // 2:
            # needs headroom past the chunk itself: readable() only
            # reaches `want` if datagrams keep fitting while the consumer
            # drains, so a chunk near capacity stalls forever with the
            # reader dropping every datagram (a 64 KiB datagram must
            # always have room on top of a buffered chunk)
            raise ValueError(
                f"UdpIqSource chunk needs {want} B but ring_bytes is only "
                f"{self._ring.capacity} B — the source would stall forever "
                f"dropping datagrams; construct with ring_bytes >= 2x the "
                f"compiled chunk size ({n} samples x {self._item} B)"
            )
        if self._ring.readable() < want:
            return np.zeros((0,), np.complex64)  # live source: wait
        # the producer only admits item-aligned datagrams, so this read
        # is always an exact multiple of the wire item size
        return self._to_c64(self._ring.read(want), self.fmt)

    def on_finish(self) -> None:
        self._reader.stop()


class BlobToUdp(Block):
    """Message sink: send each received Pmt::Blob as a UDP datagram
    (parity: blob_to_udp.rs:85 — how WLAN RX frames reach wireshark)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0, name=None):
        super().__init__(name)
        self._addr = (host, int(port))
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)

    @message_handler("in")
    def _in(self, pmt: Pmt) -> Pmt:
        v = pmt.to_py()
        if isinstance(v, (bytes, bytearray)):
            self._sock.sendto(bytes(v), self._addr)
        elif isinstance(v, np.ndarray):
            self._sock.sendto(v.tobytes(), self._addr)
        return Pmt.ok()


class WebsocketSink(Block):
    """Stream item chunks to connected WebSocket clients as binary frames
    (parity: websocket_sink.rs:256 — the spectrum/GUI transport).

    ``mode`` mirrors the reference's ``WebsocketSinkMode``:

    - ``"fixed-dropping"`` (default): while a client's previous send is
      still in flight its new chunk is dropped — a slow GUI tab never
      back-pressures the flowgraph (ref ``FixedDropping``).
    - ``"blocking"`` / ``"fixed-blocking"``: ``host_consume`` waits until
      every connected client has received the chunk, back-pressuring the
      graph to the slowest client (ref ``Blocking``/``FixedBlocking``;
      chunks here are already fixed-size, so the two collapse to one
      behavior). A per-chunk ``send_timeout`` bounds the stall so a dead
      client cannot wedge the executor."""

    def __init__(
        self,
        port: int = 9001,
        dtype=np.float32,
        mode: str = "fixed-dropping",
        send_timeout: float = 5.0,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        dt = np.dtype(dtype)
        if mode not in ("fixed-dropping", "blocking", "fixed-blocking"):
            raise ValueError(
                f"WebsocketSink mode must be 'fixed-dropping', 'blocking' or "
                f"'fixed-blocking', got {mode!r}"
            )
        self.stream_inputs = [PortSpec("in", dt)]
        self.rate_in = (1,)
        self.is_blocking = True
        self._dtype = dt
        self._mode = mode
        self._send_timeout = float(send_timeout)
        self.port = port
        self._clients: List = []
        self._loop = None
        self._thread: Optional[threading.Thread] = None
        self._started = threading.Event()
        self._start_server()

    def _start_server(self) -> None:
        import asyncio

        import websockets.asyncio.server as ws_server

        async def handler(conn):
            self._clients.append(conn)
            try:
                await conn.wait_closed()
            finally:
                self._clients.remove(conn)
                # drop the in-flight-send slot too: under client churn the
                # dict would grow one stale Future per past client, and a
                # new client landing on a recycled id() would inherit it
                if hasattr(self, "_pending"):
                    self._pending.pop(id(conn), None)

        async def main():
            async with ws_server.serve(handler, "0.0.0.0", self.port) as srv:
                self._loop = asyncio.get_running_loop()
                for sock in srv.sockets or []:
                    self.port = sock.getsockname()[1]
                self._started.set()
                await asyncio.Future()

        def run():
            try:
                asyncio.run(main())
            except RuntimeError:
                pass

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()
        self._started.wait(timeout=5.0)

    def host_consume(self, arr: np.ndarray, tags, port: int = 0) -> None:
        if not self._clients or self._loop is None:
            return
        import asyncio

        payload = np.ascontiguousarray(arr.astype(self._dtype)).tobytes()
        if not hasattr(self, "_pending"):
            self._pending = {}
        blocking = getattr(self, "_mode", "fixed-dropping") != "fixed-dropping"
        sent = []
        for c in list(self._clients):
            # FixedDropping: while a client's previous send is still in
            # flight, drop this chunk for it — otherwise a slow client
            # queues coroutines without bound
            prev = self._pending.get(id(c))
            if prev is not None and not prev.done():
                if blocking:
                    try:
                        prev.result(timeout=self._send_timeout)
                    except Exception:
                        self._pending.pop(id(c), None)
                        continue
                else:
                    continue
            try:
                fut = asyncio.run_coroutine_threadsafe(c.send(payload), self._loop)
                self._pending[id(c)] = fut
                sent.append((id(c), fut))
            except Exception:
                self._pending.pop(id(c), None)
        if blocking:
            # Blocking/FixedBlocking: the chunk is delivered to every live
            # client before the executor dispatches the next step
            for cid, fut in sent:
                try:
                    fut.result(timeout=self._send_timeout)
                except Exception:
                    self._pending.pop(cid, None)


class WebsocketPmtSink(Block):
    """Message sink forwarding Pmts to WebSocket clients as JSON
    (parity: websocket_pmt_sink.rs:237)."""

    def __init__(self, port: int = 9002, name: Optional[str] = None):
        super().__init__(name)
        self._ws = WebsocketSink.__new__(WebsocketSink)
        Block.__init__(self._ws)
        self._ws._dtype = np.dtype(np.uint8)
        self._ws._clients = []
        self._ws._loop = None
        self._ws._thread = None
        self._ws._started = threading.Event()
        self._ws.port = port
        self._ws._start_server()
        self.port = self._ws.port

    @message_handler("in")
    def _in(self, pmt: Pmt) -> Pmt:
        import asyncio
        import json

        if not self._ws._clients or self._ws._loop is None:
            return Pmt.ok()
        try:
            payload = json.dumps(pmt.to_py(), default=str)
        except TypeError:
            payload = str(pmt.to_py())
        for c in list(self._ws._clients):
            try:
                asyncio.run_coroutine_threadsafe(
                    c.send(payload), self._ws._loop
                )
            except Exception:
                pass
        return Pmt.ok()
