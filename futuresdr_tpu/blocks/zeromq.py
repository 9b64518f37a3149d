"""ZeroMQ stream edges (GNU Radio interop).

Parity: ``src/blocks/zeromq/{pub_sink.rs,sub_source.rs}`` — PUB/SUB sample
streams between processes, wire-compatible with GNU Radio's zeromq blocks
(raw little-endian item bytes per message).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from futuresdr_tpu.runtime.block import Block, PortSpec


class PubSink(Block):
    """Publish item chunks on a ZMQ PUB socket (parity: pub_sink.rs:146)."""

    def __init__(
        self,
        address: str = "tcp://127.0.0.1:*",
        dtype=np.complex64,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        import zmq

        dt = np.dtype(dtype)
        self.stream_inputs = [PortSpec("in", dt)]
        self.rate_in = (1,)
        self.is_blocking = True
        self._dtype = dt
        self._ctx = zmq.Context.instance()
        self._sock = self._ctx.socket(zmq.PUB)
        if address.endswith(":*") or address.endswith(":0"):
            port = self._sock.bind_to_random_port(address.rsplit(":", 1)[0])
            self.address = f"{address.rsplit(':', 1)[0]}:{port}"
        else:
            self._sock.bind(address)
            self.address = address

    def host_consume(self, arr: np.ndarray, tags, port: int = 0) -> None:
        self._sock.send(
            np.ascontiguousarray(arr.astype(self._dtype)).tobytes()
        )

    def on_finish(self) -> None:
        self._sock.close(linger=100)


class SubSource(Block):
    """Subscribe to a ZMQ PUB stream (parity: sub_source.rs:131)."""

    def __init__(
        self,
        address: str,
        dtype=np.complex64,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        import zmq

        dt = np.dtype(dtype)
        self.stream_outputs = [PortSpec("out", dt)]
        self.rate_out = (1,)
        self.is_blocking = True
        self._dtype = dt
        self._ctx = zmq.Context.instance()
        self._sock = self._ctx.socket(zmq.SUB)
        self._sock.connect(address)
        self._sock.setsockopt(zmq.SUBSCRIBE, b"")
        self._sock.rcvtimeo = 50
        self._buf = b""
        self._closed = False

    def close(self) -> None:
        self._closed = True

    def host_produce(self, n: int, port: int = 0):
        import zmq

        if self._closed:
            return None
        want = n * self._dtype.itemsize
        while len(self._buf) < want:
            try:
                self._buf += self._sock.recv()
            except zmq.Again:
                break
        items = len(self._buf) // self._dtype.itemsize
        if items < n:
            return np.zeros((0,), self._dtype)  # wait for a full chunk
        raw = self._buf[: n * self._dtype.itemsize]
        self._buf = self._buf[n * self._dtype.itemsize :]
        return np.frombuffer(raw, dtype=self._dtype)

    def on_finish(self) -> None:
        self._sock.close(linger=0)
