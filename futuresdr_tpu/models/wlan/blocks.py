"""Flowgraph blocks wrapping the WLAN modem.

Parity: the rx.rs graph tail (FrameEqualizer → Decoder with ``rx_frames``
message output, examples/wlan/src/bin/rx.rs:96-112) and the TX side's
Encoder/Mapper feeding IQ.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from futuresdr_tpu.models.wlan.rx import FRAME_WIN, RxFrame, WlanReceiver
from futuresdr_tpu.models.wlan.tx import encode_frame
from futuresdr_tpu.runtime.block import Block, PortSpec, message_handler
from futuresdr_tpu.types.pmt import Pmt


class WlanRxSink(Block):
    """IQ sink running the full 802.11 receiver; decoded PSDUs post on the
    ``rx_frames`` message port as Pmt blobs (decoder.rs parity)."""

    def __init__(
        self,
        process_size: int = 1 << 17,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        self.stream_inputs = [PortSpec("in", np.complex64)]
        self.rate_in = (1,)
        self.is_blocking = True
        self.message_outputs = ["rx_frames"]
        self.rx = WlanReceiver()
        self.process_size = int(process_size)
        self._buf = np.zeros(0, np.complex64)
        self._abs = 0  # absolute index of _buf[0]
        self._emitted = set()
        self.frames: List[RxFrame] = []

    def _run(self, final: bool = False) -> None:
        while len(self._buf) >= self.process_size or (
            final and len(self._buf) > 0
        ):
            take = (
                len(self._buf)
                if final
                else min(len(self._buf), self.process_size + FRAME_WIN)
            )
            chunk = self._buf[:take]
            for f in self.rx.process(chunk):
                key = self._abs + f.start
                if key in self._emitted:
                    continue
                self._emitted.add(key)
                self.frames.append(f)
                if f.crc_ok:
                    self.post("rx_frames", Pmt.blob(f.psdu))
            # keep FRAME_WIN overlap so straddling frames complete next call
            advance = max(0, take - FRAME_WIN) if not final else take
            if advance == 0:
                break
            self._buf = self._buf[advance:]
            self._abs += advance
            if final:
                break

    def host_consume(self, arr: np.ndarray, tags, port: int = 0) -> None:
        self._buf = np.concatenate([self._buf, arr])
        self._run(final=False)

    def on_finish(self) -> None:
        self._run(final=True)


class WlanTxSource(Block):
    """IQ source encoding queued PSDUs (Encoder+Mapper+Prefix parity).

    Feed PSDUs via the ``tx`` message handler (Pmt blob) or
    :meth:`send`; emits silence between frames."""

    def __init__(
        self,
        mcs: str = "bpsk12",
        gap: int = 2000,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        self.stream_outputs = [PortSpec("out", np.complex64)]
        self.rate_out = (1,)
        self.mcs = mcs
        self.gap = int(gap)
        self._pending = np.zeros(0, np.complex64)
        self._seed = 1

    @message_handler("tx")
    def _tx(self, pmt: Pmt) -> Pmt:
        data = pmt.to_py()
        if isinstance(data, (bytes, bytearray)):
            self.send(bytes(data))
        return Pmt.ok()

    def send(self, psdu: bytes, mcs: Optional[str] = None) -> None:
        iq = encode_frame(psdu, mcs or self.mcs, scrambler_seed=self._seed)
        self._seed = self._seed % 127 + 1
        self._pending = np.concatenate(
            [self._pending, iq, np.zeros(self.gap, np.complex64)]
        )

    def host_produce(self, n: int, port: int = 0):
        if len(self._pending) == 0:
            return np.zeros(n, np.complex64)
        out = self._pending[:n]
        self._pending = self._pending[n:]
        if len(out) < n:
            out = np.concatenate([out, np.zeros(n - len(out), np.complex64)])
        return out
