"""Flowgraph blocks wrapping the WLAN modem.

Parity: the rx.rs graph tail (FrameEqualizer → Decoder with ``rx_frames``
message output, examples/wlan/src/bin/rx.rs:96-112) and the TX side's
Encoder/Mapper feeding IQ.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from futuresdr_tpu.blocks.framed import FramedReceiverSink
from futuresdr_tpu.models.wlan.rx import FRAME_WIN, WlanReceiver
from futuresdr_tpu.models.wlan.tx import encode_frame
from futuresdr_tpu.runtime.block import Block, PortSpec, message_handler
from futuresdr_tpu.types.pmt import Pmt


class WlanRxSink(FramedReceiverSink):
    """IQ sink running the full 802.11 receiver; decoded PSDUs post on the
    ``rx_frames`` message port as Pmt blobs (decoder.rs parity). One
    instantiation of :class:`FramedReceiverSink` (overlap = the longest
    frame window)."""

    def __init__(
        self,
        process_size: int = 1 << 17,
        name: Optional[str] = None,
    ):
        super().__init__(
            WlanReceiver(),
            overlap=FRAME_WIN,
            process_size=process_size,
            emit=lambda f: Pmt.blob(f.psdu) if f.crc_ok else None,
            port_name="rx_frames",
            name=name,
        )


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
        elif (
            isinstance(data, (tuple, list))
            and len(data) == 2
            and isinstance(data[0], (bytes, bytearray))
        ):
            # (psdu, mcs) pair — the form WlanMac forwards when the
            # caller picked a per-frame MCS (mac.rs:58-74)
            self.send(bytes(data[0]), mcs=data[1])
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
