"""Reusable framed-receiver sink: the variable-rate RX pattern.

Every packet modem in the reference (wlan/lora/zigbee/adsb/m17) is a
chain of rate-adaptive blocks driven by ``ComputationStatus`` back-
pressure. The TPU-native shape is different and shared: a **device
front-end** computes batched fixed-shape metrics/transforms inside the
receiver's ``process``, and a **host back-end** segments frames with a
byte/sample state machine. This block packages the host side once:

* overlap-buffered chunking (frames straddling chunk boundaries are
  seen whole on the next call),
* absolute-position dedup (the same frame found in two overlapping
  windows emits once),
* a ``frames`` message port posting each decoded frame as a Pmt.

Any object with ``process(np_chunk) -> list`` where frames carry an
optional ``.start`` (chunk-relative sample index) plugs in — the
shipped :class:`~futuresdr_tpu.models.wlan.blocks.WlanRxSink` is one
instantiation.
"""

from __future__ import annotations

from typing import Any, Callable, List, Optional

import numpy as np

from futuresdr_tpu.runtime.block import Block, PortSpec
from futuresdr_tpu.types.pmt import Pmt


def _default_emit(frame: Any) -> Optional[Pmt]:
    """Post the frame's payload blob when its CRC (if any) passed."""
    if getattr(frame, "crc_ok", True) is False:
        return None
    data = getattr(frame, "payload", None)
    if data is None:
        data = getattr(frame, "psdu", None)
    if data is None:
        return None
    return Pmt.blob(bytes(data))


class FramedReceiverSink(Block):
    """Stream sink running a frame-oriented receiver over an
    overlap-buffered window.

    Parameters
    ----------
    receiver:
        object with ``process(chunk) -> list`` and (optionally) a
        ``frames`` list attribute.
    overlap:
        samples kept between windows; must cover the longest frame so a
        straddling frame completes in the next window.
    process_size:
        window advance per ``process`` call (device programs compile
        once for this size + overlap).
    emit:
        ``frame -> Optional[Pmt]`` posted on the message port
        (default: payload blob of CRC-clean frames).
    port_name:
        message output port name (default ``"frames"``).
    dedup_tolerance:
        two detections whose absolute starts differ by at most this many
        samples count as the same frame (re-detections in overlapping
        windows can jitter by a few samples); 0 = exact-match dedup.
    valid_from:
        optional ``(block, aux_key)``: before buffering each chunk, trim
        it to ``int(block.last_aux[aux_key])`` items — the host half of
        the fixed-capacity + valid-count pattern used by variable-rate
        device blocks (e.g. :class:`~futuresdr_tpu.blocks.ClockRecoveryMM`
        exposes ``mm_valid``).
    """

    def __init__(
        self,
        receiver: Any,
        overlap: int,
        process_size: int = 1 << 17,
        dtype=np.complex64,
        emit: Callable[[Any], Optional[Pmt]] = _default_emit,
        port_name: str = "frames",
        dedup_tolerance: int = 0,
        valid_from=None,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        self.stream_inputs = [PortSpec("in", dtype)]
        self.rate_in = (1,)
        self.is_blocking = True
        self.message_outputs = [port_name]
        self.rx = receiver
        self.overlap = int(overlap)
        self.process_size = int(process_size)
        self._emit = emit
        self._port_name = port_name
        self._buf = np.zeros(0, np.dtype(dtype))
        self._abs = 0  # absolute index of _buf[0]
        self.dedup_tolerance = int(dedup_tolerance)
        self.valid_from = valid_from
        self._emitted = set()
        self.frames: List[Any] = []

    def _run(self, final: bool = False) -> None:
        # Re-detections can only land inside the current overlap window, so
        # dedup keys behind _buf[0] can never match again — prune them to keep
        # memory and the tolerance scan bounded on long-running live graphs.
        if self._emitted:
            floor = self._abs - self.dedup_tolerance
            self._emitted = {k for k in self._emitted if k >= floor}
        while len(self._buf) >= self.process_size or (
            final and len(self._buf) > 0
        ):
            take = (
                len(self._buf)
                if final
                else min(len(self._buf), self.process_size + self.overlap)
            )
            chunk = self._buf[:take]
            for f in self.rx.process(chunk):
                key = getattr(f, "start", None)
                if key is not None:
                    key = self._abs + key
                    tol = self.dedup_tolerance
                    if key in self._emitted or (
                        tol
                        and any(
                            abs(key - k) <= tol for k in self._emitted
                        )
                    ):
                        continue
                    self._emitted.add(key)
                self.frames.append(f)
                pmt = self._emit(f)
                if pmt is not None:
                    self.post(self._port_name, pmt)
            advance = max(0, take - self.overlap) if not final else take
            if advance == 0:
                break
            self._buf = self._buf[advance:]
            self._abs += advance
            if final:
                break

    def host_consume(self, arr: np.ndarray, tags, port: int = 0) -> None:
        if self.valid_from is not None:
            blk, key = self.valid_from
            n = blk.last_aux.get(key)
            if n is not None:
                arr = arr[..., : int(n)]
        self._buf = np.concatenate([self._buf, arr])
        self._run(final=False)

    def on_finish(self) -> None:
        self._run(final=True)
