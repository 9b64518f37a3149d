"""RFtap + LoRatap encapsulation for Wireshark (parity:
examples/lora/src/decoder.rs:87-104 — each CRC-clean payload is posted
as an RFtap blob; piped through ``BlobToUdp`` it lands in Wireshark's
LoRatap dissector, DLT 270).

Layout (byte-exact vs the reference):

* RFtap header (12 B): ``"RFta"``, u16le length-in-words (3), u16le
  flags (1 = DLT present), u32le DLT (270 = LORATAP).
* LoRatap v0 header (15 B): version, padding, u16be header length (15),
  u32be frequency Hz, bandwidth index, spreading factor, packet/max/
  current RSSI, net-id byte, sync word.
* payload: the dewhitened LoRa frame bytes.
"""

from __future__ import annotations

import struct
from typing import Callable, Optional

from futuresdr_tpu.types.pmt import Pmt

LORATAP_DLT = 270


def rftap_encapsulate(
    payload: bytes,
    frequency_hz: int = 868_100_000,
    bandwidth: int = 1,
    sf: int = 7,
    sync_word: int = 0x12,
    packet_rssi: int = 0,
    max_rssi: int = 0,
    current_rssi: int = 0,
) -> bytes:
    """One frame payload → RFtap blob (decoder.rs:87-104 byte layout)."""
    head = bytearray(27)
    head[0:4] = b"RFta"
    head[4:6] = struct.pack("<H", 3)  # header length in 32-bit words
    head[6:8] = struct.pack("<H", 1)  # flags: DLT field present
    head[8:12] = struct.pack("<I", LORATAP_DLT)
    head[12] = 0  # LoRatap version
    head[13] = 0  # padding
    head[14:16] = struct.pack(">H", 15)  # LoRatap header length
    head[16:20] = struct.pack(">I", int(frequency_hz))
    head[20] = int(bandwidth) & 0xFF
    head[21] = int(sf) & 0xFF
    head[22] = int(packet_rssi) & 0xFF
    head[23] = int(max_rssi) & 0xFF
    head[24] = int(current_rssi) & 0xFF
    head[25] = 0
    head[26] = int(sync_word) & 0xFF
    return bytes(head) + bytes(payload)


def rftap_emit(
    frequency_hz: int = 868_100_000,
    bandwidth: int = 1,
    sf: int = 7,
    sync_word: int = 0x12,
) -> Callable:
    """``emit=`` adapter for :class:`~futuresdr_tpu.blocks.framed.\
FramedReceiverSink`: CRC-clean frames become RFtap ``Pmt`` blobs, ready
    to wire into ``BlobToUdp`` for live Wireshark capture (the
    reference's ``rftap`` message port)."""

    def emit(frame) -> Optional[Pmt]:
        if not getattr(frame, "crc_ok", True):
            return None
        # same payload fallback chain as FramedReceiverSink's default
        # emit (blocks/framed.py) so psdu-style frames work too
        data = getattr(frame, "payload", None)
        if data is None:
            data = getattr(frame, "psdu", None)
        if data is None:
            data = getattr(frame, "data", None)
        if data is None:
            return None  # nothing to encapsulate: skip, don't emit junk
        return Pmt.blob(
            rftap_encapsulate(
                bytes(data),
                frequency_hz=frequency_hz,
                bandwidth=bandwidth,
                sf=sf,
                sync_word=sync_word,
            )
        )

    return emit
