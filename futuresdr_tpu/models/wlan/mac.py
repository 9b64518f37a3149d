"""802.11 MAC framing (parity: ``examples/wlan/src/mac.rs``).

The reference's ``Mac`` block wraps payload blobs into MAC data frames:
a 24-byte header (frame control 0x0008, zero duration, the three
addresses laid out src→dst→bssid exactly as ``mac.rs:20-26`` writes
them), a 12-bit sequence number shifted into byte 22 (``mac.rs:86``),
the payload, and a trailing little-endian CRC32 FCS (``mac.rs:99-101``).
The FCS makes the PSDU satisfy the receiver's CRC32-residue check.
"""

from __future__ import annotations

import zlib
from typing import Optional

from futuresdr_tpu.runtime.block import Block, message_handler
from futuresdr_tpu.types.pmt import Pmt
from futuresdr_tpu.utils import logger

MAX_PAYLOAD_SIZE = 1500  # lib.rs:43
MAX_PSDU_SIZE = MAX_PAYLOAD_SIZE + 28  # MAC header + FCS, lib.rs:44


def mac_data_frame(
    payload: bytes,
    sequence: int,
    src: bytes = b"\x42\x42\x42\x42\x42\x42",
    dst: bytes = b"\x23\x23\x23\x23\x23\x23",
    bssid: bytes = b"\xff\xff\xff\xff\xff\xff",
) -> bytes:
    """Payload → complete PSDU (header + payload + FCS), mac.rs:85-104."""
    if len(payload) > MAX_PAYLOAD_SIZE:
        raise ValueError(
            f"payload {len(payload)} exceeds MAX_PAYLOAD_SIZE "
            f"{MAX_PAYLOAD_SIZE}"
        )
    if len(src) != 6 or len(dst) != 6 or len(bssid) != 6:
        raise ValueError("MAC addresses must be 6 bytes")
    hdr = (
        (0x0008).to_bytes(2, "little")  # frame control: data frame
        + (0x0000).to_bytes(2, "little")  # duration
        + src
        + dst
        + bssid
        + (((sequence & 0xFFF) << 4) & 0xFFFF).to_bytes(2, "little")
    )
    body = hdr + payload
    fcs = (zlib.crc32(body) & 0xFFFFFFFF).to_bytes(4, "little")
    return body + fcs


def parse_mac_frame(psdu: bytes) -> Optional[dict]:
    """PSDU → header fields + payload (None if too short); the FCS is
    assumed already checked by the receiver's residue test."""
    if len(psdu) < 28:
        return None
    return {
        "frame_control": int.from_bytes(psdu[0:2], "little"),
        "duration": int.from_bytes(psdu[2:4], "little"),
        "src": psdu[4:10],
        "dst": psdu[10:16],
        "bssid": psdu[16:22],
        "sequence": int.from_bytes(psdu[22:24], "little") >> 4,
        "payload": psdu[24:-4],
    }


class WlanMac(Block):
    """Message-port MAC framer: ``tx`` handler takes a payload blob (or
    ``(blob, mcs)`` pair), posts the framed PSDU on the ``tx_frames``
    output (mac.rs:34-83). Oversized payloads are dropped with a
    warning, as in the reference."""

    def __init__(
        self,
        src: bytes = b"\x42\x42\x42\x42\x42\x42",
        dst: bytes = b"\x23\x23\x23\x23\x23\x23",
        bssid: bytes = b"\xff\xff\xff\xff\xff\xff",
        name: Optional[str] = None,
    ):
        super().__init__(name)
        self.message_outputs = ["tx_frames"]
        self.src, self.dst, self.bssid = bytes(src), bytes(dst), bytes(bssid)
        self.sequence = 0

    def frame(self, payload: bytes) -> bytes:
        psdu = mac_data_frame(
            payload, self.sequence, self.src, self.dst, self.bssid
        )
        self.sequence = (self.sequence + 1) % (1 << 12)
        return psdu

    @message_handler("tx")
    def _tx(self, pmt: Pmt) -> Pmt:
        val = pmt.to_py()
        mcs: Optional[str] = None
        if (
            isinstance(val, (tuple, list))
            and len(val) == 2
            and isinstance(val[0], (bytes, bytearray))
        ):
            val, mcs = val[0], val[1]
        if not isinstance(val, (bytes, bytearray)):
            logger.warning("WlanMac: wrong Pmt type in tx handler")
            return Pmt.null()
        if len(val) > MAX_PAYLOAD_SIZE:
            logger.warning(
                "WlanMac: TX frame too large (%d, max %d). Dropping.",
                len(val),
                MAX_PAYLOAD_SIZE,
            )
            return Pmt.null()
        psdu = self.frame(bytes(val))
        out: object = psdu if mcs is None else (psdu, mcs)
        self.post(
            "tx_frames",
            Pmt.blob(psdu) if mcs is None else Pmt.from_py(out),
        )
        return Pmt.null()
