"""Meshtastic layer on the LoRa PHY.

Parity: ``examples/lora/src/meshtastic.rs`` — modem presets
(``meshtastic.rs:115-245``), the 16-byte ``MeshPacket`` radio header
(``meshtastic.rs:394-415``), per-channel AES-CTR payload crypto with
IV = packet_id‖sender (``meshtastic.rs:474-491, 529-543``), the
channel-hash key selection (``meshtastic.rs:438-472``), and the
protobuf ``Data`` envelope (portnum + payload,
``meshtastic.rs:492-506, 514-525``).

Everything here is host-side packet plumbing (bytes in, bytes out); the
signal path is the shared TPU LoRa PHY (:mod:`.phy`) configured with the
Meshtastic sync word 0x2B (``utils.rs:422``). AES runs in pure Python —
packets are tens of bytes, so table lookups dominate nothing.
"""

from __future__ import annotations

import base64
import struct
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

from futuresdr_tpu.models.lora.phy import LoraConfig

MESHTASTIC_SYNC_WORD = 0x2B  # utils.rs:422

# The well-known default LongFast key ("AQ==" expands to this;
# meshtastic.rs:25-27)
DEFAULT_KEY = bytes(
    [
        0xD4, 0xF1, 0xBB, 0x3A, 0x20, 0x29, 0x07, 0x59,
        0xF0, 0xBC, 0xFF, 0xAB, 0xCF, 0x4E, 0x69, 0x01,
    ]
)


@dataclass(frozen=True)
class ModemPreset:
    """One named modem config (meshtastic.rs:115-245). ``cr`` uses the
    PHY convention 1..4 → 4/5..4/8; ``bw`` in Hz."""

    bw: int
    sf: int
    cr: int
    freq: int
    ldro: bool

    def phy(self, preamble_len: int = 8) -> LoraConfig:
        return LoraConfig(
            sf=self.sf,
            cr=self.cr,
            preamble_len=preamble_len,
            sync_word=MESHTASTIC_SYNC_WORD,
            has_crc=True,
            ldro=self.ldro,
        )


_EU = 869_525_000
_EU_SLOW = 869_587_500
_US = 906_875_000
_US_SLOW = 904_437_500

PRESETS: Dict[str, ModemPreset] = {
    "SHORT_FAST_EU": ModemPreset(250_000, 7, 1, _EU, False),
    "SHORT_SLOW_EU": ModemPreset(250_000, 8, 1, _EU, False),
    "MEDIUM_FAST_EU": ModemPreset(250_000, 9, 1, _EU, False),
    "MEDIUM_SLOW_EU": ModemPreset(250_000, 10, 1, _EU, False),
    "LONG_FAST_EU": ModemPreset(250_000, 11, 1, _EU, False),
    "LONG_MODERATE_EU": ModemPreset(125_000, 11, 4, _EU_SLOW, True),
    "LONG_SLOW_EU": ModemPreset(125_000, 12, 4, _EU_SLOW, True),
    "VERY_LONG_SLOW_EU": ModemPreset(62_500, 12, 4, 869_492_500, True),
    "SHORT_TURBO_US": ModemPreset(500_000, 7, 1, _US, False),
    "SHORT_FAST_US": ModemPreset(250_000, 7, 1, _US, False),
    "SHORT_SLOW_US": ModemPreset(250_000, 8, 1, _US, False),
    "MEDIUM_FAST_US": ModemPreset(250_000, 9, 1, _US, False),
    "MEDIUM_SLOW_US": ModemPreset(250_000, 10, 1, _US, False),
    "LONG_TURBO_US": ModemPreset(500_000, 11, 1, _US, False),
    "LONG_FAST_US": ModemPreset(250_000, 11, 1, _US, False),
    "LONG_MODERATE_US": ModemPreset(125_000, 11, 4, _US_SLOW, True),
    "LONG_SLOW_US": ModemPreset(125_000, 12, 4, _US_SLOW, True),
    "VERY_LONG_SLOW_US": ModemPreset(62_500, 12, 4, 916_218_750, True),
}


# ---------------------------------------------------------------------------
# AES (pure python, encrypt-only — CTR needs nothing else)
# ---------------------------------------------------------------------------


def _aes_tables():
    exp = [0] * 510
    log = [0] * 256
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        # multiply by the generator 3 = x·2 ⊕ x in GF(2^8)/0x11B
        x ^= ((x << 1) ^ (0x1B if x & 0x80 else 0)) & 0xFF
    for i in range(255, 510):
        exp[i] = exp[i - 255]
    sbox = [0] * 256
    for i in range(256):
        inv = 0 if i == 0 else exp[255 - log[i]]
        b, r = inv, inv
        for _ in range(4):
            b = ((b << 1) | (b >> 7)) & 0xFF
            r ^= b
        sbox[i] = r ^ 0x63
    return exp, log, sbox


_EXP, _LOG, _SBOX = _aes_tables()


def _xtime(a: int) -> int:
    return ((a << 1) ^ (0x1B if a & 0x80 else 0)) & 0xFF


def _expand_key(key: bytes) -> List[List[int]]:
    nk = len(key) // 4
    nr = nk + 6
    w = [list(key[4 * i : 4 * i + 4]) for i in range(nk)]
    rcon = 1
    for i in range(nk, 4 * (nr + 1)):
        t = list(w[i - 1])
        if i % nk == 0:
            t = [_SBOX[t[1]], _SBOX[t[2]], _SBOX[t[3]], _SBOX[t[0]]]
            t[0] ^= rcon
            rcon = _xtime(rcon)
        elif nk > 6 and i % nk == 4:
            t = [_SBOX[b] for b in t]
        w.append([a ^ b for a, b in zip(w[i - nk], t)])
    return w


def _encrypt_block(w: List[List[int]], block: bytes) -> bytes:
    nr = len(w) // 4 - 1
    s = [list(block[4 * c : 4 * c + 4]) for c in range(4)]  # column-major

    def add_round_key(rnd):
        for c in range(4):
            for r in range(4):
                s[c][r] ^= w[4 * rnd + c][r]

    def sub_shift():
        # SubBytes + ShiftRows fused, on column-major state
        t = [[_SBOX[s[c][r]] for r in range(4)] for c in range(4)]
        for c in range(4):
            for r in range(4):
                s[c][r] = t[(c + r) % 4][r]

    def mix_columns():
        for c in range(4):
            a = s[c]
            t = a[0] ^ a[1] ^ a[2] ^ a[3]
            u = a[0]
            a[0] ^= t ^ _xtime(a[0] ^ a[1])
            a[1] ^= t ^ _xtime(a[1] ^ a[2])
            a[2] ^= t ^ _xtime(a[2] ^ a[3])
            a[3] ^= t ^ _xtime(a[3] ^ u)

    add_round_key(0)
    for rnd in range(1, nr):
        sub_shift()
        mix_columns()
        add_round_key(rnd)
    sub_shift()
    add_round_key(nr)
    return bytes(s[c][r] for c in range(4) for r in range(4))


def aes_ctr64be(key: bytes, iv: bytes, data: bytes) -> bytes:
    """AES-CTR with a big-endian 64-bit counter in the low half of the
    block (RustCrypto ``Ctr64BE`` semantics, meshtastic.rs:22-23).
    Symmetric: applies the keystream, so encrypt == decrypt."""
    if len(key) not in (16, 32):
        raise ValueError("AES key must be 16 or 32 bytes")
    if len(iv) != 16:
        raise ValueError("IV must be 16 bytes")
    w = _expand_key(key)
    nonce = iv[:8]
    ctr0 = int.from_bytes(iv[8:], "big")
    out = bytearray()
    i = 0
    while len(out) < len(data):
        blk = nonce + ((ctr0 + i) & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "big")
        out += _encrypt_block(w, blk)
        i += 1
    return bytes(x ^ k for x, k in zip(data, out))


# ---------------------------------------------------------------------------
# protobuf Data envelope (minimal: the two fields the reference uses)
# ---------------------------------------------------------------------------


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        out.append(b | (0x80 if v else 0))
        if not v:
            return bytes(out)


def _read_varint(b: bytes, i: int) -> Tuple[int, int]:
    v, shift = 0, 0
    while True:
        if i >= len(b):
            raise ValueError("truncated varint")
        c = b[i]
        i += 1
        v |= (c & 0x7F) << shift
        shift += 7
        if not c & 0x80:
            return v, i


def encode_data_pb(portnum: int, payload: bytes) -> bytes:
    """meshtastic.protobufs.Data with portnum + payload
    (meshtastic.rs:514-525; other fields stay at their defaults and are
    omitted, which is canonical proto3)."""
    out = b""
    if portnum:
        out += b"\x08" + _varint(portnum)
    if payload:
        out += b"\x12" + _varint(len(payload)) + payload
    return out


def decode_data_pb(b: bytes) -> Optional[Dict[str, object]]:
    """Parse the Data envelope; returns None on malformed input (the
    reference treats decode failure as 'wrong channel/key')."""
    portnum, payload = 0, b""
    i = 0
    try:
        while i < len(b):
            tag, i = _read_varint(b, i)
            fieldno, wt = tag >> 3, tag & 7
            if wt == 0:
                v, i = _read_varint(b, i)
                if fieldno == 1:
                    portnum = v
            elif wt == 2:
                n, i = _read_varint(b, i)
                if i + n > len(b):
                    return None
                if fieldno == 2:
                    payload = b[i : i + n]
                i += n
            elif wt == 5:
                i += 4
            elif wt == 1:
                i += 8
            else:
                return None
        if i != len(b):
            return None
    except ValueError:
        return None
    return {"portnum": portnum, "payload": payload}


# ---------------------------------------------------------------------------
# MeshPacket + channels
# ---------------------------------------------------------------------------

PORTNUM_TEXT_MESSAGE = 1


@dataclass
class MeshPacket:
    """The 16-byte little-endian radio header + encrypted payload
    (meshtastic.rs:394-415)."""

    dest: int
    sender: int
    packet_id: int
    flags: int
    channel_hash: int
    reserved: int
    data: bytes

    @classmethod
    def from_bytes(cls, b: bytes) -> "MeshPacket":
        if len(b) < 16:
            raise ValueError("MeshPacket shorter than its 16-byte header")
        dest, sender, pid, flags, ch, rsv = struct.unpack("<IIIBBH", b[:16])
        return cls(dest, sender, pid, flags, ch, rsv, bytes(b[16:]))

    def to_bytes(self) -> bytes:
        return (
            struct.pack(
                "<IIIBBH",
                self.dest & 0xFFFFFFFF,
                self.sender & 0xFFFFFFFF,
                self.packet_id & 0xFFFFFFFF,
                self.flags & 0xFF,
                self.channel_hash & 0xFF,
                self.reserved & 0xFFFF,
            )
            + self.data
        )

    def iv(self) -> bytes:
        """packet_id‖sender, each as a little-endian u64
        (meshtastic.rs:476-479)."""
        return struct.pack("<QQ", self.packet_id, self.sender)


class MeshtasticChannel:
    """Named channel with its AES key; hash = xor of name and key bytes
    (meshtastic.rs:438-472)."""

    def __init__(self, name: str, key_b64: str):
        key = base64.b64decode(key_b64)
        if key == b"\x01":
            key = DEFAULT_KEY
        if len(key) not in (16, 32):
            raise ValueError(
                "wrong key (base64-encoded 1/16/32 bytes expected)"
            )
        self.key = key
        hash_name = name if name and name != "\n" else "\n"
        self.name = name if name and name != "\n" else "<unset>"
        h = 0
        for b in hash_name.encode():
            h ^= b
        for b in key:
            h ^= b
        self.hash = h

    def decode(self, packet: MeshPacket) -> Optional[Dict[str, object]]:
        """Decrypt + parse; None when the protobuf doesn't parse (wrong
        key)."""
        clear = aes_ctr64be(self.key, packet.iv(), packet.data)
        msg = decode_data_pb(clear)
        if msg is None:
            return None
        msg["channel"] = self.name
        msg["sender"] = packet.sender
        if msg["portnum"] == PORTNUM_TEXT_MESSAGE:
            msg["text"] = bytes(msg["payload"]).decode("utf-8", "replace")
        return msg

    def encode(
        self,
        text: str,
        sender: int = 0x3A48290E,
        dest: int = 0xFFFFFFFF,
        packet_id: int = 0,
    ) -> bytes:
        """Text message → encrypted MeshPacket bytes ready for the LoRa
        PHY (meshtastic.rs:509-553)."""
        clear = encode_data_pb(PORTNUM_TEXT_MESSAGE, text.encode())
        pkt = MeshPacket(
            dest=dest,
            sender=sender,
            packet_id=packet_id,
            flags=0,
            channel_hash=self.hash,
            reserved=0,
            data=b"",
        )
        pkt.data = aes_ctr64be(self.key, pkt.iv(), clear)
        return pkt.to_bytes()


class MeshtasticChannels:
    """Channel list; tries hash-matching channels first, then the
    default (meshtastic.rs:557-580)."""

    def __init__(self):
        self.channels: List[MeshtasticChannel] = [
            MeshtasticChannel("", "AQ==")
        ]

    def add_channel(self, chan: MeshtasticChannel) -> None:
        self.channels.append(chan)

    def decode(self, frame: bytes) -> Optional[Dict[str, object]]:
        pkt = MeshPacket.from_bytes(frame)
        for chan in self.channels:
            if pkt.channel_hash == chan.hash:
                msg = chan.decode(pkt)
                if msg is not None:
                    return msg
        return self.channels[0].decode(pkt)
