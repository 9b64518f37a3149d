"""Meshtastic layer (parity: examples/lora/src/meshtastic.rs) — packet
crypto, channel hashing, protobuf envelope, and full PHY loopback with
the 0x2B sync word and LDRO presets."""

import base64

import numpy as np
import pytest

from futuresdr_tpu.models.lora import LoraReceiver, modulate_frame
from futuresdr_tpu.models.lora.meshtastic import (
    DEFAULT_KEY,
    PRESETS,
    MeshPacket,
    MeshtasticChannel,
    MeshtasticChannels,
    _encrypt_block,
    _expand_key,
    aes_ctr64be,
    decode_data_pb,
    encode_data_pb,
)


def test_aes_fips197_vectors():
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    assert (
        _encrypt_block(_expand_key(bytes(range(16))), pt).hex()
        == "69c4e0d86a7b0430d8cdb78070b4c55a"
    )
    assert (
        _encrypt_block(_expand_key(bytes(range(32))), pt).hex()
        == "8ea2b7ca516745bfeafc49904b496089"
    )


def test_ctr_keystream_symmetric():
    key, iv = bytes(range(16)), bytes(range(16))
    msg = bytes(range(100))
    enc = aes_ctr64be(key, iv, msg)
    assert enc != msg
    assert aes_ctr64be(key, iv, enc) == msg


def test_protobuf_envelope_roundtrip():
    b = encode_data_pb(1, b"hi mesh")
    d = decode_data_pb(b)
    assert d == {"portnum": 1, "payload": b"hi mesh"}
    assert decode_data_pb(b"\xff\xff\xff") is None  # malformed


def test_default_key_expansion():
    # "AQ==" (the single byte 0x01) expands to the well-known key
    ch = MeshtasticChannel("LongFast", "AQ==")
    assert ch.key == DEFAULT_KEY


def test_packet_header_layout():
    ch = MeshtasticChannel("LongFast", "AQ==")
    frame = ch.encode("x", sender=0x3A48290E, dest=0xFFFFFFFF, packet_id=7)
    pkt = MeshPacket.from_bytes(frame)
    assert pkt.dest == 0xFFFFFFFF
    assert pkt.sender == 0x3A48290E
    assert pkt.packet_id == 7
    assert pkt.channel_hash == ch.hash
    assert pkt.to_bytes() == frame


def test_channel_decode_and_key_mismatch():
    chans = MeshtasticChannels()
    secret = MeshtasticChannel(
        "Private", base64.b64encode(bytes(range(16, 32))).decode()
    )
    chans.add_channel(secret)
    frame = secret.encode("secret msg", sender=0xABCD, packet_id=3)
    msg = chans.decode(frame)
    assert msg is not None and msg["text"] == "secret msg"
    assert msg["channel"] == "Private"
    # a receiver WITHOUT the key must not produce the cleartext
    plain = MeshtasticChannels()
    other = plain.decode(frame)
    assert other is None or other.get("text") != "secret msg"


@pytest.mark.parametrize(
    "preset", ["SHORT_FAST_EU", "LONG_SLOW_EU"]
)  # non-LDRO sf7 + LDRO sf12
def test_meshtastic_phy_loopback(preset):
    p = PRESETS[preset]
    cfg = p.phy()
    assert cfg.sync_word == 0x2B
    ch = MeshtasticChannel("LongFast", "AQ==")
    frame_bytes = ch.encode("over the air", sender=0x11223344, packet_id=9)
    iq = modulate_frame(cfg, frame_bytes)
    pad = np.zeros(4 * cfg.n, np.complex64)
    rx = LoraReceiver(cfg)
    frames = rx.process(np.concatenate([pad, iq, pad]))
    assert len(frames) == 1 and frames[0].crc_ok
    chans = MeshtasticChannels()
    msg = chans.decode(frames[0].payload)
    assert msg is not None and msg["text"] == "over the air"
    assert msg["sender"] == 0x11223344


def test_standard_lora_rejects_meshtastic_sync():
    """A 0x12-network receiver must not decode 0x2B frames
    (frame_sync sync-word discrimination, utils.rs:422)."""
    from futuresdr_tpu.models.lora import LoraConfig

    p = PRESETS["SHORT_FAST_EU"]
    iq = modulate_frame(p.phy(), b"\x00" * 20)
    pad = np.zeros(4 * (1 << p.sf), np.complex64)
    rx = LoraReceiver(LoraConfig(sf=p.sf, cr=p.cr, sync_word=0x12))
    assert rx.process(np.concatenate([pad, iq, pad])) == []
