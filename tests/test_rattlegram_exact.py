"""Byte-exact rattlegram wire-format codec (models/rattlegram/exact.py).

Validates the exact reference frame format (encoder.rs): primitive
sequence generators, the systematic polar property, CRC conventions, and
end-to-end decode across modes / carriers / noise.
"""

import numpy as np
import pytest

from futuresdr_tpu.models.rattlegram.exact import (
    CODE_LEN,
    EXTENDED_LENGTH,
    GUARD_LENGTH,
    ExactDecoder,
    Mls,
    Xorshift32,
    _frozen_bool,
    crc16_rg,
    crc32_rg,
    encode_exact,
    polar_encode_exact,
)


class TestPrimitives:
    def test_mls_period_127(self):
        m = Mls(0b10001001)
        seq = [m.next() for _ in range(254)]
        # maximum-length: period 127, balanced (64 ones in a period)
        assert seq[:127] == seq[127:]
        assert sum(seq[:127]) == 64

    def test_mls_period_255(self):
        m = Mls(0b100101011)
        seq = [m.next() for _ in range(510)]
        assert seq[:255] == seq[255:]
        assert sum(seq[:255]) == 128

    def test_xorshift32_reference_sequence(self):
        # y0=2463534242; first outputs of Marsaglia's xorshift32 (13,17,5)
        x = Xorshift32()
        assert [x.next() for _ in range(3)] == [
            723471715,
            2497366906,
            2064144800,
        ]

    def test_crc_reflection_involution(self):
        # appending the (LSB-first) CRC of a message must give residue 0
        msg = bytes(range(40))
        c = crc32_rg(msg)
        full = msg + c.to_bytes(4, "little")
        assert crc32_rg(full) == 0
        c16 = crc16_rg(msg)
        assert crc16_rg(msg + c16.to_bytes(2, "little")) == 0


class TestPolarExact:
    @pytest.mark.parametrize("mode,info", [(16, 712), (15, 1056), (14, 1392)])
    def test_frozen_table_counts(self, mode, info):
        fr = _frozen_bool(mode)
        assert len(fr) == CODE_LEN
        assert int((~fr).sum()) == info  # data_bits + 32 CRC

    def test_systematic_property(self):
        """Non-frozen codeword positions carry message||crc32 verbatim —
        the defining property of polar.rs PolarSysEnc."""
        msg = bytes(range(85))
        code = polar_encode_exact(msg, 16)
        fr = _frozen_bool(16)
        sys_bits = (code[~fr] < 0).astype(np.uint8)
        mbits = np.unpackbits(np.frombuffer(msg, np.uint8), bitorder="little")
        assert np.array_equal(sys_bits[:680], mbits)
        crc = crc32_rg(msg)
        crc_bits = np.array([(crc >> i) & 1 for i in range(32)], np.uint8)
        assert np.array_equal(sys_bits[680:], crc_bits)

    def test_valid_codeword(self):
        """The output is a polar codeword: re-encoding the u-domain
        transform of the codeword reproduces it."""
        from futuresdr_tpu.models.rattlegram.polar import _polar_transform

        code = polar_encode_exact(b"abc", 16)
        bits = (code < 0).astype(np.uint8)
        u = _polar_transform(bits.copy())
        fr = _frozen_bool(16)
        assert not u[fr].any()  # frozen u-bits are all zero


class TestLoopback:
    def test_mode16(self):
        payload = b"exact wire format, mode 16"
        audio = encode_exact(payload, b"W1AW", 1600)
        frames = ExactDecoder(1600).process(audio)
        assert len(frames) == 1
        f = frames[0]
        assert f.crc_ok and f.payload == payload
        assert f.call_sign == "W1AW" and f.mode == 16

    def test_mode15(self):
        payload = bytes(range(100))  # 86..128 bytes → mode 15
        audio = encode_exact(payload, b"DL1ABC", 2000)
        frames = ExactDecoder(2000).process(audio)
        assert len(frames) == 1
        assert frames[0].mode == 15
        assert frames[0].payload.rstrip(b"\x00") == payload.rstrip(b"\x00")

    def test_mode14(self):
        payload = bytes((i * 7 + 1) % 256 for i in range(160))  # > 128
        audio = encode_exact(payload, b"N0CALL", 1600)
        frames = ExactDecoder(1600).process(audio)
        assert len(frames) == 1
        assert frames[0].mode == 14
        assert frames[0].payload.rstrip(b"\x00") == payload.rstrip(b"\x00")

    def test_noisy(self):
        rng = np.random.default_rng(0)
        payload = b"decodes through awgn, crc-aided scl"
        audio = encode_exact(payload, b"K6XYZ", 1600, noise_symbols=2)
        noisy = audio + 0.03 * rng.standard_normal(len(audio)).astype(
            np.float32
        )
        frames = ExactDecoder(1600).process(noisy)
        assert len(frames) == 1
        assert frames[0].crc_ok and frames[0].payload == payload

    def test_offset_in_stream(self):
        payload = b"frame not at position zero"
        audio = encode_exact(payload, b"AA1A", 1600)
        stream = np.concatenate(
            [np.zeros(12345, np.float32), audio, np.zeros(5000, np.float32)]
        )
        frames = ExactDecoder(1600).process(stream)
        assert len(frames) == 1
        assert frames[0].payload == payload
        # sync symbol position = silence + noise ext + guard
        assert frames[0].start == 12345 + EXTENDED_LENGTH + GUARD_LENGTH

    def test_wrong_carrier_rejected(self):
        audio = encode_exact(b"tuned elsewhere", b"W1AW", 2400)
        assert ExactDecoder(1200).process(audio) == []


def test_fancy_header_appends_glyph_symbols_and_still_decodes():
    """fancy_header=True paints 11 call-sign glyph rows after the payload
    (encoder.rs:372-398); the decoration extends the waveform by 11
    extended symbols and must not disturb payload decode."""
    from futuresdr_tpu.models.rattlegram.exact import (
        EXTENDED_LENGTH,
        ExactDecoder,
        encode_exact,
    )

    payload = b"fancy header check"
    plain = encode_exact(payload, b"W1AW", 1600)
    fancy = encode_exact(payload, b"W1AW", 1600, fancy_header=True)
    assert len(fancy) - len(plain) == 11 * EXTENDED_LENGTH
    # glyph symbols carry energy (the call sign is painted, not silence)
    tail = fancy[len(plain) - EXTENDED_LENGTH : len(fancy) - EXTENDED_LENGTH]
    assert np.max(np.abs(tail)) > 0.01
    frames = ExactDecoder(1600).process(fancy)
    assert frames and frames[0].crc_ok
    assert frames[0].payload[: len(payload)] == payload
    assert frames[0].call_sign.strip() == "W1AW"
