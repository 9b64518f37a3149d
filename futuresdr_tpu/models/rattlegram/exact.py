"""Byte-exact rattlegram waveform codec (reference wire-format interop).

Implements the reference encoder's exact OFDM frame
(``/root/reference/examples/rattlegram/src/encoder.rs``): 48 kHz, 7680-pt
symbols with 960-sample raised-cosine guards, Schmidl-Cox sync symbol
(MLS 0b10001001 on even carriers, differentially encoded), preamble
symbol carrying base-37 call sign + mode in a BCH(255,71)-protected
differential BPSK sequence (MLS 0b100101011 sign cover), four payload
symbols of 256-carrier differential QPSK carrying a CRC32-aided
systematic polar code (N=2048; frozen sets FROZEN_2048_{712,1056,1392}
from ``util.rs`` — spec constants), payload scrambled by Xorshift32.

The decoder reverses the exact format (template-correlation sync +
hermitian-spectrum carrier recovery + BCH error correction + CRC-aided
SCL polar list decode) so a waveform produced by the reference encoder
decodes here and vice versa.

``phy.py`` keeps the simplified architecture-parity modem; this module is
the wire-format one.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import List, Optional

import numpy as np

from futuresdr_tpu.models.streaming import StreamingReceiver
from futuresdr_tpu.models.rattlegram.bch import Bch
from futuresdr_tpu.models.rattlegram.polar import polar_decode_scl

RATE = 48000
CODE_ORDER = 11
CODE_LEN = 1 << CODE_ORDER
MOD_BITS = 2
SYMBOL_COUNT = 4
SYMBOL_LENGTH = (1280 * RATE) // 8000  # 7680
GUARD_LENGTH = SYMBOL_LENGTH // 8  # 960
EXTENDED_LENGTH = SYMBOL_LENGTH + GUARD_LENGTH
MAX_BITS = 1360
COR_SEQ_LEN = 127
COR_SEQ_OFF = 1 - COR_SEQ_LEN
COR_SEQ_POLY = 0b10001001
PRE_SEQ_LEN = 255
# Rust `-Self::PRE_SEQ_LEN / 2` is trunc-division: -255/2 = -127
PRE_SEQ_OFF = -(PRE_SEQ_LEN // 2)
PRE_SEQ_POLY = 0b100101011
PAY_CAR_CNT = 256
PAY_CAR_OFF = -(PAY_CAR_CNT // 2)
NOISE_POLY = 0b100101010001


# ---------------------------------------------------------------------------
# primitive sequences (mls.rs, xorshift.rs)
# ---------------------------------------------------------------------------


class Mls:
    """Maximum-length LFSR, exact register/feedback semantics (mls.rs)."""

    def __init__(self, poly: int):
        self.poly = poly
        n = poly
        n |= n >> 1
        n |= n >> 2
        n |= n >> 4
        n |= n >> 8
        n |= n >> 16
        hi = n ^ (n >> 1)
        self.test = hi >> 1
        self.reg = 1

    def next(self) -> bool:
        fb = (self.reg & self.test) != 0
        self.reg = (self.reg << 1) & 0xFFFFFFFFFFFFFFFF
        if fb:
            self.reg ^= self.poly
        return fb


class Xorshift32:
    """Payload scrambler PRNG (xorshift.rs, y0 = 2463534242)."""

    def __init__(self):
        self.y = 2463534242

    def next(self) -> int:
        y = self.y
        y ^= (y << 13) & 0xFFFFFFFF
        y ^= y >> 17
        y ^= (y << 5) & 0xFFFFFFFF
        self.y = y
        return y


def _nrz(bit) -> float:
    return -1.0 if bit else 1.0


# ---------------------------------------------------------------------------
# CRCs (reflected; encoder.rs CRC16 0x2F15, polar.rs CRC32 0x05EC76F1)
# ---------------------------------------------------------------------------

_CRC16_POLY_REV = 0xA8F4  # bit-reverse of 0x2F15
_CRC32_POLY_REV = 0x8F6E37A0  # bit-reverse of 0x05EC76F1 (polar.rs:169)


def crc16_rg(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = (crc >> 1) ^ (_CRC16_POLY_REV if crc & 1 else 0)
    return crc


def crc32_rg(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = (crc >> 1) ^ (_CRC32_POLY_REV if crc & 1 else 0)
    return crc


# ---------------------------------------------------------------------------
# frozen-bit tables (util.rs:64-98 — polar code construction constants)
# ---------------------------------------------------------------------------

_FROZEN_2048_1392 = [
    0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF,
    0x7FFFFFFF, 0x011F7FFF, 0xFFFFFFFF, 0x7FFFFFFF, 0x17FFFFFF, 0x0117177F,
    0x177F7FFF, 0x0001037F, 0x0001011F, 0x00000001, 0xFFFFFFFF, 0x177FFFFF,
    0x077F7FFF, 0x0001011F, 0x01173FFF, 0x00010117, 0x00010117, 0x00000000,
    0x0117177F, 0x00000017, 0x00000003, 0x00000000, 0x00000001, 0x00000000,
    0x00000000, 0x00000000, 0x7FFFFFFF, 0x011F7FFF, 0x011717FF, 0x00000117,
    0x0017177F, 0x00000003, 0x00000001, 0x00000000, 0x0001037F, 0x00000001,
    0x00000001, 0x00000000, 0x00000001, 0x00000000, 0x00000000, 0x00000000,
    0x0001011F, 0x00000001, 0x00000001, 0x00000000, 0x00000001, 0x00000000,
    0x00000000, 0x00000000, 0x00000001, 0x00000000, 0x00000000, 0x00000000,
    0x00000000, 0x00000000, 0x00000000, 0x00000000,
]
_FROZEN_2048_1056 = [
    0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF,
    0xFFFFFFFF, 0x7FFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF, 0x7FFFFFFF,
    0xFFFFFFFF, 0x177FFFFF, 0x177F7FFF, 0x0001017F, 0xFFFFFFFF, 0xFFFFFFFF,
    0xFFFFFFFF, 0x177F7FFF, 0x7FFFFFFF, 0x013F7FFF, 0x01171FFF, 0x00000117,
    0x3FFFFFFF, 0x011717FF, 0x0007177F, 0x00000001, 0x0001017F, 0x00000001,
    0x00000001, 0x00000000, 0xFFFFFFFF, 0x7FFFFFFF, 0x7FFFFFFF, 0x01171FFF,
    0x17FFFFFF, 0x0007177F, 0x0001037F, 0x00000001, 0x077F7FFF, 0x0001013F,
    0x00010117, 0x00000001, 0x00010117, 0x00000000, 0x00000000, 0x00000000,
    0x01173FFF, 0x00010117, 0x00000117, 0x00000000, 0x00000007, 0x00000000,
    0x00000000, 0x00000000, 0x00000001, 0x00000000, 0x00000000, 0x00000000,
    0x00000000, 0x00000000, 0x00000000, 0x00000000,
]
_FROZEN_2048_712 = [
    0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF,
    0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF,
    0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF, 0x177FFFFF, 0xFFFFFFFF, 0xFFFFFFFF,
    0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF, 0x7FFFFFFF, 0x011F7FFF,
    0xFFFFFFFF, 0x7FFFFFFF, 0x1FFFFFFF, 0x0017177F, 0x177FFFFF, 0x0001037F,
    0x0001011F, 0x00000001, 0xFFFFFFFF, 0xFFFFFFFF, 0xFFFFFFFF, 0x7FFFFFFF,
    0xFFFFFFFF, 0x1FFFFFFF, 0x177FFFFF, 0x0001077F, 0xFFFFFFFF, 0x177F7FFF,
    0x013F7FFF, 0x00010117, 0x01171FFF, 0x00000117, 0x00000007, 0x00000000,
    0x7FFFFFFF, 0x01173FFF, 0x011717FF, 0x00000007, 0x0003077F, 0x00000001,
    0x00000001, 0x00000000, 0x0001013F, 0x00000001, 0x00000001, 0x00000000,
    0x00000001, 0x00000000, 0x00000000, 0x00000000,
]

_MODE_TABLE = {
    14: (1360, _FROZEN_2048_1392),
    15: (1024, _FROZEN_2048_1056),
    16: (680, _FROZEN_2048_712),
}


@lru_cache(maxsize=None)
def _frozen_bool(mode: int) -> np.ndarray:
    _, words = _MODE_TABLE[mode]
    bits = np.zeros(CODE_LEN, bool)
    for i in range(CODE_LEN):
        bits[i] = (words[i // 32] >> (i % 32)) & 1 == 1
    return bits


# ---------------------------------------------------------------------------
# systematic polar encoder (polar.rs PolarEncoder/PolarSysEnc)
# ---------------------------------------------------------------------------


def _sysenc_butterfly(codeword: np.ndarray) -> None:
    """In-place GF(2)-as-NRZ butterfly: codeword[j] *= codeword[j+h]."""
    length = len(codeword)
    h = 2
    while h < length:
        view = codeword.reshape(-1, 2 * h)
        view[:, :h] *= view[:, h : 2 * h]
        h *= 2


def polar_encode_exact(message: bytes, mode: int) -> np.ndarray:
    """Message bytes → NRZ codeword i8[2048] (polar.rs:53-140)."""
    data_bits, _ = _MODE_TABLE[mode]
    frozen = _frozen_bool(mode)
    message = message[: data_bits // 8].ljust(data_bits // 8, b"\x00")
    mesg = np.ones(data_bits + 32, np.int8)
    mbits = np.unpackbits(
        np.frombuffer(message, np.uint8), bitorder="little"
    )
    mesg[:data_bits] = 1 - 2 * mbits.astype(np.int8)
    crc = crc32_rg(message[: data_bits // 8])
    for i in range(32):
        mesg[data_bits + i] = -1 if (crc >> i) & 1 else 1

    code = np.empty(CODE_LEN, np.int8)
    # first pass: fill leaves (frozen → +1)
    vals = np.ones(CODE_LEN, np.int8)
    vals[~frozen] = mesg
    code[0::2] = vals[0::2] * vals[1::2]
    code[1::2] = vals[1::2]
    _sysenc_butterfly(code)
    # second pass re-freezes from the (now systematic) codeword
    vals = np.where(frozen, np.int8(1), code)
    code[0::2] = vals[0::2] * vals[1::2]
    code[1::2] = vals[1::2]
    _sysenc_butterfly(code)
    return code


# ---------------------------------------------------------------------------
# encoder (encoder.rs Encoder)
# ---------------------------------------------------------------------------


# 8x11 glyph bitmap for the 37 base37 characters (util.rs BASE37_BITMAP
# — spectrogram font, spec constant; row r of glyph c is
# BASE37_BITMAP[c + 37*r])
BASE37_BITMAP = np.array([
    0, 60, 8, 60, 60, 2, 126, 28, 126, 60, 60, 60, 124, 60, 120, 126, 126,
    60, 66, 56, 14, 66, 64, 130, 66, 60, 124, 60, 124, 60, 254, 66, 66,
    130, 66, 130, 126, 0, 66, 24, 66, 66, 6, 64, 32, 2, 66, 66, 66, 66, 66,
    68, 64, 64, 66, 66, 16, 4, 68, 64, 198, 66, 66, 66, 66, 66, 66, 16, 66,
    66, 130, 66, 130, 2, 0, 66, 40, 66, 66, 10, 64, 64, 2, 66, 66, 66, 66,
    66, 66, 64, 64, 66, 66, 16, 4, 72, 64, 170, 66, 66, 66, 66, 66, 64, 16,
    66, 66, 130, 36, 68, 2, 0, 70, 8, 2, 2, 18, 64, 64, 4, 66, 66, 66, 66,
    64, 66, 64, 64, 64, 66, 16, 4, 80, 64, 146, 98, 66, 66, 66, 66, 64, 16,
    66, 66, 130, 36, 68, 4, 0, 74, 8, 4, 28, 34, 124, 124, 4, 60, 66, 66,
    124, 64, 66, 120, 120, 64, 126, 16, 4, 96, 64, 146, 82, 66, 66, 66, 66,
    60, 16, 66, 66, 130, 24, 40, 8, 0, 82, 8, 8, 2, 66, 2, 66, 8, 66, 62,
    126, 66, 64, 66, 64, 64, 78, 66, 16, 4, 96, 64, 130, 74, 66, 124, 66,
    124, 2, 16, 66, 36, 146, 24, 16, 16, 0, 98, 8, 16, 2, 126, 2, 66, 8,
    66, 2, 66, 66, 64, 66, 64, 64, 66, 66, 16, 4, 80, 64, 130, 70, 66, 64,
    66, 80, 2, 16, 66, 36, 146, 36, 16, 32, 0, 66, 8, 32, 66, 2, 2, 66, 16,
    66, 2, 66, 66, 66, 66, 64, 64, 66, 66, 16, 68, 72, 64, 130, 66, 66, 64,
    66, 72, 66, 16, 66, 36, 170, 36, 16, 64, 0, 66, 8, 64, 66, 2, 66, 66,
    16, 66, 4, 66, 66, 66, 68, 64, 64, 66, 66, 16, 68, 68, 64, 130, 66, 66,
    64, 74, 68, 66, 16, 66, 24, 198, 66, 16, 64, 0, 60, 62, 126, 60, 2, 60,
    60, 16, 60, 56, 66, 124, 60, 120, 126, 64, 60, 66, 56, 56, 66, 126,
    130, 66, 60, 64, 60, 66, 60, 16, 60, 24, 130, 66, 16, 126, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2,
    0, 0, 0, 0, 0, 0, 0, 0, 0
], dtype=np.uint8)


def _base37_map(c: int) -> int:
    if 0x30 <= c <= 0x39:
        return c - 0x30 + 1
    if 0x61 <= c <= 0x7A:
        return c - 0x61 + 11
    if 0x41 <= c <= 0x5A:
        return c - 0x41 + 11
    return 0


def _base37(s: bytes) -> int:
    acc = 0
    for c in s:
        acc = 37 * acc + _base37_map(c)
    return acc


def base37_decode(val: int) -> str:
    out = []
    while val:
        d = val % 37
        val //= 37
        if d == 0:
            out.append(" ")
        elif d <= 10:
            out.append(chr(ord("0") + d - 1))
        else:
            out.append(chr(ord("A") + d - 11))
    return "".join(reversed(out)).strip()


class ExactEncoder:
    """Sample-exact port of encoder.rs (floating point aside)."""

    def __init__(self):
        self.bch = Bch()  # the 24 reference minimal polynomials

    def _bin(self, carrier: int) -> int:
        return (carrier + self.carrier_offset + SYMBOL_LENGTH) % SYMBOL_LENGTH

    def _transform(self) -> np.ndarray:
        # rustfft inverse = unnormalized IDFT; encoder divides by √(8N)
        return (
            np.fft.ifft(self.freq) * SYMBOL_LENGTH / np.sqrt(8 * SYMBOL_LENGTH)
        )

    def _noise_symbol(self) -> np.ndarray:
        factor = np.sqrt(SYMBOL_LENGTH / PAY_CAR_CNT)
        self.freq[:] = 0
        for i in range(PAY_CAR_CNT):
            re = _nrz(self.noise_seq.next())
            im = _nrz(self.noise_seq.next())
            self.freq[self._bin(i + PAY_CAR_OFF)] = factor * (re + 1j * im)
        return self._transform()

    def _schmidl_cox(self) -> np.ndarray:
        seq = Mls(COR_SEQ_POLY)
        factor = np.sqrt(2 * SYMBOL_LENGTH / COR_SEQ_LEN)
        self.freq[:] = 0
        self.freq[self._bin(COR_SEQ_OFF - 2)] = factor
        for i in range(COR_SEQ_LEN):
            self.freq[self._bin(2 * i + COR_SEQ_OFF)] = _nrz(seq.next())
        for i in range(COR_SEQ_LEN):
            self.freq[self._bin(2 * i + COR_SEQ_OFF)] *= self.freq[
                self._bin(2 * (i - 1) + COR_SEQ_OFF)
            ]
        return self._transform()

    def _preamble(self) -> np.ndarray:
        data = bytearray(9)
        for i in range(55):
            if (self.meta_data >> i) & 1:
                data[i // 8] |= 1 << (7 - i % 8)
        cs = crc16_rg(
            ((self.meta_data << 9) & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little")
        )
        for i in range(16):
            if (cs >> i) & 1:
                p = i + 55
                data[p // 8] |= 1 << (7 - p % 8)
        msg_bits = np.unpackbits(np.frombuffer(bytes(data), np.uint8))[:71]
        par_bits = self.bch.parity(msg_bits)  # 184 bits, MSB-first order

        seq = Mls(PRE_SEQ_POLY)
        factor = np.sqrt(SYMBOL_LENGTH / PRE_SEQ_LEN)
        self.freq[:] = 0
        self.freq[self._bin(PRE_SEQ_OFF - 1)] = factor
        for i in range(71):
            self.freq[self._bin(i + PRE_SEQ_OFF)] = _nrz(msg_bits[i])
        for i in range(71, PRE_SEQ_LEN):
            self.freq[self._bin(i + PRE_SEQ_OFF)] = _nrz(par_bits[i - 71])
        for i in range(PRE_SEQ_LEN):
            self.freq[self._bin(i + PRE_SEQ_OFF)] *= self.freq[
                self._bin(i - 1 + PRE_SEQ_OFF)
            ]
        for i in range(PRE_SEQ_LEN):
            self.freq[self._bin(i + PRE_SEQ_OFF)] *= _nrz(seq.next())
        for i in range(PAY_CAR_CNT):
            self.prev[i] = self.freq[self._bin(i + PAY_CAR_OFF)]
        return self._transform()

    def _fancy_symbol(self, fancy_line: int) -> np.ndarray:
        """Call-sign glyph row as on/off carriers (encoder.rs:372-398):
        the 'fancy header' paints the call sign into the spectrogram
        after the payload, 3 bins per pixel, BPSK noise-keyed."""
        fancy_off = -(8 * 9 * 3) // 2
        active = 1
        for j in range(9):
            row = int(BASE37_BITMAP[self.call[j] + 37 * fancy_line])
            active += bin(row).count("1")
        factor = np.sqrt(SYMBOL_LENGTH / active)
        self.freq[:] = 0
        for j in range(9):
            row = int(BASE37_BITMAP[self.call[j] + 37 * fancy_line])
            for i in range(8):
                if row & (1 << (7 - i)):
                    self.freq[self._bin((8 * j + i) * 3 + fancy_off)] = (
                        factor * _nrz(self.noise_seq.next())
                    )
        return self._transform()

    def _payload_symbol(self, symbol_number: int) -> np.ndarray:
        self.freq[:] = 0
        base = MOD_BITS * PAY_CAR_CNT * symbol_number
        a = 1.0 / np.sqrt(2.0)
        for i in range(PAY_CAR_CNT):
            b0 = self.code[base + 2 * i]
            b1 = self.code[base + 2 * i + 1]
            self.prev[i] *= complex(b0 * a, b1 * a)
            self.freq[self._bin(i + PAY_CAR_OFF)] = self.prev[i]
        return self._transform()

    def encode(
        self,
        payload: bytes,
        call_sign: bytes = b"ANONYMOUS",
        carrier_frequency: int = 1600,
        noise_symbols: int = 1,
        fancy_header: bool = False,
    ) -> np.ndarray:
        """→ f32 audio at 48 kHz (encoder.rs:128-267)."""
        n = len(payload)
        if n == 0:
            return np.zeros(0, np.float32)
        mode = 16 if n <= 85 else (15 if n <= 128 else 14)
        if n > MAX_BITS // 8:
            raise ValueError(f"payload too long ({n} > {MAX_BITS // 8})")
        self.carrier_offset = (carrier_frequency * SYMBOL_LENGTH) // RATE
        self.meta_data = (_base37(call_sign) << 8) | mode
        self.call = [0] * 9
        for i, c in enumerate(call_sign[:9]):
            self.call[i] = _base37_map(c)
        self.freq = np.zeros(SYMBOL_LENGTH, np.complex128)
        self.prev = np.zeros(PAY_CAR_CNT, np.complex128)
        self.noise_seq = Mls(NOISE_POLY)

        data_bits, _ = _MODE_TABLE[mode]
        scr = Xorshift32()
        mesg = bytes(
            (payload[i] if i < n else 0) ^ (scr.next() & 0xFF)
            for i in range(data_bits // 8)
        )
        self.code = polar_encode_exact(mesg, mode)

        out: List[np.ndarray] = []
        guard = np.zeros(GUARD_LENGTH, np.complex128)
        xg = np.arange(GUARD_LENGTH) / (GUARD_LENGTH - 1)

        def emit(temp: np.ndarray, data_symbol: bool) -> None:
            nonlocal guard
            x = xg.copy()
            if data_symbol:
                x = np.minimum(x / 0.5, 1.0)
            y = 0.5 * (1.0 - np.cos(np.pi * x))
            tail = temp[SYMBOL_LENGTH - GUARD_LENGTH :]
            out.append(((1 - y) * guard + y * tail).real)
            guard = temp[:GUARD_LENGTH].copy()
            out.append(temp.real)

        for _ in range(noise_symbols):
            emit(self._noise_symbol(), False)
        emit(self._schmidl_cox(), True)
        emit(self._preamble(), True)
        for s in range(SYMBOL_COUNT):
            emit(self._payload_symbol(s), True)
        if fancy_header:
            # 11 glyph rows, top line emitted first (encoder.rs:224-226
            # decrements fancy_line from 11 before each symbol)
            for line in range(10, -1, -1):
                emit(self._fancy_symbol(line), False)
        # silence symbol flushes the last guard crossfade
        emit(np.zeros(SYMBOL_LENGTH, np.complex128), False)
        out.append(np.zeros(EXTENDED_LENGTH))
        return np.concatenate(out).astype(np.float32)


def encode_exact(
    payload: bytes,
    call_sign: bytes = b"ANONYMOUS",
    carrier_frequency: int = 1600,
    noise_symbols: int = 1,
    fancy_header: bool = False,
) -> np.ndarray:
    return ExactEncoder().encode(
        payload, call_sign, carrier_frequency, noise_symbols, fancy_header
    )


# ---------------------------------------------------------------------------
# decoder (wire-format aware; decoder.rs capability, TPU-era structure)
# ---------------------------------------------------------------------------


@dataclass
class ExactFrame:
    payload: bytes
    call_sign: str
    mode: int
    crc_ok: bool
    start: int


@lru_cache(maxsize=None)
def _sync_template(carrier_frequency: int) -> np.ndarray:
    enc = ExactEncoder()
    enc.carrier_offset = (carrier_frequency * SYMBOL_LENGTH) // RATE
    enc.freq = np.zeros(SYMBOL_LENGTH, np.complex128)
    return enc._schmidl_cox().real.astype(np.float32)


@lru_cache(maxsize=None)
def _exact_score_fn(n: int, carrier_frequency: int):
    """Device normalized Schmidl-Cox sync correlation (numerics-matched
    to the previous host ``np.correlate`` form)."""
    import jax
    import jax.numpy as jnp

    from futuresdr_tpu.ops.fir import conv1d_valid, moving_sum

    tmpl = _sync_template(carrier_frequency)
    taps = np.ascontiguousarray(tmpl[::-1]).astype(np.float32)
    norm = float(np.linalg.norm(tmpl.astype(np.float64)))
    w = len(tmpl)

    def fn(x):
        cor = conv1d_valid(x, taps)
        energy = jnp.sqrt(moving_sum(x * x, w) + 1e-9)
        return cor / (energy * norm + 1e-9)

    return jax.jit(fn)


class ExactDecoder(StreamingReceiver):
    """Decode reference-format waveforms.

    Sync: matched correlation against the known Schmidl-Cox symbol
    (deterministic for a given carrier frequency) with normalized score.
    Then the hermitian spectrum of each real symbol returns the carrier
    values; preamble → BCH(255,71) correction → meta CRC16 → mode;
    payload → differential QPSK LLRs → CRC32-aided SCL polar decode →
    Xorshift32 descramble."""

    def __init__(self, carrier_frequency: int = 1600, list_size: int = 8):
        self.carrier_frequency = carrier_frequency
        self.carrier_offset = (carrier_frequency * SYMBOL_LENGTH) // RATE
        self.list_size = list_size
        self.bch = Bch()

    def _bin(self, carrier: int) -> int:
        return (carrier + self.carrier_offset + SYMBOL_LENGTH) % SYMBOL_LENGTH

    def _spectrum(self, x: np.ndarray, pos: int) -> np.ndarray:
        return np.fft.fft(x[pos : pos + SYMBOL_LENGTH])

    # process/process_stream come from StreamingReceiver: the device
    # sync-correlation program (O(N·7680) MACs — the dominant host cost)
    # dispatches per chunk without a host sync; the score fetch + the
    # per-candidate BCH/polar decode land in _collect.

    def _dispatch(self, audio):
        import jax.numpy as jnp

        x = np.asarray(audio, np.float32)
        n_real = len(x)
        tmpl = _sync_template(self.carrier_frequency)
        if n_real < len(tmpl) + 6 * EXTENDED_LENGTH:
            return {"x": x, "n_real": n_real, "score": None}
        pad = (-len(x)) % 16384  # stable jit shapes
        if pad:
            x = np.concatenate([x, np.zeros(pad, np.float32)])
        return {
            "x": x,
            "n_real": n_real,
            "score": _exact_score_fn(len(x), self.carrier_frequency)(
                jnp.asarray(x)
            ),
        }

    def _collect(self, d) -> List[ExactFrame]:
        x, n_real = d["x"], d["n_real"]
        if d["score"] is None:
            return []
        score = np.asarray(d["score"])
        frames: List[ExactFrame] = []
        order = np.argsort(score)[::-1]
        used: List[int] = []
        span = (2 + SYMBOL_COUNT) * EXTENDED_LENGTH
        for cand in order[:8]:
            if score[cand] < 0.5:
                break
            if any(abs(cand - u) < EXTENDED_LENGTH for u in used):
                continue
            if int(cand) + span > n_real:
                continue  # frame would extend into the shape padding
            f = self._decode_at(x, int(cand))
            if f is not None:
                frames.append(f)
                used.append(int(cand))
        frames.sort(key=lambda f: f.start)
        return frames

    def _carriers(self, spec: np.ndarray, off: int, count: int) -> np.ndarray:
        idx = [(off + i + self.carrier_offset) % SYMBOL_LENGTH for i in range(count)]
        return spec[idx]

    def _decode_at(self, x: np.ndarray, sync_pos: int) -> Optional[ExactFrame]:
        pre_pos = sync_pos + EXTENDED_LENGTH
        pay0 = pre_pos + EXTENDED_LENGTH
        if pay0 + SYMBOL_COUNT * EXTENDED_LENGTH > len(x):
            return None

        # ---- preamble: differential BPSK under the MLS cover ----
        spec = self._spectrum(x, pre_pos)
        c = self._carriers(spec, PRE_SEQ_OFF - 1, PRE_SEQ_LEN + 1)
        seq = Mls(PRE_SEQ_POLY)
        mls = np.array([_nrz(seq.next()) for _ in range(PRE_SEQ_LEN)])
        cum = c[1:] * mls  # de-cover → cumulative-product sequence
        full = np.concatenate([[c[0]], cum])
        raw = np.sign((full[1:] * np.conj(full[:-1])).real)
        bits = (raw < 0).astype(np.uint8)  # nrz: bit=1 ↔ −1
        corrected, n_err = self.bch.decode_message(bits)
        if n_err < 0:
            return None
        md = 0
        for i in range(55):
            if corrected[i]:
                md |= 1 << i
        cs = 0
        for i in range(16):
            if corrected[55 + i]:
                cs |= 1 << i
        if crc16_rg(((md << 9) & 0xFFFFFFFFFFFFFFFF).to_bytes(8, "little")) != cs:
            return None
        mode = md & 0xFF
        if mode not in _MODE_TABLE:
            return None
        call = base37_decode(md >> 8)
        data_bits, _ = _MODE_TABLE[mode]

        # ---- payload: per-carrier differential QPSK across symbols ----
        # prev reference = preamble carriers at payload positions
        prev = self._carriers(spec, PAY_CAR_OFF, PAY_CAR_CNT)
        llr = np.empty((SYMBOL_COUNT, PAY_CAR_CNT, 2), np.float64)
        pos = pay0
        for s in range(SYMBOL_COUNT):
            spec_s = self._spectrum(x, pos)
            cur = self._carriers(spec_s, PAY_CAR_OFF, PAY_CAR_CNT)
            d = cur * np.conj(prev)
            scale = np.abs(d) + 1e-12
            # mod_map: (b0, b1) NRZ → (b0/√2, b1/√2): b0 ↔ Re, b1 ↔ Im;
            # our SCL convention: positive LLR ⇒ bit 0 (NRZ +1)
            llr[s, :, 0] = d.real / scale
            llr[s, :, 1] = d.imag / scale
            prev = cur
            pos += EXTENDED_LENGTH

        frozen = _frozen_bool(mode)

        def crc_fn(msg_bits: np.ndarray) -> bool:
            data = np.packbits(msg_bits[:data_bits], bitorder="little")
            want = 0
            for i in range(32):
                if msg_bits[data_bits + i]:
                    want |= 1 << i
            return crc32_rg(data.tobytes()) == want

        msg_bits, _, crc_ok = polar_decode_scl(
            4.0 * llr.reshape(-1), frozen, self.list_size, crc_fn
        )
        scrambled = np.packbits(
            msg_bits[:data_bits], bitorder="little"
        ).tobytes()
        scr = Xorshift32()
        payload = bytes(b ^ (scr.next() & 0xFF) for b in scrambled)
        payload = payload.rstrip(b"\x00")
        return ExactFrame(
            payload=payload,
            call_sign=call,
            mode=mode,
            crc_ok=bool(crc_ok),
            start=sync_pos,
        )
