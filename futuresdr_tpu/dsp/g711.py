"""G.711 A-law / µ-law codecs (WAVE formats 6 and 7).

Telephony captures and many scanner/SDR archive recordings ship as
G.711 WAVs; decoding in-process (vectorized table lookup) keeps
``AudioFileSource`` dependency-free. Byte-exact vs CPython's
``audioop.{ulaw2lin,alaw2lin,lin2ulaw,lin2alaw}``
(tests/test_audio_driver.py).
"""

from __future__ import annotations

import numpy as np

_BIAS = 0x84  # µ-law bias (ITU-T G.711)


def _build_ulaw_table() -> np.ndarray:
    codes = np.arange(256, dtype=np.uint8)
    u = (~codes) & 0xFF
    sign = (u & 0x80) != 0
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    mag = (((mantissa.astype(np.int32) << 3) + _BIAS) << exponent) - _BIAS
    return np.where(sign, -mag, mag).astype(np.int16)


def _build_alaw_table() -> np.ndarray:
    codes = np.arange(256, dtype=np.uint8)
    a = codes ^ 0x55  # even-bit inversion
    positive = (a & 0x80) != 0  # A-law: sign bit SET means positive
    exponent = (a >> 4) & 0x07
    mantissa = (a & 0x0F).astype(np.int32)
    mag = np.where(
        exponent == 0,
        (mantissa << 4) + 8,
        ((mantissa << 4) + 0x108) << (exponent - 1),
    )
    return np.where(positive, mag, -mag).astype(np.int16)


_ULAW2LIN = _build_ulaw_table()
_ALAW2LIN = _build_alaw_table()


def ulaw_decode(data: bytes | np.ndarray) -> np.ndarray:
    """µ-law bytes → int16 PCM (G.711 expansion)."""
    codes = np.frombuffer(bytes(data), np.uint8)
    return _ULAW2LIN[codes]


def alaw_decode(data: bytes | np.ndarray) -> np.ndarray:
    """A-law bytes → int16 PCM (G.711 expansion)."""
    codes = np.frombuffer(bytes(data), np.uint8)
    return _ALAW2LIN[codes]


def ulaw_encode(pcm: np.ndarray) -> bytes:
    """int16 PCM → µ-law bytes (the Sun/CCITT ``st_14linear2ulaw``
    algorithm CPython's audioop ships: 14-bit domain, bias 0x21,
    segment ends {0x3F..0x1FFF} — byte-exact vs ``audioop.lin2ulaw``)."""
    v = np.asarray(pcm, np.int16).astype(np.int32) >> 2  # 14-bit domain
    neg = v < 0
    mask = np.where(neg, 0x7F, 0xFF)
    pv = np.where(neg, -v, v)
    pv = np.minimum(pv, 8159) + (_BIAS >> 2)
    bounds = np.array(
        [0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF], np.int32
    )
    seg = np.searchsorted(bounds, pv, side="left").astype(np.int32)
    uval = (seg << 4) | ((pv >> (seg + 1)) & 0x0F)
    code = np.where(seg >= 8, 0x7F, uval) ^ mask
    return code.astype(np.uint8).tobytes()


def alaw_encode(pcm: np.ndarray) -> bytes:
    """int16 PCM → A-law bytes (``st_linear2alaw``: 13-bit domain —
    byte-exact vs ``audioop.lin2alaw``)."""
    v = np.asarray(pcm, np.int16).astype(np.int32) >> 3  # 13-bit domain
    neg = v < 0
    mask = np.where(neg, 0x55, 0xD5)
    pv = np.where(neg, -v - 1, v)
    bounds = np.array(
        [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF], np.int32
    )
    seg = np.searchsorted(bounds, pv, side="left").astype(np.int32)
    aval = (seg << 4) | np.where(
        seg < 2, (pv >> 1) & 0x0F, (pv >> seg) & 0x0F
    )
    code = np.where(seg >= 8, 0x7F, aval) ^ mask
    return code.astype(np.uint8).tobytes()
