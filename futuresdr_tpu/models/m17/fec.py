"""M17 FEC primitives: Golay(24,12), K=5 convolutional code, CRC-16/M17.

Parity: ``examples/m17/src/{golay.rs,crc.rs}`` and the conv/puncture logic
in ``encoder.rs``/``decoder.rs``; all constants are the published M17
protocol spec values (spec.m17project.org).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import numpy as np

# ---------------------------------------------------------------------------
# Golay(24,12) — generator polynomial 0xC75 (spec §"Golay (24, 12)")
# ---------------------------------------------------------------------------

_GOLAY_GEN = 0xC75


def _golay_checkbits(data: int) -> int:
    """11 check bits via polynomial division, then overall parity → 12."""
    reg = data << 11
    for i in range(11 + 12 - 1, 10, -1):
        if reg & (1 << i):
            reg ^= _GOLAY_GEN << (i - 11)
    cks = reg & 0x7FF
    word = (data << 11) | cks
    parity = bin(word).count("1") & 1
    return (cks << 1) | parity


def golay_encode(data: int) -> int:
    """12 data bits → 24-bit codeword [data(12) | check(11) | parity(1)]."""
    data &= 0xFFF
    return (data << 12) | _golay_checkbits(data)


@lru_cache(maxsize=None)
def _golay_syndromes():
    """syndrome(codeword ^ error) → error pattern, all weight ≤ 3."""
    table = {}

    def synd(word: int) -> int:
        # the code is systematic+linear: w ^ encode(data(w)) depends only
        # on the error pattern
        return word ^ golay_encode(word >> 12)

    from itertools import combinations

    for w in range(0, 4):
        for bits in combinations(range(24), w):
            err = 0
            for b in bits:
                err |= 1 << b
            s = synd(err)
            if s not in table:
                table[s] = err
    return table


def golay_decode(word: int) -> Optional[int]:
    """24-bit word → corrected 12 data bits (None if uncorrectable)."""
    word &= 0xFFFFFF
    s = word ^ golay_encode(word >> 12)
    err = _golay_syndromes().get(s)
    if err is None:
        return None
    return ((word ^ err) >> 12) & 0xFFF


# ---------------------------------------------------------------------------
# CRC-16/M17: poly 0x5935, init 0xFFFF, MSB-first, no reflection
# ---------------------------------------------------------------------------


def crc_m17(data: bytes) -> int:
    crc = 0xFFFF
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x5935) if crc & 0x8000 else (crc << 1)
            crc &= 0xFFFF
    return crc


# ---------------------------------------------------------------------------
# K=5 convolutional code, G1 = 0o31 (11001), G2 = 0o27 (10111)
# ---------------------------------------------------------------------------

_NS = 16  # 2^(K-1) states


@lru_cache(maxsize=None)
def _conv_tables():
    g1, g2 = 0b11001, 0b10111
    out = np.zeros((2, _NS, 2), dtype=np.uint8)
    for s in range(_NS):
        for b in (0, 1):
            reg = (b << 4) | s  # newest bit at MSB of 5-bit register
            out[b, s, 0] = bin(reg & g1).count("1") & 1
            out[b, s, 1] = bin(reg & g2).count("1") & 1
    n = np.arange(_NS)
    bit_of = (n >> 3).astype(np.uint8)
    pred0 = (n & 7) << 1
    pred1 = pred0 | 1
    e0 = out[bit_of, pred0]
    e1 = out[bit_of, pred1]
    return out, bit_of, pred0, pred1, e0, e1


def conv_encode(bits: np.ndarray) -> np.ndarray:
    """Rate-1/2 encode (caller appends 4 flush zeros)."""
    out_t, *_ = _conv_tables()
    out = np.empty(2 * len(bits), dtype=np.uint8)
    s = 0
    for t, b in enumerate(bits):
        out[2 * t : 2 * t + 2] = out_t[b, s]
        s = (int(b) << 3) | (s >> 1)
    return out


def viterbi_decode_soft(llrs: np.ndarray, n_bits: int) -> np.ndarray:
    """Soft-decision K=5 decode: ``llrs[2·n_bits]`` per channel bit,
    positive = bit 1, zero = erasure (native kernel; numpy fallback)."""
    from futuresdr_tpu.native import viterbi_r12_soft as _native

    res = _native(5, 0b11001, 0b10111, np.asarray(llrs), n_bits)
    if res is not None:
        return res
    _, bit_of, pred0, pred1, e0, e1 = _conv_tables()
    llrs = np.asarray(llrs, np.float64).reshape(n_bits, 2)
    sgn0 = 1.0 - 2.0 * e0
    sgn1 = 1.0 - 2.0 * e1
    metric = np.full(_NS, 1e6, np.float64)
    metric[0] = 0.0
    dec = np.zeros((n_bits, _NS), np.uint8)
    for t in range(n_bits):
        l0, l1 = llrs[t]
        bm0 = sgn0[:, 0] * l0 + sgn0[:, 1] * l1
        bm1 = sgn1[:, 0] * l0 + sgn1[:, 1] * l1
        m0 = metric[pred0] + bm0
        m1 = metric[pred1] + bm1
        take1 = m1 < m0
        metric = np.where(take1, m1, m0)
        dec[t] = take1
        if not (t & 0xFF):
            metric -= metric.min()
    s = int(np.argmin(metric))
    bits = np.empty(n_bits, np.uint8)
    for t in range(n_bits - 1, -1, -1):
        bits[t] = bit_of[s]
        s = int(pred1[s] if dec[t, s] else pred0[s])
    return bits


def depuncture_soft(llrs: np.ndarray, pattern, n_coded: int) -> np.ndarray:
    """Soft depuncture: punctured positions get LLR 0."""
    pat = np.resize(np.asarray(pattern, bool), n_coded)
    out = np.zeros(n_coded, np.float64)
    out[pat] = np.asarray(llrs, np.float64)[: int(pat.sum())]
    return out


def viterbi_decode(
    coded: np.ndarray, n_bits: int, erasures: Optional[np.ndarray] = None
) -> np.ndarray:
    from futuresdr_tpu.native import viterbi_r12 as _native

    res = _native(5, 0b11001, 0b10111, np.asarray(coded), erasures, n_bits)
    if res is not None:
        return res
    _, bit_of, pred0, pred1, e0, e1 = _conv_tables()
    coded = np.asarray(coded, dtype=np.uint8).reshape(n_bits, 2)
    if erasures is None:
        valid = np.ones((n_bits, 2), dtype=np.float32)
    else:
        valid = (~np.asarray(erasures, bool).reshape(n_bits, 2)).astype(
            np.float32
        )
    metric = np.full(_NS, 1e6, np.float32)
    metric[0] = 0.0
    dec = np.zeros((n_bits, _NS), np.uint8)
    for t in range(n_bits):
        r0, r1 = coded[t]
        v0, v1 = valid[t]
        bm0 = (e0[:, 0] != r0) * v0 + (e0[:, 1] != r1) * v1
        bm1 = (e1[:, 0] != r0) * v0 + (e1[:, 1] != r1) * v1
        m0 = metric[pred0] + bm0
        m1 = metric[pred1] + bm1
        take1 = m1 < m0
        metric = np.where(take1, m1, m0)
        dec[t] = take1
    s = int(np.argmin(metric))
    bits = np.empty(n_bits, np.uint8)
    for t in range(n_bits - 1, -1, -1):
        bits[t] = bit_of[s]
        s = int(pred1[s] if dec[t, s] else pred0[s])
    return bits


def puncture(coded: np.ndarray, pattern) -> np.ndarray:
    pat = np.resize(np.asarray(pattern, bool), len(coded))
    return coded[pat]


def depuncture(received: np.ndarray, pattern, n_coded: int):
    pat = np.resize(np.asarray(pattern, bool), n_coded)
    coded = np.zeros(n_coded, np.uint8)
    coded[pat] = received[: int(pat.sum())]
    return coded, ~pat
