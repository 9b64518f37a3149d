"""Viterbi decoder for the 802.11 K=7 rate-1/2 code (g0=133₈, g1=171₈).

Parity: ``examples/wlan/src/viterbi_decoder.rs`` (SSE hard-decision
decoder). Host implementation is vectorized numpy ACS over the 64 states;
punctured positions carry zero branch weight (erasures).

Trellis convention: state = last 6 input bits, newest at the MSB
(``next = (bit << 5) | (state >> 1)``). Each next state ``n`` encodes its
input bit as ``n >> 5`` and has exactly two predecessors
``((n & 31) << 1) | {0, 1}``; the ACS decision records which predecessor
won.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

_NSTATES = 64


def _build_tables():
    g0, g1 = 0o133, 0o171
    out = np.zeros((2, _NSTATES, 2), dtype=np.uint8)  # [input, state, 2]
    for s in range(_NSTATES):
        for b in (0, 1):
            reg = (b << 6) | s
            out[b, s, 0] = bin(reg & g0).count("1") & 1
            out[b, s, 1] = bin(reg & g1).count("1") & 1
    n = np.arange(_NSTATES)
    bit_of = (n >> 5).astype(np.uint8)
    pred0 = (n & 31) << 1
    pred1 = pred0 | 1
    # expected channel bits for transition pred{0,1} --bit_of--> n
    e0 = out[bit_of, pred0]  # [64, 2]
    e1 = out[bit_of, pred1]
    return out, bit_of, pred0, pred1, e0, e1


_OUT, _BIT_OF, _PRED0, _PRED1, _E0, _E1 = _build_tables()


def conv_encode_ref(bits: np.ndarray) -> np.ndarray:
    """Table-driven encoder (cross-check for tx._conv_encode)."""
    out = np.empty(2 * len(bits), dtype=np.uint8)
    s = 0
    for t, b in enumerate(bits):
        out[2 * t : 2 * t + 2] = _OUT[b, s]
        s = (int(b) << 5) | (s >> 1)
    return out


def viterbi_decode(
    coded: np.ndarray,
    n_bits: int,
    erasures: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Hard-decision decode of ``2·n_bits`` channel bits → ``n_bits`` bits.

    ``erasures``: bool mask over coded positions, True = punctured.
    Uses the native C++ ACS kernel when available (the reference's SSE
    viterbi_decoder.rs tier); numpy fallback below."""
    from futuresdr_tpu.native import viterbi_r12 as _native

    res = _native(7, 0o133, 0o171, np.asarray(coded), erasures, n_bits)
    if res is not None:
        return res
    coded = np.asarray(coded, dtype=np.uint8).reshape(n_bits, 2)
    if erasures is None:
        valid = np.ones((n_bits, 2), dtype=np.float32)
    else:
        valid = (~np.asarray(erasures, dtype=bool).reshape(n_bits, 2)).astype(
            np.float32
        )

    metric = np.full(_NSTATES, 1e6, dtype=np.float32)
    metric[0] = 0.0
    decisions = np.zeros((n_bits, _NSTATES), dtype=np.uint8)

    for t in range(n_bits):
        r0, r1 = coded[t]
        v0, v1 = valid[t]
        bm0 = (_E0[:, 0] != r0) * v0 + (_E0[:, 1] != r1) * v1
        bm1 = (_E1[:, 0] != r0) * v0 + (_E1[:, 1] != r1) * v1
        m0 = metric[_PRED0] + bm0
        m1 = metric[_PRED1] + bm1
        take1 = m1 < m0
        metric = np.where(take1, m1, m0)
        decisions[t] = take1
        if not (t & 0xFF):  # keep metrics bounded on long frames
            metric -= metric.min()

    s = int(np.argmin(metric))
    bits = np.empty(n_bits, dtype=np.uint8)
    for t in range(n_bits - 1, -1, -1):
        bits[t] = _BIT_OF[s]
        s = int(_PRED1[s] if decisions[t, s] else _PRED0[s])
    return bits


def viterbi_decode_soft(llrs: np.ndarray, n_bits: int) -> np.ndarray:
    """Soft-decision decode: ``llrs[2·n_bits]`` per-channel-bit LLRs
    (positive = bit 1, zero = erasure/punctured) → ``n_bits`` bits.

    Typically ~2 dB more sensitive than hard decisions on this K=7 code.
    Native C++ kernel when available; numpy ACS fallback."""
    from futuresdr_tpu.native import viterbi_r12_soft as _native

    res = _native(7, 0o133, 0o171, np.asarray(llrs), n_bits)
    if res is not None:
        return res
    llrs = np.asarray(llrs, dtype=np.float64).reshape(n_bits, 2)
    metric = np.full(_NSTATES, 1e6, dtype=np.float64)
    metric[0] = 0.0
    decisions = np.zeros((n_bits, _NSTATES), dtype=np.uint8)
    # cost of expecting bit e given llr l (positive favors 1): e ? -l : +l
    sgn0 = 1.0 - 2.0 * _E0  # [NS, 2] in {+1, -1}
    sgn1 = 1.0 - 2.0 * _E1
    for t in range(n_bits):
        l0, l1 = llrs[t]
        bm0 = sgn0[:, 0] * l0 + sgn0[:, 1] * l1
        bm1 = sgn1[:, 0] * l0 + sgn1[:, 1] * l1
        m0 = metric[_PRED0] + bm0
        m1 = metric[_PRED1] + bm1
        take1 = m1 < m0
        metric = np.where(take1, m1, m0)
        decisions[t] = take1
        if not (t & 0xFF):
            metric -= metric.min()
    s = int(np.argmin(metric))
    bits = np.empty(n_bits, dtype=np.uint8)
    for t in range(n_bits - 1, -1, -1):
        bits[t] = _BIT_OF[s]
        s = int(_PRED1[s] if decisions[t, s] else _PRED0[s])
    return bits


from functools import lru_cache as _lru


@_lru(maxsize=64)
def _pattern_cached(pattern: tuple, n_coded: int) -> np.ndarray:
    return np.resize(np.asarray(pattern, dtype=bool), n_coded)


def depuncture_soft(llrs: np.ndarray, pattern, n_coded: int) -> np.ndarray:
    """Soft companion of :func:`depuncture`: punctured positions get
    LLR 0 (no information)."""
    pat = _pattern_cached(tuple(np.asarray(pattern, bool).tolist()), n_coded)
    out = np.zeros(n_coded, dtype=np.float64)
    out[pat] = np.asarray(llrs, np.float64)[: int(pat.sum())]
    return out


def depuncture(received: np.ndarray, pattern, n_coded: int):
    """Insert erasure slots for punctured positions.

    ``received``: stream of surviving channel bits; returns
    ``(coded[n_coded], erasures[n_coded])`` aligned to the mother code."""
    pat = _pattern_cached(tuple(np.asarray(pattern, bool).tolist()), n_coded)
    coded = np.zeros(n_coded, dtype=np.uint8)
    coded[pat] = received[: int(pat.sum())]
    return coded, ~pat
