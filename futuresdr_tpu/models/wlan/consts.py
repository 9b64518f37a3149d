"""802.11a/g OFDM constants, generated from the standard's formulas.

Parity: ``examples/wlan/src/lib.rs`` (Mcs tables :223-313, FrameParam
:316-363, POLARITY :365-493, LONG :495+). Everything here is derived
programmatically from IEEE 802.11-2020 §17.3 rather than transcribed:
the pilot polarity sequence is the x⁷+x⁴+1 scrambler stream seeded
all-ones, the preambles are IFFTs of the standard subcarrier sequences,
and the interleaver is the two-permutation formula.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import numpy as np

N_FFT = 64
N_CP = 16
N_SYM = 80  # samples per OFDM symbol
N_DATA_CARRIERS = 48

# fftshift-domain indices (DC at 32): occupied −26..26 → 6..58
_OCCUPIED = [i for i in range(6, 59) if i != 32]
PILOT_IDX = [11, 25, 39, 53]  # −21, −7, +7, +21
DATA_IDX = [i for i in _OCCUPIED if i not in PILOT_IDX]
assert len(DATA_IDX) == N_DATA_CARRIERS

# pilot base values at (−21, −7, +7, +21): (1, 1, 1, −1)
PILOT_VALUES = np.array([1.0, 1.0, 1.0, -1.0], dtype=np.float32)


def _scrambler_stream(seed: int, n: int) -> np.ndarray:
    """x⁷+x⁴+1 LFSR output bits (encoder.rs:31-48 state convention)."""
    out = np.empty(n, dtype=np.uint8)
    state = seed & 0x7F
    for i in range(n):
        fb = ((state >> 6) ^ (state >> 3)) & 1
        out[i] = fb
        state = ((state << 1) & 0x7E) | fb
    return out


# pilot polarity p_0..p_126 (lib.rs:365-493): scrambler seeded all-ones
POLARITY = (1.0 - 2.0 * _scrambler_stream(0x7F, 127).astype(np.float32))


def _shifted_spectrum(pairs: Dict[int, complex]) -> np.ndarray:
    """{subcarrier k: value} → fftshift-order length-64 spectrum."""
    s = np.zeros(N_FFT, dtype=np.complex64)
    for k, v in pairs.items():
        s[k + 32] = v
    return s


# LTF frequency-domain sequence L_{−26..26} (±1)
_L = [
    1, 1, -1, -1, 1, 1, -1, 1, -1, 1, 1, 1, 1, 1, 1, -1, -1, 1, 1, -1,
    1, -1, 1, 1, 1, 1,
    0,
    1, -1, -1, 1, 1, -1, 1, -1, 1, -1, -1, -1, -1, -1, 1, 1, -1, -1, 1,
    -1, 1, -1, 1, 1, 1, 1,
]
LONG_FREQ_SHIFTED = _shifted_spectrum(
    {k: _L[k + 26] for k in range(-26, 27)}
)

# STF frequency-domain: √(13/6)·(1+j)·pattern on ±{4,8,12,16,20,24}
_S_PATTERN = {
    -24: 1, -20: -1, -16: 1, -12: -1, -8: -1, -4: 1,
    4: -1, 8: -1, 12: 1, 16: 1, 20: 1, 24: 1,
}
SHORT_FREQ_SHIFTED = _shifted_spectrum(
    {k: np.sqrt(13.0 / 6.0) * (1 + 1j) * v for k, v in _S_PATTERN.items()}
)


def _ifft_shifted(spec_shifted: np.ndarray) -> np.ndarray:
    """Time-domain symbol from an fftshift-order spectrum (52/64 scaling
    convention of the standard: plain IFFT × 64/… — we use numpy ifft·64
    normalization so TX·RX round-trips with unit gain)."""
    return np.fft.ifft(np.fft.ifftshift(spec_shifted)).astype(np.complex64)


LONG_TIME = _ifft_shifted(LONG_FREQ_SHIFTED)  # 64 samples, one period
SHORT_TIME = _ifft_shifted(SHORT_FREQ_SHIFTED)[:16]  # 16-sample period

# matched-filter reference used by sync_long (sync_long.rs:198+: the
# conjugated, time-reversed? — reference correlates sum(input[i+k]·LONG[k])
# where LONG is the *conjugate* time sequence)
LONG_CORR = np.conj(LONG_TIME)


@dataclass(frozen=True)
class Mcs:
    """One modulation-and-coding scheme (lib.rs:223-313)."""

    name: str
    n_bpsc: int  # bits per subcarrier
    n_cbps: int  # coded bits per symbol
    n_dbps: int  # data bits per symbol
    rate_field: int  # SIGNAL RATE bits value (lib.rs:284-297)
    puncture: Tuple[int, ...]  # depuncture pattern (lib.rs:235-241)


MCS: Dict[str, Mcs] = {
    m.name: m
    for m in [
        Mcs("bpsk12", 1, 48, 24, 0x0D, (1, 1)),
        Mcs("bpsk34", 1, 48, 36, 0x0F, (1, 1, 1, 0, 0, 1)),
        Mcs("qpsk12", 2, 96, 48, 0x05, (1, 1)),
        Mcs("qpsk34", 2, 96, 72, 0x07, (1, 1, 1, 0, 0, 1)),
        Mcs("qam16_12", 4, 192, 96, 0x09, (1, 1)),
        Mcs("qam16_34", 4, 192, 144, 0x0B, (1, 1, 1, 0, 0, 1)),
        Mcs("qam64_23", 6, 288, 192, 0x01, (1, 1, 1, 0)),
        Mcs("qam64_34", 6, 288, 216, 0x03, (1, 1, 1, 0, 0, 1)),
    ]
}

# SIGNAL rate bits → Mcs (frame_equalizer.rs:160-173: the 4 bits are
# received LSB-first as an integer r)
RATE_TO_MCS: Dict[int, Mcs] = {}
for _m in MCS.values():
    # r is the bit-reversed nibble of rate_field's 4 rate bits
    r = int(f"{_m.rate_field:04b}"[::-1], 2)
    RATE_TO_MCS[r] = _m


@dataclass(frozen=True)
class FrameParam:
    """Derived frame geometry (lib.rs:316-363)."""

    mcs: Mcs
    psdu_size: int

    @property
    def n_symbols(self) -> int:
        bits = 16 + 8 * self.psdu_size + 6
        return -(-bits // self.mcs.n_dbps)

    @property
    def n_data_bits(self) -> int:
        return self.n_symbols * self.mcs.n_dbps

    @property
    def n_pad(self) -> int:
        return self.n_data_bits - (16 + 8 * self.psdu_size + 6)


def interleaver_permutation(n_cbps: int, n_bpsc: int) -> np.ndarray:
    """TX interleaver mapping: output index for each input index k
    (two-permutation formula, §17.3.5.7). Returns ``perm`` such that
    ``interleaved[perm[k]] = coded[k]``."""
    s = max(n_bpsc // 2, 1)
    k = np.arange(n_cbps)
    i = (n_cbps // 16) * (k % 16) + (k // 16)
    j = s * (i // s) + (i + n_cbps - (16 * i) // n_cbps) % s
    return j


# hard-decision Gray maps (§17.3.5.8); index = bits (LSB-first per axis)
def _gray_levels(n_bpsc_half: int) -> np.ndarray:
    if n_bpsc_half == 0:
        return np.array([0.0])
    if n_bpsc_half == 1:
        return np.array([-1.0, 1.0])
    if n_bpsc_half == 2:
        return np.array([-3.0, -1.0, 3.0, 1.0])  # bits b0b1: 00,01,10,11
    return np.array([-7.0, -5.0, -1.0, -3.0, 7.0, 5.0, 1.0, 3.0])


MOD_NORM = {1: 1.0, 2: np.sqrt(2.0), 4: np.sqrt(10.0), 6: np.sqrt(42.0)}


def map_bits_to_symbols(bits: np.ndarray, n_bpsc: int) -> np.ndarray:
    """Chunk bits per subcarrier → complex constellation points."""
    bits = bits.reshape(-1, n_bpsc)
    if n_bpsc == 1:
        return (2.0 * bits[:, 0] - 1.0).astype(np.complex64)
    half = n_bpsc // 2
    lev = _gray_levels(half)
    # b0 is the FIRST bit in the stream and the MSB of the level index
    # (§17.3.5.8 table order "b0 b1 b2")
    idx_i = np.zeros(len(bits), dtype=np.int64)
    idx_q = np.zeros(len(bits), dtype=np.int64)
    for b in range(half):
        idx_i |= bits[:, b].astype(np.int64) << (half - 1 - b)
        idx_q |= bits[:, half + b].astype(np.int64) << (half - 1 - b)
    return ((lev[idx_i] + 1j * lev[idx_q]) / MOD_NORM[n_bpsc]).astype(
        np.complex64
    )


def demap_hard(sym: np.ndarray, n_bpsc: int) -> np.ndarray:
    """Hard demap → bits [n_sym·n_bpsc] (min-distance on the Gray grid)."""
    if n_bpsc == 1:
        return (sym.real > 0).astype(np.uint8)
    half = n_bpsc // 2
    lev = _gray_levels(half) / MOD_NORM[n_bpsc]
    order = np.argsort(lev)
    edges = (lev[order][1:] + lev[order][:-1]) / 2.0

    def axis_bits(v):
        idx_sorted = np.searchsorted(edges, v)
        idx = order[idx_sorted]
        shifts = half - 1 - np.arange(half)
        return ((idx[:, None] >> shifts) & 1).astype(np.uint8)

    bi = axis_bits(sym.real)
    bq = axis_bits(sym.imag)
    return np.concatenate([bi, bq], axis=1).reshape(-1)


def demap_soft(sym: np.ndarray, n_bpsc: int) -> np.ndarray:
    """Max-log bit LLRs [n_sym·n_bpsc], positive = bit 1.

    Per Gray axis: LLR_i = min over bit-0 levels of (v-x)^2 minus the
    bit-1 min (so the hard decision is the LLR sign). The soft-Viterbi
    companion of :func:`demap_hard`."""
    if n_bpsc == 1:
        return (2.0 * np.asarray(sym).real).astype(np.float64)
    half = n_bpsc // 2
    lev = _gray_levels(half) / MOD_NORM[n_bpsc]  # index = bit pattern
    shifts = half - 1 - np.arange(half)
    bits_of_lev = ((np.arange(len(lev))[:, None] >> shifts) & 1).astype(
        bool
    )  # [n_lev, half]

    def axis_llrs(v: np.ndarray) -> np.ndarray:
        d2 = (v[:, None] - lev[None, :]) ** 2  # [n_sym, n_lev]
        out = np.empty((len(v), half))
        for i in range(half):
            m1 = d2[:, bits_of_lev[:, i]].min(axis=1)
            m0 = d2[:, ~bits_of_lev[:, i]].min(axis=1)
            out[:, i] = m0 - m1
        return out

    sym = np.asarray(sym)
    li = axis_llrs(sym.real)
    lq = axis_llrs(sym.imag)
    return np.concatenate([li, lq], axis=1).reshape(-1)


from functools import lru_cache as _lru


@_lru(maxsize=256)
def _scrambler_cached(seed: int, n: int) -> np.ndarray:
    return _scrambler_stream(seed, n)


def scrambler_stream(seed: int, n: int) -> np.ndarray:
    # 127 possible seeds x few frame lengths: cache the pure-python LFSR
    # walk (it was ~25% of the per-frame host decode time)
    return _scrambler_cached(int(seed), int(n))
