"""Binary BCH codec (parity: ``examples/rattlegram/src/bch.rs``).

The reference protects the 55-bit metadata + CRC16 of its preamble
symbol with a BCH(255, 71) code built from an explicit list of minimal
polynomials (``encoder.rs:80-105``; the first entry, 0b100011101 =
x⁸+x⁴+x³+x²+1, is also the GF(2⁸) field polynomial). This module
reimplements that construction — generator = product of the minimal
polynomials — and adds the decoder the reference app leaves to the
receiver side: syndromes → Berlekamp–Massey → Chien search, correcting
up to t bit errors (t discovered from the generator's consecutive root
run, so any minimal-polynomial list works).

Host-side numpy/ints: BCH here guards tiny headers, not sample streams.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

# the reference's minimal-polynomial list for BCH(255, 71)
# (encoder.rs:80-105)
RATTLEGRAM_MIN_POLYS: Tuple[int, ...] = (
    0b100011101,
    0b101110111,
    0b111110011,
    0b101101001,
    0b110111101,
    0b111100111,
    0b100101011,
    0b111010111,
    0b000010011,
    0b101100101,
    0b110001011,
    0b101100011,
    0b100011011,
    0b100111111,
    0b110001101,
    0b100101101,
    0b101011111,
    0b111111001,
    0b111000011,
    0b100111001,
    0b110101001,
    0b000011111,
    0b110000111,
    0b110110001,
)

_FIELD_POLY = 0b100011101  # GF(2^8) primitive polynomial


def _gf_tables():
    exp = np.zeros(512, np.int64)
    log = np.zeros(256, np.int64)
    x = 1
    for i in range(255):
        exp[i] = x
        log[x] = i
        x <<= 1
        if x & 0x100:
            x ^= _FIELD_POLY
    exp[255:510] = exp[0:255]
    return exp, log


_EXP, _LOG = _gf_tables()


def _gf_mul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return int(_EXP[_LOG[a] + _LOG[b]])


def _poly_mul_gf2(a: int, b: int) -> int:
    """Carry-less multiply of GF(2)[x] polynomials as bit masks."""
    out = 0
    while b:
        if b & 1:
            out ^= a
        a <<= 1
        b >>= 1
    return out


class Bch:
    """Systematic binary BCH over GF(2⁸), LEN=255 (bch.rs:5-86)."""

    LEN = 255

    def __init__(
        self,
        minimal_polynomials: Sequence[int] = RATTLEGRAM_MIN_POLYS,
        msg_bits: int = 71,
    ):
        g = 1
        for m in minimal_polynomials:
            g = _poly_mul_gf2(g, int(m))
        self.generator = g
        self.np_bits = g.bit_length() - 1  # parity bits
        self.msg_bits = int(msg_bits)
        if self.msg_bits + self.np_bits != self.LEN:
            raise ValueError(
                f"msg {self.msg_bits} + parity {self.np_bits} != {self.LEN}"
            )
        # designed correction capability: longest consecutive root run
        # alpha^1, alpha^2, ... of the generator
        run = 0
        i = 1
        while self._g_has_root(i):
            run += 1
            i += 1
        self.t = run // 2
        if self.t == 0:
            raise ValueError("generator has no alpha^1 root run")

    def _g_has_root(self, power: int) -> bool:
        acc = 0
        a = int(_EXP[power % 255])
        ax = 1
        g = self.generator
        for d in range(self.np_bits + 1):
            if (g >> d) & 1:
                acc ^= ax
            ax = _gf_mul(ax, a)
        return acc == 0

    # ---- encode ----------------------------------------------------------
    def parity(self, msg: np.ndarray) -> np.ndarray:
        """71 message bits (MSB-first like the reference's be_bit order)
        → 184 parity bits: remainder of msg·x^NP mod g (bch.rs:62-86 is
        the same LFSR division)."""
        msg = np.asarray(msg, np.uint8)
        if len(msg) != self.msg_bits:
            raise ValueError(f"expected {self.msg_bits} message bits")
        rem = 0
        npb = self.np_bits
        top = 1 << (npb - 1)
        g_low = self.generator & ((1 << npb) - 1)
        for b in msg:
            fb = ((rem & top) != 0) ^ int(b)
            rem = (rem << 1) & ((1 << npb) - 1)
            if fb:
                rem ^= g_low
        out = np.empty(npb, np.uint8)
        for i in range(npb):
            out[i] = (rem >> (npb - 1 - i)) & 1
        return out

    def encode(self, msg: np.ndarray) -> np.ndarray:
        """[255] systematic codeword: message then parity."""
        msg = np.asarray(msg, np.uint8)
        return np.concatenate([msg, self.parity(msg)])

    # ---- decode ----------------------------------------------------------
    def decode(self, recv: np.ndarray) -> Tuple[np.ndarray, int]:
        """Correct up to ``t`` bit errors in a [255] hard-decision word.

        Returns ``(corrected_codeword, n_corrected)``;
        ``n_corrected = -1`` when decoding fails (too many errors)."""
        r = np.asarray(recv, np.uint8).copy()
        if len(r) != self.LEN:
            raise ValueError(f"expected {self.LEN} bits")
        n2t = 2 * self.t
        # syndromes S_i = r(alpha^i); bit j is the coefficient of
        # x^(LEN-1-j) (MSB-first systematic order)
        ones = np.nonzero(r)[0]
        syndromes = []
        for i in range(1, n2t + 1):
            s = 0
            for j in ones:
                s ^= int(_EXP[(i * (self.LEN - 1 - int(j))) % 255])
            syndromes.append(s)
        if not any(syndromes):
            return r, 0
        # Berlekamp–Massey for the error locator polynomial
        C = [1] + [0] * n2t
        B = [1] + [0] * n2t
        L, m, b = 0, 1, 1
        for n in range(n2t):
            d = syndromes[n]
            for i in range(1, L + 1):
                d ^= _gf_mul(C[i], syndromes[n - i])
            if d == 0:
                m += 1
            elif 2 * L <= n:
                T = C[:]
                coef = _gf_mul(d, _EXP[255 - _LOG[b]])
                for i in range(n2t + 1 - m):
                    C[i + m] ^= _gf_mul(coef, B[i])
                L, B, b, m = n + 1 - L, T, d, 1
            else:
                coef = _gf_mul(d, _EXP[255 - _LOG[b]])
                for i in range(n2t + 1 - m):
                    C[i + m] ^= _gf_mul(coef, B[i])
                m += 1
        if L > self.t:
            return r, -1
        # Chien search: roots of C give error locations
        n_found = 0
        for pos in range(self.LEN):
            # evaluate C at alpha^{-(LEN-1-pos)} = alpha^{pos-LEN+1}
            xinv = int(_EXP[(255 - (self.LEN - 1 - pos)) % 255])
            acc = 0
            xp = 1
            for c in C[: L + 1]:
                if c:
                    acc ^= _gf_mul(c, xp)
                xp = _gf_mul(xp, xinv)
            if acc == 0:
                r[pos] ^= 1
                n_found += 1
        if n_found != L:
            return np.asarray(recv, np.uint8), -1
        return r, n_found

    def decode_message(self, recv: np.ndarray) -> Tuple[np.ndarray, int]:
        """Convenience: corrected message bits + error count (-1 = fail)."""
        cw, n = self.decode(recv)
        return cw[: self.msg_bits], n
