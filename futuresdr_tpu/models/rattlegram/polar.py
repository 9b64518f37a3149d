"""Polar codes: systematic encoding + successive-cancellation decoding.

Parity: ``examples/rattlegram/src/polar.rs`` (systematic polar encoder /
decoder for the COFDMTV waveform, CODE_ORDER 11). Fresh implementation of
the textbook algorithms:

* frozen set by Bhattacharyya parameter construction (BEC heuristic),
* systematic encoding via the encode→re-freeze→encode identity,
* min-sum successive cancellation over an LLR tree (vectorized per
  stage; the bit-order loop is host python — ~N log N ops).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import numpy as np


@lru_cache(maxsize=None)
def frozen_mask(order: int, data_bits: int, design_erasure: float = 0.5):
    """Boolean mask [N]: True = frozen. The ``data_bits`` most reliable
    channels (smallest Bhattacharyya parameter) carry data.

    Channel i's parameter folds the BEC recursion over i's bits MSB→LSB
    (z² for bit 1, 2z−z² for bit 0) — the ordering that matches the
    natural-order butterfly in :func:`_polar_transform` (verified
    empirically: the bit-reversed pairing costs ~10 dB)."""
    n = 1 << order
    z = np.empty(n, dtype=np.float64)
    for i in range(n):
        zz = design_erasure
        for b in range(order - 1, -1, -1):
            if (i >> b) & 1:
                zz = zz * zz
            else:
                zz = 2.0 * zz - zz * zz
        z[i] = zz
    order_idx = np.argsort(z, kind="stable")  # most reliable first
    frozen = np.ones(n, dtype=bool)
    frozen[order_idx[:data_bits]] = False
    return frozen


def _polar_transform(u: np.ndarray) -> np.ndarray:
    """x = u·Gₙ over GF(2), Gₙ = F^{⊗order} (butterfly, no bit reversal)."""
    x = u.copy()
    n = len(x)
    h = 1
    while h < n:
        for i in range(0, n, 2 * h):
            x[i : i + h] ^= x[i + h : i + 2 * h]
        h *= 2
    return x


def polar_encode_systematic(
    message: np.ndarray, frozen: np.ndarray
) -> np.ndarray:
    """Systematic encoding: codeword bits at non-frozen positions equal
    the message (encode → zero frozen → encode, polar.rs parity)."""
    n = len(frozen)
    u = np.zeros(n, dtype=np.uint8)
    u[~frozen] = np.asarray(message, dtype=np.uint8)
    x = _polar_transform(u)
    x[frozen] = 0
    return _polar_transform(x)


def _f_minsum(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.sign(a) * np.sign(b) * np.minimum(np.abs(a), np.abs(b))


def _g(a: np.ndarray, b: np.ndarray, u: np.ndarray) -> np.ndarray:
    return b + (1.0 - 2.0 * u) * a


def polar_decode_sc(
    llr: np.ndarray, frozen: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
    """Successive-cancellation decode.

    ``llr``: channel LLRs (positive → bit 0). Returns ``(message_bits,
    codeword_estimate)`` — with systematic encoding the message is read
    from the re-encoded codeword at non-frozen positions."""
    n = len(frozen)

    def decode(llrs: np.ndarray, fr: np.ndarray) -> np.ndarray:
        if len(llrs) == 1:
            if fr[0]:
                return np.zeros(1, np.uint8)
            return np.array([0 if llrs[0] >= 0 else 1], np.uint8)
        half = len(llrs) // 2
        a, b = llrs[:half], llrs[half:]
        u1 = decode(_f_minsum(a, b), fr[:half])
        u2 = decode(_g(a, b, _polar_transform(u1).astype(np.float64)), fr[half:])
        return np.concatenate([u1, u2])

    u = decode(np.asarray(llr, np.float64), np.asarray(frozen, bool))
    x = _polar_transform(u)
    return x[~frozen].astype(np.uint8), x


def polar_decode_scl(
    llr: np.ndarray,
    frozen: np.ndarray,
    list_size: int = 8,
    crc_fn=None,
) -> Tuple[np.ndarray, np.ndarray, bool]:
    """CRC-aided successive-cancellation LIST decoding
    (``polar.rs:306+`` ``PolarListDecoder`` parity; LLR-based SCL after
    Stimming et al., path axis vectorized in numpy).

    Keeps the ``list_size`` best partial decodes; the winner is the
    lowest-metric path whose message satisfies ``crc_fn`` (falling back
    to the best metric when none passes). Returns ``(message_bits,
    codeword_estimate, crc_ok)``. Typically worth ~1-2 dB of sensitivity
    over plain SC at L=8."""
    llr = np.asarray(llr, np.float64)
    frozen = np.asarray(frozen, bool)
    n = len(frozen)
    m = n.bit_length() - 1
    L = int(list_size)
    if L <= 1:
        msg, x = polar_decode_sc(llr, frozen)
        ok = bool(crc_fn(msg)) if crc_fn is not None else True
        return msg, x, ok

    # native SCL (C++, Tal–Vardy CoW banks): the pure-numpy walk below
    # measured ~151 ms per N=2048/L=8 frame — 97% of the rattlegram
    # receiver's wall time; the C path is the same algorithm (same
    # min-sum/exact-g, same stable survivor sort) ~40× faster. The
    # numpy implementation stays as the no-toolchain fallback AND the
    # cross-validation reference (tests pin equality).
    from futuresdr_tpu import native as _native

    nat = _native.polar_scl_decode(llr, frozen, L)
    if nat is not None:
        x_paths, _pm = nat
        best = None
        for x in x_paths:
            msg = x[~frozen].astype(np.uint8)
            if best is None:
                best = (msg, x)
            if crc_fn is not None and crc_fn(msg):
                return msg, x, True
        return best[0], best[1], (crc_fn is None)
    INF = 1e30

    # per-layer LLR / bit memories, path axis first (layer m = leaves)
    P = [np.zeros((L, n >> d)) for d in range(m + 1)]
    C = [np.zeros((L, 2, n >> d), np.uint8) for d in range(m + 1)]
    pm = np.full(L, INF)
    pm[0] = 0.0
    P[0][:] = llr[None, :]
    u_leaf = np.zeros((L, n), np.uint8)

    def calc_P(lam: int, phi: int) -> None:
        if lam == 0:
            return
        if phi % 2 == 0:
            calc_P(lam - 1, phi >> 1)
        half = n >> lam
        a = P[lam - 1][:, :half]
        b = P[lam - 1][:, half : 2 * half]
        if phi % 2 == 0:
            P[lam][:] = _f_minsum(a, b)
        else:
            u = C[lam][:, 0, :].astype(np.float64)
            P[lam][:] = _g(a, b, u)

    def update_C(lam: int, phi: int) -> None:
        # phi odd: fold this node's bits into the parent
        psi = phi >> 1
        half = n >> lam
        left = C[lam][:, 0, :]
        right = C[lam][:, 1, :]
        C[lam - 1][:, psi % 2, :half] = left ^ right
        C[lam - 1][:, psi % 2, half : 2 * half] = right
        if psi % 2 == 1:
            update_C(lam - 1, psi)

    for phi in range(n):
        calc_P(m, phi)
        leaf = P[m][:, 0]  # [L]
        mag = np.abs(leaf)
        if frozen[phi]:
            pm = pm + np.where(leaf < 0, mag, 0.0)
            bits = np.zeros(L, np.uint8)
        else:
            pm0 = pm + np.where(leaf < 0, mag, 0.0)  # choose 0
            pm1 = pm + np.where(leaf >= 0, mag, 0.0)  # choose 1
            both = np.concatenate([pm0, pm1])  # [2L]
            keep = np.argsort(both, kind="stable")[:L]
            src = keep % L
            bits = (keep >= L).astype(np.uint8)
            pm = both[keep]
            # permute every per-path memory to the surviving paths
            for d in range(m + 1):
                P[d] = P[d][src]
                C[d] = C[d][src]
            u_leaf = u_leaf[src]
        u_leaf[:, phi] = bits
        C[m][:, phi % 2, 0] = bits
        if phi % 2 == 1:
            update_C(m, phi)

    order = np.argsort(pm, kind="stable")
    best = None
    for li in order:
        x = _polar_transform(u_leaf[li].copy())
        msg = x[~frozen].astype(np.uint8)
        if best is None:
            best = (msg, x)
        if crc_fn is not None and crc_fn(msg):
            return msg, x, True
    return best[0], best[1], (crc_fn is None)
