"""LoRa PHY: CSS modulation + the full coding chain.

Parity: ``examples/lora/src/{modulator,encoder,gray_mapping,deinterleaver,
hamming_dec,header_decoder,decoder,fft_demod,frame_sync}.rs`` (the
reference ports EPFL's gr-lora_sdr; this is a fresh implementation of the
same published algorithm).

TPU-first shape: demodulation is *one batched device computation* — every
candidate symbol window is dechirped (conjugate base chirp multiply) and
FFT'd in a single ``[n_sym, N]`` matmul-FFT; symbol decisions are argmax
bins. Frame sync scans the dechirped-bin sequence for the constant
preamble run on the host (tiny), the way sync_short's threshold machine
is host logic in the WLAN RX.

A symbol carries ``SF`` bits (header block: ``SF−2``); chirps are cyclic
shifts of the base upchirp ``u[n] = exp(jπ·n(n−N)/N)``, ``N = 2^SF``.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from futuresdr_tpu.models.streaming import StreamingReceiver
from futuresdr_tpu.ops import cplx
from futuresdr_tpu.ops.cplx import CArray
from futuresdr_tpu.ops.fft import fft_c


# ---------------------------------------------------------------------------
# tables
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def whitening_sequence(n: int) -> np.ndarray:
    """LoRa payload whitening bytes (LFSR x⁸+x⁶+x⁵+x⁴+1, seed 0xFF)."""
    out = np.empty(n, dtype=np.uint8)
    state = 0xFF
    for i in range(n):
        out[i] = state
        b = (
            ((state >> 7) ^ (state >> 5) ^ (state >> 4) ^ (state >> 3)) & 1
        )
        state = ((state << 1) & 0xFF) | b
    return out


def gray_encode(v: np.ndarray) -> np.ndarray:
    return v ^ (v >> 1)


def gray_decode(g: np.ndarray) -> np.ndarray:
    v = np.asarray(g).copy()
    res = v.copy()
    v = v >> 1
    while v.any():
        res ^= v
        v >>= 1
    return res


# Hamming(4, 4+CR): data nibble d3 d2 d1 d0 (d3 = MSB)
def _parities(d: np.ndarray) -> Tuple[np.ndarray, ...]:
    d0 = d & 1
    d1 = (d >> 1) & 1
    d2 = (d >> 2) & 1
    d3 = (d >> 3) & 1
    p0 = d0 ^ d1 ^ d2
    p1 = d1 ^ d2 ^ d3
    p2 = d0 ^ d1 ^ d3
    p3 = d0 ^ d2 ^ d3
    p4 = d0 ^ d1 ^ d2 ^ d3
    return p0, p1, p2, p3, p4


def hamming_encode(nibbles: np.ndarray, cr: int) -> np.ndarray:
    """[k] nibbles → [k] codewords of 4+cr bits (int-packed, bit 0 = d0)."""
    d = nibbles.astype(np.int64)
    p0, p1, p2, p3, p4 = _parities(d)
    cw = d.copy()
    if cr == 1:
        cw |= p4 << 4
    elif cr == 2:
        cw |= (p0 << 4) | (p1 << 5)
    elif cr == 3:
        cw |= (p0 << 4) | (p1 << 5) | (p2 << 6)
    elif cr == 4:
        cw |= (p0 << 4) | (p1 << 5) | (p2 << 6) | (p3 << 7)
    else:
        raise ValueError("cr must be 1..4")
    return cw


@lru_cache(maxsize=None)
def _syndrome_table(cr: int) -> np.ndarray:
    """For cr≥3: map received codeword → corrected nibble via nearest
    valid codeword (Hamming distance ≤ 1 guaranteed correctable)."""
    n_bits = 4 + cr
    valid = hamming_encode(np.arange(16), cr)
    table = np.zeros(1 << n_bits, dtype=np.uint8)
    dist = np.full(1 << n_bits, 99, dtype=np.int64)
    for nib, cw in enumerate(valid):
        for flip in range(-1, n_bits):
            r = cw if flip < 0 else cw ^ (1 << flip)
            d = 0 if flip < 0 else 1
            if d < dist[r]:
                dist[r] = d
                table[r] = nib
    return table


def hamming_decode(cws: np.ndarray, cr: int) -> np.ndarray:
    if cr >= 3:
        return _syndrome_table(cr)[cws.astype(np.int64)]
    return (cws & 0xF).astype(np.uint8)


def _crc16(data: bytes) -> int:
    """CCITT CRC16 (poly 0x1021) as used for the LoRa payload CRC."""
    crc = 0x0000
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x1021) if crc & 0x8000 else (crc << 1)
            crc &= 0xFFFF
    return crc


# ---------------------------------------------------------------------------
# interleaver: sf_app codewords × cw_len bits → cw_len symbols × sf_app bits
# ---------------------------------------------------------------------------


def interleave_block(cws: np.ndarray, sf_app: int, cw_len: int) -> np.ndarray:
    """Diagonal interleaver: bit j of codeword i lands in symbol j at bit
    position (i + j) mod sf_app. Returns [cw_len] symbol values."""
    assert len(cws) == sf_app
    bits = (cws[:, None] >> np.arange(cw_len)[None, :]) & 1  # [sf_app, cw]
    syms = np.zeros(cw_len, dtype=np.int64)
    for j in range(cw_len):
        for i in range(sf_app):
            syms[j] |= int(bits[i, j]) << ((i + j) % sf_app)
    return syms


def deinterleave_block(
    syms: np.ndarray, sf_app: int, cw_len: int
) -> np.ndarray:
    """Inverse of :func:`interleave_block`: [cw_len] symbols → [sf_app]
    codewords."""
    cws = np.zeros(sf_app, dtype=np.int64)
    for j in range(cw_len):
        for i in range(sf_app):
            bit = (int(syms[j]) >> ((i + j) % sf_app)) & 1
            cws[i] |= bit << j
    return cws


# ---------------------------------------------------------------------------
# chirps
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def base_upchirp(sf: int) -> np.ndarray:
    n = 1 << sf
    k = np.arange(n, dtype=np.float64)
    return np.exp(1j * np.pi * k * (k - n) / n).astype(np.complex64)


def chirp(sf: int, sym: int) -> np.ndarray:
    u = base_upchirp(sf)
    return np.roll(u, -int(sym))


@lru_cache(maxsize=None)
def chirp_os(sf: int, sym: int, os: int) -> np.ndarray:
    """Oversampled CSS symbol at fs = os·BW: the folded-frequency chirp
    (parity: ``utils.rs:884-914`` build_upchirp — frequency ramps from
    ``sym/N − 0.5`` cycles/sample, wrapping at the fold ``(N−sym)·os``).
    At os=1, sym=0 this reduces exactly to :func:`base_upchirp`."""
    n = 1 << sf
    j = np.arange(n * os, dtype=np.float64)
    t = j / os
    fold = (n - sym) * os
    ph_lo = 2.0 * np.pi * (t * t / (2.0 * n) + (sym / n - 0.5) * t)
    ph_hi = 2.0 * np.pi * (t * t / (2.0 * n) + (sym / n - 1.5) * t)
    return np.exp(1j * np.where(j < fold, ph_lo, ph_hi)).astype(
        np.complex64
    )


@dataclass(frozen=True)
class LoraConfig:
    sf: int = 7
    cr: int = 4  # 1..4 → rates 4/5..4/8
    preamble_len: int = 8
    sync_word: int = 0x12
    has_crc: bool = True
    # low-data-rate optimization (utils.rs LdroMode): payload blocks drop
    # to sf-2 bits/symbol (same reduced-rate trick as the header) so long
    # symbols tolerate clock drift; both ends must agree, as in hardware
    ldro: bool = False
    # implicit header mode (encoder.rs:13, header_decoder.rs:162): the
    # 5 PHY-header nibbles are omitted; the first (still reduced-rate,
    # CR 4/8) block carries payload nibbles directly, and the receiver
    # takes payload_len / cr / has_crc from this shared config
    # CAUTION: implicit mode with has_crc=False has ZERO integrity gating —
    # no header checksum and no payload CRC, so any false sync that
    # survives the sync-word check emits a garbage LoraFrame whose
    # crc_ok=True is vacuous (protocol-inherent; hardware behaves the same)
    implicit_header: bool = False
    payload_len: int = 0  # required at RX when implicit_header

    @property
    def n(self) -> int:
        return 1 << self.sf


# ---------------------------------------------------------------------------
# TX
# ---------------------------------------------------------------------------


def _bytes_to_nibbles(data: bytes) -> np.ndarray:
    arr = np.frombuffer(data, dtype=np.uint8)
    out = np.empty(2 * len(arr), dtype=np.uint8)
    out[0::2] = arr & 0xF  # low nibble first
    out[1::2] = arr >> 4
    return out


def _nibbles_to_bytes(nib: np.ndarray) -> bytes:
    nib = np.asarray(nib, dtype=np.uint8)
    if len(nib) % 2:
        nib = np.concatenate([nib, [0]])
    return bytes((nib[0::2] | (nib[1::2] << 4)).astype(np.uint8))


def _header_nibbles(cfg: LoraConfig, payload_len: int) -> np.ndarray:
    """Explicit header: length(8) + cr(3)+crc(1) + 4-bit checksum
    (header_decoder.rs semantics, self-consistent checksum)."""
    n0 = (payload_len >> 4) & 0xF
    n1 = payload_len & 0xF
    n2 = ((cfg.cr << 1) | (1 if cfg.has_crc else 0)) & 0xF
    chk = (n0 ^ n1 ^ n2) & 0xF
    return np.array([n0, n1, n2, chk, 0], dtype=np.uint8)


def encode_symbols(cfg: LoraConfig, payload: bytes) -> np.ndarray:
    """Payload → data symbol values (header block + payload blocks)."""
    sf = cfg.sf
    # --- first block: sf_app = sf-2, CR 4/8 always (carries the explicit
    # header, or payload nibbles directly in implicit mode) --------------
    if cfg.implicit_header:
        if cfg.payload_len > 0 and len(payload) != cfg.payload_len:
            # implicit mode has no on-air length field — the receiver is
            # preconfigured with cfg.payload_len, so a mismatch would be
            # silently encoded and mis-decoded on every frame
            raise ValueError(
                f"implicit-header payload length {len(payload)} != "
                f"configured cfg.payload_len {cfg.payload_len}"
            )
        hdr = np.zeros(0, dtype=np.uint8)
    else:
        hdr = _header_nibbles(cfg, len(payload))
    # --- payload (+ CRC16), whitened ------------------------------------
    wh = whitening_sequence(len(payload))
    body = bytes(np.frombuffer(payload, np.uint8) ^ wh[: len(payload)])
    if cfg.has_crc:
        crc = _crc16(payload)
        body = body + bytes([crc & 0xFF, crc >> 8])
    nibbles = _bytes_to_nibbles(body)

    sf_app_hdr = sf - 2
    # first block holds sf-2 codewords: (0 or 5) header nibbles + payload
    # nibbles fill the rest
    n_hdr_payload = sf_app_hdr - len(hdr)
    if n_hdr_payload < 0:
        raise ValueError("sf must be ≥ 7 for explicit header")
    first = np.concatenate([hdr, nibbles[:n_hdr_payload]])
    if len(first) < sf_app_hdr:
        first = np.concatenate(
            [first, np.zeros(sf_app_hdr - len(first), np.uint8)]
        )
    rest = nibbles[n_hdr_payload:]

    syms: List[int] = []
    hdr_cws = hamming_encode(first, 4)  # header CR 4/8
    hdr_syms = interleave_block(hdr_cws, sf_app_hdr, 8)
    # reduced-rate header symbols: value·4 so ±bin errors stay decodable
    syms.extend((gray_decode(hdr_syms) << 2).tolist())

    cw_len = 4 + cfg.cr
    sf_p = sf - 2 if cfg.ldro else sf  # LDRO: reduced-rate payload blocks
    pad = (-len(rest)) % sf_p
    rest = np.concatenate([rest, np.zeros(pad, np.uint8)])
    for blk in rest.reshape(-1, sf_p):
        cws = hamming_encode(blk, cfg.cr)
        bsyms = interleave_block(cws, sf_p, cw_len)
        s = gray_decode(bsyms)
        if cfg.ldro:
            s = s << 2
        syms.extend(s.tolist())
    return np.asarray(syms, dtype=np.int64)


def modulate_frame(
    cfg: LoraConfig, payload: bytes, oversample: int = 1
) -> np.ndarray:
    """Full baseband frame at fs = oversample·BW: preamble + sync +
    2.25 downchirps + data chirps. ``oversample=1`` keeps the exact
    round-1 waveform (roll-based chirps); ``oversample>1`` uses the
    folded-frequency chirp (``utils.rs:884-914`` parity) — real LoRa
    captures are essentially always fs > BW
    (``frame_sync.rs:83`` m_os_factor)."""
    n = cfg.n
    os = int(oversample)
    s1 = ((cfg.sync_word >> 4) & 0xF) << 3
    s2 = (cfg.sync_word & 0xF) << 3
    if os == 1:
        u = base_upchirp(cfg.sf)
        d = np.conj(u)
        parts = [np.tile(u, cfg.preamble_len)]
        parts += [chirp(cfg.sf, s1), chirp(cfg.sf, s2)]
        parts += [d, d, d[: n // 4]]
        for s in encode_symbols(cfg, payload):
            parts.append(chirp(cfg.sf, int(s)))
        return np.concatenate(parts).astype(np.complex64)
    u = chirp_os(cfg.sf, 0, os)
    d = np.conj(u)
    parts = [np.tile(u, cfg.preamble_len)]
    parts += [chirp_os(cfg.sf, s1, os), chirp_os(cfg.sf, s2, os)]
    parts += [d, d, d[: (n * os) // 4]]
    for s in encode_symbols(cfg, payload):
        parts.append(chirp_os(cfg.sf, int(s), os))
    return np.concatenate(parts).astype(np.complex64)


# ---------------------------------------------------------------------------
# RX
# ---------------------------------------------------------------------------


@dataclass
class LoraFrame:
    payload: bytes
    # True when the payload CRC16 verified. NOTE: when the frame carried no
    # CRC (implicit-header configs with has_crc=False) this is vacuously
    # True — there is no integrity information at all in that mode; see
    # LoraConfig.implicit_header
    crc_ok: bool
    snr: float
    start: int
    cr: int


def _dechirp_bins(x: np.ndarray, sf: int):
    """Device: window stream into consecutive N-sample symbols, dechirp,
    batched matmul-FFT, return (argmax bins, peak powers, mean powers)."""
    n = 1 << sf
    k = len(x) // n
    xc = cplx.from_numpy(x[: k * n])
    d = np.conj(base_upchirp(sf))
    dc = cplx.from_numpy(np.tile(d, k))
    return _dechirp_jit(xc, dc, k, n)


@lru_cache(maxsize=None)
def _dechirp_full_fn(k: int, n: int):
    def fn(xc: CArray, dc: CArray):
        v = (xc * dc).reshape(k, n)
        spec = fft_c(v)
        p = spec.abs2()
        bins = jnp.argmax(p, axis=-1)
        peak = jnp.max(p, axis=-1)
        mean = jnp.mean(p, axis=-1)
        return bins, peak, mean, p

    return jax.jit(fn)


def _dechirp_full(x: np.ndarray, sf: int):
    """Like :func:`_dechirp_bins` but also returns the full dechirped
    power spectra [k, n] (the soft-decision path needs every bin)."""
    n = 1 << sf
    k = len(x) // n
    xc = cplx.from_numpy(x[: k * n])
    d = np.conj(base_upchirp(sf))
    dc = cplx.from_numpy(np.tile(d, k))
    bins, peak, mean, p = _dechirp_full_fn(k, n)(xc, dc)
    return np.asarray(bins), np.asarray(peak), np.asarray(mean), np.asarray(p)


@lru_cache(maxsize=None)
def _soft_bit_table(sf: int, sf_app: int) -> np.ndarray:
    """[n_bins, sf_app] bool: bit i of the interleaved symbol value a
    received bin maps to (``gray_encode(bin >> (sf - sf_app))``)."""
    n = 1 << sf
    v = gray_encode(np.arange(n) >> (sf - sf_app))
    return ((v[:, None] >> np.arange(sf_app)[None, :]) & 1).astype(bool)


def _soft_symbol_llrs(amps: np.ndarray, sf: int, sf_app: int) -> np.ndarray:
    """Per-bit max-log LLRs from one symbol's dechirp amplitudes
    (noncoherent FSK detection): LLR_i = max amp over bins whose mapped
    value has bit i = 1, minus the bit-0 max. Positive = bit 1."""
    tab = _soft_bit_table(sf, sf_app)  # [n, sf_app]
    a = amps[:, None]
    m1 = np.where(tab, a, -np.inf).max(axis=0)
    m0 = np.where(~tab, a, -np.inf).max(axis=0)
    return m1 - m0


@lru_cache(maxsize=None)
def _hamming_codebook(cr: int) -> np.ndarray:
    return hamming_encode(np.arange(16, dtype=np.int64), cr)


def hamming_soft_decode(llr_cw: np.ndarray, cr: int) -> np.ndarray:
    """ML soft-decision Hamming decode: pick the nibble whose codeword
    best matches the [n_cw, 4+cr] bit LLRs (parity:
    ``build_lora_rx_soft_decoding``, examples/lora/src/lib.rs)."""
    cw_len = 4 + cr
    cb = _hamming_codebook(cr)
    bits = ((cb[:, None] >> np.arange(cw_len)[None, :]) & 1).astype(
        np.float64
    )  # [16, cw_len]
    score = (2.0 * bits - 1.0) @ np.asarray(llr_cw, np.float64).T
    return np.argmax(score, axis=0).astype(np.int64)


@lru_cache(maxsize=None)
def _dechirp_fn(k: int, n: int):
    def fn(xc: CArray, dc: CArray):
        v = (xc * dc).reshape(k, n)
        spec = fft_c(v)
        p = spec.abs2()
        bins = jnp.argmax(p, axis=-1)
        peak = jnp.max(p, axis=-1)
        mean = jnp.mean(p, axis=-1)
        return bins, peak, mean

    return jax.jit(fn)


def _dechirp_jit(xc, dc, k, n):
    bins, peak, mean = _dechirp_fn(k, n)(xc, dc)
    return np.asarray(bins), np.asarray(peak), np.asarray(mean)


@lru_cache(maxsize=None)
def _grid_fn(k: int, sf: int):
    """Symbol-grid dechirp of device-resident IQ: ``xc → (bins, peak,
    mean)`` for the first ``k·n`` samples (broadcast downchirp — no
    host-tiled constant, no re-upload)."""
    n = 1 << sf
    d = np.conj(base_upchirp(sf))
    dcr = jnp.asarray(np.real(d).astype(np.float32))
    dci = jnp.asarray(np.imag(d).astype(np.float32))

    def fn(xc: CArray):
        w = xc[: k * n].reshape(k, n)
        v = w * cplx.CArray(dcr[None, :], dci[None, :])
        p = fft_c(v).abs2()
        return (
            jnp.argmax(p, axis=-1),
            jnp.max(p, axis=-1),
            jnp.mean(p, axis=-1),
        )

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _window_fn(nw: int, wsym: int, sf: int, sf_app: int):
    """Batched per-candidate window dechirp: ``(xc, starts[nw]) →
    (bins, peak, mean, llrs)`` for ``wsym`` symbols per window.

    The WLAN-receiver pattern (models/wlan/rx.py): candidates across the
    whole capture dechirp as ONE device program, with the soft bit LLR
    max-reduction done on device so only ``[nw, wsym, sf_app]`` floats
    (not full spectra) cross D2H.  The per-frame dispatch+fetch loop cost
    ~6 RTT × n_frames through the dev tunnel (measured 0.03 MS/s on a
    20-frame capture)."""
    n = 1 << sf
    d = np.conj(base_upchirp(sf))
    dcw = cplx.from_numpy(np.tile(d, wsym))  # [wsym·n] constant
    tab = _soft_bit_table(sf, sf_app)  # [n, sf_app] bool
    tab_t = jnp.asarray(tab.T)  # [sf_app, n]

    def fn(xc: CArray, starts):
        guard = cplx.CArray(
            jnp.concatenate([xc.re, jnp.zeros(wsym * n, jnp.float32)]),
            jnp.concatenate([xc.im, jnp.zeros(wsym * n, jnp.float32)]),
        )

        def one(s):
            w = cplx.apply1(
                lambda t: jax.lax.dynamic_slice_in_dim(t, s, wsym * n), guard
            )
            v = (w * dcw).reshape(wsym, n)
            p = fft_c(v).abs2()  # [wsym, n]
            bins = jnp.argmax(p, axis=-1)
            peak = jnp.max(p, axis=-1)
            mean = jnp.mean(p, axis=-1)
            a = jnp.sqrt(p)  # noncoherent FSK amplitudes
            m1 = jnp.max(
                jnp.where(tab_t[None, :, :], a[:, None, :], -jnp.inf),
                axis=-1,
            )
            m0 = jnp.max(
                jnp.where(~tab_t[None, :, :], a[:, None, :], -jnp.inf),
                axis=-1,
            )
            return bins, peak, mean, m1 - m0  # llrs [wsym, sf_app]

        return jax.vmap(one)(starts)

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _frontier_fn(
    nw: int,
    wa: int,
    wp: int,
    sf: int,
    sf_app_hdr: int,
    sf_p: int,
    s1: int,
    s2: int,
):
    """Fused decode frontier: per candidate, the WHOLE post-detection
    chain in ONE device program — stage-A preamble walk (z = remaining
    upchirps, computed ON DEVICE), sync-word gate, header windows, and
    ``wp`` speculative payload windows.

    Why: the staged path (stage A → fetch → header → fetch → payload →
    fetch) pays one ~24 ms tunnel round-trip per stage; a profiled
    20-frame capture spent 94 of 116 ms in those fetches (host decode
    math was 7 ms). With z/sync/data_start computed in-program and the
    payload length SPECULATED from the previous capture (the WLAN
    receiver's gate, models/wlan/rx.py), the per-chunk cost drops to
    grid + ONE combined fetch. Frames longer than the speculated ``wp``
    fall back to the staged window fetch."""
    one = _make_frontier_one(wa, wp, sf, sf_app_hdr, sf_p, s1, s2)

    def fn(xc: CArray, starts):
        return jax.vmap(lambda s: one(xc, s))(starts)

    return jax.jit(fn)


def _make_frontier_one(
    wa: int, wp: int, sf: int, sf_app_hdr: int, sf_p: int, s1: int, s2: int
):
    """Build the per-candidate frontier body (see :func:`_frontier_fn`);
    shared by the starts-operand variant and the fully fused
    detect+frontier program."""
    n = 1 << sf
    d = np.conj(base_upchirp(sf))
    tab_h = jnp.asarray(_soft_bit_table(sf, sf_app_hdr).T)
    tab_p = jnp.asarray(_soft_bit_table(sf, sf_p).T)
    dca = cplx.from_numpy(np.tile(d, wa))
    dch = cplx.from_numpy(np.tile(d, 8))
    dcp = cplx.from_numpy(np.tile(d, wp)) if wp else None
    guard_len = (wa + 13 + wp) * n

    def one(xc: CArray, s):
        guard = cplx.CArray(
            jnp.concatenate([xc.re, jnp.zeros(guard_len, jnp.float32)]),
            jnp.concatenate([xc.im, jnp.zeros(guard_len, jnp.float32)]),
        )
        s_ok = s >= 0  # detect-path padding slots carry -1
        s = jnp.maximum(s, 0)

        def dechirp(st, w, dc):
            win = cplx.apply1(
                lambda t: jax.lax.dynamic_slice_in_dim(t, st, w * n),
                guard,
            )
            v = (win * dc).reshape(w, n)
            return fft_c(v).abs2()

        def llrs_from(p, tab):
            a = jnp.sqrt(p)
            m1 = jnp.max(
                jnp.where(tab[None, :, :], a[:, None, :], -jnp.inf), -1
            )
            m0 = jnp.max(
                jnp.where(~tab[None, :, :], a[:, None, :], -jnp.inf), -1
            )
            return m1 - m0

        pa = dechirp(s, wa, dca)
        bins = jnp.argmax(pa, -1)
        peak = jnp.max(pa, -1)
        mean = jnp.mean(pa, -1)
        strong = peak > 4.0 * jnp.maximum(mean, 1e-12)
        ok0 = strong & (bins == 0)
        z = jnp.where(jnp.all(ok0), wa, jnp.argmin(ok0)).astype(jnp.int32)
        # sync-word gate, exactly the staged host semantics: checked
        # only when both sync windows exist inside stage A (±1 bin
        # slack; indices clipped — the where() masks the result)
        zi = jnp.minimum(z, wa - 1)
        zj = jnp.minimum(z + 1, wa - 1)
        b1 = bins[zi].astype(jnp.int32)
        b2 = bins[zj].astype(jnp.int32)
        sync_ok = (jnp.abs(b1 - s1) <= 1) & (jnp.abs(b2 - s2) <= 1)
        valid = s_ok & (z >= 2) & ((z + 1 >= wa) | sync_ok)
        dstart = s + (z + 2) * n + 2 * n + n // 4
        ph = dechirp(dstart, 8, dch)
        hpk = jnp.max(ph, -1)
        hmn = jnp.mean(ph, -1)
        hllr = llrs_from(ph, tab_h)
        if wp:
            pp = dechirp(dstart + 8 * n, wp, dcp)
            ppk = jnp.max(pp, -1)
            pmn = jnp.mean(pp, -1)
            pllr = llrs_from(pp, tab_p)
        else:
            ppk = pmn = jnp.zeros((0,), jnp.float32)
            pllr = jnp.zeros((0, sf_p), jnp.float32)
        return z, valid, dstart, hpk, hmn, hllr, ppk, pmn, pllr

    return one


@lru_cache(maxsize=None)
def _detect_frontier_fn(
    k: int,
    sf: int,
    run_len: int,
    kmax: int,
    wa: int,
    wp: int,
    sf_app_hdr: int,
    sf_p: int,
    s1: int,
    s2: int,
):
    """The fully fused LoRa decode program: symbol-grid run DETECTION
    (the host ``_walk_grid`` vectorized — a preamble is a run of
    ``run_len`` equal strong dechirp bins; the run start's bin gives the
    chirp-aligned grid) chained into the per-candidate frontier, all ON
    DEVICE. One dispatch, one combined fetch per capture — the WLAN
    receiver's detect→decode device chain applied to LoRa (the staged
    path paid 4 tunnel round-trips; measured 94 of 116 ms on a 20-frame
    capture)."""
    n = 1 << sf
    one = _make_frontier_one(wa, wp, sf, sf_app_hdr, sf_p, s1, s2)

    def fn(xc: CArray, bins, peak, mean):
        strong = peak > 4.0 * jnp.maximum(mean, 1e-12)
        val = jnp.where(strong, bins.astype(jnp.int32), -1)
        m = k - run_len + 1
        v0 = val[:m]
        cond = v0 >= 0
        for j in range(1, run_len):
            cond = cond & (val[j : j + m] == v0)
        prev = jnp.concatenate([jnp.zeros((1,), bool), cond[:-1]])
        rs = cond & ~prev  # run STARTS (the walk emits once per run)
        n_cand = jnp.sum(rs.astype(jnp.int32))
        idx = jnp.nonzero(rs, size=kmax, fill_value=-1)[0]
        b = val[jnp.maximum(idx, 0)]
        starts = jnp.where(
            idx >= 0, idx.astype(jnp.int32) * n + (n - b) % n, -1
        ).astype(jnp.int32)
        outs = jax.vmap(lambda s: one(xc, s))(starts)
        # ONE packed f32 leaf: fresh multi-leaf fetches cost one
        # round-trip per leaf (~12 ms measured); this is a single
        # program, the case where packing wins (NOTES leaf-packing
        # win-or-delete)
        z, valid, dstart, hpk, hmn, hllr, ppk, pmn, pllr = outs
        from futuresdr_tpu.ops.packing import pack_int_f32

        packed = jnp.concatenate(
            [
                pack_int_f32(starts),
                jnp.asarray(n_cand, jnp.float32).reshape(1),
                z.astype(jnp.float32),
                valid.astype(jnp.float32),
                pack_int_f32(dstart),
                hpk.reshape(-1),
                hmn.reshape(-1),
                hllr.reshape(-1),
                ppk.reshape(-1),
                pmn.reshape(-1),
                pllr.reshape(-1),
            ]
        )
        return packed

    return jax.jit(fn)


class LoraReceiver(StreamingReceiver):
    """Frame sync + demod + decode over an IQ buffer.

    ``os_factor=1`` (fs = BW): the round-1 symbol-grid receiver.
    ``os_factor>=2`` (fs = os·BW — how real captures arrive): coarse
    detection on the center decimation phase, then per candidate a
    batched CFO/STO estimate from the preamble the way
    ``frame_sync.rs`` does sequentially (``:83`` m_os_factor, ``:317-345``
    k_hat / m_sto_frac / cfo_int-from-downchirp):

    * fractional CFO from the phase slope between consecutive dechirped
      preamble upchirps (exact mod 1 bin);
    * integer CFO from the downchirp bin — on the walk-aligned grid the
      residual timing equals the CFO, so ``down_bin ≈ 2·f`` and
      ``f_int = round((down − 2·f_frac)/2)`` (signed, ±N/4 range — the
      reference's ``down_val/2`` rule);
    * timing: the CFO-induced offset ``f`` chips is re-absorbed by
      re-picking the DECIMATION PHASE (``q = p0 + round(f·os)``) —
      fractional STO resolution 1/os chip, the reference's
      ``compute_sto_index`` quantization — then the stream is derotated
      by ``exp(−j2πf·k/N)`` and handed to the fs=BW receiver unchanged.
    """

    def __init__(
        self, cfg: LoraConfig, soft: bool = True, os_factor: int = 1
    ):
        # soft-decision decoding (build_lora_rx_soft_decoding parity):
        # per-bit max-log LLRs from the full dechirp spectrum + ML
        # Hamming decoding; hard argmax-bin path kept for A/B
        if cfg.implicit_header and cfg.payload_len <= 0:
            raise ValueError(
                "implicit_header RX needs cfg.payload_len > 0 (both ends "
                "preconfigure the frame format, header_decoder.rs:162)"
            )
        self.cfg = cfg
        self.soft = bool(soft)
        self.os_factor = int(os_factor)
        if self.os_factor < 1:
            raise ValueError("os_factor must be >= 1")
        self.frames: List[LoraFrame] = []

    # -- sync: find preamble runs on symbol-aligned grid offsets ---------
    def _find_frames(self, x: np.ndarray) -> List[int]:
        """Return chirp-aligned grid positions inside detected preambles.

        A preamble chirp starting at t₀ dechirps (on the unaligned window
        grid) to bin b = (N − t₀) mod N — equal across the run — so the
        aligned grid is ``run_start·N + (N − b) mod N``."""
        bins, peak, mean = _dechirp_bins(x, self.cfg.sf)
        return self._walk_grid(bins, peak, mean)

    def _walk_grid(self, bins, peak, mean) -> List[int]:
        cfg = self.cfg
        n = cfg.n
        starts = []
        run_val, run_len, run_start = -1, 0, 0
        for i, b in enumerate(bins):
            # 4x-over-mean chirp-energy gate: measured 2 dB more sensitive
            # than 10x with zero noise-only false syncs (the sync-word and
            # CRC checks downstream reject what slips through). Floored
            # strict inequality: exact-zero regions (padding, silent
            # gaps) must NOT pass — 0 < 4·0 is false, and every zero
            # window dechirps to bin 0, manufacturing preamble runs that
            # bloat the batched candidate set
            if not (peak[i] > 4.0 * max(float(mean[i]), 1e-12)):
                run_len = 0
                run_val = -1
                continue
            if b == run_val:
                run_len += 1
            else:
                run_val, run_len, run_start = int(b), 1, i
            if run_len == max(3, cfg.preamble_len - 2):
                r = (n - run_val) % n
                starts.append(run_start * n + r)
                run_len = 0
                run_val = -1
        return starts

    def _demod_frame(self, x: np.ndarray, t_align: int) -> Optional[LoraFrame]:
        cfg = self.cfg
        n = cfg.n
        sf = cfg.sf
        seg = x[t_align:]
        bins, peak, mean = _dechirp_bins(seg, sf)
        if len(bins) < cfg.preamble_len:
            return None
        strong = peak > 4.0 * np.maximum(mean, 1e-12)
        # count remaining preamble (bin 0) windows on the aligned grid
        z = 0
        while z < len(bins) and strong[z] and bins[z] == 0:
            z += 1
        if z < 2:
            return None
        # verify the two sync-word upchirps (network discrimination — the
        # reference's frame_sync rejects foreign sync words; ±1 bin slack)
        if z + 1 < len(bins):
            s1 = ((cfg.sync_word >> 4) & 0xF) << 3
            s2 = (cfg.sync_word & 0xF) << 3
            if (
                abs(int(bins[z]) - s1) > 1
                or abs(int(bins[z + 1]) - s2) > 1
            ):
                return None
        # two sync-word upchirps, then 2.25 downchirps, then data
        data_off = (z + 2) * n + 2 * n + n // 4
        if data_off + n > len(seg):
            return None
        dseg = seg[data_off:]
        if self.soft:
            bins, peak, mean, pwr = _dechirp_full(dseg, sf)
            amps = np.sqrt(pwr)
        else:
            bins, peak, mean = _dechirp_bins(dseg, sf)
            amps = None
        if len(bins) == 0:
            return None
        valid = peak > 4.0 * np.maximum(mean, 1e-12)
        n_syms = int(np.argmin(valid)) if not valid.all() else len(valid)
        if n_syms < 8:
            return None
        syms = bins[:n_syms]
        snr = float(
            10.0
            * np.log10(
                np.mean(peak[:n_syms]) / (np.mean(mean[:n_syms]) + 1e-12)
            )
        )

        # --- header block ------------------------------------------------
        sf_app_hdr = sf - 2
        if self.soft:
            # per-symbol bit LLRs, deinterleaved to codeword LLRs
            llr_sym = np.stack(
                [
                    _soft_symbol_llrs(amps[j], sf, sf_app_hdr)
                    for j in range(8)
                ]
            )  # [8, sf_app_hdr]
            llr_cw = np.empty((sf_app_hdr, 8))
            for j in range(8):
                for i in range(sf_app_hdr):
                    llr_cw[i, j] = llr_sym[j, (i + j) % sf_app_hdr]
            hdr_nib = hamming_soft_decode(llr_cw, 4)
        else:
            hdr_syms = gray_encode((syms[:8] >> 2).astype(np.int64))
            hdr_cws = deinterleave_block(hdr_syms, sf_app_hdr, 8)
            hdr_nib = hamming_decode(hdr_cws, 4)
        if cfg.implicit_header:
            # header fields come from the shared config; the whole first
            # block is payload nibbles (header_decoder.rs:162)
            length, cr, has_crc = cfg.payload_len, cfg.cr, cfg.has_crc
            payload_nib_in_hdr = hdr_nib[:sf_app_hdr]
        else:
            length = int((hdr_nib[0] << 4) | hdr_nib[1])
            cr = int(hdr_nib[2] >> 1) & 0x7
            has_crc = bool(hdr_nib[2] & 1)
            chk = (hdr_nib[0] ^ hdr_nib[1] ^ hdr_nib[2]) & 0xF
            if chk != hdr_nib[3] or not (1 <= cr <= 4) or length == 0:
                return None
            payload_nib_in_hdr = hdr_nib[5:sf_app_hdr]

        # --- payload blocks ----------------------------------------------
        n_body = length + (2 if has_crc else 0)
        total_nibbles = 2 * n_body
        remaining = total_nibbles - len(payload_nib_in_hdr)
        cw_len = 4 + cr
        sf_p = sf - 2 if cfg.ldro else sf  # LDRO mirror of encode_symbols
        n_blocks = max(0, -(-remaining // sf_p))
        need_syms = 8 + n_blocks * cw_len
        if n_syms < need_syms:
            return None
        nib: List[int] = list(payload_nib_in_hdr)
        pos = 8
        for _ in range(n_blocks):
            if self.soft:
                llr_sym = np.stack(
                    [
                        _soft_symbol_llrs(amps[pos + j], sf, sf_p)
                        for j in range(cw_len)
                    ]
                )  # [cw_len, sf_p]
                llr_cw = np.empty((sf_p, cw_len))
                for j in range(cw_len):
                    for i in range(sf_p):
                        llr_cw[i, j] = llr_sym[j, (i + j) % sf_p]
                nib.extend(hamming_soft_decode(llr_cw, cr).tolist())
            else:
                blk = syms[pos : pos + cw_len].astype(np.int64)
                if cfg.ldro:
                    blk = blk >> 2
                bsyms = gray_encode(blk)
                cws = deinterleave_block(bsyms, sf_p, cw_len)
                nib.extend(hamming_decode(cws, cr).tolist())
            pos += cw_len
        body = _nibbles_to_bytes(np.asarray(nib[:total_nibbles]))

        wh = whitening_sequence(length)
        payload = bytes(
            np.frombuffer(body[:length], np.uint8) ^ wh[:length]
        )
        crc_ok = True
        if has_crc:
            rx_crc = body[length] | (body[length + 1] << 8)
            crc_ok = _crc16(payload) == rx_crc
        return LoraFrame(
            payload=payload, crc_ok=crc_ok, snr=snr, start=t_align, cr=cr
        )

    # process/process_stream come from StreamingReceiver: the symbol-
    # grid dechirp scan dispatches per chunk without a host sync; the
    # grid fetch + staged window decode land in _collect, so streaming
    # overlaps a chunk's scan with the previous chunk's decode.

    # -- oversampled path (os_factor >= 2) -------------------------------
    def _estimate_cfo_sto(self, y: np.ndarray, t0: int):
        """On the walk-aligned decimated grid: returns total CFO ``f``
        in bins (float) or None. Host numpy — the windows are a dozen
        N-sample symbols per candidate (the batched device programs
        carry the data decode, which dominates)."""
        cfg = self.cfg
        n = cfg.n
        d = np.conj(base_upchirp(cfg.sf))
        u = base_upchirp(cfg.sf)
        seg = y[t0:]
        k = len(seg) // n
        if k < cfg.preamble_len + 5:
            return None
        w = seg[: k * n].reshape(k, n)
        spec = np.fft.fft(w[: cfg.preamble_len + 4] * d[None, :], axis=-1)
        p = np.abs(spec) ** 2
        bins = np.argmax(p, axis=-1)
        peak = p.max(axis=-1)
        mean = p.mean(axis=-1)
        strong = peak > 4.0 * np.maximum(mean, 1e-12)
        if not strong[0]:
            return None
        # preamble run on the dominant bin b0 — NOT necessarily 0: when
        # (CFO−τ) sits near a half bin the walk's alignment quantizes a
        # chip off and the residual shows up here; the fractional
        # estimate below re-centers it
        b0 = int(bins[0])
        z = 0
        while z < len(bins) and strong[z] and bins[z] == b0:
            z += 1
        if z < 2:
            return None
        # fractional CFO: phase slope across the preamble run (exact
        # mod 1 bin, independent of timing)
        acc = 0j
        for i in range(1, z):
            acc += np.conj(spec[i - 1, b0]) * spec[i, b0]
        f_frac = float(np.angle(acc) / (2.0 * np.pi)) if z >= 2 else 0.0
        # fractional residual up-bin U = f − τ on this grid, at half-bin
        # FFT resolution + parabolic interpolation (the reference keeps a
        # 2N FFT for exactly this STO-frac estimate,
        # frame_sync.rs fft_forward_two_times_number_of_bins)
        wz = w[:z] * d[None, :]
        pad2 = np.zeros((z, 2 * n), np.complex64)
        pad2[:, :n] = wz
        p2 = np.abs(np.fft.fft(pad2, axis=-1)) ** 2
        p2 = p2.sum(axis=0)
        b2 = int(np.argmax(p2))
        pl, pc, pr = (
            p2[(b2 - 1) % (2 * n)],
            p2[b2],
            p2[(b2 + 1) % (2 * n)],
        )
        denom = pl - 2 * pc + pr
        db = 0.5 * (pl - pr) / denom if denom != 0 else 0.0
        u_pos = (b2 + db) / 2.0  # bins, in [0, n)
        u_res = ((u_pos + n / 2) % n) - n / 2  # signed, aligned ⇒ small
        # integer CFO from the first full downchirp: the preamble run
        # ends at window z, the two sync upchirps occupy z and z+1, so
        # the full downchirps are windows z+2 and z+3. Dechirp with the
        # UPCHIRP → bin ≈ f + τ; with U = f − τ, down + U ≈ 2f pins the
        # integer part. (A review instrumented the earlier z+4 read: it
        # landed on the quarter-downchirp/data boundary — peak/mean 2.1
        # vs 23.8 at the true window, and a 1-bin CFO error absorbed
        # only by the f/τ degeneracy.)
        di = z + 2
        if (di + 1) * n > len(seg):
            return None
        dspec = np.fft.fft(seg[di * n : (di + 1) * n] * u)
        down = int(np.argmax(np.abs(dspec)))
        down_signed = down if down < n // 2 else down - n
        m = int(np.round((down_signed + u_res - 2.0 * f_frac) / 2.0))
        f = m + f_frac
        tau = f - u_res  # residual timing on this grid, in chips
        return f, tau

    def _demod_frame_os(
        self, x_os: np.ndarray, t0: int, p0: int
    ) -> Optional[LoraFrame]:
        os = self.os_factor
        n = self.cfg.n
        y = x_os[p0::os]
        est = self._estimate_cfo_sto(y, t0)
        if est is None:
            return None
        f, tau = est
        # re-pick the decimation phase to absorb the residual timing
        # offset (resolution 1/os chip — compute_sto_index parity)
        qq = p0 + int(np.round(tau * os))
        t_shift, q = divmod(qq, os)
        t_corr = t0 + t_shift
        if t_corr < 0:
            return None
        yq = x_os[q::os]
        kk = np.arange(len(yq), dtype=np.float64)
        yc = (yq * np.exp(-2j * np.pi * f * kk / n)).astype(np.complex64)
        frame = self._demod_frame(yc, t_corr)
        if frame is not None:
            # report the start in OS samples (the capture's own clock)
            frame.start = t_corr * os + q
        return frame

    def _collect_os(self, x_os: np.ndarray) -> List[LoraFrame]:
        os = self.os_factor
        # scan TWO decimation phases half a chip apart: a combined
        # (CFO_frac − STO_frac) near ±0.5 bin makes the dechirp argmax
        # alternate between adjacent bins and breaks the equal-bin run
        # walk — the other phase is then >= 0.25 bin from the boundary
        phases = [os // 2] if os == 1 else sorted({os // 2, 0})
        out: List[LoraFrame] = []
        claimed: List[int] = []  # OS-sample starts of decoded frames
        for p0 in phases:
            y0 = x_os[p0::os]
            for t0 in self._find_frames(y0):
                approx = t0 * os + p0
                if any(
                    abs(approx - c) < 2 * self.cfg.n * os for c in claimed
                ):
                    continue  # same frame found on the other phase
                fr = self._demod_frame_os(x_os, t0, p0)
                if fr is not None:
                    out.append(fr)
                    claimed.append(fr.start)
                else:
                    # remember the attempt so the other phase's duplicate
                    # candidate gets its own chance only if this one died
                    pass
        out.sort(key=lambda f: f.start)
        self.frames.extend(out)
        return out

    def _dispatch(self, iq):
        cfg = self.cfg
        n, sf = cfg.n, cfg.sf
        if self.os_factor > 1:
            if isinstance(iq, cplx.CArray):
                raise ValueError(
                    "device-resident ingest requires os_factor=1 (decimate"
                    " + CFO-correct on the host first, or feed fs=BW IQ)"
                )
            return {"os": np.asarray(iq, dtype=np.complex64)}
        if isinstance(iq, cplx.CArray):
            # device-resident ingest — batched soft path only; refuse
            # rather than silently soft-decode a hard-path A/B receiver
            if not self.soft:
                raise ValueError(
                    "device-resident ingest requires soft=True (the "
                    "hard-decision A/B path is host-sequential)"
                )
            nx = int(iq.shape[-1])
            if nx % (64 * n):
                raise ValueError(f"device IQ must be a {64 * n}-multiple")
            return {"xc": iq, "grid": _grid_fn(nx // n, sf)(iq)}
        x = np.asarray(iq, dtype=np.complex64)
        if not self.soft:
            return {"hard": x}  # host-sequential A/B path: no device stage
        # soft path: both ingest kinds share the padded _grid_fn scan
        # (zero-pad windows fail the strict 4x-over-mean gate, so the
        # candidate walk matches the unpadded scan's)
        bucket = -(-len(x) // (64 * n)) * (64 * n)  # stable jit shapes
        if bucket != len(x):
            x = np.concatenate([x, np.zeros(bucket - len(x), np.complex64)])
        xc = cplx.from_numpy(x)
        return {"xc": xc, "grid": _grid_fn(bucket // n, sf)(xc)}

    def _collect(self, d) -> List[LoraFrame]:
        if "os" in d:
            return self._collect_os(d["os"])
        if "hard" in d:
            x = d["hard"]
            out: List[LoraFrame] = []
            seen = set()
            for start in self._find_frames(x):
                if start in seen:
                    continue
                seen.add(start)
                f = self._demod_frame(x, start)
                if f is not None:
                    out.append(f)
            self.frames.extend(out)
            return out
        out = self._fused_collect(d["xc"], d["grid"])
        self.frames.extend(out)
        return out

    def _fused_collect(self, xc, grid_dev) -> List[LoraFrame]:
        """Soft path, ONE fetch per capture: the grid scan's device
        outputs chain straight into the detect+frontier program
        (:func:`_detect_frontier_fn`) — detection, preamble walk, sync
        gate, header and speculative payload windows all on device. A
        candidate overflow (> kmax run starts) re-runs at the next pow2
        budget (program cached per bucket, WLAN's adaptive rule)."""
        cfg = self.cfg
        sf = cfg.sf
        sf_app_hdr = sf - 2
        sf_p = sf - 2 if cfg.ldro else sf
        wa = cfg.preamble_len + 4
        s1 = ((cfg.sync_word >> 4) & 0xF) << 3
        s2 = (cfg.sync_word & 0xF) << 3
        run_len = max(3, cfg.preamble_len - 2)
        wp_spec = self._spec_wp_for(sf_app_hdr, sf_p)
        bins_d, peak_d, mean_d = grid_dev
        k = int(bins_d.shape[0])
        kmax = int(getattr(self, "_kmax", 32))
        hard_cap = max(16, 1 << (k - 1).bit_length())
        while True:
            packed = np.asarray(
                jax.device_get(
                    _detect_frontier_fn(
                        k, sf, run_len, kmax, wa, wp_spec,
                        sf_app_hdr, sf_p, s1, s2,
                    )(xc, bins_d, peak_d, mean_d)
                )
            )
            km = kmax
            o = 0
            from futuresdr_tpu.ops.packing import unpack_int_f32

            starts = unpack_int_f32(packed[o : o + km]); o += km
            n_cand = int(packed[o]); o += 1
            z_a = packed[o : o + km]; o += km
            valid_a = packed[o : o + km] > 0.5; o += km
            dstart_a = unpack_int_f32(packed[o : o + km]); o += km
            peakH = packed[o : o + 8 * km].reshape(km, 8); o += 8 * km
            meanH = packed[o : o + 8 * km].reshape(km, 8); o += 8 * km
            nh = 8 * sf_app_hdr * km
            llrH = packed[o : o + nh].reshape(km, 8, sf_app_hdr); o += nh
            peakP = packed[o : o + wp_spec * km].reshape(km, wp_spec)
            o += wp_spec * km
            meanP = packed[o : o + wp_spec * km].reshape(km, wp_spec)
            o += wp_spec * km
            npl = wp_spec * sf_p * km
            llrP = packed[o : o + npl].reshape(km, wp_spec, sf_p)
            if n_cand <= kmax or kmax >= hard_cap:
                break
            kmax = min(hard_cap, 1 << (n_cand - 1).bit_length())
            self._kmax = kmax
        fetched = (
            z_a, valid_a, dstart_a, peakH, meanH, llrH, peakP, meanP, llrP
        )
        return self._decode_frontier_arrays(xc, starts, fetched, wp_spec)

    # -- batched soft path: the fused frontier decodes every frame from
    # TWO device programs steady state (grid scan + frontier); frames
    # longer than the speculated payload window fall back to one staged
    # window fetch per length group --------------------------------------
    def _batched_collect(self, xc, cand_starts) -> List[LoraFrame]:
        cfg = self.cfg
        n, sf = cfg.n, cfg.sf
        starts0: List[int] = []
        seen = set()
        for s in cand_starts:
            if s not in seen:
                seen.add(s)
                starts0.append(s)
        if not starts0:
            return []
        sf_app_hdr = sf - 2
        sf_p = sf - 2 if cfg.ldro else sf
        wa = cfg.preamble_len + 4
        s1 = ((cfg.sync_word >> 4) & 0xF) << 3
        s2 = (cfg.sync_word & 0xF) << 3
        # speculative payload window count, learned from the previous
        # capture (the WLAN receiver's (mcs, nf) gate translated to
        # LoRa: traffic is near-constant frame lengths, so the frontier
        # carries the payload windows of the COMMON case and only
        # mismatches pay a staged fetch). Implicit-header mode knows wp
        # exactly from the config.
        wp_spec = self._spec_wp_for(sf_app_hdr, sf_p)
        kba = 1 << (len(starts0) - 1).bit_length()
        sa = np.full(kba, -1, np.int32)  # pad slots are INVALID starts
        sa[: len(starts0)] = starts0
        fetched = jax.device_get(
            _frontier_fn(kba, wa, wp_spec, sf, sf_app_hdr, sf_p, s1, s2)(
                xc, jnp.asarray(sa)
            )
        )
        return self._decode_frontier_arrays(
            xc, np.asarray(sa), fetched, wp_spec
        )

    def _spec_wp_for(self, sf_app_hdr: int, sf_p: int) -> int:
        cfg = self.cfg
        if cfg.implicit_header:
            n_body = cfg.payload_len + (2 if cfg.has_crc else 0)
            remaining = 2 * n_body - sf_app_hdr
            return max(0, -(-remaining // sf_p)) * (4 + cfg.cr)
        # default speculation covers common short-frame traffic (48
        # payload symbols ≈ a 30-byte cr1 frame) so even a COLD receiver
        # runs the one-fetch fused path; the first capture then adapts
        # the bucket to the observed traffic
        return int(getattr(self, "_spec_wp", 48))

    def _decode_frontier_arrays(
        self, xc, starts_arr, fetched, wp_spec
    ) -> List[LoraFrame]:
        """Decode frames from the frontier program's fetched arrays
        (slot-indexed; invalid slots carry valid=False)."""
        cfg = self.cfg
        n, sf = cfg.n, cfg.sf
        sf_app_hdr = sf - 2
        sf_p = sf - 2 if cfg.ldro else sf
        (
            z_a,
            valid_a,
            dstart_a,
            peakH,
            meanH,
            llrH,
            peakP,
            meanP,
            llrP,
        ) = fetched
        starts0 = [int(s) for s in starts_arr]

        def pad_pow2(vals):
            kb = 1 << (len(vals) - 1).bit_length()
            a = np.zeros(kb, np.int32)
            a[: len(vals)] = vals
            return a, kb

        # header decode (host: tiny codebook matmuls)
        plan = []  # (cand_idx, length, cr, has_crc, hdr_nib, wp)
        for i, t0 in enumerate(starts0):
            if not valid_a[i]:
                continue
            validh = peakH[i] > 4.0 * np.maximum(meanH[i], 1e-12)
            if not validh.all():
                continue
            llr_cw = np.empty((sf_app_hdr, 8))
            for j in range(8):
                for b in range(sf_app_hdr):
                    llr_cw[b, j] = llrH[i, j, (b + j) % sf_app_hdr]
            nibs = hamming_soft_decode(llr_cw, 4)
            if cfg.implicit_header:
                length, cr, has_crc = (
                    cfg.payload_len,
                    cfg.cr,
                    cfg.has_crc,
                )
                nib0 = nibs[:sf_app_hdr]
            else:
                length = int((nibs[0] << 4) | nibs[1])
                cr = int(nibs[2] >> 1) & 0x7
                has_crc = bool(nibs[2] & 1)
                chk = (nibs[0] ^ nibs[1] ^ nibs[2]) & 0xF
                if chk != nibs[3] or not (1 <= cr <= 4) or length == 0:
                    continue
                nib0 = nibs[5:sf_app_hdr]
            n_body = length + (2 if has_crc else 0)
            remaining = 2 * n_body - len(nib0)
            n_blocks = max(0, -(-remaining // sf_p))
            plan.append(
                (i, length, cr, has_crc, nib0, n_blocks * (4 + cr))
            )

        def decode_payload(nib0, llr_pay, length, cr, has_crc, wp):
            cw_len = 4 + cr
            nib: List[int] = list(nib0)
            pos = 0
            for _ in range(wp // cw_len):
                llr_cw = np.empty((sf_p, cw_len))
                for j in range(cw_len):
                    for b in range(sf_p):
                        llr_cw[b, j] = llr_pay[pos + j, (b + j) % sf_p]
                nib.extend(hamming_soft_decode(llr_cw, cr).tolist())
                pos += cw_len
            n_body = length + (2 if has_crc else 0)
            body = _nibbles_to_bytes(np.asarray(nib[: 2 * n_body]))
            wh = whitening_sequence(length)
            payload = bytes(
                np.frombuffer(body[:length], np.uint8) ^ wh[:length]
            )
            crc_ok = True
            if has_crc:
                rx_crc = body[length] | (body[length + 1] << 8)
                crc_ok = _crc16(payload) == rx_crc
            return payload, crc_ok

        out: List[LoraFrame] = []
        fallback: dict = {}  # wpb -> items needing a staged fetch
        max_wp = 0
        for item in plan:
            i, length, cr, has_crc, nib0, wp = item
            max_wp = max(max_wp, wp)
            if wp <= wp_spec:
                if wp:
                    validp = peakP[i, :wp] > 4.0 * np.maximum(
                        meanP[i, :wp], 1e-12
                    )
                    if not validp.all():
                        continue
                payload, crc_ok = decode_payload(
                    nib0, llrP[i], length, cr, has_crc, wp
                )
                pk = [peakH[i].mean()] + (
                    [peakP[i, :wp].mean()] if wp else []
                )
                mn = [meanH[i].mean()] + (
                    [meanP[i, :wp].mean()] if wp else []
                )
                out.append(
                    LoraFrame(
                        payload=payload,
                        crc_ok=crc_ok,
                        snr=float(
                            10.0
                            * np.log10(
                                np.mean(pk) / (np.mean(mn) + 1e-12)
                            )
                        ),
                        start=starts0[i],
                        cr=cr,
                    )
                )
            else:
                wpb = max(8, -(-wp // 8) * 8)
                fallback.setdefault(wpb, []).append(item)

        for wpb, items in fallback.items():
            sp, kbp = pad_pow2(
                [int(dstart_a[it[0]]) + 8 * n for it in items]
            )
            _, peakF, meanF, llrF = jax.device_get(
                _window_fn(kbp, wpb, sf, sf_p)(xc, jnp.asarray(sp))
            )
            for gi, (i, length, cr, has_crc, nib0, wp) in enumerate(
                items
            ):
                validp = peakF[gi, :wp] > 4.0 * np.maximum(
                    meanF[gi, :wp], 1e-12
                )
                if not validp.all():
                    continue
                payload, crc_ok = decode_payload(
                    nib0, llrF[gi], length, cr, has_crc, wp
                )
                pk = [peakH[i].mean(), peakF[gi, :wp].mean()]
                mn = [meanH[i].mean(), meanF[gi, :wp].mean()]
                out.append(
                    LoraFrame(
                        payload=payload,
                        crc_ok=crc_ok,
                        snr=float(
                            10.0
                            * np.log10(
                                np.mean(pk) / (np.mean(mn) + 1e-12)
                            )
                        ),
                        start=starts0[i],
                        cr=cr,
                    )
                )
        # widen the speculative window when this capture overflowed it
        # (bucketed to 8 symbols so the frontier program caches per
        # step); never shrink below the default — stable traffic must
        # not oscillate the compiled shape set
        if max_wp > wp_spec and not cfg.implicit_header:
            self._spec_wp = max(8, -(-max_wp // 8) * 8)
        out.sort(key=lambda f: f.start)
        return out
