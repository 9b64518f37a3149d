"""ADS-B 1090ES receiver — TPU-shaped.

Parity: ``examples/adsb/src/{preamble_detector.rs,demodulator.rs,
decoder.rs,lib.rs}`` — 4 MS/s magnitude stream, ±1 preamble correlator
(preamble_detector.rs:4-22), PPM bit decisions via SYMBOL_ONE/ZERO taps
(lib.rs:13-15), CRC24 check and DF17 field decode.

Device: one jitted pass computes |x|², the 32-tap preamble correlation,
the noise floor moving average, and the per-offset PPM bit metric
(first-half minus second-half energy). Host: threshold peaks, stride out
112 bits per candidate, CRC24 + Mode S field decode.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from futuresdr_tpu.models.streaming import StreamingReceiver
from futuresdr_tpu.ops import cplx

SAMPLE_RATE = 4_000_000  # demod rate (lib.rs:10-11 with 4 MS/s)
SPS_HALF = 2  # samples per half symbol
SPS = 2 * SPS_HALF  # samples per 1 µs symbol
N_BITS = 112
PREAMBLE_PATTERN = np.array(
    [1, -1, 1, -1, -1, -1, -1, 1, -1, 1, -1, -1, -1, -1, -1, -1],
    dtype=np.float32,
)  # preamble_detector.rs:4-13
PREAMBLE_LEN = len(PREAMBLE_PATTERN) * SPS_HALF  # 8 µs

CRC_POLY = 0xFFF409  # Mode S CRC24


def preamble_taps() -> np.ndarray:
    """Correlator taps (preamble_detector.rs:16-22: reversed, expanded)."""
    return np.repeat(PREAMBLE_PATTERN[::-1], SPS_HALF).astype(np.float32)


@lru_cache(maxsize=None)
def _metrics_fn(n: int):
    # conv1d_valid computes Σ x[k+t]·taps[T−1−t]; preamble_taps() is the
    # reversed pattern, so passing it directly yields the straight
    # correlation Σ mag[k+j]·pattern[j]
    taps_p = preamble_taps()  # host np → Toeplitz matmul path
    taps_bit = np.repeat([1.0, -1.0], SPS_HALF)[::-1].astype(np.float32)

    def fn(xc):
        from futuresdr_tpu.ops.fir import conv1d_valid, moving_sum

        mag = xc.abs2()
        cor = conv1d_valid(mag, taps_p)  # preamble correlation
        nf = moving_sum(mag, PREAMBLE_LEN) / PREAMBLE_LEN  # noise floor
        bit = conv1d_valid(mag, taps_bit)  # PPM metric per offset
        return mag, cor, nf, bit

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _detect_fn(n: int, kmax: int, threshold: float):
    """Device-side candidate detection: metrics → score → local maxima →
    ``lax.top_k`` compaction.  Only ``kmax`` (index, score, noise-floor)
    triples cross D2H — fetching the full cor/nf/bit arrays cost ~5 MB
    per 0.4 M-sample capture through the dev tunnel (the round-1-style
    receiver's actual rate limit, measured 1.3 MS/s)."""

    def fn(xc):
        _mag, cor, nf, bit = _metrics_fn(n)(xc)
        m = cor.shape[-1]
        nf_pre = jnp.concatenate(
            [jnp.full(PREAMBLE_LEN, nf[0]), nf[: m - PREAMBLE_LEN]]
        )
        score = cor / (nf_pre * PREAMBLE_LEN + 1e-9)
        prev = jnp.concatenate([jnp.full(1, -jnp.inf), score[:-1]])
        nxt = jnp.concatenate([score[1:], jnp.full(1, -jnp.inf)])
        cand = (score > threshold) & (score >= prev) & (score >= nxt)
        # -inf fill: an unambiguous padding sentinel, so the host break
        # condition stays correct for any threshold (including <= 0)
        masked = jnp.where(cand, score, -jnp.inf)
        vals, idx = jax.lax.top_k(masked, kmax)
        idx = idx.astype(jnp.int32)

        # in-device EXACT non-max suppression over the score-descending
        # list (the host walk's semantics: a candidate is taken iff its
        # own slot is unoccupied; taking marks [j-P+1, j+P)), as a scan
        # over the compacted candidates — then soft-window extraction
        # for every slot in the SAME program. One fetch per capture
        # replaces detect-fetch + host-NMS + extract-fetch (~25 ms of
        # tunnel round-trip on small captures).
        n_bit = n - SPS + 1
        last_fit = n_bit - 1 - PREAMBLE_LEN - SPS * (N_BITS - 1)
        P = PREAMBLE_LEN
        occ0 = jnp.zeros(n_bit + 2 * P, bool)
        rel = jnp.arange(2 * P)

        def nms_body(occ, t):
            j, v = t
            jc = jnp.clip(j, 0, n_bit - 1)
            fits = jnp.isfinite(v) & (j <= last_fit)
            take = fits & ~occ[jc]
            lo = jnp.maximum(jc - P + 1, 0)
            cur = jax.lax.dynamic_slice(occ, (lo,), (2 * P,))
            ab = rel + lo
            m = take & (ab >= jc - P + 1) & (ab < jc + P)
            occ = jax.lax.dynamic_update_slice(occ, cur | m, (lo,))
            return occ, take

        _, taken = jax.lax.scan(nms_body, occ0, (idx, vals))

        guard = PREAMBLE_LEN + N_BITS * SPS
        bg = jnp.concatenate([bit, jnp.zeros(guard, bit.dtype)])

        def one(s):
            w = jax.lax.dynamic_slice_in_dim(
                bg, jnp.clip(s, 0, n_bit - 1) + PREAMBLE_LEN, N_BITS * SPS
            )
            return w[::SPS]

        soft = jax.vmap(one)(idx)  # [kmax, N_BITS]

        # ONE packed leaf: through tunneled backends a multi-leaf fetch
        # pays one ~15-20 ms round-trip PER LEAF (measured 60 of 76 ms
        # on a 200-frame capture); the int32 indices ride bitcast in
        # the f32 buffer, exact at any size
        from futuresdr_tpu.ops.packing import pack_int_f32

        packed = jnp.concatenate(
            [
                pack_int_f32(idx),
                nf_pre[idx],
                taken.astype(jnp.float32),
                soft.reshape(-1),
            ]
        )
        return packed

    return jax.jit(fn)


def _crc_remainder(bits: np.ndarray) -> int:
    """Polynomial remainder of bits (MSB first) modulo the CRC24 poly."""
    reg = 0
    for b in bits:
        reg = (reg << 1) | int(b)
        if reg & (1 << 24):
            reg ^= (1 << 24) | CRC_POLY
    return reg & 0xFFFFFF


@lru_cache(maxsize=None)
def _crc_contrib() -> np.ndarray:
    """[N_BITS] uint32 per-bit remainder contributions: the CRC24 is
    GF(2)-linear, so remainder(bits) = XOR of contrib[i] over set bits —
    lets whole candidate batches CRC-check in one vectorized pass."""
    out = np.zeros(N_BITS, np.uint32)
    for i in range(N_BITS):
        e = np.zeros(N_BITS, np.uint8)
        e[i] = 1
        out[i] = _crc_remainder(e)
    return out


def _crc_remainder_batch(bits_all: np.ndarray) -> np.ndarray:
    """[k, N_BITS] uint8 → [k] uint32 remainders (vectorized)."""
    c = _crc_contrib()
    return np.bitwise_xor.reduce(
        np.where(bits_all.astype(bool), c[None, :], np.uint32(0)), axis=1
    )


# ---------------------------------------------------------------------------
# encode (test vectors / TX parity)
# ---------------------------------------------------------------------------


def encode_df17(icao: int, me_bits: np.ndarray) -> np.ndarray:
    """Build a 112-bit DF17 frame: DF(5)=17, CA(3)=5, ICAO(24), ME(56),
    PI = CRC24 over the first 88 bits."""
    me_bits = np.asarray(me_bits, dtype=np.uint8)
    assert len(me_bits) == 56
    bits = np.zeros(N_BITS, dtype=np.uint8)
    bits[:5] = [(17 >> (4 - i)) & 1 for i in range(5)]
    bits[5:8] = [(5 >> (2 - i)) & 1 for i in range(3)]
    bits[8:32] = [(icao >> (23 - i)) & 1 for i in range(24)]
    bits[32:88] = me_bits
    rem = _crc_remainder(np.concatenate([bits[:88], np.zeros(24, np.uint8)]))
    bits[88:] = [(rem >> (23 - i)) & 1 for i in range(24)]
    return bits


def callsign_me(callsign: str, tc: int = 4) -> np.ndarray:
    """ME field for an identification message (TC 1-4)."""
    charset = "#ABCDEFGHIJKLMNOPQRSTUVWXYZ##### ###############0123456789######"
    me = np.zeros(56, dtype=np.uint8)
    me[:5] = [(tc >> (4 - i)) & 1 for i in range(5)]
    cs = (callsign + " " * 8)[:8]
    for k, ch in enumerate(cs):
        code = charset.index(ch)
        for i in range(6):
            me[8 + 6 * k + i] = (code >> (5 - i)) & 1
    return me


def position_me(
    lat_cpr: int, lon_cpr: int, altitude_ft: int, odd: bool, tc: int = 11
) -> np.ndarray:
    """TC 9-18 airborne-position ME bits (TX/test side; pairs with
    :func:`futuresdr_tpu.models.adsb.tracker.cpr_encode`)."""
    me = np.zeros(56, np.uint8)
    me[0:5] = (tc >> np.arange(4, -1, -1)) & 1
    n = (altitude_ft + 1000) // 25
    nbits = (n >> np.arange(10, -1, -1)) & 1
    me[8:15] = nbits[:7]
    me[15] = 1  # Q bit: 25 ft increments
    me[16:20] = nbits[7:]
    me[21] = 1 if odd else 0
    me[22:39] = (lat_cpr >> np.arange(16, -1, -1)) & 1
    me[39:56] = (lon_cpr >> np.arange(16, -1, -1)) & 1
    return me


def velocity_me(
    vx_kt: int, vy_kt: int, vertical_rate_fpm: int = 0
) -> np.ndarray:
    """TC 19 subtype-1 ground-speed velocity ME bits (TX/test side).
    vx = east+, vy = north+ (knots)."""
    me = np.zeros(56, np.uint8)
    me[0:5] = (19 >> np.arange(4, -1, -1)) & 1
    me[5:8] = (1 >> np.arange(2, -1, -1)) & 1  # subtype 1
    ew = abs(vx_kt) + 1
    ns = abs(vy_kt) + 1
    me[13] = 1 if vx_kt < 0 else 0
    me[14:24] = (ew >> np.arange(9, -1, -1)) & 1
    me[24] = 1 if vy_kt < 0 else 0
    me[25:35] = (ns >> np.arange(9, -1, -1)) & 1
    vr = abs(vertical_rate_fpm) // 64 + 1
    me[36] = 1 if vertical_rate_fpm < 0 else 0
    me[37:46] = (vr >> np.arange(8, -1, -1)) & 1
    return me


def synthesize_frame(
    bits: np.ndarray, amplitude: float = 1.0, pad: int = 100
) -> np.ndarray:
    """PPM-modulate a 112-bit frame into complex baseband at 4 MS/s."""
    mag = np.zeros(PREAMBLE_LEN + N_BITS * SPS, dtype=np.float32)
    mag[:PREAMBLE_LEN] = np.repeat(
        (PREAMBLE_PATTERN > 0).astype(np.float32), SPS_HALF
    )
    for i, b in enumerate(bits):
        off = PREAMBLE_LEN + i * SPS
        if b:
            mag[off : off + SPS_HALF] = 1.0
        else:
            mag[off + SPS_HALF : off + SPS] = 1.0
    env = np.sqrt(np.maximum(mag, 0.0)) * amplitude
    sig = env.astype(np.complex64)
    return np.concatenate(
        [np.zeros(pad, np.complex64), sig, np.zeros(pad, np.complex64)]
    )


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

_CHARSET = "#ABCDEFGHIJKLMNOPQRSTUVWXYZ##### ###############0123456789######"


@lru_cache(maxsize=None)
def _crc_syndromes() -> tuple:
    """CRC24 syndrome of each single-bit error position (the code is
    linear, so remainder(bits ^ e_i) = remainder(bits) ^ syndrome_i).
    Powers Mode S bit-flip repair — a capability real trackers
    (dump1090 lineage) add beyond the reference decoder."""
    syn = []
    for i in range(N_BITS):
        b = np.zeros(N_BITS, np.uint8)
        b[i] = 1
        syn.append(int(_crc_remainder(b)))
    return tuple(syn)


def try_repair(
    bits: np.ndarray,
    confidence: np.ndarray,
    max_flips: int = 2,
    n_candidates: int = 12,
):
    """Attempt CRC-guided repair of up to ``max_flips`` bit errors.

    Single-bit fixes use the exact syndrome lookup (unique within the
    112-bit span); two-bit fixes search pairs among the
    ``n_candidates`` lowest-|confidence| positions, the dump1090-style
    heuristic that keeps false repairs rare. Returns
    ``(bits, n_corrected)`` with ``n_corrected = -1`` when unrepaired."""
    r = int(_crc_remainder(bits))
    if r == 0:
        return bits, 0
    syn = _crc_syndromes()
    for i in range(N_BITS):
        if syn[i] == r:
            out = bits.copy()
            out[i] ^= 1
            return out, 1
    if max_flips >= 2:
        cand = np.argsort(confidence)[:n_candidates]
        for ai in range(len(cand)):
            for bi in range(ai + 1, len(cand)):
                if (syn[cand[ai]] ^ syn[cand[bi]]) == r:
                    out = bits.copy()
                    out[cand[ai]] ^= 1
                    out[cand[bi]] ^= 1
                    return out, 2
    return bits, -1


def _build_frame(
    bits: np.ndarray,
    crc_ok: bool,
    start: int,
    snr: float,
    corrected: int = 0,
) -> "AdsbFrame":
    """Shared frame constructor: df/icao extraction + field decode —
    the single site both the RF receiver tail (:meth:`AdsbReceiver.
    _demod_soft`) and the message-plane entry (:func:`frame_from_bits`)
    build frames through, so the two decodes can never drift."""
    df = int(bits[:5] @ (1 << np.arange(4, -1, -1)))
    icao = int(bits[8:32] @ (1 << np.arange(23, -1, -1)))
    f = AdsbFrame(
        bits=bits,
        df=df,
        icao=icao,
        crc_passed=bool(crc_ok),
        start=int(start),
        snr=float(snr),
        corrected=int(corrected),
    )
    if f.crc_passed:
        _decode_fields(f)
    return f


def frame_from_bits(
    bits: np.ndarray, start: int = 0, snr: float = 0.0
) -> "AdsbFrame":
    """Build a decoded :class:`AdsbFrame` from raw 112 demodulated bits
    (df/icao/CRC/field decode) — the message-plane entry point for
    :class:`~futuresdr_tpu.models.adsb.tracker.TrackerBlock`, which may
    receive frames as packed-byte blobs over a Pmt edge."""
    bits = np.asarray(bits, dtype=np.uint8).reshape(-1)
    if bits.size != N_BITS:
        raise ValueError(f"expected {N_BITS} bits, got {bits.size}")
    return _build_frame(bits, _crc_remainder(bits) == 0, start, snr)


@dataclass
class AdsbFrame:
    bits: np.ndarray
    df: int
    icao: int
    crc_passed: bool
    start: int
    snr: float
    corrected: int = 0  # bits repaired via CRC syndrome (0 = clean)
    callsign: Optional[str] = None
    altitude_ft: Optional[int] = None
    type_code: Optional[int] = None


def _decode_fields(frame: AdsbFrame) -> None:
    bits = frame.bits
    if frame.df != 17:
        return
    tc = int(bits[32:37] @ (1 << np.arange(4, -1, -1)))
    frame.type_code = tc
    if 1 <= tc <= 4:
        cs = ""
        for k in range(8):
            code = int(
                bits[40 + 6 * k : 46 + 6 * k] @ (1 << np.arange(5, -1, -1))
            )
            cs += _CHARSET[code]
        frame.callsign = cs.replace("#", "").rstrip()
    elif 9 <= tc <= 18:
        # barometric altitude (ME bits 8..19, Q-bit at index 15 of alt)
        alt = bits[40:52]
        q = alt[7]
        if q:
            v = np.concatenate([alt[:7], alt[8:]])
            n = int(v @ (1 << np.arange(10, -1, -1)))
            frame.altitude_ft = n * 25 - 1000


class AdsbReceiver(StreamingReceiver):
    """Magnitude-domain Mode S receiver over an IQ (or envelope) buffer."""

    def __init__(
        self,
        threshold: float = 3.0,
        forward_failed_crc: bool = False,
        max_frames_per_chunk: int = 256,
    ):
        # threshold 3.0 (was 4.0): ~2 dB more sensitive, zero CRC-clean
        # false frames over 4M noise-only samples (the CRC24 gate holds)
        self.threshold = float(threshold)
        self.forward_failed_crc = forward_failed_crc
        self.max_frames = int(max_frames_per_chunk)
        self.frames: List[AdsbFrame] = []
        self.n_crc_ok = 0
        self.n_crc_fail = 0

    # process/process_stream come from StreamingReceiver (the shared
    # dispatch/collect pipelining harness, models/streaming.py)

    def _dispatch(self, iq):
        """Dispatch metrics + candidate detection (no host sync)."""
        if isinstance(iq, cplx.CArray):
            # device-resident ingest (see prepare_device_iq): streaming
            # pipelines keep IQ on device; re-uploading each chunk costs
            # ~bucket·8 B over a ~2-20 MB/s dev tunnel
            xc = iq
            if int(xc.shape[-1]) % 16384:
                raise ValueError("device IQ must be a 16384-multiple")
            n = int(xc.shape[-1])
        else:
            x = np.asarray(iq, dtype=np.complex64)
            bucket = -(-len(x) // 16384) * 16384
            if bucket != len(x):
                x = np.concatenate(
                    [x, np.zeros(bucket - len(x), np.complex64)]
                )
            xc = cplx.from_numpy(x)
            n = len(x)
        # device: metrics + candidates + NMS + soft windows, one program
        packed_d = _detect_fn(n, self.max_frames, self.threshold)(xc)
        return dict(dev=packed_d, n=n)

    def _collect(self, d) -> List[AdsbFrame]:
        # the whole detect → NMS → soft-window chain ran on device; one
        # packed fetch holds (idx, noise-floor, taken, soft windows)
        packed = np.asarray(jax.device_get(d["dev"]))
        from futuresdr_tpu.ops.packing import unpack_int_f32

        kmax = packed.shape[0] // (3 + N_BITS)
        idx_a = unpack_int_f32(packed[:kmax])
        nfp_a = packed[kmax : 2 * kmax]
        taken_a = packed[2 * kmax : 3 * kmax] > 0.5
        soft_all = packed[3 * kmax :].reshape(kmax, N_BITS)

        out: List[AdsbFrame] = []
        sel = np.flatnonzero(taken_a)
        if sel.size == 0:
            return out
        # vectorized batch CRC: only failures enter the bit-repair path
        bits_all = (soft_all[sel] > 0).astype(np.uint8)
        rems = _crc_remainder_batch(bits_all)
        for gi, i in enumerate(sel):
            f = self._demod_soft(
                soft_all[i],
                float(nfp_a[i]),
                int(idx_a[i]),
                crc_ok=bool(rems[gi] == 0),
            )
            if f is None:
                continue
            if f.crc_passed:
                self.n_crc_ok += 1
            else:
                self.n_crc_fail += 1
                if not self.forward_failed_crc:
                    continue
            out.append(f)
        out.sort(key=lambda f: f.start)
        self.frames.extend(out)
        return out

    def _demod_soft(
        self,
        soft: np.ndarray,
        nf_start: float,
        start: int,
        crc_ok: Optional[bool] = None,
    ):
        bits = (soft > 0).astype(np.uint8)
        if crc_ok is None:
            crc_ok = _crc_remainder(bits) == 0
        corrected = 0
        if not crc_ok:
            bits, corrected = try_repair(bits, np.abs(soft))
            crc_ok = corrected > 0
        snr = float(
            10.0
            * np.log10(
                (np.abs(soft).mean() + 1e-12) / (nf_start + 1e-12)
            )
        )
        return _build_frame(bits, crc_ok, start, snr, max(corrected, 0))
