"""802.11a/g OFDM receiver — TPU-native hybrid.

Parity: the reference RX chain ``examples/wlan/src/bin/rx.rs:75-105`` →
``sync_short.rs`` → ``sync_long.rs`` → ``Fft`` → ``frame_equalizer.rs`` →
``decoder.rs``.

TPU-first split (SURVEY.md §7 hard part #1 — variable-rate sync is the
core impedance mismatch with XLA's static shapes):

* **Device** (one fused jit per chunk): the correlation *metrics* — the
  16-lag autocorrelation moving sum, power moving sum, and normalized
  correlation (what the reference computes with Delay/Combine/MovingAverage
  blocks) — plus, per detected frame, the whole symbol-domain front-end:
  LTF cross-correlation (64-tap complex FIR), fine CFO ramp, batched
  64-point FFTs, LS channel estimate, pilot phase tracking, equalization.
* **Host**: the tiny sequential decisions — sync_short's threshold state
  machine over the metric array, SIGNAL decode, per-MCS demap/deinterleave/
  Viterbi/descramble/CRC.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache, partial
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from futuresdr_tpu.models.wlan import consts as C
from futuresdr_tpu.models.wlan.viterbi import (
    depuncture,
    depuncture_soft,
    viterbi_decode,
    viterbi_decode_soft,
)
from futuresdr_tpu.models.streaming import StreamingReceiver
from futuresdr_tpu.ops import cplx
from futuresdr_tpu.ops.cplx import CArray
from futuresdr_tpu.ops.fft import fft_c, fftshift_c
from futuresdr_tpu.ops.fir import conv1d_valid, moving_sum

THRESHOLD = 0.56  # sync_short.rs:5
MIN_GAP = 480  # sync_short.rs:3
MAX_SAMPLES = 540 * 80  # sync_short.rs:4
SEARCH_WINDOW = 320  # sync_long.rs:3
MAX_SYMS = 538  # data symbols retained per frame window
_SYM_SPAN = 128 + 16 + MAX_SYMS * 80 + 64  # LTFs + SIG/data symbol samples
FRAME_WIN = SEARCH_WINDOW + _SYM_SPAN  # device window per frame

CRC32_RESIDUE = 558161692  # decoder.rs:89


# ---------------------------------------------------------------------------
# device kernels
# ---------------------------------------------------------------------------


@jax.jit
def sync_metrics(x: CArray):
    """The sync_short input metrics (rx.rs:75-94 wiring).

    Returns ``(autocorr, cor)`` where ``autocorr[n] = Σ_{k<48}
    x[n+k+16]·conj(x[n+k])`` (the moving-averaged 16-lag autocorrelation,
    as seen at the *delayed* stream position) and ``cor`` its power-
    normalized magnitude."""
    n = x.shape[-1]
    d = x[16:] * x[: n - 16].conj()  # lag-16 autocorrelation
    a = moving_sum(d, 48)  # moving sum over 48 (O(N) rowwise cumsum)
    p = moving_sum(x.abs2(), 64)  # power sum 64
    m = min(a.shape[-1], p.shape[-1])
    cor = a.abs()[..., :m] / (p[..., :m] * (48.0 / 64.0) + 1e-12)
    return a, cor


def _fft64(v: CArray) -> CArray:
    """[..., 64] time → fftshifted spectrum (Fft block + the equalizer's
    own (k+32)%64 shift, frame_equalizer.rs:214-217)."""
    return fftshift_c(fft_c(v), axis=-1)


_DETECT_BLK = 256  # leader window == block size: one leader per block


@partial(jax.jit, static_argnames=("kmax", "lo", "hi"))
def detect_candidates(
    a: CArray,
    cor: jnp.ndarray,
    kmax: int,
    lo: Optional[int] = None,
    hi: Optional[int] = None,
):
    """Device-side sync_short candidate extraction.

    Two consecutive above-threshold correlation samples mark a candidate
    (sync_short.rs:84-140's trigger condition); the MIN_GAP resync walk
    stays on host but now sees only ``kmax`` (index, coarse-CFO) pairs —
    a few hundred bytes D2H instead of the full metric arrays (the
    full-chunk autocorr+cor fetch was ~12 B/sample over a ~35 ms-RTT
    tunnel: the round-1 receiver's actual rate limit).

    Compaction is gather/scatter-free: leaders are >= _DETECT_BLK apart
    by construction, so 256-sample blocks hold at most one each — a masked
    per-block reduction pulls (position, a) per block, and one
    ``lax.sort`` packs the occupied blocks to the front.  The previous
    ``jnp.nonzero`` form cost ~35 ms of flat scatter time per 3.8 M
    samples on v5e; this form measures at dispatch cost."""
    from futuresdr_tpu.ops.detect import EMPTY, compact_mask, suppress_recent

    above = cor > THRESHOLD
    hit = jnp.logical_and(above[1:], above[:-1])
    # leader filter: a candidate counts only when the preceding
    # _DETECT_BLK samples had no hit — the STF's ~100 consecutive
    # double-crossings collapse to one index each, so kmax bounds
    # *frames*, not samples. The window is _DETECT_BLK (256), NOT
    # MIN_GAP (480): any quiet span longer than the STF hit run admits a
    # new leader (a frame SIFS-close behind a minimal-length frame is
    # still seen — the reference's resync walk accepts starts >= MIN_GAP
    # apart without requiring MIN_GAP of *silence*, sync_short.rs:84-140;
    # that spacing rule is enforced by the host walk downstream), while
    # 256 still exceeds the STF's ~160-224-sample run so one STF can
    # never split into two leaders.
    n_h = hit.shape[-1]
    leader = suppress_recent(hit, _DETECT_BLK)
    if lo is not None or hi is not None:
        # ownership bounds for time-sharded detection (sharded.py):
        # candidate idx = pos+1 must land in [lo, hi) — the leader
        # FILTER above still sees halo hits outside the bounds
        ar = jnp.arange(n_h)
        lo_p = (lo - 1) if lo is not None else 0
        hi_p = (hi - 1) if hi is not None else n_h
        leader = leader & (ar >= lo_p) & (ar < hi_p)
    # the CFO estimate reads a[pos+1] (the candidate index itself)
    a1 = CArray(a.re[1:], a.im[1:])
    key_s, are_s, aim_s = compact_mask(
        leader, _DETECT_BLK, kmax, payload=(a1.re, a1.im)
    )
    idx = jnp.where(key_s < EMPTY, key_s + 1, -1)
    f_off = -jnp.arctan2(aim_s, are_s) / 16.0
    # true leader count: lets the caller detect kmax overflow (leaders
    # past the first kmax are sort-truncated) and re-run loss-free
    n_lead = leader.sum().astype(jnp.int32)
    return idx, f_off, n_lead


def _span(n_syms: int) -> int:
    """Samples needed past the LTF start for ``n_syms`` symbols."""
    return 128 + 16 + 80 * n_syms


def _frame_front_body(w: CArray, n_syms: int = MAX_SYMS + 1):
    """Per-frame device front-end over the first ``n_syms`` symbols
    (s=0 is SIGNAL). ``w``: CFO-corrected samples from the detected STF
    position, at least ``SEARCH_WINDOW + _span(n_syms)`` long.

    Returns (eq_syms [n_syms, 48] equalized symbols, h [64], snr,
    offset, f_fine)."""
    # --- LTF cross-correlation over the search window (sync_long.rs:18-50)
    # np (host) taps on purpose: jnp constants built inside the traced
    # body are Tracers in this JAX version and would demote conv1d_valid
    # to the XLA conv lowering (measured 276 ms vs ~0 at long lengths)
    taps = CArray(
        np.real(C.LONG_CORR[::-1]).astype(np.float32),
        np.imag(C.LONG_CORR[::-1]).astype(np.float32),
    )
    # conv1d_valid computes Σ w[i+k]·taps_rev[k] with taps reversed → pass
    # reversed so the product is Σ w[i+k]·LONG_CORR[k]
    seg = w[..., : SEARCH_WINDOW + 63]
    c = conv1d_valid(seg, taps)  # [SEARCH_WINDOW]
    power = c.abs2()
    i1 = jnp.argmax(power)
    masked = jnp.where(
        jnp.abs(jnp.arange(SEARCH_WINDOW) - i1) < 2, -1.0, power
    )
    i2 = jnp.argmax(masked)
    first = jnp.minimum(i1, i2)
    second = jnp.maximum(i1, i2)
    cf = c[first]
    cs = c[second]
    f_fine = (cf * cs.conj()).angle() / 64.0

    # --- fine-CFO-corrected, aligned symbol extraction ------------------
    span = _span(n_syms)
    aligned = cplx.apply1(
        lambda t: jax.lax.dynamic_slice_in_dim(t, first, span, axis=-1),
        w,
    )
    ramp = cplx.exp_j(jnp.arange(span, dtype=jnp.float32) * f_fine)
    v = aligned * ramp

    ltf = _fft64(v[..., :128].reshape(2, 64))  # [2, 64]
    # symbol s occupies [128+16+80s, +64); SIGNAL is s=0
    idx = (
        128 + 16 + 80 * jnp.arange(n_syms)[:, None] + jnp.arange(64)
    )
    syms_t = cplx.apply1(lambda t: jnp.take(t, idx.reshape(-1), axis=-1), v)
    syms_t = syms_t.reshape(n_syms, 64)
    syms = _fft64(syms_t)  # [n_syms, 64]

    # --- channel estimate (frame_equalizer.rs Equalizer::sync1/sync2) ---
    lmask = jnp.asarray(np.real(C.LONG_FREQ_SHIFTED).astype(np.float32))
    h = (ltf[0] + ltf[1]) * (0.5 * lmask)  # L = ±1 ⇒ divide == multiply
    diff = (ltf[0] - ltf[1]).abs2()
    summ = (ltf[0] + ltf[1]).abs2()
    occupied = (lmask != 0).astype(jnp.float32)
    snr = 10.0 * jnp.log10(
        jnp.sum(summ * occupied) / (jnp.sum(diff * occupied) + 1e-12) / 2.0
    )

    # --- pilot phase tracking (frame_equalizer.rs:225-250) --------------
    # symbol s (SIGNAL = 0) uses POLARITY[s % 127]. Pilots are EQUALIZED
    # (divided by h) before the angle: h already carries the common phase
    # of the LTF reference, so measuring raw pilots would re-apply that
    # phase a second time — the double correction cost ~7 dB of EVM at
    # moderate SNR (found by A/B against a true-h equalizer)
    pol = jnp.asarray(
        C.POLARITY[np.arange(n_syms) % 127].astype(np.float32)
    )
    p11 = syms[:, 11] / h[11]
    p25 = syms[:, 25] / h[25]
    p39 = syms[:, 39] / h[39]
    p53 = syms[:, 53] / h[53]
    beta = (
        (p11 * pol) + (p39 * pol) + (p25 * pol) + (p53 * (-pol))
    ).angle()
    corr = cplx.exp_j(-beta)
    syms = syms * CArray(corr.re[:, None], corr.im[:, None])

    # --- equalize data subcarriers --------------------------------------
    data_idx = jnp.asarray(np.asarray(C.DATA_IDX, dtype=np.int64))
    hd = h[data_idx]
    eq = syms[:, data_idx] / CArray(
        hd.re[None, :], hd.im[None, :]
    )
    return eq, h, snr, first, f_fine


frame_front = jax.jit(_frame_front_body, static_argnums=(1,))

LLR_INT8_SCALE = 32.0  # int8 LLR quantization step (Viterbi is scale-free)


@jax.jit
def _convert_sc16(raw: jnp.ndarray) -> CArray:
    """Interleaved int16 I/Q → CArray floats, on device (sc16 ingest)."""
    f = raw.astype(jnp.float32) * (1.0 / 32768.0)
    return CArray(f[0::2], f[1::2])


@jax.jit
def _convert_cs8(raw: jnp.ndarray) -> CArray:
    """Interleaved int8 I/Q → CArray floats, on device (cs8 ingest —
    HackRF-style wire format, 8x fewer H2D bytes than complex64)."""
    f = raw.astype(jnp.float32) * (1.0 / 128.0)
    return CArray(f[0::2], f[1::2])


def _demap_llrs_f32(eq: CArray, n_bpsc: int) -> jnp.ndarray:
    """Device max-log demapper (same math as ``consts.demap_soft``):
    CArray symbols [..., 48] → f32 LLRs [..., 48, n_bpsc]."""
    if n_bpsc == 1:
        return (2.0 * eq.re)[..., None]
    half = n_bpsc // 2
    lev = (C._gray_levels(half) / C.MOD_NORM[n_bpsc]).astype(np.float32)
    shifts = half - 1 - np.arange(half)
    bits_of_lev = (
        (np.arange(len(lev))[:, None] >> shifts) & 1
    ).astype(bool)  # [n_lev, half]

    def axis_llrs(v):  # [..., 48] → [..., 48, half]
        d2 = (v[..., None] - lev) ** 2  # [..., 48, n_lev]
        outs = []
        for i in range(half):
            m1 = jnp.min(
                jnp.where(bits_of_lev[:, i], d2, np.float32(np.inf)),
                axis=-1,
            )
            m0 = jnp.min(
                jnp.where(~bits_of_lev[:, i], d2, np.float32(np.inf)),
                axis=-1,
            )
            outs.append(m0 - m1)
        return jnp.stack(outs, axis=-1)

    return jnp.concatenate([axis_llrs(eq.re), axis_llrs(eq.im)], axis=-1)


@lru_cache(maxsize=None)
def _demap_llrs_int8(n_bpsc: int):
    """Device max-log demapper → int8 LLRs. Moving quantized *bits*
    instead of complex64 *symbols* across the D2H boundary cuts the
    dominant fetch 4-8x — the measured dev-tunnel moves ~10-20 MB/s, so
    the [kb, nf, 48] c64 symbol matrix (12+ MB on dense captures) was
    the receiver's rate limit. (Used by the hard-decision path; the soft
    path decodes fully on device, see ``_device_decode_tail``.)"""

    def fn(eq: CArray):
        llr = _demap_llrs_f32(eq, n_bpsc)
        return jnp.clip(
            jnp.round(llr * LLR_INT8_SCALE), -127, 127
        ).astype(jnp.int8)

    return jax.jit(fn)


VITERBI_RADIX = 4  # trellis steps collapsed per scan iteration (ops/viterbi)


def _perm_matrix(perm: np.ndarray) -> np.ndarray:
    """One-hot matrix P with (x @ P)[..., j] = x[..., perm[j]] — static
    permutations as an MXU matmul instead of a gather (gathers carry a
    large flat per-program cost on this backend; matmuls are free at
    these sizes)."""
    n = len(perm)
    P = np.zeros((n, n), np.float32)
    P[np.asarray(perm), np.arange(n)] = 1.0
    return P


@lru_cache(maxsize=None)
def _detect_program(kmax: int, max_frames: int):
    """Detection half of the receiver front: sync_short metrics →
    leader-filtered candidates → the MIN_GAP resync walk
    (sync_short.rs:84-140, as a scan over the ≤kmax leaders).

    Split from the SIGNAL pass on purpose: fusing the walk scan with the
    gather-heavy per-frame front-end provoked XLA into a 13×-slower
    program (425 ms vs 33 ms for the same math on a 3.8 M-sample
    capture) — the scan body absorbed surrounding work. Two programs +
    one combined fetch keep every stage in its fast form."""

    def fn(x: CArray, n_real: jnp.ndarray):
        bucket = x.shape[-1] - FRAME_WIN
        a, cor = sync_metrics(x[..., :bucket])
        idx, f_off, n_lead = detect_candidates(a, cor, kmax)

        # MIN_GAP resync walk: accept leaders ≥ MIN_GAP apart, window
        # must fit before the valid-sample end, stop at max_frames
        fit_end = n_real - (SEARCH_WINDOW + 128 + 16 + 80)

        def walk(carry, inp):
            last, count = carry
            i, _fo = inp
            start = i + 47
            ok = (
                (i >= 0)
                & (i - last >= MIN_GAP)
                & (start <= fit_end)
                & (count < max_frames)
            )
            last = jnp.where(ok, i, last)
            count = count + ok.astype(jnp.int32)
            return (last, count), ok

        init = (jnp.int32(-(10**9)), jnp.int32(0))
        _, valid = jax.lax.scan(walk, init, (idx, f_off))
        starts = jnp.where(valid, idx + 47, 0).astype(jnp.int32)
        return starts, valid, f_off, n_lead

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _signal_program(kmax: int):
    """SIGNAL pass: batched one-symbol front-end + BPSK demap +
    deinterleave (one-hot matmul) + 24-bit batched Viterbi. Returns the
    raw decoded SIGNAL bits — RATE/LENGTH/parity unpacking is five lines
    of host numpy on a [kmax, 24] byte array (sync_short.rs's successor
    decisions are inherently sequential host logic anyway)."""
    from futuresdr_tpu.ops.viterbi import make_batch_viterbi_soft

    # numpy constant (embeds per-trace) — a factory-time jnp.asarray
    # caches a tracer when the factory first runs inside a trace
    Pp = _perm_matrix(C.interleaver_permutation(48, 1))
    viterbi = make_batch_viterbi_soft(radix=VITERBI_RADIX)
    sig_front = _frame_front_from_starts(kmax, 1)

    def fn(x: CArray, starts: jnp.ndarray, f_off: jnp.ndarray):
        eq_a, _h, snr, _off, _ff = sig_front(x, starts, f_off)
        eq_sig = eq_a[:, 0]  # [kmax, 48]
        llr = (2.0 * eq_sig.re) @ Pp  # bpsk demap + deinterleave
        dec = viterbi(llr.reshape(kmax, 24, 2))
        return dec, snr

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _spec_gate_program(kmax: int, rate_bits: int, n_dbps: int, nf: int):
    """Device-side SIGNAL gate for the speculative single-fetch path:
    unpack RATE/parity/LENGTH from the decoded SIGNAL bits (same bit
    math as :func:`unpack_signal_fields`, on device) and emit per-row
    ``(ok, n_data_bits)`` for the speculated MCS/frame-length bucket.
    Rows failing the gate get ``n_data_bits = 0`` (full-erasure tail)
    and are re-decoded by the classic path after the fetch."""

    def fn(dec_d: jnp.ndarray, valid_d: jnp.ndarray):
        dec = dec_d.astype(jnp.int32)
        rate = dec[:, :4] @ (1 << jnp.arange(4))
        parity = (dec[:, :17].sum(axis=1) % 2) == dec[:, 17]
        length = dec[:, 5:17] @ (1 << jnp.arange(12))
        n_sym = -(-(16 + 8 * length + 6) // n_dbps)
        ok = (
            valid_d
            & parity
            & (length > 0)
            & (n_sym <= nf)
            & (rate == rate_bits)
        )
        nbits = jnp.where(ok, n_sym * n_dbps, 0).astype(jnp.int32)
        return ok, nbits

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _device_decode_tail(mcs_name: str, nf: int):
    """The whole decode tail ON DEVICE: demap → deinterleave →
    depuncture → batched soft Viterbi → descramble → byte packing.

    Parity: decoder.rs + viterbi_decoder.rs + interleaving of lib.rs,
    re-architected so a dense capture's frames decode as one batched
    device program and only final PSDU *bytes* cross D2H (~9x fewer
    bytes than the int8 LLR fetch, and no per-frame host ACS loops —
    the two dominant dense-capture costs on tunnel-limited hosts).

    Per-frame true lengths arrive as a vector; positions beyond a
    frame's coded length get LLR 0 (erasure), which freezes the path
    metrics so traceback through the padded tail stays on the frame's
    best path.

    Returns jitted ``fn(eq_data[kb, nf, 48] CArray, n_data_bits[kb])
    → bytes[kb, T//8] uint8`` with T = n_dbps·nf.
    """
    mcs = C.MCS[mcs_name]
    t_bits = mcs.n_dbps * nf
    # deinterleave as a one-hot MXU matmul (gathers carry a large flat
    # per-program cost on this backend — see _perm_matrix)
    Pp = _perm_matrix(
        C.interleaver_permutation(mcs.n_cbps, mcs.n_bpsc)
    )
    # depuncture as a block-periodic matmul: within one puncture period
    # of P output slots fed by npp survivors, coded_block = stream_block
    # @ M with M[src0[r], r] = pat0[r]; periods (2/4/6) always divide
    # 2·t_bits because every n_dbps is a multiple of 12
    pat0 = np.asarray(mcs.puncture, bool)
    P_len = len(pat0)
    npp = int(pat0.sum())
    src0 = np.zeros(P_len, np.int32)
    src0[pat0] = np.arange(npp, dtype=np.int32)
    M = np.zeros((npp, P_len), np.float32)
    for r in range(P_len):
        if pat0[r]:
            M[src0[r], r] = 1.0
    assert (2 * t_bits) % P_len == 0
    n_blocks = (2 * t_bits) // P_len
    assert n_blocks * npp == nf * mcs.n_cbps
    # scrambler stream is 127-periodic; row per 7-bit seed
    fb_table = np.stack(
        [C.scrambler_stream(s, 127) for s in range(128)]
    ).astype(np.float32)
    seed_w = np.array([64, 32, 16, 8, 4, 2, 1], np.int32)
    byte_w = (1 << np.arange(8)).astype(np.int32)  # packbits little
    n_rep = -(-(t_bits - 7) // 127)
    from futuresdr_tpu.ops.viterbi import make_batch_viterbi_soft

    viterbi = make_batch_viterbi_soft(radix=VITERBI_RADIX)

    def fn(eq_data: CArray, n_data_bits: jnp.ndarray) -> jnp.ndarray:
        kb = eq_data.shape[0]
        llr = _demap_llrs_f32(eq_data, mcs.n_bpsc)  # [kb, nf, 48, n_bpsc]
        sym = llr.reshape(kb, nf, mcs.n_cbps) @ jnp.asarray(Pp)
        stream = sym.reshape(kb, n_blocks, npp)
        coded = (stream @ jnp.asarray(M)).reshape(kb, 2 * t_bits)
        j = jnp.arange(2 * t_bits, dtype=jnp.int32)
        coded = jnp.where(j < 2 * n_data_bits[:, None], coded, 0.0)
        bits = viterbi(coded.reshape(kb, t_bits, 2))  # [kb, T] uint8
        seed_oh = (
            jnp.sum(bits[:, :7].astype(jnp.int32) * seed_w, axis=-1)[
                :, None
            ]
            == jnp.arange(128, dtype=jnp.int32)[None, :]
        ).astype(jnp.float32)  # [kb, 128] one-hot
        fb_rows = seed_oh @ jnp.asarray(fb_table)  # [kb, 127]
        fb = jnp.tile(fb_rows, (1, n_rep))[:, : t_bits - 7].astype(
            jnp.uint8
        )
        descr = jnp.concatenate(
            [jnp.zeros((kb, 7), jnp.uint8), bits[:, 7:] ^ fb], axis=1
        )
        by = jnp.sum(
            descr.reshape(kb, t_bits // 8, 8).astype(jnp.int32) * byte_w,
            axis=-1,
        ).astype(jnp.uint8)
        return by

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _frame_front_from_starts(kb: int, n_syms: int = MAX_SYMS + 1):
    """Batched front-end gathering its windows ON DEVICE from the resident
    chunk: per candidate, dynamic-slice the window at ``start``, apply the
    coarse-CFO ramp, run the front-end — no host window assembly/re-upload
    (round 1 shipped every window H2D a second time).

    ``n_syms`` bounds the per-frame symbol work: the receiver first runs a
    SIGNAL-only pass (n_syms=1, ~600-sample windows), decodes the frame
    lengths on host, then re-runs bucketed to the longest frame — a 500 B
    frame costs ~25 symbols of FFT/track/equalize instead of MAX_SYMS+1
    = 539 (the round-1 fixed-shape front-end's dominant waste)."""
    win = SEARCH_WINDOW + _span(n_syms)

    def fn(x: CArray, starts: jnp.ndarray, f_shorts: jnp.ndarray):
        n = jnp.arange(win, dtype=jnp.float32)

        def one(start, f_short):
            w = cplx.apply1(
                lambda t: jax.lax.dynamic_slice_in_dim(t, start, win, axis=-1),
                x,
            )
            return _frame_front_body(w * cplx.exp_j(f_short * n), n_syms)

        return jax.vmap(one)(starts, f_shorts)

    return jax.jit(fn)


# ---------------------------------------------------------------------------
# host logic
# ---------------------------------------------------------------------------


@dataclass
class RxFrame:
    mcs: str
    psdu: bytes
    snr: float
    crc_ok: bool
    start: int  # sample index of detected frame start


def _deinterleave(bits: np.ndarray, mcs: C.Mcs) -> np.ndarray:
    perm = C.interleaver_permutation(mcs.n_cbps, mcs.n_bpsc)
    blocks = bits.reshape(-1, mcs.n_cbps)
    return blocks[:, perm].reshape(-1)


def _descramble(decoded: np.ndarray, psdu_size: int) -> bytes:
    """decoder.rs:92-118: seed from the first 7 bits, then LFSR forward —
    vectorized via the precomputed scrambler stream."""
    state = 0
    for i in range(7):
        if decoded[i]:
            state |= 1 << (6 - i)
    total = psdu_size * 8 + 16
    from futuresdr_tpu.models.wlan.consts import scrambler_stream

    fb = scrambler_stream(state, total - 7)
    bits = np.zeros(total, dtype=np.uint8)
    bits[7:] = (decoded[7:total] & 1) ^ fb
    # bits 0..15 are the SERVICE field and are discarded below
    data = np.packbits(bits, bitorder="little")
    return bytes(data[2 : psdu_size + 2])


def unpack_signal_fields(dec_a: np.ndarray):
    """SIGNAL field unpack (signal.rs RATE/LENGTH/parity) from the
    [kmax, 24] decoded-bit matrix — shared by the receiver and the
    per-stage profiler (perf/wlan_profile.py) so the two cannot drift.
    Returns (rate[kmax], parity_ok[kmax], length[kmax]) numpy arrays."""
    dec = dec_a.astype(np.int32)
    rate = dec[:, :4] @ (1 << np.arange(4))
    parity = (dec[:, :17].sum(axis=1) % 2) == dec[:, 17]
    length = dec[:, 5:17] @ (1 << np.arange(12))
    return rate, parity, length


def prepare_device_iq(iq: np.ndarray):
    """Upload host IQ once, padded to receiver shape.

    ``iq`` is complex64 samples OR interleaved-int16 I/Q (sc16, length
    2N).  Returns ``(x, n_real, bucket)``: a device-resident CArray of
    length ``bucket + FRAME_WIN`` (bucket = next 32768 multiple — stable
    jit shapes so the receiver compiles once; FRAME_WIN guard zeros so
    device-side window slices near the chunk end never clamp into valid
    data), the true sample count, and the bucket.  Pass the CArray to
    ``WlanReceiver.process`` to decode without re-crossing H2D — on
    tunnel-limited dev hosts the upload, not the machine, otherwise
    bounds the rate."""
    iq = np.asarray(iq)
    is_wire = iq.dtype in (np.int16, np.int8)
    n_real = len(iq) // 2 if is_wire else len(iq)
    bucket = -(-n_real // 32768) * 32768
    pad = bucket - n_real + FRAME_WIN
    if is_wire:
        raw = np.concatenate([iq, np.zeros(2 * pad, iq.dtype)])
        conv = _convert_sc16 if iq.dtype == np.int16 else _convert_cs8
        x = conv(jnp.asarray(raw))
    else:
        arr = np.concatenate(
            [iq.astype(np.complex64), np.zeros(pad, np.complex64)]
        )
        x = cplx.from_numpy(arr)
    return x, n_real, bucket


class WlanReceiver(StreamingReceiver):
    """Chunk-oriented receiver: feed IQ, collect decoded frames."""

    def __init__(self, max_frames_per_chunk: int = 16, soft: bool = True):
        # soft: max-log LLR demap + soft-decision Viterbi (~1-2 dB over
        # the hard path, which is kept for A/B)
        self.max_frames = max_frames_per_chunk
        self.soft = bool(soft)
        self.frames: List[RxFrame] = []
        # speculative streaming fast path: (mcs_name, nf) learned from
        # the previous capture. Streaming workloads are chunk sequences
        # of near-identical traffic; with the MCS and symbol bucket
        # known in advance the whole decode chains device-to-device and
        # ONE combined fetch replaces the two round-trips of the classic
        # path (~28 ms each through tunneled hosts — the dominant cost
        # of small captures). Mismatched frames fall back per-row.
        self._spec: Optional[Tuple[str, int]] = None

    @staticmethod
    def _prepare(iq):
        """Upload/validate IQ → (device CArray, n_real, bucket)."""
        if isinstance(iq, CArray):
            # device-resident ingest (streaming pipelines keep IQ on
            # device; dev tunnels move ~10-20 MB/s, so re-uploading would
            # bound the decode rate by the transport, not the machine).
            # Buffer must be prepare_device_iq-shaped: a 32768-multiple
            # of valid samples plus FRAME_WIN guard zeros.
            bucket = int(iq.shape[-1]) - FRAME_WIN
            if bucket <= 0 or bucket % 32768:
                raise ValueError(
                    "device IQ must come from prepare_device_iq() "
                    f"(got length {int(iq.shape[-1])})"
                )
            return iq, bucket, bucket
        return prepare_device_iq(iq)

    def process(self, iq: np.ndarray) -> List[RxFrame]:
        """Feed IQ; returns decoded frames.

        ``iq`` may be complex64 OR interleaved-int16 I/Q (sc16 radio
        format, length 2N): the int16 path uploads raw samples and
        converts on device — 4x fewer H2D bytes, which matters on
        PCIe/tunnel-limited hosts."""
        x, n_real, bucket = self._prepare(iq)
        if self.soft and self._spec is not None:
            out = self._process_speculative(x, n_real, bucket)
            if out is not None:
                self.frames.extend(out)
                return out
        out = self._process_classic(x, n_real, bucket)
        self.frames.extend(out)
        return out

    # process_stream itself is inherited from StreamingReceiver (the
    # shared depth validation lives in ONE place); only the pipeline
    # body differs.
    def _stream_impl(self, chunks, depth: int):
        """WLAN pipeline body: once the speculative gate is warm, up to
        ``depth`` chunks' whole device chains dispatch BEFORE the oldest
        chunk's combined fetch — the fetch round-trip (~28-40 ms through
        tunneled hosts) overlaps the next chunk's compute, so steady
        state costs ``max(compute, fetch)`` instead of their sum. Chunks
        that trip the gate (traffic change, leader overflow) re-decode
        classically without breaking order."""
        from collections import deque

        # each entry: (dispatched-device-refs, x, n_real, bucket)
        pending: deque = deque()
        for iq in chunks:
            x, n_real, bucket = self._prepare(iq)
            if self.soft and self._spec is not None:
                pending.append((self._spec_dispatch(x, n_real), x, n_real, bucket))
                if len(pending) > depth:
                    yield self._stream_finish(pending.popleft())
            else:
                while pending:  # classic path syncs: drain in order
                    yield self._stream_finish(pending.popleft())
                out = self._process_classic(x, n_real, bucket)
                self.frames.extend(out)
                yield out
        while pending:
            yield self._stream_finish(pending.popleft())

    def _stream_finish(self, pending) -> List[RxFrame]:
        d, x, n_real, bucket = pending
        out = self._spec_collect(d)
        if out is None:  # leader overflow: classic adaptive re-run
            out = self._process_classic(x, n_real, bucket)
        self.frames.extend(out)
        return out

    def _process_classic(self, x, n_real, bucket) -> List[RxFrame]:
        # phase A: two device programs (detect, then SIGNAL — fusing them
        # provoked a 13x-slower XLA schedule, see _detect_program), ONE
        # combined small D2H sync for the whole chunk
        # adaptive loss-free candidate budget: run with the cheap
        # frames-derived kmax first, but fetch the TRUE leader count —
        # if leaders overflowed kmax (junk crossings >=_DETECT_BLK quiet
        # after an STF would sort-truncate REAL tail frames before the
        # resync walk), re-run with the next pow2 budget that fits. The
        # common case pays nothing; a hostile capture pays one re-run
        # (its program caches per pow2 bucket). A sizing-from-max_frames-
        # only kmax silently dropped tail frames; the always-loss-free
        # bucket//_DETECT_BLK budget measured ~30% slower at 1000-frame
        # captures.
        kmax = max(16, self.max_frames)
        hard_cap = bucket // _DETECT_BLK + 2
        while True:
            starts_d, valid_d, foff_d, nlead_d = _detect_program(
                kmax, self.max_frames
            )(x, jnp.int32(n_real))
            dec_d, snr_d = _signal_program(kmax)(x, starts_d, foff_d)
            starts_a, valid_a, foff_a, dec_a, snr_a, nlead_a = (
                jax.device_get(
                    (starts_d, valid_d, foff_d, dec_d, snr_d, nlead_d)
                )
            )
            if int(nlead_a) <= kmax or kmax >= hard_cap:
                break
            kmax = min(
                1 << int(nlead_a - 1).bit_length(), hard_cap
            )
        rate_f, parity, length_f = unpack_signal_fields(dec_a)
        out: List[RxFrame] = []
        cands: List[int] = []
        params: List[Optional[C.FrameParam]] = []
        snr_list: List[float] = []
        for j in range(kmax):
            if not valid_a[j]:
                continue
            cands.append(int(starts_a[j]))
            snr_list.append(float(snr_a[j]))
            mcs = C.RATE_TO_MCS.get(int(rate_f[j]))
            length = int(length_f[j])
            if not parity[j] or mcs is None or length == 0:
                params.append(None)
            else:
                params.append(C.FrameParam(mcs, length))
        if not cands:
            self._spec = None  # nothing to learn from an empty capture
            return out
        f_shorts = [
            float(foff_a[j]) for j in range(kmax) if valid_a[j]
        ]
        results = self._phase_b(x, cands, params, f_shorts, snr_list)
        out.extend(f for f in results if f is not None)
        self._learn(params)
        return out

    def _phase_b(
        self,
        x: CArray,
        cands: List[int],
        params: List[Optional["C.FrameParam"]],
        f_shorts: List[float],
        snrs: List[float],
    ) -> List[Optional[RxFrame]]:
        """Per-frame equalize + decode for an explicit candidate list
        (the classic second phase; also the speculative path's fallback
        for frames that failed its MCS/length gate). Returns one entry
        per candidate, ``None`` where undecodable."""
        k = len(cands)
        if k == 0:
            return []
        kb = 1 << (k - 1).bit_length()  # pow2 bucket for stable jit shapes
        starts_np = np.zeros(kb, np.int32)
        starts_np[:k] = cands
        fsh_np = np.zeros(kb, np.float32)
        fsh_np[:k] = f_shorts
        starts_dev = jnp.asarray(starts_np)
        fsh_dev = jnp.asarray(fsh_np)
        snr_all = np.zeros(kb, np.float32)
        snr_all[:k] = snrs
        need = [
            p.n_symbols
            for p in params
            if p is not None and p.n_symbols <= MAX_SYMS
        ]
        if not need:
            return [None] * k
        nmax = max(need)
        # phase B: re-run bucketed to the longest real frame (multiples of
        # 16 bound the compiled shape set); symbol work scales with actual
        # frame length instead of MAX_SYMS
        nf = min(MAX_SYMS, -(-nmax // 16) * 16)
        eq_b, _, _, _, _ = _frame_front_from_starts(kb, nf + 1)(
            x, starts_dev, fsh_dev
        )
        eq_data_dev = eq_b[:, 1 : 1 + nf]  # stays ON DEVICE
        if self.soft:
            # the decode tail runs batched ON DEVICE per MCS group; only
            # final PSDU bytes cross D2H, and the host does just CRC
            import zlib

            results: List[Optional[RxFrame]] = [None] * k
            mgroups: Dict[str, List[int]] = {}
            for i, p in enumerate(params):
                if p is not None and p.n_symbols <= MAX_SYMS:
                    mgroups.setdefault(p.mcs.name, []).append(i)
            for name, idxs in mgroups.items():
                tail = _device_decode_tail(name, nf)
                nbits = np.zeros(kb, np.int32)
                for i in idxs:
                    nbits[i] = params[i].n_data_bits
                by_dev = tail(eq_data_dev, jnp.asarray(nbits))
                # gather ONLY this group's rows device-side before the
                # fetch: a mixed-MCS capture otherwise re-fetches the
                # same leading rows once per group (D2H is the scarce
                # resource here, not the demap FLOPs)
                sel = jnp.asarray(np.asarray(idxs, np.int32))
                by = np.asarray(by_dev[sel])
                for j, i in enumerate(idxs):
                    p = params[i]
                    psdu = bytes(by[j, 2 : p.psdu_size + 2])
                    crc_ok = (
                        zlib.crc32(psdu) & 0xFFFFFFFF
                    ) == CRC32_RESIDUE
                    results[i] = RxFrame(
                        mcs=p.mcs.name,
                        psdu=psdu,
                        snr=float(snr_all[i]),
                        crc_ok=crc_ok,
                        start=cands[i],
                    )
        else:
            # hard path: int8 LLRs cross D2H, per-frame Viterbi across a
            # thread pool (the native decoder releases the GIL)
            groups: Dict[int, List[int]] = {}
            for i, p in enumerate(params):
                if p is not None and p.n_symbols <= MAX_SYMS:
                    groups.setdefault(p.mcs.n_bpsc, []).append(i)
            llr_by_frame: Dict[int, np.ndarray] = {}
            for n_bpsc, idxs in groups.items():
                llr_dev = _demap_llrs_int8(n_bpsc)(eq_data_dev)
                sel = jnp.asarray(np.asarray(idxs, np.int32))
                llr_host = np.asarray(llr_dev[sel])
                for j, i in enumerate(idxs):
                    llr_by_frame[i] = llr_host[j]
            from concurrent.futures import ThreadPoolExecutor

            def decode(i: int):
                if i not in llr_by_frame:
                    return None
                return self._decode_frame(
                    params[i], llr_by_frame[i], float(snr_all[i]), cands[i]
                )

            if k > 1:
                with ThreadPoolExecutor(max_workers=min(8, k)) as pool:
                    results = list(pool.map(decode, range(k)))
            else:
                results = [decode(0)]
        return results

    def _learn(self, params: List[Optional["C.FrameParam"]]) -> None:
        """Remember this capture's dominant (MCS, symbol bucket) for the
        speculative single-fetch path; forget on mixed traffic."""
        ps = [
            p for p in params if p is not None and p.n_symbols <= MAX_SYMS
        ]
        if not self.soft or len(ps) < 8:
            self._spec = None
            return
        names = [p.mcs.name for p in ps]
        dom = max(set(names), key=names.count)
        if names.count(dom) < 0.9 * len(ps):
            self._spec = None
            return
        nmax = max(p.n_symbols for p in ps)
        self._spec = (dom, min(MAX_SYMS, -(-nmax // 16) * 16))

    def _process_speculative(
        self, x: CArray, n_real, bucket: int
    ) -> Optional[List[RxFrame]]:
        """Single-fetch decode at the learned (MCS, nf).

        The classic path pays two device round-trips per capture
        (candidates, then bytes) — ~28 ms each through tunneled hosts,
        the dominant cost of small/streaming captures (VERDICT r2 item
        8). Here detect → SIGNAL → gate → frame front → decode tail all
        chain device-to-device (the SIGNAL gate recomputes RATE/parity/
        LENGTH on device) and ONE combined ``device_get`` returns
        everything. Measured on v5e: 400-frame captures 38.7 → ~70 MS/s.

        Frames that fail the gate (different MCS, longer than the
        bucket) are re-decoded by :meth:`_phase_b`; leader overflow
        falls back to the classic adaptive path (returns ``None``).
        """
        return self._spec_collect(self._spec_dispatch(x, n_real))

    def _spec_dispatch(self, x, n_real):
        """Dispatch the full speculative device chain (no host sync) —
        ``process_stream`` overlaps this with the previous chunk's fetch."""
        name, nf = self._spec
        mcs = C.MCS[name]
        rate_bits = next(
            r for r, m in C.RATE_TO_MCS.items() if m.name == name
        )
        kmax = max(16, self.max_frames)
        starts_d, valid_d, foff_d, nlead_d = _detect_program(
            kmax, self.max_frames
        )(x, jnp.int32(n_real))
        dec_d, snr_d = _signal_program(kmax)(x, starts_d, foff_d)
        ok_d, nbits_d = _spec_gate_program(kmax, rate_bits, mcs.n_dbps, nf)(
            dec_d, valid_d
        )
        eq_b, _, _, _, _ = _frame_front_from_starts(kmax, nf + 1)(
            x, starts_d, foff_d
        )
        by_d = _device_decode_tail(name, nf)(eq_b[:, 1 : 1 + nf], nbits_d)
        dev = (starts_d, valid_d, foff_d, dec_d, snr_d, nlead_d, ok_d, by_d)
        return dict(x=x, name=name, nf=nf, kmax=kmax, dev=dev)

    def _spec_collect(self, d) -> Optional[List[RxFrame]]:
        """ONE combined fetch + frame building for a dispatched chain;
        ``None`` on leader overflow (caller re-runs the classic path)."""
        import zlib

        x, name, nf, kmax = d["x"], d["name"], d["nf"], d["kmax"]
        (
            starts_a,
            valid_a,
            foff_a,
            dec_a,
            snr_a,
            nlead_a,
            ok_a,
            by,
        ) = jax.device_get(d["dev"])
        if int(nlead_a) > kmax:
            return None  # leader overflow — classic path re-runs adaptively
        rate_f, parity, length_f = unpack_signal_fields(dec_a)
        rows = [j for j in range(kmax) if valid_a[j]]
        frames_by_row: Dict[int, Optional[RxFrame]] = {}
        left_rows: List[int] = []
        left_c: List[int] = []
        left_p: List[Optional[C.FrameParam]] = []
        left_f: List[float] = []
        left_s: List[float] = []
        for j in rows:
            if ok_a[j]:
                psdu_size = int(length_f[j])
                psdu = bytes(by[j, 2 : psdu_size + 2])
                crc_ok = (
                    zlib.crc32(psdu) & 0xFFFFFFFF
                ) == CRC32_RESIDUE
                frames_by_row[j] = RxFrame(
                    mcs=name,
                    psdu=psdu,
                    snr=float(snr_a[j]),
                    crc_ok=crc_ok,
                    start=int(starts_a[j]),
                )
            else:
                m = C.RATE_TO_MCS.get(int(rate_f[j]))
                if parity[j] and m is not None and int(length_f[j]) > 0:
                    left_rows.append(j)
                    left_c.append(int(starts_a[j]))
                    left_p.append(C.FrameParam(m, int(length_f[j])))
                    left_f.append(float(foff_a[j]))
                    left_s.append(float(snr_a[j]))
        if left_c:
            for j, f in zip(
                left_rows, self._phase_b(x, left_c, left_p, left_f, left_s)
            ):
                frames_by_row[j] = f
            # gate misses dominated by frame-length growth (same MCS,
            # n_sym > nf): widen the learned bucket so future chunks pass
            # the gate instead of paying _phase_b host round-trips per
            # chunk forever (a gradual length increase can stay under the
            # 20% re-learn threshold indefinitely)
            grown = [
                p.n_symbols
                for p in left_p
                if p is not None
                and p.mcs.name == name
                and p.n_symbols > nf
            ]
            if (
                grown
                and len(grown) >= 0.5 * len(left_c)
                and max(grown) <= MAX_SYMS
            ):
                self._spec = (name, min(MAX_SYMS, -(-max(grown) // 16) * 16))
            elif len(left_c) > 0.2 * len(rows):
                self._spec = None  # traffic changed — re-learn classically
        return [
            frames_by_row[j]
            for j in rows
            if frames_by_row.get(j) is not None
        ]

    def _decode_frame(
        self,
        param: Optional[C.FrameParam],
        llrs_i8: np.ndarray,  # [nf, 48, n_bpsc] int8 (device-demapped)
        snr: float,
        start: int,
    ) -> Optional[RxFrame]:
        if param is None:
            return None
        n_sym = param.n_symbols
        if n_sym > MAX_SYMS:
            return None
        mcs = param.mcs
        n_coded = 2 * param.n_data_bits
        llrs = (
            llrs_i8[:n_sym].reshape(-1).astype(np.float64) / LLR_INT8_SCALE
        )
        if self.soft:
            deint = _deinterleave(llrs, mcs)
            coded_llrs = depuncture_soft(deint, mcs.puncture, n_coded)
            decoded = viterbi_decode_soft(coded_llrs, param.n_data_bits)
        else:
            bits = (llrs > 0).astype(np.uint8)  # LLR sign = hard decision
            deint = _deinterleave(bits, mcs)
            coded, erasures = depuncture(deint, mcs.puncture, n_coded)
            decoded = viterbi_decode(coded, param.n_data_bits, erasures)
        psdu = _descramble(decoded, param.psdu_size)
        import zlib

        crc_ok = (zlib.crc32(psdu) & 0xFFFFFFFF) == CRC32_RESIDUE
        return RxFrame(
            mcs=mcs.name, psdu=psdu, snr=snr, crc_ok=crc_ok, start=start
        )
