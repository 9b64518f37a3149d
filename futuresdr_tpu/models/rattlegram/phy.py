"""Rattlegram-style OFDM acoustic modem.

Parity target: ``examples/rattlegram/src/{encoder,decoder,psk,mls}.rs``
(COFDMTV lineage): 48 kHz real audio, 7680-sample OFDM symbols with a
960-sample guard, 256 payload carriers, an MLS-BPSK sync/reference symbol,
differential QPSK payload, polar-coded bits with a CRC. This is a fresh,
self-consistent implementation of that architecture; byte-exact waveform
interop with the reference app is future work.

At 48 kHz audio rates the decode tier runs host-side (numpy), but the
sync correlation (O(N·7680) MACs — the dominant wall time) runs on
device, dispatched per chunk without a host sync via the shared
:class:`~futuresdr_tpu.models.streaming.StreamingReceiver` split. The
polar/SC tier is shared, reusable FEC.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from typing import List, Optional

import numpy as np

from futuresdr_tpu.models.streaming import StreamingReceiver
from futuresdr_tpu.models.rattlegram.polar import (
    frozen_mask,
    polar_decode_sc,
    polar_decode_scl,
    polar_encode_systematic,
)

RATE = 48_000
SYMBOL_LEN = 7680  # encoder.rs:51
GUARD_LEN = SYMBOL_LEN // 8  # 960
EXT_LEN = SYMBOL_LEN + GUARD_LEN
CODE_ORDER = 11
CODE_LEN = 1 << CODE_ORDER
PAY_CAR_CNT = 256  # encoder.rs:61
CAR0 = 320  # first payload carrier bin (2.0 kHz at 6.25 Hz spacing)
SYMBOL_COUNT = 4  # encoder.rs:50
MOD_BITS = 2  # DQPSK
MAX_BYTES = 170  # MAX_BITS 1360 (encoder.rs:54)
CRC_POLY = 0x1021


def _crc16(data: bytes) -> int:
    crc = 0xFFFF
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ CRC_POLY) if crc & 0x8000 else (crc << 1)
            crc &= 0xFFFF
    return crc


@lru_cache(maxsize=None)
def mls_sequence(poly: int, length: int) -> np.ndarray:
    """Maximal-length sequence from an LFSR polynomial (mls.rs parity)."""
    degree = poly.bit_length() - 1
    state = 1
    out = np.empty(length, np.uint8)
    for i in range(length):
        out[i] = state & 1
        fb = 0
        s = state & poly
        while s:
            fb ^= s & 1
            s >>= 1
        state = (state >> 1) | (fb << (degree - 1))
    return out


@lru_cache(maxsize=None)
def _sync_symbol() -> np.ndarray:
    """Reference symbol: BPSK MLS on the payload carriers (also the DQPSK
    phase reference)."""
    seq = mls_sequence(0b100101011, PAY_CAR_CNT)  # PRE_SEQ_POLY
    spec = np.zeros(SYMBOL_LEN // 2 + 1, np.complex128)
    spec[CAR0 : CAR0 + PAY_CAR_CNT] = 1.0 - 2.0 * seq.astype(np.float64)
    td = np.fft.irfft(spec, SYMBOL_LEN)
    return (td / np.max(np.abs(td))).astype(np.float32)


def _with_guard(sym: np.ndarray) -> np.ndarray:
    return np.concatenate([sym[-GUARD_LEN:], sym])


@lru_cache(maxsize=None)
def _frozen():
    return frozen_mask(CODE_ORDER, 8 * MAX_BYTES)


def encode_frame(payload: bytes) -> np.ndarray:
    """payload (≤170 bytes incl. implicit CRC16) → 48 kHz audio frame."""
    if len(payload) > MAX_BYTES - 2:
        raise ValueError(f"payload > {MAX_BYTES - 2} bytes")
    body = payload + bytes(MAX_BYTES - 2 - len(payload))
    crc = _crc16(body)
    msg = body + bytes([crc >> 8, crc & 0xFF])
    bits = np.unpackbits(np.frombuffer(msg, np.uint8))
    cw = polar_encode_systematic(bits, _frozen())

    # DQPSK: Gray dibit → phase step, differential per carrier across syms
    dibits = cw.reshape(SYMBOL_COUNT, PAY_CAR_CNT, MOD_BITS)
    gray_phase = np.array([0, 1, 3, 2]) * (np.pi / 2)  # 00,01,10,11
    steps = gray_phase[dibits[..., 0] * 2 + dibits[..., 1]]

    seq = mls_sequence(0b100101011, PAY_CAR_CNT)
    ref_phase = np.pi * seq.astype(np.float64)  # sync symbol phases
    out = [np.zeros(GUARD_LEN, np.float32), _with_guard(_sync_symbol())]
    phase = ref_phase.copy()
    for s in range(SYMBOL_COUNT):
        phase = phase + steps[s]
        spec = np.zeros(SYMBOL_LEN // 2 + 1, np.complex128)
        spec[CAR0 : CAR0 + PAY_CAR_CNT] = np.exp(1j * phase)
        td = np.fft.irfft(spec, SYMBOL_LEN)
        td = td / np.max(np.abs(td))
        out.append(_with_guard(td.astype(np.float32)))
    out.append(np.zeros(GUARD_LEN, np.float32))
    return np.concatenate(out)


@dataclass
class RattlegramFrame:
    payload: bytes
    crc_ok: bool
    start: int


@lru_cache(maxsize=None)
def _sync_score_fn(n: int):
    """Device normalized sync correlation over an ``n``-sample buffer:
    ``score = correlate(x, tmpl) / (sqrt(movsum(x², L)·Σtmpl²) + 1e-9)``
    — numerics-matched to the previous host ``np.correlate`` form, which
    cost O(N·7680) host MACs (the dominant wall time of small captures)."""
    import jax

    from futuresdr_tpu.ops.fir import conv1d_valid, moving_sum

    tmpl = _sync_symbol()
    # conv1d_valid applies taps reversed (out[k] = Σ x[k+t]·taps[T-1-t]);
    # pass them reversed so the product is the plain correlation
    taps = np.ascontiguousarray(tmpl[::-1]).astype(np.float32)
    t2 = float(np.sum(tmpl.astype(np.float64) ** 2))

    def fn(x):
        import jax
        import jax.numpy as jnp

        cor = conv1d_valid(x, taps)
        energy = moving_sum(x * x, SYMBOL_LEN)
        # ABSOLUTE denominator clamp: the Toeplitz conv leaves ~1e-4
        # rounding junk where np.correlate gave exact zeros, and
        # junk/(~0 + 1e-9) manufactures peaks. A clamp at 1e-12 keeps
        # junk scores ≈ 0.03 while a genuine quiet frame's normalized
        # score stays exactly 1.0 — a RELATIVE floor (1e-4·max energy)
        # was reviewed+reproduced silently capping inter-frame dynamic
        # range at 40 dB (two transmitters >40 dB apart lost the quiet
        # one; the old host path decoded both).
        score = cor / jnp.sqrt(jnp.maximum(energy, 1e-12) * t2)
        # top-k candidate extraction ON DEVICE: fetching the full score
        # array cost ~8 B/sample of D2H (~80 ms per 0.5 M-sample capture
        # through the tunnel) — the receiver's floor once the SCL decode
        # went native. One packed leaf: [idx bitcast | value] × 32.
        from futuresdr_tpu.ops.packing import pack_int_f32

        vals, idx = jax.lax.top_k(score, 32)
        return jnp.concatenate([pack_int_f32(idx), vals])

    return jax.jit(fn)


class RattlegramReceiver(StreamingReceiver):
    """process/process_stream come from :class:`StreamingReceiver`: the
    device sync-correlation program dispatches per chunk without a host
    sync; the score fetch + per-candidate OFDM demod land in _collect."""

    def __init__(self, list_size: int = 8):
        self.list_size = int(list_size)
        self.frames: List[RattlegramFrame] = []

    def _dispatch(self, audio):
        import jax.numpy as jnp

        x = np.asarray(audio, np.float32)
        n_real = len(x)
        pad = (-len(x)) % 16384  # stable jit shapes
        if pad:
            x = np.concatenate([x, np.zeros(pad, np.float32)])
        if len(x) < SYMBOL_LEN:
            return {"x": x, "n_real": n_real, "score": None}
        return {
            "x": x,
            "n_real": n_real,
            "score": _sync_score_fn(len(x))(jnp.asarray(x)),
        }

    def _collect(self, d) -> List[RattlegramFrame]:
        x, n_real = d["x"], d["n_real"]
        if d["score"] is None:
            return []
        from futuresdr_tpu.ops.packing import unpack_int_f32

        packed = np.asarray(d["score"])
        km = packed.shape[0] // 2
        idx = unpack_int_f32(packed[:km])
        vals = packed[km:]
        out: List[RattlegramFrame] = []
        thr = 0.5
        taken: List[int] = []
        for p, v in zip(idx, vals):  # top_k is value-descending
            p = int(p)
            if v < thr:
                break
            if any(abs(p - t) < EXT_LEN for t in taken):
                continue
            if p + SYMBOL_LEN + SYMBOL_COUNT * EXT_LEN > n_real:
                continue  # frame would extend into the shape padding
            f = self._demod(x, p)
            if f is not None:
                taken.append(p)
                out.append(f)
        out.sort(key=lambda f: f.start)
        self.frames.extend(out)
        return out

    def _demod(self, x: np.ndarray, sync_pos: int) -> Optional[RattlegramFrame]:
        need = sync_pos + SYMBOL_LEN + SYMBOL_COUNT * EXT_LEN
        if need > len(x):
            return None
        ref = np.fft.rfft(x[sync_pos : sync_pos + SYMBOL_LEN])
        prev = ref[CAR0 : CAR0 + PAY_CAR_CNT]
        diffs = np.empty((SYMBOL_COUNT, PAY_CAR_CNT), np.complex128)
        pos = sync_pos + SYMBOL_LEN + GUARD_LEN
        for s in range(SYMBOL_COUNT):
            spec = np.fft.rfft(x[pos : pos + SYMBOL_LEN])
            cur = spec[CAR0 : CAR0 + PAY_CAR_CNT]
            diffs[s] = cur * np.conj(prev)
            prev = cur
            pos += EXT_LEN

        # sample-clock-offset compensation: a constant timing slip of δ
        # samples between consecutive symbol windows rotates carrier k's
        # differential by 2π·k·δ/N — at the top payload carrier this
        # crosses the DQPSK π/4 decision boundary near ~150 ppm, the
        # cliff both this and the reference decoder (which has no drift
        # handling; decoder.rs:385 is sync peak-picking only) fall off.
        # δ is one unknown shared by every (symbol, carrier) cell, so a
        # HYPOTHESIS SEARCH beats per-symbol phase estimation (whose 4×
        # quadrupling noise, extrapolated ×CAR0 carriers, was worse than
        # the drift): quadrupled DQPSK phases are 0 mod 2π at the true
        # δ, so M(δ) = Σ_s |Σ_k (d·e^{-j2πkδ/N})⁴/|d|⁴| peaks there.
        # 49 hypotheses × 1024 cells of host math per candidate.
        k_abs = CAR0 + np.arange(PAY_CAR_CNT)
        u = diffs / (np.abs(diffs) + 1e-12)
        deltas = np.arange(-10.0, 10.01, 0.25)
        rot = np.exp(
            -1j * 2.0 * np.pi * np.outer(deltas, k_abs) / SYMBOL_LEN
        )  # [nd, C]
        z4 = (u[None, :, :] * rot[:, None, :]) ** 4  # [nd, S, C]
        metric = np.abs(z4.sum(axis=2)).sum(axis=1)  # [nd]
        i0 = int(np.argmin(np.abs(deltas)))  # δ = 0
        best = int(np.argmax(metric))
        # margin gate: near the decode threshold the metric is noisy and
        # a spurious δ costs real SNR — only leave δ=0 when the drift
        # hypothesis clearly wins (a true slip's margin is large: the
        # top carriers cross the π/4 boundary)
        delta = (
            float(deltas[best])
            if metric[best] > 1.10 * metric[i0]
            else 0.0
        )
        d = diffs * np.exp(-1j * 2.0 * np.pi * k_abs * delta / SYMBOL_LEN)

        # Gray DQPSK soft bits for the TX map θ(00,01,11,10) =
        # (0, π/2, π, 3π/2): b0 ⇔ sign(cosθ+sinθ), b1 ⇔ sign(cosθ−sinθ)
        scale = np.abs(d) + 1e-12
        llrs = np.empty((SYMBOL_COUNT, PAY_CAR_CNT, MOD_BITS), np.float64)
        llrs[:, :, 0] = (d.real + d.imag) / scale
        llrs[:, :, 1] = (d.real - d.imag) / scale
        llr = llrs.reshape(-1)

        def crc_fn(msg_bits: np.ndarray) -> bool:
            d = np.packbits(msg_bits)
            return _crc16(d[: MAX_BYTES - 2].tobytes()) == (
                (int(d[MAX_BYTES - 2]) << 8) | int(d[MAX_BYTES - 1])
            )

        # CRC-aided list decode (PolarListDecoder parity): the CRC16
        # picks the surviving path, worth ~1-2 dB over plain SC
        bits, _, crc_ok = polar_decode_scl(
            4.0 * llr, _frozen(), list_size=self.list_size, crc_fn=crc_fn
        )
        data = np.packbits(bits)
        body = data[: MAX_BYTES - 2].tobytes()
        payload = body.rstrip(b"\x00")
        return RattlegramFrame(payload=payload, crc_ok=crc_ok, start=sync_pos)
