"""IEEE 802.15.4 (2.4 GHz O-QPSK, 250 kb/s) PHY.

Parity: ``examples/zigbee`` — its RX chain is quadrature demod →
Mueller-Müller clock recovery (``clock_recovery_mm.rs``) → chip
correlation against the 16 standard 32-chip PN sequences → frame decode
with CRC16.

TPU-first redesign: the sequential MM feedback loop is replaced by batch
template correlation. The TX modulator (true half-sine O-QPSK at
2 samples/chip) is run once over each symbol's chip sequence to derive the
*demodulated-domain* templates; the receiver then needs only

* quadrature demod (VPU elementwise),
* one conv for preamble search,
* one ``[n_sym, 64] @ [64, 16]`` matmul for all symbol decisions,

all device-side; the host parses SFD/length/payload and checks the FCS.
Static sample-rate offset handling (the MM loop's real job) is future
work — the templates tolerate fractional-sample misalignment via the
argmax margin.
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

SPS = 2  # samples per chip (4 MS/s at 2 Mchip/s)
CHIPS_PER_SYM = 32
SYM_SAMPLES = CHIPS_PER_SYM * SPS  # 64

# IEEE 802.15.4-2020 §12.2.4 chip values for symbols 0..15
_CHIP_HEX = [
    0xD9C3522E,
    0xED9C3522,
    0x2ED9C352,
    0x22ED9C35,
    0x522ED9C3,
    0x3522ED9C,
    0xC3522ED9,
    0x9C3522ED,
    0x8C96077B,
    0xB8C96077,
    0x7B8C9607,
    0x77B8C960,
    0x077B8C96,
    0x6077B8C9,
    0x96077B8C,
    0xC96077B8,
]


@lru_cache(maxsize=None)
def chip_table() -> np.ndarray:
    """[16, 32] chips, LSB (c0) first per the standard's bit order."""
    out = np.zeros((16, 32), dtype=np.int8)
    for s, word in enumerate(_CHIP_HEX):
        for c in range(32):
            out[s, c] = (word >> c) & 1
    return out


# ---------------------------------------------------------------------------
# TX: half-sine O-QPSK (MSK-equivalent), 2 samples/chip
# ---------------------------------------------------------------------------


def _oqpsk_modulate_chips(chips: np.ndarray) -> np.ndarray:
    """Chip stream → complex baseband.

    Even chips drive I, odd chips drive Q delayed by one chip; each pulse
    is a half-sine spanning two chip periods (2·SPS samples)."""
    chips = 2.0 * np.asarray(chips, np.float32) - 1.0
    n_chips = len(chips)
    pulse = np.sin(np.pi * (np.arange(2 * SPS) + 0.5) / (2 * SPS)).astype(
        np.float32
    )
    total = n_chips * SPS + 2 * SPS
    i_wave = np.zeros(total, np.float32)
    q_wave = np.zeros(total, np.float32)
    for k in range(0, n_chips, 2):  # even chips → I at t = k·SPS
        i_wave[k * SPS : k * SPS + 2 * SPS] += chips[k] * pulse
    for k in range(1, n_chips, 2):  # odd chips → Q at t = k·SPS
        q_wave[k * SPS : k * SPS + 2 * SPS] += chips[k] * pulse
    return (i_wave + 1j * q_wave).astype(np.complex64)


def symbols_to_chips(symbols: np.ndarray) -> np.ndarray:
    return chip_table()[np.asarray(symbols, dtype=np.int64)].reshape(-1)


def bytes_to_symbols(data: bytes) -> np.ndarray:
    arr = np.frombuffer(data, np.uint8)
    out = np.empty(2 * len(arr), np.uint8)
    out[0::2] = arr & 0xF  # low nibble first (§12.2.3)
    out[1::2] = arr >> 4
    return out


def crc16_154(data: bytes) -> int:
    """802.15.4 FCS: CRC-16/CCITT, init 0, LSB-first (reflected)."""
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = (crc >> 1) ^ 0x8408 if crc & 1 else crc >> 1
    return crc & 0xFFFF


def make_phy_frame(payload: bytes) -> bytes:
    """PPDU: preamble (4×0x00) + SFD 0xA7 + length + PSDU(payload+FCS)."""
    fcs = crc16_154(payload)
    psdu = payload + bytes([fcs & 0xFF, fcs >> 8])
    return bytes(4) + bytes([0xA7, len(psdu)]) + psdu


def modulate(frame: bytes, pad: int = 64) -> np.ndarray:
    chips = symbols_to_chips(bytes_to_symbols(frame))
    sig = _oqpsk_modulate_chips(chips)
    z = np.zeros(pad, np.complex64)
    return np.concatenate([z, sig, z])


# ---------------------------------------------------------------------------
# RX
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def demod_templates() -> np.ndarray:
    """[16, 64] demodulated-domain templates: each symbol's chips run
    through the TX modulator + quadrature demod (the physics derives the
    template; no hand-tabulated 'differential' sequences needed)."""
    out = np.zeros((16, SYM_SAMPLES), np.float32)
    for s in range(16):
        # embed between copies of the same symbol to get realistic
        # boundary overlap
        chips = np.concatenate([chip_table()[s]] * 3)
        x = _oqpsk_modulate_chips(chips)
        d = np.angle(x[1:] * np.conj(x[:-1]))
        mid = CHIPS_PER_SYM * SPS  # second copy
        out[s] = d[mid : mid + SYM_SAMPLES]
        out[s] -= out[s].mean()
        out[s] /= np.linalg.norm(out[s]) + 1e-12
    return out


@lru_cache(maxsize=None)
def _demod_fn(n: int):
    def fn(xc):
        d = (xc[1:] * xc[:-1].conj()).angle()
        return d

    return jax.jit(fn)


@lru_cache(maxsize=None)
def _correlate_fn(k: int):
    t = jnp.asarray(demod_templates())  # [16, 64]

    def fn(wins):  # [k, 64]
        wins = wins - jnp.mean(wins, axis=-1, keepdims=True)
        return jnp.einsum("kn,sn->ks", wins, t)

    return jax.jit(fn)


# PSDU ≤ 127 bytes ⇒ ≤ 254 payload symbols + 12 header/preamble symbols
_MAX_FRAME_SYMS = 272
_RX_BLK = 256  # < preamble span (8·64 = 512): at most one head per block


@lru_cache(maxsize=None)
def _rx_program(n: int, kmax: int, wsyms: int):
    """Whole-capture batched RX: ONE device program, one small fetch.

    demod → preamble correlation (Toeplitz conv) → local-max peaks →
    4-chain heads → gather-free block compaction (the WLAN detect trick,
    ``models/wlan/rx.py detect_candidates``) → batched per-candidate
    window scores → argmax symbols.  Only ``[kmax]`` starts and
    ``[kmax, wsyms]`` uint8 symbols cross D2H — the per-frame
    dispatch+fetch loop cost ~2 RTT × n_frames on tunnel-limited hosts
    (measured 0.13 MS/s for a 100-frame capture; the batched program
    restores dense-capture rate).
    """
    t0_taps = demod_templates()[0][::-1].copy()  # host np (Toeplitz path)
    templates = jnp.asarray(demod_templates())  # [16, 64]
    win = wsyms * SYM_SAMPLES

    def fn(xc):
        from futuresdr_tpu.ops.fir import conv1d_valid

        d = (xc[1:] * xc[:-1].conj()).angle()  # [n-1]
        cor = conv1d_valid(d, t0_taps)  # np.correlate(d, t0) parity
        thr = 0.5 * jnp.max(cor)
        m = cor.shape[-1]
        prev = jnp.concatenate([jnp.full(1, -jnp.inf), cor[:-1]])
        nxt = jnp.concatenate([cor[1:], jnp.full(1, -jnp.inf)])
        peak = (cor > thr) & (cor >= prev) & (cor >= nxt)

        def shift(mask, k):  # mask[i+k] with zero pad
            return jnp.concatenate(
                [mask[k:], jnp.zeros(k, bool)], axis=-1
            )

        chain4 = (
            peak
            & shift(peak, SYM_SAMPLES)
            & shift(peak, 2 * SYM_SAMPLES)
            & shift(peak, 3 * SYM_SAMPLES)
        )
        lagged = jnp.concatenate(
            [jnp.zeros(SYM_SAMPLES, bool), peak[:-SYM_SAMPLES]]
        )
        head = chain4 & ~lagged  # first peak of a ≥4 chain
        # leader filter + gather-free compaction (shared with WLAN's
        # detect_candidates — ops/detect.py): suppressing heads with a
        # head in the preceding _RX_BLK samples ESTABLISHES the
        # at-most-one-head-per-block invariant the masked-sum compaction
        # needs (off-period sidelobe chains could otherwise put two heads
        # in one block and sum their positions into garbage); real PPDUs
        # span >=512 samples, so genuine heads are never this close
        from futuresdr_tpu.ops.detect import (
            EMPTY,
            compact_mask,
            suppress_recent,
        )

        head = suppress_recent(head, _RX_BLK)
        (key_s,) = compact_mask(head, _RX_BLK, kmax)
        valid = key_s < EMPTY
        starts = jnp.where(valid, key_s, 0)

        # batched window scores; guard zeros keep slices un-clamped
        dg = jnp.concatenate([d, jnp.zeros(win, d.dtype)])

        def one(s):
            w = jax.lax.dynamic_slice_in_dim(dg, s, win)
            w = w.reshape(wsyms, SYM_SAMPLES)
            w = w - jnp.mean(w, axis=-1, keepdims=True)
            sc = jnp.einsum("kn,sn->ks", w, templates)
            return jnp.argmax(sc, axis=-1).astype(jnp.uint8)

        syms = jax.vmap(one)(starts)  # [kmax, wsyms]
        # ONE packed f32 leaf (multi-leaf fetches cost one ~10-20 ms
        # tunnel round-trip PER LEAF; starts ride bitcast, uint8
        # symbols 0..15 are exact as f32)
        from futuresdr_tpu.ops.packing import pack_int_f32

        packed = jnp.concatenate(
            [
                pack_int_f32(starts),
                valid.astype(jnp.float32),
                syms.astype(jnp.float32).reshape(-1),
            ]
        )
        return packed

    return jax.jit(fn)


@dataclass
class ZigbeeFrame:
    payload: bytes
    crc_ok: bool
    start: int


class ZigbeeReceiver(StreamingReceiver):
    """Batched whole-capture receiver: every PPDU in the chunk decodes
    from ONE device program + one small fetch (see ``_rx_program``)."""

    def __init__(self, max_frames_per_chunk: int = 128):
        self.max_frames = int(max_frames_per_chunk)
        self.frames: List[ZigbeeFrame] = []

    # process/process_stream come from StreamingReceiver
    # (models/streaming.py — the shared dispatch/collect harness)

    def _dispatch(self, iq):
        if isinstance(iq, cplx.CArray):
            # device-resident ingest (WLAN prepare_device_iq pattern)
            xc = iq
            n = int(xc.shape[-1])
            if n % 16384:
                raise ValueError("device IQ must be a 16384-multiple")
        else:
            x = np.asarray(iq, np.complex64)
            bucket = -(-len(x) // 16384) * 16384  # stable jit shapes
            if bucket != len(x):
                x = np.concatenate(
                    [x, np.zeros(bucket - len(x), np.complex64)]
                )
            xc = cplx.from_numpy(x)
            n = len(x)
        return _rx_program(n, self.max_frames, _MAX_FRAME_SYMS)(xc)

    def _collect(self, dev) -> List[ZigbeeFrame]:
        packed = np.asarray(jax.device_get(dev))
        from futuresdr_tpu.ops.packing import unpack_int_f32

        kmax = packed.shape[0] // (2 + _MAX_FRAME_SYMS)
        starts = unpack_int_f32(packed[:kmax])
        valid = packed[kmax : 2 * kmax] > 0.5
        syms = packed[2 * kmax :].reshape(kmax, _MAX_FRAME_SYMS)
        out: List[ZigbeeFrame] = []
        pos = 0
        for k in range(len(starts)):
            if not valid[k]:
                continue
            p = int(starts[k])
            if p < pos:
                continue  # false head inside the previous frame's payload
            f = _walk_symbols(syms[k].astype(np.int64), p)
            if f is not None:
                out.append(f)
                # preamble(8) + SFD(2) + len(2) + payload symbols
                n_sym = 12 + 2 * (len(f.payload) + 2)
                pos = p + n_sym * SYM_SAMPLES
        self.frames.extend(out)
        return out


# ---------------------------------------------------------------------------
# In-graph clock-recovery RX (parity: the reference's actual chain —
# quadrature demod → ClockRecoveryMm → chip correlation, zigbee/src/main.rs)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def chip_templates(phase: int) -> np.ndarray:
    """[16, 32] chip-rate demod templates (decimation phase 0 or 1).

    The MM loop emits one sample per chip; these are the TX-derived demod
    waveforms sampled at that rate, mean-removed and normalized."""
    out = np.zeros((16, CHIPS_PER_SYM), np.float32)
    for s in range(16):
        chips = np.concatenate([chip_table()[s]] * 3)
        x = _oqpsk_modulate_chips(chips)
        d = np.angle(x[1:] * np.conj(x[:-1]))
        mid = CHIPS_PER_SYM * SPS
        t = d[mid + phase : mid + phase + SYM_SAMPLES : SPS]
        t = t - t.mean()
        out[s] = t / (np.linalg.norm(t) + 1e-12)
    return out


def _walk_symbols(syms: np.ndarray, start: int) -> Optional[ZigbeeFrame]:
    """Shared PPDU walk: preamble zeros → SFD (7, 10) → length → PSDU."""
    i = 0
    while i < len(syms) and syms[i] == 0:
        i += 1
    if i + 4 > len(syms) or syms[i] != 7 or syms[i + 1] != 10:
        return None
    i += 2
    length = int(syms[i] | (syms[i + 1] << 4))
    i += 2
    if length < 2 or i + 2 * length > len(syms):
        return None
    nib = syms[i : i + 2 * length]
    psdu = bytes((nib[0::2] | (nib[1::2] << 4)).astype(np.uint8))
    payload, fcs = psdu[:-2], psdu[-2:]
    crc_ok = crc16_154(payload) == (fcs[0] | (fcs[1] << 8))
    return ZigbeeFrame(payload=payload, crc_ok=crc_ok, start=start)


@lru_cache(maxsize=None)
def _chip_correlate_fn(k: int, phase: int):
    t = jnp.asarray(chip_templates(phase))  # [16, 32]

    def fn(wins):  # [k, 32]
        wins = wins - jnp.mean(wins, axis=-1, keepdims=True)
        return jnp.einsum("kn,sn->ks", wins, t)

    return jax.jit(fn)


class ZigbeeChipReceiver:
    """Chip-rate frame decoder fed by the in-graph MM clock recovery.

    ``process`` consumes the ClockRecoveryMM output stream (1 sample per
    chip) — in a flowgraph: QuadratureDemod → ClockRecoveryMM →
    FramedReceiverSink(ZigbeeChipReceiver, valid_from=(mm, "mm_valid")).
    Unlike :class:`ZigbeeReceiver`'s fixed-grid template correlation, this
    path tracks real sample-rate offsets (the MM loop's job)."""

    def __init__(self):
        self.frames: List[ZigbeeFrame] = []

    def process(self, chips: np.ndarray) -> List[ZigbeeFrame]:
        chips = np.asarray(chips, np.float32)
        out: List[ZigbeeFrame] = []
        if len(chips) < 8 * CHIPS_PER_SYM:
            return out
        # pick the decimation phase the loop locked to
        c0 = np.correlate(chips, chip_templates(0)[0], "valid")
        c1 = np.correlate(chips, chip_templates(1)[0], "valid")
        phase = 0 if (c0.max() if len(c0) else 0) >= (
            c1.max() if len(c1) else 0
        ) else 1
        cor = c0 if phase == 0 else c1
        thr = 0.5 * np.max(cor) if len(cor) else 0.0
        if thr <= 0:
            return out
        peaks = np.nonzero(
            (cor > thr)
            & (cor >= np.roll(cor, 1))
            & (cor >= np.roll(cor, -1))
        )[0]
        peak_set = set(int(p) for p in peaks)
        start = None
        for p in peaks:
            chain, q = 1, int(p)
            while q + CHIPS_PER_SYM in peak_set:
                q += CHIPS_PER_SYM
                chain += 1
            if chain >= 4:
                start = int(p)
                break
        if start is None:
            return out
        max_syms = (len(chips) - start) // CHIPS_PER_SYM
        if max_syms < 12:
            return out
        idx = (
            start
            + CHIPS_PER_SYM * np.arange(max_syms)[:, None]
            + np.arange(CHIPS_PER_SYM)
        )
        scores = np.asarray(
            _chip_correlate_fn(max_syms, phase)(
                jnp.asarray(chips[idx].astype(np.float32))
            )
        )
        f = _walk_symbols(scores.argmax(axis=-1), start)
        if f is not None:
            out.append(f)
        self.frames.extend(out)
        return out


def make_mm_rx_flowgraph(source_block, process_size: int = 1 << 14):
    """Wire the reference-parity RX chain as a flowgraph:
    source → QuadratureDemod → ClockRecoveryMM(omega=2) → framed sink.

    Returns ``(fg, sink)``; decoded frames appear in ``sink.frames`` and
    on the sink's ``frames`` message port."""
    from futuresdr_tpu.blocks import (
        ClockRecoveryMM,
        FramedReceiverSink,
        QuadratureDemod,
    )
    from futuresdr_tpu.runtime.flowgraph import Flowgraph

    fg = Flowgraph()
    demod = QuadratureDemod(gain=1.0)
    mm = ClockRecoveryMM(
        omega=float(SPS),
        gain_omega=0.0001,
        mu=0.5,
        gain_mu=0.03,
        omega_relative_limit=0.01,
    )
    sink = FramedReceiverSink(
        ZigbeeChipReceiver(),
        overlap=64 * CHIPS_PER_SYM,
        process_size=process_size,
        dtype=np.float32,
        valid_from=(mm, "mm_valid"),
        dedup_tolerance=8,
    )
    for b in (source_block, demod, mm, sink):
        fg.add(b)
    fg.stream(source_block, demod)
    fg.stream(demod, mm)
    fg.stream(mm, sink)
    return fg, sink
