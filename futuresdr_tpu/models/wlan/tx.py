"""802.11a/g OFDM transmitter (host numpy — TX is not the perf path).

Parity: ``examples/wlan/src/{encoder.rs,mapper.rs,prefix.rs}`` and the
SIGNAL-field construction. Produces 20 MS/s baseband IQ:
STF (160) + LTF (160) + SIGNAL (80) + n_sym·80 DATA samples.
"""

from __future__ import annotations


import numpy as np

from futuresdr_tpu.models.wlan.consts import (
    DATA_IDX,
    FrameParam,
    LONG_FREQ_SHIFTED,
    MCS,
    Mcs,
    N_CP,
    N_FFT,
    PILOT_IDX,
    PILOT_VALUES,
    POLARITY,
    SHORT_FREQ_SHIFTED,
    interleaver_permutation,
    map_bits_to_symbols,
    scrambler_stream,
)


def _conv_encode(bits: np.ndarray) -> np.ndarray:
    """Rate-1/2 K=7 convolutional code, g0=133₈ g1=171₈
    (encoder.rs:51-59)."""
    g0 = np.array([1, 0, 1, 1, 0, 1, 1], dtype=np.uint8)  # 133₈, x^0 first
    g1 = np.array([1, 1, 1, 1, 0, 0, 1], dtype=np.uint8)  # 171₈
    padded = np.concatenate([np.zeros(6, np.uint8), bits])
    out = np.empty(2 * len(bits), dtype=np.uint8)
    for t in range(len(bits)):
        window = padded[t : t + 7][::-1]  # newest first
        out[2 * t] = np.bitwise_xor.reduce(window & g0)
        out[2 * t + 1] = np.bitwise_xor.reduce(window & g1)
    return out


def _puncture(coded: np.ndarray, pattern) -> np.ndarray:
    pat = np.asarray(pattern, dtype=bool)
    mask = np.resize(pat, len(coded))
    return coded[mask]


def _interleave(coded: np.ndarray, mcs: Mcs, n_sym: int) -> np.ndarray:
    perm = interleaver_permutation(mcs.n_cbps, mcs.n_bpsc)
    out = np.empty_like(coded)
    blocks = coded.reshape(n_sym, mcs.n_cbps)
    ob = out.reshape(n_sym, mcs.n_cbps)
    ob[:, perm] = blocks
    return out


def _ofdm_symbol(
    data_syms: np.ndarray, pilot_polarity: float
) -> np.ndarray:
    """48 constellation points + pilots → 80-sample time symbol."""
    spec = np.zeros(N_FFT, dtype=np.complex64)
    spec[DATA_IDX] = data_syms
    spec[PILOT_IDX] = PILOT_VALUES * pilot_polarity
    td = np.fft.ifft(np.fft.ifftshift(spec)).astype(np.complex64)
    return np.concatenate([td[-N_CP:], td])


def _signal_field_bits(param: FrameParam) -> np.ndarray:
    """24-bit SIGNAL: RATE(4) R(1) LENGTH(12) parity(1) tail(6)
    (frame_equalizer.rs:141-158 inverse)."""
    bits = np.zeros(24, dtype=np.uint8)
    r = param.mcs.rate_field
    # rate_field goes out MSB-first: the decoder builds r as
    # Σ stream_bit_i·2^i and matches r=11 for rate_field 0x0D (1101₂)
    for i in range(4):
        bits[i] = (r >> (3 - i)) & 1
    bits[4] = 0
    for i in range(12):
        bits[5 + i] = (param.psdu_size >> i) & 1
    bits[17] = np.bitwise_xor.reduce(bits[:17])
    return bits


def encode_frame(
    psdu: bytes,
    mcs_name: str = "bpsk12",
    scrambler_seed: int = 1,
) -> np.ndarray:
    """PSDU bytes → baseband IQ at 20 MS/s (complete PPDU)."""
    mcs = MCS[mcs_name]
    param = FrameParam(mcs, len(psdu))

    # ---- DATA bits: SERVICE(16 zeros) + psdu + tail(6) + pad ----------
    psdu_bits = np.unpackbits(
        np.frombuffer(psdu, dtype=np.uint8), bitorder="little"
    )
    bits = np.concatenate(
        [
            np.zeros(16, np.uint8),
            psdu_bits,
            np.zeros(6 + param.n_pad, np.uint8),
        ]
    )
    assert len(bits) == param.n_data_bits

    # scramble, reset tail (encoder.rs:31-48)
    scr = scrambler_stream(scrambler_seed, param.n_data_bits)
    scrambled = bits ^ scr
    tail_off = param.n_data_bits - param.n_pad - 6
    scrambled[tail_off : tail_off + 6] = 0

    coded = _conv_encode(scrambled)
    punctured = _puncture(coded, mcs.puncture)
    interleaved = _interleave(punctured, mcs, param.n_symbols)
    points = map_bits_to_symbols(interleaved, mcs.n_bpsc).reshape(
        param.n_symbols, 48
    )

    # ---- SIGNAL symbol (BPSK 1/2, no scrambling) ----------------------
    sig_bits = _signal_field_bits(param)
    sig_coded = _conv_encode(sig_bits)
    sig_inter = _interleave(sig_coded, MCS["bpsk12"], 1)
    sig_points = map_bits_to_symbols(sig_inter, 1)

    # ---- preambles ----------------------------------------------------
    stf_period = np.fft.ifft(np.fft.ifftshift(SHORT_FREQ_SHIFTED)).astype(
        np.complex64
    )
    stf = np.tile(stf_period[:16], 10)  # 160 samples
    ltf_sym = np.fft.ifft(np.fft.ifftshift(LONG_FREQ_SHIFTED)).astype(
        np.complex64
    )
    ltf = np.concatenate([ltf_sym[-32:], ltf_sym, ltf_sym])  # 160

    out = [stf, ltf, _ofdm_symbol(sig_points, POLARITY[0])]
    for s in range(param.n_symbols):
        out.append(_ofdm_symbol(points[s], POLARITY[(s + 1) % 127]))
    return np.concatenate(out).astype(np.complex64)


def make_mac_frame(payload: bytes, seq: int = 0) -> bytes:
    """Minimal 802.11 data MPDU with the default addresses
    (mac.rs parity; full framing lives in :mod:`.mac`)."""
    from futuresdr_tpu.models.wlan.mac import mac_data_frame

    return mac_data_frame(payload, seq)
