"""FIR filter design (windowed-sinc, Kaiser method, RRC, Hilbert, Remez).

Parity: ``crates/futuredsp/src/firdes/basic.rs`` (lowpass/highpass/bandpass/
root_raised_cosine/hilbert at lines 25–260; ``kaiser`` submodule at 280–460)
and ``firdes/remez.rs``. All frequencies are in cycles/sample (i.e. already
normalized by the sample rate), matching the reference convention.

Design runs on host in float64 NumPy; the resulting taps are baked into the
compiled XLA program as constants (or passed as device params when
retunable).
"""

from __future__ import annotations

import numpy as np

from futuresdr_tpu.dsp import windows as _win


def _sinc_lowpass(omega_c: float, length: int) -> np.ndarray:
    """Ideal lowpass impulse response, centered, angular cutoff omega_c."""
    alpha = (length - 1) / 2.0
    x = np.arange(length, dtype=np.float64) - alpha
    out = np.where(
        x == 0.0,
        omega_c / np.pi,
        np.sin(omega_c * np.where(x == 0.0, 1.0, x)) / (np.pi * np.where(x == 0.0, 1.0, x)),
    )
    return out


def lowpass(cutoff: float, window) -> np.ndarray:
    """Windowed-sinc lowpass; ``cutoff`` ∈ ]-1/2, 1/2[ cycles/sample."""
    window = np.asarray(window, dtype=np.float64)
    if not abs(cutoff) < 0.5:
        raise ValueError("cutoff must be in ]-1/2, 1/2[")
    omega_c = 2.0 * np.pi * cutoff
    return window * _sinc_lowpass(omega_c, len(window))


def highpass(cutoff: float, window) -> np.ndarray:
    """Windowed-sinc highpass (spectral inversion); odd-length window."""
    window = np.asarray(window, dtype=np.float64)
    if not (0.0 < cutoff < 0.5):
        raise ValueError("cutoff must be in (0, 1/2)")
    if len(window) % 2 != 1:
        raise ValueError("window length must be odd")
    omega_c = 2.0 * np.pi * cutoff
    alpha = (len(window) - 1) / 2.0
    x = np.arange(len(window), dtype=np.float64) - alpha
    ideal = -_sinc_lowpass(omega_c, len(window))
    ideal[x == 0.0] = 1.0 - omega_c / np.pi
    return window * ideal


def bandpass(lower_cutoff: float, higher_cutoff: float, window) -> np.ndarray:
    """Windowed-sinc bandpass between the two cutoffs (cycles/sample)."""
    window = np.asarray(window, dtype=np.float64)
    if not abs(lower_cutoff) < 0.5:
        raise ValueError("lower_cutoff must be in ]-1/2, 1/2[")
    if not (higher_cutoff > lower_cutoff and abs(higher_cutoff) < 0.5):
        raise ValueError("higher_cutoff must be in ]lower_cutoff, 1/2[")
    lo = 2.0 * np.pi * lower_cutoff
    hi = 2.0 * np.pi * higher_cutoff
    bw = hi - lo
    center = (lo + hi) / 2.0
    alpha = (len(window) - 1) / 2.0
    x = np.arange(len(window), dtype=np.float64) - alpha
    safe = np.where(x == 0.0, 1.0, x)
    ideal = 2.0 * np.cos(center * safe) * np.sin(bw / 2.0 * safe) / (np.pi * safe)
    ideal = np.where(x == 0.0, bw / np.pi, ideal)
    return window * ideal


def root_raised_cosine(span: int, sps: int, roll_off: float) -> np.ndarray:
    """Unity-energy RRC pulse over ``span`` symbols at ``sps`` samples/symbol.

    Matches ``basic.rs:155-200`` including the |t| = 1/(4β) singularity
    handling (tolerance 1e-5).
    """
    if (span * sps) % 2 != 0:
        raise ValueError("span * sps must be even")
    if not (0.0 < roll_off <= 1.0):
        raise ValueError("roll_off must be in (0, 1]")
    num_taps = span * sps + 1
    n = np.arange(num_taps, dtype=np.float64)
    t = (n - (num_taps - 1) / 2.0) / sps
    sqrt_sps = np.sqrt(float(sps))

    with np.errstate(divide="ignore", invalid="ignore"):
        tmp = 4.0 * roll_off * t
        generic = (
            np.sin((1.0 - roll_off) * np.pi * t)
            + tmp * np.cos((1.0 + roll_off) * np.pi * t)
        ) / (np.pi * t * (1.0 - tmp**2) * sqrt_sps)

    at_zero = ((1.0 - roll_off) + 4.0 * roll_off / np.pi) / sqrt_sps
    at_sing = (
        roll_off
        / np.sqrt(2.0 * sps)
        * (
            (1.0 + 2.0 / np.pi) * np.sin(np.pi / (4.0 * roll_off))
            + (1.0 - 2.0 / np.pi) * np.cos(np.pi / (4.0 * roll_off))
        )
    )
    taps = np.where(np.abs(np.abs(t) - 1.0 / (4.0 * roll_off)) < 1e-5, at_sing, generic)
    taps = np.where(t == 0.0, at_zero, taps)
    return taps


def hilbert(window) -> np.ndarray:
    """Hilbert transformer taps (odd length), gain-normalized like the
    reference (``basic.rs:202-240``): antisymmetric 1/n taps on odd offsets,
    scaled so the peak gain is ~1."""
    window = np.asarray(window, dtype=np.float64)
    ntaps = len(window)
    if ntaps % 2 != 1:
        raise ValueError("hilbert window length must be odd")
    taps = np.zeros(ntaps, dtype=np.float64)
    h = (ntaps - 1) // 2
    gain = 0.0
    for i in range(1, h, 2):
        x = 1.0 / i
        taps[h + i] = x * window[h + i]
        taps[h - i] = -x * window[h - i]
        gain = taps[h + i] - gain
    gain = 2.0 * abs(gain)
    return taps / gain


# ---------------------------------------------------------------------------
# Kaiser-method designs (parity: firdes::kaiser, basic.rs:288-460)
# ---------------------------------------------------------------------------


def _kaiser_beta(max_ripple: float) -> float:
    ripple_db = -20.0 * np.log10(max_ripple)
    if ripple_db > 50.0:
        return 0.1102 * (ripple_db - 8.7)
    if ripple_db >= 21.0:
        return 0.5842 * (ripple_db - 21.0) ** 0.4 + 0.07886 * (ripple_db - 21.0)
    return 0.0


def _kaiser_design(transition_bw: float, max_ripple: float):
    beta = _kaiser_beta(max_ripple)
    ripple_db = -20.0 * np.log10(max_ripple)
    num_taps = int(np.ceil((ripple_db - 7.95) / (14.36 * transition_bw))) + 1
    return num_taps, beta


def kaiser_lowpass(cutoff: float, transition_bw: float, max_ripple: float) -> np.ndarray:
    """Lowpass with Kaiser-window method; tap count from the ripple spec."""
    if cutoff <= 0.0 or transition_bw <= 0.0:
        raise ValueError("cutoff and transition_bw must be > 0")
    if cutoff + transition_bw >= 0.5:
        raise ValueError("cutoff + transition_bw must be < 1/2")
    num_taps, beta = _kaiser_design(transition_bw, max_ripple)
    win = _win.kaiser(num_taps, beta)
    omega_c = (2.0 * cutoff + transition_bw) / 2.0
    return lowpass(omega_c, win)


def kaiser_highpass(cutoff: float, transition_bw: float, max_ripple: float) -> np.ndarray:
    if cutoff <= 0.0 or transition_bw <= 0.0:
        raise ValueError("cutoff and transition_bw must be > 0")
    if cutoff + transition_bw >= 0.5:
        raise ValueError("cutoff + transition_bw must be < 1/2")
    num_taps, beta = _kaiser_design(transition_bw, max_ripple)
    num_taps += (num_taps + 1) % 2  # force odd
    win = _win.kaiser(num_taps, beta)
    omega_c = (2.0 * cutoff - transition_bw) / 2.0
    return highpass(omega_c, win)


def kaiser_bandpass(
    lower_cutoff: float,
    higher_cutoff: float,
    transition_bw: float,
    max_ripple: float,
) -> np.ndarray:
    if lower_cutoff <= 0.0:
        raise ValueError("lower_cutoff must be > 0")
    if higher_cutoff <= lower_cutoff:
        raise ValueError("higher_cutoff must exceed lower_cutoff")
    if transition_bw <= 0.0:
        raise ValueError("transition_bw must be > 0")
    if higher_cutoff + transition_bw >= 0.5:
        raise ValueError("higher_cutoff + transition_bw must be < 1/2")
    num_taps, beta = _kaiser_design(transition_bw, max_ripple)
    win = _win.kaiser(num_taps, beta)
    lo = (2.0 * lower_cutoff - transition_bw) / 2.0
    hi = (2.0 * higher_cutoff + transition_bw) / 2.0
    return bandpass(lo, hi, win)


def kaiser_multirate(
    interp: int,
    decim: int,
    half_polyphase_len: int = 12,
    max_ripple: float = 1e-4,
) -> np.ndarray:
    """Nyquist (L-th band) prototype for polyphase P/Q resampling.

    Each of the ``max(interp,decim)`` polyphase branches gets
    ``2*half_polyphase_len`` taps; window is scaled by ``interp`` for unit
    passband gain (``basic.rs:412-455``).
    """
    if interp < 1 or decim < 1 or half_polyphase_len < 1:
        raise ValueError("interp, decim, half_polyphase_len must be >= 1")
    if interp == 1 and decim == 1:
        return np.ones(1, dtype=np.float64)
    band = decim if interp == 1 else interp
    num_taps = 2 * half_polyphase_len * band
    beta = _kaiser_beta(max_ripple)
    win = interp * _win.kaiser(num_taps + 1, beta)
    omega_c = 1.0 / (2.0 * max(interp, decim))
    taps = lowpass(omega_c, win)
    return taps[:num_taps]


# ---------------------------------------------------------------------------
# Parks-McClellan equiripple design (parity: firdes/remez.rs + remez_impl.rs)
# ---------------------------------------------------------------------------


def remez(
    num_taps: int,
    bands,
    desired,
    weights=None,
    filter_type: str = "bandpass",
    grid_density: int = 16,
) -> np.ndarray:
    """Parks-McClellan optimal equiripple FIR design.

    Own Remez-exchange implementation (:mod:`futuresdr_tpu.dsp.remez` —
    capability parity with the reference's ``firdes/remez.rs`` +
    ``remez_impl.rs``, no SciPy). ``bands`` are in cycles/sample pairs
    ``[b0_lo, b0_hi, b1_lo, ...]`` like the reference API.
    """
    from futuresdr_tpu.dsp.remez import pm_remez

    return pm_remez(
        num_taps,
        bands,
        desired,
        weights,
        filter_type=filter_type,
        grid_density=grid_density,
    )


def remez_lowpass(
    gain: float,
    fs: float,
    freq1: float,
    freq2: float,
    passband_ripple_db: float,
    stopband_atten_db: float,
    nextra_taps: int = 2,
) -> np.ndarray:
    """Equiripple lowpass from dB specs (parity: remez.rs ``low_pass``,
    incl. the polyphase-channelizer prototype recipe in its docs)."""
    from futuresdr_tpu.dsp.remez import remez_lowpass as _impl

    return _impl(
        gain, fs, freq1, freq2, passband_ripple_db, stopband_atten_db,
        nextra_taps,
    )
