"""Window functions for FIR design and spectral analysis.

Parity: ``crates/futuredsp/src/windows.rs:23-185``. All functions return
float64 NumPy arrays; vectorized rather than per-tap loops.

For the cosine-family windows, ``periodic=False`` gives the symmetric window
(filter design) and ``periodic=True`` the DFT-even window (spectral
analysis), produced by designing length ``len+1`` and dropping the last tap.
"""

from __future__ import annotations

import numpy as np

from futuresdr_tpu.dsp.math import besseli0


def rect(length: int) -> np.ndarray:
    """Rectangular (boxcar) window."""
    return np.ones(length, dtype=np.float64)


def bartlett(length: int) -> np.ndarray:
    """Triangular window with zero endpoints."""
    alpha = (length - 1) / 2.0
    n = np.arange(length, dtype=np.float64)
    return np.where(n < alpha, n / alpha, 2.0 - n / alpha)


def gen_cos(length: int, coeffs, periodic: bool = False) -> np.ndarray:
    """Generalized cosine window: ``w[n] = Σ_k (-1)^k c_k cos(2πkn/N)``."""
    coeffs = np.asarray(coeffs, dtype=np.float64)
    n_design = length + 1 if periodic else length
    alpha = (n_design - 1) / 2.0
    n = np.arange(n_design, dtype=np.float64)
    k = np.arange(len(coeffs), dtype=np.float64)
    signs = (-1.0) ** k
    # [len(coeffs), n_design] cos table, summed over k
    table = np.cos(np.pi * np.outer(k, n) / alpha)
    w = (signs * coeffs) @ table
    return w[:length]


def blackman(length: int, periodic: bool = False) -> np.ndarray:
    return gen_cos(length, [0.42, 0.5, 0.08], periodic)


def hamming(length: int, periodic: bool = False) -> np.ndarray:
    return gen_cos(length, [0.54, 0.46], periodic)


def hann(length: int, periodic: bool = False) -> np.ndarray:
    return gen_cos(length, [0.5, 0.5], periodic)


def kaiser(length: int, beta: float) -> np.ndarray:
    """Kaiser window with shape parameter ``beta``."""
    alpha = (length - 1) / 2.0
    n = np.arange(length, dtype=np.float64)
    arg = beta * np.sqrt(np.maximum(0.0, 1.0 - ((n - alpha) / alpha) ** 2))
    return besseli0(arg) / besseli0(beta)


def gaussian(length: int, alpha: float) -> np.ndarray:
    """Gaussian window; ``alpha`` is inversely proportional to the std-dev."""
    mid = (length - 1) / 2.0
    std_dev = mid / alpha
    n = np.arange(length, dtype=np.float64)
    return np.exp(-((n - mid) ** 2) / (2.0 * std_dev**2))


_BY_NAME = {
    "rect": rect,
    "rectangular": rect,
    "boxcar": rect,
    "bartlett": bartlett,
    "triangular": bartlett,
    "blackman": blackman,
    "hamming": hamming,
    "hann": hann,
    "hanning": hann,
}


def by_name(name: str, length: int, **kwargs) -> np.ndarray:
    """Look a window up by name (spectrum-analyzer convenience)."""
    name = name.lower()
    if name == "kaiser":
        return kaiser(length, kwargs.get("beta", 8.6))
    if name == "gaussian":
        return gaussian(length, kwargs.get("alpha", 2.5))
    try:
        fn = _BY_NAME[name]
    except KeyError:
        raise ValueError(f"unknown window {name!r}") from None
    if name in ("rect", "rectangular", "boxcar", "bartlett", "triangular"):
        return fn(length)
    return fn(length, kwargs.get("periodic", False))
