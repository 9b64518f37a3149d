"""Parks-McClellan optimal equiripple FIR design, from scratch.

Capability parity with the reference's ``crates/futuredsp/src/firdes/
remez.rs`` + ``remez_impl.rs`` (a port of the Janovetz C implementation).
This is NOT a port of that code: it is the textbook McClellan-Parks-Rabiner
formulation (Ifeachor & Jervis §6.6; Oppenheim & Schafer §7.7) written
directly in NumPy:

* the four linear-phase cases reduce to one Chebyshev approximation
  ``A(f) = P(cos 2πf)`` by dividing out the case's trig prefactor ``Q(f)``,
* the exchange step solves the best approximation on the current r+1
  extremal set in barycentric form (log-scaled node weights, so large tap
  counts don't overflow the Π(x_k − x_j) products),
* tap synthesis is exact frequency sampling: evaluate ``Q·A`` at the L
  roots of unity and take one inverse FFT — no per-case IDFT formulas.

Frequencies are in cycles/sample (band edges in [0, 0.5]) like the rest of
:mod:`futuresdr_tpu.dsp.firdes`.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = ["pm_remez", "remez_order", "remez_lowpass"]


def _build_grid(
    bands: np.ndarray,
    desired: np.ndarray,
    weight: np.ndarray,
    r: int,
    grid_density: int,
    ftype: str,
    sym: bool,
    odd: bool,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Dense frequency grid over the band union with per-point D and W."""
    step = 0.5 / (grid_density * r)
    fs, ds, ws = [], [], []
    n_bands = len(bands) // 2
    for b in range(n_bands):
        lo, hi = bands[2 * b], bands[2 * b + 1]
        n_pts = max(int(round((hi - lo) / step)) + 1, 2)
        f = np.linspace(lo, hi, n_pts)
        fs.append(f)
        ds.append(np.full(n_pts, desired[b]))
        ws.append(np.full(n_pts, weight[b]))
    f = np.concatenate(fs)
    d = np.concatenate(ds)
    w = np.concatenate(ws)

    if ftype == "differentiator":
        # Janovetz/scipy convention: desired is a slope; weight inversely
        # proportional to f so the *relative* error is equiripple.
        d = d * f
        big = d > 1e-4
        w = np.where(big, w / np.maximum(f, 1e-12), w)

    # Exclude grid points where the case prefactor Q(f) vanishes (the
    # transformed weight W·Q would be zero there).
    keep = np.ones(len(f), bool)
    if not sym:  # types 3 & 4 (antisymmetric): Q(0) = 0
        keep &= f > step / 2
        if odd:  # type 3: Q = sin(2πf) also vanishes at f = 1/2
            keep &= f < 0.5 - step / 2
    elif not odd:  # type 2: Q = cos(πf) vanishes at f = 1/2
        keep &= f < 0.5 - step / 2
    return f[keep], d[keep], w[keep]


def _q_factor(f: np.ndarray, sym: bool, odd: bool) -> np.ndarray:
    """The linear-phase case prefactor Q(f) with A(f) = P(cos 2πf)."""
    if sym:
        return np.ones_like(f) if odd else np.cos(np.pi * f)
    return np.sin(2 * np.pi * f) if odd else np.sin(np.pi * f)


def _node_weights(x: np.ndarray) -> np.ndarray:
    """Barycentric weights γ_k = 1/Π_{j≠k}(x_k − x_j), log-scaled."""
    diff = x[:, None] - x[None, :]
    np.fill_diagonal(diff, 1.0)
    sign = np.prod(np.sign(diff), axis=1)
    logmag = np.sum(np.log(np.abs(diff)), axis=1)
    logmag -= logmag.mean()  # γ only ever appears in ratios
    return sign * np.exp(-logmag)


def _interp(
    fgrid: np.ndarray,
    xk: np.ndarray,
    gamma: np.ndarray,
    yk: np.ndarray,
) -> np.ndarray:
    """Barycentric evaluation of the interpolant through (xk, yk)."""
    x = np.cos(2 * np.pi * fgrid)
    dx = x[:, None] - xk[None, :]
    near = np.abs(dx) < 1e-12
    dx = np.where(near, 1.0, dx)
    c = gamma[None, :] / dx
    out = (c @ yk) / np.sum(c, axis=1)
    hit = near.any(axis=1)
    if hit.any():
        out[hit] = yk[np.argmax(near[hit], axis=1)]
    return out


def _select_extremals(err: np.ndarray, n_want: int) -> Optional[np.ndarray]:
    """Pick n_want alternating extremal indices of the signed error."""
    d = np.diff(err)
    rising = np.concatenate([[True], d > 0])
    falling = np.concatenate([d < 0, [True]])
    is_max = rising & falling & (err > 0)
    rising2 = np.concatenate([[True], d < 0])
    falling2 = np.concatenate([d > 0, [True]])
    is_min = rising2 & falling2 & (err < 0)
    cand = np.nonzero(is_max | is_min)[0]
    if len(cand) == 0:
        return None
    # enforce sign alternation: among same-sign runs keep the largest |err|
    keep = []
    for i in cand:
        if keep and np.sign(err[i]) == np.sign(err[keep[-1]]):
            if abs(err[i]) > abs(err[keep[-1]]):
                keep[-1] = i
        else:
            keep.append(i)
    # too many alternations: dropping an interior point would break the
    # sign pattern, so repeatedly drop the smaller-|err| endpoint
    while len(keep) > n_want:
        if abs(err[keep[0]]) < abs(err[keep[-1]]):
            keep.pop(0)
        else:
            keep.pop()
    if len(keep) < n_want:
        return None
    return np.asarray(keep)


def pm_remez(
    num_taps: int,
    bands: Sequence[float],
    desired: Sequence[float],
    weight: Optional[Sequence[float]] = None,
    filter_type: str = "bandpass",
    grid_density: int = 16,
    max_iter: int = 250,
) -> np.ndarray:
    """Design a linear-phase FIR by the Remez exchange algorithm.

    Parameters mirror the reference's ``pm_remez`` (remez_impl.rs): band
    edges as flat [lo, hi, ...] pairs in cycles/sample, one desired
    amplitude and weight per band, ``filter_type`` in {"bandpass",
    "differentiator", "hilbert"}.
    """
    L = int(num_taps)
    if L < 4:
        raise ValueError("need at least 4 taps")
    bands = np.asarray(bands, np.float64).ravel()
    if len(bands) % 2 or len(bands) < 2:
        raise ValueError("bands must be flat [lo, hi, ...] pairs")
    if np.any(np.diff(bands) < 0) or bands[0] < 0 or bands[-1] > 0.5:
        raise ValueError("band edges must be ascending within [0, 0.5]")
    n_bands = len(bands) // 2
    desired = np.asarray(desired, np.float64).ravel()
    if len(desired) != n_bands:
        raise ValueError("one desired amplitude per band")
    weight = (
        np.ones(n_bands)
        if weight is None
        else np.asarray(weight, np.float64).ravel()
    )
    if len(weight) != n_bands:
        raise ValueError("one weight per band")
    if filter_type not in ("bandpass", "differentiator", "hilbert"):
        raise ValueError(f"unknown filter_type {filter_type!r}")

    sym = filter_type == "bandpass"
    odd = bool(L % 2)
    r = L // 2
    if odd and sym:
        r += 1  # type 1 has (L+1)/2 cosine coefficients

    f, d, w = _build_grid(
        bands, desired, weight, r, grid_density, filter_type, sym, odd
    )
    if len(f) < r + 1:
        raise ValueError("grid too small — increase grid_density")
    q = _q_factor(f, sym, odd)
    d_t = d / q  # transformed desired
    w_t = w * q  # transformed weight

    # initial extremals: evenly spaced through the grid
    ext = np.round(np.linspace(0, len(f) - 1, r + 1)).astype(int)
    signs = (-1.0) ** np.arange(r + 1)
    last_delta = 0.0
    for _ in range(max_iter):
        xk = np.cos(2 * np.pi * f[ext])
        gamma = _node_weights(xk)
        num = float(gamma @ d_t[ext])
        den = float(gamma @ (signs / w_t[ext]))
        if den == 0.0:
            break
        delta = num / den
        yk = d_t[ext] - signs * delta / w_t[ext]
        a = _interp(f, xk, gamma, yk)
        err = w_t * (a - d_t)
        new_ext = _select_extremals(err, r + 1)
        if new_ext is None:
            break
        emax = float(np.max(np.abs(err[new_ext])))
        converged = (
            np.array_equal(new_ext, ext)
            or (emax - abs(delta)) <= 1e-6 * max(abs(delta), 1e-12)
        )
        ext = new_ext
        last_delta = delta
        if converged:
            break

    # final best approximation on the converged extremal set
    xk = np.cos(2 * np.pi * f[ext])
    gamma = _node_weights(xk)
    delta = float(gamma @ d_t[ext]) / float(gamma @ (signs / w_t[ext]))
    yk = d_t[ext] - signs * delta / w_t[ext]

    # exact synthesis: sample G(f) = Q(f)·A(f) at the L roots of unity,
    # restore the linear-phase factor, one inverse FFT. The natural
    # formulas for Q and A(f) = P(cos 2πf) extend G correctly to (0.5, 1).
    j = np.arange(L)
    fj = j / L
    a_j = _interp(fj, xk, gamma, yk)
    g_j = _q_factor(fj, sym, odd) * a_j
    phase = np.exp(-1j * np.pi * j * (L - 1) / L)
    h_j = (1j * g_j if not sym else g_j) * phase
    taps = np.fft.ifft(h_j)
    assert np.max(np.abs(taps.imag)) < 1e-6 * max(
        1.0, np.max(np.abs(taps.real))
    ), "synthesis produced non-real taps"
    _ = last_delta
    return np.real(taps)


# ---------------------------------------------------------------------------
# order estimation + the reference's remez-based lowpass convenience
# ---------------------------------------------------------------------------


def _lporder(f1: float, f2: float, dp: float, ds: float) -> float:
    """Herrmann-Rabiner lowpass length estimate (remezord's inner step)."""
    df = f2 - f1
    lp, ls = np.log10(dp), np.log10(ds)
    dinf = (0.005309 * lp * lp + 0.07114 * lp - 0.4761) * ls - (
        0.00266 * lp * lp + 0.5941 * lp + 0.4278
    )
    ff = 11.01217 + 0.51244 * (lp - ls)
    return dinf / df - ff * df + 1.0


def remez_order(
    cutoffs: Sequence[float],
    mags: Sequence[float],
    devs: Sequence[float],
) -> Tuple[int, np.ndarray, np.ndarray, np.ndarray]:
    """Multiband FIR order estimate (parity: remez.rs ``remezord``).

    ``cutoffs`` are transition edges in cycles/sample (len = 2·(n_bands−1)),
    ``mags`` desired per-band amplitudes, ``devs`` per-band ripple (linear).
    Returns ``(num_taps, band_edges, band_amps, band_weights)`` ready for
    :func:`pm_remez`.
    """
    cutoffs = np.asarray(cutoffs, np.float64).ravel()
    mags = np.asarray(mags, np.float64).ravel()
    devs = np.asarray(devs, np.float64).ravel()
    if len(cutoffs) != 2 * (len(mags) - 1):
        raise ValueError("len(cutoffs) must be 2*(len(mags)-1)")
    if len(devs) != len(mags):
        raise ValueError("one deviation per band")
    # normalize passband deviations relative to gain
    devs_n = np.where(mags > 0, devs / np.maximum(mags, 1e-300), devs)
    n = 0.0
    for i in range(len(mags) - 1):
        f1, f2 = cutoffs[2 * i], cutoffs[2 * i + 1]
        est = _lporder(f1, f2, devs_n[i], devs_n[i + 1])
        n = max(n, est)
    num_taps = int(np.ceil(n))
    edges = np.concatenate([[0.0], cutoffs, [0.5]])
    weights = np.max(devs) / devs
    return num_taps, edges, mags.copy(), weights


def remez_lowpass(
    gain: float,
    fs: float,
    freq1: float,
    freq2: float,
    passband_ripple_db: float,
    stopband_atten_db: float,
    nextra_taps: int = 2,
) -> np.ndarray:
    """Equiripple lowpass from ripple/attenuation specs
    (parity: remez.rs ``low_pass``). Frequencies in Hz at sample rate
    ``fs``; also the polyphase-channelizer prototype recipe."""
    passband_dev = (10 ** (passband_ripple_db / 20.0) - 1) / (
        10 ** (passband_ripple_db / 20.0) + 1
    )
    stopband_dev = 10 ** (-stopband_atten_db / 20.0)
    n, edges, amps, wts = remez_order(
        [freq1 / fs, freq2 / fs], [gain, 0.0], [passband_dev, stopband_dev]
    )
    # the estimate typically runs a little short (reference adds 2 taps)
    return pm_remez(n + nextra_taps, edges, amps, wts, "bandpass")
