"""Golden tests for window functions and FIR design.

Mirrors the inline accuracy tests of ``crates/futuredsp/src/windows.rs`` and
``firdes/basic.rs`` by validating against scipy/analytic references.
"""

import numpy as np
import pytest
from scipy import signal as sp_signal

from futuresdr_tpu.dsp import firdes, windows
from futuresdr_tpu.dsp.math import besseli0


class TestWindows:
    def test_rect(self):
        assert np.array_equal(windows.rect(7), np.ones(7))

    def test_bartlett_matches_scipy(self):
        w = windows.bartlett(38)
        ref = sp_signal.windows.bartlett(38, sym=True)
        np.testing.assert_allclose(w, ref, atol=1e-12)

    @pytest.mark.parametrize("n", [16, 37, 64])
    def test_hann_symmetric(self, n):
        np.testing.assert_allclose(
            windows.hann(n), sp_signal.windows.hann(n, sym=True), atol=1e-12
        )

    def test_hamming(self):
        np.testing.assert_allclose(
            windows.hamming(33), sp_signal.windows.hamming(33, sym=True), atol=1e-12
        )

    def test_blackman(self):
        # reference uses the truncated (0.42, 0.5, 0.08) coefficients
        np.testing.assert_allclose(
            windows.blackman(33),
            sp_signal.windows.blackman(33, sym=True),
            atol=1e-12,
        )

    def test_periodic_is_truncated_symmetric(self):
        per = windows.hann(16, periodic=True)
        sym = windows.hann(17, periodic=False)
        np.testing.assert_allclose(per, sym[:16], atol=1e-12)

    def test_kaiser_matches_scipy(self):
        np.testing.assert_allclose(
            windows.kaiser(38, 8.6),
            sp_signal.windows.kaiser(38, 8.6, sym=True),
            rtol=1e-10,
        )

    def test_gaussian(self):
        n, alpha = 38, 2.5
        mid = (n - 1) / 2.0
        ref = sp_signal.windows.gaussian(n, std=mid / alpha, sym=True)
        np.testing.assert_allclose(windows.gaussian(n, alpha), ref, atol=1e-12)

    def test_by_name(self):
        assert len(windows.by_name("hann", 32)) == 32
        with pytest.raises(ValueError):
            windows.by_name("nope", 8)


class TestBessel:
    def test_besseli0(self):
        from scipy.special import i0

        xs = np.array([0.0, 0.1, 1.0, 3.75, 10.0])
        np.testing.assert_allclose(besseli0(xs), i0(xs), rtol=1e-12)


class TestFirdes:
    def test_lowpass_dc_gain(self):
        taps = firdes.lowpass(0.2, windows.hamming(65))
        # DC gain of a windowed-sinc lowpass ≈ 1
        assert abs(np.sum(taps) - 1.0) < 0.01

    def test_lowpass_response(self):
        taps = firdes.kaiser_lowpass(0.2, 0.05, 1e-3)
        w, h = sp_signal.freqz(taps, worN=4096, fs=1.0)
        passband = np.abs(h[w < 0.18])
        stopband = np.abs(h[w > 0.27])
        assert np.all(np.abs(passband - 1.0) < 0.01)
        assert np.all(stopband < 0.01)

    def test_highpass_response(self):
        taps = firdes.kaiser_highpass(0.25, 0.05, 1e-3)
        assert len(taps) % 2 == 1
        w, h = sp_signal.freqz(taps, worN=4096, fs=1.0)
        stop = np.abs(h[w < 0.2])
        passband = np.abs(h[w > 0.3])
        assert np.all(stop < 0.01)
        assert np.all(np.abs(passband - 1.0) < 0.02)

    def test_bandpass_response(self):
        taps = firdes.kaiser_bandpass(0.1, 0.2, 0.05, 1e-3)
        w, h = sp_signal.freqz(taps, worN=4096, fs=1.0)
        inband = np.abs(h[(w > 0.12) & (w < 0.18)])
        below = np.abs(h[w < 0.04])
        above = np.abs(h[w > 0.26])
        assert np.all(np.abs(inband - 1.0) < 0.02)
        assert np.all(below < 0.01)
        assert np.all(above < 0.01)

    def test_rrc_matched_filter_isi(self):
        sps, span, beta = 4, 10, 0.35
        taps = firdes.root_raised_cosine(span, sps, beta)
        # RC = RRC ⊛ RRC must be ~ISI-free at symbol spacing
        rc = np.convolve(taps, taps)
        center = len(rc) // 2
        peak = rc[center]
        isi = rc[center % sps :: sps]
        isi = isi[np.abs(np.arange(len(isi)) * sps - center) > sps // 2]
        assert np.max(np.abs(isi)) / peak < 0.01

    def test_rrc_unit_energy(self):
        taps = firdes.root_raised_cosine(8, 4, 0.25)
        assert abs(np.sum(taps**2) - 1.0) < 0.01

    def test_hilbert_response(self):
        taps = firdes.hilbert(windows.hamming(63))
        w, h = sp_signal.freqz(taps, worN=4096, fs=1.0)
        mid = np.abs(h[(w > 0.1) & (w < 0.4)])
        # flat ~unit magnitude in band, antisymmetric (90° phase)
        assert np.all(np.abs(mid - 1.0) < 0.05)
        np.testing.assert_allclose(taps, -taps[::-1], atol=1e-12)

    def test_kaiser_multirate_identity(self):
        taps = firdes.kaiser_multirate(1, 1)
        np.testing.assert_array_equal(taps, [1.0])

    def test_kaiser_multirate_interp_gain(self):
        interp = 3
        taps = firdes.kaiser_multirate(interp, 2, 12, 1e-4)
        assert len(taps) == 2 * 12 * interp
        # unity gain per branch: sum of taps ≈ interp
        assert abs(np.sum(taps) - interp) < 0.05

    def test_remez_lowpass(self):
        taps = firdes.remez(65, [0.0, 0.2, 0.25, 0.5], [1.0, 0.0])
        w, h = _freq_response(taps)
        assert np.all(np.abs(np.abs(h[w < 0.19]) - 1.0) < 0.02)
        assert np.all(np.abs(h[w > 0.26]) < 0.02)

    def test_validation_errors(self):
        with pytest.raises(ValueError):
            firdes.kaiser_lowpass(0.4, 0.2, 1e-3)  # cutoff+bw >= 0.5
        with pytest.raises(ValueError):
            firdes.highpass(0.25, windows.hamming(64))  # even length
        with pytest.raises(ValueError):
            firdes.root_raised_cosine(3, 3, 0.2)  # span*sps odd


# ---------------------------------------------------------------------------
# Own Parks-McClellan (dsp/remez.py — scipy-free implementation)
# ---------------------------------------------------------------------------


def _freq_response(taps, worN=4096):
    """NumPy-only freqz: H(f) at worN points on [0, 0.5)."""
    w = np.arange(worN) / (2 * worN)
    n = np.arange(len(taps))
    h = np.exp(-2j * np.pi * w[:, None] * n[None, :]) @ np.asarray(taps)
    return w, h


class TestRemez:
    """The exchange algorithm itself (futuresdr_tpu.dsp.remez), no scipy
    anywhere in the implementation path."""

    def test_no_scipy_in_implementation(self):
        import sys
        import importlib

        import futuresdr_tpu.dsp.remez as rz

        importlib.reload(rz)
        import re

        src = open(rz.__file__).read()
        assert not re.search(r"^\s*(import|from)\s+scipy", src, re.M)
        # and designing a filter must not import scipy as a side effect
        pre = set(sys.modules)
        rz.pm_remez(33, [0.0, 0.2, 0.3, 0.5], [1.0, 0.0])
        assert not any(
            m.startswith("scipy") for m in set(sys.modules) - pre
        )

    def test_equiripple_property(self):
        """The passband/stopband errors alternate at equal magnitude —
        the defining property of the optimum."""
        taps = firdes.remez(55, [0.0, 0.18, 0.24, 0.5], [1.0, 0.0])
        w, h = _freq_response(taps, 16384)
        pb = np.abs(np.abs(h[w <= 0.18]) - 1.0)
        sb = np.abs(h[w >= 0.24])
        # equal-ripple across bands (weight 1:1) to a few percent
        assert abs(pb.max() - sb.max()) < 0.1 * sb.max()

    def test_weighted_stopband(self):
        taps = firdes.remez(65, [0.0, 0.18, 0.24, 0.5], [1.0, 0.0], [1, 10])
        w, h = _freq_response(taps, 16384)
        pb = np.abs(np.abs(h[w <= 0.18]) - 1.0)
        sb = np.abs(h[w >= 0.24])
        # 10x weight ⇒ stopband ripple ~10x smaller than passband ripple
        assert sb.max() < 0.2 * pb.max()

    def test_even_length(self):
        taps = firdes.remez(64, [0.0, 0.2, 0.25, 0.5], [1.0, 0.0])
        assert len(taps) == 64
        # type 2 symmetry
        np.testing.assert_allclose(taps, taps[::-1], atol=1e-12)
        w, h = _freq_response(taps)
        assert np.all(np.abs(h[w > 0.27]) < 0.02)

    def test_multiband(self):
        taps = firdes.remez(
            101,
            [0.0, 0.1, 0.15, 0.3, 0.35, 0.5],
            [0.0, 1.0, 0.0],
            [1.0, 1.0, 10.0],
        )
        w, h = _freq_response(taps, 16384)
        assert np.all(np.abs(h[w < 0.095]) < 0.03)
        band = (w > 0.155) & (w < 0.295)
        assert np.all(np.abs(np.abs(h[band]) - 1.0) < 0.03)
        assert np.all(np.abs(h[w > 0.355]) < 0.005)

    def test_hilbert(self):
        taps = firdes.remez(33, [0.05, 0.45], [1.0], filter_type="hilbert")
        # antisymmetric
        np.testing.assert_allclose(taps, -taps[::-1], atol=1e-12)
        w, h = _freq_response(taps)
        band = (w > 0.08) & (w < 0.42)
        assert np.all(np.abs(np.abs(h[band]) - 1.0) < 0.02)

    def test_differentiator(self):
        taps = firdes.remez(
            31, [0.0, 0.45], [1.0], filter_type="differentiator"
        )
        np.testing.assert_allclose(taps, -taps[::-1], atol=1e-12)
        w, h = _freq_response(taps)
        band = (w > 0.02) & (w < 0.4)
        # |H(f)| ≈ f on the design band (slope-1 differentiator)
        rel = np.abs(np.abs(h[band]) - w[band]) / w[band]
        assert np.max(rel) < 0.02

    def test_matches_scipy_when_available(self):
        sp = pytest.importorskip("scipy.signal")
        for args in [
            (65, [0.0, 0.2, 0.25, 0.5], [1.0, 0.0], None),
            (31, [0.0, 0.15, 0.2, 0.5], [1.0, 0.0], [1.0, 3.0]),
            (255, [0.0, 0.05, 0.07, 0.5], [1.0, 0.0], None),
        ]:
            n, bands, des, wt = args
            mine = firdes.remez(n, bands, des, wt)
            theirs = sp.remez(n, bands, des, weight=wt, fs=1.0)
            np.testing.assert_allclose(mine, theirs, atol=5e-5)

    def test_remez_lowpass_spec(self):
        """remez.rs low_pass parity: meets the dB specs it was asked for."""
        taps = firdes.remez_lowpass(1.0, 1.0, 0.2, 0.25, 0.2, 60.0)
        w, h = _freq_response(taps, 16384)
        sb = 20 * np.log10(np.maximum(np.abs(h[w >= 0.25]), 1e-12))
        assert sb.max() < -58.0  # ~60 dB stopband
        pb = np.abs(h[w <= 0.2])
        ripple_db = 20 * np.log10(pb.max() / pb.min())
        assert ripple_db < 0.4  # ~0.2 dB passband ripple

    def test_validation(self):
        with pytest.raises(ValueError):
            firdes.remez(65, [0.0, 0.3, 0.2, 0.5], [1.0, 0.0])  # non-asc
        with pytest.raises(ValueError):
            firdes.remez(65, [0.0, 0.2, 0.25], [1.0, 0.0])  # odd edges
        with pytest.raises(ValueError):
            firdes.remez(65, [0.0, 0.2, 0.25, 0.5], [1.0])  # des mismatch
