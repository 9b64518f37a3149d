"""Device-kernel golden tests: FIR/resampler/IIR/rotator/FFT/PFB vs NumPy.

This is the Mocker-equivalent tier for raw kernels (SURVEY.md §4(a)): pure
functions checked against exact NumPy references, including streaming
equivalence (chunked state-carrying == one-shot). Complex data flows through
the CArray (re, im) pair representation — the only complex form this TPU
backend supports."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from futuresdr_tpu import ops
from futuresdr_tpu.dsp import firdes, windows
from futuresdr_tpu.ops import cplx
from futuresdr_tpu.ops import fir as fir_ops
from futuresdr_tpu.ops import fft as fft_ops
from futuresdr_tpu.ops import iir as iir_ops
from futuresdr_tpu.ops import pfb as pfb_ops
from futuresdr_tpu.ops import rotator as rot_ops
from futuresdr_tpu.ops import demod as demod_ops

tonp = cplx.to_numpy


def np_fir_stream(x, taps):
    """Reference streaming FIR: y[n] = Σ_k taps[k]·x[n−k], x[<0]=0."""
    full = np.convolve(x, taps)
    return full[: len(x)]


class TestCplx:
    def test_roundtrip_and_ops(self):
        rng = np.random.default_rng(0)
        a = (rng.standard_normal(64) + 1j * rng.standard_normal(64)).astype(
            np.complex64
        )
        b = (rng.standard_normal(64) + 1j * rng.standard_normal(64)).astype(
            np.complex64
        )
        ca, cb = cplx.from_numpy(a), cplx.from_numpy(b)
        np.testing.assert_allclose(tonp(ca * cb), a * b, atol=1e-5)
        np.testing.assert_allclose(tonp(ca + cb), a + b, atol=1e-6)
        np.testing.assert_allclose(tonp(ca.conj()), np.conj(a), atol=1e-6)
        np.testing.assert_allclose(np.asarray(ca.abs2()), np.abs(a) ** 2, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ca.angle()), np.angle(a), atol=1e-5)
        np.testing.assert_allclose(tonp(ca * 2.0), a * 2, atol=1e-6)
        np.testing.assert_allclose(tonp(ca * (1 + 2j)), a * (1 + 2j), atol=1e-5)
        np.testing.assert_allclose(tonp(ca / cb), a / b, atol=1e-4)

    def test_matmul(self):
        rng = np.random.default_rng(1)
        a = (rng.standard_normal((8, 16)) + 1j * rng.standard_normal((8, 16))).astype(
            np.complex64
        )
        b = (rng.standard_normal((16, 4)) + 1j * rng.standard_normal((16, 4))).astype(
            np.complex64
        )
        got = tonp(cplx.matmul(cplx.from_numpy(a), cplx.from_numpy(b)))
        np.testing.assert_allclose(got, a @ b, atol=1e-4)


class TestMatmulFft:
    @pytest.mark.parametrize("n", [16, 64, 128, 256, 1024, 4096, 96, 768])
    def test_fft_matches_numpy(self, n):
        rng = np.random.default_rng(2)
        x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
            np.complex64
        )
        got = tonp(fft_ops.fft_c(cplx.from_numpy(x)))
        ref = np.fft.fft(x)
        scale = np.sqrt(n)
        np.testing.assert_allclose(got / scale, ref / scale, atol=2e-4)

    def test_ifft_roundtrip(self):
        rng = np.random.default_rng(3)
        x = (rng.standard_normal(512) + 1j * rng.standard_normal(512)).astype(
            np.complex64
        )
        y = fft_ops.ifft_c(fft_ops.fft_c(cplx.from_numpy(x)))
        np.testing.assert_allclose(tonp(y), x, atol=1e-4)

    def test_fft_axis(self):
        rng = np.random.default_rng(4)
        x = (rng.standard_normal((8, 32)) + 1j * rng.standard_normal((8, 32))).astype(
            np.complex64
        )
        got = tonp(fft_ops.fft_c(cplx.from_numpy(x), axis=0))
        np.testing.assert_allclose(got, np.fft.fft(x, axis=0), atol=1e-3)

    def test_real_input(self):
        x = np.random.default_rng(5).standard_normal(128).astype(np.float32)
        got = tonp(fft_ops.fft_c(jnp.asarray(x)))
        np.testing.assert_allclose(got, np.fft.fft(x), atol=1e-3)


class TestConv1d:
    @pytest.mark.parametrize(
        "cx,ct",
        [(False, False), (True, False), (True, True), (False, True)],
    )
    def test_valid_conv_all_dtype_combos(self, cx, ct):
        rng = np.random.default_rng(0)
        N, T = 256, 17
        x = rng.standard_normal(N).astype(np.float32)
        if cx:
            x = (x + 1j * rng.standard_normal(N)).astype(np.complex64)
        taps = rng.standard_normal(T).astype(np.float32)
        if ct:
            taps = (taps + 1j * rng.standard_normal(T)).astype(np.complex64)
        got = tonp(ops.conv1d_valid(x, taps))
        ref = np.convolve(x.astype(np.complex128), taps.astype(np.complex128))[
            T - 1 : N
        ]
        if not (cx or ct):
            ref = ref.real
        assert got.shape == (N - T + 1,)
        np.testing.assert_allclose(got, ref, rtol=0, atol=2e-4)

    def test_strided(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal(128).astype(np.float32)
        taps = rng.standard_normal(9).astype(np.float32)
        got = tonp(ops.conv1d_valid(x, taps, stride=4))
        ref = np.convolve(x, taps, "valid")[::4]
        np.testing.assert_allclose(got, ref, atol=1e-4)

    def test_batched(self):
        rng = np.random.default_rng(2)
        x = rng.standard_normal((3, 5, 64)).astype(np.float32)
        taps = rng.standard_normal(7).astype(np.float32)
        got = tonp(ops.conv1d_valid(x, taps))
        assert got.shape == (3, 5, 58)
        for i in range(3):
            for j in range(5):
                np.testing.assert_allclose(
                    got[i, j], np.convolve(x[i, j], taps, "valid"), atol=1e-4
                )

    def test_fft_variant_matches_direct(self):
        rng = np.random.default_rng(3)
        x = (rng.standard_normal(512) + 1j * rng.standard_normal(512)).astype(
            np.complex64
        )
        taps = rng.standard_normal(300).astype(np.float32)
        got = tonp(fir_ops.conv1d_valid_fft(x, taps))
        ref = np.convolve(x, taps, "valid")
        np.testing.assert_allclose(got, ref, atol=2e-3)


class TestStreamingFir:
    def test_chunked_equals_oneshot(self):
        rng = np.random.default_rng(4)
        x = (rng.standard_normal(1024) + 1j * rng.standard_normal(1024)).astype(
            np.complex64
        )
        taps = firdes.kaiser_lowpass(0.1, 0.05, 1e-3).astype(np.float32)
        ref = np_fir_stream(x, taps)

        state = None
        outs = []
        for c in range(0, 1024, 256):
            state, y = ops.fir_filter(x[c : c + 256], taps, state)
            outs.append(tonp(y))
        got = np.concatenate(outs)
        np.testing.assert_allclose(got, ref, atol=1e-3)

    def test_decimate(self):
        rng = np.random.default_rng(5)
        x = rng.standard_normal(1200).astype(np.float32)
        taps = rng.standard_normal(31).astype(np.float32)
        decim = 4
        ref = np_fir_stream(x, taps)[::decim]
        state = None
        outs = []
        for c in range(0, 1200, 400):
            state, y = ops.fir_decimate(x[c : c + 400], taps, decim, state)
            outs.append(tonp(y))
        got = np.concatenate(outs)
        assert len(got) == 300
        np.testing.assert_allclose(got, ref[: len(got)], atol=1e-3)

    def test_interpolate(self):
        rng = np.random.default_rng(6)
        x = rng.standard_normal(256).astype(np.float32)
        interp = 3
        taps = firdes.kaiser_multirate(interp, 1, 8, 1e-4).astype(np.float32)
        up = np.zeros(len(x) * interp, dtype=np.float32)
        up[::interp] = x
        ref = np_fir_stream(up, taps)
        state = None
        outs = []
        for c in range(0, 256, 64):
            state, y = ops.fir_interpolate(x[c : c + 64], taps, interp, state)
            outs.append(tonp(y))
        got = np.concatenate(outs)
        assert len(got) == 256 * interp
        np.testing.assert_allclose(got, ref, atol=1e-3)

    def test_rational_resample(self):
        rng = np.random.default_rng(7)
        x = rng.standard_normal(400).astype(np.float32)
        interp, decim = 3, 2
        taps = firdes.kaiser_multirate(interp, decim, 8, 1e-4).astype(np.float32)
        up = np.zeros(len(x) * interp, dtype=np.float32)
        up[::interp] = x
        ref = np_fir_stream(up, taps)[::decim]
        state = None
        outs = []
        for c in range(0, 400, 100):
            state, y = ops.fir_resample_poly(x[c : c + 100], taps, interp, decim, state)
            outs.append(tonp(y))
        got = np.concatenate(outs)
        assert len(got) == 400 * interp // decim
        np.testing.assert_allclose(got, ref[: len(got)], atol=1e-3)

    def test_complex_resample(self):
        rng = np.random.default_rng(17)
        x = (rng.standard_normal(300) + 1j * rng.standard_normal(300)).astype(
            np.complex64
        )
        interp, decim = 2, 3
        taps = firdes.kaiser_multirate(interp, decim, 8, 1e-4).astype(np.float32)
        up = np.zeros(len(x) * interp, dtype=np.complex64)
        up[::interp] = x
        ref = np_fir_stream(up, taps)[::decim]
        _, y = ops.fir_resample_poly(x, taps, interp, decim)
        np.testing.assert_allclose(tonp(y), ref[: len(tonp(y))], atol=1e-3)


class TestIir:
    def test_biquad_vs_scipy(self):
        from scipy import signal as sp

        rng = np.random.default_rng(8)
        x = rng.standard_normal(512).astype(np.float32)
        b, a = sp.butter(2, 0.2)
        (_, _), y = iir_ops.iir_apply(jnp.asarray(x), b, a)
        ref = sp.lfilter(b, a, x)
        np.testing.assert_allclose(np.asarray(y), ref, atol=2e-3)

    def test_chunked_equals_oneshot(self):
        from scipy import signal as sp

        rng = np.random.default_rng(9)
        x = rng.standard_normal(1024).astype(np.float32)
        b, a = sp.butter(3, 0.15)
        ref = sp.lfilter(b, a, x)
        state = None
        outs = []
        for c in range(0, 1024, 128):
            state, y = iir_ops.iir_apply(jnp.asarray(x[c : c + 128]), b, a, state)
            outs.append(np.asarray(y))
        np.testing.assert_allclose(np.concatenate(outs), ref, atol=5e-3)

    def test_single_pole(self):
        rng = np.random.default_rng(10)
        x = rng.standard_normal(300).astype(np.float32)
        alpha = 0.1
        ref = np.zeros(300)
        acc = 0.0
        for i, v in enumerate(x):
            acc = alpha * v + (1 - alpha) * acc
            ref[i] = acc
        state, y = iir_ops.single_pole_iir(jnp.asarray(x), alpha)
        np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)
        s = None
        outs = []
        for c in range(0, 300, 100):
            s, y = iir_ops.single_pole_iir(jnp.asarray(x[c : c + 100]), alpha, s)
            outs.append(np.asarray(y))
        np.testing.assert_allclose(np.concatenate(outs), ref, atol=1e-4)


class TestRotator:
    def test_freq_shift_exact_long_stream(self):
        f = 0.1234567
        dphi = rot_ops.freq_to_fxp(f)
        acc = jnp.uint32(0)
        n_chunk, n_chunks = 4096, 8
        outs = []
        x = np.ones(n_chunk, dtype=np.complex64)
        for _ in range(n_chunks):
            acc, y = rot_ops.rotator_apply(x, acc, jnp.uint32(dphi))
            outs.append(tonp(y))
        got = np.concatenate(outs)
        n = np.arange(n_chunk * n_chunks)
        f_quant = float(dphi) / 2.0**32
        ref = np.exp(2j * np.pi * f_quant * n)
        assert np.max(np.abs(got - ref)) < 2e-3  # no drift across chunks

    def test_rotator_is_multiplicative(self):
        rng = np.random.default_rng(11)
        x = (rng.standard_normal(256) + 1j * rng.standard_normal(256)).astype(
            np.complex64
        )
        dphi = rot_ops.freq_to_fxp(0.05)
        _, y = rot_ops.rotator_apply(x, jnp.uint32(0), jnp.uint32(dphi))
        _, osc = rot_ops.nco_complex(jnp.uint32(0), jnp.uint32(dphi), 256)
        np.testing.assert_allclose(tonp(y), x * tonp(osc), atol=1e-5)


class TestDemod:
    def test_quadrature_demod_recovers_frequency(self):
        f = 0.01
        n = np.arange(1024)
        x = np.exp(2j * np.pi * f * n).astype(np.complex64)
        st = cplx.czeros((1,))
        outs = []
        for c in range(0, 1024, 512):
            st, y = demod_ops.quadrature_demod(x[c : c + 512], st)
            outs.append(np.asarray(y))
        got = np.concatenate(outs)
        np.testing.assert_allclose(got[1:], 2 * np.pi * f, atol=1e-4)

    def test_am_demod(self):
        x = (3 + 4j) * np.ones(16, dtype=np.complex64)
        np.testing.assert_allclose(np.asarray(demod_ops.am_demod(x)), 5.0, atol=1e-5)


class TestFftChunk:
    def test_fft_batched(self):
        rng = np.random.default_rng(12)
        x = (rng.standard_normal(1024) + 1j * rng.standard_normal(1024)).astype(
            np.complex64
        )
        got = tonp(ops.fft_chunk(x, 256))
        ref = np.fft.fft(x.reshape(4, 256), axis=-1).reshape(-1)
        np.testing.assert_allclose(got, ref, rtol=0, atol=1e-2)

    def test_fft_shift_normalize_window(self):
        rng = np.random.default_rng(13)
        x = (rng.standard_normal(512) + 1j * rng.standard_normal(512)).astype(
            np.complex64
        )
        win = windows.hann(256).astype(np.float32)
        got = tonp(
            ops.fft_chunk(x, 256, shift=True, normalize=True, window=jnp.asarray(win))
        )
        ref = np.fft.fftshift(
            np.fft.fft(x.reshape(2, 256) * win, axis=-1) / np.sqrt(256), axes=-1
        ).reshape(-1)
        np.testing.assert_allclose(got, ref, atol=1e-2)


class TestPfb:
    def test_channelizer_tone_isolation(self):
        """A tone at channel k's center lands in channel k only."""
        M = 8
        proto = firdes.kaiser_lowpass(0.5 / M * 0.8, 0.5 / M * 0.4, 1e-4)
        G = jnp.asarray(pfb_ops.analysis_branch_taps(proto, M), dtype=jnp.float32)
        R = 256
        n = np.arange(R * M)
        for k in (0, 1, 5):
            x = np.exp(2j * np.pi * (k / M) * n).astype(np.complex64)
            _, y = pfb_ops.pfb_channelize(x, G, M)
            y = tonp(y)  # [R, M]
            pwr = np.mean(np.abs(y[32:]) ** 2, axis=0)
            assert np.argmax(pwr) == k
            others = np.delete(pwr, k)
            assert pwr[k] > 100 * np.max(others)

    def test_channelizer_streaming_continuity(self):
        M = 4
        proto = firdes.kaiser_lowpass(0.5 / M * 0.8, 0.5 / M * 0.4, 1e-3)
        G = jnp.asarray(pfb_ops.analysis_branch_taps(proto, M), dtype=jnp.float32)
        rng = np.random.default_rng(14)
        x = (rng.standard_normal(1024) + 1j * rng.standard_normal(1024)).astype(
            np.complex64
        )
        _, y_full = pfb_ops.pfb_channelize(x, G, M)
        st = None
        outs = []
        for c in range(0, 1024, 256):
            st, y = pfb_ops.pfb_channelize(x[c : c + 256], G, M, st)
            outs.append(tonp(y))
        np.testing.assert_allclose(
            np.concatenate(outs, axis=0), tonp(y_full), atol=1e-4
        )

    def test_analysis_synthesis_roundtrip(self):
        """channelize → synthesize ≈ delayed identity for in-band signals."""
        M = 8
        proto = firdes.kaiser_lowpass(0.5 / M * 0.9, 0.5 / M * 0.2, 1e-4)
        Ga = jnp.asarray(pfb_ops.analysis_branch_taps(proto, M), dtype=jnp.float32)
        Gs = jnp.asarray(pfb_ops.synthesis_branch_taps(proto, M), dtype=jnp.float32)
        n = np.arange(4096)
        x = sum(
            np.exp(2j * np.pi * (k / M) * n + 1j * k) for k in range(M)
        ).astype(np.complex64) / M
        _, y = pfb_ops.pfb_channelize(x, Ga, M)
        _, xr = pfb_ops.pfb_synthesize(y, Gs, M)
        xr = tonp(xr)
        skip = len(proto) * 4
        seg = xr[skip : skip + 1024]
        best_snr = -np.inf
        for lag in range(0, 4 * len(proto)):
            ref = x[skip - lag : skip - lag + 1024]
            if len(ref) < 1024:
                continue
            g = (seg @ np.conj(ref)) / (ref @ np.conj(ref))
            err = seg - g * ref
            snr = 10 * np.log10(
                np.sum(np.abs(g * ref) ** 2) / (np.sum(np.abs(err) ** 2) + 1e-30)
            )
            best_snr = max(best_snr, snr)
        assert best_snr > 40, f"roundtrip SNR {best_snr:.1f} dB"


class TestArbResampler:
    def test_rational_plan_matches_poly(self):
        rng = np.random.default_rng(15)
        x = rng.standard_normal(512).astype(np.float32)
        num, den, P = 4, 3, 32
        proto = firdes.kaiser_multirate(P, 1, 8, 1e-4).astype(np.float32)
        phase_taps = np.asarray(pfb_ops.synthesis_branch_taps(proto, P), np.float32)
        n_out = len(x) * num // den
        idx, ph = pfb_ops.arb_resampler_plan(num, den, P, n_out)
        _, y = pfb_ops.arb_resample(
            jnp.asarray(x),
            jnp.asarray(phase_taps),
            jnp.asarray(idx),
            jnp.asarray(ph),
        )
        up = np.zeros(len(x) * P, dtype=np.float32)
        up[::P] = x
        full = np_fir_stream(up, proto)
        ref = np.array([full[int(m * den / num * P)] for m in range(n_out)])
        np.testing.assert_allclose(tonp(y), ref, atol=2e-2)


def test_branch_fir_bf16_dtype_close():
    """fir_dtype=bfloat16 trades precision for HBM bandwidth; the
    result must stay within bf16 tolerance of the f32 path."""
    from futuresdr_tpu import config
    from futuresdr_tpu.ops import cplx as _c
    from futuresdr_tpu.ops.fir import conv1d_valid_branches

    rng = np.random.default_rng(3)
    xb = _c.from_numpy(
        (rng.standard_normal((16, 200)) + 1j * rng.standard_normal((16, 200))).astype(np.complex64)
    )
    taps = rng.standard_normal((16, 8)).astype(np.float32)
    ref = tonp(conv1d_valid_branches(xb, taps))
    config.set("fir_dtype", "bfloat16")
    try:
        out = tonp(conv1d_valid_branches(xb, taps))
    finally:
        config.set("fir_dtype", "float32")
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 2e-2, rel
    assert not np.allclose(out, ref)  # actually took the bf16 path


def test_channelizer_dft_bf16_backend_close():
    """channelizer_fft=dft_bf16 (dense MXU DFT) must match the
    mixed-radix path within bf16 tolerance and keep tone isolation."""
    from futuresdr_tpu import config
    from futuresdr_tpu.ops import cplx as _c

    M = 16
    proto = firdes.kaiser_lowpass(0.5 / M * 0.8, 0.5 / M * 0.4, 1e-4)
    G = jnp.asarray(pfb_ops.analysis_branch_taps(proto, M), dtype=jnp.float32)
    rng = np.random.default_rng(5)
    x = (rng.standard_normal(256 * M) + 1j * rng.standard_normal(256 * M)).astype(
        np.complex64
    )
    _, y_ref = pfb_ops.pfb_channelize(x, G, M)
    config.set("channelizer_fft", "dft_bf16")
    try:
        _, y_dft = pfb_ops.pfb_channelize(x, G, M)
    finally:
        config.set("channelizer_fft", "mixed_radix")
    a, b = tonp(y_ref), tonp(y_dft)
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 2e-2, rel
    assert not np.allclose(a, b)  # the bf16 path actually ran


def test_toeplitz_fir_bf16_dtype_close():
    """fir_dtype=bfloat16 also covers the Toeplitz matmul path used by
    conv1d_valid (long-signal FIRs)."""
    from futuresdr_tpu import config
    from futuresdr_tpu.ops import cplx as _c
    from futuresdr_tpu.ops.fir import conv1d_valid

    rng = np.random.default_rng(9)
    x = _c.from_numpy(
        (rng.standard_normal(5000) + 1j * rng.standard_normal(5000)).astype(np.complex64)
    )
    taps = rng.standard_normal(64).astype(np.float32)
    ref = tonp(conv1d_valid(x, taps))
    config.set("fir_dtype", "bfloat16")
    try:
        out = tonp(conv1d_valid(x, taps))
    finally:
        config.set("fir_dtype", "float32")
    rel = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel < 2e-2, rel
    assert not np.allclose(out, ref)


@pytest.mark.parametrize("w", [1, 3, 48, 64])
@pytest.mark.parametrize("n", [100, 4096, 5000, 9000])
def test_moving_sum_matches_conv(w, n):
    if n < w:
        pytest.skip("window longer than chunk")
    rng = np.random.default_rng(7)
    x = rng.standard_normal(n).astype(np.float32)
    out = np.asarray(fir_ops.moving_sum(x, w))
    ref = np.convolve(x, np.ones(w, np.float64), mode="valid")
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_moving_sum_complex():
    rng = np.random.default_rng(8)
    z = (rng.standard_normal(6000) + 1j * rng.standard_normal(6000)).astype(
        np.complex64
    )
    out = fir_ops.moving_sum(cplx.from_numpy(z), 48)
    ref = np.convolve(z, np.ones(48), mode="valid")
    np.testing.assert_allclose(np.asarray(out.re), ref.real, atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.im), ref.imag, atol=1e-3)


def test_conv1d_valid_concrete_taps_take_matmul_path_under_jit():
    """Host-constant taps must hit the Toeplitz-matmul path even when
    conv1d_valid is called inside a jit trace (in-trace coercion used to
    wrap them in Tracers and silently demote to the ~100x-slower XLA conv
    lowering on TPU)."""
    taps = np.asarray([0.25, 0.5, 0.25], np.float32)
    x = np.arange(64, dtype=np.float32)

    @jax.jit
    def f_np(v):
        return fir_ops.conv1d_valid(v, taps)

    @jax.jit
    def f_carray(v):
        t = cplx.CArray(taps, np.zeros_like(taps))
        y = fir_ops.conv1d_valid(v, t)
        return y.re

    @jax.jit
    def f_traced(v):
        return fir_ops.conv1d_valid(v, jnp.ones(3, jnp.float32) / 3.0)

    before = dict(fir_ops.path_stats)
    y = np.asarray(f_np(x))
    assert fir_ops.path_stats["matmul"] == before["matmul"] + 1
    assert fir_ops.path_stats["conv"] == before["conv"]
    np.testing.assert_allclose(
        y, np.convolve(x, taps[::-1], mode="valid"), rtol=1e-5
    )

    before = dict(fir_ops.path_stats)
    np.asarray(f_carray(x))
    assert fir_ops.path_stats["matmul"] == before["matmul"] + 1

    # genuinely traced taps (runtime params) stay on the matmul path
    # too, via the in-trace Toeplitz gather (Fir retunable=True support)
    before = dict(fir_ops.path_stats)
    yt = np.asarray(f_traced(x))
    assert fir_ops.path_stats["matmul"] == before["matmul"] + 1
    assert fir_ops.path_stats["conv"] == before["conv"]
    np.testing.assert_allclose(
        yt, np.convolve(x, np.full(3, 1 / 3), mode="valid"), rtol=1e-5
    )


def test_iir_taps_stay_on_matmul_path_under_jit():
    """Normalizing IIR taps must happen in numpy: jnp arithmetic inside a
    jit trace turned the taps into trace constants the FIR dispatcher saw
    as non-concrete, demoting every jitted IIR to the XLA conv lowering
    (fir.py documents ~265 ms/call there vs sub-ms Toeplitz matmul)."""
    import jax

    from futuresdr_tpu.ops import fir as fir_mod
    from futuresdr_tpu.ops.iir import biquad_apply, iir_apply

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal(512).astype(np.float32)
    )
    b = np.array([0.2, 0.3], np.float32)
    a = np.array([1.0, -0.5], np.float32)

    before = dict(fir_mod.path_stats)
    jax.jit(lambda x: iir_apply(x, b, a))(x)
    jax.jit(lambda x: biquad_apply(x, 0.2, 0.3, 0.1, -0.4, 0.05))(x)
    assert fir_mod.path_stats["conv"] == before["conv"], (
        "jitted IIR took the conv lowering"
    )
    assert fir_mod.path_stats["matmul"] >= before["matmul"] + 2


class TestPackedIntFetch:
    """ops/packing.py: the biased-normal encoding that keeps packed int
    fetches out of the TPU denormal-flush band (NOTES r5)."""

    def test_round_trip_boundaries(self):
        from futuresdr_tpu.ops import packing

        hi = (1 << 30) - (1 << 23) - 2  # documented exact-range top
        vals = np.array(
            [-1, 0, 1, 2, 127, 128, (1 << 23) - 1, 1 << 23,
             (1 << 24) + 7, (1 << 29) + 123, hi],
            np.int32,
        )

        @jax.jit
        def rt(v):
            return packing.pack_int_f32(v) * jnp.float32(1.0)

        got = packing.unpack_int_f32(np.asarray(jax.device_get(rt(vals))))
        np.testing.assert_array_equal(got, vals)

    def test_packed_values_are_normal_floats(self):
        from futuresdr_tpu.ops import packing

        vals = np.arange(0, 1 << 12, dtype=np.int32)
        f = np.asarray(packing.pack_int_f32(vals))
        # every payload must land in [2.0, 4.0): no denormals, no NaNs
        assert np.all(np.isfinite(f))
        assert float(np.min(f)) >= 2.0 and float(np.max(f)) < 4.0

    def test_backend_check_failure_is_cached(self, monkeypatch):
        from futuresdr_tpu.ops import packing

        monkeypatch.setattr(packing, "_backend_ok", False)
        with pytest.raises(RuntimeError, match="previously failed"):
            packing.unpack_int_f32(np.zeros(4, np.float32))
