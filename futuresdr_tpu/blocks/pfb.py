"""Polyphase filter-bank blocks.

Parity: ``src/blocks/pfb/channelizer.rs:71-224`` (liquid-dsp derivation),
``pfb/synthesizer.rs:144``. The per-channel ``WindowBuffer`` scalar loops
become one grouped branch convolution + one batched matmul-FFT per chunk
(see :mod:`futuresdr_tpu.ops.pfb`) — the formulation that rides the MXU.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from futuresdr_tpu.dsp import firdes
from futuresdr_tpu.ops import cplx
from futuresdr_tpu.ops.pfb import (
    analysis_branch_taps,
    pfb_channelize,
    pfb_synthesize,
    synthesis_branch_taps,
)
from futuresdr_tpu.runtime.block import Block, PortSpec

# PfbFmBank audio-stage formulation gate: dense banded-W matmul below
# this W size (fastest at bench chunks), blocked-Toeplitz conv above
# (the dense form is O(R²/D) and unusable at bulk-decode chunk sizes)
DENSE_AUDIO_W_MAX_BYTES = 64 << 20


def default_channelizer_taps(n_ch: int, taps_per_ch: int = 12) -> np.ndarray:
    """Kaiser prototype low-pass for an M-channel critically sampled bank."""
    num_taps = n_ch * taps_per_ch
    from futuresdr_tpu.dsp import windows

    win = windows.kaiser(num_taps + 1, 9.0)
    return firdes.lowpass(1.0 / (2.0 * n_ch), win)[:num_taps] * n_ch


class PfbChannelizer(Block):
    """Critically sampled M-channel analysis bank: 1 in → M out
    (parity: pfb/channelizer.rs — 1-in/N-out ``Vec<O>`` outputs).

    Channel k (center freq k/M cycles/s of the input rate) appears on
    output port k at rate fs/M."""

    def __init__(
        self,
        n_ch: int,
        taps=None,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        self.n_ch = int(n_ch)
        proto = (
            np.asarray(taps)
            if taps is not None
            else default_channelizer_taps(self.n_ch)
        )
        self.proto = proto
        self.branch_taps = jnp.asarray(
            analysis_branch_taps(proto, self.n_ch).astype(np.float32)
        )
        L = self.branch_taps.shape[-1]
        self.stream_inputs = [PortSpec("in", np.complex64)]
        self.stream_outputs = [
            PortSpec(f"out{k}", np.complex64) for k in range(self.n_ch)
        ]
        self.rate_in = (self.n_ch,)
        self.rate_out = (1,) * self.n_ch
        self.latency_out = (L - 1,) * self.n_ch
        # mesh protocol: state = the last (L-1) polyphase window rows
        self.state_suffix_in = ((L - 1) * self.n_ch,)

    def make_state(self, in_sizes, out_sizes):
        L = self.branch_taps.shape[-1]
        return cplx.czeros((self.n_ch, L - 1))

    def apply(self, state, inputs, params):
        state, y = pfb_channelize(
            inputs[0], self.branch_taps, self.n_ch, state
        )  # y: [R, M]
        outs = [y[:, k] for k in range(self.n_ch)]
        return state, outs, {}


class PfbFmBank(Block):
    """Fused M-channel PFB channelizer + FM quadrature demod + audio
    decimating FIR — the flagship bank as ONE block.

    This is what the compiler's fusion pass canonicalizes a
    ``PfbChannelizer → M×QuadratureDemod → M×Fir.decimating`` chain into
    (:mod:`futuresdr_tpu.runtime.fusion`), and users can instantiate it
    directly. The whole chain runs inside the fused Pallas kernel
    (:func:`futuresdr_tpu.ops.pallas_bank.fused_bank_demod`): branch FIR +
    DFT + demod never leave VMEM; the audio decimation is one banded-matrix
    MXU matmul. Numerics: f32 branch FIR, bf16 DFT (f32 accumulation),
    polynomial atan2 — the bench-headline rung's math.

    Ports: 1 wideband complex64 input. ``split_outputs=False`` (default)
    emits ONE float32 port carrying ``[n_ch, n]`` rows (one multi-channel
    audio column per item); ``split_outputs=True`` emits ``n_ch``
    per-channel float32 ports (drop-in for the unfused chain's wiring).

    The audio decimation grid is re-anchored to the upstream latency
    exactly like :meth:`Fir.absorb_latency`, so output streams bit-match
    the composed block chain's trims and sampling phases.

    Parity anchors: ``src/blocks/pfb/channelizer.rs:71-224``,
    ``examples/fm-receiver/src/main.rs:100-105`` (quadrature demod),
    ``src/blocks/fir.rs`` (decimating tail).
    """

    def __init__(
        self,
        n_ch: int,
        taps=None,
        gain: float = 1.0,
        audio_taps=None,
        audio_decim: int = 8,
        split_outputs: bool = False,
        tile_rows: int = 128,
        interpret: Optional[bool] = None,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        import math

        self.n_ch = M = int(n_ch)
        self.gain = float(gain)
        self.audio_decim = D = int(audio_decim)
        self.tile_rows = int(tile_rows)
        self._interpret = interpret
        proto = (
            np.asarray(taps) if taps is not None else default_channelizer_taps(M)
        )
        self.proto = proto
        branch = analysis_branch_taps(proto, M).astype(np.float32)  # [M, L]
        self.L = L = branch.shape[-1]
        self.w_rev = jnp.asarray(np.ascontiguousarray(branch[:, ::-1].T))
        from futuresdr_tpu.ops.pfb import _dft_const_bf16

        dre_np, dim_np = _dft_const_bf16(M)
        self._dre, self._dim = jnp.asarray(dre_np), jnp.asarray(dim_np)
        if audio_taps is None:
            from futuresdr_tpu.dsp import windows

            audio_taps = firdes.lowpass(0.4 / D, windows.hamming(32))
        self.audio_taps = np.asarray(audio_taps, np.float64)
        T = len(self.audio_taps)
        # mirror ops.fir.fir_decimate's history formula
        self.Ha = -(-(T - 1) // D) * D if T > 1 else (D if D > 1 else 0)
        self.split_outputs = bool(split_outputs)
        self.stream_inputs = [PortSpec("in", np.complex64)]
        if self.split_outputs:
            self.stream_outputs = [
                PortSpec(f"out{k}", np.float32) for k in range(M)
            ]
        else:
            self.stream_outputs = [PortSpec("out", np.float32)]
        n_out = len(self.stream_outputs)
        self.rate_in = (M * D,)
        self.rate_out = (1,) * n_out
        # default latency + grid phase (no upstream transient): must agree
        # with each other exactly as absorb_latency(0) would set them —
        # a phase-0 grid under a phase-(L%D) latency claim would trim to
        # the wrong sampling phase when the block runs without the
        # compiler hook (Mocker / hand-rolled harnesses)
        Ld = L  # (L-1) channelizer + 1 demod
        self._phase = Ld % D
        self.latency_out = (
            math.ceil((Ld + T - 1 - self._phase) / D),
        ) * n_out
        # mesh protocol: the state (branch history L-1 rows, prev DFT row,
        # audio history Ha rows) rebuilds exactly from the last
        # (Ha + L) wideband rows — the last Ha demod rows each need an
        # L-row branch window, Ha + L - 1 rows suffice and one extra row
        # keeps the bound independent of off-by-grid phase details
        self.state_suffix_in = ((self.Ha + L) * M,)
        self._w_cache = {}  # bounded: only built under the 64 MB gate

    def absorb_latency(self, in_lats):
        """Compiler hook: accumulate the composed chain's exact latency —
        channelizer (L−1, channel rate) + demod (1) — then re-anchor the
        audio decimation grid like :meth:`Fir.absorb_latency` does."""
        import math

        Lw = int(in_lats[0]) if in_lats else 0
        Ld = (self.L - 1) + math.ceil(Lw / self.n_ch) + 1
        T = len(self.audio_taps)
        D = self.audio_decim
        self._phase = Ld % D
        lat = math.ceil((Ld + T - 1 - self._phase) / D)
        return [lat] * len(self.stream_outputs)

    def _audio_w(self, R: int) -> np.ndarray:
        """Banded decimating-FIR matrix ``[R/D, Ha+R]`` on the
        ``phase``-anchored grid: output q = window ending at demod row
        ``q·D + phase`` (NumPy: embeds as a trace-time constant). Only
        built under the 64 MB gate in :meth:`apply`, so the per-(R,
        phase) cache is bounded."""
        key = (R, self._phase)
        W = self._w_cache.get(key)
        if W is None:
            T = len(self.audio_taps)
            D = self.audio_decim
            n_out = R // D
            W = np.zeros((n_out, self.Ha + R), np.float32)
            off = self.Ha + self._phase - (T - 1)
            for t in range(T):
                W[
                    np.arange(n_out), off + np.arange(n_out) * D + t
                ] = self.audio_taps[T - 1 - t]
            self._w_cache[key] = W
        return W

    def make_state(self, in_sizes, out_sizes):
        M, L = self.n_ch, self.L
        return (
            jnp.zeros((L - 1, M), jnp.float32),  # branch history rows (re)
            jnp.zeros((L - 1, M), jnp.float32),  # (im)
            jnp.zeros((1, M), jnp.float32),  # prev DFT row (re)
            jnp.zeros((1, M), jnp.float32),  # (im)
            jnp.zeros((self.Ha, M), jnp.float32),  # audio FIR history rows
        )

    def apply(self, state, inputs, params):
        import math

        import jax

        from futuresdr_tpu.ops.pallas_bank import fused_bank_demod

        if self._interpret is None:
            self._interpret = jax.devices()[0].platform != "tpu"
        hr, hi, ypr, ypi, ah = state
        x = inputs[0]
        M = self.n_ch
        R = x.shape[-1] // M
        tr = (
            self.tile_rows
            if R % self.tile_rows == 0
            else math.gcd(R, self.tile_rows)
        )
        a, hr, hi, ypr, ypi = fused_bank_demod(
            x.re.reshape(R, M),
            x.im.reshape(R, M),
            hr, hi, ypr, ypi,
            self.w_rev, self._dre, self._dim,
            L=self.L, tile_rows=tr, gain=self.gain,
            interpret=self._interpret,
        )
        ext = jnp.concatenate([ah, a], axis=0)  # [Ha+R, M]
        # audio decimating FIR down the rows on the phase-anchored grid:
        # output q = taps window ending at demod row q·D + phase. Two
        # formulations with a size gate: a dense [R/D, Ha+R] banded
        # matrix is the fastest at bench chunk sizes (one MXU matmul
        # over all M channels — chip A/B: the blocked-conv form cost
        # ~10% of the WHOLE step at R=4096) but is O(R²/D), a 275 GB
        # trace-time constant at bulk-decode R=512k; above 64 MB of W
        # the blocked-Toeplitz conv1d_valid O(R·T) path takes over.
        T = len(self.audio_taps)
        D = self.audio_decim
        n_out = R // D
        if n_out * (self.Ha + R) * 4 <= DENSE_AUDIO_W_MAX_BYTES:
            audio_t = jnp.matmul(
                self._audio_w(R), ext, preferred_element_type=jnp.float32
            ).T  # [M, R/D]
        else:
            from futuresdr_tpu.ops.fir import conv1d_valid

            off = self.Ha + self._phase - (T - 1)
            end = off + (n_out - 1) * D + T
            audio_t = conv1d_valid(
                ext.T[:, off:end],
                self.audio_taps.astype(np.float32),
                stride=D,
            )[:, :n_out]  # [M, R/D]
        new_state = (hr, hi, ypr, ypi, ext[ext.shape[0] - self.Ha :])
        if self.split_outputs:
            outs = [audio_t[k] for k in range(M)]
        else:
            outs = [audio_t]
        return new_state, outs, {}


class PfbArbResampler(Block):
    """Arbitrary-rate polyphase resampler (parity: pfb/arb_resampler.rs:232).

    The requested float ``rate`` is approximated by the best rational
    P/Q with Q ≤ 2¹⁶ (exact for rational requests); a static gather plan
    selects one of ``n_filters`` phase filters per output sample
    (:func:`futuresdr_tpu.ops.pfb.arb_resampler_plan`)."""

    def __init__(
        self,
        rate: float,
        taps=None,
        n_filters: int = 32,
        dtype=np.complex64,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        from fractions import Fraction

        frac = Fraction(rate).limit_denominator(1 << 16)
        self.rate_num, self.rate_den = frac.numerator, frac.denominator
        self.n_filters = int(n_filters)
        if taps is None:
            # prototype low-pass across the filter bank
            num_taps = self.n_filters * 12
            from futuresdr_tpu.dsp import windows

            win = windows.kaiser(num_taps + 1, 9.0)
            taps = (
                firdes.lowpass(
                    min(1.0, rate) / (2.0 * self.n_filters), win
                )[:num_taps]
                * self.n_filters
            )
        taps = np.asarray(taps, dtype=np.float32)
        L = -(-len(taps) // self.n_filters)
        padded = np.zeros(L * self.n_filters, np.float32)
        padded[: len(taps)] = taps
        self.phase_taps = jnp.asarray(
            padded.reshape(L, self.n_filters).T.copy()
        )  # [P, L]
        self.stream_inputs = [PortSpec("in", dtype)]
        self.stream_outputs = [PortSpec("out", dtype)]
        self.rate_in = (self.rate_den,)
        self.rate_out = (self.rate_num,)
        self._complex = np.dtype(dtype) == np.complex64
        self._plan = None

    def make_state(self, in_sizes, out_sizes):
        from futuresdr_tpu.ops.pfb import arb_resampler_plan

        idx, phase = arb_resampler_plan(
            self.rate_num, self.rate_den, self.n_filters, out_sizes[0]
        )
        # clamp plan into the chunk (guard rounding at the boundary)
        idx = np.minimum(idx, in_sizes[0] - 1)
        self._plan = (jnp.asarray(idx), jnp.asarray(phase))
        L = self.phase_taps.shape[1]
        if self._complex:
            return cplx.czeros((L - 1,))
        return jnp.zeros((L - 1,), jnp.float32)

    def apply(self, state, inputs, params):
        from futuresdr_tpu.ops.pfb import arb_resample

        idx, phase = self._plan
        state, y = arb_resample(
            inputs[0], self.phase_taps, idx, phase, state
        )
        return state, [y], {}


class PfbSynthesizer(Block):
    """M-channel synthesis bank: M in → 1 out at rate M·fs_ch
    (parity: pfb/synthesizer.rs:144)."""

    def __init__(
        self,
        n_ch: int,
        taps=None,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        self.n_ch = int(n_ch)
        proto = (
            np.asarray(taps)
            if taps is not None
            else default_channelizer_taps(self.n_ch)
        )
        self.branch_taps = jnp.asarray(
            synthesis_branch_taps(proto, self.n_ch).astype(np.float32)
        )
        L = self.branch_taps.shape[-1]
        self.stream_inputs = [
            PortSpec(f"in{k}", np.complex64) for k in range(self.n_ch)
        ]
        self.stream_outputs = [PortSpec("out", np.complex64)]
        self.rate_in = (1,) * self.n_ch
        self.rate_out = (self.n_ch,)
        self.latency_out = ((L - 1) * self.n_ch,)
        # mesh protocol: per-channel window = last L-1 items of each input
        self.state_suffix_in = (L - 1,) * self.n_ch

    def make_state(self, in_sizes, out_sizes):
        L = self.branch_taps.shape[-1]
        return cplx.czeros((self.n_ch, L - 1))

    def apply(self, state, inputs, params):
        y = cplx.stack(inputs, axis=-1)  # [R, M]
        state, x = pfb_synthesize(y, self.branch_taps, self.n_ch, state)
        return state, [x], {}
