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

    def make_state(self, in_sizes, out_sizes):
        L = self.branch_taps.shape[-1]
        return cplx.czeros((self.n_ch, L - 1))

    def apply(self, state, inputs, params):
        state, y = pfb_channelize(
            inputs[0], self.branch_taps, self.n_ch, state
        )  # y: [R, M]
        outs = [y[:, k] for k in range(self.n_ch)]
        return state, outs, {}


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

    def make_state(self, in_sizes, out_sizes):
        L = self.branch_taps.shape[-1]
        return cplx.czeros((self.n_ch, L - 1))

    def apply(self, state, inputs, params):
        y = cplx.stack(inputs, axis=-1)  # [R, M]
        state, x = pfb_synthesize(y, self.branch_taps, self.n_ch, state)
        return state, [x], {}
