"""DSP blocks wrapping the device kernels in :mod:`futuresdr_tpu.ops`.

Parity: ``src/blocks/{fir,iir,fft,xlating_fir,signal_source,agc}.rs`` and
the ``FirBuilder`` patterns (``src/blocks/fir.rs:126+`` — plain/decimating/
interpolating/resampling with auto Kaiser tap design at ``fir.rs:154``).
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

from futuresdr_tpu.dsp import firdes
from futuresdr_tpu.ops import cplx
from futuresdr_tpu.ops.demod import quadrature_demod
from futuresdr_tpu.ops.fft import fft_chunk
from futuresdr_tpu.ops.fir import (
    fir_decimate,
    fir_filter,
    fir_resample_poly,
)
from futuresdr_tpu.ops.iir import iir_apply
from futuresdr_tpu.ops.rotator import (
    freq_to_fxp,
    nco_complex,
    nco_phase,
    phase_to_fxp,
    rotator_apply,
)
from futuresdr_tpu.runtime.block import Block, PortSpec, message_handler
from futuresdr_tpu.types.pmt import Pmt


def _is_cplx(dtype) -> bool:
    return np.dtype(dtype) == np.complex64


def _zeros_state(is_complex: bool, n: int):
    if n <= 0:
        return cplx.czeros((0,)) if is_complex else jnp.zeros((0,), jnp.float32)
    return cplx.czeros((n,)) if is_complex else jnp.zeros((n,), jnp.float32)


class Fir(Block):
    """FIR filter: plain / decimating / interpolating / rational resampling.

    Parity: ``src/blocks/fir.rs`` + the futuredsp cores it instantiates
    (``fir.rs:31-96``, ``decimating_fir.rs``, ``polyphase_resampling_fir.rs``).
    Taps are real or complex 1-D; complex streams use CArray math. Use the
    constructors:

    * ``Fir(taps)`` — 1:1
    * ``Fir.decimating(taps, decim)`` — N:1
    * ``Fir.interpolating(taps, interp)`` — 1:N
    * ``Fir.resampling(interp, decim, taps=None)`` — P/Q (auto Kaiser taps
      when omitted, parity fir.rs:154)
    """

    def __init__(
        self,
        taps,
        interp: int = 1,
        decim: int = 1,
        dtype=np.complex64,
        retunable: bool = False,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        self.taps = cplx.from_numpy(np.asarray(taps))
        self.interp = int(interp)
        self.decim = int(decim)
        # retunable: taps ride the device-params path (like XlatingFir's
        # NCO increment), so a ``taps`` message swaps the response
        # WITHOUT recompiling — adaptive channel selection / AGC-driven
        # shaping. Off by default: baked-constant taps let XLA fold and
        # specialize the kernel. Length and realness are part of the
        # compiled signature (latency calculus + state size + param
        # keys), so a retune must preserve both.
        self._init_retunable_taps(taps, retunable)
        self.stream_inputs = [PortSpec("in", dtype)]
        self.stream_outputs = [PortSpec("out", dtype)]
        self.rate_in = (self.decim,)
        self.rate_out = (self.interp,)
        self._complex = _is_cplx(dtype)
        T = self.taps.shape[0]
        if self.interp == 1 and self.decim == 1:
            lat, hist = T - 1, T - 1
        elif self.interp == 1:
            lat = math.ceil((T - 1) / self.decim)
            hist = -(-(T - 1) // self.decim) * self.decim
        else:
            L = -(-T // self.interp)
            lat = math.ceil((L - 1) * self.interp / self.decim)
            hist = L - 1
        self.latency_out = (lat,)
        self._hist = hist
        self._phase = 0

    def absorb_latency(self, in_lats):
        """Compiler hook (decimating mode): re-anchor the decimation grid
        to the first valid input sample so cascaded rate changes bit-match
        the reference's valid-stream composition."""
        L = int(in_lats[0]) if in_lats else 0
        T = self.taps.shape[0]
        if self.interp == 1 and self.decim > 1:
            self._phase = L % self.decim
            return [
                -(-(L + T - 1 - self._phase) // self.decim)
            ]
        if self.interp == 1 and self.decim == 1:
            return [L + T - 1]
        # resampler: keep the generic unit-scaled estimate
        from fractions import Fraction
        import math as _math

        return [
            self.latency_out[0]
            + _math.ceil(Fraction(L, self.decim) * self.interp)
        ]

    # ---- builder-style constructors (FirBuilder parity) -----------------
    @classmethod
    def decimating(
        cls, taps, decim: int, dtype=np.complex64, retunable=False, name=None
    ):
        return cls(
            taps,
            interp=1,
            decim=decim,
            dtype=dtype,
            retunable=retunable,
            name=name,
        )

    @classmethod
    def interpolating(
        cls, taps, interp: int, dtype=np.complex64, retunable=False, name=None
    ):
        return cls(
            taps,
            interp=interp,
            decim=1,
            dtype=dtype,
            retunable=retunable,
            name=name,
        )

    @classmethod
    def resampling(
        cls,
        interp: int,
        decim: int,
        taps=None,
        dtype=np.complex64,
        retunable=False,
        name=None,
    ):
        g = math.gcd(interp, decim)
        interp, decim = interp // g, decim // g
        if taps is None:
            # auto Kaiser multirate design (parity: fir.rs:154 →
            # firdes::kaiser::multirate)
            taps = firdes.kaiser_multirate(interp, decim)
        return cls(
            taps,
            interp=interp,
            decim=decim,
            dtype=dtype,
            retunable=retunable,
            name=name,
        )

    def _state_hist(self) -> int:
        hist = self._hist
        if self.interp == 1 and self.decim > 1:
            # mirror fir_decimate's history formula (phase may need
            # lookback even for T == 1)
            T = self.taps.shape[0]
            hist = -(-(T - 1) // self.decim) * self.decim if T > 1 else 0
            if T == 1 and self._phase:
                hist = self.decim
        return hist

    @property
    def state_suffix_in(self):
        # mesh protocol: the state IS the last `hist` input items
        # (evaluated lazily — decimating phase is set by absorb_latency
        # during compilation, before the mesh tier reads this)
        return (self._state_hist(),)

    def make_state(self, in_sizes, out_sizes):
        return _zeros_state(self._complex, self._state_hist())

    def _init_retunable_taps(self, taps, retunable: bool) -> None:
        self.retunable = bool(retunable)
        self._taps_complex = np.iscomplexobj(np.asarray(taps))
        if self.retunable:
            t = np.asarray(taps)
            self._params["taps_re"] = np.ascontiguousarray(
                t.real, np.float32
            )
            if self._taps_complex:
                self._params["taps_im"] = np.ascontiguousarray(
                    t.imag, np.float32
                )

    @message_handler("taps")
    def _taps_handler(self, pmt: Pmt) -> Pmt:
        """Live tap retune (retunable=True only). Accepts a list of
        numbers, or ``{"re": [...], "im": [...]}`` for complex taps.
        ``Pmt::Null`` queries the current taps."""
        v = pmt.to_py()
        if v is None:
            t = self._taps_now()
            if isinstance(t, cplx.CArray):
                return Pmt.from_py(
                    {
                        "re": np.asarray(t.re).tolist(),
                        "im": np.asarray(t.im).tolist(),
                    }
                )
            return Pmt.from_py(np.asarray(t).tolist())
        if not self.retunable:
            raise RuntimeError(
                "this Fir has baked taps — construct with retunable=True "
                "for live tap retunes"
            )
        if isinstance(v, dict):
            t = np.asarray(v["re"], np.float32) + 1j * np.asarray(
                v["im"], np.float32
            )
        else:
            t = np.asarray(v, np.float32)
        if t.shape != (self.taps.shape[0],):
            raise ValueError(
                f"retuned taps must keep length {self.taps.shape[0]} "
                f"(latency/state are compiled for it), got {t.shape}"
            )
        if bool(np.iscomplexobj(t)) != self._taps_complex:
            raise ValueError(
                "retuned taps must keep the original realness (param "
                "keys are part of the compiled signature)"
            )
        self.set_param("taps_re", np.ascontiguousarray(t.real, np.float32))
        if self._taps_complex:
            self.set_param(
                "taps_im", np.ascontiguousarray(t.imag, np.float32)
            )
        return Pmt.ok()

    def _taps_now(self):
        if not self.retunable:
            return self.taps
        re = self._params["taps_re"]
        if self._taps_complex:
            return cplx.CArray(jnp.asarray(re), jnp.asarray(self._params["taps_im"]))
        return jnp.asarray(re)

    def _taps_in(self, params):
        if not self.retunable:
            return self.taps
        re = params["taps_re"]
        if self._taps_complex:
            return cplx.CArray(re, params["taps_im"])
        return re

    def apply(self, state, inputs, params):
        x = inputs[0]
        taps = self._taps_in(params)
        if self.interp == 1 and self.decim == 1:
            state, y = fir_filter(x, taps, state)
        elif self.interp == 1:
            state, y = fir_decimate(
                x, taps, self.decim, state, phase=self._phase
            )
        else:
            state, y = fir_resample_poly(
                x, taps, self.interp, self.decim, state
            )
        return state, [y], {}


class XlatingFir(Block):
    """Frequency-translating decimating FIR (parity: xlating_fir.rs:127).

    Down-mixes by ``center_freq`` with the fxpt NCO, then decimating FIR.
    ``freq`` message handler retunes without recompiling (the NCO increment
    is a device param)."""

    def __init__(
        self,
        taps,
        decim: int,
        center_freq: float,
        sample_rate: float,
        retunable: bool = False,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        self.taps = cplx.from_numpy(np.asarray(taps))
        self.decim = int(decim)
        # retunable taps: live channel-bandwidth change (same machinery
        # and constraints as Fir(retunable=True))
        self._init_retunable_taps(taps, retunable)
        self.sample_rate = float(sample_rate)
        self.stream_inputs = [PortSpec("in", np.complex64)]
        self.stream_outputs = [PortSpec("out", np.complex64)]
        self.rate_in = (self.decim,)
        self.rate_out = (1,)
        T = self.taps.shape[0]
        self.latency_out = (math.ceil((T - 1) / self.decim),)
        self._hist = -(-(T - 1) // self.decim) * self.decim
        # mesh protocol: hist = last _hist DOWN-MIXED input items —
        # suffix-reconstructable once the NCO accumulator is positioned
        # (advance_state); see runtime/mesh.py
        self.state_suffix_in = (self._hist,)
        self._params["dphi"] = np.asarray(
            freq_to_fxp(-center_freq / sample_rate)
        )

    @message_handler("freq")
    def freq_handler(self, pmt: Pmt) -> Pmt:
        f = float(pmt.to_py())
        self.set_param("dphi", freq_to_fxp(-f / self.sample_rate))
        return Pmt.ok()

    def make_state(self, in_sizes, out_sizes):
        return (jnp.uint32(0), _zeros_state(True, self._hist))

    def advance_state(self, state, n_items, params):
        """Mesh hook: the fxpt NCO is position-affine — the phase after
        n more items is acc + n·dphi (uint32 wrap = mod 2^32 turns).
        The FIR history part is left for suffix reconstruction."""
        acc, hist = state
        return (acc + params["dphi"] * jnp.uint32(n_items), hist)

    # the Fir handler/validation applies verbatim (length + realness are
    # compiled signature; params keys identical)
    _init_retunable_taps = Fir._init_retunable_taps
    _taps_handler = Fir._taps_handler
    _taps_now = Fir._taps_now
    _taps_in = Fir._taps_in

    def apply(self, state, inputs, params):
        acc, hist = state
        acc, shifted = rotator_apply(inputs[0], acc, params["dphi"])
        hist, y = fir_decimate(
            shifted, self._taps_in(params), self.decim, hist
        )
        return (acc, hist), [y], {}


class FreqShift(Block):
    """Multiply the stream by a complex NCO: ``y = x·e^{j2πft}``
    (parity: the freq-xlating Apply closures in examples — e.g.
    ``examples/ssb/receive.rs:57-66`` — and futuredsp's ``Rotator``).
    ``freq`` retunes via message or :meth:`set_param` without recompiling;
    ``scale`` folds a constant gain into the same pass."""

    def __init__(
        self,
        freq: float,
        sample_rate: float,
        scale: float = 1.0,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        self.sample_rate = float(sample_rate)
        self.scale = float(scale)
        self.stream_inputs = [PortSpec("in", np.complex64)]
        self.stream_outputs = [PortSpec("out", np.complex64)]
        self.rate_in = (1,)
        self.rate_out = (1,)
        self._params["dphi"] = np.asarray(freq_to_fxp(freq / sample_rate))

    @message_handler("freq")
    def freq_handler(self, pmt: Pmt) -> Pmt:
        self.set_param("dphi", freq_to_fxp(float(pmt.to_py()) / self.sample_rate))
        return Pmt.ok()

    def make_state(self, in_sizes, out_sizes):
        return jnp.uint32(0)

    def advance_state(self, state, n_items, params):
        # mesh hook: position-affine fxpt NCO (see runtime/mesh.py)
        return state + params["dphi"] * jnp.uint32(n_items)

    def apply(self, state, inputs, params):
        acc, y = rotator_apply(inputs[0], state, params["dphi"])
        if self.scale != 1.0:
            y = y * self.scale
        return acc, [y], {}


class WeaverDecode(Block):
    """Weaver SSB product detector: ``audio = re(v)·cos(ωt) ± im(v)·sin(ωt)``
    with ω = 2π·mid_freq (parity: examples/ssb/receive.rs:73-84 —
    ``+`` for USB, ``−`` for LSB; volume folded in)."""

    def __init__(
        self,
        mid_freq: float,
        sample_rate: float,
        usb: bool = True,
        volume: float = 0.5,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        self.sample_rate = float(sample_rate)
        self.usb = usb
        self.volume = float(volume)
        self.stream_inputs = [PortSpec("in", np.complex64)]
        self.stream_outputs = [PortSpec("out", np.float32)]
        self.rate_in = (1,)
        self.rate_out = (1,)
        self._params["dphi"] = np.asarray(freq_to_fxp(mid_freq / sample_rate))

    def make_state(self, in_sizes, out_sizes):
        return jnp.uint32(0)

    def advance_state(self, state, n_items, params):
        # mesh hook: position-affine fxpt NCO (see runtime/mesh.py)
        return state + params["dphi"] * jnp.uint32(n_items)

    def apply(self, state, inputs, params):
        x = inputs[0]
        acc, osc = nco_complex(state, params["dphi"], x.shape[-1])
        term = x.re * osc.re
        term2 = x.im * osc.im
        y = self.volume * (term + term2 if self.usb else term - term2)
        return acc, [y.astype(jnp.float32)], {}


class Iir(Block):
    """IIR filter b/a (parity: src/blocks/iir.rs + futuredsp iir.rs —
    device recursion via the blocked parallel-scan in ops.iir)."""

    def __init__(self, b, a, dtype=np.float32, name: Optional[str] = None):
        super().__init__(name)
        self.b = jnp.asarray(np.asarray(b, dtype=np.float32))
        self.a = jnp.asarray(np.asarray(a, dtype=np.float32))
        self.stream_inputs = [PortSpec("in", dtype)]
        self.stream_outputs = [PortSpec("out", dtype)]
        self.rate_in = (1,)
        self.rate_out = (1,)

    def make_state(self, in_sizes, out_sizes):
        T = self.b.shape[0]
        p = self.a.shape[0] - 1
        return (
            jnp.zeros((T - 1,), jnp.float32),
            jnp.zeros((p,), jnp.float32),
        )

    def apply(self, state, inputs, params):
        state, y = iir_apply(inputs[0], self.b, self.a, state)
        return state, [y], {}


class IirBuilder:
    """Typed-constructor shim (parity: src/blocks/iir.rs:33-63 —
    ``IirBuilder::{iir,same_type}`` are Rust type-dispatch helpers; in
    Python ``Iir(b, a)`` already covers both, so these are aliases)."""

    @staticmethod
    def same_type(b, a, dtype=np.float32) -> "Iir":
        return Iir(b, a, dtype=dtype)

    iir = same_type


class Fft(Block):
    """Batched FFT over frames of ``size`` samples
    (parity: src/blocks/fft.rs:28-56 — rustfft plan, batches of 32,
    shift/normalize options; here every work call is one batched
    matmul-FFT)."""

    def __init__(
        self,
        size: int = 2048,
        inverse: bool = False,
        shift: bool = False,
        normalize: bool = False,
        window=None,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        self.size = int(size)
        self.inverse = inverse
        self.shift = shift
        self.normalize = normalize
        self.window = (
            jnp.asarray(np.asarray(window, dtype=np.float32))
            if window is not None
            else None
        )
        if self.size < 1:
            raise ValueError(f"fft size must be >= 1, got {self.size}")
        if self.window is not None and self.window.shape[0] != self.size:
            raise ValueError(
                f"{self.size}-point Fft with a "
                f"{self.window.shape[0]}-point window"
            )
        self.stream_inputs = [PortSpec("in", np.complex64)]
        self.stream_outputs = [PortSpec("out", np.complex64)]
        self.rate_in = (self.size,)
        self.rate_out = (self.size,)

    @message_handler("fft_size")
    def _fft_size(self, pmt: Pmt) -> Pmt:
        """Query or set the FFT size (parity: fft.rs ``fft_size`` port).
        The size is part of this block's SDF rate signature, so it can
        only change BEFORE the graph is compiled — a mid-run retune
        would re-solve every chunk size (the reference re-plans lazily;
        here that is a recompile, so it is an explicit error rather
        than a silent multi-second stall)."""
        v = pmt.to_py()
        if v is None:
            return Pmt.u32(self.size)
        if self._rate_locked:
            raise RuntimeError(
                "fft_size cannot change while an executor holds this "
                "graph compiled (SDF rate): stop the graph, set the "
                "size, and run again"
            )
        size = int(v)
        if size < 1:
            raise ValueError(f"fft_size must be >= 1, got {size}")
        if self.window is not None and self.window.shape[0] != size:
            raise ValueError(
                f"fft_size {size} does not match the configured "
                f"{self.window.shape[0]}-point window — pass a matching "
                "window at construction or drop it"
            )
        self.size = size
        self.rate_in = (self.size,)
        self.rate_out = (self.size,)
        return Pmt.u32(self.size)

    def apply(self, state, inputs, params):
        y = fft_chunk(
            inputs[0],
            self.size,
            inverse=self.inverse,
            shift=self.shift,
            normalize=self.normalize,
            window=self.window,
        )
        return state, [y], {}


class QuadratureDemod(Block):
    """FM discriminator ``gain·arg(x[n]·conj(x[n-1]))``
    (parity: the Apply closure at examples/fm-receiver/src/main.rs:100-105
    and blocks using it; complex in → f32 out, 1:1)."""

    def __init__(self, gain: float = 1.0, name: Optional[str] = None):
        super().__init__(name)
        self.gain = float(gain)
        self.stream_inputs = [PortSpec("in", np.complex64)]
        self.stream_outputs = [PortSpec("out", np.float32)]
        self.rate_in = (1,)
        self.rate_out = (1,)
        self.latency_out = (1,)
        self.state_suffix_in = (1,)  # state = previous input sample

    def make_state(self, in_sizes, out_sizes):
        return cplx.czeros((1,))

    def apply(self, state, inputs, params):
        state, y = quadrature_demod(inputs[0], state, self.gain)
        return state, [y], {}


class SignalSource(Block):
    """Device NCO source: sin/cos/complex-exp at ``freq``
    (parity: src/blocks/signal_source/ — fxpt NCO; freq/amplitude are
    retunable device params + ``freq`` message handler)."""

    def __init__(
        self,
        freq: float,
        sample_rate: float,
        amplitude: float = 1.0,
        kind: str = "complex",  # complex | sin | cos
        initial_phase: float = 0.0,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        self.sample_rate = float(sample_rate)
        self.kind = kind
        dtype = np.complex64 if kind == "complex" else np.float32
        self.stream_outputs = [PortSpec("out", dtype)]
        self.rate_out = (1,)
        self._params["dphi"] = np.asarray(freq_to_fxp(freq / sample_rate))
        self._params["amplitude"] = np.float32(amplitude)
        self._phase0 = phase_to_fxp(initial_phase)
        self._n = 0

    @property
    def freq(self) -> float:
        """Current frequency in Hz (read back from the fxpt NCO step)."""
        return int(self._params["dphi"]) / float(1 << 32) * self.sample_rate

    @message_handler("freq")
    def freq_handler(self, pmt: Pmt) -> Pmt:
        f = float(pmt.to_py())
        self.set_param("dphi", freq_to_fxp(f / self.sample_rate))
        return Pmt.ok()

    @message_handler("amplitude")
    def amplitude_handler(self, pmt: Pmt) -> Pmt:
        self.set_param("amplitude", np.float32(float(pmt.to_py())))
        return Pmt.ok()

    def make_state(self, in_sizes, out_sizes):
        self._n = out_sizes[0]
        return jnp.uint32(self._phase0)

    def advance_state(self, state, n_items, params):
        # mesh hook: position-affine fxpt NCO (see runtime/mesh.py) —
        # lets the mesh place each shard's oscillator phase directly
        return state + params["dphi"] * jnp.uint32(n_items)

    def apply(self, state, inputs, params):
        amp = params["amplitude"]
        if self.kind == "complex":
            acc, osc = nco_complex(state, params["dphi"], self._n)
            return acc, [osc * amp], {}
        acc, ph = nco_phase(state, params["dphi"], self._n)
        y = jnp.sin(ph) if self.kind == "sin" else jnp.cos(ph)
        return acc, [y * amp], {}


class Agc(Block):
    """Automatic gain control (parity: src/blocks/agc.rs — per-sample gain
    recursion). TPU form: chunk-granular gain update — power is averaged
    per sub-frame and the gain recursion runs over sub-frames via scan,
    then expands; for SDR AGC time constants (≫ sub-frame) this matches the
    reference's behavior."""

    def __init__(
        self,
        reference: float = 1.0,
        rate: float = 1e-2,
        frame: int = 64,
        max_gain: float = 65536.0,
        dtype=np.complex64,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        self.reference = float(reference)
        self.rate = float(rate)
        self.frame = int(frame)
        self.max_gain = float(max_gain)
        self.stream_inputs = [PortSpec("in", dtype)]
        self.stream_outputs = [PortSpec("out", dtype)]
        self.rate_in = (self.frame,)
        self.rate_out = (self.frame,)
        self._complex = _is_cplx(dtype)

    def make_state(self, in_sizes, out_sizes):
        return jnp.float32(1.0)

    def apply(self, state, inputs, params):
        import jax

        x = inputs[0]
        n = x.shape[-1]
        f = self.frame
        k = n // f
        mag = x.abs() if isinstance(x, cplx.CArray) else jnp.abs(x)
        frame_rms = jnp.sqrt(
            jnp.mean(mag.reshape(k, f) ** 2, axis=-1) + 1e-20
        )

        def step(g, rms):
            g = g + self.rate * (self.reference - rms * g)
            g = jnp.clip(g, 0.0, self.max_gain)
            return g, g

        g_final, gains = jax.lax.scan(step, state, frame_rms)
        gain_full = jnp.repeat(gains, f)
        y = x * gain_full
        return g_final, [y], {}


class ClockRecoveryMM(Block):
    """Mueller-Müller symbol timing recovery
    (parity: examples/zigbee/src/clock_recovery_mm.rs).

    The per-symbol feedback recurrence runs as a ``lax.scan`` inside the
    fused device step (:mod:`futuresdr_tpu.ops.mm`). Output is
    fixed-capacity (one slot per input sample) with inactive slots zeroed;
    the data-dependent symbol count is exposed in aux as ``mm_valid``.
    State carries a tail of unconsumed samples so chunked processing is
    exactly equivalent to one continuous run.
    """

    def __init__(
        self,
        omega: float,
        gain_omega: float,
        mu: float,
        gain_mu: float,
        omega_relative_limit: float,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        self.omega = float(omega)
        self.gain_omega = float(gain_omega)
        self.mu0 = float(mu)
        self.gain_mu = float(gain_mu)
        self.omega_limit = float(omega) * float(omega_relative_limit)
        self.look_ahead = int(
            math.ceil(self.omega + self.omega_limit + self.gain_mu)
        )
        # tail must cover the loop's maximum leftover: look_ahead plus one
        # maximal advance, with margin
        self.tail_len = self.look_ahead + int(math.ceil(self.omega)) + 4
        self.stream_inputs = [PortSpec("in", np.float32)]
        self.stream_outputs = [PortSpec("out", np.float32)]
        self.rate_in = (1,)
        self.rate_out = (1,)

    def absorb_latency(self, in_lats):
        """Compiler hook: upstream transient samples enter the timing loop
        as data — they cannot be compensated by trimming the *symbol*
        stream (the output is a data-dependent compacted prefix, so a
        front-trim would drop a real symbol and shift the ``mm_valid``
        window). Report 0: the loop re-acquires over any transient, as the
        reference's streaming MM does (clock_recovery_mm.rs)."""
        return [0]

    def make_state(self, in_sizes, out_sizes):
        from futuresdr_tpu.ops.mm import mm_init

        mm = mm_init(self.omega)
        # start reading at the first real sample (skip the zero tail)
        mm = mm._replace(
            ii=jnp.int32(self.tail_len), mu=jnp.float32(self.mu0)
        )
        return (jnp.zeros(self.tail_len, jnp.float32), mm)

    def apply(self, state, inputs, params):
        from futuresdr_tpu.ops.mm import mm_process

        tail, mm = state
        x = inputs[0]
        n = x.shape[-1]
        buf = jnp.concatenate([tail, x])
        mm2, out, valid = mm_process(
            mm,
            buf,
            n_out=int(n),
            look_ahead=self.look_ahead,
            omega_mid=self.omega,
            omega_limit=self.omega_limit,
            gain_omega=self.gain_omega,
            gain_mu=self.gain_mu,
        )
        new_tail = buf[-self.tail_len :]
        # ii < n would mean the loop's average advance fell below one
        # input sample per output (possible only for omega near 1 with
        # large error excursions): the read pointer would land before the
        # kept tail. The clamp keeps the program well-defined; the
        # mm_underrun aux flag makes the (lossy) event observable instead
        # of silent.
        mm3 = mm2._replace(ii=jnp.maximum(mm2.ii - n, 0))
        return (
            (new_tail, mm3),
            [out],
            {
                "mm_valid": valid.sum(),
                "mm_underrun": (mm2.ii < n).astype(jnp.int32),
            },
        )
