"""Device DSP kernels (XLA + Pallas).

This tier replaces futuredsp's scalar inner loops
(``crates/futuredsp/src/fir.rs:31-96`` etc.) with TPU-shaped kernels:

* FIR / decimating FIR / polyphase resampling — MXU-friendly conv or
  framed matmul, complex handled as 2-channel real (TPU convs are real).
* FFT — XLA's native complex FFT, batched.
* IIR / stateful recursions — ``lax.scan`` (block-parallel forms where the
  recursion is affine).
* All kernels are pure ``(state?, chunk) -> (state?, chunk)`` functions with
  static shapes, so a flowgraph of them fuses into one XLA program.

The rate contract mirrors the reference ``Filter`` trait
(``futuredsp/src/lib.rs:47-91``): a kernel documents how many samples it
consumes/produces per chunk; the flowgraph compiler solves chunk sizes so
buffers are always exactly sufficient — ``ComputationStatus`` is resolved at
compile time instead of per work() call.
"""

from futuresdr_tpu.ops.fir import (
    conv1d_valid,
    fir_filter,
    fir_decimate,
    fir_interpolate,
    fir_resample_poly,
)
from futuresdr_tpu.ops.fft import fft_chunk, ifft_chunk
from futuresdr_tpu.ops.rotator import rotator_apply, nco_phase
from futuresdr_tpu.ops.iir import iir_apply, biquad_apply
from futuresdr_tpu.ops.demod import quadrature_demod
from futuresdr_tpu.ops.pfb import pfb_channelize, pfb_synthesize

__all__ = [
    "conv1d_valid",
    "fir_filter",
    "fir_decimate",
    "fir_interpolate",
    "fir_resample_poly",
    "fft_chunk",
    "ifft_chunk",
    "rotator_apply",
    "nco_phase",
    "iir_apply",
    "biquad_apply",
    "quadrature_demod",
    "pfb_channelize",
    "pfb_synthesize",
]
