"""NCO / complex rotator kernels.

Parity: ``crates/futuredsp/src/rotator.rs`` and the fixed-point NCO tables of
``src/blocks/signal_source/``. Phase is accumulated in **uint32 fixed-point
turns** (wraps naturally mod 2^32) so arbitrarily long streams never lose
phase precision in float32 — the same trick as the reference's fxpt NCO,
but the sin/cos evaluation runs on the VPU instead of a lookup table.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

TWO_PI = 2.0 * np.pi
_TURNS = 2.0**32  # one turn = 2^32 fixed-point units


def freq_to_fxp(freq_per_sample: float) -> np.uint32:
    """Convert cycles/sample to a uint32 phase increment (host-side)."""
    return np.uint32(np.round((freq_per_sample % 1.0) * _TURNS))


def phase_to_fxp(phase_rad: float) -> np.uint32:
    return np.uint32(np.round(((phase_rad / TWO_PI) % 1.0) * _TURNS))


def nco_phase(phase_acc, dphi_fxp, n: int):
    """Generate ``n`` phases (radians, f32) from a fixed-point NCO.

    Returns ``(new_acc, phases)``; both accumulator args are uint32 scalars
    (device arrays so retuning does not recompile).
    """
    idx = jnp.arange(n, dtype=jnp.uint32)
    accs = phase_acc + dphi_fxp * idx  # wraps mod 2^32 exactly
    phases = accs.astype(jnp.float32) * jnp.float32(TWO_PI / _TURNS)
    new_acc = phase_acc + dphi_fxp * jnp.uint32(n)
    return new_acc, phases


def nco_complex(phase_acc, dphi_fxp, n: int, amplitude=1.0):
    """Complex exponential e^{jφ} stream from the NCO (as a CArray)."""
    from futuresdr_tpu.ops import cplx

    new_acc, phases = nco_phase(phase_acc, dphi_fxp, n)
    osc = cplx.exp_j(phases)
    if amplitude != 1.0:
        osc = osc * float(amplitude)
    return new_acc, osc


def rotator_apply(x, phase_acc, dphi_fxp):
    """Frequency-shift ``x`` by the NCO frequency: ``y = x · e^{jφ[n]}``.

    Consumes N, produces N; state is the uint32 phase accumulator.
    ``x`` is a CArray (or real array, promoted).
    """
    from futuresdr_tpu.ops import cplx

    x = cplx.asarray(x)
    new_acc, osc = nco_complex(phase_acc, dphi_fxp, x.shape[-1])
    return new_acc, osc * x
