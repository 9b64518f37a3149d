"""Demodulation kernels (quadrature/FM, AM, SSB helpers)."""

from __future__ import annotations

import jax.numpy as jnp

from futuresdr_tpu.ops import cplx


def quadrature_demod(x, last, gain=1.0):
    """FM/quadrature demod: ``y[n] = gain · arg(x[n] · conj(x[n-1]))``.

    Parity: the Apply closure in ``examples/fm-receiver/src/main.rs:100-105``.
    ``x`` is a CArray; ``last`` is the final sample of the previous chunk
    (CArray of shape ``x.shape[:-1] + (1,)``). Consumes N, produces N (f32).
    """
    x = cplx.asarray(x)
    prev = cplx.concat([last, x[..., :-1]], axis=-1)
    d = x * prev.conj()
    y = (d.angle() * gain).astype(jnp.float32)
    return x[..., -1:], y


def am_demod(x, gain=1.0):
    """Envelope detector: |x| (stateless)."""
    x = cplx.asarray(x)
    return x.abs() * gain


def fm_deemphasis_coeffs(sample_rate: float, tau: float = 75e-6):
    """Single-pole IIR de-emphasis (b, a) for :func:`ops.iir.iir_apply`."""
    import numpy as np

    # bilinear transform of H(s) = 1/(1 + s·tau)
    w = 1.0 / tau
    wa = 2.0 * sample_rate * np.tan(w / (2.0 * sample_rate))
    k = wa / (2.0 * sample_rate)
    b0 = k / (1.0 + k)
    a1 = (1.0 - k) / (1.0 + k)
    return np.array([b0, b0]), np.array([1.0, -a1])
