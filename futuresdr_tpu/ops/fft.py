"""FFT as batched MXU matmuls (no complex dtype on device).

Parity: ``src/blocks/fft.rs:28-56`` (the reference plans a rustfft transform
and batches 32 per work call). TPU-native design: this backend has no
complex support at all, so we run a **mixed-radix Cooley-Tukey FFT built
from real matmuls** over the (re, im) pair representation:

    N = N1·N2,  n = n1 + N1·n2,  k = k2 + N2·k1
    X[k2 + N2·k1] = Σ_{n1} W_N1^{n1 k1} · W_N^{n1 k2} · Σ_{n2} x[n1+N1 n2] W_N2^{n2 k2}

Each stage of size ≤ ``_MAX_RADIX`` is one DFT matrix multiply
([batch, r] @ [r, r]) — exactly the shape the MXU wants; the twiddle is a
fused VPU elementwise multiply. Cost/sample ≈ 4·Σ radices real MACs
(e.g. N=4096 → 4·(64+64) = 512 MACs/sample), far below MXU capacity.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from futuresdr_tpu.ops import cplx
from futuresdr_tpu.ops.cplx import CArray

_MAX_RADIX = 64


def _PREC():
    """FFT matmul precision (config ``fft_precision``): HIGHEST (6-pass
    f32, default — 90+ dB chains) or HIGH (3-pass — ~2× faster FFT stages
    when the SNR budget allows)."""
    from futuresdr_tpu import config

    p = str(config.get("fft_precision", "highest")).lower()
    return {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }.get(p, jax.lax.Precision.HIGHEST)


@lru_cache(maxsize=None)
def _dft_consts(n: int, sign: int):
    """DFT matrix W[n,k] = exp(sign·2πj·nk/N) as two float32 host arrays."""
    idx = np.arange(n, dtype=np.float64)
    ang = sign * 2.0 * np.pi * np.outer(idx, idx) / n
    return (
        np.cos(ang).astype(np.float32),
        np.sin(ang).astype(np.float32),
    )


@lru_cache(maxsize=None)
def _twiddle_consts(n1: int, n2: int, sign: int):
    """Twiddle W_N^{n1·k2}: [n1, n2] host arrays (N = n1·n2)."""
    n = n1 * n2
    ang = sign * 2.0 * np.pi * np.outer(
        np.arange(n1, dtype=np.float64), np.arange(n2, dtype=np.float64)
    ) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _best_factor(n: int) -> int:
    """Largest factor of n that is ≤ _MAX_RADIX (prefers big MXU tiles)."""
    for f in range(min(_MAX_RADIX, n), 1, -1):
        if n % f == 0:
            return f
    return n


def _dft_matmul(x: CArray, n: int, sign: int) -> CArray:
    wr, wi = _dft_consts(n, sign)
    w = CArray(jnp.asarray(wr), jnp.asarray(wi))
    return cplx.matmul(x, w, precision=_PREC())


def _fft_last(x: CArray, sign: int) -> CArray:
    """FFT along the last axis, recursive mixed radix."""
    n = x.shape[-1]
    if n <= _MAX_RADIX or _best_factor(n) == n:
        # direct DFT matmul (also the fallback for large prime sizes)
        return _dft_matmul(x, n, sign)
    n1 = _best_factor(n)
    n2 = n // n1
    lead = x.shape[:-1]
    # A[..., n2, n1]: A[n2, n1] = x[n1 + N1·n2]
    a = x.reshape(*lead, n2, n1)
    # inner FFT over n2 for fixed n1 → move n2 last
    a = cplx.apply1(lambda t: jnp.swapaxes(t, -1, -2), a)  # [..., n1, n2]
    b = _fft_last(a, sign)  # [..., n1, k2]
    tr, ti = _twiddle_consts(n1, n2, sign)
    b = b * CArray(jnp.asarray(tr), jnp.asarray(ti))
    # outer DFT over n1 for fixed k2 → move n1 last
    c = cplx.apply1(lambda t: jnp.swapaxes(t, -1, -2), b)  # [..., k2, n1]
    d = _dft_matmul(c, n1, sign)  # [..., k2, k1]
    # X[k2 + N2·k1] → flatten [k1-major, k2-minor]
    d = cplx.apply1(lambda t: jnp.swapaxes(t, -1, -2), d)  # [..., k1, k2]
    return d.reshape(*lead, n)


def fft_c(x, axis: int = -1) -> CArray:
    """Forward FFT of a CArray (or real array) along ``axis``."""
    x = x if isinstance(x, CArray) else CArray(jnp.asarray(x), jnp.zeros_like(jnp.asarray(x)))
    if axis not in (-1, x.ndim - 1):
        x = cplx.apply1(lambda t: jnp.moveaxis(t, axis, -1), x)
        y = _fft_last(x, -1)
        return cplx.apply1(lambda t: jnp.moveaxis(t, -1, axis), y)
    return _fft_last(x, -1)


def ifft_c(x, axis: int = -1) -> CArray:
    """Inverse FFT (normalized by 1/N)."""
    x = x if isinstance(x, CArray) else CArray(jnp.asarray(x), jnp.zeros_like(jnp.asarray(x)))
    n = x.shape[axis]
    if axis not in (-1, x.ndim - 1):
        x = cplx.apply1(lambda t: jnp.moveaxis(t, axis, -1), x)
        y = _fft_last(x, +1)
        y = cplx.apply1(lambda t: jnp.moveaxis(t, -1, axis), y)
    else:
        y = _fft_last(x, +1)
    return y * (1.0 / n)


def fftshift_c(x: CArray, axis: int = -1) -> CArray:
    return cplx.apply1(lambda t: jnp.fft.fftshift(t, axes=axis), x)


def fft_chunk(
    x,
    size: int,
    *,
    inverse: bool = False,
    shift: bool = False,
    normalize: bool = False,
    window: Optional[jnp.ndarray] = None,
):
    """FFT of a chunk of ``k·size`` samples as ``k`` batched transforms.

    Options mirror the reference Fft block (shift → fftshift, normalize →
    1/√size, window → pre-multiply). Consumes/produces 1:1; output is the
    interleaved stream of transformed frames (CArray).
    """
    x = cplx.asarray(x)
    if not isinstance(x, CArray):
        x = CArray(x, jnp.zeros_like(x))
    n = x.shape[-1]
    if n % size != 0:
        raise ValueError(f"chunk {n} not a multiple of fft size {size}")
    frames = x.reshape(*x.shape[:-1], n // size, size)
    if window is not None:
        frames = frames * window
    if inverse:
        # rustfft parity: the inverse transform is UNNORMALIZED; the
        # ``normalize`` option is the only scaling (fft.rs:28-56)
        out = ifft_c(frames) * float(size)
    else:
        out = fft_c(frames)
    if normalize:
        out = out * float(1.0 / np.sqrt(size))
    if shift:
        out = fftshift_c(out, axis=-1)
    return out.reshape(*x.shape[:-1], n)


def ifft_chunk(x, size: int, **kw):
    return fft_chunk(x, size, inverse=True, **kw)
