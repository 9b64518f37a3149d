"""Batched FFT kernels.

Parity: ``src/blocks/fft.rs:28-56`` — the reference plans a rustfft FFT and
processes 32 transforms per work call; on TPU the whole chunk is one batched
XLA FFT (``jnp.fft``), fused with neighbors.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def fft_chunk(
    x,
    size: int,
    *,
    inverse: bool = False,
    shift: bool = False,
    normalize: bool = False,
    window: Optional[jnp.ndarray] = None,
):
    """FFT of a chunk of ``k*size`` samples as ``k`` batched transforms.

    Options mirror the reference Fft block: ``shift`` swaps halves
    (fftshift), ``normalize`` scales by 1/sqrt(size), ``window`` applies an
    elementwise window before the transform. Consumes/produces 1:1.
    """
    n = x.shape[-1]
    if n % size != 0:
        raise ValueError(f"chunk {n} not a multiple of fft size {size}")
    frames = x.reshape(*x.shape[:-1], n // size, size)
    if window is not None:
        frames = frames * window
    out = jnp.fft.ifft(frames, axis=-1) if inverse else jnp.fft.fft(frames, axis=-1)
    if normalize:
        out = out * (1.0 / jnp.sqrt(jnp.asarray(size, dtype=jnp.float32)))
    if shift:
        out = jnp.fft.fftshift(out, axes=-1)
    return out.reshape(*x.shape[:-1], n)


def ifft_chunk(x, size: int, **kw):
    return fft_chunk(x, size, inverse=True, **kw)
