"""Polyphase filter bank kernels (channelizer / synthesizer / arb resampler).

Parity: ``src/blocks/pfb/channelizer.rs:71-224`` (liquid-dsp derivation),
``pfb/synthesizer.rs``, ``pfb/arb_resampler.rs``. TPU-first formulation:

Analysis (channelizer), critically sampled, M channels:

    y_k[m] = Σ_n x[n] e^{-j2πkn/M} h[mM − n]
           = FFT_{p→k} ( Σ_r x[rM+p] · h[(m−r)M − p] )

i.e. M polyphase branch FIRs (one grouped conv, MXU-friendly) followed by a
batched length-M FFT per output time step. Channel k is centered at
f = k/M cycles/sample and decimated by M.

Synthesis is the exact transpose: batched IFFT then branch interpolation
filters, interleaved back to the wideband stream.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from futuresdr_tpu import config
from futuresdr_tpu.ops import cplx
from futuresdr_tpu.ops.cplx import ArrayLike, CArray
from futuresdr_tpu.ops.fft import fft_c, ifft_c
from futuresdr_tpu.ops.fir import conv1d_valid


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def analysis_branch_taps(proto: np.ndarray, n_ch: int) -> np.ndarray:
    """[M, L] branch matrix: ``G[p, s] = h[sM − p]`` (h zero-padded)."""
    proto = np.asarray(proto, dtype=np.float64)
    T = len(proto)
    M = n_ch
    L = _cdiv(T + M - 1, M)
    q = np.zeros(L * M, dtype=proto.dtype)
    q[M - 1 : M - 1 + T] = proto
    # q[sM + (M-1-p)] = h[sM - p]
    return q.reshape(L, M)[:, ::-1].T.copy()  # [M, L]


def synthesis_branch_taps(proto: np.ndarray, n_ch: int) -> np.ndarray:
    """[M, L] branch matrix: ``H̃[p, s] = h[sM + p]``."""
    proto = np.asarray(proto, dtype=np.float64)
    T = len(proto)
    M = n_ch
    L = _cdiv(T, M)
    q = np.zeros(L * M, dtype=proto.dtype)
    q[:T] = proto
    return q.reshape(L, M).T.copy()  # [M, L]


def _branch_convs(xb: ArrayLike, taps_b: ArrayLike) -> ArrayLike:
    """Per-branch FIR: xb [M, R], taps_b [M, L] → [M, R-L+1].

    One batched banded-Toeplitz MXU matmul (see ops.fir).
    """
    from futuresdr_tpu.ops.fir import conv1d_valid_branches

    return conv1d_valid_branches(xb, taps_b)


@lru_cache(maxsize=None)
def _dft_const_bf16(n: int):
    """[n, n] forward-DFT matrix as bf16 (re, im) NumPy constants.

    Cached as *NumPy* (ml_dtypes.bfloat16), never as jnp arrays: this is
    called inside jit traces, where ``jnp.asarray`` would return a tracer
    — and an lru-cached tracer leaks into every later trace
    (UnexpectedTracerError on the next re-jit with new shapes)."""
    import ml_dtypes

    k = np.arange(n, dtype=np.float64)
    ang = -2.0 * np.pi * np.outer(k, k) / n
    return (
        np.cos(ang).astype(ml_dtypes.bfloat16),
        np.sin(ang).astype(ml_dtypes.bfloat16),
    )


def _branch_fft(vt: ArrayLike, M: int) -> ArrayLike:
    """Length-M FFT over the branch axis, backend per config.

    ``channelizer_fft = dft_bf16``: ONE dense [M, M] bf16 DFT matmul
    with f32 accumulation instead of the mixed-radix stage chain —
    ~40× the FLOPs but perfectly MXU-shaped with minimal memory
    movement. Measured on v5e at M=1024: the whole bank runs 1.63×
    faster (isolation 68.4 dB vs the 60 dB target). Default stays the
    mixed-radix matmul-FFT (full f32 accuracy)."""
    mode = str(config.get("channelizer_fft", "mixed_radix")).lower()
    if mode in ("dft_bf16", "dft"):
        dre, dim = _dft_const_bf16(M)
        a16 = vt.re.astype(jnp.bfloat16)
        b16 = vt.im.astype(jnp.bfloat16)
        return CArray(
            jnp.matmul(a16, dre, preferred_element_type=jnp.float32)
            - jnp.matmul(b16, dim, preferred_element_type=jnp.float32),
            jnp.matmul(a16, dim, preferred_element_type=jnp.float32)
            + jnp.matmul(b16, dre, preferred_element_type=jnp.float32),
        )
    return fft_c(vt, axis=-1)


def _branch_ifft_scaled(y: ArrayLike, M: int) -> ArrayLike:
    """Unnormalized inverse branch FFT (= ifft·M), same backend knob as
    :func:`_branch_fft` (the synthesis bank's de-spin)."""
    mode = str(config.get("channelizer_fft", "mixed_radix")).lower()
    if mode in ("dft_bf16", "dft"):
        dre, dim = _dft_const_bf16(M)  # forward DFT; inverse = conj
        a16 = y.re.astype(jnp.bfloat16)
        b16 = y.im.astype(jnp.bfloat16)
        # (a+jb)·conj(D) = (a·Dre + b·Dim) + j(b·Dre − a·Dim)
        return CArray(
            jnp.matmul(a16, dre, preferred_element_type=jnp.float32)
            + jnp.matmul(b16, dim, preferred_element_type=jnp.float32),
            jnp.matmul(b16, dre, preferred_element_type=jnp.float32)
            - jnp.matmul(a16, dim, preferred_element_type=jnp.float32),
        )
    return ifft_c(y, axis=-1) * float(M)


def pfb_channelize(
    x: ArrayLike,
    branch_taps: ArrayLike,
    n_ch: int,
    state: Optional[ArrayLike] = None,
) -> Tuple[ArrayLike, ArrayLike]:
    """Critically-sampled M-channel analysis filter bank.

    x: chunk of ``R*M`` samples (CArray). branch_taps: [M, L] from
    :func:`analysis_branch_taps`. state: [M, L-1] branch history.
    Returns ``(state, y)`` with y: [R, M] — rows are channelized time steps,
    columns channels (channel k at center frequency k/M).
    """
    x = cplx.asarray(x)
    M = n_ch
    L = branch_taps.shape[-1]
    N = x.shape[-1]
    if N % M != 0:
        raise ValueError(f"chunk {N} not a multiple of n_ch {M}")
    R = N // M
    xb = cplx.apply1(lambda t: t.reshape(R, M).T, x)  # branch p gets x[rM+p]
    if state is None:
        state = cplx.zeros_like_shape(xb, (M, L - 1))
    ext = cplx.concat([state, xb], axis=-1)
    v = _branch_convs(ext, branch_taps)  # [M, R]
    new_state = ext[:, ext.shape[-1] - (L - 1) :]
    # FFT over the branch axis per time step (backend per config)
    y = _branch_fft(cplx.apply1(lambda t: t.T, v), M)
    return new_state, y


def pfb_synthesize(
    y: ArrayLike,
    branch_taps: ArrayLike,
    n_ch: int,
    state: Optional[ArrayLike] = None,
) -> Tuple[ArrayLike, ArrayLike]:
    """M-channel synthesis bank (transpose of :func:`pfb_channelize`).

    y: [R, M] channel samples; returns ``(state, x)`` with x: [R*M]
    wideband samples.
    """
    y = cplx.asarray(y)
    M = n_ch
    L = branch_taps.shape[-1]
    R = y.shape[0]
    u = _branch_ifft_scaled(y, M)  # [R, M] (ifft·M, backend per config)
    ub = cplx.apply1(lambda t: t.T, u)  # [M, R]
    if state is None:
        state = cplx.zeros_like_shape(ub, (M, L - 1))
    ext = cplx.concat([state, ub], axis=-1)
    xb = _branch_convs(ext, branch_taps)  # [M, R]
    new_state = ext[:, ext.shape[-1] - (L - 1) :]
    x = cplx.apply1(lambda t: t.T.reshape(R * M), xb)
    return new_state, x


# ---------------------------------------------------------------------------
# Arbitrary-rate polyphase resampler (pfb/arb_resampler.rs parity)
# ---------------------------------------------------------------------------


def arb_resampler_plan(rate_num: int, rate_den: int, n_filters: int, n_out: int):
    """Static gather plan for a rational-rate polyphase arb resampler.

    Output m consumes input at fractional position ``m · den/num``; the
    fractional part selects one of ``n_filters`` phases. Returns host
    arrays ``(input_index[n_out], phase_index[n_out])``.
    """
    m = np.arange(n_out, dtype=np.int64)
    pos = m * rate_den / rate_num
    idx = np.floor(pos).astype(np.int64)
    frac = pos - idx
    phase = np.floor(frac * n_filters).astype(np.int64) % n_filters
    return idx, phase


def arb_resample(
    x: ArrayLike,
    phase_taps: jax.Array,  # [P, L] per-phase filters (real)
    input_index: jax.Array,  # [n_out] static
    phase_index: jax.Array,  # [n_out] static
    state: Optional[ArrayLike] = None,
):
    """Apply an arbitrary-rate PFB resampler with a precomputed plan.

    ``y[..., m] = Σ_k phase_taps[phase[m], k] · x[..., input_index[m] − k]``.
    state: last L-1 input samples. Leading axes are batch.
    """
    x = cplx.asarray(x)
    P, L = phase_taps.shape
    if state is None:
        state = cplx.zeros_like_shape(x, x.shape[:-1] + (L - 1,))
    ext = cplx.concat([state, x], axis=-1)
    # window gather: ext[idx + j] = x[idx + j − (L−1)], so start = idx
    gather = jax.vmap(
        lambda s: cplx.apply1(
            lambda t: jax.lax.dynamic_slice_in_dim(t, s, L, axis=-1), ext
        )
    )
    win = gather(input_index)  # [n_out, ..., L] (n_out leads from vmap)
    taps = phase_taps[phase_index][..., ::-1]  # [n_out, L], newest first
    # broadcast taps across any batch axes between n_out and L
    n_batch = (win.ndim if not isinstance(win, CArray) else win.re.ndim) - 2
    taps = taps.reshape(taps.shape[:1] + (1,) * n_batch + taps.shape[1:])
    y = (win * taps).sum(axis=-1) if isinstance(win, CArray) else jnp.sum(
        win * taps, axis=-1
    )
    # vmap put n_out first; restore the batch-leading convention
    y = cplx.apply1(lambda t: jnp.moveaxis(t, 0, -1), y)
    new_state = ext[..., ext.shape[-1] - (L - 1) :]
    return new_state, y
