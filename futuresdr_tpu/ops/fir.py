"""FIR filtering kernels for TPU.

Replaces the scalar MAC loops of ``crates/futuredsp/src/fir.rs:31-96`` and
``decimating_fir.rs`` / ``polyphase_resampling_fir.rs`` with XLA convolutions
that lower onto the MXU/VPU. Complex streams are computed as 2-channel real
convolutions (TPU convs are real-only); complex×complex uses the
[[hr,-hi],[hi,hr]] channel-mixing kernel (3-mult Karatsuba is bandwidth-bound
here, not worth it).

Tap orientation matches the reference (``fir.rs:77-88``):
``out[k] = Σ_t in[k+t] · taps[T-1-t]`` — i.e. ``taps[0]`` multiplies the
*newest* sample; a length-``T`` filter over ``N`` inputs produces ``N-T+1``
outputs ("valid" convolution).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from futuresdr_tpu import config


def _precision():
    p = config.get("precision", "highest")
    return {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }.get(str(p).lower(), jax.lax.Precision.HIGHEST)


def _is_complex(x) -> bool:
    return jnp.issubdtype(jnp.asarray(x).dtype, jnp.complexfloating)


def _real_dtype(x):
    return jnp.real(jnp.zeros((), dtype=jnp.asarray(x).dtype)).dtype


def _conv_real(lhs: jax.Array, rhs: jax.Array, stride: int) -> jax.Array:
    """Batched real 1-D valid correlation.

    lhs: [B, C, N], rhs: [O, C, T] → [B, O, (N-T)//stride + 1].
    """
    return jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(stride,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=_precision(),
    )


def conv1d_valid(x: jax.Array, taps: jax.Array, stride: int = 1) -> jax.Array:
    """Valid-mode FIR along the last axis; leading axes are batch.

    ``out[..., k] = Σ_t x[..., k*stride + t] · taps[T-1-t]``

    Real/complex x × real/complex taps all supported; output is complex iff
    either input is complex. Output length ``(N - T)//stride + 1``.
    """
    x = jnp.asarray(x)
    taps = jnp.asarray(taps)
    if taps.ndim != 1:
        raise ValueError("taps must be 1-D")
    T = taps.shape[0]
    N = x.shape[-1]
    if N < T:
        raise ValueError(f"chunk of {N} samples shorter than {T} taps")
    lead = x.shape[:-1]
    B = int(np.prod(lead)) if lead else 1
    rdt = _real_dtype(x)

    # correlation kernel = reversed taps
    h = taps[::-1]
    cx, ct = _is_complex(x), _is_complex(taps)

    if not cx and not ct:
        lhs = x.reshape(B, 1, N).astype(rdt)
        rhs = h.reshape(1, 1, T).astype(rdt)
        out = _conv_real(lhs, rhs, stride)[:, 0, :]
        return out.reshape(*lead, out.shape[-1])

    if cx and not ct:
        # complex signal, real taps: filter re/im as 2 batch rows
        xr = jnp.real(x).reshape(B, 1, N)
        xi = jnp.imag(x).reshape(B, 1, N)
        lhs = jnp.concatenate([xr, xi], axis=0).astype(rdt)
        rhs = h.reshape(1, 1, T).astype(rdt)
        out = _conv_real(lhs, rhs, stride)[:, 0, :]
        yr, yi = out[:B], out[B:]
        return (yr + 1j * yi).reshape(*lead, yr.shape[-1]).astype(x.dtype)

    # complex taps
    hr = jnp.real(h).astype(rdt)
    hi = jnp.imag(h).astype(rdt)
    if cx:
        lhs = jnp.stack([jnp.real(x), jnp.imag(x)], axis=-2).reshape(B, 2, N).astype(rdt)
        # rows: out_r = xr*hr - xi*hi ; out_i = xr*hi + xi*hr
        rhs = jnp.stack(
            [jnp.stack([hr, -hi], axis=0), jnp.stack([hi, hr], axis=0)], axis=0
        )  # [2, 2, T]
    else:
        lhs = x.reshape(B, 1, N).astype(rdt)
        rhs = jnp.stack([hr[None, :], hi[None, :]], axis=0)  # [2, 1, T]
    out = _conv_real(lhs, rhs, stride)  # [B, 2, M]
    y = out[:, 0, :] + 1j * out[:, 1, :]
    cdt = jnp.result_type(x.dtype, taps.dtype, jnp.complex64)
    return y.reshape(*lead, y.shape[-1]).astype(cdt)


def conv1d_valid_fft(x: jax.Array, taps: jax.Array, stride: int = 1) -> jax.Array:
    """FFT fast-convolution variant of :func:`conv1d_valid` (long taps).

    One full-chunk FFT multiply; preferable once ``T`` is large enough that
    O(N·T) direct MACs exceed O(N log N). Complex throughout.
    """
    x = jnp.asarray(x)
    taps = jnp.asarray(taps)
    T = taps.shape[0]
    N = x.shape[-1]
    M = N - T + 1
    n_fft = N
    cdt = jnp.result_type(x.dtype, taps.dtype, jnp.complex64)
    X = jnp.fft.fft(x.astype(cdt), n=n_fft, axis=-1)
    H = jnp.fft.fft(taps.astype(cdt), n=n_fft)
    y = jnp.fft.ifft(X * H, axis=-1)[..., T - 1 : T - 1 + M]
    if stride > 1:
        y = y[..., ::stride]
    if not (_is_complex(x) or _is_complex(taps)):
        y = jnp.real(y).astype(x.dtype)
    return y


# Direct conv cost ~ N*T MACs; FFT conv ~ c*N*log2(N). On the MXU the direct
# form is extremely fast for small T, so the crossover is set high.
_FFT_CROSSOVER_TAPS = 256


def fir_filter(x: jax.Array, taps: jax.Array, state: Optional[jax.Array] = None):
    """Streaming 1:1 FIR: consumes N, produces N, carries T-1 history.

    ``state`` is the previous chunk's last ``T-1`` input samples (the
    reference keeps this implicitly by not consuming the input tail,
    ``fir.rs:70-75``; here history is explicit block state so chunk sizes
    stay rate-exact).

    Returns ``(new_state, y)`` with ``y.shape == x.shape``.
    """
    taps = jnp.asarray(taps)
    T = taps.shape[0]
    if state is None:
        state = jnp.zeros(x.shape[:-1] + (T - 1,), dtype=x.dtype)
    ext = jnp.concatenate([state, x], axis=-1) if T > 1 else x
    if T >= _FFT_CROSSOVER_TAPS:
        y = conv1d_valid_fft(ext, taps)
    else:
        y = conv1d_valid(ext, taps)
    new_state = ext[..., ext.shape[-1] - (T - 1) :] if T > 1 else state
    return new_state, y


def fir_decimate(
    x: jax.Array, taps: jax.Array, decim: int, state: Optional[jax.Array] = None
):
    """Decimating FIR: consumes N (multiple of ``decim``), produces N/decim.

    Parity: ``futuredsp/src/decimating_fir.rs``. Output ``y[m]`` is the
    filter evaluated at input phase ``m*decim``.
    """
    taps = jnp.asarray(taps)
    T = taps.shape[0]
    # history must make the windowing land on multiples of decim:
    # keep H = ceil((T-1)/decim)*decim history samples
    H = -(-(T - 1) // decim) * decim if T > 1 else 0
    if state is None:
        state = jnp.zeros(x.shape[:-1] + (H,), dtype=x.dtype)
    ext = jnp.concatenate([state, x], axis=-1) if H > 0 else x
    # first output aligned so it consumes ext[H-(T-1) : H+1] → start offset
    off = H - (T - 1)
    y = conv1d_valid(ext[..., off:], taps, stride=decim)
    n_out = x.shape[-1] // decim
    y = y[..., :n_out]
    new_state = ext[..., ext.shape[-1] - H :] if H > 0 else state
    return new_state, y


def fir_interpolate(
    x: jax.Array, taps: jax.Array, interp: int, state: Optional[jax.Array] = None
):
    """Interpolating polyphase FIR: consumes N, produces N*interp.

    Polyphase decomposition: ``y[n*interp + p] = Σ_k h_p[k] x[n-k]`` with
    ``h_p[k] = taps[k*interp + p]``. Each branch is a small FIR over the
    same input; branches interleave into the output.
    """
    return fir_resample_poly(x, taps, interp, 1, state)


def _polyphase_branches(taps: jax.Array, interp: int) -> jax.Array:
    """Split prototype taps into [interp, ceil(T/interp)] branch matrix."""
    T = taps.shape[0]
    L = -(-T // interp)
    padded = jnp.concatenate([taps, jnp.zeros(L * interp - T, dtype=taps.dtype)])
    # branch p taps: taps[p], taps[p+interp], ... (newest-sample-first order
    # is handled inside conv1d_valid via the global reversal)
    return padded.reshape(L, interp).T  # [interp, L]


def fir_resample_poly(
    x: jax.Array,
    taps: jax.Array,
    interp: int,
    decim: int,
    state: Optional[jax.Array] = None,
):
    """Rational P/Q polyphase resampler: consumes N (N*interp % decim == 0),
    produces N*interp/decim.

    Parity: ``futuredsp/src/polyphase_resampling_fir.rs`` — prototype taps
    are partitioned into ``interp`` branches; output m takes branch
    ``(m*decim) % interp`` evaluated at input index ``(m*decim)//interp``.

    Implemented as ``interp`` parallel strided convs (one per branch, batched
    into a single grouped conv) followed by interleave + decimation slice.
    """
    x = jnp.asarray(x)
    taps = jnp.asarray(taps)
    if interp == 1 and decim == 1:
        return fir_filter(x, taps, state)
    if interp == 1:
        return fir_decimate(x, taps, decim, state)

    branches = _polyphase_branches(taps, interp)  # [P, L]
    P, L = branches.shape
    H = L - 1  # history in *input* samples shared by all branches
    if state is None:
        state = jnp.zeros(x.shape[:-1] + (H,), dtype=x.dtype)
    ext = jnp.concatenate([state, x], axis=-1) if H > 0 else x

    N = x.shape[-1]
    # Each branch p: z_p[n] = Σ_k branches[p,k] x[n-k]  (n = 0..N-1)
    # Compute all branches with one conv by stacking branch taps as output
    # channels. Complex handling reuses conv1d_valid per branch-matrix via
    # vmap over the branch axis (XLA fuses these into one conv when real).
    z = jax.vmap(lambda h: conv1d_valid(ext, h))(branches)  # [P, ..., N]
    # interleave: up[n*P + p] = z_p[n]
    up = jnp.moveaxis(z, 0, -1).reshape(*x.shape[:-1], N * P)
    n_out = (N * P) // decim
    y = up[..., : n_out * decim : decim]
    new_state = ext[..., ext.shape[-1] - H :] if H > 0 else state
    return new_state, y
