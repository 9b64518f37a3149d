"""FIR filtering kernels for TPU.

Replaces the scalar MAC loops of ``crates/futuredsp/src/fir.rs:31-96`` and
``decimating_fir.rs`` / ``polyphase_resampling_fir.rs`` with XLA
convolutions that lower onto the MXU/VPU. Complex streams use the
:class:`~futuresdr_tpu.ops.cplx.CArray` (re, im) pair representation (this
TPU backend has no complex dtypes); complex×real is two real convs batched
together, complex×complex uses the [[hr,-hi],[hi,hr]] channel-mixing kernel.

Tap orientation matches the reference (``fir.rs:77-88``):
``out[k] = Σ_t in[k+t] · taps[T-1-t]`` — i.e. ``taps[0]`` multiplies the
*newest* sample; a length-``T`` filter over ``N`` inputs produces ``N-T+1``
outputs ("valid" convolution).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from futuresdr_tpu import config
from futuresdr_tpu.ops import cplx
from futuresdr_tpu.ops.cplx import CArray, ArrayLike


def _precision():
    p = config.get("precision", "highest")
    return {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }.get(str(p).lower(), jax.lax.Precision.HIGHEST)


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


def _reverse_last(x: ArrayLike) -> ArrayLike:
    return cplx.apply1(lambda t: t[..., ::-1], x)


# ---------------------------------------------------------------------------
# Banded-Toeplitz matmul FIR — the TPU-native formulation.
#
# XLA:TPU's conv lowering compiles pathologically for some 1-D spatial sizes
# (measured on-chip: a 131080-sample conv takes 238 s to compile vs 2 s for
# 131072), so the default FIR path avoids `conv_general_dilated` entirely:
# the signal is cut into frames of `bo` outputs via contiguous reshapes (no
# gather), and each frame multiplies a host-built banded Toeplitz tap matrix
# W[k·stride + t, k] = h[t] — one [nb, S+T−1] @ [S+T−1, bo] MXU matmul.
# FLOP overhead vs direct MACs is (S+T−1)/(stride·T) ≈ 1.2–2×, repaid by
# running on the MXU at full tilt with fast, shape-robust compilation.
# ---------------------------------------------------------------------------

_MM_BLOCK_OUT = 128  # outputs per frame (lane-width aligned)


def _is_tracer(taps: ArrayLike) -> bool:
    t = taps.re if isinstance(taps, CArray) else taps
    return isinstance(t, jax.core.Tracer)


def _toeplitz_w(h: np.ndarray, stride: int, bo: int) -> np.ndarray:
    """[S+T-1, bo] tap matrix, h = correlation kernel (reversed taps)."""
    T = len(h)
    S = bo * stride
    W = np.zeros((S + T - 1, bo), dtype=np.float32)
    for k in range(bo):
        W[k * stride : k * stride + T, k] = h
    return W


def _frames(x: jax.Array, S: int, T: int, nb: int) -> jax.Array:
    """[..., Ne] → [..., nb, S+T-1] overlapping frames via contiguous
    reshapes + concat (frame i starts at input offset i·S)."""
    K = 1 + -(-(T - 1) // S) if T > 1 else 1
    need = (nb + K - 1) * S
    pad = need - x.shape[-1]
    if pad > 0:
        x = jnp.concatenate(
            [x, jnp.zeros(x.shape[:-1] + (pad,), dtype=x.dtype)], axis=-1
        )
    parts = [
        x[..., j * S : j * S + nb * S].reshape(*x.shape[:-1], nb, S)
        for j in range(K)
    ]
    return jnp.concatenate(parts, axis=-1)[..., : S + T - 1]


# trace-time path counters (tests assert the matmul path engages — the
# conv lowering costs ~265 ms per 48-tap x 3.8 M-sample conv on v5e)
path_stats = {"matmul": 0, "conv": 0}


def _toeplitz_w_traced(h, stride: int, bo: int):
    """In-trace [S+T-1, bo] tap matrix from a *traced* 1-D correlation
    kernel ``h`` (reversed taps) — same layout as :func:`_toeplitz_w`.
    A [rows, bo] gather over T values: negligible next to the matmul it
    feeds, and it keeps runtime-param taps (``Fir(retunable=True)``) on
    the banded-Toeplitz MXU path instead of the ~276 ms XLA conv
    lowering."""
    T = h.shape[0]
    S = bo * stride
    k = (
        jnp.arange(S + T - 1)[:, None]
        - jnp.arange(bo)[None, :] * stride
    )
    valid = (k >= 0) & (k < T)
    return jnp.where(valid, h[jnp.clip(k, 0, T - 1)], jnp.zeros((), h.dtype))


def _conv_matmul(x: ArrayLike, taps: ArrayLike, stride: int) -> ArrayLike:
    """Matmul implementation of :func:`conv1d_valid` (same contract).
    Accepts concrete taps (host-built Toeplitz, the fast-compile path)
    or traced taps (in-trace Toeplitz gather, same MXU matmul)."""
    path_stats["matmul"] += 1
    T = taps.shape[0]
    Ne = x.shape[-1]
    M = (Ne - T) // stride + 1
    bo = _MM_BLOCK_OUT
    S = bo * stride
    nb = -(-M // bo)

    if _concrete_taps(taps) is not None:
        # host-side reversal + Toeplitz build (taps are constants)
        if isinstance(taps, CArray):
            hr = np.asarray(taps.re)[::-1]
            hi = np.asarray(taps.im)[::-1]
            W = CArray(
                jnp.asarray(_toeplitz_w(hr, stride, bo)),
                jnp.asarray(_toeplitz_w(hi, stride, bo)),
            )
        else:
            W = jnp.asarray(_toeplitz_w(np.asarray(taps)[::-1], stride, bo))
    elif isinstance(taps, CArray):
        W = CArray(
            _toeplitz_w_traced(taps.re[::-1], stride, bo),
            _toeplitz_w_traced(taps.im[::-1], stride, bo),
        )
    else:
        W = _toeplitz_w_traced(taps[::-1], stride, bo)

    fr = cplx.apply1(lambda t: _frames(t, S, T, nb), x)  # [..., nb, S+T-1]
    dt = str(config.get("fir_dtype", "float32")).lower()
    if dt in ("bf16", "bfloat16"):
        # same HBM-traffic trade as the branch einsum: bf16 operands,
        # f32 accumulation
        def mm16(a, b):
            return jnp.matmul(
                a.astype(jnp.bfloat16),
                b.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )

        if isinstance(fr, CArray) and isinstance(W, CArray):
            out = CArray(
                mm16(fr.re, W.re) - mm16(fr.im, W.im),
                mm16(fr.re, W.im) + mm16(fr.im, W.re),
            )
        elif isinstance(fr, CArray):
            out = CArray(mm16(fr.re, W), mm16(fr.im, W))
        elif isinstance(W, CArray):
            out = CArray(mm16(fr, W.re), mm16(fr, W.im))
        else:
            out = mm16(fr, W)
    else:
        out = cplx.matmul(fr, W, precision=_precision())  # [..., nb, bo]
    out = cplx.apply1(lambda t: t.reshape(*t.shape[:-2], nb * bo), out)
    return out[..., :M]


def _rev_taps_const(taps_b) -> ArrayLike:
    """[P, T] branch taps → time-reversed weights. Concrete taps reverse
    host-side (device constant); traced taps (runtime params) reverse
    in-trace — same downstream einsum either way."""
    if isinstance(taps_b, CArray):
        if _is_concrete(taps_b.re) and _is_concrete(taps_b.im):
            return CArray(
                jnp.asarray(
                    np.ascontiguousarray(np.asarray(taps_b.re)[:, ::-1])
                ),
                jnp.asarray(
                    np.ascontiguousarray(np.asarray(taps_b.im)[:, ::-1])
                ),
            )
        return CArray(taps_b.re[:, ::-1], taps_b.im[:, ::-1])
    if _is_concrete(taps_b) or isinstance(taps_b, (list, tuple, np.ndarray)):
        return jnp.asarray(np.ascontiguousarray(np.asarray(taps_b)[:, ::-1]))
    return taps_b[:, ::-1]


def _shift_stack(x: ArrayLike, T: int, M: int) -> ArrayLike:
    """[..., Ne] → [..., T, M] where view[..., t, n] = x[..., n+t]."""
    return cplx.apply1(
        lambda u: jnp.stack([u[..., t : t + M] for t in range(T)], axis=-2), x
    )


def conv1d_valid_branches(xb: ArrayLike, taps_b: ArrayLike) -> ArrayLike:
    """Per-branch FIR with per-branch inputs: xb [..., P, Ne] × taps_b
    [P, T] (concrete) → [..., P, M] (the PFB branch-filter workhorse).

    Branch filters are short (taps/channel), so a banded-Toeplitz matrix
    would be mostly zeros; instead a shift-stacked view feeds one einsum
    with exact FLOPs.

    ``fir_dtype = bfloat16`` (config) halves the HBM traffic of the
    shift-stacked view: measured 1.74× faster on v5e with channel
    isolation 70.5 dB (vs 93.5 f32; target 60) — a bandwidth-bound
    stage, so the win is the dtype, not the MXU."""
    xb = cplx.asarray(xb)
    T = taps_b.shape[-1]
    M = xb.shape[-1] - T + 1
    W = _rev_taps_const(taps_b)  # [P, T]
    dt = str(config.get("fir_dtype", "float32")).lower()
    if dt in ("bf16", "bfloat16") and not isinstance(W, CArray):
        w16 = W.astype(jnp.bfloat16)

        def ein(x):
            v = _shift_stack(x.astype(jnp.bfloat16), T, M)
            return jnp.einsum(
                "pt,...ptn->...pn",
                w16,
                v,
                preferred_element_type=jnp.float32,
            )

        return cplx.apply1(ein, xb)
    view = _shift_stack(xb, T, M)  # [..., P, T, M]
    return cplx.einsum("pt,...ptn->...pn", W, view, precision=_precision())


def conv1d_valid_branches_w(xb: ArrayLike, w_rev: ArrayLike) -> ArrayLike:
    """:func:`conv1d_valid_branches` with *pre-reversed, possibly traced*
    taps ``w_rev`` [P, T] (``w_rev[p, t]`` multiplies ``xb[p, n+t]``).

    Used where the taps arrive as a sharded ``shard_map`` operand (each
    device sees its branch slice) and so cannot be host-reversed inside
    the trace."""
    xb = cplx.asarray(xb)
    T = w_rev.shape[-1]
    M = xb.shape[-1] - T + 1
    view = _shift_stack(xb, T, M)  # [..., P, T, M]
    return cplx.einsum("pt,...ptn->...pn", w_rev, view, precision=_precision())


def conv1d_valid_shared(x: ArrayLike, taps_b: ArrayLike) -> ArrayLike:
    """Branch bank over a shared input: x [..., Ne] × taps_b [P, T]
    (concrete) → [..., P, M] (the polyphase-interpolator workhorse).
    One [P, T] @ [T, M] MXU matmul over the shift-stacked view."""
    x = cplx.asarray(x)
    T = taps_b.shape[-1]
    M = x.shape[-1] - T + 1
    W = _rev_taps_const(taps_b)  # [P, T]
    view = _shift_stack(x, T, M)  # [..., T, M]
    return cplx.einsum("pt,...tn->...pn", W, view, precision=_precision())


_MS_ROW = 4096  # moving_sum row length (lane-multiple)


def moving_sum(x: ArrayLike, w: int) -> ArrayLike:
    """Valid-mode sliding-window sum along the last axis, O(N) via rowwise
    cumsum: ``out[..., k] = Σ_{t<w} x[..., k+t]``, length ``N-w+1``.

    A moving sum is a conv with all-ones taps, but the Toeplitz-matmul FIR
    does O(N·T) work — measured 240–315 ms for a 48/64-wide sum over 3.8 M
    samples on v5e, versus ~0 (sub-RTT) for this form, with max error ~1e-6
    (the reason the WLAN sync front was the receiver's dominant cost).
    Cumsum runs per 4096-sample row, not globally, so f32 error is bounded
    by row-local prefix magnitudes rather than the whole stream's."""
    if w < 1:
        raise ValueError("window must be >= 1")
    x = cplx.asarray(x)
    if w - 1 > _MS_ROW:
        # fall back (windows beyond one row of overlap); not hit by
        # any current user (sync sums are 48/64, MovingAvg is small).
        # np taps, NOT jnp: in-trace jnp constants trace as Tracers in
        # this JAX version and would demote conv1d_valid to the
        # pathological XLA conv lowering (see conv1d_valid docstring)
        return conv1d_valid(x, np.ones(w, np.float32))

    def ms(u: jax.Array) -> jax.Array:
        n = u.shape[-1]
        if n < w:
            raise ValueError(f"chunk of {n} samples shorter than window {w}")
        nb = -(-n // _MS_ROW)
        pad = nb * _MS_ROW + w - 1 - n
        up = jnp.concatenate(
            [u, jnp.zeros(u.shape[:-1] + (pad,), u.dtype)], axis=-1
        )
        main = up[..., : nb * _MS_ROW].reshape(*u.shape[:-1], nb, _MS_ROW)
        # row i's overlap = first w-1 of row i+1; the last row's overlap
        # is zeros — exact, since up[nb*_MS_ROW:] is padding by
        # construction and outputs past n-w are sliced away
        ov = jnp.concatenate(
            [
                main[..., 1:, : w - 1],
                jnp.zeros(u.shape[:-1] + (1, w - 1), u.dtype),
            ],
            axis=-2,
        )
        rows = jnp.concatenate([main, ov], axis=-1)  # [nb, ROW+w-1]
        c = jnp.cumsum(rows, axis=-1)
        z = jnp.zeros(c.shape[:-1] + (1,), u.dtype)
        cc = jnp.concatenate([z, c], axis=-1)
        out = (cc[..., w : _MS_ROW + w] - cc[..., :_MS_ROW]).reshape(
            *u.shape[:-1], nb * _MS_ROW
        )
        return out[..., : n - w + 1]

    return cplx.apply1(ms, x)


def conv1d_valid(x: ArrayLike, taps: ArrayLike, stride: int = 1) -> ArrayLike:
    """Valid-mode FIR along the last axis; leading axes are batch.

    ``out[..., k] = Σ_t x[..., k*stride + t] · taps[T-1-t]``

    Real/complex (CArray) x × real/complex taps all supported; output is a
    CArray iff either input is complex. Output length ``(N-T)//stride + 1``.

    PERFORMANCE: pass taps as **host numpy** (or a jnp array built outside
    any jit trace). Concrete taps take the banded-Toeplitz MXU path;
    traced taps force the XLA conv lowering, which on TPU costs ~276 ms
    for 48 taps over 3.8 M samples where the matmul path is ~free — and
    ``jnp.ones(...)`` etc. *inside* a jit trace is a Tracer in this JAX
    version. For all-ones windows use :func:`moving_sum` (O(N)).
    """
    x = cplx.asarray(x)
    # Path decision on the ORIGINAL taps: cplx.asarray would jnp-ify host
    # numpy, and inside a jit trace that yields a Tracer — which silently
    # demoted every in-jit call (i.e. all production use) to the conv
    # path until measured on-chip (265 ms vs ~0 per 48-tap x 3.8 M conv).
    taps_c = _concrete_taps(taps)
    taps = cplx.asarray(taps)
    if len(taps.shape) != 1:
        raise ValueError("taps must be 1-D")
    T = taps.shape[0]
    N = x.shape[-1]
    if N < T:
        raise ValueError(f"chunk of {N} samples shorter than {T} taps")

    # Backends: "matmul" (banded-Toeplitz MXU, default) or "conv" (XLA
    # conv lowering). A Pallas VPU sliding-window FIR was tried and
    # removed: measured 1.8-4.7x slower than the Toeplitz matmul on v5e
    # (roll-per-tap VPU work vs one MXU matmul) — a hand-written kernel
    # can't beat XLA's own MXU mapping for a memory-bound generic FIR.
    # Pallas earns its keep where fusion crosses stage boundaries instead
    # (ops/pallas_bank.py: branch FIR + DFT + demod in one VMEM pass).
    backend = config.get("fir_backend", "matmul")
    if backend != "conv":
        # concrete taps: host-built Toeplitz; traced taps (runtime
        # params, e.g. Fir(retunable=True)): in-trace Toeplitz gather —
        # either way the conv itself is the banded-Toeplitz MXU matmul
        return _conv_matmul(x, taps_c if taps_c is not None else taps, stride)
    path_stats["conv"] += 1

    lead = x.shape[:-1]
    B = int(np.prod(lead)) if lead else 1

    h = _reverse_last(taps)  # correlation kernel = reversed taps
    cx, ct = isinstance(x, CArray), isinstance(taps, CArray)

    if not cx and not ct:
        lhs = x.reshape(B, 1, N)
        rhs = h.reshape(1, 1, T).astype(lhs.dtype)
        out = _conv_real(lhs, rhs, stride)[:, 0, :]
        return out.reshape(*lead, out.shape[-1])

    if cx and not ct:
        # complex signal, real taps: filter re/im as 2·B batch rows
        lhs = jnp.concatenate(
            [x.re.reshape(B, 1, N), x.im.reshape(B, 1, N)], axis=0
        )
        rhs = h.reshape(1, 1, T).astype(lhs.dtype)
        out = _conv_real(lhs, rhs, stride)[:, 0, :]
        M = out.shape[-1]
        return CArray(
            out[:B].reshape(*lead, M), out[B:].reshape(*lead, M)
        )

    hr = h.re if ct else h
    hi = h.im if ct else jnp.zeros_like(h)
    if cx:
        lhs = jnp.stack([x.re, x.im], axis=-2).reshape(B, 2, N)
        # out_r = xr⊛hr − xi⊛hi ; out_i = xr⊛hi + xi⊛hr
        rhs = jnp.stack(
            [jnp.stack([hr, -hi], axis=0), jnp.stack([hi, hr], axis=0)], axis=0
        )  # [2, 2, T]
    else:
        lhs = x.reshape(B, 1, N)
        rhs = jnp.stack([hr[None, :], hi[None, :]], axis=0)  # [2, 1, T]
    out = _conv_real(lhs, rhs.astype(lhs.dtype), stride)  # [B, 2, M]
    M = out.shape[-1]
    return CArray(out[:, 0, :].reshape(*lead, M), out[:, 1, :].reshape(*lead, M))


_TAPS_SPECTRUM_CACHE: dict = {}
_TAPS_SPECTRUM_CACHE_MAX = 64


def _is_concrete(t) -> bool:
    return isinstance(t, np.ndarray) or (
        isinstance(t, jax.Array) and not isinstance(t, jax.core.Tracer)
    )


def _concrete_taps(taps):
    """Original taps as host values if they are compile-time constants
    (numpy, a non-Tracer jax array, or a CArray of either), else None.
    Host taps let the Toeplitz tap matrix build at trace time."""
    if isinstance(taps, CArray):
        if _is_concrete(taps.re) and _is_concrete(taps.im):
            return CArray(np.asarray(taps.re), np.asarray(taps.im))
        return None
    if isinstance(taps, (list, tuple)):
        taps = np.asarray(taps)
    if _is_concrete(taps):
        arr = np.asarray(taps)
        if np.iscomplexobj(arr):
            return CArray(
                np.real(arr).astype(np.float32),
                np.imag(arr).astype(np.float32),
            )
        return arr
    return None


def _taps_spectrum(taps: ArrayLike, nfft: int) -> Optional[CArray]:
    """Host-precomputed DFT of the (static) taps, cached per (taps, nfft).

    Returns None when the taps are traced values (runtime params) — the
    caller then falls back to an on-device FFT. For the usual case of taps
    closed over as constants this removes the whole tap-FFT subgraph from
    the trace (faster compile, and no reliance on XLA constant folding)."""
    if isinstance(taps, CArray):
        if not (_is_concrete(taps.re) and _is_concrete(taps.im)):
            return None
        h = np.asarray(taps.re) + 1j * np.asarray(taps.im)
    else:
        if not _is_concrete(taps):
            return None
        h = np.asarray(taps).astype(np.complex128)
    key = (h.tobytes(), nfft)
    hit = _TAPS_SPECTRUM_CACHE.get(key)
    if hit is None:
        if len(_TAPS_SPECTRUM_CACHE) >= _TAPS_SPECTRUM_CACHE_MAX:
            _TAPS_SPECTRUM_CACHE.clear()
        spec = np.fft.fft(h.astype(np.complex128), nfft)
        hit = (
            spec.real.astype(np.float32),
            spec.imag.astype(np.float32),
        )
        _TAPS_SPECTRUM_CACHE[key] = hit
    return CArray(jnp.asarray(hit[0]), jnp.asarray(hit[1]))


def conv1d_valid_fft(x: ArrayLike, taps: ArrayLike, stride: int = 1) -> ArrayLike:
    """FFT fast-convolution variant of :func:`conv1d_valid` (long taps).

    One full-chunk matmul-FFT multiply; preferable once direct O(N·T) MACs
    exceed the FFT cost. The taps' spectrum is precomputed host-side and
    cached when the taps are compile-time constants (the usual case).
    """
    from futuresdr_tpu.ops.fft import fft_c, ifft_c

    x = cplx.asarray(x)
    taps_orig = taps  # spectrum cache needs pre-coercion concreteness
    taps = cplx.asarray(taps)
    was_real = not (isinstance(x, CArray) or isinstance(taps, CArray))
    T = taps.shape[0]
    N = x.shape[-1]
    M = N - T + 1
    # pad to a power of two: a prime-ish length would fall back to a full
    # O(N²) DFT matmul (an [N, N] constant!) in the mixed-radix FFT
    nfft = 1 << (N - 1).bit_length()
    xp = cplx.apply1(
        lambda t: jnp.concatenate(
            [t, jnp.zeros(t.shape[:-1] + (nfft - N,), dtype=t.dtype)], axis=-1
        ),
        x,
    )
    H = _taps_spectrum(taps_orig, nfft)
    if H is None:
        tp = taps
        if not isinstance(tp, CArray):
            tp = CArray(tp, jnp.zeros_like(tp))
        pad = cplx.apply1(
            lambda t: jnp.concatenate(
                [t, jnp.zeros(nfft - T, dtype=t.dtype)]
            ),
            tp,
        )
        H = fft_c(pad)
    X = fft_c(xp)
    y = ifft_c(X * H)[..., T - 1 : T - 1 + M]
    if stride > 1:
        y = y[..., ::stride]
    if was_real:
        return y.re
    return y


# Direct conv cost ~ N·T MACs; matmul-FFT ~ 4·Σradix per sample. The MXU
# makes direct conv extremely fast for small T, so the crossover is high.
_FFT_CROSSOVER_TAPS = 256


def _history(x: ArrayLike, ext: ArrayLike, h: int) -> ArrayLike:
    if h == 0:
        return cplx.zeros_like_shape(x, x.shape[:-1] + (0,))
    return ext[..., ext.shape[-1] - h :]


def fir_filter(x: ArrayLike, taps: ArrayLike, state: Optional[ArrayLike] = None):
    """Streaming 1:1 FIR: consumes N, produces N, carries T-1 history.

    ``state`` is the previous chunk's last ``T-1`` input samples (the
    reference keeps this implicitly by not consuming the input tail,
    ``fir.rs:70-75``; here history is explicit block state so chunk sizes
    stay rate-exact). Returns ``(new_state, y)``, ``y.shape == x.shape``.
    """
    x = cplx.asarray(x)
    # do NOT cplx.asarray the taps here: inside a jit trace that would
    # wrap host-constant taps in a Tracer and demote conv1d_valid to the
    # slow XLA conv path (see conv1d_valid docstring)
    if not hasattr(taps, "shape"):
        taps = np.asarray(taps)
    T = taps.shape[0]
    if state is None:
        state = cplx.zeros_like_shape(x, x.shape[:-1] + (T - 1,))
    ext = cplx.concat([state, x], axis=-1) if T > 1 else x
    if T >= _FFT_CROSSOVER_TAPS:
        y = conv1d_valid_fft(ext, taps)
    else:
        y = conv1d_valid(ext, taps)
    return _history(x, ext, T - 1), y


def fir_decimate(
    x: ArrayLike,
    taps: ArrayLike,
    decim: int,
    state: Optional[ArrayLike] = None,
    phase: int = 0,
):
    """Decimating FIR: consumes N (multiple of ``decim``), produces N/decim.

    Parity: ``futuredsp/src/decimating_fir.rs``. Output ``y[m]`` is the
    filter window ending at input index ``m·decim + phase``. ``phase``
    (0 ≤ phase < decim) re-anchors the decimation grid — the compiler sets
    it to ``upstream_latency mod decim`` so that, after trimming the
    leading transient, the sampled phases bit-match the reference's
    valid-stream composition."""
    x = cplx.asarray(x)
    if not hasattr(taps, "shape"):  # keep host taps host (see fir_filter)
        taps = np.asarray(taps)
    T = taps.shape[0]
    # history must keep windows aligned to multiples of decim
    H = -(-(T - 1) // decim) * decim if T > 1 else 0
    if T == 1 and phase:
        H = decim  # need lookback to reach the shifted grid
    if state is None:
        state = cplx.zeros_like_shape(x, x.shape[:-1] + (H,))
    ext = cplx.concat([state, x], axis=-1) if H > 0 else x
    off = H + phase - (T - 1)
    y = conv1d_valid(ext[..., off:], taps, stride=decim)
    n_out = x.shape[-1] // decim
    y = y[..., :n_out]
    return _history(x, ext, H), y


def fir_interpolate(
    x: ArrayLike, taps: ArrayLike, interp: int, state: Optional[ArrayLike] = None
):
    """Interpolating polyphase FIR: consumes N, produces N·interp."""
    return fir_resample_poly(x, taps, interp, 1, state)


def _polyphase_branches(taps: ArrayLike, interp: int) -> ArrayLike:
    """Split prototype taps into an [interp, ceil(T/interp)] branch matrix:
    ``branches[p, k] = taps[k·interp + p]`` — host-side (taps are concrete
    block constants, and the Toeplitz builder needs numpy values)."""
    T = taps.shape[0]
    L = -(-T // interp)

    def split(t):
        if _is_concrete(t) or isinstance(t, (np.ndarray, list, tuple)):
            # stays numpy: inside a trace jnp.asarray would wrap the
            # constant in a Tracer, and the Toeplitz builder needs host
            # values
            t = np.asarray(t)
            padded = np.concatenate(
                [t, np.zeros(L * interp - T, dtype=t.dtype)]
            )
            return np.ascontiguousarray(padded.reshape(L, interp).T)
        # traced taps (runtime params): same split in-trace
        padded = jnp.concatenate([t, jnp.zeros(L * interp - T, t.dtype)])
        return padded.reshape(L, interp).T

    return cplx.apply1(split, taps)


def fir_resample_poly(
    x: ArrayLike,
    taps: ArrayLike,
    interp: int,
    decim: int,
    state: Optional[ArrayLike] = None,
):
    """Rational P/Q polyphase resampler: consumes N (with N·interp % decim
    == 0), produces N·interp/decim.

    Parity: ``futuredsp/src/polyphase_resampling_fir.rs`` — prototype taps
    are partitioned into ``interp`` branches (``y[n·P+p] = Σ_k taps[kP+p]
    x[n−k]``); branches run as one batched conv and interleave into the
    output, which is then stride-sliced by ``decim``.
    """
    x = cplx.asarray(x)
    if not hasattr(taps, "shape"):  # keep host taps host (see fir_filter)
        taps = np.asarray(taps)
    if interp == 1 and decim == 1:
        return fir_filter(x, taps, state)
    if interp == 1:
        return fir_decimate(x, taps, decim, state)

    branches = _polyphase_branches(taps, interp)  # [P, L]
    P, L = branches.shape
    H = L - 1  # shared history in input samples
    if state is None:
        state = cplx.zeros_like_shape(x, x.shape[:-1] + (H,))
    ext = cplx.concat([state, x], axis=-1) if H > 0 else x

    N = x.shape[-1]
    # z_p[n] = Σ_k branches[p,k]·x[n−k]; all P branches share the input
    # frames and run as one batched MXU matmul.
    z = conv1d_valid_shared(ext, branches)  # [..., P, N]
    up = cplx.apply1(
        lambda t: jnp.moveaxis(t, -2, -1).reshape(*x.shape[:-1], N * P), z
    )
    n_out = (N * P) // decim
    y = up[..., : n_out * decim : decim]
    return _history(x, ext, H), y
