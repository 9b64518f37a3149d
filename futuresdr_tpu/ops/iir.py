"""IIR kernels via parallel (associative) scans.

Parity: ``crates/futuredsp/src/iir.rs``. A direct per-sample recursion would
serialize the TPU; instead the AR part ``y[n] = w[n] - Σ a_k y[n-k]`` is a
linear recurrence ``v[n] = C·v[n-1] + e0·w[n]`` (companion matrix C), which
``lax.associative_scan`` evaluates in O(log N) depth with fully vectorized
p×p combines. The MA part is an ordinary FIR (:mod:`futuresdr_tpu.ops.fir`).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from futuresdr_tpu.ops.fir import fir_filter


def linear_recurrence(A: jax.Array, u: jax.Array, v0: jax.Array) -> jax.Array:
    """Solve ``v[n] = A · v[n-1] + u[n]`` for all n in parallel.

    A: [p, p] constant; u: [N, p]; v0: [p] initial state (v[-1]).
    Returns v: [N, p].
    """
    N, p = u.shape
    As = jnp.broadcast_to(A, (N, p, p))

    def combine(left, right):
        Ma, ca = left
        Mb, cb = right
        M = jnp.einsum("...ij,...jk->...ik", Mb, Ma)
        c = jnp.einsum("...ij,...j->...i", Mb, ca) + cb
        return M, c

    Ms, cs = jax.lax.associative_scan(combine, (As, u))
    # v[n] = Ms[n] @ v0 + cs[n]
    return jnp.einsum("nij,j->ni", Ms, v0) + cs


def _companion(a_rest: jax.Array) -> jax.Array:
    """Companion matrix for y[n] = -Σ a_rest[k-1]·y[n-k]."""
    p = a_rest.shape[0]
    top = -a_rest.reshape(1, p)
    eye = jnp.eye(p, dtype=a_rest.dtype)[:-1, :]
    return jnp.concatenate([top, eye], axis=0)


def iir_apply(
    x: jax.Array,
    b: jax.Array,
    a: jax.Array,
    state: Optional[Tuple[jax.Array, jax.Array]] = None,
):
    """General IIR ``y[n] = Σ b_k x[n-k] − Σ_{k≥1} a_k y[n-k]`` (a[0]=1).

    Consumes N, produces N. ``state = (fir_history, y_history[p])`` where
    ``y_history = [y[-1], ..., y[-p]]``. Real f32 path (complex inputs can
    be filtered per re/im by linearity).
    """
    if isinstance(b, jax.core.Tracer) or isinstance(a, jax.core.Tracer):
        # taps traced as data (rare): normalize in-graph; the FIR stage
        # will take the conv lowering since the taps aren't constants
        b = jnp.asarray(b, dtype=jnp.float32)
        a = jnp.asarray(a, dtype=jnp.float32)
        if a.shape[0] < 1:
            raise ValueError("a must have at least a[0]")
        a0 = a[0]
        a = a / a0
        b = b / jnp.asarray(a0, dtype=b.dtype)
    else:
        # normalize in NUMPY: dividing with jnp inside a jit trace would
        # turn the taps into trace constants that older paths saw as
        # Tracers, demoting every jitted IIR's FIR stage to the XLA conv
        # lowering (~265 ms/call vs sub-ms Toeplitz matmul, fir.py notes)
        a_np = np.asarray(
            jax.device_get(a) if hasattr(a, "device") else a, np.float32
        )
        b_np = np.asarray(
            jax.device_get(b) if hasattr(b, "device") else b, np.float32
        )
        if a_np.shape[0] < 1:
            raise ValueError("a must have at least a[0]")
        # keep the taps as NUMPY: jnp.asarray inside a jit trace wraps
        # them as trace constants that _concrete_taps cannot see
        b = b_np / a_np[0]
        a = a_np / a_np[0]
    p = a.shape[0] - 1

    if state is None:
        fir_hist = jnp.zeros(x.shape[:-1] + (b.shape[0] - 1,), dtype=x.dtype)
        y_hist = jnp.zeros(x.shape[:-1] + (max(p, 1),), dtype=jnp.float32)
        state = (fir_hist, y_hist)
    fir_hist, y_hist = state

    fir_hist, w = fir_filter(x, b, fir_hist)
    if p == 0:
        return (fir_hist, y_hist), w

    if x.ndim != 1:
        # vmap the AR solve over leading axes
        flat_w = w.reshape(-1, w.shape[-1])
        flat_v0 = y_hist.reshape(-1, y_hist.shape[-1])
        ys = jax.vmap(lambda ww, vv: _ar_solve(ww, a[1:], vv))(flat_w, flat_v0)
        y = ys.reshape(w.shape)
        new_hist = _hist_from(y, y_hist, p).reshape(y_hist.shape)
    else:
        y = _ar_solve(w, a[1:], y_hist)
        new_hist = _hist_from(y, y_hist, p)
    return (fir_hist, new_hist), y


def _ar_solve(w: jax.Array, a_rest: jax.Array, y_hist: jax.Array) -> jax.Array:
    p = a_rest.shape[0]
    C = _companion(a_rest)
    u = jnp.concatenate(
        [w.reshape(-1, 1), jnp.zeros((w.shape[0], p - 1), dtype=w.dtype)], axis=1
    )
    # y_hist = [y[-1] ... y[-p]] is exactly the companion state vector v[-1]
    v = linear_recurrence(C, u.astype(jnp.float32), y_hist[:p].astype(jnp.float32))
    return v[:, 0].astype(w.dtype)


def _hist_from(y: jax.Array, old_hist: jax.Array, p: int) -> jax.Array:
    ext = jnp.concatenate([old_hist[..., ::-1], y], axis=-1)
    return ext[..., -p:][..., ::-1]


def biquad_apply(x, b0, b1, b2, a1, a2, state=None):
    """Single biquad section (direct form via the general path)."""
    coeffs = (b0, b1, b2, a1, a2)
    if any(isinstance(c, jax.core.Tracer) for c in coeffs):
        b = jnp.stack([jnp.asarray(b0), jnp.asarray(b1), jnp.asarray(b2)])
        a = jnp.stack(
            [jnp.ones((), dtype=jnp.float32), jnp.asarray(a1), jnp.asarray(a2)]
        )
    else:
        # numpy taps keep the FIR stage on the Toeplitz-matmul path when
        # this runs inside a jit trace (see iir_apply)
        b = np.array([b0, b1, b2], np.float32)
        a = np.array([1.0, a1, a2], np.float32)
    return iir_apply(x, b, a, state)


def single_pole_iir(x, alpha, state=None):
    """``y[n] = α·x[n] + (1-α)·y[n-1]`` — the MovingAvg/AGC smoother.

    Direct associative-scan path (cheaper than the companion form).
    """
    alpha = jnp.asarray(alpha, dtype=jnp.float32)
    if state is None:
        state = jnp.zeros(x.shape[:-1] + (1,), dtype=x.dtype)

    def combine(left, right):
        ga, ca = left
        gb, cb = right
        return ga * gb, ca * gb + cb

    N = x.shape[-1]
    gains = jnp.broadcast_to(1.0 - alpha, x.shape)
    _, y = jax.lax.associative_scan(
        combine, (gains, (alpha * x).astype(x.dtype)), axis=-1
    )
    # fold in initial condition: y[n] += (1-α)^{n+1} · y[-1]
    n = jnp.arange(N, dtype=jnp.float32)
    decay = jnp.power(1.0 - alpha, n + 1.0)
    y = y + decay * state[..., :1]
    return y[..., -1:], y
