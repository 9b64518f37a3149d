"""Overlap-save halo exchange over a mesh axis.

This is the TPU-native form of the reference's "history" mechanism: a FIR
over an infinite stream keeps taps−1 samples of lookback (``fir.rs:70-75``
leaves them unconsumed; our serial blocks carry them as state). When a long
chunk is *time-sharded* across devices, each shard's lookback is the tail of
its left neighbor — one ``ppermute`` neighbor exchange per filter stage
(SURVEY.md §5 "long-context analogue"; the BASELINE metric measures this
exchange overhead).

All helpers run **inside** ``shard_map`` (they use collectives with
``axis_name``) and accept real arrays or CArrays.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from futuresdr_tpu.ops import cplx
from futuresdr_tpu.ops.cplx import ArrayLike


def halo_left(
    x: ArrayLike,
    h: int,
    axis_name: str,
    carry: Optional[ArrayLike] = None,
) -> ArrayLike:
    """Prepend the last ``h`` items (along the last axis) of the left
    neighbor's shard. Shard 0 gets ``carry`` (the previous step's global
    stream tail) or zeros. Returns ``[..., h + n]``."""
    if h == 0:
        return x
    if h > x.shape[-1]:
        raise ValueError(
            f"halo of {h} items exceeds the {x.shape[-1]}-item shard — "
            "use a larger per-shard chunk (one ppermute hop reaches only "
            "the immediate neighbor)"
        )
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    tail = x[..., x.shape[-1] - h :]
    if isinstance(tail, cplx.CArray):
        # one collective for both components (halves ICI message count)
        both = jax.lax.ppermute(
            jnp.stack([tail.re, tail.im]), axis_name, perm=perm
        )
        recv = cplx.CArray(both[0], both[1])
    else:
        recv = jax.lax.ppermute(tail, axis_name, perm=perm)
    idx = jax.lax.axis_index(axis_name)
    if carry is None:
        recv = cplx.apply1(
            lambda t: jnp.where(idx == 0, jnp.zeros_like(t), t), recv
        )
    else:
        def pick(r, c):
            return jnp.where(idx == 0, c, r)

        if isinstance(recv, cplx.CArray):
            recv = cplx.CArray(pick(recv.re, carry.re), pick(recv.im, carry.im))
        else:
            recv = pick(recv, carry)
    return cplx.concat([recv, x], axis=-1)


def ring_carry(x: ArrayLike, h: int, axis_name: str) -> ArrayLike:
    """Replicate the LAST shard's last ``h`` items to every shard — the
    next step's ``carry`` for :func:`halo_left` (cross-step stream
    continuity when the time axis wraps to the next chunk)."""
    if h > x.shape[-1]:
        raise ValueError(
            f"ring carry of {h} items exceeds the {x.shape[-1]}-item shard"
        )
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    tail = x[..., x.shape[-1] - h :]
    masked = cplx.apply1(
        lambda t: jnp.where(idx == n - 1, t, jnp.zeros_like(t)), tail
    )
    if isinstance(masked, cplx.CArray):
        both = jax.lax.psum(
            jnp.stack([masked.re, masked.im]), axis_name
        )
        return cplx.CArray(both[0], both[1])
    return jax.lax.psum(masked, axis_name)


def packed_stream_halo(tails, axis_name: str, carry):
    """ONE wrap-around ``ppermute`` for ALL of a step's overlap-save halos.

    The bank pipelines need several lookback halos per step (wideband FIR
    history, demod continuity, audio-FIR history). Exchanging each with its
    own :func:`halo_left` + a ``psum``-based :func:`ring_carry` costs 6
    collectives/step. This primitive collapses all of it into a single
    ppermute by exploiting two facts:

    * every halo a shard must *send* is computable from its **own** data
      (boundary tails), so they can be packed into one buffer up front;
    * the wrap-around edge ``n-1 → 0`` of the ppermute already delivers the
      global stream tail to shard 0 — which is exactly shard 0's halo for
      the **next** step. Storing the raw received buffer as the carry
      replaces every ``ring_carry`` psum with free state.

    Args:
      tails: list of same-dtype real arrays — this shard's boundary tails.
      carry: flat ``[K]`` array (K = total packed size) — the previous
        step's raw receive (only shard 0's local value is ever consumed;
        initialize with zeros = "stream starts from silence").

    Returns ``(received, new_carry)`` where ``received[i]`` has
    ``tails[i]``'s shape and holds the LEFT neighbor's tail (shard 0: the
    previous step's global tail from ``carry``), and ``new_carry`` is this
    step's raw ``[K]`` receive to feed back next step.
    """
    shapes = [t.shape for t in tails]
    sizes = [int(np.prod(s)) for s in shapes]
    dtypes = {jnp.asarray(t).dtype for t in tails} | {carry.dtype}
    if len(dtypes) != 1:
        # a mixed-dtype tail would silently promote through concatenate,
        # handing receivers promoted-dtype halos while callers hard-code
        # the carry dtype
        raise ValueError(
            f"packed_stream_halo tails/carry must share one dtype, got "
            f"{sorted(str(d) for d in dtypes)}"
        )
    buf = jnp.concatenate([t.reshape(-1) for t in tails])
    if carry.shape != buf.shape:
        raise ValueError(
            f"carry shape {carry.shape} != packed tails {buf.shape}"
        )
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    recv = jax.lax.ppermute(buf, axis_name, perm=perm)
    idx = jax.lax.axis_index(axis_name)
    used = jnp.where(idx == 0, carry, recv)
    received = []
    off = 0
    for s, sz in zip(shapes, sizes):
        received.append(used[off : off + sz].reshape(s))
        off += sz
    return received, recv


def halo_right(x: ArrayLike, h: int, axis_name: str) -> ArrayLike:
    """Append the first ``h`` items (along the last axis) of the RIGHT
    neighbor's shard; the last shard gets zeros. Returns ``[..., n + h]``.

    The mirror of :func:`halo_left`, for lookahead-shaped stages: frame
    receivers whose detection windows extend forward (a frame starting
    near a shard's end is decoded by the shard that owns its start, from
    neighbor samples)."""
    if h == 0:
        return x
    if h > x.shape[-1]:
        raise ValueError(
            f"halo of {h} items exceeds the {x.shape[-1]}-item shard"
        )
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i - 1) % n) for i in range(n)]
    head = x[..., :h]
    if isinstance(head, cplx.CArray):
        both = jax.lax.ppermute(
            jnp.stack([head.re, head.im]), axis_name, perm=perm
        )
        recv = cplx.CArray(both[0], both[1])
    else:
        recv = jax.lax.ppermute(head, axis_name, perm=perm)
    idx = jax.lax.axis_index(axis_name)
    recv = cplx.apply1(
        lambda t: jnp.where(idx == n - 1, jnp.zeros_like(t), t), recv
    )
    return cplx.concat([x, recv], axis=-1)
