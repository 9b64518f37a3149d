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
