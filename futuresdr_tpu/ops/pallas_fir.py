"""Pallas FIR kernel: sliding-window MAC entirely in VMEM.

The default FIR backend (ops.fir) builds banded-Toeplitz frames that XLA
materializes through HBM; this kernel instead reads each sample tile into
VMEM once (plus a small lookback spill) and accumulates the T shifted
multiply-adds on the VPU — near the memory-bound optimum.

Real taps, stride 1 (the dominant case: channel filters, moving averages,
audio low-passes). Complex streams run re/im as a leading batch dim of
the same kernel. Select with ``config.set("fir_backend", "pallas")`` via
:func:`futuresdr_tpu.ops.fir.conv1d_valid`, or call
:func:`pallas_fir_valid` directly.

Layout: the stream is row-major [rows, 128]; each grid step owns ROWS
output rows and sees ``ROWS + spill`` input rows. The tap loop is
unrolled at trace time, so every shifted view is a pair of statically
sliced lane ranges — no dynamic lane indexing in the hot loop.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from futuresdr_tpu.ops import cplx
from futuresdr_tpu.ops.cplx import ArrayLike, CArray

LANES = 128
ROWS = 16  # output rows per grid step (tile = ROWS·128 samples)
TILE = ROWS * LANES


def _kernel(x_ref, w_ref, o_ref, *, taps: int):
    # x_ref: [B, 1, ROWS+spill, 128]; o_ref: [B, 1, ROWS, 128]
    # A lane-shifted view with row carry: roll both the row slab and the
    # next-row slab by −c lanes and select on lane index (Mosaic supports
    # roll natively; a (c:, :c) slice concat does not lower)
    from jax.experimental.pallas import tpu as pltpu

    x = x_ref[:, 0]
    b = x.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, ROWS, LANES), 2)
    acc = jnp.zeros((b, ROWS, LANES), jnp.float32)
    for t in range(taps):
        r, c = divmod(t, LANES)
        if c == 0:
            view = x[:, r : r + ROWS, :]
        else:
            a = pltpu.roll(x[:, r : r + ROWS, :], LANES - c, 2)
            nxt = pltpu.roll(x[:, r + 1 : r + 1 + ROWS, :], LANES - c, 2)
            view = jnp.where(lane < LANES - c, a, nxt)
        acc = acc + w_ref[0, t] * view
    o_ref[:, 0] = acc


@lru_cache(maxsize=None)
def _build(b: int, n_tiles: int, taps: int, spill_rows: int):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # CPU (tests / virtual mesh) has no Mosaic backend: interpret there
    interpret = jax.default_backend() != "tpu"
    in_rows = ROWS + spill_rows
    return pl.pallas_call(
        partial(_kernel, taps=taps),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (b, 1, in_rows, LANES),
                lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, taps), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (b, 1, ROWS, LANES),
            lambda i: (0, i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (b, n_tiles, ROWS, LANES), jnp.float32
        ),
        interpret=interpret,
    )


def _fir_flat(x: jax.Array, w_rev: jax.Array, m: int) -> jax.Array:
    """x: [B, Ne] f32 (Ne ≥ m+T−1), w_rev: [T] reversed taps → [B, m]."""
    b, ne = x.shape
    taps = w_rev.shape[0]
    n_tiles = -(-m // TILE)
    spill_rows = -(-(taps - 1) // LANES) + 1
    need = (n_tiles * ROWS + spill_rows) * LANES
    if ne < need:
        x = jnp.concatenate(
            [x, jnp.zeros((b, need - ne), jnp.float32)], axis=-1
        )
    rows_all = n_tiles * ROWS + spill_rows
    x3 = x[:, : rows_all * LANES].reshape(b, rows_all, LANES)
    # overlapping tiles: tile i = rows [i·ROWS, i·ROWS + ROWS + spill)
    a = x3[:, : n_tiles * ROWS].reshape(b, n_tiles, ROWS, LANES)
    tail = jnp.stack(
        [
            x3[:, ROWS + s : ROWS + s + n_tiles * ROWS : ROWS]
            for s in range(spill_rows)
        ],
        axis=2,
    )  # [b, n_tiles, spill_rows, 128]
    view = jnp.concatenate([a, tail], axis=2)  # [b, n_tiles, in_rows, 128]
    out = _build(b, n_tiles, taps, spill_rows)(view, w_rev[None, :])
    return out.reshape(b, n_tiles * TILE)[:, :m]


def pallas_fir_valid(x: ArrayLike, taps) -> ArrayLike:
    """Valid FIR (stride 1) with real taps via the Pallas kernel.

    Same contract as ``ops.fir.conv1d_valid``:
    ``out[k] = Σ_t x[k+t]·taps[T−1−t]``, output length ``Ne−T+1``."""
    x = cplx.asarray(x)
    w_rev = jnp.asarray(np.asarray(taps, dtype=np.float32)[::-1])
    T = w_rev.shape[0]
    ne = x.shape[-1]
    m = ne - T + 1
    lead = x.shape[:-1]

    def run(flat2d):
        return _fir_flat(flat2d, w_rev, m)

    if isinstance(x, CArray):
        stacked = jnp.concatenate(
            [x.re.reshape(-1, ne), x.im.reshape(-1, ne)], axis=0
        )
        out = run(stacked)
        half = out.shape[0] // 2
        return CArray(
            out[:half].reshape(*lead, m), out[half:].reshape(*lead, m)
        )
    flat = x.reshape(-1, ne)
    return run(flat).reshape(*lead, m)
