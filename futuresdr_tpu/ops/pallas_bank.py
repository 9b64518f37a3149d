"""Fused Pallas channelizer+demod kernel — the flagship bank's hot path.

One kernel per chunk computes, per 128-row time tile, entirely in VMEM:

  1. polyphase branch FIR   (VPU: L shifted FMAs, taps broadcast per lane)
  2. M-point DFT            (MXU: 4 bf16 [TR,M]@[M,M] matmuls, f32 accum)
  3. quadrature FM demod    (VPU: atan2 of y[r]·conj(y[r-1]))

and writes only the demodulated [R, M] block back to HBM. The unfused
pipeline (ops/pfb.py + ops/demod.py) round-trips every intermediate
([M,R] branch view, v, y, transposes) through HBM — measured stage split
branchFIR 46% / FFT 30% / demod 20% — where this kernel touches HBM once
for x and once for a.

Cross-tile recurrences (branch history rows, previous DFT row for demod)
ride VMEM scratch: TPU grid iterations execute sequentially, so scratch
written at tile i is visible at tile i+1 — the same trick the chunk-level
state uses across kernel calls via the hist/yprev operands.

Parity anchors: ``src/blocks/pfb/channelizer.rs:71-224`` (analysis bank),
``examples/fm-receiver/src/main.rs:100-105`` (quadrature demod).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# atan(z)/z on [0,1] as an even polynomial in z² (least-squares on
# Chebyshev nodes, max |err| 1.4e-8 rad — beyond f32). Pallas TPU has no
# atan2 lowering, so the kernel evaluates this + quadrant fixup on the VPU.
_ATAN_C = (
    9.999999938e-01,
    -3.333313797e-01,
    1.999369432e-01,
    -1.421110605e-01,
    1.066748690e-01,
    -7.556900202e-02,
    4.327824174e-02,
    -1.641319039e-02,
    2.932761936e-03,
)


def _atan2_poly(y, x):
    """atan2 built from |min/max| ratio + polynomial + quadrant fixup.

    Matches ``jnp.arctan2`` to 2.4e-7 rad everywhere except the signed-zero
    convention: atan2(±0, −0.0) here returns 0, not ±π. The only place a
    ±0/±0 product occurs is the very first demod sample of a stream
    (against a zero-initialized previous row) — a warm-up transient the
    flowgraph latency calculus trims anyway."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    mx = jnp.maximum(ax, ay)
    mn = jnp.minimum(ax, ay)
    z = mn / jnp.maximum(mx, jnp.float32(1e-30))
    u = z * z
    p = jnp.float32(_ATAN_C[-1])
    for c in _ATAN_C[-2::-1]:
        p = p * u + jnp.float32(c)
    r = z * p
    r = jnp.where(ay > ax, jnp.float32(np.pi / 2) - r, r)
    r = jnp.where(x < 0, jnp.float32(np.pi) - r, r)
    return jnp.where(y < 0, -r, r)


def _dft_bf16_np(n: int):
    """[n, n] DFT matrix as NumPy bf16 (one shared lru-cached builder —
    ops/pfb._dft_const_bf16 — so the two banks can never drift)."""
    from futuresdr_tpu.ops.pfb import _dft_const_bf16

    return _dft_const_bf16(n)


def _bank_kernel(
    # inputs
    xr_ref,  # [TR, M] f32  wideband rows (x.reshape(R, M) tile)
    xi_ref,
    hr_ref,  # [L-1, M] f32 branch history rows (chunk state)
    hi_ref,
    ypr_ref,  # [1, M] f32 previous DFT row (chunk state)
    ypi_ref,
    w_ref,  # [L, M] f32 reversed branch taps, row s multiplies ext[r+s]
    dre_ref,  # [M, M] bf16 DFT real
    dim_ref,  # [M, M] bf16 DFT imag
    # outputs
    a_ref,  # [TR, M] f32 demodulated
    hor_ref,  # [L-1, M] f32 next-chunk branch history
    hoi_ref,
    yor_ref,  # [1, M] f32 next-chunk previous DFT row
    yoi_ref,
    # scratch
    sxr,  # [L-1, M] carried branch history between tiles
    sxi,
    syr,  # [1, M] carried DFT row between tiles
    syi,
    *,
    L: int,
    TR: int,
    gain: float,
):
    i = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    @pl.when(i == 0)
    def _():
        sxr[:] = hr_ref[:]
        sxi[:] = hi_ref[:]
        syr[:] = ypr_ref[:]
        syi[:] = ypi_ref[:]

    ext_r = jnp.concatenate([sxr[:], xr_ref[:]], axis=0)  # [TR+L-1, M]
    ext_i = jnp.concatenate([sxi[:], xi_ref[:]], axis=0)

    # 1. branch FIR: v[r, p] = sum_s w[s, p] * ext[r+s, p]
    v_r = w_ref[0, :] * ext_r[0:TR, :]
    v_i = w_ref[0, :] * ext_i[0:TR, :]
    for s in range(1, L):
        v_r = v_r + w_ref[s, :] * ext_r[s : s + TR, :]
        v_i = v_i + w_ref[s, :] * ext_i[s : s + TR, :]

    # 2. DFT across the branch axis (4 bf16 matmuls, f32 accumulation)
    vr16 = v_r.astype(jnp.bfloat16)
    vi16 = v_i.astype(jnp.bfloat16)
    y_r = jnp.dot(
        vr16, dre_ref[:], preferred_element_type=jnp.float32
    ) - jnp.dot(vi16, dim_ref[:], preferred_element_type=jnp.float32)
    y_i = jnp.dot(
        vr16, dim_ref[:], preferred_element_type=jnp.float32
    ) + jnp.dot(vi16, dre_ref[:], preferred_element_type=jnp.float32)

    # 3. quadrature demod vs the previous row (cross-tile via scratch)
    p_r = jnp.concatenate([syr[:], y_r[: TR - 1, :]], axis=0)
    p_i = jnp.concatenate([syi[:], y_i[: TR - 1, :]], axis=0)
    d_r = y_r * p_r + y_i * p_i
    d_i = y_i * p_r - y_r * p_i
    a_ref[:] = jnp.float32(gain) * _atan2_poly(d_i, d_r)

    # carry the recurrences to the next tile
    sxr[:] = ext_r[TR : TR + L - 1, :]
    sxi[:] = ext_i[TR : TR + L - 1, :]
    syr[:] = y_r[TR - 1 :, :]
    syi[:] = y_i[TR - 1 :, :]

    @pl.when(i == n_tiles - 1)
    def _():
        hor_ref[:] = sxr[:]
        hoi_ref[:] = sxi[:]
        yor_ref[:] = syr[:]
        yoi_ref[:] = syi[:]


def _dft_demod_kernel(
    vr_ref,  # [TR, M] f32  branch-filtered rows (post all_gather)
    vi_ref,
    ypr_ref,  # [1, Mc] f32 previous DFT row (local channels)
    ypi_ref,
    dre_ref,  # [M, Mc] bf16 DFT column slice (this device's channels)
    dim_ref,
    a_ref,  # [TR, Mc] f32 demodulated out
    syr,  # [1, Mc] carried DFT row between tiles
    syi,
    *,
    TR: int,
    gain: float,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        syr[:] = ypr_ref[:]
        syi[:] = ypi_ref[:]

    vr16 = vr_ref[:].astype(jnp.bfloat16)
    vi16 = vi_ref[:].astype(jnp.bfloat16)
    y_r = jnp.dot(
        vr16, dre_ref[:], preferred_element_type=jnp.float32
    ) - jnp.dot(vi16, dim_ref[:], preferred_element_type=jnp.float32)
    y_i = jnp.dot(
        vr16, dim_ref[:], preferred_element_type=jnp.float32
    ) + jnp.dot(vi16, dre_ref[:], preferred_element_type=jnp.float32)
    p_r = jnp.concatenate([syr[:], y_r[: TR - 1, :]], axis=0)
    p_i = jnp.concatenate([syi[:], y_i[: TR - 1, :]], axis=0)
    d_r = y_r * p_r + y_i * p_i
    d_i = y_i * p_r - y_r * p_i
    a_ref[:] = jnp.float32(gain) * _atan2_poly(d_i, d_r)
    syr[:] = y_r[TR - 1 :, :]
    syi[:] = y_i[TR - 1 :, :]


@partial(jax.jit, static_argnames=("tile_rows", "gain", "interpret"))
def fused_dft_demod(
    v_re,  # [R, M] f32
    v_im,
    yprev_re,  # [1, Mc] f32
    yprev_im,
    dft_re,  # [M, Mc] bf16 column slice
    dft_im,
    *,
    tile_rows: int = 128,
    gain: float = 1.0,
    interpret: bool = False,
):
    """DFT-row-slice + quadrature demod for the partial-DFT sharded bank:
    the branch FIR runs branch-sharded outside (one all_gather
    re-assembles v), then this kernel keeps the [TR,M]@[M,Mc] partial DFT
    and the demod in VMEM. Returns ``a [R, Mc] f32``."""
    R, M = v_re.shape
    Mc = dft_re.shape[-1]
    TR = tile_rows
    if R % TR:
        raise ValueError(f"R={R} must be a multiple of tile_rows={TR}")
    kern = partial(_dft_demod_kernel, TR=TR, gain=float(gain))
    full = lambda *_: (0, 0)  # noqa: E731
    return pl.pallas_call(
        kern,
        grid=(R // TR,),
        in_specs=[
            pl.BlockSpec((TR, M), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, M), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mc), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Mc), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((M, Mc), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((M, Mc), full, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TR, Mc), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((R, Mc), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, Mc), jnp.float32),
            pltpu.VMEM((1, Mc), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * R * M * Mc,
            bytes_accessed=(2 * R * M + R * Mc) * 4 + 2 * M * Mc * 2,
            transcendentals=R * Mc,
        ),
        interpret=interpret,
    )(v_re, v_im, yprev_re, yprev_im, dft_re, dft_im)


@partial(
    jax.jit, static_argnames=("L", "tile_rows", "gain", "interpret")
)
def fused_bank_demod(
    xt_re,  # [R, M] f32
    xt_im,
    hist_re,  # [L-1, M] f32
    hist_im,
    yprev_re,  # [1, M] f32
    yprev_im,
    w_rev,  # [L, M] f32
    dft_re,  # [M, M] bf16
    dft_im,
    *,
    L: int,
    tile_rows: int = 128,
    gain: float = 1.0,
    interpret: bool = False,
):
    """Run the fused channelizer+demod over a [R, M] chunk.

    Returns ``(a [R, M] f32, hist' [L-1, M]×2, yprev' [1, M]×2)``."""
    R, M = xt_re.shape
    TR = tile_rows
    if R % TR:
        raise ValueError(f"R={R} must be a multiple of tile_rows={TR}")
    grid = (R // TR,)
    kern = partial(_bank_kernel, L=L, TR=TR, gain=float(gain))
    full = lambda *_: (0, 0)  # noqa: E731  (whole-array block each tile)
    out_shape = (
        jax.ShapeDtypeStruct((R, M), jnp.float32),  # a
        jax.ShapeDtypeStruct((L - 1, M), jnp.float32),  # hist re
        jax.ShapeDtypeStruct((L - 1, M), jnp.float32),  # hist im
        jax.ShapeDtypeStruct((1, M), jnp.float32),  # yprev re
        jax.ShapeDtypeStruct((1, M), jnp.float32),  # yprev im
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TR, M), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, M), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L - 1, M), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((L - 1, M), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((L, M), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((M, M), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((M, M), full, memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TR, M), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L - 1, M), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((L - 1, M), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M), full, memory_space=pltpu.VMEM),
        ),
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((L - 1, M), jnp.float32),
            pltpu.VMEM((L - 1, M), jnp.float32),
            pltpu.VMEM((1, M), jnp.float32),
            pltpu.VMEM((1, M), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * 2 * R * M * M + 2 * L * R * M,
            bytes_accessed=(2 * R * M + R * M) * 4 + 2 * M * M * 2,
            transcendentals=R * M,
        ),
        interpret=interpret,
    )(
        xt_re,
        xt_im,
        hist_re,
        hist_im,
        yprev_re,
        yprev_im,
        w_rev,
        dft_re,
        dft_im,
    )
