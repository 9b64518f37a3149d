"""1024-channel polyphase channelizer + parallel FM demod bank.

The BASELINE.json headline config: a wideband IQ stream is split into
``n_ch`` channels by a critically-sampled PFB (``pfb/channelizer.rs``
parity), every channel is FM-demodulated in parallel
(``examples/fm-receiver`` math), and each audio stream is low-pass
decimated. On TPU this is three batched kernels per chunk — branch-FIR
matmul + batched matmul-FFT, vectorized quadrature demod, batched
decimating FIR — everything on the MXU/VPU; the fused Pallas variant
(:mod:`futuresdr_tpu.ops.pallas_bank`) keeps all three stages in VMEM.

Multi-chip: the chunk is **time-sharded** over a mesh axis with exactly
serial semantics. All of a step's overlap-save halos (PFB branch history,
demod continuity, audio-FIR history) ride ONE wrap-around ``ppermute``
(:func:`futuresdr_tpu.parallel.halo.packed_stream_halo`): each shard
recomputes its boundary tail samples locally from its own data, packs them
into a single buffer, and the collective's ``n-1 → 0`` wrap edge doubles
as the cross-chunk stream carry — no ``psum`` ring carries at all. The
demod-continuity halo is eliminated outright: the previous channelized
sample is re-derived on the receiving shard from L wideband halo rows
(one [1, M] DFT — cheaper than a second collective).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from futuresdr_tpu.blocks.pfb import default_channelizer_taps
from futuresdr_tpu.dsp import firdes
from futuresdr_tpu.ops import cplx
from futuresdr_tpu.ops.cplx import CArray
from futuresdr_tpu.ops.demod import quadrature_demod
from futuresdr_tpu.ops.fir import conv1d_valid_branches, fir_decimate
from futuresdr_tpu.ops.pfb import (
    _branch_fft,
    analysis_branch_taps,
    pfb_channelize,
)
from futuresdr_tpu.parallel.halo import packed_stream_halo


@dataclass(frozen=True)
class BankConfig:
    n_ch: int = 1024
    taps_per_ch: int = 8
    audio_decim: int = 8
    audio_taps: int = 32
    demod_gain: float = 1.0


def _design(cfg: BankConfig):
    proto = default_channelizer_taps(cfg.n_ch, cfg.taps_per_ch)
    branch = jnp.asarray(
        analysis_branch_taps(proto, cfg.n_ch).astype(np.float32)
    )
    from futuresdr_tpu.dsp import windows

    win = windows.hamming(cfg.audio_taps)
    audio = jnp.asarray(
        firdes.lowpass(0.4 / cfg.audio_decim, win).astype(np.float32)
    )
    return branch, audio


def _audio_ha(cfg: BankConfig) -> int:
    return -(-(cfg.audio_taps - 1) // cfg.audio_decim) * cfg.audio_decim


def make_bank_step(cfg: BankConfig = BankConfig()):
    """Single-chip step.

    Returns ``(init_state, step)`` with
    ``step(state, x) -> (state, audio)``; ``x`` is a CArray of
    ``R·n_ch`` wideband IQ samples (R a multiple of ``audio_decim``),
    ``audio`` is ``[n_ch, R/audio_decim]`` float32.
    """
    branch_taps, audio_taps = _design(cfg)
    M, L = cfg.n_ch, int(branch_taps.shape[-1])
    Ha = _audio_ha(cfg)

    def init_state():
        return (
            cplx.czeros((M, L - 1)),  # PFB branch history
            cplx.czeros((M, 1)),  # demod last sample per channel
            jnp.zeros((M, Ha), jnp.float32),  # audio FIR history
        )

    def step(state, x: CArray):
        _validate_step_chunk(x.shape[-1], M, cfg.audio_decim)
        pfb_st, last, ah = state
        pfb_st, y = pfb_channelize(x, branch_taps, M, pfb_st)  # [R, M]
        z = cplx.apply1(lambda t: t.T, y)  # [M, R]
        last, a = quadrature_demod(z, last, cfg.demod_gain)  # [M, R] f32
        ah, audio = fir_decimate(a, audio_taps, cfg.audio_decim, ah)
        return (pfb_st, last, ah), audio

    return init_state, step


# ---------------------------------------------------------------------------
# Sharded variants — boundary-tail recompute + ONE packed ppermute per step
# ---------------------------------------------------------------------------


def _validate_step_chunk(n: int, M: int, decim: int) -> None:
    """Single-chip steps need the same chunk contract the sharded
    variants enforce: a non-multiple of n_ch·audio_decim would
    permanently desync the audio decimation grid at the chunk seam
    (window spacing jumps mid-stream) with no error."""
    if n % (M * decim):
        raise ValueError(
            f"chunk of {n} samples must be a multiple of "
            f"n_ch·audio_decim = {M * decim} (otherwise the audio "
            "decimation grid silently desyncs at chunk seams)"
        )


def _validate_shard_chunk(n_loc: int, M: int, decim: int, min_rows: int):
    r_loc = n_loc // M
    if n_loc % M or r_loc % decim:
        raise ValueError(
            f"per-shard chunk of {n_loc} samples must be a multiple of "
            f"n_ch·audio_decim = {M * decim} (otherwise decimation grids "
            "silently desync across shards)"
        )
    if r_loc < min_rows:
        raise ValueError(
            f"per-shard chunk of {r_loc} channelized rows is too small: "
            f"the boundary-tail recompute window needs Ha+L = {min_rows} "
            "rows of local data (use a larger chunk or fewer time shards)"
        )
    return r_loc


def _boundary_tails_einsum(x: CArray, branch_taps, M, L, Ha, gain):
    """This shard's boundary tails, recomputed locally with the einsum
    pipeline's exact ops: the last ``L`` wideband rows (flat ``[L·M]``
    CArray) and the last ``Ha`` demod samples per channel ``[M, Ha]``."""
    n = x.shape[-1]
    tail = x[..., n - (Ha + L) * M :]
    tb = cplx.apply1(lambda t: t.reshape(Ha + L, M).T, tail)  # [M, Ha+L]
    v_b = conv1d_valid_branches(tb, branch_taps)  # [M, Ha+1]
    y_b = _branch_fft(cplx.apply1(lambda t: t.T, v_b), M)  # [Ha+1, M]
    z_b = cplx.apply1(lambda t: t.T, y_b)  # [M, Ha+1]
    _, a_b = quadrature_demod(z_b[..., 1:], z_b[..., :1], gain)  # [M, Ha]
    return x[..., n - L * M :], a_b, v_b


def _halo_front_einsum(hw: CArray, branch_taps, M, L):
    """Receiver-side: PFB branch history ``[M, L-1]`` and the previous
    channelized sample ``[M, 1]`` from ``L`` wideband halo rows."""
    hb = cplx.apply1(lambda t: t.reshape(L, M).T, hw)  # [M, L]
    hist = hb[..., 1:]  # rows g0-L+1 .. g0-1
    v_prev = conv1d_valid_branches(hb, branch_taps)  # [M, 1]
    y_prev = _branch_fft(cplx.apply1(lambda t: t.T, v_prev), M)  # [1, M]
    z_prev = cplx.apply1(lambda t: t.T, y_prev)  # [M, 1]
    return hist, z_prev, v_prev


def make_sharded_bank_step(
    cfg: BankConfig,
    mesh,
    axis: str = "time",
):
    """Time-sharded step over ``mesh[axis]``.

    ``step(carry, x)``: ``x`` is the full wideband chunk, sharded on its
    (only) sample axis; ``carry`` is the ``[n_shards, K]`` packed-halo
    buffer (opaque — initialize with ``init_carry()``). Audio comes back
    sharded on the channel-time axis.

    One ``ppermute`` per step carries every halo (see module docstring);
    its wrap edge is the cross-chunk carry. Per-shard chunks must be at
    least ``Ha + L`` channelized rows so each shard can recompute its
    boundary tails locally.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    branch_taps, audio_taps = _design(cfg)
    M, L = cfg.n_ch, int(branch_taps.shape[-1])
    Ha = _audio_ha(cfg)
    n_t = mesh.shape[axis]
    K = 2 * L * M + M * Ha

    def init_carry():
        return jnp.zeros((n_t, K), jnp.float32)

    def shard_fn(carry, x):
        _validate_shard_chunk(x.shape[-1], M, cfg.audio_decim, Ha + L)
        w_tail, a_b, _ = _boundary_tails_einsum(
            x, branch_taps, M, L, Ha, cfg.demod_gain
        )
        (hw_re, hw_im, a_halo), new_carry = packed_stream_halo(
            [w_tail.re, w_tail.im, a_b], axis, carry.reshape(-1)
        )
        hist, z_prev, _ = _halo_front_einsum(
            CArray(hw_re, hw_im), branch_taps, M, L
        )
        _, y = pfb_channelize(x, branch_taps, M, hist)  # [R_loc, M]
        z = cplx.apply1(lambda t: t.T, y)  # [M, R_loc]
        _, a = quadrature_demod(z, z_prev, cfg.demod_gain)
        _, audio = fir_decimate(a, audio_taps, cfg.audio_decim, a_halo)
        return new_carry.reshape(1, K), audio

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=(P(axis, None), P(None, axis)),
        check_vma=False,
    )
    return init_carry, fn


def make_sharded_bank_step_2d(
    cfg: BankConfig,
    mesh,
    ch_axis: str = "ch",
    time_axis: str = "time",
):
    """Channels × time 2D-mesh step (the BASELINE "channels sharded
    across chips" axis combined with time sharding).

    Layout: the wideband chunk is sharded over ``time`` and replicated
    over ``ch``; each device channelizes its time slice (replicated over
    the channel axis — zero-communication redundancy, see the partial-DFT
    variant for the sharding that removes it) and then keeps only its
    ``n_ch / C`` channels for the per-channel demod + audio FIR. All halos
    ride one packed ``ppermute`` over the time axis; the audio tail each
    device sends is pre-sliced to its receiver's channels (same ``ch``
    coordinate along a time ring). Audio returns sharded over (ch, time).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    branch_taps, audio_taps = _design(cfg)
    M, L = cfg.n_ch, int(branch_taps.shape[-1])
    Ha = _audio_ha(cfg)
    C = mesh.shape[ch_axis]
    n_t = mesh.shape[time_axis]
    if M % C:
        raise ValueError(f"n_ch {M} not divisible by {C} channel shards")
    Mc = M // C
    K = 2 * L * M + Mc * Ha

    def init_carry():
        return jnp.zeros((C, n_t, K), jnp.float32)

    def shard_fn(carry, x):
        _validate_shard_chunk(x.shape[-1], M, cfg.audio_decim, Ha + L)
        ci = jax.lax.axis_index(ch_axis)
        w_tail, a_b_full, _ = _boundary_tails_einsum(
            x, branch_taps, M, L, Ha, cfg.demod_gain
        )
        a_b = jax.lax.dynamic_slice_in_dim(a_b_full, ci * Mc, Mc, axis=0)
        (hw_re, hw_im, a_halo), new_carry = packed_stream_halo(
            [w_tail.re, w_tail.im, a_b], time_axis, carry.reshape(-1)
        )
        hist, z_prev_full, _ = _halo_front_einsum(
            CArray(hw_re, hw_im), branch_taps, M, L
        )
        z_prev = cplx.apply1(
            lambda t: jax.lax.dynamic_slice_in_dim(t, ci * Mc, Mc, axis=0),
            z_prev_full,
        )
        _, y = pfb_channelize(x, branch_taps, M, hist)  # [R_loc, M]
        yc = cplx.apply1(
            lambda t: jax.lax.dynamic_slice_in_dim(t, ci * Mc, Mc, axis=1),
            y,
        )
        z = cplx.apply1(lambda t: t.T, yc)  # [Mc, R_loc]
        _, a = quadrature_demod(z, z_prev, cfg.demod_gain)
        _, audio = fir_decimate(a, audio_taps, cfg.audio_decim, a_halo)
        return new_carry.reshape(1, 1, K), audio

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(ch_axis, time_axis, None), P(time_axis)),
        out_specs=(P(ch_axis, time_axis, None), P(ch_axis, time_axis)),
        check_vma=False,
    )
    return init_carry, fn


def make_sharded_bank_step_2d_partial(
    cfg: BankConfig,
    mesh,
    ch_axis: str = "ch",
    time_axis: str = "time",
):
    """Channels × time 2D-mesh step **without** the replicated-channelizer
    redundancy of :func:`make_sharded_bank_step_2d`.

    Each device filters only its ``M/C`` polyphase *branches* (branch taps
    arrive as a ``P(ch, None)``-sharded operand), the branch signals are
    re-assembled with one ``all_gather`` over the channel axis, and the
    length-M FFT is replaced by that device's ``[M/C, M]`` row-slice of
    the DFT matrix — one dense MXU matmul producing exactly the local
    channels. Per-device channelizer FLOPs drop by C on the branch FIR;
    the DFT becomes M²/C MACs/step. Time halos ride one packed
    ``ppermute`` exactly as in the 1D variant (boundary demod tails are
    re-derived with this variant's own DFT-row math so the audio FIR
    state matches what the neighbor itself would compute)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from futuresdr_tpu.ops.fft import _PREC
    from futuresdr_tpu.ops.fir import conv1d_valid_branches_w

    branch_taps, audio_taps = _design(cfg)
    M, L = cfg.n_ch, int(branch_taps.shape[-1])
    Ha = _audio_ha(cfg)
    C = mesh.shape[ch_axis]
    n_t = mesh.shape[time_axis]
    if M % C:
        raise ValueError(f"n_ch {M} not divisible by {C} channel shards")
    Mc = M // C
    K = 2 * L * M + Mc * Ha

    # host-built operands, committed PRE-SHARDED onto the mesh (row
    # slices over the channel axis): a NamedSharding device_put works
    # identically on a single-process mesh and under jax.distributed,
    # where a plain jnp.asarray would be a local-only array that cannot
    # cross into a multi-process shard_map
    from jax.sharding import NamedSharding

    row_spec = NamedSharding(mesh, P(ch_axis, None))
    bt = np.asarray(branch_taps)
    # full replicated reversed taps: a trace-time CONSTANT used by the
    # boundary recompute (shard_map closures must not capture the
    # sharded operand below — multi-process meshes would have to
    # reshard it)
    w_full = np.ascontiguousarray(bt[:, ::-1]).astype(np.float32)
    w_rev = jax.device_put(w_full, row_spec)  # [M, L]
    from futuresdr_tpu.ops.fft import _dft_consts

    d_re_np, d_im_np = _dft_consts(M, -1)
    d_re = jax.device_put(d_re_np, row_spec)
    d_im = jax.device_put(d_im_np, row_spec)

    def init_carry():
        return jnp.zeros((C, n_t, K), jnp.float32)

    def _zrows(v: CArray, dre, dim):
        """This device's channel rows of the DFT: [Mc, M] @ [M, R]."""
        prec = _PREC()
        zre = jnp.matmul(dre, v.re, precision=prec) - jnp.matmul(
            dim, v.im, precision=prec
        )
        zim = jnp.matmul(dre, v.im, precision=prec) + jnp.matmul(
            dim, v.re, precision=prec
        )
        return CArray(zre, zim)

    def shard_fn(carry, x, w_loc, dre, dim):
        r_loc = _validate_shard_chunk(
            x.shape[-1], M, cfg.audio_decim, Ha + L
        )
        ci = jax.lax.axis_index(ch_axis)
        n = x.shape[-1]
        # boundary tails: full-branch conv on the (Ha+L)-row window (the
        # full taps are a tiny embedded constant), then THIS variant's
        # DFT-row slice + demod — matching its own steady-state numerics
        tail = x[..., n - (Ha + L) * M :]
        tb = cplx.apply1(lambda t: t.reshape(Ha + L, M).T, tail)  # [M,Ha+L]
        # the _w form is ALWAYS f32 — the same numerics as the sharded
        # steady-state FIR below. conv1d_valid_branches here would read
        # the fir_dtype config: under bfloat16 the halo-carried state
        # diverges from what neighbors compute themselves, breaking
        # serial parity at every shard boundary (measured 5.8e-3)
        v_b = conv1d_valid_branches_w(tb, w_full)  # [M, Ha+1]
        z_b = _zrows(v_b, dre, dim)  # [Mc, Ha+1]
        _, a_b = quadrature_demod(
            z_b[..., 1:], z_b[..., :1], cfg.demod_gain
        )  # [Mc, Ha]
        w_tail = x[..., n - L * M :]
        (hw_re, hw_im, a_halo), new_carry = packed_stream_halo(
            [w_tail.re, w_tail.im, a_b], time_axis, carry.reshape(-1)
        )
        hw = CArray(hw_re, hw_im)
        hb = cplx.apply1(lambda t: t.reshape(L, M).T, hw)  # [M, L]
        hist = hb[..., 1:]  # [M, L-1]
        v_prev = conv1d_valid_branches_w(hb, w_full)  # [M, 1]
        z_prev = _zrows(v_prev, dre, dim)  # [Mc, 1]
        # main pipeline: branch-sharded FIR + all_gather + DFT row-slice
        xb = cplx.apply1(lambda t: t.reshape(r_loc, M).T, x)  # [M, R_loc]
        ext = cplx.concat([hist, xb], axis=-1)  # [M, L-1+R_loc]
        ext_loc = cplx.apply1(
            lambda t: jax.lax.dynamic_slice_in_dim(t, ci * Mc, Mc, axis=0),
            ext,
        )
        v_loc = conv1d_valid_branches_w(ext_loc, w_loc)  # [Mc, R_loc]
        # re-assemble all branches: ONE all_gather for both components
        both = jax.lax.all_gather(
            jnp.stack([v_loc.re, v_loc.im]), ch_axis, axis=1, tiled=True
        )  # [2, M, R_loc]
        z = _zrows(CArray(both[0], both[1]), dre, dim)  # [Mc, R_loc]
        _, a = quadrature_demod(z, z_prev, cfg.demod_gain)
        _, audio = fir_decimate(a, audio_taps, cfg.audio_decim, a_halo)
        return new_carry.reshape(1, 1, K), audio

    sharded = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(ch_axis, time_axis, None),
            P(time_axis),
            P(ch_axis, None),  # branch-tap rows
            P(ch_axis, None),  # DFT rows (re)
            P(ch_axis, None),  # DFT rows (im)
        ),
        out_specs=(
            P(ch_axis, time_axis, None),
            P(ch_axis, time_axis),
        ),
        check_vma=False,
    )

    def fn(carry, x):
        return sharded(carry, x, w_rev, d_re, d_im)

    return init_carry, fn


# ---------------------------------------------------------------------------
# Convenience: jittable single-chip step with concrete example args
# ---------------------------------------------------------------------------


def example_args(cfg: BankConfig = BankConfig(), r: int = 256):
    """(state, x) sized for ``r`` channelized time steps."""
    init_state, _ = make_bank_step(cfg)
    n = r * cfg.n_ch
    rng = np.random.default_rng(0)
    x = cplx.from_numpy(
        (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
            np.complex64
        )
    )
    return init_state(), x


# ---------------------------------------------------------------------------
# Fused Pallas variants (single-chip and sharded)
# ---------------------------------------------------------------------------


def _fused_constants(cfg: BankConfig):
    """(w_rev_rows [L, M] f32, dre/dim [M, M] bf16, audio-W builder)."""
    from futuresdr_tpu.ops.pallas_bank import _dft_bf16_np

    branch_taps, audio_taps = _design(cfg)
    M, L = cfg.n_ch, int(branch_taps.shape[-1])
    Ha = _audio_ha(cfg)
    w_rev = jnp.asarray(
        np.ascontiguousarray(np.asarray(branch_taps)[:, ::-1].T).astype(
            np.float32
        )
    )
    dre_np, dim_np = _dft_bf16_np(M)
    dre, dim = jnp.asarray(dre_np), jnp.asarray(dim_np)

    # The audio decimating FIR as one banded matrix W[q, off+qD+t] =
    # taps[T-1-t] applied in ROW layout ([time, ch]) — a single
    # [R/D, Ha+R] @ [Ha+R, M] MXU matmul, replacing the [R,M]→[M,R]
    # transpose + strided conv that measured ~2x the fused kernel's own
    # runtime (bisect: kernel ~200 µs, old audio tail ~370 µs).
    taps_np = np.asarray(audio_taps, np.float64)
    T = len(taps_np)
    D = cfg.audio_decim

    @lru_cache(maxsize=None)
    def audio_w(R: int) -> np.ndarray:
        # cached as NumPy (called at trace time — a cached jnp array
        # would be a leaked tracer; the constant embeds directly)
        n_out = R // D
        W = np.zeros((n_out, Ha + R), np.float32)
        off = Ha - (T - 1)
        for t in range(T):
            W[np.arange(n_out), off + np.arange(n_out) * D + t] = taps_np[
                T - 1 - t
            ]
        return W

    return M, L, Ha, w_rev, dre, dim, audio_w


def _fused_rows_dft(v_r, v_i, dre, dim):
    """bf16 MXU DFT of demod rows — numerics-identical to the in-kernel
    stage (same bf16 cast + f32-accumulating dot on the same operands)."""
    vr16 = v_r.astype(jnp.bfloat16)
    vi16 = v_i.astype(jnp.bfloat16)
    y_r = jnp.dot(vr16, dre, preferred_element_type=jnp.float32) - jnp.dot(
        vi16, dim, preferred_element_type=jnp.float32
    )
    y_i = jnp.dot(vr16, dim, preferred_element_type=jnp.float32) + jnp.dot(
        vi16, dre, preferred_element_type=jnp.float32
    )
    return y_r, y_i


def _fir_rows(xr, xi, w_rev, L):
    """Row-major shifted-FMA branch FIR in tap order over ``xr/xi``
    ``[rows, cols]`` → ``[rows-(L-1), cols]``.

    THE canonical copy of the loop whose exact op order makes every
    boundary recompute bit-match the Pallas kernel's FIR stage —
    boundary-tail, halo-front, and branch-sharded callers all share it
    (an accumulation-order change applied to one copy but not the
    others would silently break shard-boundary parity). ``w_rev``
    columns select whatever branch subset xr/xi carry."""
    n = xr.shape[0] - (L - 1)
    v_r = w_rev[0, :] * xr[0:n, :]
    v_i = w_rev[0, :] * xi[0:n, :]
    for s in range(1, L):
        v_r = v_r + w_rev[s, :] * xr[s : s + n, :]
        v_i = v_i + w_rev[s, :] * xi[s : s + n, :]
    return v_r, v_i


def _fused_boundary_tails(xt_re, xt_im, w_rev, dre, dim, L, Ha, gain):
    """Last ``Ha`` demod rows ``[Ha, M]`` of this shard, recomputed with
    the fused kernel's exact math (f32 VPU branch FIR in tap order, bf16
    DFT, polynomial atan2)."""
    from futuresdr_tpu.ops.pallas_bank import _atan2_poly

    R = xt_re.shape[0]
    v_r, v_i = _fir_rows(xt_re[R - (Ha + L) :], xt_im[R - (Ha + L) :], w_rev, L)
    y_r, y_i = _fused_rows_dft(v_r, v_i, dre, dim)  # [Ha+1, M]
    d_r = y_r[1:] * y_r[:-1] + y_i[1:] * y_i[:-1]
    d_i = y_i[1:] * y_r[:-1] - y_r[1:] * y_i[:-1]
    return jnp.float32(gain) * _atan2_poly(d_i, d_r)  # [Ha, M]


def _fused_halo_front(hw_r, hw_i, w_rev, dre, dim, L):
    """Receiver-side: (hist rows [L-1, M]×2, yprev [1, M]×2) from the L
    wideband halo rows."""
    v_r, v_i = _fir_rows(hw_r, hw_i, w_rev, L)  # [1, M]
    yp_r, yp_i = _fused_rows_dft(v_r, v_i, dre, dim)  # [1, M]
    return hw_r[1:], hw_i[1:], yp_r, yp_i


def _pick_tile_rows(r_loc: int, tile_rows: int) -> int:
    return tile_rows if r_loc % tile_rows == 0 else math.gcd(r_loc, tile_rows)


def make_bank_step_fused(cfg: BankConfig = BankConfig(), tile_rows: int = 128,
                         interpret: bool = False):
    """Single-chip step on the fused Pallas channelizer+demod kernel
    (:mod:`futuresdr_tpu.ops.pallas_bank`): branch FIR + DFT + quadrature
    demod never leave VMEM; only the audio decimating FIR remains a
    separate (4%-of-step) stage.

    Same signature/semantics as :func:`make_bank_step` (bf16 DFT rung:
    matches ``channelizer_fft=dft_bf16`` + ``fir_dtype=float32``).
    """
    from futuresdr_tpu.ops.pallas_bank import fused_bank_demod

    M, L, Ha, w_rev, dre, dim, audio_w = _fused_constants(cfg)

    def init_state():
        return (
            jnp.zeros((L - 1, M), jnp.float32),  # branch history rows (re)
            jnp.zeros((L - 1, M), jnp.float32),  # (im)
            jnp.zeros((1, M), jnp.float32),  # prev DFT row (re)
            jnp.zeros((1, M), jnp.float32),  # (im)
            jnp.zeros((Ha, M), jnp.float32),  # audio FIR history rows
        )

    def step(state, x: CArray):
        _validate_step_chunk(x.shape[-1], M, cfg.audio_decim)
        hr, hi, ypr, ypi, ah = state
        R = x.shape[-1] // M
        xt_re = x.re.reshape(R, M)
        xt_im = x.im.reshape(R, M)
        a, hr, hi, ypr, ypi = fused_bank_demod(
            xt_re, xt_im, hr, hi, ypr, ypi, w_rev, dre, dim,
            L=L, tile_rows=_pick_tile_rows(R, tile_rows),
            gain=float(cfg.demod_gain), interpret=interpret,
        )
        ext = jnp.concatenate([ah, a], axis=0)  # [Ha+R, M]
        audio_rows = jnp.matmul(
            audio_w(R), ext, preferred_element_type=jnp.float32
        )
        return (hr, hi, ypr, ypi, ext[-Ha:]), audio_rows.T

    return init_state, step


def make_sharded_bank_step_fused(
    cfg: BankConfig,
    mesh,
    axis: str = "time",
    tile_rows: int = 128,
    interpret=None,
):
    """Time-sharded step running the **fused Pallas kernel** on every
    shard — the north-star multi-chip config at the single-chip rung's
    per-chip rate (VERDICT r2 item 1).

    Identical halo design to :func:`make_sharded_bank_step` (one packed
    ``ppermute``, boundary tails recomputed locally with the kernel's own
    math); the kernel's ``hist``/``yprev`` chunk-state operands are fed
    from the halo instead of chunk state. ``interpret=None`` auto-selects
    Pallas interpret mode off-TPU (CPU dryruns/tests).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from futuresdr_tpu.ops.pallas_bank import fused_bank_demod

    M, L, Ha, w_rev, dre, dim, audio_w = _fused_constants(cfg)
    if interpret is None:
        interpret = mesh.devices.flat[0].platform != "tpu"
    n_t = mesh.shape[axis]
    K = (2 * L + Ha) * M

    def init_carry():
        return jnp.zeros((n_t, K), jnp.float32)

    def shard_fn(carry, x):
        r_loc = _validate_shard_chunk(
            x.shape[-1], M, cfg.audio_decim, Ha + L
        )
        xt_re = x.re.reshape(r_loc, M)
        xt_im = x.im.reshape(r_loc, M)
        a_b = _fused_boundary_tails(
            xt_re, xt_im, w_rev, dre, dim, L, Ha, cfg.demod_gain
        )
        (hw_r, hw_i, a_halo), new_carry = packed_stream_halo(
            [xt_re[r_loc - L :], xt_im[r_loc - L :], a_b],
            axis,
            carry.reshape(-1),
        )
        hr, hi, ypr, ypi = _fused_halo_front(hw_r, hw_i, w_rev, dre, dim, L)
        a, *_ = fused_bank_demod(
            xt_re, xt_im, hr, hi, ypr, ypi, w_rev, dre, dim,
            L=L, tile_rows=_pick_tile_rows(r_loc, tile_rows),
            gain=float(cfg.demod_gain), interpret=interpret,
        )
        ext = jnp.concatenate([a_halo, a], axis=0)  # [Ha+R_loc, M]
        audio_rows = jnp.matmul(
            audio_w(r_loc), ext, preferred_element_type=jnp.float32
        )
        return new_carry.reshape(1, K), audio_rows.T

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=(P(axis, None), P(None, axis)),
        check_vma=False,
    )
    return init_carry, fn


def make_sharded_bank_step_2d_partial_fused(
    cfg: BankConfig,
    mesh,
    ch_axis: str = "ch",
    time_axis: str = "time",
    tile_rows: int = 128,
    interpret=None,
):
    """Partial-DFT 2D layout on the fused kernel family — the
    zero-redundancy channels×time sharding with the DFT+demod in VMEM.

    Each device branch-filters only its ``M/C`` wideband columns (f32
    row-major shifted FMAs, the fused kernel's own FIR formula), ONE
    ``all_gather`` re-assembles the filtered rows, and
    :func:`~futuresdr_tpu.ops.pallas_bank.fused_dft_demod` applies that
    device's ``[M, M/C]`` DFT column slice + quadrature demod without
    leaving VMEM. Halos ride the same single packed ppermute as every
    other variant. Matches :func:`make_bank_step_fused` numerics."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from futuresdr_tpu.ops.pallas_bank import _atan2_poly, fused_dft_demod

    M, L, Ha, w_rev, dre, dim, audio_w = _fused_constants(cfg)
    if interpret is None:
        interpret = mesh.devices.flat[0].platform != "tpu"
    C = mesh.shape[ch_axis]
    n_t = mesh.shape[time_axis]
    if M % C:
        raise ValueError(f"n_ch {M} not divisible by {C} channel shards")
    Mc = M // C
    K = 2 * L * M + Ha * Mc
    # commit the column-sliced operands onto the mesh (see the einsum
    # partial variant: required for multi-process meshes, harmless on one)
    from jax.sharding import NamedSharding

    col_spec = NamedSharding(mesh, P(None, ch_axis))
    # w_full stays a host-numpy trace CONSTANT for the boundary
    # recompute inside shard_fn: the closure must not capture the
    # column-SHARDED operand below (a multi-process mesh would have to
    # reshard/gather it — the very copy the sharding avoids)
    w_full = np.asarray(w_rev)
    w_rev = jax.device_put(w_full, col_spec)
    dre = jax.device_put(np.asarray(dre), col_spec)
    dim = jax.device_put(np.asarray(dim), col_spec)

    def init_carry():
        return jnp.zeros((C, n_t, K), jnp.float32)

    def shard_fn(carry, x, w_loc, dre_loc, dim_loc):
        r_loc = _validate_shard_chunk(
            x.shape[-1], M, cfg.audio_decim, Ha + L
        )
        ci = jax.lax.axis_index(ch_axis)
        xt_re = x.re.reshape(r_loc, M)
        xt_im = x.im.reshape(r_loc, M)
        # boundary demod tail with THIS variant's math: full-branch FIR
        # rows (x is replicated over ch), bf16 DFT column slice, poly
        # atan2 — so the audio-FIR state a neighbor receives equals what
        # it would compute itself
        vb_r, vb_i = _fir_rows(
            xt_re[r_loc - (Ha + L) :], xt_im[r_loc - (Ha + L) :], w_full, L
        )  # [Ha+1, M]
        yb_r, yb_i = _fused_rows_dft(vb_r, vb_i, dre_loc, dim_loc)
        d_r = yb_r[1:] * yb_r[:-1] + yb_i[1:] * yb_i[:-1]
        d_i = yb_i[1:] * yb_r[:-1] - yb_r[1:] * yb_i[:-1]
        a_b = jnp.float32(cfg.demod_gain) * _atan2_poly(d_i, d_r)
        (hw_r, hw_i, a_halo), new_carry = packed_stream_halo(
            [xt_re[r_loc - L :], xt_im[r_loc - L :], a_b],
            time_axis,
            carry.reshape(-1),
        )
        # yprev for the kernel: DFT row of the last pre-shard v row
        vp_r, vp_i = _fir_rows(hw_r, hw_i, w_full, L)  # [1, M]
        yp_r, yp_i = _fused_rows_dft(vp_r, vp_i, dre_loc, dim_loc)
        # branch-sharded FIR on this device's wideband columns
        cols_r = jax.lax.dynamic_slice_in_dim(
            jnp.concatenate([hw_r[1:], xt_re], axis=0), ci * Mc, Mc, axis=1
        )
        cols_i = jax.lax.dynamic_slice_in_dim(
            jnp.concatenate([hw_i[1:], xt_im], axis=0), ci * Mc, Mc, axis=1
        )
        v_r, v_i = _fir_rows(cols_r, cols_i, w_loc, L)  # [R_loc, Mc]
        both = jax.lax.all_gather(
            jnp.stack([v_r, v_i]), ch_axis, axis=2, tiled=True
        )  # [2, R_loc, M]
        a = fused_dft_demod(
            both[0], both[1], yp_r, yp_i, dre_loc, dim_loc,
            tile_rows=_pick_tile_rows(r_loc, tile_rows),
            gain=float(cfg.demod_gain), interpret=interpret,
        )  # [R_loc, Mc]
        ext = jnp.concatenate([a_halo, a], axis=0)
        audio_rows = jnp.matmul(
            audio_w(r_loc), ext, preferred_element_type=jnp.float32
        )
        return new_carry.reshape(1, 1, K), audio_rows.T

    # slicing xt columns with dynamic_slice needs the [.., Mc] slice to
    # match w_loc's columns: w_rev arrives column-sharded over ch
    sharded = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(ch_axis, time_axis, None),
            P(time_axis),
            P(None, ch_axis),  # w_rev column slice [L, Mc]
            P(None, ch_axis),  # DFT column slice (re)
            P(None, ch_axis),  # DFT column slice (im)
        ),
        out_specs=(
            P(ch_axis, time_axis, None),
            P(ch_axis, time_axis),
        ),
        check_vma=False,
    )

    def fn(carry, x):
        return sharded(carry, x, w_rev, dre, dim)

    return init_carry, fn


def make_sharded_bank_step_2d_fused(
    cfg: BankConfig,
    mesh,
    ch_axis: str = "ch",
    time_axis: str = "time",
    tile_rows: int = 128,
    interpret=None,
):
    """Channels × time 2D-mesh step on the fused Pallas kernel.

    Kernel replicated over the channel axis (each device channelizes its
    time slice in full — zero-communication redundancy, the 2D einsum
    variant's layout); the demod output is then column-sliced to the
    device's ``n_ch/C`` channels for the audio FIR. Halos: one packed
    ``ppermute`` over time, audio tails pre-sliced per receiver."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from futuresdr_tpu.ops.pallas_bank import fused_bank_demod

    M, L, Ha, w_rev, dre, dim, audio_w = _fused_constants(cfg)
    if interpret is None:
        interpret = mesh.devices.flat[0].platform != "tpu"
    C = mesh.shape[ch_axis]
    n_t = mesh.shape[time_axis]
    if M % C:
        raise ValueError(f"n_ch {M} not divisible by {C} channel shards")
    Mc = M // C
    K = 2 * L * M + Ha * Mc

    def init_carry():
        return jnp.zeros((C, n_t, K), jnp.float32)

    def shard_fn(carry, x):
        r_loc = _validate_shard_chunk(
            x.shape[-1], M, cfg.audio_decim, Ha + L
        )
        ci = jax.lax.axis_index(ch_axis)
        xt_re = x.re.reshape(r_loc, M)
        xt_im = x.im.reshape(r_loc, M)
        a_b_full = _fused_boundary_tails(
            xt_re, xt_im, w_rev, dre, dim, L, Ha, cfg.demod_gain
        )
        a_b = jax.lax.dynamic_slice_in_dim(a_b_full, ci * Mc, Mc, axis=1)
        (hw_r, hw_i, a_halo), new_carry = packed_stream_halo(
            [xt_re[r_loc - L :], xt_im[r_loc - L :], a_b],
            time_axis,
            carry.reshape(-1),
        )
        hr, hi, ypr, ypi = _fused_halo_front(hw_r, hw_i, w_rev, dre, dim, L)
        a, *_ = fused_bank_demod(
            xt_re, xt_im, hr, hi, ypr, ypi, w_rev, dre, dim,
            L=L, tile_rows=_pick_tile_rows(r_loc, tile_rows),
            gain=float(cfg.demod_gain), interpret=interpret,
        )
        a_c = jax.lax.dynamic_slice_in_dim(a, ci * Mc, Mc, axis=1)
        ext = jnp.concatenate([a_halo, a_c], axis=0)  # [Ha+R_loc, Mc]
        audio_rows = jnp.matmul(
            audio_w(r_loc), ext, preferred_element_type=jnp.float32
        )
        return new_carry.reshape(1, 1, K), audio_rows.T

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(ch_axis, time_axis, None), P(time_axis)),
        out_specs=(P(ch_axis, time_axis, None), P(ch_axis, time_axis)),
        check_vma=False,
    )
    return init_carry, fn
