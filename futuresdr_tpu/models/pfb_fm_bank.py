"""1024-channel polyphase channelizer + parallel FM demod bank.

The BASELINE.json headline config: a wideband IQ stream is split into
``n_ch`` channels by a critically-sampled PFB (``pfb/channelizer.rs``
parity), every channel is FM-demodulated in parallel
(``examples/fm-receiver`` math), and each audio stream is low-pass
decimated. On TPU this is three batched kernels per chunk — branch-FIR
matmul + batched matmul-FFT, vectorized quadrature demod, batched
decimating FIR — everything on the MXU/VPU.

Multi-chip: the chunk is **time-sharded** over a mesh axis; every filter
stage pulls its lookback halo from the left neighbor via ``ppermute``
(:mod:`futuresdr_tpu.parallel.halo`), so D chips process one stream with
exactly the serial semantics.
"""

from __future__ import annotations

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
from futuresdr_tpu.ops.fir import fir_decimate
from futuresdr_tpu.ops.pfb import analysis_branch_taps, pfb_channelize
from futuresdr_tpu.parallel.halo import halo_left, ring_carry


@dataclass(frozen=True)
class BankConfig:
    n_ch: int = 1024
    taps_per_ch: int = 8
    audio_decim: int = 8
    audio_taps: int = 32
    demod_gain: float = 1.0

    @property
    def branch_len(self) -> int:
        # analysis_branch_taps: L = ceil((T + M - 1)/M), T = n_ch*taps_per_ch
        T = self.n_ch * self.taps_per_ch
        return -(-(T + self.n_ch - 1) // self.n_ch)


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


def make_bank_step(cfg: BankConfig = BankConfig()):
    """Single-chip step.

    Returns ``(init_state, step)`` with
    ``step(state, x) -> (state, audio)``; ``x`` is a CArray of
    ``R·n_ch`` wideband IQ samples (R a multiple of ``audio_decim``),
    ``audio`` is ``[n_ch, R/audio_decim]`` float32.
    """
    branch_taps, audio_taps = _design(cfg)
    M, L = cfg.n_ch, int(branch_taps.shape[-1])
    Ta = cfg.audio_taps
    Ha = -(-(Ta - 1) // cfg.audio_decim) * cfg.audio_decim

    def init_state():
        return (
            cplx.czeros((M, L - 1)),  # PFB branch history
            cplx.czeros((M, 1)),  # demod last sample per channel
            jnp.zeros((M, Ha), jnp.float32),  # audio FIR history
        )

    def step(state, x: CArray):
        pfb_st, last, ah = state
        pfb_st, y = pfb_channelize(x, branch_taps, M, pfb_st)  # [R, M]
        z = cplx.apply1(lambda t: t.T, y)  # [M, R]
        last, a = quadrature_demod(z, last, cfg.demod_gain)  # [M, R] f32
        ah, audio = fir_decimate(a, audio_taps, cfg.audio_decim, ah)
        return (pfb_st, last, ah), audio

    return init_state, step


def make_sharded_bank_step(
    cfg: BankConfig,
    mesh,
    axis: str = "time",
):
    """Time-sharded step over ``mesh[axis]``.

    ``step(carry, x)``: ``x`` is the full wideband chunk, sharded on its
    (only) sample axis; ``carry`` holds replicated cross-step stream tails.
    Audio comes back sharded on the channel-time axis. Halos:

    * PFB branch history — ``(L-1)·n_ch`` wideband samples from the left
      neighbor,
    * demod — 1 channelized sample per channel,
    * audio FIR — ``Ha`` demodulated samples per channel,

    each one ``ppermute`` (the "overlap-save exchange" the BASELINE metric
    tracks).

    Per-shard chunks must also be at least ``Ha = ceil((audio_taps-1)/
    audio_decim)·audio_decim`` audio samples long — a single ppermute hop
    only reaches the immediate neighbor, so a halo cannot span shards
    (``halo_left`` raises if it would).
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    branch_taps, audio_taps = _design(cfg)
    M, L = cfg.n_ch, int(branch_taps.shape[-1])
    Ta = cfg.audio_taps
    Ha = -(-(Ta - 1) // cfg.audio_decim) * cfg.audio_decim
    Hw = (L - 1) * M  # wideband halo

    def init_carry():
        return (
            cplx.czeros((Hw,)),  # wideband tail (for PFB history)
            cplx.czeros((M, 1)),  # channelized tail (for demod)
            jnp.zeros((M, Ha), jnp.float32),  # demod-audio tail
        )

    def shard_fn(carry, x):
        cw, cz, ca = carry
        r_loc = x.shape[-1] // M
        if x.shape[-1] % M or r_loc % cfg.audio_decim:
            raise ValueError(
                f"per-shard chunk of {x.shape[-1]} samples must be a "
                f"multiple of n_ch·audio_decim = {M * cfg.audio_decim} "
                "(otherwise decimation grids silently desync across shards)"
            )
        # PFB with halo-derived branch history ([Hw] wideband → [M, L-1])
        hist = halo_left(x, Hw, axis, carry=cw)[..., :Hw]
        st = cplx.apply1(lambda t: t.reshape(L - 1, M).T, hist)
        _, y = pfb_channelize(x, branch_taps, M, st)  # [R_loc, M]
        z = cplx.apply1(lambda t: t.T, y)  # [M, R_loc]
        # demod with 1-sample halo
        zprev = halo_left(z, 1, axis, carry=cz)[..., :1]
        _, a = quadrature_demod(z, zprev, cfg.demod_gain)  # [M, R_loc]
        # audio FIR with Ha-sample halo
        ast = halo_left(a, Ha, axis, carry=ca)[..., :Ha]
        _, audio = fir_decimate(a, audio_taps, cfg.audio_decim, ast)
        # next-step carries (replicated)
        new_carry = (
            ring_carry(x, Hw, axis),
            ring_carry(z, 1, axis),
            ring_carry(a, Ha, axis),
        )
        return new_carry, audio

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            (P(), P(), P()),  # carry replicated (prefix covers CArray leaves)
            P(axis),  # x time-sharded on its sample axis
        ),
        out_specs=((P(), P(), P()), P(None, axis)),
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
    the channel axis — zero-communication redundancy, see NOTES_ROUND2 for
    the partial-DFT sharding that removes it) and then keeps only its
    ``n_ch / C`` channels for the per-channel demod + audio FIR, whose
    lookback halos ride ``ppermute`` over the time axis exactly as in the
    1D variant. Audio returns sharded over (ch, time)."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    branch_taps, audio_taps = _design(cfg)
    M, L = cfg.n_ch, int(branch_taps.shape[-1])
    Ta = cfg.audio_taps
    Ha = -(-(Ta - 1) // cfg.audio_decim) * cfg.audio_decim
    Hw = (L - 1) * M
    n_ch_dev = mesh.shape[ch_axis]
    Mc = M // n_ch_dev

    def init_carry():
        # GLOBAL shapes (shard_map splits the channel-sharded tails)
        return (
            cplx.czeros((Hw,)),
            cplx.czeros((M, 1)),
            jnp.zeros((M, Ha), jnp.float32),
        )

    def shard_fn(carry, x):
        cw, cz, ca = carry  # cz/ca arrive as the local (Mc, ·) slices
        r_loc = x.shape[-1] // M
        if x.shape[-1] % M or r_loc % cfg.audio_decim:
            raise ValueError(
                f"per-shard chunk of {x.shape[-1]} samples must be a "
                f"multiple of n_ch·audio_decim = {M * cfg.audio_decim} "
                "(otherwise decimation grids silently desync across shards)"
            )
        ci = jax.lax.axis_index(ch_axis)
        hist = halo_left(x, Hw, time_axis, carry=cw)[..., :Hw]
        st = cplx.apply1(lambda t: t.reshape(L - 1, M).T, hist)
        _, y = pfb_channelize(x, branch_taps, M, st)  # [R_loc, M]
        # keep this device's channel slice
        yc = cplx.apply1(
            lambda t: jax.lax.dynamic_slice_in_dim(t, ci * Mc, Mc, axis=1),
            y,
        )
        z = cplx.apply1(lambda t: t.T, yc)  # [Mc, R_loc]
        zprev = halo_left(z, 1, time_axis, carry=cz)[..., :1]
        _, a = quadrature_demod(z, zprev, cfg.demod_gain)
        ast = halo_left(a, Ha, time_axis, carry=ca)[..., :Ha]
        _, audio = fir_decimate(a, audio_taps, cfg.audio_decim, ast)
        new_carry = (
            ring_carry(x, Hw, time_axis),
            ring_carry(z, 1, time_axis),
            ring_carry(a, Ha, time_axis),
        )
        return new_carry, audio

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            (P(), P(ch_axis), P(ch_axis)),  # carries: wideband replicated;
            # channelized/audio tails sharded by channel
            P(time_axis),
        ),
        out_specs=(
            (P(), P(ch_axis), P(ch_axis)),
            P(ch_axis, time_axis),
        ),
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
    the DFT becomes M²/C MACs/step (MXU-dense, beats a replicated
    full FFT for moderate C). Time halos ride ``ppermute`` exactly as in
    the 1D variant."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from futuresdr_tpu.ops.fft import _PREC
    from futuresdr_tpu.ops.fir import conv1d_valid_branches_w

    branch_taps, audio_taps = _design(cfg)
    M, L = cfg.n_ch, int(branch_taps.shape[-1])
    Ta = cfg.audio_taps
    Ha = -(-(Ta - 1) // cfg.audio_decim) * cfg.audio_decim
    Hw = (L - 1) * M
    C = mesh.shape[ch_axis]
    if M % C:
        raise ValueError(f"n_ch {M} not divisible by {C} channel shards")
    Mc = M // C

    # host-built operands, sharded by the channel mesh axis via in_specs
    bt = np.asarray(branch_taps)
    w_rev = jnp.asarray(np.ascontiguousarray(bt[:, ::-1]))  # [M, L]
    k = np.arange(M, dtype=np.float64)[:, None]
    p = np.arange(M, dtype=np.float64)[None, :]
    ang = -2.0 * np.pi * k * p / M
    d_re = jnp.asarray(np.cos(ang).astype(np.float32))  # [M, M]
    d_im = jnp.asarray(np.sin(ang).astype(np.float32))

    def init_carry():
        return (
            cplx.czeros((Hw,)),
            cplx.czeros((M, 1)),
            jnp.zeros((M, Ha), jnp.float32),
        )

    def shard_fn(carry, x, w_loc, dre, dim):
        cw, cz, ca = carry  # cz/ca arrive as the local (Mc, ·) slices
        r_loc = x.shape[-1] // M
        if x.shape[-1] % M or r_loc % cfg.audio_decim:
            raise ValueError(
                f"per-shard chunk of {x.shape[-1]} samples must be a "
                f"multiple of n_ch·audio_decim = {M * cfg.audio_decim} "
                "(otherwise decimation grids silently desync across shards)"
            )
        ci = jax.lax.axis_index(ch_axis)
        hist = halo_left(x, Hw, time_axis, carry=cw)[..., :Hw]
        st = cplx.apply1(lambda t: t.reshape(L - 1, M).T, hist)  # [M, L-1]
        xb = cplx.apply1(lambda t: t.reshape(r_loc, M).T, x)  # [M, R_loc]
        ext = cplx.concat([st, xb], axis=-1)  # [M, L-1+R_loc]
        ext_loc = cplx.apply1(
            lambda t: jax.lax.dynamic_slice_in_dim(t, ci * Mc, Mc, axis=0),
            ext,
        )
        v_loc = conv1d_valid_branches_w(ext_loc, w_loc)  # [Mc, R_loc]
        # re-assemble all branches: ONE all_gather for both components
        both = jax.lax.all_gather(
            jnp.stack([v_loc.re, v_loc.im]), ch_axis, axis=1, tiled=True
        )  # [2, M, R_loc]
        # partial DFT: this device's channel rows only ([Mc, M] @ [M, R])
        prec = _PREC()
        zre = jnp.matmul(dre, both[0], precision=prec) - jnp.matmul(
            dim, both[1], precision=prec
        )
        zim = jnp.matmul(dre, both[1], precision=prec) + jnp.matmul(
            dim, both[0], precision=prec
        )
        z = CArray(zre, zim)  # [Mc, R_loc] channel-major
        zprev = halo_left(z, 1, time_axis, carry=cz)[..., :1]
        _, a = quadrature_demod(z, zprev, cfg.demod_gain)
        ast = halo_left(a, Ha, time_axis, carry=ca)[..., :Ha]
        _, audio = fir_decimate(a, audio_taps, cfg.audio_decim, ast)
        new_carry = (
            ring_carry(x, Hw, time_axis),
            ring_carry(z, 1, time_axis),
            ring_carry(a, Ha, time_axis),
        )
        return new_carry, audio

    sharded = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            (P(), P(ch_axis), P(ch_axis)),
            P(time_axis),
            P(ch_axis, None),  # branch-tap rows
            P(ch_axis, None),  # DFT rows (re)
            P(ch_axis, None),  # DFT rows (im)
        ),
        out_specs=(
            (P(), P(ch_axis), P(ch_axis)),
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


def make_bank_step_fused(cfg: BankConfig = BankConfig(), tile_rows: int = 128,
                         interpret: bool = False):
    """Single-chip step on the fused Pallas channelizer+demod kernel
    (:mod:`futuresdr_tpu.ops.pallas_bank`): branch FIR + DFT + quadrature
    demod never leave VMEM; only the audio decimating FIR remains a
    separate (4%-of-step) stage.

    Same signature/semantics as :func:`make_bank_step` (bf16 DFT rung:
    matches ``channelizer_fft=dft_bf16`` + ``fir_dtype=float32``).
    """
    from futuresdr_tpu.ops.pallas_bank import _dft_bf16_np, fused_bank_demod

    branch_taps, audio_taps = _design(cfg)
    M, L = cfg.n_ch, int(branch_taps.shape[-1])
    Ta = cfg.audio_taps
    Ha = -(-(Ta - 1) // cfg.audio_decim) * cfg.audio_decim
    # w_rev[s, p] multiplies ext[r+s, p]  (= taps reversed per branch)
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

    @lru_cache(maxsize=None)
    def _audio_w(R: int) -> np.ndarray:
        # cached as NumPy (called at trace time — a cached jnp array
        # would be a leaked tracer; the constant embeds directly)
        D = cfg.audio_decim
        n_out = R // D
        W = np.zeros((n_out, Ha + R), np.float32)
        off = Ha - (T - 1)
        for t in range(T):
            W[np.arange(n_out), off + np.arange(n_out) * D + t] = taps_np[
                T - 1 - t
            ]
        return W

    def init_state():
        return (
            jnp.zeros((L - 1, M), jnp.float32),  # branch history rows (re)
            jnp.zeros((L - 1, M), jnp.float32),  # (im)
            jnp.zeros((1, M), jnp.float32),  # prev DFT row (re)
            jnp.zeros((1, M), jnp.float32),  # (im)
            jnp.zeros((Ha, M), jnp.float32),  # audio FIR history rows
        )

    def step(state, x: CArray):
        hr, hi, ypr, ypi, ah = state
        R = x.shape[-1] // M
        xt_re = x.re.reshape(R, M)
        xt_im = x.im.reshape(R, M)
        a, hr, hi, ypr, ypi = fused_bank_demod(
            xt_re, xt_im, hr, hi, ypr, ypi, w_rev, dre, dim,
            L=L, tile_rows=tile_rows, gain=float(cfg.demod_gain),
            interpret=interpret,
        )
        ext = jnp.concatenate([ah, a], axis=0)  # [Ha+R, M]
        audio_rows = jnp.matmul(
            _audio_w(R), ext, preferred_element_type=jnp.float32
        )
        return (hr, hi, ypr, ypi, ext[-Ha:]), audio_rows.T

    return init_state, step
