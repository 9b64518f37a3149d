"""Time-sharded WLAN sync front over a device mesh.

The full-rate stages of the receiver (sync metrics, candidate detection,
SIGNAL decode — the work that touches EVERY sample) scale across chips by
sharding the capture along time: each device owns a contiguous shard plus

* a LEFT halo of ``MIN_GAP + 64`` samples (the leader filter looks back
  ``_DETECT_BLK`` = 256 samples and the moving sums 64; MIN_GAP + 64
  over-covers both with margin), and
* a RIGHT halo of ~600 samples — the SIGNAL decode window (a frame
  starting near the shard end is SIGNAL-decoded by the shard that OWNS
  its start from neighbor samples; the full-frame window belongs to the
  unsharded per-frame tail),

exchanged with one ``ppermute`` hop each (``parallel/halo.py`` — the
overlap-save pattern of SURVEY.md §5, applied to a receiver rather than a
filter bank). Every shard then runs the same detect + SIGNAL programs as
the serial receiver (``rx.py``), bounded to candidates it owns; the tiny
per-candidate results ``all_gather`` back and the host performs the
global MIN_GAP resync walk (sequential by nature, microseconds of work).

The per-frame tail stages (equalization, Viterbi) touch only detected
frames — orders of magnitude fewer samples — and run wherever the frames
land (serial path), so sharding the sync front is what moves the
capacity ceiling.

Verified numerically equivalent to the serial ``_detect_program`` +
``_signal_program`` on the 8-device CPU mesh (``tests/test_wlan.py``).
"""

from __future__ import annotations

from functools import lru_cache
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from futuresdr_tpu.models.wlan import consts as C
from futuresdr_tpu.models.wlan.rx import (
    MIN_GAP,
    SEARCH_WINDOW,
    _signal_program,
    _span,
    detect_candidates,
    sync_metrics,
    unpack_signal_fields,
)
from futuresdr_tpu.ops import cplx
from futuresdr_tpu.ops.cplx import CArray
from futuresdr_tpu.parallel.halo import halo_left, halo_right

HALO_L = MIN_GAP + 64  # leader-filter history + moving-sum lookback
# right lookahead: phase 1 decodes only the SIGNAL symbol, so a shard
# needs start+SEARCH_WINDOW+_span(1) samples ahead of its last owned
# candidate (start = idx+47), NOT the full FRAME_WIN (phase B, which
# walks whole frames, is per-frame work and stays unsharded)
HALO_R = 47 + SEARCH_WINDOW + _span(1) + 64


@lru_cache(maxsize=None)
def _sharded_phase1(mesh: Mesh, shard_len: int, kmax_loc: int):
    axis = mesh.axis_names[0]
    # invoke the factory OUTSIDE the traced function: lru-cached
    # factories build constants at factory time, and a first invocation
    # inside the shard_map trace would cache tracers (poisoning every
    # later serial use — the NOTES.md lru_cache gotcha)
    signal_fn = _signal_program(kmax_loc)

    def local(xre: jnp.ndarray, xim: jnp.ndarray):
        xs = CArray(xre, xim)  # [S] local shard
        # both halos must carry RAW shard samples — chaining the helpers
        # would re-transmit the other halo's data as neighbor samples
        recv_l = halo_left(xs, HALO_L, axis)[..., :HALO_L]
        ext = cplx.concat([recv_l, halo_right(xs, HALO_R, axis)], axis=-1)
        a, cor = sync_metrics(ext)
        me = jax.lax.axis_index(axis).astype(jnp.int32)
        # shard 0's left halo is zero-padding for positions that do not
        # exist in the serial stream; partial windows straddling the
        # zeros/signal boundary still correlate and the resulting fake
        # hits would suppress a frame starting at the very front via the
        # MIN_GAP leader filter — zero the nonexistent metric region
        cor = jnp.where(
            (jnp.arange(cor.shape[-1]) < HALO_L) & (me == 0), 0.0, cor
        )
        idx, f_off, _ = detect_candidates(
            a, cor, kmax_loc, lo=HALO_L, hi=HALO_L + shard_len
        )
        starts_loc = jnp.where(idx >= 0, idx + 47, 0).astype(jnp.int32)
        dec, snr = signal_fn(ext, starts_loc, f_off)
        gpos = jnp.where(idx >= 0, idx - HALO_L + me * shard_len, -1)
        return gpos, f_off, dec, snr

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=(P(axis), P(axis), P(axis), P(axis)),
        check_vma=False,
    )
    return jax.jit(fn)


# shard quantum: coarse enough to bound the distinct-compile set (the
# serial receiver buckets to 32768 for the same reason), and its floor
# of one quantum already exceeds both halos (HALO_L=544, HALO_R=655 —
# one ppermute hop reaches only the immediate neighbor)
_SHARD_QUANTUM = 4096


def _shard_len(n_real: int, ndev: int) -> int:
    return max(1, -(-n_real // (ndev * _SHARD_QUANTUM))) * _SHARD_QUANTUM


def auto_kmax(shard_len: int) -> int:
    """Candidates a shard can hold — the loss-free bound.

    The leader quiet-window is ``_DETECT_BLK`` (rx.py — narrower than
    MIN_GAP so SIFS-close frames are admitted), so leaders can be as
    close as ``_DETECT_BLK + 1`` samples; size kmax for that, not for
    MIN_GAP, or tail candidates would be sort-truncated mid-capture."""
    from futuresdr_tpu.models.wlan.rx import _DETECT_BLK

    return shard_len // _DETECT_BLK + 2


def _to_host(arr) -> np.ndarray:
    """Fetch a device array fully onto the host; on a multi-process mesh
    (non-addressable shards) gather across processes first."""
    try:
        return np.asarray(arr)
    except RuntimeError:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(arr, tiled=True))


def sharded_phase1(
    iq: np.ndarray, mesh: Mesh, kmax_per_shard: Optional[int] = None
) -> List[Tuple[int, float, "C.FrameParam", float]]:
    """Run the sharded sync front over ``iq`` (complex64 host samples).

    Returns the accepted candidate list after the global MIN_GAP walk:
    ``(start, coarse_cfo, FrameParam-or-None, snr_db)`` per frame, in
    time order — the exact phase-1 contract of ``WlanReceiver.process``.

    ``kmax_per_shard`` defaults to the loss-free bound (a leader every
    ``_DETECT_BLK`` samples); passing a smaller value trades SIGNAL-stage work
    for a per-shard candidate cap, which on overflow drops frames from
    that shard's TAIL (unlike serial kmax truncation, the gap can sit
    mid-capture).
    """
    axis = mesh.axis_names[0]
    ndev = mesh.shape[axis]
    x = np.asarray(iq, np.complex64)
    n_real = len(x)
    shard = _shard_len(n_real, ndev)
    total = shard * ndev
    if total != len(x):
        x = np.concatenate([x, np.zeros(total - len(x), np.complex64)])
    spec = NamedSharding(mesh, P(axis))
    xre = jax.device_put(np.real(x).astype(np.float32), spec)
    xim = jax.device_put(np.imag(x).astype(np.float32), spec)
    return sharded_phase1_global(
        xre, xim, mesh, shard, n_real, kmax_per_shard
    )


def sharded_phase1_global(
    xre,
    xim,
    mesh: Mesh,
    shard_len: int,
    n_real: int,
    kmax_per_shard: Optional[int] = None,
):
    """Sharded sync front over PRE-SHARDED global re/im arrays (the
    multi-host path builds these with ``jax.make_array_from_callback``
    — every process contributes its addressable shards)."""
    if kmax_per_shard is None:
        kmax_per_shard = auto_kmax(shard_len)
    outs = _sharded_phase1(mesh, shard_len, kmax_per_shard)(xre, xim)
    try:
        gpos, f_off, dec, snr = jax.device_get(outs)
    except RuntimeError:
        # multi-process: gather the (tiny) per-shard results globally
        from jax.experimental import multihost_utils

        gpos, f_off, dec, snr = (
            np.asarray(multihost_utils.process_allgather(o, tiled=True))
            for o in outs
        )
    rate, parity, length = unpack_signal_fields(dec)

    # global MIN_GAP resync walk over the gathered candidates (host —
    # sequential by nature; _detect_program runs it as a device scan in
    # the serial path)
    order = np.argsort(gpos, kind="stable")
    out = []
    last = -(10**9)
    fit_end = n_real - (SEARCH_WINDOW + 128 + 16 + 80)
    for j in order:
        g = int(gpos[j])  # global LEADER index (serial walk's `i`)
        if g < 0:
            continue
        start = g + 47
        if g - last < MIN_GAP or start > fit_end:
            continue
        last = g
        mcs = C.RATE_TO_MCS.get(int(rate[j]))
        param = None
        if parity[j] and mcs is not None and int(length[j]) > 0:
            param = C.FrameParam(mcs, int(length[j]))
        out.append((start, float(f_off[j]), param, float(snr[j])))
    return out


# ---------------------------------------------------------------------------
# Full sharded receiver: frame-parallel equalize + decode
# ---------------------------------------------------------------------------
#
# Past the sync front, the receiver's work is PER-FRAME (symbol FFTs,
# pilot tracking, equalization, demap, soft Viterbi — frame_equalizer.rs
# + decoder.rs) and frames are embarrassingly parallel. The TPU-native
# distribution is data parallelism over the frame batch axis: per-frame
# IQ windows are scattered evenly across the mesh (perfect load balance
# regardless of where frames landed in time) and the batched front-end +
# decode-tail programs run under ``shard_map`` with ZERO collectives —
# each device decodes kb/ndev frames with the exact serial math.


@lru_cache(maxsize=None)
def _sharded_frame_front_fn(mesh: Mesh, n_syms: int):
    """Frame-sharded batched front-end: windows [kb, win] (+ coarse CFO
    per frame) → equalized data symbols [kb, n_syms-1, 48] (SIGNAL row
    dropped). kb must be a multiple of the mesh size."""
    from futuresdr_tpu.models.wlan.rx import _frame_front_body

    axis = mesh.axis_names[0]
    win = SEARCH_WINDOW + _span(n_syms)

    def local(wre, wim, fsh):
        n = jnp.arange(win, dtype=jnp.float32)

        def one(re_row, im_row, f_short):
            w = CArray(re_row, im_row) * cplx.exp_j(f_short * n)
            eq, _h, _snr, _off, _ff = _frame_front_body(w, n_syms)
            return eq.re, eq.im

        eq_re, eq_im = jax.vmap(one)(wre, wim, fsh)
        return eq_re[:, 1:], eq_im[:, 1:]  # data symbols only

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(axis, None), P(axis, None), P(axis)),
            out_specs=(P(axis, None, None), P(axis, None, None)),
            check_vma=False,
        )
    )


@lru_cache(maxsize=None)
def _sharded_decode_tail_fn(mesh: Mesh, mcs_name: str, nf: int):
    """Frame-sharded decode tail (demap → deinterleave → depuncture →
    batched soft Viterbi → descramble → bytes), one MCS group per call —
    the serial ``_device_decode_tail`` program under ``shard_map``."""
    from futuresdr_tpu.models.wlan.rx import _device_decode_tail

    axis = mesh.axis_names[0]
    tail = _device_decode_tail(mcs_name, nf)  # factory OUTSIDE the trace

    def local(eq_re, eq_im, nbits):
        return tail(CArray(eq_re, eq_im), nbits)

    return jax.jit(
        jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P(axis, None, None),
                P(axis, None, None),
                P(axis),
            ),
            out_specs=P(axis, None),
            check_vma=False,
        )
    )


def sharded_rx(
    iq: np.ndarray, mesh: Mesh, kmax_per_shard: Optional[int] = None
):
    """The FULL WLAN receiver over a device mesh: time-sharded sync front
    (:func:`sharded_phase1`) then frame-parallel equalize + Viterbi
    decode. Returns the serial receiver's ``List[RxFrame]`` contract.

    Frame scatter is host-mediated: phase 1 already returns the (tiny)
    candidate list to the host for the global MIN_GAP walk, so the host
    slices each frame's IQ window from the capture and device_puts the
    window batch sharded over the frame axis — even distribution no
    matter how frames cluster in time (a time-sharded phase B would give
    a shard every frame of a bursty capture). Windows are ~``win``
    samples/frame; the capture itself never needs to be replicated.
    """
    import zlib

    from futuresdr_tpu.models.wlan.rx import (
        CRC32_RESIDUE,
        MAX_SYMS,
        RxFrame,
    )

    axis = mesh.axis_names[0]
    ndev = mesh.shape[axis]
    cands = sharded_phase1(iq, mesh, kmax_per_shard)
    dec = [
        (s, f, p, snr)
        for (s, f, p, snr) in cands
        if p is not None and p.n_symbols <= MAX_SYMS
    ]
    if not dec:
        return []
    nmax = max(p.n_symbols for (_s, _f, p, _r) in dec)
    nf = min(MAX_SYMS, -(-nmax // 16) * 16)  # serial's pow-of-16 bucket
    win = SEARCH_WINDOW + _span(nf + 1)
    k = len(dec)
    kb_loc = 1 << max(0, (-(-k // ndev)) - 1).bit_length()
    kb = kb_loc * ndev

    x = np.asarray(iq, np.complex64)
    xpad = np.concatenate([x, np.zeros(win, np.complex64)])
    wre = np.zeros((kb, win), np.float32)
    wim = np.zeros((kb, win), np.float32)
    fsh = np.zeros(kb, np.float32)
    for i, (s, f, _p, _r) in enumerate(dec):
        seg = xpad[s : s + win]
        wre[i] = seg.real
        wim[i] = seg.imag
        fsh[i] = f
    spec2 = NamedSharding(mesh, P(axis, None))
    spec1 = NamedSharding(mesh, P(axis))
    eq_re, eq_im = _sharded_frame_front_fn(mesh, nf + 1)(
        jax.device_put(wre, spec2),
        jax.device_put(wim, spec2),
        jax.device_put(fsh, spec1),
    )

    results = [None] * k
    groups = {}
    for i, (_s, _f, p, _r) in enumerate(dec):
        groups.setdefault(p.mcs.name, []).append(i)
    for name, idxs in sorted(groups.items()):
        nbits = np.zeros(kb, np.int32)
        for i in idxs:
            nbits[i] = dec[i][2].n_data_bits
        by_dev = _sharded_decode_tail_fn(mesh, name, nf)(
            eq_re, eq_im, jax.device_put(nbits, spec1)
        )
        by = _to_host(by_dev)
        for i in idxs:
            s, _f, p, snr = dec[i]
            psdu = bytes(by[i, 2 : p.psdu_size + 2])
            crc_ok = (zlib.crc32(psdu) & 0xFFFFFFFF) == CRC32_RESIDUE
            results[i] = RxFrame(
                mcs=p.mcs.name,
                psdu=psdu,
                snr=float(snr),
                crc_ok=crc_ok,
                start=s,
            )
    return [r for r in results if r is not None]


def check_sharded_rx_vs_serial(
    mesh: Mesh, n_frames: int = 4, gap: int = 2000, seed: int = 2
) -> None:
    """Dryrun helper: the full sharded receiver must reproduce the serial
    ``WlanReceiver`` byte-for-byte (PSDU, CRC, start) on a mixed-MCS
    capture. Raises AssertionError on mismatch."""
    from futuresdr_tpu.models.wlan import (
        WlanReceiver,
        encode_frame,
        make_mac_frame,
    )

    rng = np.random.default_rng(seed)
    parts = []
    mcss = ["qpsk12", "bpsk12"]
    for i in range(n_frames):
        psdu = make_mac_frame(
            rng.integers(0, 256, 64, dtype=np.uint8).tobytes(), seq=i
        )
        parts.append(
            encode_frame(psdu, mcss[i % 2], scrambler_seed=1 + i)
        )
        parts.append(np.zeros(gap, np.complex64))
    sig = np.concatenate(parts).astype(np.complex64)

    got = sharded_rx(sig, mesh)
    want = WlanReceiver(max_frames_per_chunk=n_frames + 4).process(sig)
    got_t = [(f.start, f.mcs, f.crc_ok, f.psdu) for f in got]
    want_t = [(f.start, f.mcs, f.crc_ok, f.psdu) for f in want]
    assert got_t == want_t and len(got) == n_frames, (
        [t[:3] for t in got_t],
        [t[:3] for t in want_t],
    )


def check_sharded_vs_serial(
    mesh: Mesh,
    n_frames: int = 4,
    gap: int = 2000,
    seed: int = 1,
    use_global: bool = False,
) -> None:
    """Dryrun helper shared by ``__graft_entry__.dryrun_multichip`` and
    the multihost worker: synthesize frames, run the sharded front, and
    assert its accepted starts equal the serial detect program's.
    Raises AssertionError on mismatch."""
    import jax.numpy as jnp

    from futuresdr_tpu.models.wlan import (
        encode_frame,
        make_mac_frame,
        prepare_device_iq,
    )
    from futuresdr_tpu.models.wlan import rx as _rx

    rng = np.random.default_rng(seed)
    parts = []
    for i in range(n_frames):
        psdu = make_mac_frame(
            rng.integers(0, 256, 64, dtype=np.uint8).tobytes(), seq=i
        )
        parts.append(encode_frame(psdu, "qpsk12", scrambler_seed=1 + i))
        parts.append(np.zeros(gap, np.complex64))
    sig = np.concatenate(parts).astype(np.complex64)

    if use_global:
        axis = mesh.axis_names[0]
        ndev = mesh.shape[axis]
        shard = _shard_len(len(sig), ndev)
        xw = np.concatenate(
            [sig, np.zeros(shard * ndev - len(sig), np.complex64)]
        )
        spec = NamedSharding(mesh, P(axis))
        wre = np.ascontiguousarray(xw.real.astype(np.float32))
        wim = np.ascontiguousarray(xw.imag.astype(np.float32))
        gre = jax.make_array_from_callback(
            wre.shape, spec, lambda i: wre[i]
        )
        gim = jax.make_array_from_callback(
            wim.shape, spec, lambda i: wim[i]
        )
        got = sharded_phase1_global(gre, gim, mesh, shard, len(sig))
    else:
        got = sharded_phase1(sig, mesh)

    xD, nr, _ = prepare_device_iq(sig)
    kk = max(16, n_frames + 4)
    s_d, v_d, _f, _nl = _rx._detect_program(kk, kk)(xD, jnp.int32(nr))
    s_a, v_a = jax.device_get((s_d, v_d))
    serial_starts = [int(s_a[j]) for j in range(kk) if v_a[j]]
    got_starts = [g[0] for g in got]
    assert got_starts == serial_starts and len(got) == n_frames, (
        got_starts,
        serial_starts,
    )
