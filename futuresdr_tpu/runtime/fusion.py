"""Flowgraph fusion passes: canonicalize block patterns onto fused kernels.

The reference's runtime gives composed blocks the scheduler's full speed
automatically (every block is an actor on a ring buffer —
``examples/fm-receiver/src/main.rs:84-130`` runs at machine rate with six
separate blocks). In the TPU design the analogous guarantee is that a graph
of fine-grained blocks must compile onto the same fused kernels a
hand-written model step would use. These passes run inside
:func:`futuresdr_tpu.runtime.compiler.compile_flowgraph` (config key
``fusion``, default on) and rewrite the flowgraph **before** rate solving:

* **pfb_fm_bank**: ``PfbChannelizer → M × QuadratureDemod → M ×
  Fir(decim)`` collapses into one :class:`~futuresdr_tpu.blocks.pfb.
  PfbFmBank` running the fused Pallas channelizer+demod kernel
  (``ops/pallas_bank.py``) — the bench-headline rate through the
  block/flowgraph product surface instead of only through hand-built
  steps. If every per-channel chain ends in its own ``NullSink`` the M
  sinks coalesce into one bank-port sink too (the per-step host cost of
  2·M+1 Python block visits is what would otherwise cap the rate).

Matching is deliberately conservative: any message edge, feedback edge,
non-default tag propagation, or parameter mismatch on a candidate block
vetoes the rewrite — correctness first, the unfused path is always valid.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional

import numpy as np

from futuresdr_tpu.runtime.flowgraph import Flowgraph, StreamEdge
from futuresdr_tpu.runtime.tags import TagPropagation


@dataclass
class _BankPlan:
    chan: int  # PfbChannelizer block id
    demods: List[int]  # per channel k
    firs: List[int]  # per channel k
    sinks: Optional[List[int]]  # per channel k (full variant) or None
    gain: float
    decim: int
    audio_taps: np.ndarray


def _touched_by_msg_or_feedback(fg: Flowgraph, bids: set) -> bool:
    for e in fg.message_edges:
        if e.src in bids or e.dst in bids:
            return True
    for e in fg.stream_edges:
        if e.feedback and (e.src in bids or e.dst in bids):
            return True
    return False


def _match_pfb_fm_bank(fg: Flowgraph, chan_id: int) -> Optional[_BankPlan]:
    from futuresdr_tpu.blocks.dsp import Fir, QuadratureDemod
    from futuresdr_tpu.blocks.io import NullSink
    from futuresdr_tpu.blocks.pfb import PfbChannelizer

    chan = fg.blocks[chan_id]
    if (
        type(chan) is not PfbChannelizer
        or chan.tag_propagation != TagPropagation.PROPAGATE
        or chan._params
    ):
        return None
    M = chan.n_ch
    demods: List[int] = []
    firs: List[int] = []
    gain: Optional[float] = None
    decim: Optional[int] = None
    taps: Optional[np.ndarray] = None
    for k in range(M):
        es = fg.out_edges(chan_id, k)
        if len(es) != 1 or es[0].feedback:
            return None
        d_id = es[0].dst
        d = fg.blocks[d_id]
        if (
            type(d) is not QuadratureDemod
            or d.tag_propagation != TagPropagation.PROPAGATE
            or d._params
        ):
            return None
        if gain is None:
            gain = d.gain
        elif d.gain != gain:
            return None
        des = fg.out_edges(d_id)
        if len(des) != 1 or des[0].feedback or des[0].src_port != 0:
            return None
        f_id = des[0].dst
        f = fg.blocks[f_id]
        if (
            type(f) is not Fir
            or f.interp != 1
            or f._complex
            or f.tag_propagation != TagPropagation.PROPAGATE
            or f._params
        ):
            return None
        ft = f.taps
        if hasattr(ft, "re"):  # complex taps: not a plain audio low-pass
            return None
        ft = np.asarray(ft)
        if decim is None:
            decim, taps = f.decim, ft
        elif f.decim != decim or ft.shape != taps.shape or not np.array_equal(
            ft, taps
        ):
            return None
        demods.append(d_id)
        firs.append(f_id)
    if len(set(demods)) != M or len(set(firs)) != M:
        return None  # a shared block across channels breaks 1:1 state
    fused_away = {chan_id, *demods, *firs}
    if _touched_by_msg_or_feedback(fg, fused_away):
        return None
    # full variant: every fir feeds exactly one dedicated NullSink
    sinks: Optional[List[int]] = []
    seen_sinks: set = set()
    for f_id in firs:
        fes = fg.out_edges(f_id)
        if len(fes) != 1:
            sinks = None
            break
        s_id = fes[0].dst
        s = fg.blocks[s_id]
        if (
            type(s) is not NullSink
            or s_id in seen_sinks
            or len(fg.in_edges(s_id)) != 1
        ):
            sinks = None
            break
        seen_sinks.add(s_id)
        sinks.append(s_id)
    if sinks is not None and _touched_by_msg_or_feedback(fg, seen_sinks):
        sinks = None
    return _BankPlan(
        chan=chan_id,
        demods=demods,
        firs=firs,
        sinks=sinks,
        gain=float(gain),
        decim=int(decim),
        audio_taps=taps,
    )


def _rebuild(fg: Flowgraph, removed: set, new_blocks: list) -> Dict[int, int]:
    """Drop ``removed`` block ids, append ``new_blocks``; remap all edges
    via the returned old→new id map (removed ids absent). Edges touching
    removed blocks must already be gone from ``fg.stream_edges``."""
    id_map: Dict[int, int] = {}
    blocks = []
    for bid, b in enumerate(fg.blocks):
        if bid in removed:
            continue
        id_map[bid] = len(blocks)
        blocks.append(b)
    names = {b.instance_name for b in blocks}
    for b in new_blocks:
        base = b.instance_name
        if base in names:
            i = 1
            while f"{base}_{i}" in names:
                i += 1
            b.instance_name = f"{base}_{i}"
        names.add(b.instance_name)
        blocks.append(b)
    new_edges = []
    feedback_init = {}
    for e in fg.stream_edges:
        ne = StreamEdge(
            id_map[e.src], e.src_port, id_map[e.dst], e.dst_port, e.feedback
        )
        new_edges.append(ne)
        if e in fg.feedback_init:
            feedback_init[ne] = fg.feedback_init[e]
    fg.blocks = blocks
    fg.stream_edges = new_edges
    fg.feedback_init = feedback_init
    from futuresdr_tpu.runtime.flowgraph import MessageEdge

    fg.message_edges = [
        MessageEdge(id_map[e.src], e.src_port, id_map[e.dst], e.dst_handler)
        for e in fg.message_edges
    ]
    return id_map


def _apply_pfb_fm_bank(fg: Flowgraph, plan: _BankPlan) -> str:
    from futuresdr_tpu import config
    from futuresdr_tpu.blocks.io import NullSink
    from futuresdr_tpu.blocks.pfb import PfbFmBank

    fft_mode = str(config.get("channelizer_fft", "mixed_radix")).lower()
    if fft_mode not in ("dft_bf16", "dft"):
        # the fused kernel's numerics are f32 branch FIR + bf16 DFT +
        # polynomial atan2 — NOT the active einsum config's. Channel
        # isolation stays well above the 60 dB domain gate (measured
        # 68.4 dB vs ~93 dB for mixed-radix f32), but the substitution
        # must never be silent: outputs change vs fusion=False.
        from futuresdr_tpu.utils.logging import logger

        logger.warning(
            "fusion: rewriting the PFB+FM chain onto the fused Pallas "
            "kernel (bf16 DFT + polynomial atan2) while channelizer_fft="
            "%r — numerics differ from the unfused graph (isolation "
            "~68 dB vs ~93 dB, both above the 60 dB gate). Set config "
            "fusion=False to keep the literal per-block numerics.",
            fft_mode,
        )

    chan = fg.blocks[plan.chan]
    M = chan.n_ch
    full = plan.sinks is not None
    fused = PfbFmBank(
        n_ch=M,
        taps=chan.proto,
        gain=plan.gain,
        audio_taps=plan.audio_taps,
        audio_decim=plan.decim,
        split_outputs=not full,
        name=f"{chan.instance_name}_fm_bank",
    )
    removed = {plan.chan, *plan.demods, *plan.firs}
    new_blocks = [fused]
    new_sink = None
    if full:
        removed |= set(plan.sinks)
        new_sink = NullSink(
            np.float32, name=fg.blocks[plan.sinks[0]].instance_name
        )
        new_blocks.append(new_sink)
    fir_port = {f_id: k for k, f_id in enumerate(plan.firs)}
    # re-route edges around the fused region BEFORE the id rebuild
    edges = []
    chan_in: List[StreamEdge] = []
    fir_out: List[StreamEdge] = []
    for e in fg.stream_edges:
        if e.dst == plan.chan:
            chan_in.append(e)
        elif e.src in fir_port and e.dst not in removed:
            fir_out.append(e)
        elif e.src in removed or e.dst in removed:
            continue  # internal chain edges (and fir→coalesced-sink edges)
        else:
            edges.append(e)
    fg.stream_edges = edges
    id_map = _rebuild(fg, removed, new_blocks)
    fused_id = fg.block_id(fused)
    for e in chan_in:
        fg.stream_edges.append(
            StreamEdge(id_map[e.src], e.src_port, fused_id, 0, e.feedback)
        )
    if full:
        fg.stream_edges.append(
            StreamEdge(fused_id, 0, fg.block_id(new_sink), 0)
        )
    else:
        for e in fir_out:
            fg.stream_edges.append(
                StreamEdge(
                    fused_id, fir_port[e.src], id_map[e.dst], e.dst_port,
                    e.feedback,
                )
            )
    kind = "bank+sinks" if full else "bank"
    return (
        f"pfb_fm_bank[{kind}]: {chan.instance_name} + {M}x(QuadratureDemod"
        f"→Fir) → {fused.instance_name} (fused Pallas kernel)"
    )


def fuse_flowgraph(fg: Flowgraph) -> List[str]:
    """Run all fusion passes to fixpoint; returns a log of rewrites."""
    log: List[str] = []
    progress = True
    while progress:
        progress = False
        for bid in range(len(fg.blocks)):
            plan = _match_pfb_fm_bank(fg, bid)
            if plan is not None:
                log.append(_apply_pfb_fm_bank(fg, plan))
                progress = True
                break
    return log
