"""Flowgraph → single fused XLA program.

This is the TPU-native replacement for the reference's scheduler + ring
buffers + per-block actors (``src/runtime/scheduler/smol.rs``,
``src/runtime/buffer/circular.rs``, ``src/runtime/wrapped_kernel.rs``).
Instead of running each block as an async task with dynamic back-pressure,
we solve the classic synchronous-dataflow balance equations over each
block's declared rational rate signature, pick integer chunk sizes once,
and trace every pure block's ``apply`` into **one** jitted step function.
Back-pressure (``ComputationStatus``, ``min_items`` —
``futuredsp/src/lib.rs:31-44``, ``buffer/mod.rs:44-96``) disappears:
buffers are exactly sufficient by construction.

Latency accounting: blocks with filter history (FIR etc.) emit
``latency_out`` leading transient items (the reference instead produces
``N-T+1`` from ``N`` and leaves the tail unconsumed, ``fir.rs:70-75``).
The compiler accumulates latency through the DAG so sinks can trim to the
reference's "valid convolution" semantics exactly.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from fractions import Fraction
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

from futuresdr_tpu import config
from futuresdr_tpu.runtime.block import Block
from futuresdr_tpu.runtime.flowgraph import Flowgraph, StreamEdge


class RateError(Exception):
    """Inconsistent or unsolvable rate signatures."""


def _block_rates(b: Block) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
    rin = tuple(int(r) for r in (b.rate_in or ()))
    rout = tuple(int(r) for r in (b.rate_out or ()))
    if len(rin) != len(b.stream_inputs):
        raise RateError(
            f"{b.instance_name}: rate_in has {len(rin)} entries for "
            f"{len(b.stream_inputs)} input ports"
        )
    if len(rout) != len(b.stream_outputs):
        raise RateError(
            f"{b.instance_name}: rate_out has {len(rout)} entries for "
            f"{len(b.stream_outputs)} output ports"
        )
    if any(r <= 0 for r in rin + rout):
        raise RateError(f"{b.instance_name}: rates must be positive")
    return rin, rout


def solve_repetitions(fg: Flowgraph) -> List[int]:
    """Solve SDF balance equations: per-block integer repetition counts.

    For every stream edge ``src.p → dst.q``:
    ``reps[src]·rate_out[src][p] == reps[dst]·rate_in[dst][q]``.
    Disconnected blocks (and pure message blocks) get reps=1.
    """

    n = len(fg.blocks)
    reps: List[Optional[Fraction]] = [None] * n
    rates = [_block_rates(b) for b in fg.blocks]

    adj: Dict[int, List[StreamEdge]] = {i: [] for i in range(n)}
    for e in fg.stream_edges:
        adj[e.src].append(e)
        adj[e.dst].append(e)

    for seed in range(n):
        if reps[seed] is not None:
            continue
        reps[seed] = Fraction(1)
        stack = [seed]
        comp = [seed]
        while stack:
            b = stack.pop()
            for e in adj[b]:
                rin_dst = rates[e.dst][0][e.dst_port]
                rout_src = rates[e.src][1][e.src_port]
                if b == e.src:
                    want = reps[e.src] * rout_src / rin_dst
                    other = e.dst
                else:
                    want = reps[e.dst] * rin_dst / rout_src
                    other = e.src
                if reps[other] is None:
                    reps[other] = want
                    stack.append(other)
                    comp.append(other)
                elif reps[other] != want:
                    raise RateError(
                        f"rate conflict at edge "
                        f"{fg.blocks[e.src].instance_name} → "
                        f"{fg.blocks[e.dst].instance_name}: "
                        f"{reps[other]} vs {want} repetitions"
                    )
        # normalize component to smallest integers
        denom_lcm = math.lcm(*(reps[i].denominator for i in comp))
        scaled = [reps[i] * denom_lcm for i in comp]
        g = math.gcd(*(int(s) for s in scaled))
        for i, s in zip(comp, scaled):
            reps[i] = Fraction(int(s) // g)

    return [int(r) for r in reps]


def topo_order(fg: Flowgraph) -> List[int]:
    """Topological order over *forward* stream edges.

    Feedback (``close_circuit``) edges carry a z^-D delay and do not
    constrain ordering — the delayed value comes from state. A cycle made
    only of forward edges is still an error (an algebraic loop: no delay
    element to break it)."""
    n = len(fg.blocks)
    indeg = [0] * n
    out_adj: List[List[int]] = [[] for _ in range(n)]
    for e in fg.stream_edges:
        if e.feedback:
            continue
        indeg[e.dst] += 1
        out_adj[e.src].append(e.dst)
    ready = [i for i in range(n) if indeg[i] == 0]
    order: List[int] = []
    while ready:
        b = ready.pop()
        order.append(b)
        for dst in out_adj[b]:
            indeg[dst] -= 1
            if indeg[dst] == 0:
                ready.append(dst)
    if len(order) != n:
        placed = set(order)
        cyc = [
            fg.blocks[i].instance_name for i in range(n) if i not in placed
        ]
        raise RateError(
            f"flowgraph has a delay-free stream cycle involving {cyc}; "
            "close the loop with fg.close_circuit(..., delay=D) so the "
            "feedback carries at least one item of delay"
        )
    return order


def _region_consecutive_order(
    fg: Flowgraph, order: List[int], regions: List["FeedbackRegion"]
) -> List[int]:
    """Topological order of the CONDENSATION (each feedback region = one
    supernode), expanded back to block ids with each region's members
    consecutive in their internal order.

    Why: ``_eval`` runs a whole region as ONE ``lax.scan`` at a single
    point in the order, so every external producer must precede the
    region and every consumer follow it. A plain block-level topo order
    can legally place a region member (whose only inputs are feedback
    edges, hence in-degree 0) *before* the producer of another member's
    external input — the region evaluation then reads a value that does
    not exist yet. The condensation is acyclic: any forward path leaving
    and re-entering a region would make the intermediate blocks members
    by construction (``find_feedback_regions`` reach-intersection)."""
    group = {b: ri for ri, r in enumerate(regions) for b in r.members}

    def key(b: int):
        return ("r", group[b]) if b in group else ("b", b)

    nodes = []
    seen = set()
    for b in order:
        k = key(b)
        if k not in seen:
            seen.add(k)
            nodes.append(k)
    indeg = {k: 0 for k in nodes}
    adj = {k: [] for k in nodes}
    for e in fg.stream_edges:
        if e.feedback:
            continue
        ks, kd = key(e.src), key(e.dst)
        if ks != kd:
            adj[ks].append(kd)
            indeg[kd] += 1
    ready = [k for k in nodes if indeg[k] == 0]
    out: List[int] = []
    while ready:
        k = ready.pop()
        if k[0] == "r":
            out.extend(regions[k[1]].members)
        else:
            out.append(k[1])
        for kd in adj[k]:
            indeg[kd] -= 1
            if indeg[kd] == 0:
                ready.append(kd)
    if len(out) != len(order):  # pragma: no cover - see docstring proof
        raise RateError("feedback-region condensation is cyclic")
    return out


@dataclass
class FeedbackRegion:
    """A set of blocks enclosed by one or more ``close_circuit`` loops,
    executed as a ``lax.scan`` section stepping ``granularity`` items at a
    time (the reference instead circulates owned buffers through the
    cycle, ``buffer/circuit.rs:32-80``)."""

    members: List[int]  # in forward-topo order
    fb_edges: List[StreamEdge]
    granularity: int  # items per scan iteration on region edges
    n_iters: int  # iterations per chunk ( = region_items / granularity )


def find_feedback_regions(
    fg: Flowgraph,
    order: List[int],
    edge_items: Dict[StreamEdge, int],
) -> List[FeedbackRegion]:
    """Group blocks on feedback cycles into scan regions."""
    fb_edges = [e for e in fg.stream_edges if e.feedback]
    if not fb_edges:
        return []
    n = len(fg.blocks)
    fwd: List[List[int]] = [[] for _ in range(n)]
    rev: List[List[int]] = [[] for _ in range(n)]
    for e in fg.stream_edges:
        if not e.feedback:
            fwd[e.src].append(e.dst)
            rev[e.dst].append(e.src)

    def reach(start: int, adj: List[List[int]]) -> set:
        seen = {start}
        stack = [start]
        while stack:
            b = stack.pop()
            for x in adj[b]:
                if x not in seen:
                    seen.add(x)
                    stack.append(x)
        return seen

    # per feedback edge: blocks on a forward path dst →* src
    raw: List[Tuple[set, List[StreamEdge]]] = []
    for e in fb_edges:
        members = reach(e.dst, fwd) & reach(e.src, rev)
        if e.src not in members or e.dst not in members:
            raise RateError(
                "close_circuit edge does not close a cycle: no forward "
                f"path from {fg.blocks[e.dst].instance_name} back to "
                f"{fg.blocks[e.src].instance_name}"
            )
        raw.append((members, [e]))
    # merge overlapping regions transitively: a new region absorbs EVERY
    # existing group it touches (a loop spanning two previously-disjoint
    # loops must fuse all three into one scan region)
    merged: List[Tuple[set, List[StreamEdge]]] = []
    for members, es in raw:
        members, es = set(members), list(es)
        keep: List[Tuple[set, List[StreamEdge]]] = []
        for m in merged:
            if m[0] & members:
                members |= m[0]
                es.extend(m[1])
            else:
                keep.append(m)
        keep.append((members, es))
        merged = keep

    pos = {b: i for i, b in enumerate(order)}
    regions: List[FeedbackRegion] = []
    for members, es in merged:
        mlist = sorted(members, key=lambda b: pos[b])
        # all edges with both endpoints inside must step uniformly
        internal = [
            e
            for e in fg.stream_edges
            if e.src in members and e.dst in members
        ]
        items = {edge_items[e] for e in internal}
        if len(items) != 1:
            raise RateError(
                "feedback region blocks must run at one common rate "
                f"(edge chunks {sorted(items)}); rate changes inside a "
                "close_circuit loop are not supported"
            )
        region_items = items.pop()
        delay = min(e.feedback for e in es)
        # granularity: the LARGEST divisor of region_items that is <= the
        # delay. Correctness only needs G <= D (each iteration reads the
        # oldest G of a D-deep buffer — ages D..D-G+1 are exactly the
        # D-delayed values for those G output indices) and G | items;
        # gcd(D, items) satisfies both but can be far smaller (delay=7,
        # items=4096 → gcd 1 = 4096 sequential iterations where G=4 does
        # 1024 — a 4x shorter device dependency chain per chunk).
        gran = 1
        d = min(delay, region_items)
        for g in range(d, 0, -1):
            if region_items % g == 0:
                gran = g
                break
        # external edges (both directions) must slice evenly across scan
        # iterations
        n_iters = region_items // gran
        for e in fg.stream_edges:
            if e.feedback:
                continue
            inward = e.dst in members and e.src not in members
            outward = e.src in members and e.dst not in members
            if (inward or outward) and edge_items[e] % n_iters:
                raise RateError(
                    f"edge {'into' if inward else 'out of'} feedback "
                    f"region has {edge_items[e]} items, not divisible "
                    f"by {n_iters} scan steps"
                )
        for b in mlist:
            blk = fg.blocks[b]
            if blk.is_host_source or blk.is_host_sink:
                raise RateError(
                    f"{blk.instance_name}: host-boundary blocks cannot "
                    "sit inside a feedback loop"
                )
        regions.append(
            FeedbackRegion(
                members=mlist,
                fb_edges=es,
                granularity=gran,
                n_iters=n_iters,
            )
        )
    return regions


def _latency_out(b: Block) -> Tuple[int, ...]:
    lat = getattr(b, "latency_out", None)
    if lat is None:
        return (0,) * len(b.stream_outputs)
    lat = tuple(int(x) for x in lat)
    if len(lat) != len(b.stream_outputs):
        raise RateError(
            f"{b.instance_name}: latency_out has {len(lat)} entries for "
            f"{len(b.stream_outputs)} output ports"
        )
    return lat


@dataclass
class CompiledFlowgraph:
    """The solved, traced flowgraph ready to step.

    The jitted ``step`` has signature::

        step(states, params, src_arrays) -> (states, sink_arrays, aux)

    where ``states`` is ``{bid_key: pytree}``, ``params`` is
    ``{bid_key: {name: array}}``, ``src_arrays`` maps each host-source
    output port key ``"bid.port"`` to its chunk, ``sink_arrays`` maps each
    host-sink input port key to its chunk, and ``aux`` maps ``bid_key`` to
    the block's aux dict.
    """

    fg: Flowgraph
    order: List[int]
    reps: List[int]
    multiplier: int
    edge_items: Dict[StreamEdge, int]
    in_chunks: Dict[int, List[int]]
    out_chunks: Dict[int, List[int]]
    edge_latency: Dict[StreamEdge, int]
    sink_latency: Dict[int, List[int]]
    host_source_ids: List[int]
    host_sink_ids: List[int]
    pure_ids: List[int]
    regions: List[FeedbackRegion] = field(default_factory=list)
    step: Any = None  # jitted fn, attached by _trace
    scan_step: Any = None  # jitted K-chunk lax.scan variant (built lazily)
    unrolled_steps: Dict[int, Any] = field(default_factory=dict)
    fusion_log: List[str] = field(default_factory=list)

    # ---- key helpers -----------------------------------------------------
    @staticmethod
    def bkey(bid: int) -> str:
        return f"b{bid}"

    @staticmethod
    def pkey(bid: int, port: int) -> str:
        return f"{bid}.{port}"

    # ---- key helpers (feedback) -----------------------------------------
    @staticmethod
    def fbkey(e: StreamEdge) -> str:
        return f"fb{e.src}.{e.src_port}->{e.dst}.{e.dst_port}"

    def _region_of(self, bid: int) -> Optional[FeedbackRegion]:
        for r in self.regions:
            if bid in r.members:
                return r
        return None

    def _apply_chunks(self, bid: int) -> Tuple[List[int], List[int]]:
        """Per-``apply``-call chunk sizes: full-chunk for plain blocks,
        one scan iteration's worth inside a feedback region."""
        r = self._region_of(bid)
        if r is None or r.n_iters == 1:
            return self.in_chunks[bid], self.out_chunks[bid]
        return (
            [c // r.n_iters for c in self.in_chunks[bid]],
            [c // r.n_iters for c in self.out_chunks[bid]],
        )

    def _fb_zeros(self, e: StreamEdge):
        """Initial delayed-items buffer for a feedback edge."""
        from futuresdr_tpu.ops import cplx

        import jax.numpy as jnp

        b = self.fg.blocks[e.src]
        dt = np.dtype(b.stream_outputs[e.src_port].dtype)
        init = self.fg.feedback_init.get(e, 0.0)
        if dt == np.complex64:
            buf = cplx.czeros((e.feedback,))
            if init:
                buf = cplx.CArray(buf.re + np.float32(init), buf.im)
            return buf
        return jnp.full((e.feedback,), init, dtype=dt)

    # ---- state/params init ----------------------------------------------
    def init_states(self) -> Dict[str, Any]:
        states = {}
        for bid in self.pure_ids:
            b = self.fg.blocks[bid]
            ic, oc = self._apply_chunks(bid)
            states[self.bkey(bid)] = b.make_state(ic, oc)
        for r in self.regions:
            for e in r.fb_edges:
                states[self.fbkey(e)] = self._fb_zeros(e)
        return states

    def gather_params(self) -> Dict[str, Dict[str, np.ndarray]]:
        return {
            self.bkey(bid): self.fg.blocks[bid].params() for bid in self.pure_ids
        }

    # ---- scan variant (amortized dispatch for benches / bulk files) ------
    def make_scan_step(self):
        """Jitted fn processing K stacked chunks via lax.scan (K is the
        leading axis of ``stacked_srcs``; jax's shape-keyed cache handles
        different K without rebuilding)."""
        if self.scan_step is not None:
            return self.scan_step
        base = self._eval  # unjitted single-step body

        def scanned(states, params, stacked_srcs):
            def body(carry, srcs):
                st, sinks, aux = base(carry, params, srcs)
                return st, (sinks, aux)

            states, (sinks, aux) = jax.lax.scan(body, states, stacked_srcs)
            return states, sinks, aux

        self.scan_step = jax.jit(scanned, donate_argnums=(0,))
        return self.scan_step

    def make_unrolled_step(self, K: int):
        """K-chunk batch variant taking the chunks as K SEPARATE operands:
        ``(states, params, (srcs_0, …, srcs_{K-1})) -> (states, [K,...]
        sinks, [K,...] aux)`` — same output layout as
        :meth:`make_scan_step`, different operand feed.

        Why: ``lax.scan`` slices its stacked ``[K, n]`` operand every
        iteration, and in front of a ``pallas_call`` (whose operands must
        be materialized buffers) that slice is a full HBM copy of the
        chunk — measured 40% of the whole fused-bank step at 4.2M-sample
        chunks, and STATIC unrolled indexing of the same stacked array is
        no better (0.90x — the copy, not the dynamic offset, is the
        cost; perf/scan_feed_ab.py). K separate operands are already
        materialized buffers the kernel consumes directly: 1.50x over the
        stacked scan, 92% of the loop-invariant-operand ceiling. Cost:
        the step body is traced K times (bounded — the executor only
        takes this path for K·chunks too big to slice cheaply)."""
        fn = self.unrolled_steps.get(K)
        if fn is not None:
            return fn
        import jax.numpy as jnp
        from jax import tree_util as jtu

        base = self._eval

        def unrolled(states, params, srcs_list):
            sinks_l, aux_l = [], []
            for k in range(K):
                states, sinks, aux = base(states, params, srcs_list[k])
                sinks_l.append(sinks)
                aux_l.append(aux)
            sinks = jtu.tree_map(lambda *xs: jnp.stack(xs), *sinks_l)
            aux = jtu.tree_map(lambda *xs: jnp.stack(xs), *aux_l)
            return states, sinks, aux

        fn = jax.jit(unrolled, donate_argnums=(0,))
        self.unrolled_steps[K] = fn
        return fn

    # ---- feedback region execution ---------------------------------------
    def _run_region_members(
        self, region: FeedbackRegion, fb_bufs, member_states, local_vals, params
    ):
        """One scan iteration: run every member block on ``granularity``
        items, reading feedback inputs from the delay buffers (values D
        items old) and shifting fresh outputs in."""
        import jax.numpy as jnp  # noqa: F401  (tree leaves are jnp arrays)
        from jax import tree_util as jtu

        fg = self.fg
        G = region.granularity
        vals = dict(local_vals)
        new_fb = dict(fb_bufs)
        new_sts: Dict[str, Any] = {}
        aux_l: Dict[str, Any] = {}
        fb_by_src: Dict[Tuple[int, int], List[StreamEdge]] = {}
        for e in region.fb_edges:
            fb_by_src.setdefault((e.src, e.src_port), []).append(e)
        for bid in region.members:
            b = fg.blocks[bid]
            inputs = []
            for e in fg.in_edges(bid):
                if e.feedback:
                    buf = fb_bufs[self.fbkey(e)]
                    inputs.append(jtu.tree_map(lambda a: a[:G], buf))
                else:
                    inputs.append(vals[self.pkey(e.src, e.src_port)])
            # named_scope → HLO op metadata (tf_op) → per-block device-time
            # attribution from profiler traces (utils/xplane.py)
            with jax.named_scope(b.instance_name):
                st, outs, aux = b.apply(
                    member_states[self.bkey(bid)],
                    inputs,
                    params[self.bkey(bid)],
                )
            new_sts[self.bkey(bid)] = st
            if aux:
                aux_l[self.bkey(bid)] = aux
            for p, o in enumerate(outs):
                vals[self.pkey(bid, p)] = o
                for e in fb_by_src.get((bid, p), []):
                    import jax.numpy as _jnp

                    new_fb[self.fbkey(e)] = jtu.tree_map(
                        lambda old, new: _jnp.concatenate([old[G:], new]),
                        new_fb[self.fbkey(e)],
                        o,
                    )
        member_outs = {
            self.pkey(bid, p): vals[self.pkey(bid, p)]
            for bid in region.members
            for p in range(len(fg.blocks[bid].stream_outputs))
        }
        return new_fb, new_sts, member_outs, aux_l

    def _eval_region(
        self, region: FeedbackRegion, states, new_states, params, vals, aux_all
    ) -> None:
        from jax import lax
        from jax import tree_util as jtu

        fg = self.fg
        mset = set(region.members)
        ext_keys = sorted(
            {
                self.pkey(e.src, e.src_port)
                for bid in region.members
                for e in fg.in_edges(bid)
                if not e.feedback and e.src not in mset
            }
        )
        fb0 = {self.fbkey(e): states[self.fbkey(e)] for e in region.fb_edges}
        sts0 = {
            self.bkey(bid): states[self.bkey(bid)] for bid in region.members
        }
        if region.n_iters == 1:
            local = {k: vals[k] for k in ext_keys}
            new_fb, new_sts, outs, aux_l = self._run_region_members(
                region, fb0, sts0, local, params
            )
            vals.update(outs)
            new_states.update(new_fb)
            new_states.update(new_sts)
            aux_all.update(aux_l)
            return
        n_it = region.n_iters
        import jax.numpy as jnp

        # items live on the LAST axis (the host-boundary convention —
        # leading axes are batch/channels): split that axis into n_it
        # scan slices and lead with the iteration axis. A bare
        # reshape(n_it, -1) would interleave batch and time for
        # multi-dim streams (channel-0's samples first), silently
        # scrambling the region's inputs.
        def _split(a):
            a = a.reshape(*a.shape[:-1], n_it, -1)
            return jnp.moveaxis(a, -2, 0)

        def _join(a):  # [n_it, *lead, G] → [*lead, n_it·G]
            a = jnp.moveaxis(a, 0, -2)
            return a.reshape(*a.shape[:-2], -1)

        xs = {k: jtu.tree_map(_split, vals[k]) for k in ext_keys}

        def body(carry, x):
            fb, sts = carry
            new_fb, new_sts, outs, aux_l = self._run_region_members(
                region, fb, sts, x, params
            )
            return (new_fb, new_sts), (outs, aux_l)

        (fb_f, sts_f), (outs_s, aux_s) = lax.scan(body, (fb0, sts0), xs)
        vals.update(
            {k: jtu.tree_map(_join, v) for k, v in outs_s.items()}
        )
        new_states.update(fb_f)
        new_states.update(sts_f)
        # aux inside a scan region: expose the final iteration's values
        aux_all.update(jtu.tree_map(lambda a: a[-1], aux_s))

    # ---- the traced body -------------------------------------------------
    def _eval(self, states, params, src_arrays):
        from futuresdr_tpu.ops import cplx

        fg = self.fg
        vals: Dict[str, Any] = dict(src_arrays)
        new_states: Dict[str, Any] = {}
        aux_all: Dict[str, Any] = {}
        done_regions: set = set()
        for bid in self.order:
            b = fg.blocks[bid]
            if bid in self.host_source_ids:
                continue  # outputs already in vals via src_arrays
            if bid in self.host_sink_ids:
                continue  # inputs collected below
            if (
                b.stream_outputs
                and not b.stream_inputs
                and self.pkey(bid, 0) in vals
            ):
                # pure device source pre-seeded by the caller (mesh
                # execution evaluates sources once at segment size and
                # re-uses their values for the suffix run)
                continue
            if not b.stream_outputs and not b.stream_inputs:
                continue  # pure message block: no stream work
            region = self._region_of(bid)
            if region is not None:
                ridx = self.regions.index(region)
                if ridx not in done_regions:
                    done_regions.add(ridx)
                    self._eval_region(
                        region, states, new_states, params, vals, aux_all
                    )
                continue
            inputs = [
                vals[self.pkey(e.src, e.src_port)] for e in fg.in_edges(bid)
            ]
            # named_scope → HLO op metadata (tf_op) → per-block device-time
            # attribution from profiler traces (utils/xplane.py; the TPU
            # answer to the reference's pervasive `tracing` spans +
            # LTTng tracepoints, perf/perf/src/lttng_sink.rs:6-18)
            with jax.named_scope(b.instance_name):
                st, outs, aux = b.apply(
                    states[self.bkey(bid)], inputs, params[self.bkey(bid)]
                )
            new_states[self.bkey(bid)] = st
            if aux:
                aux_all[self.bkey(bid)] = aux
            if len(outs) != len(b.stream_outputs):
                raise RuntimeError(
                    f"{b.instance_name}.apply returned {len(outs)} outputs, "
                    f"declared {len(b.stream_outputs)}"
                )
            for p, o in enumerate(outs):
                vals[self.pkey(bid, p)] = o
        sink_arrays: Dict[str, Any] = {}
        for bid in self.host_sink_ids:
            b = fg.blocks[bid]
            for e in fg.in_edges(bid):
                v = vals[self.pkey(e.src, e.src_port)]
                if getattr(b, "device_reduce", False):
                    # NullSink-style: keep compute alive, skip the D2H copy
                    v = cplx.apply1(lambda t: t.ravel()[-1] + t.ravel()[0], v)
                sink_arrays[self.pkey(bid, e.dst_port)] = v
        return new_states, sink_arrays, aux_all


def compile_flowgraph(
    fg: Flowgraph,
    chunk_size: Optional[int] = None,
    jit: bool = True,
    fusion: Optional[bool] = None,
    mesh=None,
    mesh_axis: str = "time",
) -> CompiledFlowgraph:
    """Solve rates/chunks/latency and trace the step function.

    ``fusion`` (default: config key ``fusion``, on) first canonicalizes
    known block patterns onto fused kernels — see
    :mod:`futuresdr_tpu.runtime.fusion`. The rewrite mutates ``fg``.

    ``mesh`` (a ``jax.sharding.Mesh``) compiles the step for mesh
    execution: every stream edge is time-sharded over ``mesh_axis`` with
    automatic state reconstruction at shard boundaries — see
    :mod:`futuresdr_tpu.runtime.mesh`."""

    if not fg.blocks:
        raise RateError("empty flowgraph")
    if fusion is None:
        fusion = bool(config.get("fusion", True))
    fusion_log: List[str] = []
    if fusion:
        from futuresdr_tpu.runtime.fusion import fuse_flowgraph

        fusion_log = fuse_flowgraph(fg)
        if fusion_log:
            from futuresdr_tpu.utils.logging import logger

            for line in fusion_log:
                logger.info("fusion: %s", line)
    missing = fg.unconnected_inputs()
    if missing:
        names = [
            f"{fg.blocks[b].instance_name}."
            f"{fg.blocks[b].stream_inputs[p].name}"
            for b, p in missing
        ]
        raise RateError(f"unconnected stream inputs: {names}")

    reps = solve_repetitions(fg)
    order = topo_order(fg)
    rates = [_block_rates(b) for b in fg.blocks]

    # ---- chunk multiplier: target chunk_size items on the widest edge ----
    target = int(chunk_size or config.get("chunk_size", 32768))
    widest = 1
    for e in fg.stream_edges:
        widest = max(widest, reps[e.src] * rates[e.src][1][e.src_port])
    mult = max(1, round(target / widest))
    # TPU alignment: unaligned spatial sizes are catastrophic for Mosaic
    # conv/matmul compilation (measured: a 131080-sample conv takes 238 s
    # to compile vs 2 s for 131072). Round the multiplier to a multiple of
    # 128 (or the largest power of two below it) so every edge chunk —
    # mult × integer — stays lane-aligned.
    if mult >= 128:
        mult = (mult // 128) * 128
    else:
        mult = 1 << (mult.bit_length() - 1)
    if mesh is not None:
        # every edge chunk must split evenly across the mesh axis
        S = int(mesh.shape[mesh_axis])
        if mult % S:
            mult = -(-mult // S) * S

    edge_items: Dict[StreamEdge, int] = {}
    for e in fg.stream_edges:
        edge_items[e] = mult * reps[e.src] * rates[e.src][1][e.src_port]

    in_chunks: Dict[int, List[int]] = {}
    out_chunks: Dict[int, List[int]] = {}
    for bid, b in enumerate(fg.blocks):
        rin, rout = rates[bid]
        in_chunks[bid] = [mult * reps[bid] * r for r in rin]
        out_chunks[bid] = [mult * reps[bid] * r for r in rout]

    # ---- latency through the DAG (in items, per edge) --------------------
    out_lat: Dict[Tuple[int, int], int] = {}
    for bid in order:
        b = fg.blocks[bid]
        rin, rout = rates[bid]
        in_edges = fg.in_edges(bid)
        if callable(getattr(b, "absorb_latency", None)):
            # the block converts its input latencies itself (decimators
            # re-anchor their sampling grid to the first valid sample and
            # report the resulting absolute output latency)
            in_lats = [
                out_lat.get((e.src, e.src_port), 0)
                for e in in_edges
                if not e.feedback
            ]
            lats = b.absorb_latency(in_lats)
            for p in range(len(b.stream_outputs)):
                out_lat[(bid, p)] = int(lats[p])
            continue
        blat = _latency_out(b)
        # worst input latency in work units (feedback edges carry state
        # from previous chunks — they don't add transient latency)
        units = Fraction(0)
        for e in in_edges:
            if e.feedback:
                continue
            lat_e = out_lat.get((e.src, e.src_port), 0)
            units = max(units, Fraction(lat_e, rin[e.dst_port]))
        for p in range(len(b.stream_outputs)):
            out_lat[(bid, p)] = blat[p] + math.ceil(units * rout[p])
    edge_latency = {
        e: out_lat.get((e.src, e.src_port), 0) for e in fg.stream_edges
    }

    host_source_ids = [i for i, b in enumerate(fg.blocks) if b.is_host_source]
    host_sink_ids = [i for i, b in enumerate(fg.blocks) if b.is_host_sink]
    pure_ids = [
        i
        for i, b in enumerate(fg.blocks)
        if i not in host_source_ids
        and i not in host_sink_ids
        and (b.stream_inputs or b.stream_outputs)
    ]
    sink_latency = {
        bid: [edge_latency[e] for e in fg.in_edges(bid)] for bid in host_sink_ids
    }
    regions = find_feedback_regions(fg, order, edge_items)
    if regions:
        # re-order so each region's members sit consecutively (the whole
        # region evaluates as one scan at a single point in the order)
        order = _region_consecutive_order(fg, order, regions)

    cfg = CompiledFlowgraph(
        fg=fg,
        order=order,
        reps=reps,
        multiplier=mult,
        edge_items=edge_items,
        in_chunks=in_chunks,
        out_chunks=out_chunks,
        edge_latency=edge_latency,
        sink_latency=sink_latency,
        host_source_ids=host_source_ids,
        host_sink_ids=host_sink_ids,
        pure_ids=pure_ids,
        regions=regions,
    )
    cfg.fusion_log = fusion_log
    if mesh is not None:
        from futuresdr_tpu.runtime.mesh import shard_compiled

        mcfg = shard_compiled(cfg, mesh, mesh_axis)
        mcfg.fusion_log = fusion_log
        if not jit:
            mcfg.step = mcfg._eval
        return mcfg
    if jit:
        cfg.step = jax.jit(cfg._eval, donate_argnums=(0,))
    else:
        cfg.step = cfg._eval
    return cfg
