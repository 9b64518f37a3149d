"""Streaming executor: the host loop around the compiled XLA step.

Parity: ``Runtime``/``RuntimeHandle`` (``src/runtime/runtime.rs:55-361``),
``FlowgraphHandle`` (``src/runtime/flowgraph_handle.rs:21-171``) and the
flowgraph supervisor loop (``runtime.rs:363-597``) — redesigned for TPU:

* The supervisor + per-block actors collapse into one loop: feed host-source
  chunks, dispatch the fused jitted step, deliver host-sink chunks. Device
  dispatch is async; up to ``max_inflight`` steps are in flight so host I/O
  overlaps device compute (the reference's double-buffered H2D/D2H custom
  buffers, ``buffer/vulkan/h2d.rs``).
* Validity: host sources may return short final chunks (EOS). Valid item
  counts propagate through the DAG by the exact rational rates; sinks trim
  pad garbage and the leading ``latency`` transient items, reproducing the
  reference's valid-convolution output lengths.
* Messages: ``FlowgraphHandle.call/post`` enqueue Pmt work processed
  between steps on the executor thread (the reference's
  ``FlowgraphMessage::BlockCall[back]`` routing, ``runtime.rs:450-497``);
  in-graph ``Block.post`` fans out along message edges immediately.
"""

from __future__ import annotations

import math
import queue
import threading
import time
from collections import deque
from dataclasses import dataclass
from fractions import Fraction
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

from futuresdr_tpu import config
from futuresdr_tpu.ops import cplx
from futuresdr_tpu.runtime.compiler import (
    CompiledFlowgraph,
    compile_flowgraph,
)
from futuresdr_tpu.runtime.flowgraph import Flowgraph
from futuresdr_tpu.runtime.tags import ItemTag, TagPropagation, rescale_tags
from futuresdr_tpu.types.pmt import Pmt


class RuntimeError_(Exception):
    pass


def _pad_host(arr: np.ndarray, n: int, dtype) -> Tuple[np.ndarray, int]:
    """Pad a host chunk to n items and cast to the port dtype. Returns
    (host_array, valid)."""
    arr = np.asarray(arr)
    valid = arr.shape[-1] if arr.ndim else 0
    if valid < n:
        pad = np.zeros(arr.shape[:-1] + (n - valid,), dtype=arr.dtype)
        arr = np.concatenate([arr, pad], axis=-1)
    elif valid > n:
        raise RuntimeError_(f"source produced {valid} items for chunk {n}")
    return arr.astype(dtype, copy=False), valid


@dataclass
class _Inflight:
    """One dispatched step awaiting host-side delivery."""

    sink_arrays: Dict[str, Any]
    aux: Dict[str, Any]
    sink_valid: Dict[str, int]
    sink_tags: Dict[str, List[ItemTag]]


@dataclass
class _InflightBatch:
    """K chunks dispatched as one ``lax.scan`` step (``steps_per_call``);
    sink/aux arrays carry a leading K axis."""

    sink_arrays: Dict[str, Any]
    aux: Dict[str, Any]
    chunks: List[Tuple[Dict[str, int], Dict[str, List[ItemTag]]]]


class FlowgraphHandle:
    """Control of a running flowgraph (parity: flowgraph_handle.rs:41-171)."""

    def __init__(self, executor: "Executor"):
        self._ex = executor

    def call(self, block, handler: str, pmt: Pmt = None, timeout: float = 30.0) -> Pmt:
        """RPC a block message handler; returns its Pmt reply."""
        return self._ex.enqueue_call(block, handler, pmt, wait=True, timeout=timeout)

    def post(self, block, handler: str, pmt: Pmt = None) -> None:
        """Fire-and-forget a Pmt at a block handler."""
        self._ex.enqueue_call(block, handler, pmt, wait=False)

    def describe(self):
        return self._ex.fg.describe()

    def stats(self) -> Dict[str, Any]:
        return self._ex.stats()

    def stop(self) -> None:
        self._ex.request_stop()

    def snapshot(self, path, timeout: float = 120.0) -> str:
        """Checkpoint the live flowgraph (see :meth:`Executor.snapshot`)."""
        return self._ex.snapshot(path, timeout=timeout)

    def profile_blocks(self, duration_s: float = 1.0) -> Dict[str, float]:
        """Per-block device-time % from a live profiler capture
        (see :meth:`Executor.profile_blocks`)."""
        return self._ex.profile_blocks(duration_s)

    def wait(self, timeout: Optional[float] = None) -> Flowgraph:
        return self._ex.join(timeout)

    @property
    def running(self) -> bool:
        return self._ex.running


class Executor:
    """Runs one compiled flowgraph to completion."""

    def __init__(
        self,
        fg: Flowgraph,
        chunk_size: Optional[int] = None,
        max_inflight: int = 2,
        max_steps: Optional[int] = None,
        restore: Optional[str] = None,
        mesh=None,
        mesh_axis: str = "time",
    ):
        self.fg = fg
        self.cfg: CompiledFlowgraph = compile_flowgraph(
            fg, chunk_size=chunk_size, mesh=mesh, mesh_axis=mesh_axis
        )
        # rate signatures are frozen into cfg from here on; unlocked when
        # the owning Runtime run ends (incl. on error), NOT at batch
        # pauses of a still-live executor whose cfg stays valid
        for b in fg.blocks:
            b._rate_locked = True
        self.max_inflight = max(1, max_inflight)
        self.max_steps = max_steps
        self.running = False
        self.error: Optional[BaseException] = None
        self.items_delivered: Dict[int, int] = {
            bid: 0 for bid in self.cfg.host_sink_ids
        }
        self.steps_run = 0  # steps dispatched by this run
        self.steps_total = 0  # cumulative across checkpoint restores
        self._t_start: Optional[float] = None
        self._t_stop: Optional[float] = None
        self._last_arrays = None
        self._stop = threading.Event()
        self._wake = threading.Event()
        self._msgq: "queue.Queue[Tuple[int, str, Pmt, Optional[queue.Queue]]]" = (
            queue.Queue()
        )
        self._thread: Optional[threading.Thread] = None
        self._done = threading.Event()
        self.fg_id: Optional[int] = None  # control-port registration
        self._restore_path = restore
        self._snap_req: Optional[Tuple[str, queue.Queue]] = None
        self._states = None  # post-run states (for offline snapshot)
        self._lat_left: Dict[str, int] = {}
        self._in_loop = False  # run_loop actively processing
        self._snap_lock = threading.Lock()
        self._drain_lock = threading.Lock()
        self._nofetch_steps = 0
        self._inflight: "deque" = deque()
        self._lat_live: Dict[str, int] = {}
        self._probes: "deque" = deque()  # rolling dispatch-queue bound
        self._probe_cadence: Optional[int] = None  # steps between probes
        self._probe_t = 0.0
        self._block_costs: Dict[str, float] = {}  # profile_blocks result
        # _propagate_valid memo (the steady-state full-chunk case): legal
        # only when no block's host_limit carries state (Head/Throttle)
        from futuresdr_tpu.runtime.block import Block as _Block

        self._pv_cache: Dict[Tuple, Tuple] = {}
        # memoizing is only legal when no block's host_limit carries state
        # (Head/Throttle) AND no block runs CUSTOM tag propagation — a
        # CUSTOM block may synthesize or observe tags every step even when
        # the incoming tag lists are empty, so cache hits would silently
        # bypass its propagate_tags
        self._pv_cacheable = all(
            type(b).host_limit is _Block.host_limit
            and b.tag_propagation != TagPropagation.CUSTOM
            for b in fg.blocks
        )
        self._wire_message_ports()

    # ---- checkpoint/resume ------------------------------------------------
    def snapshot(self, path, timeout: float = 120.0) -> str:
        """Write a consistent checkpoint of the flowgraph (device state +
        host block state) to ``path``. Works on a live graph — the
        snapshot is taken between steps, after all in-flight steps have
        delivered — or on a stopped one (its final state)."""
        from futuresdr_tpu.runtime.checkpoint import save_checkpoint

        if self._in_loop:
            with self._snap_lock:  # one snapshot request slot
                replyq: queue.Queue = queue.Queue(1)
                self._snap_req = (str(path), replyq)
                self._wake.set()
                deadline = time.monotonic() + timeout
                kind = None
                while True:
                    try:
                        kind, val = replyq.get(timeout=0.05)
                        break
                    except queue.Empty:
                        pass
                    if not self._in_loop:
                        # raced the shutdown: the loop may still have
                        # serviced the request on its way out
                        try:
                            kind, val = replyq.get_nowait()
                            break
                        except queue.Empty:
                            pass
                        self._snap_req = None
                        if self._states is not None:
                            # loop exited unserviced — final state is it
                            save_checkpoint(
                                path,
                                self.fg,
                                self._states,
                                self._lat_left,
                                self.steps_total,
                            )
                            return str(path)
                        raise RuntimeError(
                            "nothing to snapshot: the flowgraph stopped "
                            "before producing state"
                        )
                    if time.monotonic() >= deadline:
                        self._snap_req = None
                        raise TimeoutError(
                            f"snapshot {str(path)!r} timed out"
                        )
            if kind == "err":
                raise val
            return val
        if self._states is None:
            raise RuntimeError(
                "nothing to snapshot: the flowgraph has not run"
            )
        save_checkpoint(
            path, self.fg, self._states, self._lat_left, self.steps_total
        )
        return str(path)

    def _handle_snap_req(self, states, lat_left, steps_total) -> None:
        from futuresdr_tpu.runtime.checkpoint import save_checkpoint

        req, self._snap_req = self._snap_req, None
        if req is None:
            return
        path, replyq = req
        try:
            save_checkpoint(path, self.fg, states, lat_left, steps_total)
            replyq.put(("ok", path))
        except BaseException as e:  # noqa: BLE001 - reported to caller
            replyq.put(("err", e))

    # ---- message plumbing ------------------------------------------------
    def _wire_message_ports(self) -> None:
        fg = self.fg
        for bid, b in enumerate(fg.blocks):

            def make_post(src_bid):
                def _post(port: str, pmt: Pmt) -> None:
                    for e in fg.message_edges:
                        if e.src == src_bid and e.src_port == port:
                            dst = fg.blocks[e.dst]
                            dst.call_handler(e.dst_handler, pmt)

                return _post

            b._post_fn = make_post(bid)

    def enqueue_call(
        self, block, handler: str, pmt, wait: bool, timeout: float = 30.0
    ):
        bid = self.fg.block_id(block)
        pmt = pmt if isinstance(pmt, Pmt) else Pmt.from_py(pmt)
        if not self.running:
            # graph not running: dispatch inline (handlers are host-side)
            return self.fg.blocks[bid].call_handler(handler, pmt)
        replyq: Optional[queue.Queue] = queue.Queue(1) if wait else None
        self._msgq.put((bid, handler, pmt, replyq))
        self._wake.set()
        if not self.running:
            # the run thread may have completed its FINAL drain between
            # our running check and the put — service the queue from
            # this thread instead of letting the message rot (the Queue
            # hands each message to exactly one drainer, so racing the
            # loop thread is safe)
            self._drain_messages()
        if wait:
            try:
                kind, val = replyq.get(timeout=timeout)
            except queue.Empty:
                raise TimeoutError(f"call {handler!r} timed out")
            if kind == "err":
                raise val
            return val
        return None

    def _drain_messages(self) -> int:
        # serialized: enqueue_call's shutdown-race self-drain may run on
        # the caller thread concurrently with the run thread's final
        # drain — the Queue hands each message to exactly one drainer,
        # but two HANDLERS mutating shared block state must not overlap
        with self._drain_lock:
            n = 0
            while True:
                try:
                    bid, handler, pmt, replyq = self._msgq.get_nowait()
                except queue.Empty:
                    return n
                n += 1
                try:
                    result = self.fg.blocks[bid].call_handler(handler, pmt)
                    if replyq is not None:
                        replyq.put(("ok", result))
                except BaseException as exc:  # noqa: BLE001 - forwarded
                    if replyq is not None:
                        replyq.put(("err", exc))
                    else:
                        raise

    # ---- lifecycle -------------------------------------------------------
    def start(self) -> FlowgraphHandle:
        if self._thread is not None:
            raise RuntimeError_("executor already started")
        self.running = True
        self._thread = threading.Thread(target=self._run_guarded, daemon=True)
        self._thread.start()
        return FlowgraphHandle(self)

    def request_stop(self) -> None:
        self._stop.set()
        self._wake.set()

    def _unregister_ctrl(self) -> None:
        if self.fg_id is None:
            return
        from futuresdr_tpu.runtime.ctrl_port import global_ctrl_port

        cp = global_ctrl_port()
        if cp is not None:
            cp.unregister(self.fg_id)

    def join(self, timeout: Optional[float] = None) -> Flowgraph:
        self._done.wait(timeout)
        if self._thread is not None:
            self._thread.join(timeout)
        if self.error is not None:
            raise self.error
        return self.fg

    def _run_guarded(self) -> None:
        try:
            self.run_loop()
        except BaseException as exc:  # noqa: BLE001 - stored for join()
            self.error = exc
        finally:
            self.running = False
            try:
                # anything enqueued while running was still True
                self._drain_messages()
            except BaseException:  # noqa: BLE001 - shutdown path
                pass
            for b in self.fg.blocks:
                b._wake_fn = None
                b._rate_locked = False  # executor thread has ended
            self._unregister_ctrl()
            self._done.set()

    # ---- valid/tag propagation through the DAG (host mirror) -------------
    def _propagate_valid(
        self,
        src_valid: Dict[str, int],
        src_tags: Dict[str, List[ItemTag]],
    ) -> Tuple[Dict[str, int], Dict[str, List[ItemTag]]]:
        cfg, fg = self.cfg, self.fg
        # steady-state fast path: valid counts repeat every chunk (full
        # chunks, no tags) but the walk below costs ~200 µs of Python per
        # chunk — at 4k-sample chunks that alone bounded the executor to
        # ~0.02 GS/s. Memoize on the (src_valid, tags-empty) signature.
        cache_key = None
        if self._pv_cacheable and not any(src_tags.values()):
            cache_key = tuple(sorted(src_valid.items()))
            hit = self._pv_cache.get(cache_key)
            if hit is not None:
                sink_valid, sink_tags = hit
                return dict(sink_valid), {k: [] for k in sink_tags}
        valid: Dict[str, int] = dict(src_valid)
        tags: Dict[str, List[ItemTag]] = {k: list(v) for k, v in src_tags.items()}
        for bid in cfg.order:
            b = fg.blocks[bid]
            if bid in cfg.host_source_ids or bid in cfg.host_sink_ids:
                continue
            # feedback edges carry prior-chunk state: always "full", never
            # a source of tags
            in_edges = [e for e in fg.in_edges(bid) if not e.feedback]
            if not b.stream_outputs:
                continue
            if in_edges:
                # valid work units = min over inputs
                units = min(
                    Fraction(
                        valid.get(cfg.pkey(e.src, e.src_port), 0),
                        cfg.in_chunks[bid][e.dst_port] or 1,
                    )
                    for e in in_edges
                )
            else:
                units = Fraction(1)  # device source: always full
            in_tags = [
                tags.get(cfg.pkey(e.src, e.src_port), []) for e in in_edges
            ]
            for p in range(len(b.stream_outputs)):
                n_out = cfg.out_chunks[bid][p]
                v = min(n_out, math.floor(units * n_out))
                v = b.host_limit(p, v)
                valid[cfg.pkey(bid, p)] = v
                if b.tag_propagation == TagPropagation.DROP:
                    tags[cfg.pkey(bid, p)] = []
                elif b.tag_propagation == TagPropagation.CUSTOM:
                    # ALWAYS called — even with no input edges/tags: a
                    # CUSTOM block may SYNTHESIZE tags each chunk (the
                    # mocker calls it unconditionally too)
                    out_t = b.propagate_tags(
                        in_tags, cfg.in_chunks[bid], cfg.out_chunks[bid]
                    )
                    tags[cfg.pkey(bid, p)] = out_t[p]
                elif not in_tags:
                    tags[cfg.pkey(bid, p)] = []
                else:
                    # PROPAGATE merges tags from EVERY input port, each
                    # rescaled by its own port's rate (the reference
                    # propagates per-port: blocks/apply.rs:116-121 pattern
                    # generalized to Combine/ApplyNM). Port order is kept
                    # stable so equal-index tags arrive input-0 first.
                    merged: List[ItemTag] = []
                    for e, port_tags in zip(in_edges, in_tags):
                        n_in = cfg.in_chunks[bid][e.dst_port]
                        merged.extend(rescale_tags(port_tags, n_in, n_out))
                    merged.sort(key=lambda t: t.index)
                    tags[cfg.pkey(bid, p)] = merged
        sink_valid: Dict[str, int] = {}
        sink_tags: Dict[str, List[ItemTag]] = {}
        for bid in cfg.host_sink_ids:
            for e in fg.in_edges(bid):
                key = cfg.pkey(bid, e.dst_port)
                up = cfg.pkey(e.src, e.src_port)
                sink_valid[key] = valid.get(up, 0)
                sink_tags[key] = tags.get(up, [])
        if cache_key is not None:
            if len(self._pv_cache) > 256:  # EOS ramps vary the counts
                self._pv_cache.clear()
            self._pv_cache[cache_key] = (
                dict(sink_valid),
                {k: [] for k in sink_tags},
            )
        return sink_valid, sink_tags

    # ---- delivery --------------------------------------------------------
    def _deliver(self, flight: _Inflight, lat_left: Dict[str, int]) -> None:
        cfg, fg = self.cfg, self.fg
        # device_reduce sinks (NullSink) need no D2H at all: counting uses
        # the host-side valid counts, and fetching would serialize every
        # step on the device round-trip latency (measured ~35 ms through
        # the TPU tunnel — it throttled benches to 7 MS/s)
        need_fetch = any(
            not getattr(fg.blocks[bid], "device_reduce", False)
            for bid in cfg.host_sink_ids
        )
        host = jax.device_get(flight.sink_arrays) if need_fetch else None
        self._last_arrays = flight.sink_arrays
        self._maybe_settle(need_fetch)
        for bid in cfg.host_sink_ids:
            b = fg.blocks[bid]
            for i, e in enumerate(fg.in_edges(bid)):
                key = cfg.pkey(bid, e.dst_port)
                v = flight.sink_valid.get(key, 0)
                if getattr(b, "device_reduce", False):
                    self.items_delivered[bid] += v
                    b.host_consume_count(v)
                    continue
                arr = host[key]
                np_arr = cplx.to_numpy(arr)[..., :v]
                tags_ = [t for t in flight.sink_tags.get(key, []) if t.index < v]
                skip = min(lat_left.get(key, 0), np_arr.shape[-1])
                if skip:
                    np_arr = np_arr[..., skip:]
                    tags_ = [t.shifted(-skip) for t in tags_ if t.index >= skip]
                    lat_left[key] -= skip
                self.items_delivered[bid] += np_arr.shape[-1]
                b.host_consume(np_arr, tags_, port=i)

    def _probe(self, arrays):
        """One device scalar depending on every leaf (dispatched async)."""
        leaves = [
            l
            for l in jax.tree_util.tree_leaves(arrays)
            if hasattr(l, "ndim") and getattr(l, "size", 0)
        ]
        if not leaves:
            return None
        import jax.numpy as jnp

        return sum(jnp.ravel(l)[-1].astype(jnp.float32) for l in leaves)

    def _settle(self, arrays) -> None:
        """Force device-stream completion with ONE data-dependent fetch:
        all leaves reduce to a single scalar device-side first (a per-leaf
        fetch costs a full tunnel round-trip EACH, ~50 ms measured), and
        block_until_ready is no substitute — through the TPU tunnel it can
        return WITHOUT waiting (0.2 ms "block" vs 422 ms fetch)."""
        p = self._probe(arrays)
        if p is not None:
            np.asarray(p)

    def _maybe_settle(self, fetched: bool, steps: int = 1) -> None:
        """Bound the async dispatch queue on no-fetch graphs.

        A graph whose sinks are all ``device_reduce`` never touches D2H,
        so the loop dispatches fire-and-forget and the backend buffers
        every queued call host-side — measured ~700 MB/min RSS growth and
        a minutes-deep device queue in a 10-minute NullSink soak. Rolling
        probes: every ``settle_every_steps`` (default 32) dispatch a tiny
        scalar depending on the current step and keep a window of 16;
        when the window is full, poll the OLDEST probe's ``is_ready()``
        until true — notification-driven and free, no pull round-trip
        (a blocking fetch every N steps measured 27 ms each, up to 3x
        slowdown on fast graphs). A device that keeps up never stalls the
        loop; one that falls >512 steps behind gets paced."""
        if fetched:
            self._nofetch_steps = 0
            return
        every = max(1, int(config.get("settle_every_steps", 32)))
        if self._probe_cadence is None:
            self._probe_cadence = every
            self._probe_t = time.monotonic()
        self._nofetch_steps = getattr(self, "_nofetch_steps", 0) + steps
        if self._nofetch_steps >= self._probe_cadence:
            # Adaptive cadence: probe every ~50 ms of DISPATCH, not every
            # fixed step count. Small-chunk graphs dispatch thousands of
            # steps/s, and both pacing signals are slow on tunneled
            # backends (is_ready notifications lag completion by 0.2–1 s;
            # a blocking fetch costs ~27 ms) — a fixed 32-step cadence
            # throttled 4k-sample chunks to 0.004 GS/s while the device
            # sat idle. Byte cap: at most 2048 steps/probe so a 32-probe
            # window bounds host-side per-call retention (~2 KB/step).
            now = time.monotonic()
            rate = self._nofetch_steps / max(now - self._probe_t, 1e-6)
            self._probe_t = now
            self._nofetch_steps = 0
            self._probe_cadence = int(
                max(every, min(2048, rate * 0.05))
            )
            # no extra device work: the marker is just a reference to the
            # smallest leaf of this step's own outputs — its is_ready flips
            # when the device has executed this step
            leaves = [
                l
                for l in jax.tree_util.tree_leaves(self._last_arrays)
                if hasattr(l, "is_ready")
            ]
            if not leaves:
                return
            self._probes.append(min(leaves, key=lambda l: l.size))
            # retire everything already acknowledged (is_ready is
            # notification-driven and free)
            while self._probes and self._probes[0].is_ready():
                self._probes.popleft()
            # 32 probes ≈ 1.6 s of dispatch: far past the notification
            # lag, so a device that keeps up never stalls the loop
            if len(self._probes) > 32:
                old = self._probes.popleft()
                if not old.is_ready() and not self._stop.is_set():
                    # genuinely behind: ONE blocking fetch syncs to this
                    # probe's step at ~1 pull round-trip (~27 ms),
                    # amortized over a whole probe window of steps — the
                    # correct backpressure (loop resumes at device pace).
                    # The fetch runs on a daemon worker with a stop-aware
                    # join so handle.stop() can still break the wait on a
                    # wedged backend that will never complete anything
                    # (is_ready alone is no substitute: its notifications
                    # lag completion by 0.2-1 s through the tunnel, which
                    # is what throttled small-chunk graphs before).
                    err: List[BaseException] = []

                    def _fetch():
                        try:
                            np.asarray(old)
                        except BaseException as e:  # noqa: BLE001
                            err.append(e)

                    t = threading.Thread(target=_fetch, daemon=True)
                    t.start()
                    while t.is_alive() and not self._stop.is_set():
                        t.join(0.05)
                    if err:
                        # a dead backend must surface through run_loop →
                        # self.error → handle.join(), not vanish inside
                        # the worker thread
                        raise err[0]

    def _deliver_full(self, flight, lat_left: Dict[str, int]) -> None:
        """Deliver sink data AND route aux to block hooks (every path)."""
        if isinstance(flight, _InflightBatch):
            self._deliver_batch(flight, lat_left)
            return
        # aux first: sinks consuming this step may read upstream blocks'
        # last_aux (valid counts of fixed-capacity variable-rate outputs)
        if flight.aux:
            aux_host = jax.device_get(flight.aux)
            self._nofetch_steps = 0  # the aux fetch already settled
            for bid in self.cfg.pure_ids:
                a = aux_host.get(self.cfg.bkey(bid))
                if a:
                    self.fg.blocks[bid].on_aux(a)
        self._deliver(flight, lat_left)

    def _deliver_batch(
        self, flight: _InflightBatch, lat_left: Dict[str, int]
    ) -> None:
        """One D2H fetch for a whole K-chunk scan batch, then per-chunk
        delivery in stream order (valid/tags/latency exactly as if the K
        steps had been dispatched individually)."""
        cfg, fg = self.cfg, self.fg
        need_fetch = any(
            not getattr(fg.blocks[bid], "device_reduce", False)
            for bid in cfg.host_sink_ids
        )
        host = jax.device_get(flight.sink_arrays) if need_fetch else None
        self._last_arrays = flight.sink_arrays
        self._maybe_settle(
            need_fetch or bool(flight.aux), steps=len(flight.chunks)
        )
        aux_host = jax.device_get(flight.aux) if flight.aux else None
        # complex reassembly once per key, not once per (key, chunk)
        host_np = (
            {k_: cplx.to_numpy(v_) for k_, v_ in host.items()}
            if host is not None
            else None
        )
        for k, (sink_valid, sink_tags) in enumerate(flight.chunks):
            if aux_host:
                for bid in cfg.pure_ids:
                    a = aux_host.get(cfg.bkey(bid))
                    if a:
                        fg.blocks[bid].on_aux(
                            jax.tree_util.tree_map(lambda t: t[k], a)
                        )
            for bid in cfg.host_sink_ids:
                b = fg.blocks[bid]
                for i, e in enumerate(fg.in_edges(bid)):
                    key = cfg.pkey(bid, e.dst_port)
                    v = sink_valid.get(key, 0)
                    if getattr(b, "device_reduce", False):
                        self.items_delivered[bid] += v
                        b.host_consume_count(v)
                        continue
                    np_arr = host_np[key][k][..., :v]
                    tags_ = [
                        t for t in sink_tags.get(key, []) if t.index < v
                    ]
                    skip = min(lat_left.get(key, 0), np_arr.shape[-1])
                    if skip:
                        np_arr = np_arr[..., skip:]
                        tags_ = [
                            t.shifted(-skip) for t in tags_ if t.index >= skip
                        ]
                        lat_left[key] -= skip
                    self.items_delivered[bid] += np_arr.shape[-1]
                    b.host_consume(np_arr, tags_, port=i)

    # ---- metrics (observability parity: chunks/s, samples/s) -------------
    def stats(self) -> Dict[str, Any]:
        now = time.monotonic()
        t0 = self._t_start or now
        t1 = self._t_stop or now
        elapsed = max(t1 - t0, 1e-9)
        total_items = sum(self.items_delivered.values())
        out = {
            "steps": self.steps_run,
            "steps_total": self.steps_total,
            "elapsed_s": elapsed,
            "steps_per_s": self.steps_run / elapsed,
            "items_delivered": dict(self.items_delivered),
            "samples_per_s": total_items / elapsed,
            "chunk_items": {
                str(k): v for k, v in self.cfg.edge_items.items()
            },
            "steps_per_call": getattr(self, "_k_used", None),
        }
        if self._block_costs:
            out["block_cost_pct"] = dict(self._block_costs)
        return out

    def profile_blocks(
        self, duration_s: float = 1.0, trace_dir: Optional[str] = None
    ) -> Dict[str, float]:
        """Attribute device time to flowgraph blocks from a live profile.

        Captures a ``jax.profiler`` trace of the running loop for
        ``duration_s``, parses the device plane's op events
        (:mod:`futuresdr_tpu.utils.xplane` — no TensorFlow needed), and
        groups real post-fusion op durations by the ``jax.named_scope``
        the graph compiler wraps around every block's ``apply``.

        Returns ``{block_name: device_time_pct}`` sorted descending;
        also exposed via ``stats()["block_cost_pct"]`` and the REST
        stats route / GUI header. Ops XLA fused across blocks follow
        their representative op (XProf's own convention); scope-less ops
        (donation copies, infeed) land in ``"(unattributed)"``.

        TPU parity note: this is the reference's LTTng sample-path
        tracing (``perf/perf/src/lttng_sink.rs:6-18``) re-imagined for a
        fused-program runtime — the trace is captured by the compiler
        stack, not by instrumented blocks. CPU backends emit no per-op
        plane; run on device."""
        import shutil
        import tempfile

        from futuresdr_tpu.utils.xplane import block_time_ps

        td = trace_dir or tempfile.mkdtemp(prefix="futuresdr_prof_")
        jax.profiler.start_trace(td)
        try:
            time.sleep(duration_s)
        finally:
            jax.profiler.stop_trace()
        names = [b.instance_name for b in self.fg.blocks]
        try:
            ps = block_time_ps(td, names)
        finally:
            if trace_dir is None:
                # auto-created trace dirs hold multi-MB xplane files;
                # repeated REST/GUI profiling of a long-lived flowgraph
                # must not accumulate them on disk
                shutil.rmtree(td, ignore_errors=True)
        total = sum(ps.values())
        if not total:
            raise RuntimeError(
                "trace contains no attributable device ops (CPU backends "
                "emit no per-op plane — profile on TPU, and make sure the "
                "flowgraph was stepping during the capture window)"
            )
        self._block_costs = {
            k: round(100.0 * v / total, 2)
            for k, v in sorted(ps.items(), key=lambda kv: -kv[1])
        }
        return dict(self._block_costs)

    # ---- the loop --------------------------------------------------------
    def run_loop(self) -> None:
        self._in_loop = True
        try:
            self._run_loop_impl()
        except BaseException:
            # a failing source/sink must not erase completed device work:
            # deliver every in-flight step before surfacing the error
            # (parity: the reference returns the flowgraph with block
            # state intact even on error, runtime.rs:589-596)
            try:
                while self._inflight:
                    self._deliver_full(
                        self._inflight.popleft(), self._lat_live
                    )
            except BaseException:  # noqa: BLE001 - best-effort drain
                pass
            raise
        finally:
            self._in_loop = False

    def _note_control_traffic(
        self, drained: int, ver_now: int, auto_k: bool
    ) -> None:
        """Auto-K retune-latency state machine (one call per loop
        iteration): a drained message that BUMPED the params-version sum
        (an actual retune — read-only polls must stay free) arms a
        16-iteration cooldown during which the batch budget is capped at
        one chunk; quiet iterations decay it. No-op when batching is off
        or explicitly configured."""
        if drained and auto_k and ver_now != self._ctrl_ver:
            self._msg_cooldown = 16
        elif self._msg_cooldown:
            self._msg_cooldown -= 1
        self._ctrl_ver = ver_now

    def _auto_steps_per_call(self, tickers) -> int:
        """Pick the scan-batch depth K for the default config.

        Engages only where batching is pure win — device/resident-source
        pipelines with no per-chunk host interactivity:

        * host-fed graphs keep K=1 (their batching is an explicit opt-in:
          stacking/unrolled dispatch changes the host feed path);
        * message edges, tickers, blocking/notifying sources keep K=1
          (messages and tickers run once per BATCH, so batching trades
          control latency for throughput — the latency chapter's knob).

        The depth itself comes from the measured operating curve
        (docs/book/latency.md, NOTES r3/r4): per-dispatch overhead through
        tunneled backends is 200-600 µs regardless of work, so small
        chunks want deep batches (K=32 at 4k-item chunks measured 9x);
        at multi-M-sample chunks the win plateaus by K=4 (14.09 / 14.91 /
        14.89 GS/s at K=2/4/8 on the flagship bank). K = clamp(
        auto_batch_items/widest, 4, 32) reproduces both endpoints;
        ``auto_batch_max_k`` / ``auto_batch_items`` tune it, an explicit
        ``steps_per_call`` bypasses it entirely.
        """
        cfg, fg = self.cfg, self.fg
        if not fg.stream_edges or cfg.host_source_ids:
            return 1
        if fg.message_edges or tickers:
            return 1
        if any(b.is_blocking or b.notifies for b in fg.blocks):
            return 1
        widest = max(cfg.edge_items.values(), default=0)
        if widest <= 0 or widest > int(config.get("scan_max_chunk", 1 << 23)):
            return 1
        target = int(config.get("auto_batch_items", 1 << 22))
        kmax = max(1, int(config.get("auto_batch_max_k", 32)))
        return max(1, min(kmax, max(4, -(-target // widest))))

    def _run_loop_impl(self) -> None:
        cfg, fg = self.cfg, self.fg
        self._t_start = time.monotonic()
        self._t_stop = None  # else a RE-ENTERED run (restart, bench
        # rounds) computes elapsed from the previous run's stop time
        self._nofetch_steps = 0
        self._probes.clear()
        self._probe_cadence = None  # re-measure dispatch rate per run
        for b in fg.blocks:  # event-driven wakeup (BlockNotifier parity)
            b._wake_fn = self._wake.set
        states = cfg.init_states()
        inflight: "deque[_Inflight]" = deque()
        self._inflight = inflight  # visible to run_loop's error drain
        lat_left = {
            cfg.pkey(bid, e.dst_port): cfg.edge_latency[e]
            for bid in cfg.host_sink_ids
            for e in fg.in_edges(bid)
        }
        self._lat_live = lat_left  # shared dict: error drain sees trims
        step_base = 0
        if self._restore_path is not None:
            from futuresdr_tpu.runtime.checkpoint import load_checkpoint

            states, lat_restored, step_base = load_checkpoint(
                self._restore_path, fg, states
            )
            lat_left = {k: lat_restored.get(k, 0) for k in lat_left}
            self.steps_total = step_base
            self._restore_path = None  # consumed; a rerun starts fresh
        # every state leaf must be its own buffer (step donates states)
        states = jax.tree_util.tree_map(
            lambda a: jax.numpy.array(a, copy=True), states
        )
        src_dtypes = {}
        for bid in cfg.host_source_ids:
            b = fg.blocks[bid]
            for p, spec in enumerate(b.stream_outputs):
                src_dtypes[cfg.pkey(bid, p)] = np.dtype(spec.dtype)

        has_host_sources = bool(cfg.host_source_ids)
        has_streams = bool(fg.stream_edges)
        # Event-driven idle: when every live source notifies on data
        # arrival the executor can sleep long; otherwise keep the short
        # poll for legacy poll-style sources (the reference's coalescing
        # BlockNotifier makes all wakeups event-driven).
        idle_wait = (
            0.25
            if all(
                getattr(fg.blocks[bid], "notifies", False)
                for bid in cfg.host_source_ids
            )
            else 0.005
        )
        tickers = [
            b for b in fg.blocks if callable(getattr(b, "host_tick", None))
        ]
        # steps_per_call > 1: fuse K chunks into one lax.scan dispatch.
        # Amortizes the per-dispatch host/tunnel overhead; the tradeoff is
        # control granularity — messages/tickers run once per batch.
        # Default "auto": the executor picks K itself for device-source
        # pipelines (see _auto_steps_per_call) — the measured 2x at
        # flagship chunks and 4-9x at small chunks must not require the
        # user to have read the latency chapter. An explicit integer
        # always overrides.
        k_cfg = config.get("steps_per_call", "auto")
        if k_cfg in (None, "auto"):
            K = self._auto_steps_per_call(tickers)
        else:
            K = max(1, int(k_cfg))
        widest = max(cfg.edge_items.values(), default=0)
        scan_max = int(config.get("scan_max_chunk", 1 << 23))
        if K > 1 and widest > scan_max:
            # r2 measured scan batching 3x slower at 128k — that was the
            # broken pacing probe throttling the loop, not the scan
            # (r3 re-measure after the fix: 4x FASTER at 128k, 9x at 4k).
            # r4 extended the measurement to 4.2M-sample chunks on the
            # fused-bank graph: K=4 is ~2x FASTER than K=1 (14.95 vs
            # 7.7 GS/s medians, paired rounds 1.7-2.4x — per-dispatch
            # overhead still dominated even at 4 ms of compute/step
            # through the tunneled backend), so the gate default is now
            # 8M items; `scan_max_chunk` overrides.
            from futuresdr_tpu.utils.logging import logger

            logger.warning(
                "steps_per_call=%d disabled: widest edge chunk %d > "
                "scan_max_chunk=%d — batching is unmeasured above the "
                "gate; use smaller chunks or raise the scan_max_chunk "
                "config key after benchmarking",
                K,
                widest,
                scan_max,
            )
            K = 1
        self._k_used = K  # surfaced in stats(); pinned by tests
        scan_step = cfg.make_scan_step() if K > 1 else None
        # host-FED batches above this OPERAND size dispatch through the
        # UNROLLED K-step instead of lax.scan: scan dynamic-slices its
        # stacked [K, n] operand each iteration, and that slice is a
        # full HBM copy of the chunk — measured ~40% of the whole step
        # at multi-M-sample chunks (NOTES r4 "Scan feed modes"). The
        # gate keys on the widest HOST-SOURCE edge (the operands that
        # actually get stacked), not internal edges — a small host feed
        # into a wide expander must not pay K× trace/compile to avoid a
        # negligible copy. Device-source-only graphs keep the scan.
        unroll_min = int(config.get("scan_unroll_min_chunk", 1 << 19))
        host_widest = max(
            (
                cfg.edge_items[e]
                for e in fg.stream_edges
                if e.src in cfg.host_source_ids
            ),
            default=0,
        )
        unroll_ok = K > 1 and host_widest > unroll_min
        step_no = 0
        eos = False
        # device params cache PERSISTS across run_loop invocations (it
        # lives on self): re-entering the loop (bench rounds, restart
        # after stop, max_steps batches) must not re-upload potentially
        # large params — a ResidentSource carries its whole buffer as
        # params, and re-device_putting it per entry turned a 12 GS/s
        # graph into 0.04 through the tunnel. The version sum invalidates
        # it on any retune.
        params_cache = getattr(self, "_params_cache", None)
        params_ver = getattr(self, "_params_ver", -1)
        # auto-K vs live control traffic: the static gate cannot see
        # EXTERNAL callers (ctrl_port / FlowgraphHandle.call on a pure
        # device-source graph), and messages drain once per batch — K=32
        # would multiply a GUI retune's latency 32x. While RETUNES are
        # actually landing (params-version bumps — read-only GUI polls
        # must not cost the batching win), cap the batch at 1 chunk for
        # a short cooldown window; idle control plane = full batching.
        # The first capped batch traces the K=1 program once per process
        # (amortized by the persistent compile cache across runs).
        self._msg_cooldown = 0
        self._ctrl_ver = sum(
            fg.blocks[bid]._params_version for bid in cfg.pure_ids
        )
        auto_k = K > 1 and k_cfg in (None, "auto")
        while not self._stop.is_set():
            # handlers retune through Block.set_param, which bumps
            # _params_version — the version-sum check below re-uploads
            # exactly when something changed. Unconditionally dropping
            # the cache per message would re-device_put ALL params on
            # every GUI poll/post (a ResidentSource's whole buffer).
            drained = self._drain_messages()
            self._note_control_traffic(
                drained,
                sum(
                    fg.blocks[bid]._params_version
                    for bid in cfg.pure_ids
                )
                if drained
                else self._ctrl_ver,
                auto_k,
            )
            if self._snap_req is not None:
                # consistent point: deliver all in-flight steps first so
                # sink accumulation matches the carried device state
                while inflight:
                    self._deliver_full(inflight.popleft(), lat_left)
                self._handle_snap_req(states, lat_left, step_base + step_no)
            for b in tickers:
                b.host_tick()
            if any(b.finish_requested for b in fg.blocks):
                break
            if not has_streams:
                # message-only flowgraph: no device program to dispatch;
                # posts set _wake, so only tickers need the short poll
                self._wake.wait(0.005 if tickers else 0.25)
                self._wake.clear()
                continue
            if self.max_steps is not None and step_no >= self.max_steps:
                break

            # -- feed sources: collect up to K chunk sets ------------------
            budget = 1 if self._msg_cooldown else K
            if self.max_steps is not None:
                budget = min(budget, self.max_steps - step_no)
            batch: List[
                Tuple[
                    Dict[str, np.ndarray],
                    Dict[str, int],
                    Dict[str, List[ItemTag]],
                ]
            ] = []
            while len(batch) < budget and not eos:
                src_host: Dict[str, np.ndarray] = {}
                src_valid: Dict[str, int] = {}
                src_tags: Dict[str, List[ItemTag]] = {}
                any_eos = False
                for bid in cfg.host_source_ids:
                    b = fg.blocks[bid]
                    for p in range(len(b.stream_outputs)):
                        key = cfg.pkey(bid, p)
                        n = cfg.out_chunks[bid][p]
                        produced = b.host_produce(n, port=p)
                        tags_: List[ItemTag] = []
                        if isinstance(produced, tuple):
                            produced, tags_ = produced
                        if produced is None:
                            arr = np.zeros((0,), dtype=src_dtypes[key])
                            any_eos = True  # a finished input terminates
                            # the flowgraph (reference's BlockDone cascade)
                        else:
                            arr = np.asarray(produced)
                        host_arr, valid = _pad_host(arr, n, src_dtypes[key])
                        src_host[key] = host_arr
                        src_valid[key] = valid
                        src_tags[key] = tags_
                if any_eos:
                    eos = True
                    # another source may have produced REAL items in
                    # this same collection pass (two files of different
                    # lengths): dispatch the partial chunk — the valid
                    # counts already mark the finished source's lane
                    # empty — instead of silently dropping consumed data
                    if any(src_valid.values()):
                        batch.append((src_host, src_valid, src_tags))
                    break
                if has_host_sources and not any(src_valid.values()):
                    break  # live sources idle: dispatch what we have
                batch.append((src_host, src_valid, src_tags))

            if not batch and not eos:
                # live sources idle: flush pending output, don't burn a
                # step on all-pad chunks
                while inflight:
                    self._deliver_full(inflight.popleft(), lat_left)
                # event-driven idle: woken instantly by notify_data /
                # messages / stop; short fallback only when a source
                # doesn't notify (legacy poll-style)
                self._wake.wait(idle_wait)
                self._wake.clear()
                continue

            if batch:
                ver = sum(
                    fg.blocks[bid]._params_version for bid in cfg.pure_ids
                )
                if params_cache is None or ver != params_ver:
                    # device_put once per retune: raw numpy params would be
                    # re-uploaded on EVERY dispatch (jax does not cache
                    # host-array transfers), which serializes each step on
                    # H2D round-trips through the TPU tunnel. Mesh-compiled
                    # graphs place params with explicit shardings.
                    put = getattr(cfg, "put_params", jax.device_put)
                    params_cache = put(cfg.gather_params())
                    params_ver = ver
                    self._params_cache = params_cache
                    self._params_ver = params_ver
                if len(batch) > 1 and scan_step is not None:
                    # valid/tag propagation per chunk, in stream order
                    per_chunk = []
                    for _, sv, stg in batch:
                        per_chunk.append(self._propagate_valid(sv, stg))
                    if unroll_ok and batch[0][0]:
                        # host-fed big chunks: K separate operands through
                        # the UNROLLED step — a stacked [K, n] operand
                        # would be re-sliced (= re-copied in front of the
                        # kernels) every scan iteration (make_unrolled_step
                        # docstring; 1.5x measured on the fused bank)
                        srcs_list = tuple(
                            {
                                key: cplx.from_numpy(c[0][key])
                                for key in c[0]
                            }
                            for c in batch
                        )
                        states, sink_arrays, aux = cfg.make_unrolled_step(
                            len(batch)
                        )(states, params_cache, srcs_list)
                    else:
                        stacked = {
                            key: cplx.from_numpy(
                                np.stack([c[0][key] for c in batch])
                            )
                            for key in batch[0][0]
                        }
                        if not stacked:  # device-source-only graph: scan
                            # still needs a leading-axis operand to infer
                            # its length. Cached per K as a DEVICE array:
                            # a fresh numpy here would re-upload every
                            # dispatch (H2D through the tunnel costs like
                            # a dispatch, ~200-600 µs)
                            kb = len(batch)
                            cache = getattr(self, "_scan_len_cache", {})
                            if kb not in cache:
                                cache[kb] = jax.device_put(
                                    np.zeros((kb, 1), np.float32)
                                )
                                self._scan_len_cache = cache
                            stacked = {"__scan_len": cache[kb]}
                        states, sink_arrays, aux = scan_step(
                            states, params_cache, stacked
                        )
                    inflight.append(
                        _InflightBatch(
                            sink_arrays=sink_arrays,
                            aux=aux,
                            chunks=per_chunk,
                        )
                    )
                else:
                    for src_host, sv, stg in batch:
                        sink_valid, sink_tags = self._propagate_valid(
                            sv, stg
                        )
                        src_arrays = {
                            key: cplx.from_numpy(a)
                            for key, a in src_host.items()
                        }
                        states, sink_arrays, aux = cfg.step(
                            states, params_cache, src_arrays
                        )
                        inflight.append(
                            _Inflight(
                                sink_arrays=sink_arrays,
                                aux=aux,
                                sink_valid=sink_valid,
                                sink_tags=sink_tags,
                            )
                        )
                step_no += len(batch)
                # steps_run = this run only (stats rates divide by this
                # run's elapsed time); steps_total spans restores
                self.steps_run = step_no
                self.steps_total = step_base + step_no

            # -- deliver completed steps ----------------------------------
            while inflight and (eos or len(inflight) >= self.max_inflight):
                self._deliver_full(inflight.popleft(), lat_left)

            if eos:
                break

        # drain remaining inflight; ensure the device stream has retired.
        # A data-dependent tail fetch, not block_until_ready: through the
        # TPU tunnel block_until_ready can return WITHOUT waiting (measured
        # 0.2 ms "block" vs 422 ms fetch for the same program), so only a
        # device_get is a trustworthy settle point.
        while inflight:
            self._deliver_full(inflight.popleft(), lat_left)
        self._states, self._lat_left = states, lat_left
        if self._snap_req is not None:  # snapshot raced the shutdown
            self._handle_snap_req(states, lat_left, step_base + step_no)
        self._probes.clear()
        if getattr(self, "_last_arrays", None) is not None:
            self._settle(self._last_arrays)
        self._drain_messages()
        for b in fg.blocks:
            b.on_finish()
        self._t_stop = time.monotonic()


_cache_enabled = False


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache: TPU compile latency through shared
    backends is high and highly variable (measured 2–250 s for the same
    program), so amortizing across runs matters more than on CPU/GPU."""
    global _cache_enabled
    if _cache_enabled:
        return
    path = config.get("compile_cache_dir", "~/.cache/futuresdr_tpu/xla")
    if not path:
        return
    import os

    path = os.path.expanduser(str(path))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _cache_enabled = True
    except Exception:
        pass


class Runtime:
    """Top-level entry (parity: ``Runtime`` at ``runtime.rs:55-207``)."""

    def __init__(
        self,
        chunk_size: Optional[int] = None,
        max_inflight: int = 2,
        mesh=None,
        mesh_axis: str = "time",
    ):
        self.chunk_size = chunk_size
        self.max_inflight = max_inflight
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        _enable_compile_cache()

    def run(
        self,
        fg: Flowgraph,
        max_steps: Optional[int] = None,
        restore: Optional[str] = None,
    ) -> Flowgraph:
        """Run a flowgraph to completion; returns it with block state
        intact (parity: ``runtime.rs:204-207`` + ``restore_blocks``).
        ``restore`` resumes from an :meth:`Executor.snapshot` checkpoint."""
        ex = Executor(
            fg,
            chunk_size=self.chunk_size,
            max_inflight=self.max_inflight,
            max_steps=max_steps,
            restore=restore,
            mesh=self.mesh,
            mesh_axis=self.mesh_axis,
        )
        ex.running = True
        try:
            ex.run_loop()
        finally:
            ex.running = False
            ex._done.set()
            for b in fg.blocks:
                b._rate_locked = False  # run over (or raised): cfg dead
        return fg

    def start(
        self,
        fg: Flowgraph,
        max_steps: Optional[int] = None,
        restore: Optional[str] = None,
    ) -> FlowgraphHandle:
        """Start a flowgraph in the background; returns its handle
        (registered with the REST control port when ``ctrlport_enable``)."""
        ex = Executor(
            fg,
            chunk_size=self.chunk_size,
            max_inflight=self.max_inflight,
            max_steps=max_steps,
            restore=restore,
            mesh=self.mesh,
            mesh_axis=self.mesh_axis,
        )
        handle = ex.start()
        from futuresdr_tpu.runtime.ctrl_port import global_ctrl_port

        cp = global_ctrl_port()
        if cp is not None:
            ex.fg_id = cp.register(handle)
        return handle
