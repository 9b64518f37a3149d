"""Stream-manipulation blocks.

Parity: ``src/blocks/{copy,head,delay,moving_avg,throttle,
stream_duplicator,stream_deinterleaver}.rs``.
"""

from __future__ import annotations

import time
from typing import Optional

import jax.numpy as jnp
import numpy as np

from futuresdr_tpu.ops import cplx
from futuresdr_tpu.runtime.block import Block, PortSpec, message_handler
from futuresdr_tpu.types.pmt import Pmt


class Copy(Block):
    """Pass-through (parity: copy.rs — the perf harness workhorse)."""

    def __init__(self, dtype=np.complex64, name: Optional[str] = None):
        super().__init__(name)
        self.stream_inputs = [PortSpec("in", dtype)]
        self.stream_outputs = [PortSpec("out", dtype)]
        self.rate_in = (1,)
        self.rate_out = (1,)

    def apply(self, state, inputs, params):
        return state, [inputs[0]], {}


class Head(Block):
    """Pass the first ``n`` items then finish the flowgraph
    (parity: head.rs:84 — ``io.finished`` after n items).

    Device-side it is a pass-through; the cap is host-side valid-count
    limiting (the executor trims the final chunk exactly)."""

    def __init__(self, n: int, dtype=np.complex64, name: Optional[str] = None):
        super().__init__(name)
        self.n = int(n)
        self._remaining = int(n)
        self._lat_free = 0
        self.stream_inputs = [PortSpec("in", dtype)]
        self.stream_outputs = [PortSpec("out", dtype)]
        self.rate_in = (1,)
        self.rate_out = (1,)

    def absorb_latency(self, in_lats):
        # upstream transient items pass through without consuming the
        # budget (the sink trims them), so Head(n) delivers exactly n
        self._lat_free = int(in_lats[0]) if in_lats else 0
        return [self._lat_free]

    def apply(self, state, inputs, params):
        return state, [inputs[0]], {}

    def host_limit(self, port: int, valid: int) -> int:
        free = min(valid, self._lat_free)
        self._lat_free -= free
        v = min(valid - free, self._remaining)
        self._remaining -= v
        if self._remaining == 0:
            self.request_finish()
        return free + v

    def host_state(self):
        return {"remaining": self._remaining, "lat_free": self._lat_free}

    def set_host_state(self, state) -> None:
        self._remaining = int(state["remaining"])
        self._lat_free = int(state["lat_free"])


class Delay(Block):
    """Shift the stream: ``n > 0`` inserts ``n`` zero samples at stream
    start (pad); ``n < 0`` drops the first ``|n|`` samples (skip) —
    parity: delay.rs:169 ``State::{Pad,Skip}``.

    Skip rides the latency calculus: the device still shifts through an
    ``|n|``-sample state (identical kernel to pad), and the compiler
    trims ``2|n|`` leading items — the state-priming zeros plus the
    skipped samples — so sinks see ``x[|n|:]``. Like pad, the final
    ``|n|`` input items stay in the state at EOS (the 1:1 SDF
    convention)."""

    def __init__(self, n: int, dtype=np.complex64, name: Optional[str] = None):
        super().__init__(name)
        self.n = int(n)
        self.stream_inputs = [PortSpec("in", dtype)]
        self.stream_outputs = [PortSpec("out", dtype)]
        self.rate_in = (1,)
        self.rate_out = (1,)
        self._complex = np.dtype(dtype) == np.complex64
        self.state_suffix_in = (abs(self.n),)  # state = last |n| inputs

    @message_handler("new_value")
    def _new_value(self, pmt: Pmt) -> Pmt:
        """Adjust the shift (parity: delay.rs:68-105 — a map
        ``{"pad": bool, "value": int}`` accumulates onto the current
        pad/skip). The shift is compiled into the state shape and the
        latency ledger, so it can only change BEFORE compilation; the
        reference's mid-stream pad/skip is a dynamic-rate step a static
        SDF program cannot express — an explicit error, not a silent
        wrong shift. ``Pmt::Null`` queries the current ``n``."""
        v = pmt.to_py()
        if v is None:
            return Pmt.from_py(self.n)
        if not isinstance(v, dict) or "pad" not in v or "value" not in v:
            raise ValueError('new_value takes {"pad": bool, "value": int}')
        if self._rate_locked:
            raise RuntimeError(
                "new_value cannot change a compiled flowgraph's shift "
                "(state shape + latency are static): stop the graph, "
                "adjust, and run again"
            )
        delta = int(v["value"])
        self.n += delta if bool(v["pad"]) else -delta
        self.state_suffix_in = (abs(self.n),)
        return Pmt.from_py(self.n)

    def make_state(self, in_sizes, out_sizes):
        shape = (abs(self.n),)
        return (
            cplx.czeros(shape) if self._complex else jnp.zeros(shape, jnp.float32)
        )

    def absorb_latency(self, in_lats):
        """Pad: with a transient-free input the inserted zeros are
        semantic (latency 0, reference parity); inside an upstream
        transient a static 1:1 block cannot reorder zeros ahead of the
        garbage, so the delay degrades to a pure stream shift (the zeros
        count into the trimmed transient). Skip: always trims — the
        ``|n|`` state-priming zeros plus the ``|n|`` samples to drop."""
        L = int(in_lats[0]) if in_lats else 0
        if self.n < 0:
            return [L + 2 * (-self.n)]
        return [0 if L == 0 else L + self.n]

    def apply(self, state, inputs, params):
        x = inputs[0]
        if self.n == 0:
            return state, [x], {}
        ext = cplx.concat([state, x], axis=-1)
        y = ext[..., : x.shape[-1]]
        new_state = ext[..., x.shape[-1] :]
        return new_state, [y], {}


class MovingAvg(Block):
    """Sliding average over ``width`` items, 1:1 with width−1 transient
    (parity: moving_avg.rs:122 — const-generic width)."""

    def __init__(self, width: int, dtype=np.float32, name: Optional[str] = None):
        super().__init__(name)
        self.width = int(width)
        self.stream_inputs = [PortSpec("in", dtype)]
        self.stream_outputs = [PortSpec("out", dtype)]
        self.rate_in = (1,)
        self.rate_out = (1,)
        self.latency_out = (self.width - 1,)
        self._complex = np.dtype(dtype) == np.complex64
        self.state_suffix_in = (self.width - 1,)  # sliding window tail

    def make_state(self, in_sizes, out_sizes):
        shape = (self.width - 1,)
        return (
            cplx.czeros(shape) if self._complex else jnp.zeros(shape, jnp.float32)
        )

    def apply(self, state, inputs, params):
        from futuresdr_tpu.ops import cplx as _cplx
        from futuresdr_tpu.ops.fir import moving_sum

        x = _cplx.asarray(inputs[0])
        # O(N) rowwise-cumsum moving sum (an all-ones FIR through the
        # Toeplitz matmul does O(N·width) work; measured 240+ ms vs ~0
        # at multi-M chunks on v5e)
        ext = _cplx.concat([state, x], axis=-1) if self.width > 1 else x
        y = moving_sum(ext, self.width) * (1.0 / self.width)
        if self.width > 1:
            new_state = ext[..., ext.shape[-1] - (self.width - 1) :]
        else:
            new_state = state
        return new_state, [y], {}


class Throttle(Block):
    """Rate-limit the stream to ``rate`` items/sec using the wall clock
    (parity: throttle.rs:61-103). Device-side pass-through; the pacing
    happens in the host loop."""

    def __init__(self, rate: float, dtype=np.complex64, name: Optional[str] = None):
        super().__init__(name)
        self.rate = float(rate)
        self.stream_inputs = [PortSpec("in", dtype)]
        self.stream_outputs = [PortSpec("out", dtype)]
        self.rate_in = (1,)
        self.rate_out = (1,)
        self._t0: Optional[float] = None
        self._items = 0

    def apply(self, state, inputs, params):
        return state, [inputs[0]], {}

    def host_limit(self, port: int, valid: int) -> int:
        now = time.monotonic()
        if self._t0 is None:
            self._t0 = now
        self._items += valid
        target = self._t0 + self._items / self.rate
        if target > now:
            time.sleep(target - now)
        return valid


class StreamDuplicator(Block):
    """1→N copies (parity: stream_duplicator.rs). Note plain fan-out needs
    no block at all — an output port may feed multiple inputs directly."""

    def __init__(self, n_out: int = 2, dtype=np.complex64, name=None):
        super().__init__(name)
        self.stream_inputs = [PortSpec("in", dtype)]
        self.stream_outputs = [PortSpec(f"out{i}", dtype) for i in range(n_out)]
        self.rate_in = (1,)
        self.rate_out = (1,) * n_out

    def apply(self, state, inputs, params):
        return state, [inputs[0]] * len(self.stream_outputs), {}


class DropPolicy:
    """What a :class:`Selector` does with unselected inputs
    (parity: ``src/blocks/selector.rs:10-23``)."""

    DROP_ALL = "DropAll"
    SAME_RATE = "SameRate"
    NO_DROP = "NoDrop"

    _ALIASES = {
        "same": SAME_RATE,
        "same-rate": SAME_RATE,
        "same_rate": SAME_RATE,
        "samerate": SAME_RATE,
        "none": NO_DROP,
        "nodrop": NO_DROP,
        "no-drop": NO_DROP,
        "no_drop": NO_DROP,
        "all": DROP_ALL,
        "dropall": DROP_ALL,
        "drop-all": DROP_ALL,
        "drop_all": DROP_ALL,
    }

    @classmethod
    def parse(cls, s: str) -> str:
        """String forms accepted by the reference (selector.rs:25-49)."""
        v = cls._ALIASES.get(str(s).lower())
        if v is None:
            raise ValueError(f"unknown DropPolicy {s!r}")
        return v


class Selector(Block):
    """N×M switch: routes input ``input_index`` to output ``output_index``
    (parity: selector.rs:29-60, 180-217 — message handlers retune the
    route; here the indices are device params so switching never
    recompiles).

    Non-selected outputs emit zeros; all ports run at the same static rate.

    Drop policies (reference ``DropPolicy``), restated for the static SDF
    executor where every input presents exactly one chunk per step:

    - ``SameRate`` (default): unselected chunks are consumed and dropped
      each step — identical to the reference's steady state (consume
      exactly ``m``, selector.rs:200-203); nothing is ever buffered.
    - ``NoDrop``: unselected inputs are NOT lost — each input carries a
      device-resident ring of ``hold_chunks`` whole chunks. While
      unselected, live chunks append to the ring (newest dropped once the
      ring is full — the bounded-memory stand-in for the reference's
      upstream backpressure); while selected with a backlog, the oldest
      buffered chunk is emitted and the live chunk re-queued, so samples
      come out in arrival order after a switch.
    - ``DropAll``: unselected inputs accrue a bounded backlog that the
      switch **drains** (the reference's consume-everything,
      ``consume(usize::MAX)``, selector.rs:204-207) — output resumes from
      live samples immediately. Since drained data can never be emitted,
      only per-input COUNTERS are kept (no device ring); the drained
      backlog size (in chunks, capped at ``hold_chunks``) is surfaced in
      aux as ``selector_flushed`` (→ ``last_aux``), the lockstep-SDF
      observable of the reference's drain."""

    def __init__(
        self,
        n_in: int,
        n_out: int,
        dtype=np.complex64,
        drop_policy: str = DropPolicy.SAME_RATE,
        hold_chunks: int = 8,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        if drop_policy not in (
            DropPolicy.SAME_RATE,
            DropPolicy.DROP_ALL,
            DropPolicy.NO_DROP,
        ):
            drop_policy = DropPolicy.parse(drop_policy)
        self.drop_policy = drop_policy
        self.hold_chunks = int(hold_chunks)
        self.stream_inputs = [PortSpec(f"in{i}", dtype) for i in range(n_in)]
        self.stream_outputs = [PortSpec(f"out{i}", dtype) for i in range(n_out)]
        self.rate_in = (1,) * n_in
        self.rate_out = (1,) * n_out
        self._complex = np.dtype(dtype) == np.complex64
        self._params["input_index"] = np.int32(0)
        self._params["output_index"] = np.int32(0)

    @message_handler("input_index")
    def _set_in(self, pmt: Pmt) -> Pmt:
        v = pmt.to_py()
        if v is not None:  # Finished/Ok = query only (selector.rs:141-144)
            n = len(self.stream_inputs)
            self.set_param("input_index", np.int32(int(v) % n))
        return Pmt.u32(int(self._params["input_index"]))

    @message_handler("output_index")
    def _set_out(self, pmt: Pmt) -> Pmt:
        v = pmt.to_py()
        if v is not None:
            m = len(self.stream_outputs)
            self.set_param("output_index", np.int32(int(v) % m))
        return Pmt.u32(int(self._params["output_index"]))

    def make_state(self, in_sizes, out_sizes):
        if self.drop_policy == DropPolicy.SAME_RATE:
            return None
        n, k, r = len(self.stream_inputs), self.hold_chunks, in_sizes[0]
        if self.drop_policy == DropPolicy.DROP_ALL:
            # only the backlog COUNT is observable for DropAll (buffered
            # data is always drained at the switch before it could ever
            # be emitted), so the state is per-input counters + the
            # previous selection — no device ring at all
            return (jnp.zeros((n,), jnp.int32), jnp.int32(0))
        buf = (
            cplx.czeros((n, k, r))
            if self._complex
            else jnp.zeros((n, k, r), jnp.float32)
        )
        head = jnp.zeros((n,), jnp.int32)
        count = jnp.zeros((n,), jnp.int32)
        return (buf, head, count)

    def _route(self, emit, params):
        outs = []
        for m in range(len(self.stream_outputs)):
            outs.append(
                cplx.apply1(
                    lambda t: jnp.where(
                        params["output_index"] == m, t, jnp.zeros_like(t)
                    ),
                    emit,
                )
            )
        return outs

    def apply(self, state, inputs, params):
        import jax

        if self.drop_policy != DropPolicy.NO_DROP:
            # SameRate / DropAll emit the live selected chunk every step
            # (nothing buffered is ever emitted); DropAll additionally
            # tracks per-input backlog counters + drains them at the
            # switch (the reference's consume-everything,
            # selector.rs:204-207), surfacing the drained size in aux
            stacked = cplx.stack(inputs, axis=0)  # [N, C]
            idx = params["input_index"]
            emit = cplx.apply1(
                lambda t: jax.lax.dynamic_index_in_dim(
                    t, idx, 0, keepdims=False
                ),
                stacked,
            )
            if self.drop_policy == DropPolicy.SAME_RATE:
                return state, self._route(emit, params), {}
            count, prev = state
            sel = jnp.arange(len(inputs), dtype=jnp.int32) == idx
            switched = sel & (prev != idx)
            flushed = jnp.where(switched, count, 0).sum()
            c0 = jnp.where(switched, 0, count)
            new_count = jnp.where(
                sel, c0, jnp.minimum(c0 + 1, self.hold_chunks)
            )
            return (
                (new_count, jnp.asarray(idx, jnp.int32)),
                self._route(emit, params),
                {"selector_flushed": flushed},
            )

        buf, head, count = state
        k = self.hold_chunks
        idx = params["input_index"]
        emit = None
        new_bufs, new_heads, new_counts = [], [], []
        for i, live in enumerate(inputs):
            buf_i = buf[i]  # [K, R]
            h_i, c_i = head[i], count[i]
            sel = idx == i
            has = c_i > 0
            pop = sel & has
            push = pop | (~sel & (c_i < k))
            oldest = cplx.apply1(
                lambda t: jax.lax.dynamic_index_in_dim(
                    t, h_i, 0, keepdims=False
                ),
                buf_i,
            )
            cand = jax.tree_util.tree_map(
                lambda o, v: jnp.where(has, o, v), oldest, cplx.asarray(live)
            )
            part = cplx.apply1(
                lambda t: jnp.where(sel, t, jnp.zeros_like(t)), cand
            )
            emit = part if emit is None else jax.tree_util.tree_map(
                jnp.add, emit, part
            )
            tail = (h_i + c_i) % k
            pushed = jax.tree_util.tree_map(
                lambda b, v: jax.lax.dynamic_update_slice_in_dim(
                    b, v[None], tail, 0
                ),
                buf_i,
                cplx.asarray(live),
            )
            new_bufs.append(
                jax.tree_util.tree_map(
                    lambda p, b: jnp.where(push, p, b), pushed, buf_i
                )
            )
            new_heads.append(jnp.where(pop, (h_i + 1) % k, h_i))
            new_counts.append(
                c_i - pop.astype(jnp.int32) + push.astype(jnp.int32)
            )
        ring = (
            cplx.stack(new_bufs, axis=0),
            jnp.stack(new_heads),
            jnp.stack(new_counts),
        )
        return ring, self._route(emit, params), {}


class TagDebug(Block):
    """Print tags flowing past (parity: tag_debug.rs:85)."""

    def __init__(self, label: str = "", dtype=np.complex64, name=None):
        super().__init__(name)
        self.label = label
        self.stream_inputs = [PortSpec("in", dtype)]
        self.stream_outputs = [PortSpec("out", dtype)]
        self.rate_in = (1,)
        self.rate_out = (1,)
        self.seen = []
        self._abs = 0

    def apply(self, state, inputs, params):
        return state, [inputs[0]], {}

    def host_limit(self, port: int, valid: int) -> int:
        self._abs += valid
        return valid

    def propagate_tags(self, tags_in, in_items, out_items):
        for t in tags_in[0]:
            self.seen.append(t)
            print(f"TagDebug[{self.label}] @{self._abs}+{t.index}: {t.tag}")
        return [list(tags_in[0])]


class StreamDeinterleaver(Block):
    """Round-robin 1→N deinterleave (parity: stream_deinterleaver.rs:98)."""

    def __init__(self, n_out: int = 2, dtype=np.complex64, name=None):
        super().__init__(name)
        self.n = int(n_out)
        self.stream_inputs = [PortSpec("in", dtype)]
        self.stream_outputs = [
            PortSpec(f"out{i}", dtype) for i in range(self.n)
        ]
        self.rate_in = (self.n,)
        self.rate_out = (1,) * self.n

    def apply(self, state, inputs, params):
        x = inputs[0]
        n = self.n
        r = x.shape[-1] // n
        frames = x.reshape(r, n)
        outs = [frames[..., i] for i in range(n)]
        return state, outs, {}
