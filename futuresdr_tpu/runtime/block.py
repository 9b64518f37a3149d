"""Block model.

Parity: the reference ``Kernel`` trait (``src/runtime/kernel.rs:54-90``) and
``WorkIo`` (``src/runtime/work_io.rs``) — redesigned for XLA:

* A **pure block** is a function ``apply(state, inputs, params) ->
  (state, outputs, aux)`` plus a declared rational *rate signature*
  (items consumed/produced per work unit). The graph compiler solves exact
  chunk sizes, so the imperative back-pressure protocol (``WorkIo``,
  ``ComputationStatus``) disappears: buffers are always exactly sufficient.
* **Host blocks** (sources/sinks) sit at the graph boundary and move numpy
  chunks in/out of the device program (the reference's ``#[blocking]``
  hardware blocks, ``block.rs:62-65``).
* ``WorkIo::finished`` becomes: host sources return EOS (any finished
  input terminates the flowgraph); pure blocks cap/finish via
  :meth:`Block.host_limit` + :meth:`Block.request_finish` (Head), or
  surface device events through ``aux`` → :meth:`Block.on_aux`.
* Message ports/handlers run host-side between steps; retunable values are
  **params** — device scalars passed as jit arguments so updates never
  recompile (replaces ``kernel.call_handler`` dispatch,
  ``kernel_interface.rs:55-62``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from futuresdr_tpu.runtime.tags import ItemTag, TagPropagation
from futuresdr_tpu.types.pmt import Pmt


@dataclass(frozen=True)
class PortSpec:
    """A stream port: name + dtype (numpy dtype-like)."""

    name: str
    dtype: Any = np.complex64


@dataclass
class BlockSpec:
    """Static interface description (what #[derive(Block)] generates in the
    reference, ``crates/macros/src/lib.rs:419-431``)."""

    type_name: str
    stream_inputs: List[PortSpec]
    stream_outputs: List[PortSpec]
    message_inputs: List[str]
    message_outputs: List[str]


def message_handler(name: Optional[str] = None):
    """Decorator marking a method as a message-port handler.

    Handlers have signature ``(self, pmt: Pmt) -> Pmt`` and run host-side
    between compiled steps (parity: ``#[message_handler]`` methods reached
    via ``kernel.call_handler``).
    """

    def deco(fn):
        fn._handler_name = name or fn.__name__
        return fn

    return deco


class _ParamDict(dict):
    """Device-param dict that bumps the owning block's
    ``_params_version`` on every mutation. The executor's device params
    cache is invalidated by the version SUM across blocks, so a handler
    that writes ``self._params[k] = v`` directly (instead of going
    through :meth:`Block.set_param`) must still be seen — otherwise the
    retune silently never reaches the device."""

    def __init__(self, owner: "Block"):
        super().__init__()
        self._owner = owner

    def _bump(self) -> None:
        self._owner._params_version += 1

    def __setitem__(self, k, v):
        super().__setitem__(k, v)
        self._bump()

    def __delitem__(self, k):
        super().__delitem__(k)
        self._bump()

    def update(self, *a, **kw):
        super().update(*a, **kw)
        self._bump()

    def pop(self, *a):
        r = super().pop(*a)
        self._bump()
        return r

    def clear(self):
        super().clear()
        self._bump()

    def setdefault(self, k, default=None):
        had = k in self
        r = super().setdefault(k, default)
        if not had:
            self._bump()
        return r


class Block:
    """Base class for all blocks.

    Subclasses set ports/rates in ``__init__`` and implement either the
    pure-device API (:meth:`make_state`, :meth:`apply`) or the host API
    (:meth:`host_produce` / :meth:`host_consume`).
    """

    # ---- mesh (time-sharded) execution protocol -------------------------
    # state_suffix_in: per input port, the number of TRAILING input items
    # sufficient to rebuild this block's device state exactly by running
    # `apply` over them from the `make_state` initial state (FIR history,
    # demod continuity, PFB window rows). None = either stateless (fine)
    # or not time-shardable (IIR, NCO phase accumulators — state depends
    # on absolute stream position). See runtime/mesh.py.
    state_suffix_in: Optional[Tuple[int, ...]] = None
    # sharded_params: names of params split along their last axis across
    # the mesh (e.g. a ResidentSource's whole-chunk buffer). Blocks that
    # declare any get `make_state` called with FULL chunk sizes under a
    # mesh (their params span the global chunk); all others see their
    # per-shard segment sizes.
    sharded_params: Tuple[str, ...] = ()

    # ---- interface (set by subclass __init__) --------------------------
    def __init__(self, name: Optional[str] = None):
        self.instance_name = name or type(self).__name__
        # True while a compiled Executor holds this block's rate
        # signature (set at compile, cleared when the run ends) — guards
        # pre-compile-only retunes like Fft.fft_size / Delay.new_value
        self._rate_locked = False
        self.stream_inputs: List[PortSpec] = []
        self.stream_outputs: List[PortSpec] = []
        self.message_outputs: List[str] = []
        # items consumed/produced per work unit, one entry per port
        self.rate_in: Tuple[int, ...] = ()
        self.rate_out: Tuple[int, ...] = ()
        self.tag_propagation = TagPropagation.PROPAGATE
        self.is_blocking = False  # host-I/O bound (drivers, audio, network)
        # True when this source calls notify_data() whenever new data
        # arrives: the executor then sleeps event-driven instead of
        # falling back to a short poll when the graph goes idle.
        self.notifies = False
        self._params_version = 0
        # auto-versioning: ANY mutation path (set_param or a handler's
        # direct ``self._params[k] = v``) invalidates the executor's
        # device params cache
        self._params: Dict[str, np.ndarray] = _ParamDict(self)
        self._finished_requested = False
        self._wake_fn = None  # executor wakeup (set while running)
        self.last_aux: Dict[str, np.ndarray] = {}

    def notify_data(self) -> None:
        """Wake the executor's idle wait — call from any thread after
        handing this block new data (the reference's coalescing
        ``BlockNotifier::notify``, block_inbox.rs:48-52)."""
        fn = self._wake_fn
        if fn is not None:
            fn()

    # ---- classification ------------------------------------------------
    @property
    def type_name(self) -> str:
        return type(self).__name__

    @property
    def is_host_source(self) -> bool:
        return not self.stream_inputs and hasattr(self, "host_produce")

    @property
    def is_host_sink(self) -> bool:
        return not self.stream_outputs and hasattr(self, "host_consume")

    @property
    def is_pure(self) -> bool:
        return not (self.is_host_source or self.is_host_sink)

    # ---- pure-device API -------------------------------------------------
    def make_state(self, in_sizes: Sequence[int], out_sizes: Sequence[int]):
        """Initial device state pytree for the solved chunk sizes."""
        return ()

    def apply(self, state, inputs: List[Any], params: Dict[str, Any]):
        """Pure chunk transform: returns ``(state, outputs, aux)``.

        Must be traceable (jnp ops only, static shapes). ``inputs`` /
        ``outputs`` are lists of arrays matching the port lists; ``aux`` is
        a (possibly empty) dict of small arrays surfaced to the host.
        """
        raise NotImplementedError

    # ---- host API (sources/sinks implement these) ----------------------
    # def host_produce(self, n: int, port: int = 0) -> Optional[np.ndarray]:
    #     """Return up to n items; fewer/None signals EOS (pad handled by
    #     the executor). May return (arr, List[ItemTag])."""
    # def host_consume(self, arr: np.ndarray, tags: List[ItemTag],
    #                  port: int = 0) -> None:
    #     """Receive a chunk of valid output items."""

    def host_limit(self, port: int, valid: int) -> int:
        """Host hook on valid-count propagation: cap the number of valid
        items on output ``port`` this step (Head-style limiting). Blocks
        may also :meth:`request_finish` here."""
        return valid

    def host_consume_count(self, valid: int) -> None:
        """Hook for counting sinks with ``device_reduce`` (no D2H data)."""

    def on_finish(self) -> None:
        """Host hook: called once when the flowgraph finishes."""

    # ---- checkpoint/resume (host-side position & accumulation) ----------
    def host_state(self):
        """Snapshot of host-side state (stream position, accumulated
        output, …) for :meth:`Executor.snapshot`. ``None`` (default) =
        stateless on the host; device-side state is captured separately
        by the executor. Must be picklable."""
        return None

    def set_host_state(self, state) -> None:
        """Restore what :meth:`host_state` captured."""

    # ---- params (retunable device scalars) -----------------------------
    def params(self) -> Dict[str, np.ndarray]:
        """Current device params; passed as jit args every step."""
        return dict(self._params)

    def set_param(self, key: str, value) -> None:
        """Update a device param. Preferred retune path: coerces the new
        value to the existing entry's dtype/shape. Direct writes to
        ``self._params[...]`` also work (``_params`` auto-bumps
        ``_params_version`` on mutation, which is what invalidates the
        executor's device params cache), but skip the coercion."""
        if key in self._params:
            old = np.asarray(self._params[key])
            new = np.asarray(value, dtype=old.dtype).reshape(old.shape)
            self._params[key] = new
        else:
            self._params[key] = np.asarray(value)
        self._params_version += 1

    # ---- aux / lifecycle hooks ------------------------------------------
    def on_aux(self, aux: Dict[str, np.ndarray]) -> None:
        """Host hook: called after each step with this block's aux output
        (before sinks consume that step — downstream sinks may read
        ``last_aux`` of an upstream block, e.g. a valid count for
        fixed-capacity variable-rate outputs)."""
        self.last_aux = aux

    def request_finish(self) -> None:
        self._finished_requested = True

    @property
    def finish_requested(self) -> bool:
        return self._finished_requested

    def propagate_tags(
        self,
        tags_in: List[List[ItemTag]],
        in_items: Sequence[int],
        out_items: Sequence[int],
    ) -> List[List[ItemTag]]:
        """Custom tag propagation (used when tag_propagation == CUSTOM)."""
        raise NotImplementedError

    # ---- message handlers -----------------------------------------------
    def handlers(self) -> Dict[str, Callable[[Pmt], Pmt]]:
        out: Dict[str, Callable[[Pmt], Pmt]] = {}
        for cls in type(self).__mro__:
            for attr, val in vars(cls).items():
                hname = getattr(val, "_handler_name", None)
                if hname and hname not in out:
                    out[hname] = getattr(self, attr)
        return out

    def call_handler(self, name: str, pmt: Pmt) -> Pmt:
        h = self.handlers().get(name)
        if h is None:
            raise KeyError(
                f"block {self.instance_name} has no message handler {name!r}"
            )
        result = h(pmt)
        return result if isinstance(result, Pmt) else Pmt.from_py(result)

    # message posting is wired by the executor at start
    _post_fn: Optional[Callable[[str, Pmt], None]] = None

    def post(self, port: str, pmt: Pmt) -> None:
        """Emit a Pmt on a named message output port (host-side)."""
        if self._post_fn is not None:
            self._post_fn(port, pmt)

    # ---- description -----------------------------------------------------
    def spec(self) -> BlockSpec:
        return BlockSpec(
            type_name=self.type_name,
            stream_inputs=list(self.stream_inputs),
            stream_outputs=list(self.stream_outputs),
            message_inputs=sorted(self.handlers().keys()),
            message_outputs=list(self.message_outputs),
        )

    def __repr__(self) -> str:
        return f"<{self.type_name} {self.instance_name!r}>"
