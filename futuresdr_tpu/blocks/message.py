"""Message-port blocks (host-side Pmt plumbing).

Parity: ``src/blocks/{message_source,message_apply,message_burst,
message_copy,message_pipe,message_sink,message_annotator}.rs``. Message
traffic is host-side control flow between compiled steps; these blocks have
no stream ports and therefore no device cost.
"""

from __future__ import annotations

import queue
import time
from typing import Any, Callable, Dict, List, Optional

from futuresdr_tpu.runtime.block import Block, message_handler
from futuresdr_tpu.types.pmt import Pmt


class MessageSource(Block):
    """Emit a Pmt periodically (parity: message_source.rs:120).

    The executor polls :meth:`host_tick` between steps; messages fire when
    their wall-clock interval has elapsed. ``count`` limits total emissions
    (then the block requests finish, like the reference's Finished)."""

    def __init__(
        self,
        pmt: Any,
        interval: float,
        count: Optional[int] = None,
        name: Optional[str] = None,
    ):
        super().__init__(name)
        self.message_outputs = ["out"]
        self.pmt = pmt if isinstance(pmt, Pmt) else Pmt.from_py(pmt)
        self.interval = float(interval)
        self.count = count
        self._sent = 0
        self._next_t: Optional[float] = None

    def host_tick(self) -> None:
        now = time.monotonic()
        if self._next_t is None:
            self._next_t = now + self.interval
            return
        while now >= self._next_t:
            if self.count is not None and self._sent >= self.count:
                self.request_finish()
                return
            self.post("out", self.pmt)
            self._sent += 1
            self._next_t += self.interval


class MessageApply(Block):
    """Map each incoming Pmt with a function; None drops it
    (parity: message_apply.rs:65)."""

    def __init__(self, fn: Callable[[Pmt], Optional[Any]], name=None):
        super().__init__(name)
        self.fn = fn
        self.message_outputs = ["out"]

    @message_handler("in")
    def _in(self, pmt: Pmt) -> Pmt:
        out = self.fn(pmt)
        if out is not None:
            self.post("out", out if isinstance(out, Pmt) else Pmt.from_py(out))
        return Pmt.ok()


class MessageCopy(Block):
    """Forward every Pmt (parity: message_copy.rs:58)."""

    def __init__(self, name=None):
        super().__init__(name)
        self.message_outputs = ["out"]

    @message_handler("in")
    def _in(self, pmt: Pmt) -> Pmt:
        self.post("out", pmt)
        return Pmt.ok()


class MessageBurst(Block):
    """On trigger, emit ``n`` copies of a Pmt (parity: message_burst.rs:66)."""

    def __init__(self, pmt: Any, n: int, name=None):
        super().__init__(name)
        self.message_outputs = ["out"]
        self.pmt = pmt if isinstance(pmt, Pmt) else Pmt.from_py(pmt)
        self.n = int(n)

    @message_handler("in")
    def _in(self, _pmt: Pmt) -> Pmt:
        for _ in range(self.n):
            self.post("out", self.pmt)
        return Pmt.ok()


class MessageSink(Block):
    """Collect every received Pmt (parity: message_sink.rs:67)."""

    def __init__(self, name=None):
        super().__init__(name)
        self.received: List[Pmt] = []

    @message_handler("in")
    def _in(self, pmt: Pmt) -> Pmt:
        self.received.append(pmt)
        return Pmt.ok()


class MessagePipe(Block):
    """Forward Pmts into a python queue for external consumers
    (parity: message_pipe.rs:60 — futures mpsc)."""

    def __init__(self, q: Optional["queue.Queue"] = None, name=None):
        super().__init__(name)
        self.queue: "queue.Queue[Pmt]" = q if q is not None else queue.Queue()

    @message_handler("in")
    def _in(self, pmt: Pmt) -> Pmt:
        self.queue.put(pmt)
        return Pmt.ok()


class MessageAnnotator(Block):
    """Wrap each Pmt in a MapStrPmt with extra fields
    (parity: message_annotator.rs:81)."""

    def __init__(self, annotations: Dict[str, Any], key: str = "msg", name=None):
        super().__init__(name)
        self.message_outputs = ["out"]
        self.annotations = annotations
        self.key = key

    @message_handler("in")
    def _in(self, pmt: Pmt) -> Pmt:
        d = dict(self.annotations)
        d[self.key] = pmt.to_py()
        self.post("out", Pmt.from_py(d))
        return Pmt.ok()
