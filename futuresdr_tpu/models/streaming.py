"""Shared streaming-receiver harness: dispatch/collect split + pipelining.

The reference's actor runtime streams *every* receiver by construction —
each block is an async task on a ring buffer, so a chunk's device work
always overlaps the previous chunk's host-side decode
(``src/runtime/wrapped_kernel.rs:60-232``). In the fused-program TPU
design the same property comes from splitting a receiver into:

* ``_dispatch(chunk) -> handle`` — launch the chunk's device program(s)
  and return un-fetched device references (NO host sync); plus whatever
  host context ``_collect`` needs.
* ``_collect(handle) -> frames`` — the blocking fetch(es) + host decode.

``process`` is simply ``collect(dispatch(chunk))``; ``process_stream``
dispatches chunk ``i+1`` *before* collecting chunk ``i``, so the fetch
round-trip (~28-40 ms through tunneled hosts, the dominant cost of small
streaming captures) overlaps the next chunk's device compute: steady state
costs ``max(device+fetch, host decode)`` instead of their sum. WLAN
measured 73 → 104.5 MS/s from exactly this overlap (NOTES round-3).

Receivers whose decode is a host-side chain (LoRa's staged walk) still
gain the first-stage overlap; receivers with no device work at all
degrade gracefully to per-chunk ``process`` with identical results.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, List


class StreamingReceiver:
    """Base for batched modem receivers with a pipelined stream mode."""

    def _dispatch(self, chunk) -> Any:
        """Launch device work for one chunk; must not block on the host.

        Returns an opaque handle for :meth:`_collect`."""
        raise NotImplementedError

    def _collect(self, handle) -> List[Any]:
        """Fetch + host-decode one dispatched chunk; returns its frames."""
        raise NotImplementedError

    def process(self, chunk) -> List[Any]:
        """Decode one chunk (single-shot)."""
        return self._collect(self._dispatch(chunk))

    def process_stream(
        self, chunks: Iterable[Any], depth: int = 1
    ) -> Iterator[List[Any]]:
        """Pipelined decode of an iterable of chunks: up to ``depth``
        chunks' device programs stay in flight ahead of the fetch.
        Yields one frame list per chunk, in order; per-chunk results are
        exactly equal to calling :meth:`process` on each chunk in
        sequence. The default overlap (dispatch i+1, then fetch i)
        already reaches steady state ``max(device+fetch, host decode)``;
        measured on-chip, deeper queues gain only ~2-3 % on the shipped
        modems (their steady state is host-decode-bound), so raise
        ``depth`` only on high-RTT links where fetch latency dominates.
        Memory holds ``depth`` chunks' device buffers."""
        if depth < 1:  # validate HERE, not lazily at first next()
            raise ValueError("depth must be >= 1")
        return self._stream_impl(chunks, depth)

    def _stream_impl(
        self, chunks: Iterable[Any], depth: int
    ) -> Iterator[List[Any]]:
        from collections import deque

        pending: deque = deque()
        for c in chunks:
            pending.append(self._dispatch(c))
            if len(pending) > depth:
                yield self._collect(pending.popleft())
        while pending:
            yield self._collect(pending.popleft())
