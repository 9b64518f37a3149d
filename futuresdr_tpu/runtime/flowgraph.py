"""Flowgraph builder.

Parity: ``src/runtime/flowgraph.rs:205-653`` (``Flowgraph``, ``add``,
``stream``, ``message``, ``BlockRef``) and the ``connect!`` macro
(``crates/macros/src/lib.rs:80-138``). Typed port checking happens at
connect time like the reference's zero-erasure ``BufferWriter::connect``;
rate/shape solving is deferred to compile (the reference defers port
validation to run, ``wrapped_kernel.rs:70``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from futuresdr_tpu.runtime.block import Block
from futuresdr_tpu.types.description import (
    BlockDescription,
    FlowgraphDescription,
    MessageEdgeDescription,
    StreamEdgeDescription,
)
from futuresdr_tpu.types.ids import BlockId


@dataclass(frozen=True)
class StreamEdge:
    src: int
    src_port: int
    dst: int
    dst_port: int
    # >0 marks a feedback (close_circuit) edge: the destination reads the
    # source's output delayed by this many items (the z^-D that makes a
    # stream cycle computable). 0 = ordinary forward edge.
    feedback: int = 0


@dataclass(frozen=True)
class MessageEdge:
    src: int
    src_port: str
    dst: int
    dst_handler: str


class ConnectError(Exception):
    """Bad wiring (parity: tests/connect_error.rs expectations)."""


def _port_index(block: Block, ports, port: Union[int, str], kind: str) -> int:
    if isinstance(port, int):
        if not 0 <= port < len(ports):
            raise ConnectError(
                f"{block.instance_name}: {kind} port index {port} out of "
                f"range ({len(ports)} ports)"
            )
        return port
    for i, p in enumerate(ports):
        if p.name == port:
            return i
    raise ConnectError(
        f"{block.instance_name}: no {kind} port named {port!r} "
        f"(has {[p.name for p in ports]})"
    )


class Flowgraph:
    """A DAG of blocks with stream and message edges."""

    def __init__(self):
        self.blocks: List[Block] = []
        self.stream_edges: List[StreamEdge] = []
        self.message_edges: List[MessageEdge] = []
        self.feedback_init: Dict[StreamEdge, float] = {}

    # ---- construction ---------------------------------------------------
    def add(self, block: Block) -> Block:
        """Add a block; returns it (acts as its own BlockRef)."""
        if any(b is block for b in self.blocks):
            return block
        # uniquify instance names for describe/control addressing
        base = block.instance_name
        names = {b.instance_name for b in self.blocks}
        if base in names:
            i = 1
            while f"{base}_{i}" in names:
                i += 1
            block.instance_name = f"{base}_{i}"
        self.blocks.append(block)
        return block

    def block_id(self, block: Union[Block, int, str]) -> int:
        if isinstance(block, Block):
            for i, b in enumerate(self.blocks):
                if b is block:
                    return i
            raise ConnectError(f"{block!r} is not in this flowgraph")
        if isinstance(block, BlockId):
            return int(block)
        if isinstance(block, int):
            if not 0 <= block < len(self.blocks):
                raise ConnectError(f"block id {block} out of range")
            return block
        for i, b in enumerate(self.blocks):
            if b.instance_name == block:
                return i
        raise ConnectError(f"no block named {block!r}")

    def stream(
        self,
        src: Union[Block, int, str],
        dst: Union[Block, int, str],
        src_port: Union[int, str] = 0,
        dst_port: Union[int, str] = 0,
    ) -> None:
        """Connect a stream edge src.out[src_port] → dst.in[dst_port]."""
        s = self.block_id(self.add(src) if isinstance(src, Block) else src)
        d = self.block_id(self.add(dst) if isinstance(dst, Block) else dst)
        sb, db = self.blocks[s], self.blocks[d]
        sp = _port_index(sb, sb.stream_outputs, src_port, "output")
        dp = _port_index(db, db.stream_inputs, dst_port, "input")
        for e in self.stream_edges:
            if e.dst == d and e.dst_port == dp:
                raise ConnectError(
                    f"input {db.instance_name}.{db.stream_inputs[dp].name} "
                    "already connected"
                )
        # dtype check (typed connect, flowgraph.rs:389-419)
        st = np.dtype(sb.stream_outputs[sp].dtype)
        dt = np.dtype(db.stream_inputs[dp].dtype)
        if st != dt:
            raise ConnectError(
                f"dtype mismatch {sb.instance_name}.{sb.stream_outputs[sp].name}"
                f" ({st}) → {db.instance_name}.{db.stream_inputs[dp].name} ({dt})"
            )
        self.stream_edges.append(StreamEdge(s, sp, d, dp))

    def close_circuit(
        self,
        src: Union[Block, int, str],
        dst: Union[Block, int, str],
        src_port: Union[int, str] = 0,
        dst_port: Union[int, str] = 0,
        delay: int = 1,
        init: float = 0.0,
    ) -> None:
        """Close a stream cycle with a ``delay``-item feedback edge
        (parity: ``flowgraph.rs:433`` ``close_circuit`` / the ``<``
        operator of ``connect!``).

        The destination port reads the source's output delayed by
        ``delay`` items (initially ``init``). The compiler carves the
        enclosed blocks into a ``lax.scan`` section stepping ``delay``
        items at a time, so per-sample loops (AGC, PLL, clock recovery)
        stay inside the fused device program. A delay of at least one
        full chunk degenerates to chunk-level feedback with no scan.
        """
        if delay < 1:
            raise ConnectError("close_circuit delay must be >= 1 item")
        s = self.block_id(self.add(src) if isinstance(src, Block) else src)
        d = self.block_id(self.add(dst) if isinstance(dst, Block) else dst)
        sb, db = self.blocks[s], self.blocks[d]
        sp = _port_index(sb, sb.stream_outputs, src_port, "output")
        dp = _port_index(db, db.stream_inputs, dst_port, "input")
        for e in self.stream_edges:
            if e.dst == d and e.dst_port == dp:
                raise ConnectError(
                    f"input {db.instance_name}.{db.stream_inputs[dp].name} "
                    "already connected"
                )
        st = np.dtype(sb.stream_outputs[sp].dtype)
        dt = np.dtype(db.stream_inputs[dp].dtype)
        if st != dt:
            raise ConnectError(
                f"dtype mismatch {sb.instance_name}.{sb.stream_outputs[sp].name}"
                f" ({st}) → {db.instance_name}.{db.stream_inputs[dp].name} ({dt})"
            )
        edge = StreamEdge(s, sp, d, dp, feedback=int(delay))
        self.stream_edges.append(edge)
        self.feedback_init[edge] = float(init)

    def message(
        self,
        src: Union[Block, int, str],
        src_port: str,
        dst: Union[Block, int, str],
        dst_handler: str,
    ) -> None:
        """Connect a message edge src.msg[src_port] → dst.handler."""
        s = self.block_id(self.add(src) if isinstance(src, Block) else src)
        d = self.block_id(self.add(dst) if isinstance(dst, Block) else dst)
        sb, db = self.blocks[s], self.blocks[d]
        if src_port not in sb.message_outputs:
            raise ConnectError(
                f"{sb.instance_name} has no message output {src_port!r}"
            )
        if dst_handler not in db.handlers():
            raise ConnectError(
                f"{db.instance_name} has no handler {dst_handler!r}"
            )
        self.message_edges.append(MessageEdge(s, src_port, d, dst_handler))

    # ---- validation helpers ----------------------------------------------
    def unconnected_inputs(self) -> List[Tuple[int, int]]:
        used = {(e.dst, e.dst_port) for e in self.stream_edges}
        out = []
        for i, b in enumerate(self.blocks):
            for p in range(len(b.stream_inputs)):
                if (i, p) not in used:
                    out.append((i, p))
        return out

    def in_edges(self, bid: int) -> List[StreamEdge]:
        es = [e for e in self.stream_edges if e.dst == bid]
        return sorted(es, key=lambda e: e.dst_port)

    def out_edges(self, bid: int, port: Optional[int] = None) -> List[StreamEdge]:
        return [
            e
            for e in self.stream_edges
            if e.src == bid and (port is None or e.src_port == port)
        ]

    # ---- description -----------------------------------------------------
    def describe(self, fg_id: int = 0) -> FlowgraphDescription:
        blocks = []
        for i, b in enumerate(self.blocks):
            s = b.spec()
            blocks.append(
                BlockDescription(
                    id=i,
                    type_name=s.type_name,
                    instance_name=b.instance_name,
                    stream_inputs=[p.name for p in s.stream_inputs],
                    stream_outputs=[p.name for p in s.stream_outputs],
                    message_inputs=s.message_inputs,
                    message_outputs=s.message_outputs,
                    blocking=b.is_blocking,
                )
            )
        streams = [
            StreamEdgeDescription(
                src_block=e.src,
                src_port=self.blocks[e.src].stream_outputs[e.src_port].name,
                dst_block=e.dst,
                dst_port=self.blocks[e.dst].stream_inputs[e.dst_port].name,
                dtype=str(
                    np.dtype(self.blocks[e.src].stream_outputs[e.src_port].dtype)
                ),
                feedback=e.feedback,
            )
            for e in self.stream_edges
        ]
        msgs = [
            MessageEdgeDescription(
                src_block=e.src,
                src_port=e.src_port,
                dst_block=e.dst,
                dst_port=e.dst_handler,
            )
            for e in self.message_edges
        ]
        return FlowgraphDescription(
            id=fg_id, blocks=blocks, stream_edges=streams, message_edges=msgs
        )


def to_dot(fg: Flowgraph) -> str:
    """GraphViz dot of the flowgraph (what the prophecy FlowgraphCanvas
    renders interactively; here a plain text export for quick
    inspection: ``dot -Tsvg`` or any online renderer)."""
    lines = ["digraph flowgraph {", "  rankdir=LR;", "  node [shape=box];"]
    for i, b in enumerate(fg.blocks):
        lines.append(f'  b{i} [label="{b.instance_name}"];')
    for e in fg.stream_edges:
        if e.feedback:
            lines.append(
                f'  b{e.src} -> b{e.dst} '
                f'[color=red, constraint=false, label="z^-{e.feedback}"];'
            )
        else:
            lines.append(f"  b{e.src} -> b{e.dst};")
    for e in fg.message_edges:
        lines.append(
            f'  b{e.src} -> b{e.dst} [style=dashed, '
            f'label="{e.src_port}→{e.dst_handler}"];'
        )
    lines.append("}")
    return "\n".join(lines)


def connect(fg: Flowgraph, *chain: Block) -> None:
    """Wire blocks in a linear chain on default ports.

    ``connect(fg, src, filt, snk)`` ≅ the reference's
    ``connect!(fg, src > filt > snk)`` for single-port blocks.
    """
    for b in chain:
        fg.add(b)
    for a, b in zip(chain, chain[1:]):
        fg.stream(a, b)
