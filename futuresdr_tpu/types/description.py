"""Control-plane descriptions of flowgraphs and blocks.

Parity: ``crates/types/src/description.rs`` — the JSON structures the REST
control port serves (``GET /api/fg/{id}/``) and the remote client consumes.
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict
from typing import List


@dataclass
class StreamEdgeDescription:
    src_block: int
    src_port: str
    dst_block: int
    dst_port: str
    dtype: str = ""
    items_per_step: int = 0
    feedback: int = 0  # close_circuit delay in items (0 = forward edge)


@dataclass
class MessageEdgeDescription:
    src_block: int
    src_port: str
    dst_block: int
    dst_port: str


@dataclass
class BlockDescription:
    id: int
    type_name: str
    instance_name: str
    stream_inputs: List[str] = field(default_factory=list)
    stream_outputs: List[str] = field(default_factory=list)
    message_inputs: List[str] = field(default_factory=list)
    message_outputs: List[str] = field(default_factory=list)
    blocking: bool = False

    def to_dict(self):
        return asdict(self)


@dataclass
class FlowgraphDescription:
    id: int
    blocks: List[BlockDescription] = field(default_factory=list)
    stream_edges: List[StreamEdgeDescription] = field(default_factory=list)
    message_edges: List[MessageEdgeDescription] = field(default_factory=list)

    def to_dict(self):
        return asdict(self)
