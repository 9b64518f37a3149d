"""Shared value/ID types (parity tier: reference ``crates/types/src/``)."""

from futuresdr_tpu.types.pmt import Pmt, PmtKind
from futuresdr_tpu.types.ids import BlockId, PortId, FlowgraphId
from futuresdr_tpu.types.description import (
    BlockDescription,
    FlowgraphDescription,
    StreamEdgeDescription,
    MessageEdgeDescription,
)

__all__ = [
    "Pmt",
    "PmtKind",
    "BlockId",
    "PortId",
    "FlowgraphId",
    "BlockDescription",
    "FlowgraphDescription",
    "StreamEdgeDescription",
    "MessageEdgeDescription",
]
